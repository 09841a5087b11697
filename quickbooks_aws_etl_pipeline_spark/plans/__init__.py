from .queries import QUERIES, flagship
from . import advanced_queries  # noqa: F401  (registers Qkeys)
from . import core_relational  # noqa: F401  (registers Qkeys)
from . import llm_ops  # noqa: F401  (registers Qkeys)
from . import report_queries  # noqa: F401  (registers Qkeys)
from . import sink_queries  # noqa: F401  (registers Qkeys)
from . import streaming_queries  # noqa: F401  (registers Qkeys)
from .oracle import ORACLE

__all__ = ["QUERIES", "ORACLE", "flagship"]
