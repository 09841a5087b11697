"""Column-name normalization helpers.

The reference renames columns in three steps applied to *names* (not
data), so these are plain-Python plan-build-time helpers, no Spark
primitive needed (SURVEY.md §2.2 P3-P4):

1. camelCase -> snake_case via a char walk (qb_bills.py:92)
2. dotted struct paths -> underscores, ``.`` -> ``_`` then ``__`` ->
   ``_`` (qb_billpayments.py:102-103)
3. manual fixups, e.g. ``c_c_account_ref`` -> ``cc_account_ref``
   (qb_billpayments.py:104-107)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def snake_case(name: str) -> str:
    """camelCase/PascalCase -> snake_case, mirroring the reference's
    char-walk (qb_bills.py:92): underscore before every uppercase,
    then strip one leading underscore."""
    out = "".join("_" + c.lower() if c.isupper() else c for c in name)
    return out.lstrip("_")


def flatten_dotted(name: str) -> str:
    """Dotted struct path -> flat name (qb_billpayments.py:102-103)."""
    out = name.replace(".", "_")
    while "__" in out:
        out = out.replace("__", "_")
    return out


def normalize_column(name: str, fixups: dict[str, str] | None = None) -> str:
    """Full reference rename pipeline: snake_case each dotted segment,
    join with underscores, apply manual fixups last."""
    flat = "_".join(snake_case(seg) for seg in name.split("."))
    flat = flatten_dotted(flat)
    if fixups and flat in fixups:
        flat = fixups[flat]
    return flat


def rename_columns(df: DataFrame, fixups: dict[str, str] | None = None) -> DataFrame:
    """Apply the reference rename pipeline to every column of ``df``."""
    return df.toDF(*[normalize_column(c, fixups) for c in df.columns])
