"""Join operators (SURVEY.md §2.3).

The reference outsources joins to QBO (pre-joined ``VendorRef.name``
columns, qb_bills.py:81-84) and to the explode that replicates header
columns onto line rows (qb_jounalentry.py:108-117). The engine owns
the real thing: equi inner/left/semi/anti with explicit broadcast for
dimension tables.

Scale: at 100 TB the fact side never broadcasts; dims
(region/nation/supplier/part here, vendor/account lookups in the QBO
model) stay far under the broadcast threshold at any realistic
cardinality, so every fact x dim join is a map-side broadcast hash
join — zero shuffle. Fact x fact (lineitem x orders) shuffles on the
join key once; AQE picks partition counts and splits skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io import BROADCAST_DIMS


def dim(df: DataFrame, name: str | None = None) -> DataFrame:
    """Mark a dimension table for broadcast. Known-small testdata dims
    broadcast unconditionally; anything else is left to the
    autoBroadcastJoinThreshold / AQE runtime size check."""
    if name is None or name in BROADCAST_DIMS:
        return F.broadcast(df)
    return df


def fact_dim_join(fact: DataFrame, dimension: DataFrame, on, how: str = "inner",
                  broadcast_dim: bool = True) -> DataFrame:
    """fact JOIN dim with a broadcast hint on the dim side (J2)."""
    d = F.broadcast(dimension) if broadcast_dim else dimension
    return fact.join(d, on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of ``left`` with a match in ``right`` (EXISTS)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of ``left`` with no match in ``right`` (NOT EXISTS)."""
    return left.join(right, on, "left_anti")
