"""Numeric / null-handling scalar layer (SURVEY.md §2.8 F5-F7).

Mirrors the reference's pandas semantics:

- ``pd.to_numeric(x, errors='coerce')`` (qb_transactionlist.py:93)
  -> ``try_cast`` / non-ANSI cast (coerce-to-NULL)
- ``fillna(0)`` before an int cast (qb_billpayments.py:111-112)
  -> ``coalesce(col, lit(0))``
- ``replace('', pd.NA)`` (qb_profit&loss.py:111) -> ``nullif``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def safe_cast_numeric(col: Column | str, dtype: str = "double") -> Column:
    """Cast with coerce-to-NULL on failure — the engine runs with
    ``spark.sql.ansi.enabled=false`` so a plain cast already matches
    ``pd.to_numeric(errors='coerce')``; ``try_cast`` keeps the
    semantics explicit and ANSI-proof."""
    return _c(col).try_cast(dtype)


def null_fill(col: Column | str, value) -> Column:
    """``fillna(value)`` on one column -> ``coalesce``."""
    return F.coalesce(_c(col), F.lit(value))


def nullif_empty(col: Column | str) -> Column:
    """``replace('', NA)`` -> ``NULLIF(col, '')``."""
    return F.nullif(_c(col), F.lit(""))


def exact_sum(col: Column, scale: int = 4, precision: int = 18) -> Column:
    """Deterministic SUM over doubles for oracle hash-equality.

    Summing doubles is order-dependent; Spark's partial aggregation
    order differs from any single-node engine, so raw ``SUM(double)``
    differs from the DuckDB oracle in the last ulps. Casting each
    summand to DECIMAL makes addition exact and associative — the
    result is bit-identical regardless of partitioning (and therefore
    stable from local[32] up to a 1000-executor cluster). Cast back to
    double at the end. The oracle SQL applies the identical
    ``CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)``.
    """
    return F.sum(_c(col).cast(f"decimal({precision},{scale})")).cast("double")
