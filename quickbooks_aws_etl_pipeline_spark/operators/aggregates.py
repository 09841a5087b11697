"""Aggregation operators (SURVEY.md §2.4).

Every aggregate the reference consumes is computed server-side by the
QBO report engine (P&L = SUM per account per month,
qb_profit&loss.py:73-103; TransactionListByVendor = per-vendor groups,
qb_transactionlistbyvendordetail.py:86-99). The engine computes them
natively with hash aggregation; Spark handles partial (map-side) +
final aggregation automatically, which is exactly the 100 TB shape:
combine before shuffle, one shuffle on the group keys, AQE-coalesced
reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import exact_sum


def group_sum(df: DataFrame, keys: list[str | Column],
              sums: dict[str, Column], counts: bool = True) -> DataFrame:
    """SUM-per-group with order-independent decimal summation
    (A1, the P&L shape)."""
    aggs = [exact_sum(col).alias(name) for name, col in sums.items()]
    if counts:
        aggs.append(F.count(F.lit(1)).alias("n_rows"))
    return df.groupBy(*keys).agg(*aggs)


def rollup_summary(df: DataFrame, keys: list[str], value: Column,
                   total_label: str = "(Total)") -> DataFrame:
    """A1's per-subtree ``Summary`` total rows (qb_profit&loss.py:94-98):
    ``rollup`` emits the same detail+subtotal+grand-total lattice; NULL
    group keys from the rollup are relabelled like the reference tags
    its summary rows with ``'(Summary)'``."""
    agg = df.rollup(*keys).agg(
        exact_sum(value).alias("total_amount"),
        F.count(F.lit(1)).alias("n_rows"),
        *[F.grouping(k).alias(f"_grouping_{k}") for k in keys],
    )
    labeled = [
        F.when(F.col(f"_grouping_{k}") == 1, F.lit(total_label))
        .otherwise(F.col(k)).alias(k)
        for k in keys
    ]
    return agg.select(*labeled, "total_amount", "n_rows")


def null_count_profile(df: DataFrame, col: str) -> DataFrame:
    """A3: the reference's data-quality NaN count
    (qb_transactionlist.py:99-101) generalized to a one-row profile."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col(col).isNull(), 1)).alias("n_null"),
        F.count(col).alias("n_not_null"),
    )


def group_collect_sorted(df: DataFrame, key: str, value: str) -> DataFrame:
    """A2: group detail retained under its group key
    (qb_transactionlistbyvendordetail.py:86-99). ``collect_list`` order
    is nondeterministic under parallelism, so the engine sorts the
    collected array — deterministic at any partition count — and joins
    to a string for engine-independent comparison."""
    return df.groupBy(key).agg(
        F.array_join(
            F.transform(F.sort_array(F.collect_list(value)),
                        lambda x: x.cast("string")),
            ",",
        ).alias("collected"),
        F.count(F.lit(1)).alias("n_rows"),
    )
