"""Query registry: one builder per implemented operator (Qkey) from
SURVEY.md §2. Each builder takes ``(spark, sf_dir)`` and returns a
lazy DataFrame; the driver compares it against the matching DuckDB
SQL in ``plans.oracle`` (row-count + schema + order-insensitive
value-hash), so every computed column is aliased identically on both
sides.

Scale notes are inline per query: what shuffles, what broadcasts,
what pushes down — the plan must survive 100 TB, not just sf0.1.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table
from ..functions.numeric import exact_sum

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}


def register(name: str) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        # a silent overwrite here once cost a round-9 key its
        # registration (transitive import order decided the winner);
        # collisions must be loud — and loud even under python -O,
        # where an assert would be stripped and the overwrite would
        # come back
        if name in QUERIES:
            raise ValueError(f"duplicate Qkey registration: {name}")
        QUERIES[name] = fn
        return fn
    return deco


# ---------------------------------------------------------------------------
# Flagship (SURVEY.md §7 M0): revenue by month and market segment.
# Exercises scan -> pushed filter -> two joins -> derive -> group-agg.
#
# Scale: lineitem is the 100 TB fact; the l_shipdate range predicate
# is pushed into the parquet scan (row-group/partition pruning), the
# orders join shuffles on orderkey (AQE sizes it), customer is small
# relative to facts at every SF so Spark broadcasts it under the
# engine threshold — no shuffle for the second join.
# ---------------------------------------------------------------------------

@register("flagship_revenue_by_month_segment")
def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference parity: the P&L report's month-bucketed SUM-per-group
    (qb_profit&loss.py:53-64 monthly loop, :73-103 totals) re-expressed
    as one declarative aggregate over the star schema instead of a
    request-per-month loop."""
    lineitem = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "2001-01-01")
    )
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    return (
        lineitem
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
        .agg(
            exact_sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
