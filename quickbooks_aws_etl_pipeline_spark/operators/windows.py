"""Window-function operators (SURVEY.md §2.5).

Absent from the reference but required for capability parity with the
"detail rows + group context" report shape (A2). All orderings carry a
unique tie-break key so results are deterministic at any parallelism.

Scale: window partitioning shuffles once on the partition key; frames
evaluate within-partition with no further shuffle. Skewed partition
keys (one vendor with millions of rows) are the hazard — AQE skew
handling does not split window partitions, so partition keys must be
chosen with bounded cardinality per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def ordered_window(partition_by: list[str], order_by: list[Column | str]) -> WindowSpec:
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def with_row_number(df: DataFrame, partition_by: list[str],
                    order_by: list[Column | str], name: str = "rn") -> DataFrame:
    return df.withColumn(name, F.row_number().over(ordered_window(partition_by, order_by)))


def with_running_sum(df: DataFrame, value: Column, partition_by: list[str],
                     order_by: list[Column | str], name: str = "running_sum") -> DataFrame:
    """Cumulative sum; summand goes through DECIMAL so the prefix sums
    are exact and identical to any other engine's (see
    functions.numeric.exact_sum)."""
    w = (ordered_window(partition_by, order_by)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(
        name, F.sum(value.cast("decimal(18,4)")).over(w).cast("double"))


def with_lag_lead(df: DataFrame, value: str, partition_by: list[str],
                  order_by: list[Column | str]) -> DataFrame:
    w = ordered_window(partition_by, order_by)
    return (df
            .withColumn(f"prev_{value}", F.lag(value, 1).over(w))
            .withColumn(f"next_{value}", F.lead(value, 1).over(w)))


def with_partition_sum(df: DataFrame, value: Column, partition_by: list[str],
                       name: str = "group_total") -> DataFrame:
    """A2's vendor-total-next-to-detail shape: unordered full-partition
    frame, decimal-exact."""
    w = Window.partitionBy(*partition_by)
    return df.withColumn(
        name, F.sum(value.cast("decimal(18,4)")).over(w).cast("double"))


def ewma_weights(alpha: float = 0.3, k: int = 8) -> list[float]:
    """Truncated-EWMA lag weights alpha*(1-alpha)^j, j = 0..k-1 —
    generated once in Python and embedded as identical literals in
    the Spark plan AND the oracle SQL (the shared-constant pattern),
    so the smoothing arithmetic is bit-identical across engines."""
    return [alpha * (1.0 - alpha) ** j for j in range(k)]
