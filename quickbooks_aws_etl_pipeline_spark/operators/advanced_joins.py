"""Advanced join strategies beyond the reference's surface.

The reference has no local joins at all (SURVEY.md §2.3) — QBO
pre-joins its dimension lookups server-side. A complete engine needs
the join shapes a 100 TB analytics/training-data pipeline actually
hits:

- **as-of join** (point-in-time lookup): for each left row, the most
  recent right row with the same key at-or-before the left timestamp.
  Implemented as union + ordered window with ``last(..., ignorenulls)``
  — ONE shuffle on (key), no range-condition nested-loop blowup. This
  is the scalable formulation: a naive ``ON l.key = r.key AND r.ts <=
  l.ts`` equi+range join degenerates to per-key quadratic fan-out,
  while the union-window form is O(n log n) per key and streams
  through a single sort.
- **range/interval join**: fact column against a banded dimension
  ``[lo, hi)``. With a broadcast-sized band table Spark plans a
  BroadcastNestedLoopJoin — each fact partition scans k bands, no
  shuffle. For band tables too big to broadcast, pre-bucket both
  sides on a coarsened key (``floor(x / bucket_width)``) to convert
  the range join into an equi join + residual filter.
- **salted join / two-phase aggregation**: the skew playbook when AQE
  skew-splitting is not enough. Salting is deterministic here (``key
  mod S``, not rand()) so results stay reproducible and
  oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str,
              right_vals: list[str],
              tolerance: Column | None = None) -> DataFrame:
    """Point-in-time join: attach to each ``left`` row the latest
    ``right`` row (same ``key``, ``right_ts <= left_ts``).

    Union-window formulation: tag both sides, sort each key's rows by
    (ts, side) with right rows first on ties, then carry the last
    non-null right value forward onto left rows. One shuffle on
    ``key``; at 100 TB the sort is per-key and AQE sizes the
    partitions — no nested-loop range join anywhere.

    Returns the left rows plus ``asof_<right_ts>`` and the requested
    ``right_vals`` columns (null when no right row precedes).
    """
    lcols = left.columns
    # struct-typed carriers so one union holds both sides losslessly;
    # null literals are cast to the opposite side's struct type
    rstruct = F.struct(F.col(right_ts).alias("asof_ts"),
                       *[F.col(c) for c in right_vals])
    ltype = left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
    rtype = right.select(rstruct.alias("s")).schema["s"].dataType
    tagged_r = right.select(
        F.col(key).alias("__k"), F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(ltype).alias("__lrow"),
        rstruct.alias("__rrow"),
    )
    tagged_l = left.select(
        F.col(key).alias("__k"), F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__lrow"),
        F.lit(None).cast(rtype).alias("__rrow"),
    )
    w = (Window.partitionBy("__k")
         .orderBy(F.asc("__ts"), F.asc("__side"))
         .rowsBetween(Window.unboundedPreceding, 0))
    unioned = tagged_r.unionByName(tagged_l)
    carried = unioned.withColumn(
        "__asof", F.last("__rrow", ignorenulls=True).over(w))
    out = (carried.filter(F.col("__side") == 1)
           .select("__lrow.*",
                   F.col("__asof.asof_ts").alias(f"asof_{right_ts}"),
                   *[F.col(f"__asof.{c}").alias(f"asof_{c}")
                     for c in right_vals]))
    if tolerance is not None:
        keep = F.col(left_ts) - F.col(f"asof_{right_ts}") <= tolerance
        out = out.select(
            *lcols,
            *[F.when(keep, F.col(f"asof_{c}")).alias(f"asof_{c}")
              for c in [right_ts, *right_vals]])
    return out


def range_join(fact: DataFrame, bands: DataFrame, value: Column,
               lo: Column, hi: Column, how: str = "inner") -> DataFrame:
    """Interval join: fact rows against ``[lo, hi)`` bands. The band
    table is broadcast — each executor scans its fact partition against
    the k bands locally; zero shuffle, no cartesian blowup as long as
    bands are broadcast-sized (they are: band tables are inherently
    small).
    """
    return fact.join(F.broadcast(bands), (value >= lo) & (value < hi), how)


def salted_join(left: DataFrame, right: DataFrame, key: str,
                salts: int = 8, salt_source: str | None = None) -> DataFrame:
    """Skew-resistant equi join: the (big, skewed) left side derives a
    deterministic salt from ``salt_source`` (a column uncorrelated
    with the key, e.g. a line number); the right side replicates
    ``salts``-fold via an exploded salt range. The join key becomes
    (key, salt), splitting each hot key's rows across ``salts``
    reducers.

    Deterministic by construction — no ``rand()`` — so the result
    equals the unsalted join and stays oracle-checkable. Replication
    cost: |right| x salts rows shuffled; pick ``salts`` ~ the ratio of
    the hottest key to the average key.
    """
    src = F.col(salt_source) if salt_source else F.col(key)
    # non-numeric salt sources cast to NULL; coalesce to bucket 0 so
    # those rows degrade to one salt instead of dropping from the join
    l = left.withColumn(
        "__salt",
        F.coalesce(F.pmod(src.cast("bigint"), F.lit(salts)), F.lit(0)).cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))
    out = l.join(r, [key, "__salt"])
    return out.drop("__salt")


def two_phase_agg(df: DataFrame, key_cols: list[str], salt_col: Column,
                  aggs: dict[str, Column], salts: int = 16) -> DataFrame:
    """Skewed-key aggregation in two shuffles: phase 1 groups by
    (key, salt) so one hot key fans out across ``salts`` reducers;
    phase 2 re-aggregates the partials by key alone. Only works for
    algebraic aggregates (sum/count/min/max) — which is what the
    engine's DQ + rollup surface needs.

    ``aggs`` maps output name -> phase-1 aggregate expression; phase 2
    sums partial sums/counts and re-min/maxes partial min/max (caller
    passes the phase-2 combiner via the same dict ordering:
    here we re-apply SUM for sum/count and MIN/MAX by alias prefix).
    """
    salted = df.withColumn("__salt",
                           F.pmod(salt_col.cast("bigint"), F.lit(salts)))
    p1 = salted.groupBy(*key_cols, "__salt").agg(
        *[expr.alias(name) for name, expr in aggs.items()])
    combiners = []
    for name in aggs:
        if name.startswith("min_"):
            combiners.append(F.min(name).alias(name))
        elif name.startswith("max_"):
            combiners.append(F.max(name).alias(name))
        else:  # partial sums and counts combine by summation
            combiners.append(F.sum(name).alias(name))
    return p1.groupBy(*key_cols).agg(*combiners)
