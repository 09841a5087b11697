"""Count-min sketch as a DataFrame (SURVEY.md §2.12 corpus-stats
tier; complements `agg_approx_distinct`'s HLL++ and
`agg_approx_percentile`'s KLL).

The sketch is built as DATA, not as an opaque aggregation buffer: a
``depth x width`` table of (row, bucket, count). That choice is what
makes it Spark-shaped at 100 TB:

- the explode multiplies rows by ``depth`` (small constant) but
  map-side partial aggregation collapses each task's contribution to
  at most ``depth * width`` rows before the shuffle — shuffle volume
  is bounded by sketch size x tasks, independent of corpus size;
- two sketches merge by unioning the tables and re-summing (the CM
  linearity property), which is how per-day sketches roll up to
  per-month without touching raw events again;
- estimates are a broadcast-joinable lookup, so "estimate these K
  keys" never rescans the corpus.

Hashing is the engine-wide md5 scheme (operators/text.md5_long), so
estimates are bit-identical in any engine that can md5 — the DuckDB
oracle reproduces the full sketch AND the estimates, a stronger check
than the usual "within eps*N" bound (which is also asserted).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import md5_long


def _bucket(col: Column, row: int, width: int) -> Column:
    """Row-seeded bucket index: first 60 bits of md5("<row>:<value>")
    mod width. Seeding by prefix keeps the d hash functions
    independent while staying portable (DuckDB mirrors the exact
    expression)."""
    return F.pmod(md5_long(F.concat(F.lit(f"{row}:"), col.cast("string"))),
                  F.lit(width))


def cms_build(df: DataFrame, key_col: str,
              depth: int = 4, width: int = 1024) -> DataFrame:
    """Build the count-min sketch table (cms_row, bucket, n) from one
    pass over ``df``. One shuffle, bounded at depth*width groups."""
    key = F.col(key_col)
    rows = F.explode(F.array(*[
        F.struct(F.lit(r).alias("cms_row"),
                 _bucket(key, r, width).alias("bucket"))
        for r in range(depth)
    ])).alias("rb")
    return (df.select(rows)
            .select(F.col("rb.cms_row").alias("cms_row"),
                    F.col("rb.bucket").alias("bucket"))
            .groupBy("cms_row", "bucket")
            .agg(F.count(F.lit(1)).alias("n")))


def hll_unique_rollup(df: DataFrame, key_col: str, bucket_col: Column,
                      rel_err: float = 0.05) -> DataFrame:
    """Mergeable distinct-count rollup: one Datasketches HLL per
    bucket (`F.hll_sketch_agg`), merged to the ALL row with
    `F.hll_union_agg` — the merge touches only the per-bucket
    sketches, never the raw rows, which is how per-day uniques roll
    up to per-month at 100 TB without a second corpus scan.

    Oracle-checkable by construction (the pattern
    `agg_approx_distinct` established): each output row carries the
    EXACT distinct count plus an in-query boolean that the HLL
    estimate lands within ``rel_err`` of it — including the merged
    row, whose estimate comes purely from the sketch union. The
    DuckDB oracle reproduces the exact counts and asserts the
    booleans are true.
    """
    per = (df.groupBy(bucket_col.alias("scope"))
           .agg(F.hll_sketch_agg(F.col(key_col)).alias("sk"),
                F.count_distinct(F.col(key_col)).alias("n_exact")))
    ok = lambda est, exact: (F.abs(est - exact)  # noqa: E731
                             <= F.lit(rel_err) * exact)
    per_out = per.select(
        F.col("scope"), "n_exact",
        ok(F.hll_sketch_estimate("sk"), F.col("n_exact")).alias("hll_ok"))
    merged = (per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .crossJoin(F.broadcast(
            df.agg(F.count_distinct(F.col(key_col)).alias("n_exact"))))
        .select(F.lit("ALL").alias("scope"), "n_exact",
                ok(F.col("est"), F.col("n_exact")).alias("hll_ok")))
    return per_out.unionByName(merged)


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """Point-estimate each key in ``keys``: min over the sketch rows
    of the key's bucket count. ``keys`` is expected to be small (the
    candidate heavy-hitter set) — the probe explodes it to depth rows
    and joins the sketch on (cms_row, bucket); Spark broadcasts the
    small probe side, so the sketch never moves."""
    key = F.col(key_col)
    probes = keys.select(
        key,
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("cms_row"),
                     _bucket(key, r, width).alias("bucket"))
            for r in range(depth)
        ])).alias("rb"),
    ).select(key_col, F.col("rb.cms_row").alias("cms_row"),
             F.col("rb.bucket").alias("bucket"))
    return (probes.join(sketch, ["cms_row", "bucket"])
            .groupBy(key_col)
            .agg(F.min("n").alias("cms_estimate")))
