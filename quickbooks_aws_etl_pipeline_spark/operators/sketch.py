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


def hll_month_retention(df: DataFrame, key_col: str, date_col: str,
                        abs_tol: int = 5, rel_tol: float = 0.1) -> DataFrame:
    """Sketch ALGEBRA: month-over-month retained uniques estimated
    purely from per-month HLL sketches by inclusion-exclusion —
    |A ∩ B| ≈ est(A) + est(B) - est(A ∪ B) — where the union is a
    sketch merge (`hll_union`), never a rescan. This is the query
    that makes mergeable sketches pay off at 100 TB: per-month
    sketches are tiny, persistable, and answer retention/overlap for
    ANY month pair without touching raw data again.

    Oracle-checkable by construction: each row carries the EXACT
    retained count (distinct keys present in both months) and an
    in-query bound on the sketch estimate (inclusion-exclusion
    compounds three estimates, so the bound is
    max(rel_tol * exact, abs_tol))."""
    month = F.date_format(F.col(date_col), "yyyy-MM")
    per = (df.groupBy(month.alias("m"))
           .agg(F.hll_sketch_agg(F.col(key_col)).alias("sk")))
    nxt = F.date_format(
        F.add_months(F.to_date(F.concat(F.col("m"), F.lit("-01"))), 1),
        "yyyy-MM")
    a = per.select(F.col("m").alias("month_from"),
                   nxt.alias("__next"), F.col("sk").alias("sk_a"))
    b = per.select(F.col("m").alias("month_to"), F.col("sk").alias("sk_b"))
    est = (F.hll_sketch_estimate("sk_a") + F.hll_sketch_estimate("sk_b")
           - F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b")))
    pairs = (a.join(b, F.col("__next") == F.col("month_to"))
             .select("month_from", "month_to", est.alias("__est")))
    mk = df.select(month.alias("m"), F.col(key_col).alias("k")).distinct()
    exact = (mk.alias("x")
             .join(mk.alias("y"),
                   (F.col("y.m") == F.date_format(
                       F.add_months(F.to_date(
                           F.concat(F.col("x.m"), F.lit("-01"))), 1),
                       "yyyy-MM"))
                   & (F.col("x.k") == F.col("y.k")))
             .groupBy(F.col("x.m").alias("month_from"))
             .agg(F.count(F.lit(1)).alias("n_retained_exact")))
    n_exact = F.coalesce("n_retained_exact", F.lit(0)).cast("bigint")
    tol = F.greatest(F.lit(rel_tol) * n_exact.cast("double"),
                     F.lit(float(abs_tol)))
    return (pairs.join(exact, "month_from", "left")
            .select("month_from", "month_to",
                    n_exact.alias("n_retained_exact"),
                    (F.abs(F.col("__est").cast("double")
                           - n_exact.cast("double")) <= tol)
                    .alias("hll_ok")))
