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


# ---------------------------------------------------------------------------
# Bloom filter as data (round 4). Same design philosophy as the CMS
# above: the filter is a (word, bits) TABLE — mergeable by bit_or
# re-aggregation, broadcast-joinable for probes, and md5-portable so
# the oracle reproduces every bit. Words are 60 bits wide (not 64) so
# 1 << bit never touches the sign bit in any engine.
# ---------------------------------------------------------------------------

_BLOOM_WORD_BITS = 60


def bloom_build(df: DataFrame, key_col: str,
                m_bits: int = 61440, k: int = 5) -> DataFrame:
    """One pass over ``df`` -> bloom table (word, bits).

    Each key sets ``k`` md5-seeded bit positions; positions fold into
    60-bit words via integer div/mod and the per-word masks combine
    with ``bit_or``. Map-side partial aggregation collapses every
    task's contribution to at most ``m_bits/60`` rows before the
    exchange, so shuffle volume is bounded by filter size x tasks —
    independent of input cardinality (the CMS property, for set
    membership). ``m_bits`` should be a multiple of 60.
    """
    key = F.col(key_col)
    pos = F.explode(F.array(*[
        F.pmod(md5_long(F.concat(F.lit(f"b{i}:"), key.cast("string"))),
               F.lit(m_bits))
        for i in range(k)
    ])).alias("pos")
    return (df.select(pos)
            .select((F.col("pos") / _BLOOM_WORD_BITS).cast("bigint")
                    .alias("word"),
                    # expr form: the DSL shiftleft only takes a
                    # literal shift amount, the SQL function takes a
                    # column.
                    F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                           f"CAST(pos % {_BLOOM_WORD_BITS} AS INT))")
                    .alias("mask"))
            .groupBy("word")
            .agg(F.bit_or("mask").alias("bits")))


def bloom_probe(bloom: DataFrame, probes: DataFrame, key_col: str,
                m_bits: int = 61440, k: int = 5) -> DataFrame:
    """Membership test for every row of ``probes``: a key is a bloom
    hit iff ALL ``k`` of its bits are set. The probe explodes to k
    rows, left-joins the (tiny, broadcast) bloom table on word, and
    re-groups counting satisfied bits — missing words count as unset.
    Adds a boolean ``bloom_member`` column keyed by ``key_col``."""
    key = F.col(key_col)
    pos = F.explode(F.array(*[
        F.pmod(md5_long(F.concat(F.lit(f"b{i}:"), key.cast("string"))),
               F.lit(m_bits))
        for i in range(k)
    ])).alias("pos")
    exploded = (probes.select(key, pos)
                .select(key_col, "pos",
                        (F.col("pos") / _BLOOM_WORD_BITS).cast("bigint")
                        .alias("word"),
                        F.pmod(F.col("pos"), F.lit(_BLOOM_WORD_BITS))
                        .cast("int").alias("bit")))
    hit = (F.coalesce(
        F.expr("shiftright(bits, bit) & CAST(1 AS BIGINT)"),
        F.lit(0).cast("bigint")) == 1)
    return (exploded.join(F.broadcast(bloom), "word", "left")
            .groupBy(key_col)
            .agg((F.sum(F.when(hit, 1).otherwise(0)) == F.lit(k))
                 .alias("bloom_member")))


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch (round 4). HLL (above) can
# union but cannot intersect; KMV supports set INTERSECTION estimates
# via the theta-sketch identity — the missing piece for "how many
# users overlap between these two corpora/months" without a join of
# the raw sets. md5 hashing makes every sketch value and therefore
# every ESTIMATE bit-reproducible in the oracle.
# ---------------------------------------------------------------------------

_HASH_SPACE = float(1 << 60)  # md5_long range


def kmv_sketch(df: DataFrame, key_col: str, k: int = 64) -> DataFrame:
    """The k smallest distinct md5 hashes of ``key_col`` — a KMV
    sketch as a k-row table. distinct() collapses map-side; the
    ascending take is TakeOrderedAndProject (k rows per partition
    move, never a global sort)."""
    return (df.select(md5_long(F.col(key_col).cast("string")).alias("h"))
            .distinct()
            .orderBy(F.asc("h"))
            .limit(k))


def kmv_overlap(df_a: DataFrame, df_b: DataFrame, key_col: str,
                k: int = 64, rel_tol: float = 0.35,
                abs_tol: int = 32) -> DataFrame:
    """Distinct-cardinality and intersection estimates for two sets
    from their KMV sketches, with the exact values and an in-query
    bound check alongside (the `agg_approx_distinct` oracle pattern —
    plus full bit-reproducibility, since every estimate is a
    deterministic function of md5 values the oracle can recompute).

    Estimator: with h_k the k-th smallest of n >= k distinct hashes,
    n_hat = (k-1) * SPACE / h_k; when a set has fewer than k distinct
    hashes the sketch IS the set and the estimate is exact (the CASE
    both engines mirror). Intersection via the theta identity: theta
    = max of the (<= k)-row merged sketch, K_cap = |{h <= theta
    present in both sketches}|, |A cap B|_hat = K_cap / n_m *
    union_hat with n_m the retained merged size — so a fully-known
    union (n_m < k) yields the exact hash intersection
    (tests/test_advanced_ops.py::test_kmv_exact_when_set_smaller_than_k).

    Scale: each sketch is k rows; the merge/compare runs on 3k rows
    driver-free. The exact distinct/intersection columns are the
    oracle anchor — at production scale you'd drop them and keep only
    the sketch path (they are the only set-sized computation here).
    """
    sk_a = kmv_sketch(df_a, key_col, k).localCheckpoint(eager=False)
    sk_b = kmv_sketch(df_b, key_col, k).localCheckpoint(eager=False)

    def est(sk: DataFrame, exact_cnt: DataFrame, tag: str) -> DataFrame:
        agg = sk.agg(F.count(F.lit(1)).alias("n_h"),
                     F.max("h").alias("h_k"))
        return (agg.crossJoin(F.broadcast(exact_cnt))
                .select(
                    F.when(F.col("n_h") < k,
                           F.col("n_h").cast("double"))
                    .otherwise(F.lit(float(k - 1)) * F.lit(_HASH_SPACE)
                               / F.col("h_k").cast("double"))
                    .alias(f"est_{tag}"),
                    F.col("n_exact").alias(f"exact_{tag}")))

    exact_a = df_a.agg(F.count_distinct(F.col(key_col)).alias("n_exact"))
    exact_b = df_b.agg(F.count_distinct(F.col(key_col)).alias("n_exact"))
    exact_i = (df_a.select(key_col).distinct()
               .join(df_b.select(key_col).distinct(), key_col, "left_semi")
               .agg(F.count(F.lit(1)).alias("exact_intersection")))

    merged = sk_a.unionByName(sk_b).distinct().orderBy(F.asc("h")).limit(k)
    m_agg = merged.agg(F.count(F.lit(1)).alias("n_m"),
                       F.max("h").alias("theta"))
    common = (sk_a.join(sk_b, "h", "left_semi")
              .crossJoin(F.broadcast(m_agg))
              .filter(F.col("h") <= F.col("theta"))
              .agg(F.count(F.lit(1)).alias("k_cap")))

    out = (est(sk_a, exact_a, "a")
           .crossJoin(est(sk_b, exact_b, "b"))
           .crossJoin(F.broadcast(m_agg))
           .crossJoin(F.broadcast(common))
           .crossJoin(F.broadcast(exact_i)))
    union_est = F.when(
        F.col("n_m") < k, F.col("n_m").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE)
        / F.col("theta").cast("double"))
    # Denominator is the RETAINED merged-sketch size n_m (= k once
    # both sets exceed k, smaller when the union is fully known) —
    # dividing by a fixed k under-estimates exactly when the sketch
    # has complete information. With n_m < k this reduces to
    # k_cap/n_m * n_m = k_cap = the exact hash intersection.
    inter_est = (F.col("k_cap").cast("double")
                 / F.col("n_m").cast("double") * union_est)
    tol = F.greatest(
        F.lit(rel_tol) * F.col("exact_intersection").cast("double"),
        F.lit(float(abs_tol)))
    # Raw doubles, no round(): both engines build these from the same
    # integers with the same IEEE op order, so they are bit-identical;
    # round() implementations differ across engines and would only
    # add mismatch risk.
    return out.select(
        F.lit(k).alias("k"),
        F.col("est_a"), "exact_a",
        F.col("est_b"), "exact_b",
        inter_est.alias("est_intersection"),
        "exact_intersection",
        (F.abs(inter_est - F.col("exact_intersection").cast("double"))
         <= tol).alias("kmv_ok"))
