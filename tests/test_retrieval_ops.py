"""Differentials for the retrieval/serving tier (round 8 session 2).

Three lanes are soaked against each other for the BM25 integer
recipe — the Spark DECIMAL(38,0) DIV, the DuckDB HUGEINT mirror, and
exact Python integers — plus a float-reference bound proving the
integer algebra IS BM25 (not merely self-consistent). The margin
miner is checked against brute-force Python on random vectors, and
the conformal order statistic against numpy's, under hypothesis.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from quickbooks_aws_etl_pipeline_spark.operators.retrieval import (
    bm25_contrib_e6_expr, idf_e7, margin_mine, ndcg_discounts_e9,
    rrf_fuse, topk_with_rank)


def _py_contrib_e6(idf_e7_v: int, tf: int, dl: int, T: int, N: int) -> int:
    num = idf_e7_v * 22 * tf * T
    den = 10 * (10 * tf * T + 3 * T + 9 * dl * N)
    return (2 * num + den) // (2 * den)


def test_bm25_contrib_three_lane_soak(spark):
    """2,000 randomized postings (md5-deterministic, no RNG state):
    Spark's DECIMAL DIV, DuckDB's HUGEINT //, and exact Python
    integers must agree bit-for-bit on contrib_e6 — and the integer
    value must sit within 1.5e-6 of the float BM25 term (k1=1.2,
    b=0.75, Lucene idf): rounding contributes <= 5e-7 and the e7 idf
    quantization <= ~2.2e-7 after the tf factor."""
    import hashlib

    def h(i, tag, lo, hi):
        v = int(hashlib.md5(f"bm25soak:{tag}:{i}".encode())
                .hexdigest()[:12], 16)
        return lo + v % (hi - lo + 1)

    rows = []
    for i in range(2000):
        N = h(i, "N", 1, 10**9)
        T = h(i, "T", N, min(10**12, N * 200))
        dl = h(i, "dl", 1, 1000)
        tf = h(i, "tf", 1, dl)
        df = h(i, "df", 1, N)
        rows.append((i, tf, dl, df, N, T))
    # int64-wrap band: tf*T > 9.2e17, where a bare BIGINT
    # 10*tf*total_len wraps in Spark (and raises in DuckDB) unless
    # the inner denominator term is DECIMAL(38,0)/HUGEINT-cast —
    # the exact failure the ADVICE round-8 finding flagged.
    for i in range(2000, 2400):
        N = h(i, "N", 10**6, 10**9)
        T = h(i, "T", 10**13, 10**14)
        tf = h(i, "tf", 10**4, 10**6)
        dl = h(i, "dl", tf, 2 * tf)
        df = h(i, "df", 1, N)
        rows.append((i, tf, dl, df, N, T))
    sdf = spark.createDataFrame(
        rows, "i long, tf long, dl long, df long, n_docs long, total_len long")
    got = (sdf.withColumn("idf_e7", idf_e7(F.col("n_docs"), F.col("df")))
           .withColumn("contrib_e6", bm25_contrib_e6_expr())
           .select("i", "tf", "dl", "df", "n_docs", "total_len",
                   "idf_e7", "contrib_e6")
           .toPandas().sort_values("i"))
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM got")
    got = got.set_index("i")
    duck = con.execute("""
        SELECT i,
               CAST(floor(log10(CAST(2*n_docs + 2 AS DOUBLE)
                                / CAST(2*df + 1 AS DOUBLE)) * 1e7 + 0.5)
                    AS BIGINT) AS idf_e7_d,
               CAST((2 * CAST(CAST(floor(log10(
                          CAST(2*n_docs + 2 AS DOUBLE)
                          / CAST(2*df + 1 AS DOUBLE)) * 1e7 + 0.5)
                        AS BIGINT) AS HUGEINT) * 22 * tf * total_len
                     + CAST(10 AS HUGEINT)
                       * (10 * CAST(tf AS HUGEINT) * total_len
                          + 3 * CAST(total_len AS HUGEINT)
                          + 9 * CAST(dl AS HUGEINT) * n_docs))
                    // (2 * CAST(10 AS HUGEINT)
                        * (10 * CAST(tf AS HUGEINT) * total_len
                           + 3 * CAST(total_len AS HUGEINT)
                           + 9 * CAST(dl AS HUGEINT) * n_docs))
                    AS BIGINT) AS contrib_e6_d
        FROM t ORDER BY i""").df().set_index("i")
    for i, r in got.iterrows():
        # lane 1 vs lane 2 (Spark vs DuckDB), bit-exact
        assert r["idf_e7"] == duck["idf_e7_d"][i], i
        assert r["contrib_e6"] == duck["contrib_e6_d"][i], i
        # lane 3 (pure Python on the same integers), bit-exact
        assert r["contrib_e6"] == _py_contrib_e6(
            int(r["idf_e7"]), int(r["tf"]), int(r["dl"]),
            int(r["total_len"]), int(r["n_docs"])), i
        # float reference: the integer algebra IS BM25
        N, T, dl, tf, df = (int(r["n_docs"]), int(r["total_len"]),
                            int(r["dl"]), int(r["tf"]), int(r["df"]))
        idf = math.log10(1 + (N - df + 0.5) / (df + 0.5))
        tf_term = tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / (T / N)))
        assert abs(r["contrib_e6"] / 1e6 - idf * tf_term) <= 1.5e-6, (
            i, r["contrib_e6"] / 1e6, idf * tf_term)


def test_rrf_fuse_matches_float_reference(spark):
    """Fused rrf values must equal round(1/(60+rs) + 1/(60+rd), 6)
    within the half-away convention for every (rs, rd) pair in the
    20x20 grid plus the single-list legs."""
    sparse = spark.createDataFrame(
        [Row(id=i, rnk=i) for i in range(1, 21)])
    dense = spark.createDataFrame(
        [Row(id=i + 10, rnk=i) for i in range(1, 21)])
    out = {r["id"]: r for r in rrf_fuse(sparse, dense).collect()}
    assert len(out) == 30
    for i, r in out.items():
        expect = 0.0
        if r["rs"] is not None:
            expect += 1 / (60 + r["rs"])
        if r["rd"] is not None:
            expect += 1 / (60 + r["rd"])
        assert abs(r["rrf"] - expect) <= 5.1e-7, (i, r["rrf"], expect)


def test_margin_mine_brute_force_differential(spark):
    """Random 8-dim vectors (seeded), 6 queries x 20 corpus: the
    distributed miner must pick exactly the pairs a brute-force
    Python implementation of the k=4 distance margin picks."""
    import random
    rng = random.Random(42)
    xs = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(6)]
    ys = [(100 + i, [rng.uniform(-1, 1) for _ in range(8)])
          for i in range(20)]
    x_df = spark.createDataFrame(xs, "vec_id long, embedding array<double>")
    y_df = spark.createDataFrame(ys, "vec_id long, embedding array<double>")
    got = {r["xid"]: (r["yid"], r["margin"])
           for r in margin_mine(x_df, y_df, "embedding",
                                "vec_id", "vec_id", k=4).collect()}

    def cos_e6(a, b):
        d = sum(p * q for p, q in zip(a, b))
        na = math.sqrt(sum(p * p for p in a))
        nb = math.sqrt(sum(q * q for q in b))
        return math.floor(d / (na * nb) * 1e6 + 0.5)

    sims = {(xi, yi): cos_e6(xv, yv) for xi, xv in xs for yi, yv in ys}
    sum_f = {xi: sum(sorted((sims[(xi, yi)] for yi, _ in ys),
                            reverse=True)[:4]) for xi, _ in xs}
    sum_b = {yi: sum(sorted((sims[(xi, yi)] for xi, _ in xs),
                            reverse=True)[:4]) for yi, _ in ys}
    expect = {}
    for xi, _ in xs:
        best = max(
            ((8 * sims[(xi, yi)] - sum_f[xi] - sum_b[yi], -yi, yi)
             for yi, _ in ys))
        m8, _, yi = best
        if m8 > 0:
            expect[xi] = yi
    assert {k: v[0] for k, v in got.items()} == expect


def test_margin_mine_small_side_uses_actual_counts(spark):
    """|X| = 2 < k = 4: the backward neighborhood only has 2 members,
    so the margin must normalize by the ACTUAL count (the
    Artetxe-Schwenk mean-of-top-k definition) — a fixed 2k divisor
    would implicitly score the 2 missing neighbors as 0 cosine and
    inflate every margin (r8 ADVICE finding). Brute-force float
    reference with true means, exact to the 1e-6 emission grid."""
    import random
    rng = random.Random(7)
    xs = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(2)]
    ys = [(100 + i, [rng.uniform(-1, 1) for _ in range(8)])
          for i in range(12)]
    x_df = spark.createDataFrame(xs, "vec_id long, embedding array<double>")
    y_df = spark.createDataFrame(ys, "vec_id long, embedding array<double>")
    got = {r["xid"]: r for r in margin_mine(
        x_df, y_df, "embedding", "vec_id", "vec_id", k=4).collect()}

    def cos_e6(a, b):
        d = sum(p * q for p, q in zip(a, b))
        na = math.sqrt(sum(p * p for p in a))
        nb = math.sqrt(sum(q * q for q in b))
        return math.floor(d / (na * nb) * 1e6 + 0.5)

    sims = {(xi, yi): cos_e6(xv, yv) for xi, xv in xs for yi, yv in ys}
    for xi, _ in xs:
        fw = sorted((sims[(xi, yi)] for yi, _ in ys), reverse=True)[:4]
        best = None
        for yi, _ in ys:
            bw = sorted((sims[(xj, yi)] for xj, _ in xs),
                        reverse=True)[:4]           # only 2 exist
            assert len(bw) == 2
            m = (sims[(xi, yi)]
                 - (sum(fw) / len(fw) + sum(bw) / len(bw)) / 2) / 1e6
            cand = (m, -yi, yi)
            best = cand if best is None or cand > best else best
        m, _, yi = best
        if m > 0:
            assert xi in got and got[xi]["yid"] == yi, (xi, got.get(xi))
            assert abs(got[xi]["margin"] - m) <= 5.1e-7, (xi, m)
        else:
            assert xi not in got, (xi, got.get(xi))


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(0, 1_000_000), min_size=9, max_size=60))
@pytest.mark.slow  # full-tier: algebra unchanged this round
def test_conformal_order_statistic_hypothesis(spark, scores):
    """Random calibration-positive ppm scores: the histogram-derived
    threshold must equal the k-th smallest (k = floor((n+1)/10),
    floored at 1) computed by plain Python sorting."""
    from quickbooks_aws_etl_pipeline_spark.operators.evaluation import (
        conformal_threshold)
    rows = ([Row(score_ppm=s, is_pos=True, is_cal=True) for s in scores]
            + [Row(score_ppm=500_000, is_pos=True, is_cal=False),
               Row(score_ppm=1_000, is_pos=False, is_cal=False)])
    df = spark.createDataFrame(rows)
    out = conformal_threshold(df, "score_ppm", "is_pos", "is_cal",
                              buckets=7).collect()[0]
    n = len(scores)
    k = max(1, (n + 1) // 10)
    assert out["n_cal"] == n
    assert out["k_order"] == k
    assert out["threshold_ppm"] == sorted(scores)[k - 1]


def test_topk_with_rank_deterministic_under_ties(spark):
    """All-equal scores: the cut and the ranks must fall back to the
    id tiebreak — same 5 rows, ranks 1..5, on every run."""
    df = spark.createDataFrame(
        [Row(id=i, s=7) for i in range(100)])
    out = topk_with_rank(df, [F.desc("s"), F.asc("id")], 5).collect()
    assert [(r["id"], r["rnk"]) for r in out] == [(i, i + 1)
                                                  for i in range(5)]


def test_ndcg_discounts_are_stable_literals():
    """The shared-constant table must never drift: pin the exact ten
    integers both engines embed (a change here silently un-pins every
    recorded ndcg value)."""
    assert ndcg_discounts_e9(10) == [
        1000000000, 630929754, 500000000, 430676558, 386852807,
        356207187, 333333333, 315464877, 301029996, 289064826]


def test_bm25_batch_singleton_equals_single_query(spark, sf_smoke):
    """A singleton batch must score identically to the single-query
    scorer — the fan-out map adds queries, never changes algebra."""
    from quickbooks_aws_etl_pipeline_spark.io import read_table
    from quickbooks_aws_etl_pipeline_spark.operators.retrieval import (
        bm25_scores, bm25_scores_batch)
    docs = read_table(spark, sf_smoke, "documents")
    terms = ["spark", "hash", "join", "window"]
    single = {r["doc_id"]: (r["score_e6"], r["n_terms"])
              for r in bm25_scores(docs, terms).collect()}
    batch = {r["doc_id"]: (r["score_e6"], r["n_terms"])
             for r in bm25_scores_batch(docs, {0: terms}).collect()}
    assert single == batch


@pytest.mark.parametrize("key", ["text_bm25_index_serve",
                                 "maintenance_bm25_index_refresh"])
def test_index_lifecycles_idempotent(spark, sf_smoke, key):
    """Both index lifecycles rebuild with mode=overwrite (and the
    refresh replays its batch under dynamic partition overwrite), so
    running the key twice must produce identical rows — the standard
    sink re-run probe applied to index maintenance."""
    from quickbooks_aws_etl_pipeline_spark.plans import QUERIES
    a = sorted(map(tuple, QUERIES[key](spark, sf_smoke).collect()))
    b = sorted(map(tuple, QUERIES[key](spark, sf_smoke).collect()))
    assert a == b
