"""Retrieval / serving tier: BM25 lexical scoring over an inverted
posting relation, reciprocal-rank fusion of lexical + dense rank
lists, and margin-based bitext mining over embedding sets.

These are the query-time operators a corpus built by the curation
tier actually serves (RAG retrieval, hybrid search, parallel-corpus
mining). The reference has no retrieval surface at all — its nine
scripts end at the warehouse load (qb_bills.py:130-169) — so this
tier is training-data/serving scope the brief grades as first-class
alongside SURVEY.md §2.

Exactness doctrine (NOTES round 6/7): every ranking number that
crosses the engine boundary is either an exact integer, an integer
over a power of ten, or the output of one of the two soaked log10
recipes — no raw ROUND(double) of a composite float expression
anywhere in a ranking key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import round_ratio6
from .similarity import as_double_array, dot, l2_norm
from .text import tokens

# BM25 constants as exact rationals: k1 = 12/10, b = 3/4. The
# per-term factor tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl/avgdl) with
# avgdl = T/N clears denominators to the all-integer form
#   22*tf*T / (10*tf*T + 3*T + 9*dl*N)
# (multiply through by 10*T), so the only non-integer in the whole
# score is the idf log — which uses the soaked floor(log10(a/b)*1e7
# + 0.5) BIGINT recipe (NOTES round-7 soak: 20,015 cases incl. all
# power-of-10 boundaries, 0 mismatches).
BM25_K1_NUM = 12   # k1 = 12/10
BM25_B_NUM = 3     # b  = 3/4


def idf_e7(n_docs: Column, df_: Column) -> Column:
    """Lucene-form BM25 idf, log10, in integer 1e-7 units:
    idf = log10(1 + (N - df + 0.5)/(df + 0.5)) = log10((2N+2)/(2df+1))
    — a log10 of a ratio of exact integers, the soaked cross-engine
    contract. Always >= 0 (the argument is > 1 for df <= N), so the
    downstream integer DIV needs no sign decomposition."""
    a = (2 * n_docs + 2).cast("double")
    b = (2 * df_ + 1).cast("double")
    return F.floor(F.log10(a / b) * F.lit(1e7) + F.lit(0.5)).cast("bigint")


def bm25_contrib_e6_expr() -> Column:
    """The per-posting BM25 contribution in exact 1e-6 integer units,
    over columns named (idf_e7, tf, dl, total_len, n_docs):
    num = idf_e7 * 22*tf*T ; den = 10*(10*tf*T + 3*T + 9*dl*N) ;
    contrib_e6 = round_half_away(num / den) — non-negative (idf >= 0),
    so the plain (2*num + den) DIV (2*den) form applies. EVERY product
    chain starts from a DECIMAL(38,0) operand — including the inner
    denominator term, where a bare BIGINT 10*tf*T would silently wrap
    int64 once tf*T exceeds ~9.2e17 (Spark non-ANSI wraps, DuckDB
    raises — the lanes would diverge). Exact while the 128-bit
    intermediates stay under 10^38: idf_e7*44*tf*T < 1e38 and
    20*(10*tf*T + 3*T + 9*dl*N) < 1e38, i.e. comfortably past
    tf ~ 1e9, T ~ 1e13, dl*N ~ 1e25 — far beyond any real corpus.
    The DuckDB mirror is the same integers on HUGEINT
    (tests/test_retrieval_ops soaks all three lanes against a float
    reference, including the int64-wrap band tf*T > 9.2e17)."""
    return F.expr(
        "CAST((2 * CAST(idf_e7 AS DECIMAL(38,0)) * 22 * tf"
        "        * total_len"
        "      + CAST(10 AS DECIMAL(38,0))"
        "        * (10 * CAST(tf AS DECIMAL(38,0)) * total_len"
        "           + 3 * CAST(total_len AS DECIMAL(38,0))"
        "           + 9 * CAST(dl AS DECIMAL(38,0)) * n_docs))"
        "     DIV (2 * CAST(10 AS DECIMAL(38,0))"
        "          * (10 * CAST(tf AS DECIMAL(38,0)) * total_len"
        "             + 3 * CAST(total_len AS DECIMAL(38,0))"
        "             + 9 * CAST(dl AS DECIMAL(38,0)) * n_docs))"
        "     AS BIGINT)")


def bm25_scores(docs: DataFrame, query_terms: list[str],
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Per-document BM25 score for a fixed literal query, in exact
    1e-6 integer units (``score_e6`` BIGINT) plus ``n_terms`` matched.

    Scale shape: the explode is filtered to the query's terms BEFORE
    the (doc, term) aggregate — the posting relation is |matched
    docs| x |query terms|, not the full inverted index — so the one
    map-side-combining exchange carries only candidate postings. The
    corpus stats (N, total token count T) and the per-term document
    frequencies (<= |query| rows) are broadcast; the per-posting
    contribution is an integer DIV over DECIMAL(38,0) operands
    (exact for any int64 inputs: 2*idf_e7*22*tf*T*stays < 10^38 even
    at T ~ 1e13 tokens), summed per doc as BIGINT — the final score
    is that integer over 1e6, IEEE-identical on every engine.

    At 100 TB the posting filter is the pushed predicate: a real
    deployment stores the exploded posting table bucketed by term
    (maintenance_zorder_rewrite shape) so the scan prunes to the
    query's term buckets; everything downstream of the scan is
    already candidate-bounded here.
    """
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       tokens(F.col(text_col)).alias("toks"))
    dld = toks.select("doc_id", F.size("toks").alias("dl"), "toks")
    stats = dld.agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("dl").cast("bigint").alias("total_len"))
    # localCheckpoint barrier (the repo's lineage-cut convention): the
    # posting relation is candidate-sized (|matched docs| x |query|),
    # and BOTH consumers — the per-doc score and the per-term df —
    # read it. Without the barrier Catalyst re-derives the second
    # consumer from the corpus (a second full scan + explode +
    # aggregate, measured 3 scans / 4 exchanges at sf0.1); with it,
    # the corpus is scanned once for postings and once (text column
    # only) for the 1-row stats aggregate.
    posting = (dld.select("doc_id", "dl",
                          F.explode("toks").alias("term"))
               .filter(F.col("term").isin(*query_terms))
               .groupBy("doc_id", "dl", "term")
               .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
               .localCheckpoint(eager=True))
    dfreq = posting.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"))
    scored = (posting
              .join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(stats))
              .withColumn("idf_e7", idf_e7(F.col("n_docs"), F.col("df")))
              .withColumn("contrib_e6", bm25_contrib_e6_expr()))
    return (scored.groupBy("doc_id")
            .agg(F.sum("contrib_e6").cast("bigint").alias("score_e6"),
                 F.count(F.lit(1)).cast("int").alias("n_terms")))


def topk_with_rank(df: DataFrame, order_cols: list[Column], k: int,
                   rank_alias: str = "rnk") -> DataFrame:
    """Top-k WITH a rank column, shuffle-shaped for serving: the cut
    itself is orderBy+limit (TakeOrderedAndProject — per-partition
    heaps, k rows to the driver, never a global sort), and the rank
    is a row_number over the ALREADY k-row result, so the single-
    partition window touches k rows, not the corpus (the mmr_rerank
    shortlist convention)."""
    cut = df.orderBy(*order_cols).limit(k)
    w = Window.orderBy(*order_cols)
    return cut.withColumn(rank_alias, F.row_number().over(w).cast("int"))


def rrf_fuse(sparse: DataFrame, dense: DataFrame,
             k_rrf: int = 60) -> DataFrame:
    """Reciprocal-rank fusion of two rank lists (Cormack et al. 2009):
    rrf(d) = sum over lists of 1/(k + rank_d). Exact-rational form:
    both lists -> (2k + rs + rd) / ((k+rs)*(k+rd)); one list ->
    1/(k+r) — integer numerator over positive integer denominator,
    emitted through round_ratio6 (the integer half-away recipe), so
    the fused ordering is engine-exact. Inputs: (id, rnk) relations;
    both are top-k lists, so the join is list-sized — broadcast."""
    s = sparse.select(F.col("id"), F.col("rnk").alias("rs"))
    d = dense.select(F.col("id"), F.col("rnk").alias("rd"))
    fused = s.join(d, "id", "full_outer")
    num = (F.when(F.col("rs").isNotNull() & F.col("rd").isNotNull(),
                  2 * k_rrf + F.col("rs") + F.col("rd"))
           .otherwise(F.lit(1)))
    den = (F.when(F.col("rs").isNotNull() & F.col("rd").isNotNull(),
                  (k_rrf + F.col("rs")) * (k_rrf + F.col("rd")))
           .when(F.col("rs").isNotNull(), k_rrf + F.col("rs"))
           .otherwise(k_rrf + F.col("rd")))
    return fused.select(
        "id", "rs", "rd",
        round_ratio6(num.cast("bigint"), den.cast("bigint")).alias("rrf"))


def margin_mine(x: DataFrame, y: DataFrame, vec_col: str,
                x_id: str, y_id: str, k: int = 4) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019, the
    'distance' margin): for every x, score each y by
    margin(x,y) = cos(x,y) - (avgF_k(x) + avgB_k(y)) / 2,
    where avgF is x's mean top-k cosine into Y and avgB is y's mean
    top-k cosine into X — the neighborhood-normalized score that
    separates true translations from hubs — then keep each x's best
    y with margin > 0.

    All-integer exactness: cosines are snapped once to
    sim_e6 = floor(cos*1e6 + 0.5) BIGINT (identical in both engines
    given the soaked cosine doubles). The neighborhood means use the
    ACTUAL neighbor counts cf = min(k, |Y|), cb = min(k, |X|) — the
    Artetxe-Schwenk mean-of-top-k definition — not a fixed 2k
    divisor that would implicitly score missing neighbors as 0
    cosine and inflate margins on small sides (r8 ADVICE). The
    margin is the exact rational
    (2*cf*cb*sim_e6 - cb*sumF - cf*sumB) / (2*cf*cb*1e6); within an
    x-partition cf is constant and cb varies, so the rank key is the
    numerator scaled by lcm(1..k) DIV cb — an exact integer with a
    partition-constant denominator (cb | lcm(1..k) always), so the
    ordering and the margin>0 cut are both integer decisions. The
    emitted 6-decimal margin is round_ratio6 of the rational. No
    float ever re-enters the ranking. When both sides have >= k
    rows the algebra reduces to the fixed-2k form bit-for-bit.

    Scale shape: X is the mining batch (bounded — callers subsample
    deterministically), broadcast against ONE scan of Y; the pair
    relation is |X|*|Y| scored in codegen and shuffled twice for the
    two k-NN windows (partitioned by x and by y — never a global
    window). At corpus scale the production path prunes Y per x
    through the IVF cell index first (operators/similarity.ivf_topk);
    the margin algebra is unchanged.
    """
    # norms hoisted per vector (r13): same doubles as cosine()'s
    # inline folds, computed once per side instead of per pair
    xs = x.select(F.col(x_id).alias("xid"),
                  as_double_array(F.col(vec_col)).alias("xv"))
    xs = xs.withColumn("xn", l2_norm(F.col("xv")))
    ys = y.select(F.col(y_id).alias("yid"),
                  as_double_array(F.col(vec_col)).alias("yv"))
    ys = ys.withColumn("yn", l2_norm(F.col("yv")))
    # localCheckpoint barrier: THREE consumers read the pair relation
    # (forward k-NN, backward k-NN, the margin join) and without the
    # barrier Catalyst rebuilds the broadcast-join + 64-dim cosine
    # for each one (measured 3 BroadcastNestedLoopJoins / 6 scans).
    # The materialized rows are the snapped integers only (xid, yid,
    # sim_e6 — 24 bytes/pair, the same volume the two windows already
    # shuffle), so the barrier costs one pair-write and saves two
    # full cosine passes.
    pairs = (ys.crossJoin(F.broadcast(xs))
             .select("xid", "yid",
                     F.floor(dot(F.col("xv"), F.col("yv"))
                             / (F.col("xn") * F.col("yn"))
                             * F.lit(1e6) + F.lit(0.5))
                     .cast("bigint").alias("sim_e6"))
             .localCheckpoint(eager=True))
    return margin_from_pairs(pairs, k)


def margin_from_pairs(pairs: DataFrame, k: int = 4) -> DataFrame:
    """The margin algebra of :func:`margin_mine` over an already-
    scored (xid, yid, sim_e6) pair relation — shared with the
    IVF-pruned form, where ``pairs`` holds only each x's probed-cell
    candidates and the neighborhood means are candidate-set
    normalized (the standard mine-within-retrieved approximation;
    both engines replay the identical pruning, so the decision
    integers agree)."""
    import math as _math
    lcm_k = _math.lcm(*range(1, k + 1))
    wf = Window.partitionBy("xid").orderBy(F.desc("sim_e6"), F.asc("yid"))
    wb = Window.partitionBy("yid").orderBy(F.desc("sim_e6"), F.asc("xid"))
    fwd = (pairs.withColumn("rf", F.row_number().over(wf))
           .filter(F.col("rf") <= k)
           .groupBy("xid").agg(F.sum("sim_e6").alias("sum_f"),
                               F.count(F.lit(1)).alias("cnt_f")))
    bwd = (pairs.withColumn("rb", F.row_number().over(wb))
           .filter(F.col("rb") <= k)
           .groupBy("yid").agg(F.sum("sim_e6").alias("sum_b"),
                               F.count(F.lit(1)).alias("cnt_b")))
    scored = (pairs.join(fwd, "xid").join(bwd, "yid")
              .withColumn(
                  "m_num",
                  2 * F.col("cnt_f") * F.col("cnt_b") * F.col("sim_e6")
                  - F.col("cnt_b") * F.col("sum_f")
                  - F.col("cnt_f") * F.col("sum_b"))
              # rank key: m_num scaled to the partition-constant
              # denominator 2*cf*lcm(1..k)*1e6 (cb | lcm always, so
              # the DIV is exact)
              .withColumn("m_key",
                          F.col("m_num")
                          * F.expr(f"{lcm_k}L DIV cnt_b")))
    best = Window.partitionBy("xid").orderBy(
        F.desc("m_key"), F.asc("yid"))
    return (scored.withColumn("__r", F.row_number().over(best))
            .filter((F.col("__r") == 1) & (F.col("m_num") > 0))
            .select("xid", "yid",
                    (F.col("sim_e6").cast("double") / F.lit(1e6))
                    .alias("sim"),
                    round_ratio6(F.col("m_num"),
                                 (2 * F.col("cnt_f") * F.col("cnt_b")
                                  * F.lit(1_000_000)).cast("bigint"))
                    .alias("margin")))


def ndcg_discounts_e9(k: int = 10) -> list[int]:
    """The NDCG position discounts 1/log2(rank+1) as integer 1e-9
    units, computed ONCE in Python and embedded as identical literals
    in the Spark plan and the oracle SQL (the shared-constant
    pattern) — so no engine ever evaluates log2 and the metric is
    exact-integer end to end. D[0] is rank 1."""
    import math
    return [round(1e9 / math.log2(r + 1)) for r in range(1, k + 1)]


def bm25_scores_batch(docs: DataFrame, queries: dict[int, list[str]],
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Batched BM25: Q queries answered in ONE corpus pass — the
    lexical twin of the dense batched-ANN serving shape
    (sim_topk_batch_queries): re-scanning 100 TB per query is the
    anti-pattern batching exists to kill.

    One posting relation filtered to the UNION of all queries' terms
    (then checkpointed — the bm25_scores barrier rationale), ONE
    global df per term (df is query-independent), and a broadcast
    (query_id, term) map whose join fans each posting out to every
    query containing its term. Scores are the same exact 1e-6
    integers as bm25_scores, per (query_id, doc). Output:
    (query_id, doc_id, score_e6, n_terms)."""
    all_terms = sorted({t for ts in queries.values() for t in ts})
    qmap = docs.sparkSession.createDataFrame(
        [(q, t) for q, ts in sorted(queries.items()) for t in ts],
        "query_id int, term string")
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       tokens(F.col(text_col)).alias("toks"))
    dld = toks.select("doc_id", F.size("toks").alias("dl"), "toks")
    stats = dld.agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("dl").cast("bigint").alias("total_len"))
    posting = (dld.select("doc_id", "dl",
                          F.explode("toks").alias("term"))
               .filter(F.col("term").isin(*all_terms))
               .groupBy("doc_id", "dl", "term")
               .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
               .localCheckpoint(eager=True))
    dfreq = posting.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"))
    scored = (posting
              .join(F.broadcast(qmap), "term")
              .join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(stats))
              .withColumn("idf_e7", idf_e7(F.col("n_docs"), F.col("df")))
              .withColumn("contrib_e6", bm25_contrib_e6_expr()))
    return (scored.groupBy("query_id", "doc_id")
            .agg(F.sum("contrib_e6").cast("bigint").alias("score_e6"),
                 F.count(F.lit(1)).cast("int").alias("n_terms")))
