"""Vector similarity search over the ``embeddings`` table (SURVEY.md
§2.12 X3).

Brute-force cosine top-k is the baseline: a narrow map computing the
score (JVM-side fold over the array — no UDF, no shuffle) followed by
TakeOrderedAndProject (per-partition heaps, driver merge of k rows).
At 100 TB the score map scales linearly and the top-k never
materializes a global sort.

The scale path is IVF-style cell restriction: ``label`` is the coarse
quantizer cell, and the search prunes to the query's cell before
scoring — on a real deployment the cell column is a partition key so
pruning happens at the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right fold — deterministic double result."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(df: DataFrame, vec_col: str, id_col: str,
                query_vec: list[float], k: int = 10,
                round_digits: int = 6) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.

    The similarity is rounded before ranking so the float result is
    tolerance-stable across engines, and ties break on the unique id —
    the selected row set is fully deterministic.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = F.round(cosine(as_double_array(F.col(vec_col)), q), round_digits)
    return (df
            .select(F.col(id_col), sim.alias("sim"))
            .orderBy(F.desc("sim"), F.asc(id_col))
            .limit(k))


def fetch_query_vector(df: DataFrame, vec_col: str, id_col: str, qid) -> list[float]:
    """Driver-side single-row lookup of the query vector (not a data
    path — one row, one action)."""
    row = df.filter(F.col(id_col) == qid).select(vec_col).first()
    if row is None:
        raise KeyError(f"query id {qid!r} not found")
    return [float(x) for x in row[0]]


# --- IVF with a learned coarse quantizer (spherical k-means) ---------------

def _centroid_literal(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def assign_cell(vec_col: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid id by dot product with L2-normalized input —
    centroids are baked into the expression as literals, so assignment
    is a narrow codegen map: no join, no shuffle, scales to any row
    count. k*dim literals keep the generated method small for
    IVF-scale k (<=256 here; for k in the thousands, switch to a
    broadcast join against a centroid table)."""
    v = F.transform(vec_col, lambda x: x.cast("double"))
    n = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x),
                           F.lit(0.0), lambda acc, x: acc + x))
    sims = F.array(*[
        F.aggregate(F.zip_with(v, _centroid_literal(c), lambda x, y: x * y),
                    F.lit(0.0), lambda acc, x: acc + x) / n
        for c in centroids])
    return (F.array_position(sims, F.array_max(sims)) - 1).cast("int")


def spherical_kmeans(df: DataFrame, vec_col: str, id_col: str,
                     k: int = 8, iters: int = 5) -> list[list[float]]:
    """Deterministic distributed spherical k-means (Lloyd's):

    - seeds: the k vectors with the smallest md5(id) — content-stable,
      order-independent, spread by the hash;
    - assign: nearest-centroid literal map (zero shuffle);
    - update: explode components -> groupBy (cell, pos) mean -> the
      only shuffle per iteration, k*dim result rows to the driver.

    Only the k x dim model ever reaches the driver — the data path
    stays distributed at any scale.
    """
    from .text import md5_long

    # persist: every Lloyd's iteration (and the seed scan) re-reads
    # base — without the cache that is iters+1 full scans + casts of
    # the embeddings table
    base = df.select(F.col(id_col).alias("__id"),
                     F.transform(F.col(vec_col), lambda x: x.cast("double"))
                     .alias("__v")).persist()
    try:
        seeds = (base
                 .withColumn("__h", md5_long(F.col("__id").cast("string")))
                 .orderBy("__h").limit(k)
                 .select("__v").collect())
        centroids = [[float(x) for x in r[0]] for r in seeds]
        dim = len(centroids[0])
        for _ in range(iters):
            assigned = base.select(
                assign_cell(F.col("__v"), centroids).alias("__cell"),
                F.posexplode("__v").alias("__pos", "__x"))
            means = (assigned.groupBy("__cell", "__pos")
                     .agg(F.avg("__x").alias("__m"))
                     .collect())
            new = [list(c) for c in centroids]  # keep empty cells in place
            by_cell: dict[int, list[float]] = {}
            for r in means:
                by_cell.setdefault(r["__cell"], [0.0] * dim)[r["__pos"]] = r["__m"]
            for cell, vec in by_cell.items():
                norm = sum(x * x for x in vec) ** 0.5 or 1.0
                new[cell] = [x / norm for x in vec]
            centroids = new
        return centroids
    finally:
        base.unpersist()


def ivf_topk(df: DataFrame, vec_col: str, id_col: str,
             query_vec: list[float], centroids: list[list[float]],
             k: int = 10, nprobe: int = 2) -> DataFrame:
    """IVF search: score only the rows whose cell is among the query's
    ``nprobe`` nearest centroids. With the cell precomputed as a
    partition/cluster key, the filter becomes partition pruning and
    the scan touches nprobe/k of the data."""
    qn = sum(x * x for x in query_vec) ** 0.5 or 1.0
    q = [x / qn for x in query_vec]
    sims = [(i, sum(a * b for a, b in zip(q, c))) for i, c in enumerate(centroids)]
    probe = [i for i, _ in sorted(sims, key=lambda t: -t[1])[:nprobe]]
    celled = df.withColumn("__cell", assign_cell(F.col(vec_col), centroids))
    return cosine_topk(celled.filter(F.col("__cell").isin(probe)),
                       vec_col, id_col, query_vec, k=k)
