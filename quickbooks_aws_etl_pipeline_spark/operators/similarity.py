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
