"""Preference queries (round 10): the 2-D Pareto skyline operator.

``skyline_2d`` returns the points of ``df`` not Pareto-dominated on
two integer metrics, both maximized: q dominates p iff q >= p on both
metrics and > on at least one. The plan is bucket-prune +
per-bucket-refine — NEVER the textbook all-pairs anti-join (that form
exists only as the DuckDB oracle of ``query_pareto_skyline``):

1. range-bucket m1 into <= ``buckets`` buckets off a broadcast 1-row
   min/max (ceiling-width buckets, max index (mx-mn) div w < buckets;
   a point in a strictly higher bucket has strictly greater m1 — the
   floor identity m1 < (b+1)*w <= q.m1);
2. the bucket-level suffix-max of m2 over strictly higher buckets (a
   <= ``buckets``-row relation, non-equi self-joined) eliminates any
   point some higher-bucket point weakly beats on m2 — almost
   everything, in one broadcast filter;
3. survivors refine within their bucket: group to distinct (bucket,
   m1) with max(m2), then a PER-BUCKET window (partitionBy bucket —
   parallel, never SinglePartition) takes the strictly-
   descending-m1 prefix max; a group survives iff no strictly-
   greater-m1 group in its bucket weakly beats its max m2, and the
   surviving rows are exactly the group members at that max.

Dominance checks against DROPPED points are safe to skip: dominance
is transitive, and a point dropped by the cross-bucket filter was
weakly beaten on m2 by a strictly-higher-m1 point, so any candidate
it would dominate is also killed by that same live witness.

Ties: equal (m1, m2) duplicates never dominate each other (no strict
inequality), so all of them survive together — the edge-case tests
(tests/test_mining_pack.py) pin this and the equal-m1 / equal-m2
chains against a brute-force reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, id_col: str, m1_col: str, m2_col: str,
               buckets: int = 1024) -> DataFrame:
    """``df``: one row per entity with integer metric columns
    ``m1_col``/``m2_col`` (both maximized). Returns (id, m1, m2) for
    the non-dominated set, original column names preserved."""
    m = df.select(F.col(id_col).alias("__id"),
                  F.col(m1_col).cast("bigint").alias("m1"),
                  F.col(m2_col).cast("bigint").alias("m2"))
    bounds = m.agg(F.min("m1").alias("mn"), F.max("m1").alias("mx"))
    pts = (m.crossJoin(F.broadcast(bounds))
           # ceiling width so the max bucket index stays < `buckets`
           # (floor width reached ~2*buckets-1 for awkward ranges —
           # harmless downstream but off the documented bound, r10
           # advice)
           .withColumn("wdt",
                       F.expr(f"(mx - mn) div {buckets} + 1"))
           .withColumn("bucket", F.expr("(m1 - mn) div wdt"))
           .select("__id", "m1", "m2", "bucket")
           .localCheckpoint(eager=False))
    bstat = pts.groupBy("bucket").agg(F.max("m2").alias("bmax2"))
    hi, lo = bstat.alias("hi"), bstat.alias("lo")
    suf = (lo.join(hi, F.col("hi.bucket") > F.col("lo.bucket"), "left")
           .groupBy(F.col("lo.bucket").alias("bucket"))
           .agg(F.max(F.col("hi.bmax2")).alias("suf2")))
    cand = (pts.join(F.broadcast(suf), "bucket")
            .filter(F.col("suf2").isNull() | (F.col("suf2") < F.col("m2"))))
    grp = cand.groupBy("bucket", "m1").agg(F.max("m2").alias("gmax2"))
    w = (Window.partitionBy("bucket").orderBy(F.desc("m1"))
         .rowsBetween(Window.unboundedPreceding, -1))
    skykeys = (grp.withColumn("pref", F.max("gmax2").over(w))
               .filter(F.col("pref").isNull()
                       | (F.col("pref") < F.col("gmax2")))
               .select(F.col("bucket").alias("sk_bucket"),
                       F.col("m1").alias("sk_m1"),
                       F.col("gmax2").alias("sk_m2")))
    return (cand.join(F.broadcast(skykeys),
                      (F.col("bucket") == F.col("sk_bucket"))
                      & (F.col("m1") == F.col("sk_m1"))
                      & (F.col("m2") == F.col("sk_m2")))
            .select(F.col("__id").alias(id_col),
                    F.col("m1").alias(m1_col),
                    F.col("m2").alias(m2_col)))
