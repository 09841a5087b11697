"""Graph analytics on relational edge lists (round 4).

Fixed-iteration PageRank over the customer<->supplier trade graph.
Two design decisions make this Spark-shaped AND oracle-checkable:

1. **Unrolled, not driver-looped state**: the iteration count is a
   small constant, so the whole computation is ONE declarative plan
   (joins + aggregates); the edge list is localCheckpoint'd once and
   re-used by every iteration instead of re-deriving the fact join
   per step. Per iteration the only shuffle is the groupBy(dst) on
   the edge-sized contribution frame — exactly the message-passing
   exchange a Pregel step costs, with map-side partial sums.

2. **Integer micro-unit arithmetic**: ranks live in units of 1e-12
   (BIGINT), contributions use floor division, and the damping step
   is ``150_000_000_000 + (17 * sum) div 20`` (0.85 = 17/20). Every
   operation is exact int64 — no float summation order, no decimal
   division scale rules — so DuckDB reproduces the ranks BIT FOR BIT
   via chained CTEs. (A double formulation would drift in the last
   ulps across partitionings; a decimal one hits engine-specific
   division scale derivation.)

Sums of contributions stay far inside int64: total mass is about
n_nodes * 1e12 and 17x that is < 2^63 for graphs up to ~5e5 nodes at
these unit sizes; callers scaling past that drop RANK_UNIT a decade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_UNIT = 1_000_000_000_000  # 1.0 of rank, in integer micro-units
_TELEPORT = 150_000_000_000    # 0.15 * RANK_UNIT


def pagerank_fixed(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """``edges``: directed (src, dst) pairs, already deduplicated.
    Returns (node, rank_units) after ``iterations`` damped rounds
    from a uniform start. Dangling nodes (no out-edges) keep only
    teleport mass — callers wanting undirected semantics pass both
    edge directions.
    """
    edges = edges.localCheckpoint(eager=False)
    # nodes is referenced by every iteration's left join — checkpoint
    # it too, or each unrolled step re-runs the union+distinct.
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=False))
    degree = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # (src, dst, out_deg) — the static message-routing table.
    routing = edges.join(degree, "src").localCheckpoint(eager=False)

    ranks = nodes.select("node", F.lit(RANK_UNIT).alias("rank_units"))
    for _ in range(iterations):
        contribs = (routing
                    .join(ranks, routing["src"] == ranks["node"])
                    .select(F.col("dst"),
                            F.expr("rank_units div out_deg")
                            .alias("contrib")))
        inflow = (contribs.groupBy("dst")
                  .agg(F.sum("contrib").alias("in_sum")))
        ranks = (nodes.join(inflow, nodes["node"] == inflow["dst"], "left")
                 .select("node",
                         (F.lit(_TELEPORT)
                          + F.expr("(17 * coalesce(in_sum, 0L)) div 20"))
                         .alias("rank_units")))
    return ranks
