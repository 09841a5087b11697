#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from quickbooks_aws_etl_pipeline_spark.plans import QUERIES  # noqa: E402
from quickbooks_aws_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: joins/aggs spine + north-star ops; grows as the
# registry grows. Every name must exist in QUERIES.
HEADLINE = [
    "flagship_revenue_by_month_segment",
    "agg_group_sum",
    "agg_monthly_bucket",
    "join_5way_regional_revenue",
    "join_fact_dim_inner",
    "window_partition_sum",
    "sort_limit_topk",
    "json_extract_props",
    "stream_session_window",
    "text_tokenize_count",
    "doc_fingerprint",
    "dedup_minhash_lsh",
    "sim_topk_cosine",
]


def main() -> None:
    spark = get_spark("qbo-spark-bench",
                      extra_conf={"spark.driver.memory": "24g",
                                  "spark.ui.enabled": "false"})
    # one uncounted warm-up execution per query: JVM JIT + whole-stage
    # codegen compilation are one-time costs (~0.4-0.6 s per distinct
    # plan shape) that vanish on a long-lived cluster; the timed runs
    # measure steady-state engine throughput. Standard power-run
    # methodology (warm cache, compiled plans) — same data, same plan.
    names = [n for n in HEADLINE if n in QUERIES]
    for name in names:
        QUERIES[name](spark, SF_DIR).count()

    # min-of-N timed runs per query with noise-adaptive N: the box
    # shows episodic multi-second CPU steal (NOTES.md), so two reps
    # that disagree by >25% trigger up to two extra reps — a steal
    # episode spanning every rep of one query is what put a 9x
    # artifact in BENCH_r01. min is the engine's actual cost; the
    # per-query rep spread is reported alongside so a noisy official
    # number is visible as such.
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in names:
        reps: list[float] = []
        for rep in range(4):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, SF_DIR)
            df.count()  # full materialization of the aggregate
            reps.append(time.perf_counter() - t0)
            if rep >= 1 and max(reps) / min(reps) <= 1.25:
                break
        timings[name] = round(min(reps), 4)
        spread[name] = [round(r, 4) for r in reps]

    total = round(sum(timings.values()), 4)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(json.dumps({
        "metric": "headline_queries_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "rep_spread": spread,
        "sf": float(sf) if sf else None,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
