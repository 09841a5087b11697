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

# Box-speed decoder (r12 verdict task 2). Three consecutive driver
# rounds produced totals contaminated by box state (r10 53.1 ->
# r11 55.0 -> r12 69.4 s with untouched keys moving +15-62% while
# others sat bit-flat). The decoder: six CALIBRATION keys — stable
# r10->r12, untouched by any commit since r10, spanning the plan
# shapes that contention hits (scheduling-bound compositions, LSH
# bucket joins, streaming micro-batch, single-stage scans) — with
# their r10 DRIVER values pinned here as constants. Every bench run
# emits calib_ratio (this run / r10 driver, per key) and box_factor
# (their median) INSIDE the final contract line, so any round's
# total carries its own decoder: divide the total by box_factor to
# box-normalize, and if box_factor ~ 1 while the total still
# exceeds ~55 s, that is a genuine code regression to profile, not
# box drift to explain.
_CALIB_R10 = {
    "text_bm25_topk": 0.534,
    "text_heaps_law": 0.674,
    "select_kcenter_coreset": 2.761,
    "select_importance_resample": 1.105,
    "stream_session_window": 0.383,
    "dedup_minhash_lsh": 2.017,
}

# Parallel-capacity canary (r14 verdict item 3). The single-thread
# spin probe cannot see host steal that cuts PARALLEL capacity only:
# across r14, 32-way stages episodically ran 3-5x slow while the
# probe stayed clean, so rep_contaminated under-flagged and
# box_factor under-corrected. The canary is a fixed one-task-per-core
# Spark stage (task count = $SPARK_GRAFT_CPUS, so the expected wall
# is one task's spin + scheduling overhead at EVERY core count the
# driver benches) whose every task spins a constant amount of CPU:
# healthy, it finishes in ~_CANARY_REF_SEC; with parallel capacity
# cut k-fold its wall stretches ~k-fold. It runs once per headline
# key AFTER that key's timed reps (outside the timed region — the
# methodology of the reps themselves is unchanged), lands per key in
# the sidecar, and the contract line carries canary_factor = median
# per-key canary / _CANARY_REF_SEC with box_factor =
# max(calibration median, canary_factor) — the conservative decoder
# over both channels.
_CANARY_REF_SEC = 0.50  # healthy local[32] median, measured on this
                        # box in a quiet window (spread 0.42-0.62
                        # over 10 reps; c8 measures the same because
                        # tasks == cores). A healthy run reads ~1.0;
                        # the r14-style 3-5x parallel-capacity steal
                        # reads 3+ while the single-thread probe
                        # stays clean.


def _canary_task(_: int) -> int:
    # ~100 ms of pure-Python integer spin per task: large enough that
    # the stage wall is CPU-capacity-bound, not scheduling-bound (at
    # 400k adds the ~0.4 s task-dispatch overhead swamped the signal)
    x = 0
    for j in range(3_000_000):
        x += j
    return x


def parallel_canary(spark, n_tasks: int) -> float:
    t = time.perf_counter()
    (spark.sparkContext.parallelize(range(n_tasks), n_tasks)
     .map(_canary_task).count())
    return time.perf_counter() - t


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
    # round-4 scale stars: sub-document dedup, sketch-as-data,
    # batched ANN serving
    "dedup_segment_corpus",
    "sketch_count_min",
    "sim_topk_batch_queries",
    # round-5: ExactSubstr span-level dedup
    "dedup_duplicate_spans",
    # round-5 session 2: the zero-shuffle hashing-trick featurizer
    # and the end-to-end curation composition
    "text_hash_embedding",
    "pipeline_corpus_curation",
    # round-6: the 128-bit span-dedup production tier, DSIR
    # importance resampling, and the node-sampled triangle census
    "dedup_duplicate_spans_fp",
    "select_importance_resample",
    "graph_triangle_count_sampled",
    # round-7: the crawl-batch curation composition (bloom ->
    # incremental minhash -> span-FP rewrite -> Gopher gate), the
    # SemDeDup manifest, integer-exact k-center coreset, MMR rerank,
    # and regex sequence-pattern mining
    "pipeline_crawl_refresh",
    "dedup_semantic_cells",
    "select_kcenter_coreset",
    "sim_mmr_rerank",
    "events_sequence_patterns",
    # round-7 session 3: the rank-sum AUC (distributed-histogram
    # idiom) and the two-LM excess-loss selection (ReusedExchange)
    "eval_auc_rank",
    "select_excess_loss",
    # round-8: the composed NB train->eval classifier loop, the
    # domain-cap curation stage (one shared source exchange), the
    # domain-mix report, and the closed-region LEFT OUTER interval
    # join (batch twin of the watermarked stream-stream join)
    "pipeline_classifier_loop",
    "curate_domain_caps",
    "stats_domain_mix",
    "stream_stream_join_outer",
    "mixture_domain_reweight",
    "eval_auc_bootstrap_ci",
    "pipeline_domain_curation",
    # round-8 session 2: the retrieval/serving tier — exact-integer
    # BM25 lexical top-k, the hybrid lexical+dense RRF fusion, and
    # the composed RAG serving path (chunk -> BM25 -> fuse -> cap)
    "text_bm25_topk",
    "sim_hybrid_rrf",
    "pipeline_rag_retrieval",
    # round-9: window-free hard-negative mining (conditional max_by),
    # its composed IVF-pruned serving form, the paired
    # model-comparison statistics, and the memorization-span audit
    "pairs_hard_negatives",
    "pairs_hard_negatives_ivf",
    "eval_classifier_agreement",
    "eval_memorization_spans",
    # round-9 session continuation: snapshot diff, UniMax
    # waterfilling, LPA communities, Spearman rank correlation
    "stats_corpus_diff",
    "mixture_unimax_budget",
    "graph_label_propagation",
    "eval_rank_correlation",
    # round-10: window-free radius search (min_by fold) and its
    # composed IVF-pruned serving form
    "sim_range_search",
    "sim_range_search_ivf",
    # round-10 session 2: the pattern-mining pack — multi-source BFS,
    # Apriori basket pairs, bucket-pruned Pareto skyline, time-decay
    # attribution, per-source winsorization
    "graph_bfs_distances",
    "mining_basket_pairs",
    "query_pareto_skyline",
    "attribution_time_decay",
    "curate_winsorize_scores",
    # round-10 session 2 batch 2+: distribution statistics and the
    # binary-code ANN / Heaps-law / weighted-SSSP keys. The five
    # OVERHEAD-DOMINATED session keys (chi-square, t-closeness,
    # mapInArrow, grouped-agg UDF, Neyman — all <0.35 s at sf0.1,
    # i.e. ~pure fixed session cost) are oracle-verified and probed
    # but NOT headlined: their bench signal is nil and the driver
    # records only the last 2000 chars of stdout, so the headline
    # line must stay inside that window (see the output note below).
    "dq_ks_drift",
    "sim_hamming_topk",
    "text_heaps_law",
    "graph_weighted_sssp",
    # round-14 (r13 verdict task 2): headline the two biggest r13
    # rewrite wins — the learned-IVF path (spherical_kmeans wide
    # aggregate, -80% at sf0.1) and the embedding near-dup pair join
    # (per-vector norm hoist, -65%) — so the improvements carry a
    # driver-measured, box_factor-normalized receipt instead of a
    # local-only A/B. Contract line stays inside the 2000-char
    # capture via the step-down fallbacks below.
    "sim_topk_cosine_ivf_learned",
    "dedup_embedding_cosine",
]


def fit_contract_line(contract: dict, timings: dict,
                      limit: int = 1990) -> str:
    """The driver records only the LAST 2000 chars of stdout; a
    truncated HEAD loses the queries dict (BENCH_r05..r09 lesson).
    Degrade in steps until the line fits, re-checking after each:
    (1) 2-decimal query values; (2) drop the per-key calib_ratio (it
    stays in the detail sidecar and the earlier stdout line —
    box_factor alone decodes the total); (3) 1-decimal query values;
    (4) last resort as HEADLINE grows: drop the queries dict
    entirely (preserved in the sidecar) — the metric/value/sf/
    box_factor head, which the driver parses, always fits.
    Extracted so tests/test_bench_contract.py can pin the worst-case
    behavior of the CHAIN, not just the undegraded first line."""
    line = json.dumps(contract, separators=(",", ":"))
    if len(line) > limit:
        contract["queries"] = {k: round(v, 2) for k, v in timings.items()}
        line = json.dumps(contract, separators=(",", ":"))
    if len(line) > limit:
        contract.pop("calib_ratio", None)
        line = json.dumps(contract, separators=(",", ":"))
    if len(line) > limit:
        contract["queries"] = {k: round(v, 1) for k, v in timings.items()}
        line = json.dumps(contract, separators=(",", ":"))
    if len(line) > limit:
        contract.pop("queries", None)
        line = json.dumps(contract, separators=(",", ":"))
    return line


def main() -> None:
    # global wall budget, counted from PROCESS START and covering the
    # warm-up too (r14 hardening): the driver kills bench at ~590 s,
    # and the box shows episodes where host-level steal cuts the
    # PARALLEL capacity 3-5x while the single-thread spin probe stays
    # clean — under such an episode the old timed-phase-only deadline
    # (start_of_timed + 420 s) let warm-up overruns push the process
    # past the driver timeout and lose the WHOLE contract line (one
    # empty-output run observed this session). Budgets: warm-up stops
    # consuming keys past t0+240 s (an unwarmed key's first timed rep
    # doubles as its warm-up; min-of-N absorbs the compile cost), and
    # the rep hunt ends at t0+540 s. On a healthy box neither bound
    # binds and the methodology is unchanged.
    t0 = time.perf_counter()
    warmup_deadline = t0 + 240.0
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
        if time.perf_counter() > warmup_deadline:
            break  # degraded warm-up beats a driver-killed process
        QUERIES[name](spark, SF_DIR).count()

    # min-of-N timed runs per query with noise-adaptive N. The box
    # shows episodic CPU steal lasting tens of seconds (NOTES.md:
    # identical plans measured 1 s and 51 s in adjacent reps), so two
    # defenses beyond plain min-of-N:
    #  1. a calibrated pure-Python spin probe detects an active steal
    #     episode; reps wait (bounded by a global budget) until the
    #     probe runs at its clean speed again;
    #  2. the stop rule requires the two SMALLEST reps to agree within
    #     25% — two reps that are merely equal (both stolen) don't
    #     stop the loop; up to 6 reps hunt for a clean window.
    # Round-5 change (VERDICT.md r4 #4): a PINNED MINIMUM of 4 timed
    # reps per query — r4's adaptive N produced 2-3 reps for queries
    # r3 measured with 4, making the round-over-round delta
    # unreadable (first-rep noise was 20-50%). The agreement rule now
    # only stops the hunt once >= 4 reps exist; the deadline guard
    # still degrades rep count under sustained steal rather than
    # letting the driver kill the process.
    # min is the engine's actual cost; the per-query rep spread is
    # reported alongside so a noisy official number is visible as such.
    def spin() -> float:
        t0 = time.perf_counter()
        x = 0
        for i in range(2_000_000):
            x += i
        return time.perf_counter() - t0

    clean = min(spin() for _ in range(5))
    n_cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32") or "32")
    parallel_canary(spark, n_cores)  # uncounted: python-worker spawn
    canary_clean = min(parallel_canary(spark, n_cores) for _ in range(3))
    wait_budget = 180.0
    # hard deadline for the rep hunt, from PROCESS start (see the
    # budget note at the top of main): under sustained steal the hunt
    # degrades to fewer reps, never to a killed process
    deadline = t0 + 540.0

    def wait_for_quiet() -> None:
        nonlocal clean, wait_budget
        while wait_budget > 0 and time.perf_counter() < deadline:
            s = spin()
            clean = min(clean, s)
            if s <= 2.0 * clean:
                return
            time.sleep(2.0)
            wait_budget -= 2.0

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    contaminated: dict[str, list[bool]] = {}
    clean_min: dict[str, float | None] = {}
    canary_sec: dict[str, float] = {}
    for name in names:
        reps: list[float] = []    # every rep (min over these is safe:
        clean_reps: list[float] = []  # steal only ever slows a rep)
        flags: list[bool] = []    # per-rep: post-rep probe saw steal
        for rep in range(6):
            if reps and time.perf_counter() > deadline:
                break  # past the deadline: keep what we have
            wait_for_quiet()
            # rep_start, NOT t0: t0 is the process-start anchor the
            # wall budgets above are computed from (r14 advice — the
            # reassignment worked only because both deadlines were
            # already bound)
            rep_start = time.perf_counter()
            df = QUERIES[name](spark, SF_DIR)
            df.count()  # full materialization of the aggregate
            dt = time.perf_counter() - rep_start
            reps.append(dt)
            # an episode that STARTED mid-rep contaminates it: probe
            # again after the rep; only uncontaminated reps count
            # toward the agreement stop rule
            post = spin()
            clean = min(clean, post)
            dirty = post > 2.0 * clean
            flags.append(dirty)
            if not dirty:
                clean_reps.append(dt)
            if len(reps) >= 4 and len(clean_reps) >= 2:
                lo = sorted(clean_reps)[:2]
                if lo[1] / lo[0] <= 1.25:
                    break
        timings[name] = round(min(reps), 4)
        spread[name] = [round(r, 4) for r in reps]
        contaminated[name] = flags
        clean_min[name] = (round(min(clean_reps), 4)
                           if clean_reps else None)
        # parallel-capacity canary, once per key, OUTSIDE the timed
        # reps (the timed methodology is unchanged); skipped past the
        # deadline so it can never cost the contract line
        if time.perf_counter() < deadline:
            c = parallel_canary(spark, n_cores)
            canary_clean = min(canary_clean, c)
            canary_sec[name] = round(c, 4)

    total = round(sum(timings.values()), 4)
    # dedup_minhash_lsh flatters the aggregate ratio vs the DuckDB
    # baseline (Spark runs the banded-LSH plan ~12x faster than DuckDB
    # executes the same SQL), so the total is ALSO reported with it
    # excluded — the honest overhead picture (VERDICT.md r4 #6).
    lsh_shaped = {"dedup_minhash_lsh", "pipeline_crawl_refresh"}
    total_excl_lsh = round(
        sum(v for k, v in timings.items() if k not in lsh_shaped), 4)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    # bench hygiene (r7 verdict task 7 + the round-10 find): the
    # driver records only the LAST 2000 CHARACTERS of bench stdout —
    # BENCH_r05..r09 all have parsed:null because the round-5
    # rep_spread diagnostics pushed the single JSON line past that
    # window and truncated its HEAD (the queries dict), leaving the
    # judge to reconstruct numbers from a fragment. The noise record
    # (per-rep spreads, contamination flags, clean minimums — the r7
    # machine-readable steal evidence) therefore moves to a sidecar
    # file plus a separate earlier stdout line, and the FINAL line is
    # the compact contract object only (separators without spaces,
    # 3-decimal values), sized to fit the 2000-char capture whole.
    detail = {
        "rep_spread": spread,
        "rep_contaminated": contaminated,
        "clean_min": clean_min,
        "spin_clean_sec": round(clean, 4),
        "n_queries_all_reps_contaminated": sum(
            1 for v in clean_min.values() if v is None),
        "total_excl_dedup_minhash_lsh": total_excl_lsh,
        "note": ("min-of-N per query, N pinned to >=4 timed reps; "
                 "rep_contaminated marks reps whose post-rep spin "
                 "probe saw CPU steal (clean_min = min over clean "
                 "reps, null if none); "
                 "total_excl_dedup_minhash_lsh strips the banded-LSH-"
                 "shaped queries (dedup_minhash_lsh and the crawl-"
                 "refresh composition that embeds the same SQL) where "
                 "Spark beats the DuckDB baseline ~12x, so the "
                 "aggregate ratio can be read without those outliers"),
    }
    # calibration block (r12 verdict task 2): per-key ratio vs the
    # pinned r10 driver reference + their median. Computed from the
    # same official min-of-reps numbers that enter the total.
    calib_ratio = {k: round(timings[k] / ref, 2)
                   for k, ref in _CALIB_R10.items() if k in timings}
    ratios = sorted(calib_ratio.values())
    calib_factor = (round(ratios[len(ratios) // 2], 2) if len(ratios) % 2
                    else round((ratios[len(ratios) // 2 - 1]
                                + ratios[len(ratios) // 2]) / 2, 2)
                    ) if ratios else None
    # canary channel (r14 verdict item 3): median per-key parallel
    # canary vs the pinned healthy reference; per-key flags mark the
    # keys whose post-rep canary ran > 2x the run's best canary (the
    # steal mode the single-thread probe is blind to)
    cvals = sorted(canary_sec.values())
    canary_factor = (round((cvals[len(cvals) // 2] if len(cvals) % 2
                            else (cvals[len(cvals) // 2 - 1]
                                  + cvals[len(cvals) // 2]) / 2)
                           / _CANARY_REF_SEC, 2)
                     if cvals else None)
    box_factor = (max(v for v in (calib_factor, canary_factor)
                      if v is not None)
                  if (calib_factor is not None
                      or canary_factor is not None) else None)
    detail["calib_ratio"] = calib_ratio
    detail["calib_factor"] = calib_factor
    detail["canary_sec"] = canary_sec
    detail["canary_clean_sec"] = round(canary_clean, 4)
    detail["canary_ref_sec"] = _CANARY_REF_SEC
    detail["canary_contaminated"] = {
        k: v > 2.0 * canary_clean for k, v in canary_sec.items()}
    detail["canary_factor"] = canary_factor
    detail["box_factor"] = box_factor
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".scratch", "bench_detail.json")
    os.makedirs(os.path.dirname(detail_path), exist_ok=True)
    with open(detail_path, "w") as fh:
        json.dump(detail, fh)
    print(json.dumps({"bench_detail": detail_path, **detail},
                     separators=(",", ":")))
    contract = {
        "metric": "headline_queries_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": float(sf) if sf else None,
        "calib_ratio": calib_ratio,
        "canary_factor": canary_factor,
        "box_factor": box_factor,
    }
    print(fit_contract_line(contract, timings))
    spark.stop()


if __name__ == "__main__":
    main()
