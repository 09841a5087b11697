"""The driver runs bench.py under a hard timeout; these checks keep
the bench surface wired to the registry without executing it."""

from __future__ import annotations

import ast
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_headline_keys_all_registered():
    import sys
    sys.path.insert(0, ROOT)
    import bench
    from quickbooks_aws_etl_pipeline_spark.plans import QUERIES
    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"bench HEADLINE names unknown keys: {missing}"


def test_bench_prints_detail_then_contract_line():
    """bench.py prints exactly two JSON lines: the noise-diagnostic
    detail (also persisted to .scratch/bench_detail.json) and LAST
    the compact contract object; statically assert both prints wrap
    json.dumps."""
    tree = ast.parse(open(os.path.join(ROOT, "bench.py")).read())
    prints = [n for n in ast.walk(tree)
              if isinstance(n, ast.Call)
              and getattr(n.func, "id", "") == "print"]
    assert len(prints) == 2


def test_bench_final_line_fits_driver_capture():
    """The driver records only the LAST 2000 CHARACTERS of bench
    stdout — BENCH_r05..r09 all carry parsed:null because the round-5
    diagnostics pushed the single line past that window and truncated
    the queries dict out of five rounds of artifacts. Pin the fix:
    the worst-case compact contract line over the CURRENT headline
    set must fit the window with margin, so adding headliners without
    re-checking this budget is a red test, not a silently unreadable
    artifact."""
    import json
    import sys
    sys.path.insert(0, ROOT)
    import bench
    worst = json.dumps({
        "metric": "headline_queries_wall_sec",
        "value": 99999.999,
        "unit": "sec",
        "queries": {k: 999.999 for k in bench.HEADLINE},
        "sf": 0.1,
    }, separators=(",", ":"))
    assert len(worst) <= 1950, (
        f"bench contract line worst-case {len(worst)} chars exceeds "
        "the driver's 2000-char stdout capture (minus margin): trim "
        "or shorten the HEADLINE set")
