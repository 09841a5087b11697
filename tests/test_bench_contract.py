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


def _worst_contract():
    """Worst-case contract the fallback chain could ever see: every
    query and calibration value at its widest printable width."""
    import bench
    timings = {k: 999.999 for k in bench.HEADLINE}
    return {
        "metric": "headline_queries_wall_sec",
        "value": 99999.999,
        "unit": "sec",
        "queries": dict(timings),
        "sf": 0.1,
        "calib_ratio": {k: 99.99 for k in bench._CALIB_R10},
        "canary_factor": 99.99,
        "box_factor": 99.99,
    }, timings


def test_bench_final_line_fits_driver_capture():
    """The driver records only the LAST 2000 CHARACTERS of bench
    stdout — BENCH_r05..r09 all carry parsed:null because the round-5
    diagnostics pushed the single line past that window and truncated
    the queries dict out of five rounds of artifacts. Pin the fix at
    the level that now enforces it: the step-down chain
    (bench.fit_contract_line) must bring the WORST-case line over
    the CURRENT headline set inside the capture with margin, so
    adding headliners without re-checking this budget is a red test,
    not a silently unreadable artifact."""
    import json
    import sys
    sys.path.insert(0, ROOT)
    import bench
    contract, timings = _worst_contract()
    line = bench.fit_contract_line(contract, timings)
    assert len(line) <= 1990, (
        f"degraded bench contract line still {len(line)} chars — "
        "exceeds the driver's 2000-char stdout capture (minus margin)")
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_wall_sec"
    assert parsed["value"] == 99999.999


def test_bench_degradation_keeps_queries_dict():
    """The step-down must reach a fitting line WITHOUT the last
    resort for the current HEADLINE size: per-key timings belong in
    the artifact (that is the bench's per-key receipt); dropping them
    is reserved for a future headline far past today's. If this goes
    red, trim the HEADLINE or accept the receipt moving entirely to
    the sidecar — but do it knowingly."""
    import json
    import sys
    sys.path.insert(0, ROOT)
    import bench
    contract, timings = _worst_contract()
    parsed = json.loads(bench.fit_contract_line(contract, timings))
    assert "queries" in parsed, (
        "worst-case degradation dropped the queries dict — HEADLINE "
        "has outgrown even the 1-decimal step")
    assert set(parsed["queries"]) == set(bench.HEADLINE)
