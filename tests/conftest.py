from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quickbooks_aws_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

# ---------------------------------------------------------------------------
# Fast/slow tiers (r14 verdict item 2). The full suite takes 22-33
# minutes — past the driver's verify budget, so VERIFY_r14 truncated
# mid-suite and reported tests_ok: false with zero failures. The
# DEFAULT run is the fast tier and must finish well inside the
# budget; `SPARK_GRAFT_FULL_TESTS=1 python -m pytest tests/` runs
# everything (the pre-round gate used by the builder).
#
# The fast tier keeps, unconditionally: every non-key-parametrized
# test not explicitly marked slow, the full sf0.01 driver-window
# preflight, and — for the four key-parametrized batteries
# (registry-oracle sf0.001, plan audit, money ties, rows-only) — the
# keys the driver can actually turn red this round or recently could:
#   * the ACTIVE sweep window (includes every key touched this round),
#   * the PREVIOUS round's window (the keys rotated out — r14 verdict
#     item 9: they must stay internally checked),
#   * the bench HEADLINE set (every key the driver times),
#   * the next-round rotation head (keys added/changed mid-round).
# Everything else in those batteries is deselected by default; the
# tests themselves are unchanged, so the full tier runs the exact
# same assertions.
# ---------------------------------------------------------------------------

_KEY_BATTERIES = {
    "test_query_matches_oracle",
    "test_rows_only_queries_run",
    "test_registry_wide_no_scale_killers",
    "test_money_key_bit_identical_at_sf001",
}

# The static plan-shape battery drops the previous-round window from
# its fast set (unlike the ORACLE battery, which keeps it per r14
# verdict item 9): a plan-shape regression needs a code change, and
# changed keys are in the ACTIVE window/head by the standing process.
_PLAN_ONLY_BATTERIES = {"test_registry_wide_no_scale_killers"}


def _fast_keys() -> tuple[set[str], set[str]]:
    import bench
    from quickbooks_aws_etl_pipeline_spark.plans import (
        _ACTIVE_WINDOW, _ROUND14_WINDOW, _ROUND16_ROTATION_HEAD)
    plan_fast = (set(_ACTIVE_WINDOW) | set(_ROUND16_ROTATION_HEAD)
                 | set(bench.HEADLINE))
    return plan_fast | set(_ROUND14_WINDOW), plan_fast


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: full-tier only (set SPARK_GRAFT_FULL_TESTS=1 to run)")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    fast, plan_fast = _fast_keys()
    kept, dropped = [], []
    for item in items:
        if item.get_closest_marker("slow"):
            dropped.append(item)
            continue
        base = item.name.split("[", 1)[0]
        if base in _KEY_BATTERIES:
            allowed = plan_fast if base in _PLAN_ONLY_BATTERIES else fast
            params = getattr(item, "callspec", None)
            key = params.params.get("name") if params else None
            if key is not None and key not in allowed:
                dropped.append(item)
                continue
        kept.append(item)
    if dropped:
        config.hook.pytest_deselected(items=dropped)
        items[:] = kept


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("qbo-spark-tests", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "8",
                                  "spark.ui.enabled": "false",
                                  "spark.driver.memory": "4g"})
    yield spark


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
