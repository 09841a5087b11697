"""Machine-checks the round-15 window flip's provenance claims.

The standing process says the sweep window is DERIVED, not typed:
rotation head (keys added/implementation-changed since the last cut)
+ the stalest driver-green keys, staleness computed from the union of
all CORRECTNESS_r*.json artifacts. This test re-derives that fill
from the artifacts on disk so a typo in the hand-written list (or a
silently dropped artifact) fails loudly instead of shipping a window
that skips a staler key.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

from quickbooks_aws_etl_pipeline_spark.plans import (
    _R15_STALE_FILL,
    _ROUND14_WINDOW,
    _ROUND15_ROTATION_HEAD,
    _ROUND15_WINDOW,
    QUERIES,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _artifacts(max_round: int) -> dict[str, int]:
    """Latest driver round per key from CORRECTNESS_r01..r{max_round}."""
    latest: dict[str, int] = {}
    files = sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")))
    if not files:
        pytest.skip("no CORRECTNESS artifacts on disk")
    for f in files:
        rnd = int(re.search(r"r(\d+)\.json$", f).group(1))
        if rnd > max_round:
            continue
        for key in json.load(open(f)):
            latest[key] = max(latest.get(key, 0), rnd)
    return latest


def test_r14_window_landed_green_and_set_equal():
    path = os.path.join(_REPO, "CORRECTNESS_r14.json")
    if not os.path.exists(path):
        pytest.skip("CORRECTNESS_r14.json not on disk")
    rows = json.load(open(path))
    assert set(rows) == set(_ROUND14_WINDOW)
    for key, v in rows.items():
        assert v["rows_match"] and v["schema_match"] and not v["err"], key
        assert v.get("hash_match") in (True, None), key


def test_r15_stale_fill_is_derived_from_artifacts():
    latest = _artifacts(max_round=14)
    head = set(_ROUND15_ROTATION_HEAD)
    stale = sorted(
        ((rnd, key) for key, rnd in latest.items() if key not in head),
    )
    expected = [key for _, key in stale[: len(_R15_STALE_FILL)]]
    assert _R15_STALE_FILL == expected


def test_r15_window_shape():
    assert len(_ROUND15_WINDOW) == 50
    assert len(set(_ROUND15_WINDOW)) == 50
    unknown = [k for k in _ROUND15_WINDOW if k not in QUERIES]
    assert not unknown
    # the curate swap actually happened: the registry iterates the
    # window first, so the driver's 50-key sweep is exactly it
    assert list(QUERIES)[:50] == _ROUND15_WINDOW
