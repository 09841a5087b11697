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


def test_bench_is_single_json_line_shape():
    """bench.py must print exactly one JSON object (the driver parses
    stdout's last line); statically assert the only print is the
    json.dumps call."""
    tree = ast.parse(open(os.path.join(ROOT, "bench.py")).read())
    prints = [n for n in ast.walk(tree)
              if isinstance(n, ast.Call)
              and getattr(n.func, "id", "") == "print"]
    assert len(prints) == 1
