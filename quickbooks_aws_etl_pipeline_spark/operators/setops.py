"""Set operations (SURVEY.md §2.7).

The reference's only set op is the pagination accumulation
``all_data.extend(page)`` (qb_billpayments.py:77) — a UNION ALL of
homogeneous page tables. ``unionByName`` is the faithful mapping
(column-name aligned, not positional), with
``allowMissingColumns=True`` covering pages whose inferred schema
lacks sparse fields (SURVEY.md §1: json_normalize drops absent keys).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_pages(pages: list[DataFrame], allow_missing: bool = True) -> DataFrame:
    """UNION ALL over page DataFrames (S1 `scan_paged_union`)."""
    if not pages:
        raise ValueError("no pages to union")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), pages)
