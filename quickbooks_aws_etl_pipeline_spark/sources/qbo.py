"""QuickBooks-Online-shaped ingest (SURVEY.md §2.1 S1-S2, §3 EP1).

The reference fetches entities over HTTPS with ``STARTPOSITION``
pagination (qb_billpayments.py:63-79) and flattens the JSON envelope
``{"QueryResponse": {"<Entity>": [...], "maxResults": N}}`` with
``pd.json_normalize`` (qb_billpayments.py:80). The live OAuth/HTTP
connector is out of engine scope (SURVEY.md §7) — this module owns
the *dataflow* semantics over already-fetched page payloads:

- page envelope -> entity rows (schema inferred by Spark's JSON
  reader, the analog of json_normalize's inference)
- union of ordered pages (S1)
- nested structs stay structs; dotted-path access replaces the
  reference's flattened `VendorRef.value` string columns

``fetch_pages`` is the connector stub: it raises unless given a local
payload source, and documents both of the reference's termination
predicates (maxResults == page_size vs len(rows) == page_size).
"""

from __future__ import annotations

import json
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession

from ..operators.setops import union_pages

PAGE_SIZE = 100  # QBO query endpoint page size (qb_billpayments.py:79)


def entity_rows(page_payload: dict, entity: str) -> list[dict]:
    """Extract one page's entity array from the QBO envelope
    (qb_bills.py:61)."""
    return page_payload.get("QueryResponse", {}).get(entity, [])


def page_is_last(page_payload: dict, entity: str) -> bool:
    """Both termination predicates from the reference: the canonical
    ``maxResults`` check (qb_billpayments.py:79) with the row-count
    check (qb_purchases.py:77) as fallback."""
    qr = page_payload.get("QueryResponse", {})
    if "maxResults" in qr:
        return qr["maxResults"] != PAGE_SIZE
    return len(entity_rows(page_payload, entity)) != PAGE_SIZE


def pages_to_df(spark: SparkSession, pages: Iterable[dict], entity: str) -> DataFrame:
    """S1: JSON pages -> one DataFrame via per-page JSON datasets +
    unionByName(allowMissingColumns=True) — faithful to the
    reference's extend-then-normalize (sparse fields missing from a
    page's inferred schema are NULL-filled, SURVEY.md §1)."""
    sc = spark.sparkContext
    dfs = []
    for page in pages:
        rows = entity_rows(page, entity)
        if not rows:
            continue
        # one slice per page: fixture pages are <=100 rows — spreading
        # them over default parallelism costs 32x task overhead
        dfs.append(spark.read.json(sc.parallelize([json.dumps(r) for r in rows], 1)))
    if not dfs:
        raise ValueError(f"no rows for entity {entity!r}")
    return union_pages(dfs)


def fetch_pages(entity: str, *, payloads: list[dict] | None = None) -> list[dict]:
    """Connector stub. A live implementation would loop
    GET /v3/company/{realm}/query?query=SELECT * FROM {entity}
    STARTPOSITION n with OAuth2 bearer auth (Quickbooks_API.py:15-36,
    qb_billpayments.py:63-79). This engine is parquet-in/parquet-out;
    pass ``payloads`` (e.g. test fixtures) explicitly."""
    if payloads is None:
        raise NotImplementedError(
            "live QBO connector out of scope; supply payloads= explicitly")
    out = []
    for p in payloads:
        out.append(p)
        if page_is_last(p, entity):
            break
    return out
