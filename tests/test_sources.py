"""Unit tests for the QBO ingest path (SURVEY.md §5.4): pagination
semantics, tree walker, explode_outer fidelity."""

from __future__ import annotations

from pyspark.sql import functions as F

from quickbooks_aws_etl_pipeline_spark.sources.fixtures import (
    BILL_PAGES, JOURNAL_PAGES, PNL_REPORT)
from quickbooks_aws_etl_pipeline_spark.sources.qbo import (
    entity_rows, fetch_pages, page_is_last, pages_to_df)
from quickbooks_aws_etl_pipeline_spark.sources.reports import (
    flatten_report_tree)


def test_page_termination_predicates():
    # canonical maxResults check (qb_billpayments.py:79)
    assert not page_is_last(BILL_PAGES[0], "Bill")
    assert page_is_last(BILL_PAGES[1], "Bill")
    # row-count fallback (qb_purchases.py:77)
    page = {"QueryResponse": {"Purchase": [{}] * 100}}
    assert not page_is_last(page, "Purchase")
    assert page_is_last({"QueryResponse": {"Purchase": [{}] * 7}}, "Purchase")


def test_fetch_pages_stub_stops_at_last():
    pages = fetch_pages("Bill", payloads=BILL_PAGES + BILL_PAGES)
    assert len(pages) == 2  # stops at the first short page


def test_pages_union_row_count(spark):
    df = pages_to_df(spark, BILL_PAGES, "Bill")
    assert df.count() == sum(len(entity_rows(p, "Bill")) for p in BILL_PAGES)
    # sparse column from page 2 is NULL-filled, not dropped
    assert "LinkedTxn" in df.columns


def test_tree_walker_emits_all_row_types():
    rows = flatten_report_tree(PNL_REPORT)
    kinds = {r[3] for r in rows}
    assert kinds == {"header", "detail", "summary"}
    # path accumulator concatenates with ' -> ' (qb_profit&loss.py:85)
    paths = [r[0] for r in rows]
    assert "Income -> Services -> Consulting" in paths
    # ''-amount headers coerce to NULL, non-numeric totals too
    by_path = {r[0]: r for r in rows}
    assert by_path["Income"][2] is None
    assert by_path["Income -> Services -> Training"][2] is None


def test_explode_outer_keeps_lineless_entries(spark):
    """pandas explode keeps empty-list rows as NaN => explode_outer is
    the faithful mapping (SURVEY.md §2.9 U1)."""
    df = pages_to_df(spark, JOURNAL_PAGES, "JournalEntry")
    exploded = df.select("Id", F.explode_outer("Line").alias("line"))
    assert exploded.count() == 3  # 2 lines + 1 line-less entry
    lineless = exploded.filter(F.col("line").isNull())
    assert [r.Id for r in lineless.collect()] == ["202"]
    # plain explode would drop it
    dropped = df.select("Id", F.explode("Line").alias("line"))
    assert dropped.count() == 2
