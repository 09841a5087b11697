"""Qkeys for the streaming surface (SURVEY.md §2.10), batch-mode
checked: the exact same transform functions run under
``readStream`` in tests/test_streaming.py; batch mode is what the
DuckDB oracle can verify (tumbling == GROUP BY epoch bucket, session
== gaps-and-islands), per SURVEY.md §5.1.

``stream_tumbling_agg_live`` is the true Structured Streaming run
(file source -> watermark -> window agg -> memory sink) registered as
a rows-only check — no SQL oracle for a live stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import read_table, table_path
from ..streaming.windows import (run_stream_to_memory, session_agg,
                                 sliding_agg, tumbling_agg)
from .queries import register


@register("stream_tumbling_agg")
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_agg(read_table(spark, sf_dir, "events"), minutes=10)


@register("stream_sliding_agg")
def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_agg(read_table(spark, sf_dir, "events"),
                       minutes=10, slide_minutes=5)


@register("stream_session_window")
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_agg(read_table(spark, sf_dir, "events"), gap_minutes=5)


@register("stream_tumbling_agg_live")
def stream_tumbling_agg_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real streaming execution of the same tumbling plan:
    file source -> 1h watermark -> window agg -> memory sink,
    availableNow trigger (rows-only check: live streams have no SQL
    oracle)."""
    import re
    tag = re.sub(r"[^A-Za-z0-9_]", "_", sf_dir)
    return run_stream_to_memory(
        spark, table_path(sf_dir, "events"),
        lambda ev: tumbling_agg(ev, minutes=10),
        query_name=f"live_tumbling{tag}",
        watermark="1 hour", output_mode="complete")
