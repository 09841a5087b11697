"""Structured Streaming surface (SURVEY.md §2.10).

The reference is batch-only; its monthly P&L loop
(qb_profit&loss.py:53-64) is time-partitioned batch. The engine adds
the streaming north star over the ``events`` table: tumbling /
sliding / session windows with watermarked late-data handling.

Every window aggregation is written as a plain DataFrame transform
usable in BOTH batch and streaming mode (same function, same plan) —
batch mode is what the DuckDB oracle checks; streaming mode is
exercised with file-source + availableNow + memory-sink round trips.

Output keys are epoch seconds (BIGINT) rather than window structs so
results are engine-portable.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import exact_sum
from ..io import normalize_event_time


def tumbling_agg(events: DataFrame, minutes: int = 10) -> DataFrame:
    """Tumbling event-time windows, keyed by (window start, type)."""
    w = F.window("ts", f"{minutes} minutes")
    return (events
            .groupBy(w.alias("w"), F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 exact_sum(F.col("value")).alias("sum_value"))
            .select(F.col("w.start").cast("long").alias("bucket_start_epoch"),
                    "event_type", "n_events", "sum_value"))


def static_enrich_agg(events: DataFrame, dim: DataFrame,
                      key: str = "user_id", dim_key: str = "c_custkey",
                      seg_col: str = "c_mktsegment") -> DataFrame:
    """Stream-static enrichment: events joined to a static dimension
    (broadcast — in Structured Streaming the static side is re-read
    and broadcast per micro-batch, the canonical stateless stream
    enrichment), then aggregated per (segment, event_type)."""
    return (events
            .join(F.broadcast(dim), events[key] == dim[dim_key])
            .groupBy(F.col(seg_col).alias("segment"), F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 exact_sum(F.col("value")).alias("sum_value")))


def sliding_agg(events: DataFrame, minutes: int = 10, slide_minutes: int = 5) -> DataFrame:
    """Sliding windows — each event lands in size/slide windows."""
    w = F.window("ts", f"{minutes} minutes", f"{slide_minutes} minutes")
    return (events
            .groupBy(w.alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 exact_sum(F.col("value")).alias("sum_value"))
            .select(F.col("w.start").cast("long").alias("bucket_start_epoch"),
                    "n_events", "sum_value"))


def session_agg(events: DataFrame, gap_minutes: int = 5) -> DataFrame:
    """Session windows per user: a session closes after gap_minutes of
    inactivity; start == first event's timestamp (so the batch oracle
    is the classic gaps-and-islands rewrite)."""
    w = F.session_window("ts", f"{gap_minutes} minutes")
    return (events
            .groupBy(w.alias("w"), F.col("user_id"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 exact_sum(F.col("value")).alias("sum_value"))
            .select("user_id",
                    F.col("w.start").cast("long").alias("session_start_epoch"),
                    "n_events", "sum_value"))


# --- true streaming runs ---------------------------------------------------

def _checkpoint_dir(name: str) -> str:
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    path = os.path.join(repo_root, ".scratch", "checkpoints", name)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


def stage_stream_source(events_path: str, query_name: str) -> str:
    """Stage the (read-only) parquet input for the FILE STREAM source:
    a fresh watched directory under .scratch containing symlinks to
    the data. A single-file input links directly; a DIRECTORY input
    (Spark-written parquet with part files — every scale-probe
    dataset) links each data file FLAT into the watched dir, because
    the file stream source does NOT list files nested one level below
    the watched directory — found live when an sf2 probe stream read
    0 of 2,000,000 rows through a directory symlink while the batch
    reader saw all of them (round-10 session 2)."""
    src_dir = _checkpoint_dir(f"src_{query_name}")
    if os.path.isdir(events_path):
        for f in sorted(os.listdir(events_path)):
            if f.startswith(("_", ".")):
                continue  # _SUCCESS / hidden metadata
            entry = os.path.join(events_path, f)
            if os.path.isdir(entry):
                # A partition-structured input (ship_month=.../...)
                # would re-create the nested-listing 0-row bug this
                # staging exists to fix — fail loudly instead of
                # streaming nothing (r10 advice).
                raise ValueError(
                    f"stage_stream_source: {events_path!r} contains "
                    f"subdirectory {f!r}; the file stream source does "
                    "not list nested files — flatten (or read the "
                    "partitioned input in batch mode) instead")
            os.symlink(entry, os.path.join(src_dir, f))
    else:
        os.symlink(events_path,
                   os.path.join(src_dir, os.path.basename(events_path)))
    return src_dir


def run_stream_to_memory(spark: SparkSession, events_path: str,
                         transform, query_name: str,
                         watermark: str | None = None,
                         output_mode: str = "complete",
                         timeout_sec: int = 120) -> DataFrame:
    """File source -> transform -> memory sink with availableNow (one
    complete pass over the input, then stop). ``transform`` is the
    same batch function (tumbling_agg etc.) — identical plan in both
    modes."""
    schema = spark.read.parquet(events_path).schema
    src_dir = stage_stream_source(events_path, query_name)
    stream = normalize_event_time(spark.readStream.schema(schema).parquet(src_dir))
    if watermark:
        stream = stream.withWatermark("ts", watermark)
    out = transform(stream)
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode(output_mode)
         .option("checkpointLocation", _checkpoint_dir(query_name))
         .trigger(availableNow=True)
         .start())
    # awaitTermination returns False on timeout; stopping then would
    # hand back a silently PARTIAL memory-sink table, so fail loudly
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(f"stream {query_name!r} did not finish in {timeout_sec}s")
    q.stop()
    return spark.table(query_name)


def streaming_dedup_within_watermark(events: DataFrame, keys: list[str],
                                     watermark: str = "1 hour") -> DataFrame:
    """Stateful streaming dedup: duplicates arriving within the
    watermark horizon are dropped, state is evicted beyond it —
    bounded memory at any throughput."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def interval_pair_join(views: DataFrame, purchases: DataFrame,
                       lookback_minutes: int = 30) -> DataFrame:
    """Stream-stream (or batch-batch — same function, same plan)
    inner join: each purchase paired with the same user's view events
    in the preceding ``lookback_minutes``. Equi key on user_id with
    the event-time range as the residual condition — in streaming
    mode this is the canonical watermarked stream-stream join; in
    batch mode the identical plan is a sort-merge join the oracle can
    check. Returns the raw pairs (append-able in streaming: a match
    is final the moment it is found)."""
    v = views.select(F.col("user_id"),
                     F.col("ts").alias("view_ts"),
                     F.col("value").alias("view_value"))
    p = purchases.select(F.col("user_id").alias("p_user"),
                         F.col("ts").alias("purchase_ts"),
                         F.col("event_id").alias("purchase_id"))
    cond = ((F.col("user_id") == F.col("p_user"))
            & (F.col("view_ts") <= F.col("purchase_ts"))
            & (F.col("view_ts")
               >= F.col("purchase_ts")
               - F.expr(f"INTERVAL {lookback_minutes} MINUTES")))
    return (v.join(p, cond)
            .select("user_id", "purchase_id", "purchase_ts",
                    "view_ts", "view_value"))


def interval_pair_join_outer(views: DataFrame, purchases: DataFrame,
                             lookback_minutes: int = 30) -> DataFrame:
    """LEFT OUTER sibling of :func:`interval_pair_join` (r7 verdict
    task 5 — SURVEY §2.10 completeness): every PURCHASE emits.
    Matched pairs carry the view columns and are final the moment
    they are found (inner semantics); an unmatched purchase emits
    ONCE, null-padded, when the watermark passes its event time —
    no future view can have view_ts <= purchase_ts after that, so
    eviction and emission coincide. The purchase side is the
    preserved (left) side; the two-sided time condition bounds BOTH
    state stores (views to the lookback window, purchases to
    watermark expiry)."""
    p = purchases.select(F.col("user_id"),
                         F.col("ts").alias("purchase_ts"),
                         F.col("event_id").alias("purchase_id"))
    v = views.select(F.col("user_id").alias("v_user"),
                     F.col("ts").alias("view_ts"),
                     F.col("value").alias("view_value"))
    cond = ((F.col("user_id") == F.col("v_user"))
            & (F.col("view_ts") <= F.col("purchase_ts"))
            & (F.col("view_ts")
               >= F.col("purchase_ts")
               - F.expr(f"INTERVAL {lookback_minutes} MINUTES")))
    return (p.join(v, cond, "leftOuter")
            .select("user_id", "purchase_id", "purchase_ts",
                    "view_ts", "view_value"))


def attributed_outer_agg(pairs: DataFrame, cutoff: DataFrame) -> DataFrame:
    """Per-user attribution report over the LEFT OUTER pairs,
    restricted to the CLOSED region (``cutoff`` is a 1-row broadcast
    frame with column ``__cutoff``): streaming outer results are
    only FINAL once the watermark passes the purchase's time, so the
    report is defined on purchases old enough that batch and live
    modes provably agree — the horizon every production outer-join
    consumer must respect anyway. Unmatched purchases contribute
    zero pairs and a 0-decimal attributed value (COALESCE before the
    DECIMAL(18,4) exact sum, mirrored in the oracle).

    Two-phase aggregate instead of ``count_distinct`` (r14, same
    defect class as the ``sql_waiting_suppliers`` rewrite): the
    multi-count-distinct form compiles to a 3-way Expand that
    TRIPLES the pair rows before the first exchange; aggregating at
    (user, purchase) first then per user needs no Expand, and both
    phases' groupings are satisfied by a user_id hash partitioning —
    when the pair join shuffles on user_id at cluster scale, neither
    phase adds an exchange. Decimal inner/outer sums keep
    ``exact_sum``'s bit-exact associativity, so the oracle is
    unchanged."""
    matched = F.col("view_ts").isNotNull()
    per_purchase = (
        pairs.crossJoin(F.broadcast(cutoff))
        .filter(F.col("purchase_ts") <= F.col("__cutoff"))
        .groupBy("user_id", "purchase_id")
        .agg(F.sum(F.when(matched, 1).otherwise(0)).cast("bigint")
             .alias("__pairs"),
             F.sum(F.coalesce(F.col("view_value"), F.lit(0.0))
                   .cast("decimal(18,4)")).alias("__val")))
    return (per_purchase.groupBy("user_id")
            .agg(F.count("purchase_id").alias("n_purchases"),
                 F.count(F.when(F.col("__pairs") > 0, 1))
                 .alias("n_matched_purchases"),
                 F.sum("__pairs").alias("n_view_pairs"),
                 F.sum("__val").cast("double").alias("attributed_value")))


def attributed_purchase_agg(pairs: DataFrame) -> DataFrame:
    """Aggregate over the join pairs: per user, how many purchases
    had at least one attributable view and the total attributed view
    value. Runs BATCH-side in both modes (in the live key, on the
    memory-sink table the append-mode join produced) so the
    aggregation itself never depends on streaming output-mode
    finalization semantics. Two-phase (user, purchase) -> user
    aggregate instead of ``count_distinct`` — see
    :func:`attributed_outer_agg` for the Expand-avoidance rationale;
    inner pairs always carry a non-null purchase_id and view."""
    per_purchase = (pairs.groupBy("user_id", "purchase_id")
                    .agg(F.count(F.lit(1)).alias("__pairs"),
                         F.sum(F.col("view_value").cast("decimal(18,4)"))
                         .alias("__val")))
    return (per_purchase.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_attributed_purchases"),
                 F.sum("__pairs").alias("n_view_pairs"),
                 F.sum("__val").cast("double").alias("attributed_value")))


def run_two_stream_join_to_memory(spark: SparkSession, events_path: str,
                                  query_name: str,
                                  lookback_minutes: int = 30,
                                  watermark: str = "30 days",
                                  timeout_sec: int = 180,
                                  how: str = "inner") -> DataFrame:
    """TRUE stream-stream join execution: two file-source streams
    over the same events input (filtered to views / purchases),
    watermarked on both sides, inner-joined with the time-range
    condition, append-mode memory sink, availableNow trigger.

    Inner-join matches are emitted in the micro-batch that finds
    them (only state EVICTION waits on the watermark), so one
    availableNow pass over a single input file emits every pair and
    the sink table equals the batch join. The generous watermark
    keeps state alive across micro-batch boundaries if the source
    ever splits the input; production deployments tighten it to the
    real lateness bound to cap state size.

    ``how="leftOuter"`` runs the LEFT OUTER sibling
    (interval_pair_join_outer): null-padded non-matches are emitted
    by the no-data micro-batch that advances the watermark after the
    last data batch, so callers must pass a TIGHT watermark (the
    default 30-day one would leave every unmatched purchase stuck in
    state at query end) and must consume only the closed region
    (attributed_outer_agg's cutoff)."""
    schema = spark.read.parquet(events_path).schema
    src_dir = stage_stream_source(events_path, query_name)

    def side(event_type: str) -> DataFrame:
        s = normalize_event_time(
            spark.readStream.schema(schema).parquet(src_dir))
        return (s.filter(F.col("event_type") == event_type)
                .withWatermark("ts", watermark))

    joiner = {"inner": interval_pair_join,
              "leftOuter": interval_pair_join_outer,
              "fullOuter": interval_pair_join_full}[how]
    pairs = joiner(side("view"), side("purchase"), lookback_minutes)
    q = (pairs.writeStream.format("memory").queryName(query_name)
         .outputMode("append")
         .option("checkpointLocation", _checkpoint_dir(query_name))
         .trigger(availableNow=True)
         .start())
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"stream {query_name!r} did not finish in {timeout_sec}s")
    q.stop()
    return spark.table(query_name)


def interval_pair_join_full(views: DataFrame, purchases: DataFrame,
                            lookback_minutes: int = 30) -> DataFrame:
    """FULL OUTER sibling of :func:`interval_pair_join` — BOTH sides
    preserved, completing the stream-stream join matrix (inner r2,
    left outer r8, full outer r8 session 2). Matched pairs are final
    when found; an unmatched PURCHASE null-emits when the watermark
    passes its event time (as in the left-outer case); an unmatched
    VIEW null-emits when the watermark passes view_ts + lookback —
    after that no future purchase can satisfy
    view_ts >= purchase_ts - lookback AND view_ts <= purchase_ts, so
    its eviction and emission coincide. Both state stores stay
    bounded by the same two-sided time condition."""
    p = purchases.select(F.col("user_id"),
                         F.col("ts").alias("purchase_ts"),
                         F.col("event_id").alias("purchase_id"))
    v = views.select(F.col("user_id").alias("v_user"),
                     F.col("ts").alias("view_ts"),
                     F.col("value").alias("view_value"))
    cond = ((F.col("user_id") == F.col("v_user"))
            & (F.col("view_ts") <= F.col("purchase_ts"))
            & (F.col("view_ts")
               >= F.col("purchase_ts")
               - F.expr(f"INTERVAL {lookback_minutes} MINUTES")))
    return (p.join(v, cond, "fullOuter")
            .select(F.coalesce("user_id", "v_user").alias("user_id"),
                    "purchase_id", "purchase_ts",
                    "view_ts", "view_value"))


def attributed_full_agg(pairs: DataFrame, cutoff: DataFrame,
                        lookback_minutes: int = 30) -> DataFrame:
    """Per-user report over the FULL OUTER pairs, on the closed
    region where BOTH sides are final: a row is final once the
    watermark passes COALESCE(purchase_ts, view_ts + lookback) — the
    purchase's own finality horizon, or the last instant a future
    purchase could still match an orphan view. Adds n_orphan_views
    (views no purchase attributed — the audience the left-outer
    report can't see) next to the purchase-side columns.

    Two-phase (user, purchase) -> user aggregate instead of
    ``count_distinct`` (see :func:`attributed_outer_agg`); a user's
    orphan views all land in its single NULL-purchase group, which
    ``F.count("purchase_id")`` then excludes from the purchase counts
    exactly as ``count_distinct`` did."""
    matched = (F.col("view_ts").isNotNull()
               & F.col("purchase_id").isNotNull())
    final_ts = F.coalesce(
        F.col("purchase_ts"),
        F.col("view_ts") + F.expr(f"INTERVAL {lookback_minutes} MINUTES"))
    per_purchase = (
        pairs.crossJoin(F.broadcast(cutoff))
        .filter(final_ts <= F.col("__cutoff"))
        .groupBy("user_id", "purchase_id")
        .agg(F.sum(F.when(matched, 1).otherwise(0)).cast("bigint")
             .alias("__pairs"),
             F.sum(F.when(F.col("purchase_id").isNull(), 1).otherwise(0))
             .cast("bigint").alias("__orphans"),
             F.sum(F.coalesce(F.when(matched, F.col("view_value")),
                              F.lit(0.0)).cast("decimal(18,4)"))
             .alias("__val")))
    return (per_purchase.groupBy("user_id")
            .agg(F.count("purchase_id").alias("n_purchases"),
                 F.count(F.when((F.col("__pairs") > 0)
                                & F.col("purchase_id").isNotNull(), 1))
                 .alias("n_matched_purchases"),
                 F.sum("__pairs").alias("n_view_pairs"),
                 F.sum("__orphans").alias("n_orphan_views"),
                 F.sum("__val").cast("double").alias("attributed_value")))
