"""Stateful Structured Streaming operators (SURVEY.md §2.10 north
star): watermarked stream dedup, arbitrary per-key state via
``applyInPandasWithState``, and the ``foreachBatch`` idempotent sink
pattern.

Scale stance: every operator here keeps bounded state. Dedup state
evicts beyond the watermark horizon; the per-user running aggregate
holds one tuple per key; foreachBatch writes are keyed by epoch so a
replayed batch overwrites its own output instead of duplicating it
(the exactly-once recipe for object-store sinks).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import normalize_event_time
from .windows import _checkpoint_dir, run_stream_to_memory


def dedup_within_watermark(events: DataFrame, keys: list[str],
                           watermark: str = "1 hour") -> DataFrame:
    """Stateful streaming dedup: duplicates arriving within the
    watermark horizon are dropped, state evicted beyond it — bounded
    memory at any throughput (the streaming tier of the dedup
    playbook in operators/dedup.py)."""
    return (events.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(keys))


def user_running_totals(events: DataFrame) -> DataFrame:
    """Arbitrary stateful per-key aggregation via
    ``applyInPandasWithState``: one (count, decimal-sum) tuple of
    state per user, updated per micro-batch.

    The sum accumulates in DECIMAL(·,4) (as Python ``Decimal``) with
    HALF_UP rounding per element — the same quantization as
    ``functions.numeric.exact_sum`` — so the emitted total is
    bit-identical to the batch/oracle result regardless of
    micro-batch boundaries or arrival order.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter, state):
        from decimal import ROUND_HALF_UP, Decimal
        import pandas as pd
        q = Decimal("0.0001")
        if state.exists:
            n, s_str = state.get
            s = Decimal(s_str)
        else:
            n, s = 0, Decimal(0)
        for pdf in pdf_iter:
            n += len(pdf)
            for v in pdf["value"]:
                s += Decimal(repr(float(v))).quantize(q, rounding=ROUND_HALF_UP)
        state.update((n, str(s)))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "sum_value": [float(s)]})

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id bigint, n_events bigint, sum_value double",
        stateStructType="n bigint, s string",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)


def run_stream_foreach_batch_parquet(spark: SparkSession, events_path: str,
                                     query_name: str) -> DataFrame:
    """foreachBatch parquet sink, epoch-keyed for idempotent replay:
    batch b always (over)writes ``batch=b/`` — a redelivered epoch
    replaces its own files, never duplicates them. Returns the
    read-back of everything written."""
    out_dir = _checkpoint_dir(f"fb_out_{query_name}")

    schema = spark.read.parquet(events_path).schema
    src_dir = _checkpoint_dir(f"src_{query_name}")
    link = os.path.join(src_dir, os.path.basename(events_path))
    if not os.path.exists(link):
        os.symlink(events_path, link)
    stream = normalize_event_time(spark.readStream.schema(schema).parquet(src_dir))

    def sink(batch_df, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}"))

    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", _checkpoint_dir(query_name))
         .trigger(availableNow=True)
         .start())
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError(f"stream {query_name!r} did not finish in 120s")
    q.stop()
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "batch=*"))


def user_running_totals_tws(events: DataFrame) -> DataFrame:
    """Spark 4 ``transformWithStateInPandas`` twin of
    ``user_running_totals``: the same per-user (count, decimal-sum)
    kept in a named ValueState through the new StatefulProcessor API
    (typed state, timers, TTL-capable; RocksDB-backed state store).
    Same decimal quantization -> same bit-identical totals.

    NOT registered as a Qkey: the TWS state-server protocol needs
    ``google.protobuf``, absent from this container (and installs are
    off-limits) — the worker crashes with ImportError at query start.
    ``applyInPandasWithState`` (``user_running_totals``) provides the
    same capability and IS oracle-checked; a protobuf-equipped
    environment can run this twin via the skip-gated unit test.
    """
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.state = handle.getValueState("totals", "n BIGINT, s STRING")

        def handleInputRows(self, key, rows, timerValues):
            from decimal import ROUND_HALF_UP, Decimal
            q = Decimal("0.0001")
            if self.state.exists():
                n, s_str = self.state.get()
                s = Decimal(s_str)
            else:
                n, s = 0, Decimal(0)
            for pdf in rows:
                n += len(pdf)
                for v in pdf["value"]:
                    s += Decimal(repr(float(v))).quantize(
                        q, rounding=ROUND_HALF_UP)
            self.state.update((n, str(s)))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                                "sum_value": [float(s)]})

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotals(),
        outputStructType="user_id bigint, n_events bigint, sum_value double",
        outputMode="Update",
        timeMode="None")


def user_funnel_stages(events: DataFrame) -> DataFrame:
    """Per-user funnel STATE MACHINE via ``applyInPandasWithState``:
    state is the four unconditional per-type minimum timestamps
    (signup/view/click/purchase), and the strict-order stage is
    DERIVED from those mins at emission. Keeping raw mins (not the
    stage) makes the state update commutative and idempotent — events
    may arrive in any order across any micro-batch boundaries and the
    result still equals the batch derivation, which is what lets the
    streaming run share the batch oracle. State is four longs per
    user, bounded forever."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    _ORDER = {"signup": 0, "view": 1, "click": 2, "purchase": 3}

    def fn(key, pdf_iter, state):
        import pandas as pd
        mins = list(state.get) if state.exists else [-1, -1, -1, -1]
        for pdf in pdf_iter:
            for typ, ts in zip(pdf["event_type"], pdf["ts"]):
                i = _ORDER.get(typ)
                if i is None:
                    continue
                t = int(pd.Timestamp(ts).value)
                if mins[i] < 0 or t < mins[i]:
                    mins[i] = t
        state.update(tuple(mins))
        stage = 0
        if mins[0] >= 0:
            stage, prev = 1, mins[0]
            for i in (1, 2, 3):
                if mins[i] >= 0 and mins[i] > prev:
                    stage, prev = stage + 1, mins[i]
                else:
                    break
        yield pd.DataFrame({"user_id": [key[0]], "funnel_stage": [stage]})

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id bigint, funnel_stage int",
        stateStructType="t0 bigint, t1 bigint, t2 bigint, t3 bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)


def user_running_totals_tws(events: DataFrame) -> DataFrame:
    """The Spark-4 successor API for arbitrary stateful processing:
    ``transformWithStateInPandas`` with an explicit
    ``StatefulProcessor`` + typed ``ValueState`` — the same per-user
    (count, decimal-sum) semantics as :func:`user_running_totals`, so
    the two keys share one batch oracle and any drift between the
    legacy and new state APIs is oracle-visible.

    State is one (n, decimal-string) tuple per user (bounded); the
    sum quantizes per element with HALF_UP exactly like
    ``functions.numeric.exact_sum``, so emitted totals are
    bit-identical to the batch GROUP BY regardless of micro-batch
    slicing or arrival order."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n bigint, s string")

        def handleInputRows(self, key, rows, timerValues):
            from decimal import ROUND_HALF_UP, Decimal
            import pandas as pd
            q = Decimal("0.0001")
            prev = self._totals.get()
            n, s = (prev[0], Decimal(prev[1])) if prev else (0, Decimal(0))
            for pdf in rows:
                n += len(pdf)
                for v in pdf["value"]:
                    s += Decimal(repr(float(v))).quantize(
                        q, rounding=ROUND_HALF_UP)
            self._totals.update((n, str(s)))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                                "sum_value": [float(s)]})

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id bigint, n_events bigint, sum_value double",
        outputMode="Update",
        timeMode="None")
