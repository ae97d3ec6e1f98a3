"""Streaming building blocks over the `events` table layout."""

from __future__ import annotations

import os
import uuid
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from ..functions.deterministic import dsum


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table (E41). Schema is pinned
    (streaming sources must not infer). ``ts`` is normalized to a µs
    TIMESTAMP (LTZ) event-time column whatever the parquet encoding —
    INT64 nanos arrive as long (legacy conf) and are floor-converted;
    TIMESTAMP(µs, NTZ) is reinterpreted as UTC (the session timezone),
    which watermarks require (event time must be LTZ)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # file-stream sources take a directory; select just events.parquet
    # out of the sf_dir via glob
    sdf = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if "ts" in sdf.columns:
        ts_type = sdf.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp"))
    return sdf


def run_stream_to_memory(
    sdf: DataFrame, output_mode: str = "complete", name: str | None = None
) -> str:
    """Run a streaming DataFrame to completion into an in-memory sink
    (availableNow drains all input then stops). Returns the sink table
    name; read it with ``spark.table(name)``."""
    name = name or f"stream_{uuid.uuid4().hex[:8]}"
    q = (
        sdf.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name


def tumbling_counts(events: DataFrame, width: str = "10 minutes") -> DataFrame:
    """Tumbling event-time window aggregation (E42) with a watermark
    (E44) bounding state."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", width), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", width, slide))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
        )
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows in a real stream (E43)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_events_within_watermark(events: DataFrame) -> DataFrame:
    """Stateful streaming dedup (E45): drops repeated (user_id,
    event_type) pairs whose event times fall within the watermark delay."""
    return events.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


_STATE_SCHEMA = StructType([StructField("count", LongType())])
_OUT_SCHEMA = StructType(
    [StructField("user_id", LongType()), StructField("running_count", LongType())]
)


def _count_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    prior = state.get[0] if state.exists else 0
    total = prior + sum(len(p) for p in pdfs)
    state.update((total,))
    yield pd.DataFrame({"user_id": [user_id], "running_count": [total]})


def running_count_per_user(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState (E45): a
    per-user running event count carried in explicit state across
    micro-batches — the arbitrary-stateful-processing escape hatch."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _count_fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def click_purchase_join(
    purchases: DataFrame, clicks: DataFrame, lookback: str = "30 minutes"
) -> DataFrame:
    """Stream-stream interval join (E41/E44): each purchase matched to
    the same user's clicks in the preceding ``lookback`` window. Both
    sides carry watermarks and the join condition bounds event time on
    both sides, so state for either stream is evicted once the
    watermark passes — the unbounded-state trap of stream-stream joins
    is closed and the operator runs forever at 100 TB/day."""
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", "1 hour")
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", "1 hour")
    return p.join(
        c,
        (F.col("click_user") == F.col("user_id"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
        "inner",
    ).select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")


def run_stream_foreach_batch_parquet(sdf: DataFrame, path: str) -> None:
    """Drain a stream through ``foreachBatch`` into parquet (E41/E45):
    the production sink pattern — each micro-batch lands as an atomic
    append job, giving exactly-once-per-batch file output plus the
    freedom to run arbitrary batch logic (merge, dedup, compaction)
    inside the sink. availableNow => terminates after draining."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(path)

    q = (
        sdf.writeStream.foreachBatch(sink)
        .option(
            "checkpointLocation", path.rstrip("/") + "_ckpt"
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


_SESS_STATE_SCHEMA = StructType(
    [
        StructField("start", TimestampType()),
        StructField("last", TimestampType()),
        StructField("n", LongType()),
    ]
)
_SESS_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

#: Session gap in seconds for the custom state machine.
SESSION_GAP_S = 1800


def _session_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    gap = pd.Timedelta(seconds=SESSION_GAP_S)

    def _emit(rows):
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(rows),
                "session_start": [s for s, _, _ in rows],
                "session_end": [e + gap for _, e, _ in rows],
                "n_events": [int(c) for _, _, c in rows],
            }
        )

    if state.hasTimedOut:
        # Event-time timeout: the watermark passed last+gap, so the open
        # session can never be extended — emit its final version and
        # EVICT the state (without this, open-session state would live
        # forever; at 100 TB that is an unbounded state store).
        start, last, n = state.get
        state.remove()
        yield from _emit([(start, last, n)])
        return

    # Buffer-and-reorder: rows within one batch sort by event time, so
    # intra-batch disorder is fully handled. Cross-batch late events
    # (admitted by the 1-hour watermark) are handled below by
    # sessionizing them TOGETHER with the open-session interval —
    # comparing each late event only against the open session's start
    # would wrongly emit overlapping singletons when several late
    # events arrive in one batch, and would miss chain merges (a late
    # event within the gap of ANOTHER late event that itself merges
    # into the open session).
    ts = sorted(t for p in pdfs for t in p["ts"])
    if state.exists:
        start, last, n = state.get
    else:
        start = None
    out = []
    if start is not None:
        before = [t for t in ts if t < start]
        ts = [t for t in ts if t >= start]
        if before:
            # ascending interval merge over (late points + open session):
            # consecutive intervals closer than the gap coalesce, so
            # late events group among themselves AND chain-merge into
            # the open session when the bridge is short enough.
            intervals = [(t, t, 1) for t in before] + [(start, last, n)]
            merged = [intervals[0]]
            for s2, e2, c2 in intervals[1:]:
                s1, e1, c1 = merged[-1]
                if (s2 - e1).total_seconds() < SESSION_GAP_S:
                    merged[-1] = (s1, max(e1, e2), c1 + c2)
                else:
                    merged.append((s2, e2, c2))
            # all but the last interval can never be extended again
            # (each ends a full gap before the next): emit closed.
            # Update-mode output cannot amend already-emitted closed
            # sessions, so a late event belonging to one of those still
            # surfaces as its own (possibly multi-event) late session —
            # the documented best-effort bound.
            out.extend(merged[:-1])
            start, last, n = merged[-1]
    for t in ts:
        if start is None:
            start, last, n = t, t, 1
        elif t >= last:
            # in-order: extend or close-and-open
            if (t - last).total_seconds() >= SESSION_GAP_S:
                out.append((start, last, n))  # closed session
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        else:
            # t in [start, last): inside the open session
            n = n + 1
    if start is not None:
        state.update((start, last, int(n)))
        # Evict once event time passes last+gap: no row admitted by the
        # watermark can extend the session after that.
        timeout_ms = int(last.timestamp() * 1000) + SESSION_GAP_S * 1000
        state.setTimeoutTimestamp(max(timeout_ms, state.getCurrentWatermarkMs() + 1))
        out.append((start, last, n))  # open session: latest version
    yield from _emit(out)


def custom_session_windows(events: DataFrame) -> DataFrame:
    """Session windows as a CUSTOM state machine via
    applyInPandasWithState (E43 x E45): per-user state carries the open
    session (start, last, count); each batch's rows extend or close it,
    closed sessions emit immediately, the open session re-emits its
    latest version (update mode — downstream takes the last emission
    per (user, session_start)). Identical semantics to
    ``F.session_window`` with a 30-min gap, but as the escape-hatch
    formulation: this is the skeleton for session logic Spark's
    built-in CANNOT express (per-session caps, inactivity + absolute
    timeouts, carryover payloads). State is one tiny row per open
    session per user, EVICTED by an event-time timeout at last+gap
    (the watermark alone does not evict applyInPandasWithState state).

    Out-of-order handling: rows sort by event time within each batch;
    a cross-batch late event admitted by the 1-hour watermark merges
    into the open session (extending it backward) when it lands within
    the gap of the session start. A late event a full gap OLDER than
    the open session belongs to an already-emitted closed session,
    which update-mode output cannot amend — it emits as its own
    singleton session (documented best-effort bound; tighten the
    watermark relative to the gap to exclude the case entirely)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=_SESS_OUT_SCHEMA,
            stateStructType=_SESS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def per_user_type_counts_tws(events: DataFrame) -> DataFrame:
    """Per-(user, event_type) running counts via the Spark 4 state-v2
    API (``transformWithStateInPandas``, E45's successor surface):
    typed per-key MAP state (event_type -> count) managed by the
    engine's state store, updated per micro-batch, snapshot emitted in
    update mode. Versus ``applyInPandasWithState`` this is the modern
    operator: composable typed states (value/list/map), per-state TTL,
    and timers — here the MapState carries one entry per event type, so
    state size is |types| per user, not |events|. Requires the RocksDB
    state-store provider (set by the caller) AND the ``protobuf``
    package (the state-v2 Python<->JVM protocol is protobuf-framed;
    absent in this container, so EXECUTION is environment-gated — the
    query builds and analyzes here, and runs wherever
    ``google.protobuf`` is installed; ``tests/test_streaming.py``
    adapts). CAVEAT while that gate holds: the MapState tuple protocol
    used below (``getValue((etype,))[0]``, ``iterator()`` unpacking to
    ``(key_tuple, value_tuple)``) is written to the documented
    pyspark-4.1 API but has never been EXECUTED in this container — a
    runtime protocol mismatch would surface only where protobuf
    exists, via the conditional execution test. The
    applyInPandasWithState operators in this module cover the
    executable-stateful path in this environment."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _TypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "type_counts", "event_type string", "n bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            for pdf in rows:
                for etype, cnt in pdf["event_type"].value_counts().items():
                    prev = (
                        self._counts.getValue((etype,))[0]
                        if self._counts.containsKey((etype,))
                        else 0
                    )
                    self._counts.updateValue((etype,), (prev + int(cnt),))
            out = {"user_id": [], "event_type": [], "n": []}
            for (etype,), (n,) in self._counts.iterator():
                out["user_id"].append(key[0])
                out["event_type"].append(etype)
                out["n"].append(int(n))
            yield pd.DataFrame(out)

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        _TypeCounts(),
        outputStructType="user_id long, event_type string, n bigint",
        outputMode="update",
        timeMode="none",
    )


_CUSUM_STATE = StructType(
    [
        StructField("s_pos", DoubleType()),
        StructField("s_neg", DoubleType()),
        StructField("n", LongType()),
        StructField("alarm_ts", TimestampType()),
    ]
)
_CUSUM_OUT = StructType(
    [
        StructField("group", StringType()),
        StructField("n", LongType()),
        StructField("s_pos", DoubleType()),
        StructField("s_neg", DoubleType()),
        StructField("alarmed", BooleanType()),
        StructField("first_alarm_ts", TimestampType()),
    ]
)


def streaming_cusum(
    events: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    *,
    target: float,
    std: float,
    k: float = 0.5,
    h: float = 4.0,
    watermark: str = "1 hour",
) -> DataFrame:
    """Online two-sided CUSUM monitor as a custom stateful streaming
    operator (E45 extension; the streaming complement of the batch
    ``operators/stats.py:cusum_changepoint``).

    The batch detector standardizes against the FINAL corpus moments,
    which no stream can know; the standard online form instead
    monitors against a reference trained offline — pass ``target``
    and ``std`` from the batch pipeline (the usual train-offline /
    monitor-online split). Per group the state carries the classic
    one-sided statistics, updated per row in event-time order:

        S+ <- max(0, S+ + (x - target)/std - k)
        S- <- max(0, S- - (x - target)/std - k)

    and the group ALARMS the first time ``max(S+, S-) > h``
    (``k``~0.5 sigma slack, ``h``~4-5 sigma decision interval are the
    textbook defaults). Emits one row per group per micro-batch:
    ``(group, n, s_pos, s_neg, alarmed, first_alarm_ts)`` in update
    mode; the alarm timestamp freezes at the first crossing.

    ORDER CONTRACT: rows are folded in ``(ts, value)`` order WITHIN
    each micro-batch, and state chains across batches in arrival
    order. CUSUM is order-dependent, so the end-to-end result is the
    event-time fold only if micro-batches arrive in event-time order
    (true for a replayed single file, a date-partitioned backfill
    drained in order, or any source whose batches are time-aligned —
    the same contract every online monitor has). For unordered
    sources, pre-aggregate to a (group, window) grid first and feed
    the closed windows.

    LATE-DATA DROP: the stream carries a ``watermark`` (default
    ``"1 hour"``); rows arriving more than that far behind the
    maximum event time already seen are dropped BEFORE the fold, so
    ``n``, S+/S- and the alarm silently exclude them — the standard
    bounded-state trade every watermarked stateful operator makes.
    Size it to the source's real out-of-orderness; within a single
    micro-batch (e.g. an availableNow replay of one file) nothing is
    ever dropped, because the watermark only takes effect at the next
    batch boundary.

    Scale shape: state is four scalars per group (bounded by the
    group dimension, never the stream), each batch is one
    groupBy-partitioned pass, and the fold is vectorizable numpy
    inside the Arrow batch.
    """
    import numpy as np

    def _fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (group,) = key
        s_pos, s_neg, n, alarm_ts = (
            state.get if state.exists else (0.0, 0.0, 0, None)
        )
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.dropna(subset=[ts_col, value_col]).sort_values(
            [ts_col, value_col], kind="mergesort"
        )
        z = (pdf[value_col].to_numpy(dtype=float) - target) / std
        ts = pdf[ts_col].to_numpy()
        for i in range(len(z)):
            s_pos = max(0.0, s_pos + z[i] - k)
            s_neg = max(0.0, s_neg - z[i] - k)
            n += 1
            if alarm_ts is None and max(s_pos, s_neg) > h:
                alarm_ts = pd.Timestamp(ts[i]).to_pydatetime()
        state.update((float(s_pos), float(s_neg), int(n), alarm_ts))
        yield pd.DataFrame(
            {
                "group": [group],
                "n": [n],
                "s_pos": [round(s_pos, 6)],
                "s_neg": [round(s_neg, 6)],
                "alarmed": [alarm_ts is not None],
                "first_alarm_ts": [alarm_ts],
            }
        )

    return (
        events.withWatermark(ts_col, watermark)
        .select(
            F.col(group_col).cast("string").alias("group"),
            F.col(ts_col).alias(ts_col),
            F.col(value_col).cast("double").alias(value_col),
        )
        .groupBy("group")
        .applyInPandasWithState(
            _fn,
            outputStructType=_CUSUM_OUT,
            stateStructType=_CUSUM_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
