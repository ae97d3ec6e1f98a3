"""True Structured Streaming tests (E41–E45), driven with availableNow.

Correctness gate: the streamed tumbling aggregation must equal the
batch aggregation of the same data (which itself is DuckDB-verified in
plans.events_windows) — stream/batch parity is Spark's own unified-
semantics promise, and it gives the streaming path a real oracle.
"""

import pandas as pd
import pytest

from aics_dask_utils_spark.plans import all_plans
from aics_dask_utils_spark.streaming import (
    dedup_events_within_watermark,
    read_events_stream,
    run_stream_to_memory,
    running_count_per_user,
    session_counts,
    tumbling_counts,
)
from aics_dask_utils_spark.testing import assert_frames_match


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir):
    return read_events_stream(spark, sf_dir)


def test_stream_tumbling_equals_batch(spark, sf_dir, events_stream):
    name = run_stream_to_memory(tumbling_counts(events_stream), "complete")
    streamed = spark.table(name).toPandas()
    batch = all_plans()["events_tumbling"].fn(spark, sf_dir).toPandas()
    assert_frames_match(streamed, batch, context="stream-vs-batch tumbling")


def test_stream_session_equals_batch(spark, sf_dir, events_stream):
    name = run_stream_to_memory(session_counts(events_stream), "complete")
    streamed = spark.table(name).toPandas()
    batch = all_plans()["events_session"].fn(spark, sf_dir).toPandas()
    assert_frames_match(streamed, batch, context="stream-vs-batch session")


def test_stream_dedup_within_watermark(spark, sf_dir, events_stream):
    name = run_stream_to_memory(
        dedup_events_within_watermark(events_stream), "append"
    )
    got = spark.table(name).toPandas()
    batch_events = all_plans()["events_rate_per_type"].fn(spark, sf_dir)
    n_pairs = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    # one survivor per (user_id, event_type) pair: all events fall inside
    # the 1h watermark delay only per micro-batch; with maxFilesPerTrigger=1
    # the whole file is one batch -> exact distinct semantics.
    assert len(got) == n_pairs
    assert got.duplicated(["user_id", "event_type"]).sum() == 0
    assert batch_events.count() > 0


def test_stream_stateful_running_count(spark, sf_dir, events_stream):
    name = run_stream_to_memory(running_count_per_user(events_stream), "update")
    got = spark.table(name).toPandas()
    # final state per user = total events per user (take last emission)
    final = got.groupby("user_id")["running_count"].max().reset_index()
    expected = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .count()
        .toPandas()
        .rename(columns={"count": "running_count"})
    )
    assert_frames_match(final, expected, context="stateful running count")


def test_rate_source_smoke(spark):
    # E41's "rate" source: a rows-per-second generator stream, drained
    # for one micro-batch — covers the non-file streaming source path.
    import uuid

    name = f"rate_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 100)
        .load()
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table(name)
    assert set(got.columns) == {"timestamp", "value"}
    assert got.count() >= 0


def test_watermark_drops_late_rows_across_batches(spark, tmp_path_factory):
    """Real late-data semantics: batch 1 advances the watermark; a row in
    batch 2 older than the watermark is DROPPED from the windowed
    aggregation, while batch-1 windows below the final watermark emit."""
    import glob
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    src = tmp_path_factory.mktemp("stream_src")

    def write_file(rows, name, mtime):
        tmp = str(src) + f"_{name}_tmp"
        spark.createDataFrame(rows, "ts timestamp, user_id long").coalesce(
            1
        ).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(str(src), f"{name}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (mtime, mtime))

    import datetime as dt

    t = lambda h, m=0: dt.datetime(2020, 1, 1, h, m)
    # batch 1: events 10:00..12:00 -> watermark advances to 11:00
    write_file([(t(10), 1), (t(11), 2), (t(12), 3)], "b1", 1_600_000_000)
    # batch 2: 12:30 -> watermark advances to 11:30 (watermark updates
    # take effect on the batch AFTER the one that observed the max)
    write_file([(t(12, 30), 5)], "b2", 1_600_000_100)
    # batch 3: 09:00 is far below the 11:30 watermark -> must be dropped
    write_file([(t(9), 4)], "b3", 1_600_000_200)

    sdf = (
        spark.readStream.schema("ts timestamp, user_id long")
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    agg = (
        sdf.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "n")
    )
    name = f"wm_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["ws"].hour * 100 + r["ws"].minute: r["n"] for r in spark.table(name).collect()}
    assert 900 not in got  # the late 09:00 row was dropped by the watermark
    assert got.get(1000) == 1 and got.get(1100) == 1  # finalized batch-1 windows
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0) if p["stateOperators"] else 0)
        for p in q.recentProgress
    )
    assert dropped == 1  # exactly the late row


def test_foreach_batch_restart_is_exactly_once(spark, sf_dir):
    """Restarting a drained checkpointed stream over the same source
    must append NOTHING — the checkpoint records consumed files, so a
    crash-restart (or an operator re-running the job) cannot duplicate
    landed data. This is the exactly-once-per-batch contract the
    foreachBatch landing path claims."""
    import os
    import shutil

    from aics_dask_utils_spark.streaming import read_events_stream
    from aics_dask_utils_spark.streaming.ops import run_stream_foreach_batch_parquet

    from pyspark.sql import functions as F

    tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"/tmp/spark_graft_fb_restart_{tag}"
    for p in (path, path + "_ckpt"):
        shutil.rmtree(p, ignore_errors=True)

    sdf = read_events_stream(spark, sf_dir).where(F.col("value") > 50.0)
    run_stream_foreach_batch_parquet(sdf, path)
    n_first = spark.read.parquet(path).count()
    assert n_first > 0

    # restart with the checkpoint intact: same source, no new data
    sdf2 = read_events_stream(spark, sf_dir).where(F.col("value") > 50.0)
    run_stream_foreach_batch_parquet(sdf2, path)
    assert spark.read.parquet(path).count() == n_first


def test_streaming_hll_merges_across_micro_batches(spark, tmp_path_factory):
    """Cross-micro-batch sketch mergeability: three overlapping batches
    of user ids must union to the exact distinct count — the state
    store merges per-batch HLL partials, it does not overwrite them."""
    import datetime as dt
    import glob
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    src = tmp_path_factory.mktemp("hll_src")

    def write_file(users, name, mtime):
        rows = [(dt.datetime(2020, 1, 1, 10), int(u)) for u in users]
        tmp = str(src) + f"_{name}_tmp"
        spark.createDataFrame(rows, "ts timestamp, user_id long").coalesce(
            1
        ).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(str(src), f"{name}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (mtime, mtime))

    # overlapping ranges: merging must dedup the overlap (distinct=200)
    write_file(range(0, 100), "b1", 1_600_000_000)
    write_file(range(50, 150), "b2", 1_600_000_100)
    write_file(range(100, 200), "b3", 1_600_000_200)

    sdf = (
        spark.readStream.schema("ts timestamp, user_id long")
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    agg = sdf.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    name = f"hll_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, "expected multiple micro-batches"
    est = spark.table(name).select(
        F.expr("CAST(hll_sketch_estimate(sk) AS BIGINT)").alias("est")
    ).collect()
    assert len(est) == 1
    # HLL at 200 distinct is in sparse (exact) mode
    assert est[0]["est"] == 200


def test_custom_session_state_spans_micro_batches(spark, tmp_path_factory):
    """A session crossing the batch boundary must continue, not split:
    the open-session state carries (start, last, n) across batches."""
    import datetime as dt
    import glob
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from aics_dask_utils_spark.streaming.ops import custom_session_windows

    src = tmp_path_factory.mktemp("sess_src")

    def write_file(rows, name, mtime):
        tmp = str(src) + f"_{name}_tmp"
        spark.createDataFrame(
            rows, "ts timestamp, user_id long, event_id long, event_type string, value double, props string"
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(str(src), f"{name}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (mtime, mtime))

    t = lambda h, m: dt.datetime(2020, 1, 1, h, m)
    # batch 1: 10:00, 10:10 (one open session)
    write_file([(t(10, 0), 1, 1, "view", 0.0, ""), (t(10, 10), 1, 2, "view", 0.0, "")], "b1", 1_600_000_000)
    # batch 2: 10:20 continues the SAME session (gap < 30 min);
    # 12:00 starts a new one (gap >= 30 min)
    write_file([(t(10, 20), 1, 3, "view", 0.0, ""), (t(12, 0), 1, 4, "view", 0.0, "")], "b2", 1_600_000_100)

    sdf = (
        spark.readStream.schema(
            "ts timestamp, user_id long, event_id long, event_type string, value double, props string"
        )
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    out = custom_session_windows(sdf)
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = (
        spark.table(name)
        .groupBy("user_id", "session_start")
        .agg(F.max("n_events").alias("n"))
        .collect()
    )
    got = {(r["session_start"].hour, r["session_start"].minute): r["n"] for r in final}
    # ONE session starting 10:00 with 3 events (spanning both batches),
    # one starting 12:00 with 1 event — never a split at 10:20
    assert got == {(10, 0): 3, (12, 0): 1}, got


class _FakeGroupState:
    """Minimal GroupState stand-in to unit-test _session_fn's state
    machine (merge/evict paths) without running a stream."""

    def __init__(self, value=None, timed_out=False, watermark_ms=0):
        self._v = value
        self.hasTimedOut = timed_out
        self._wm = watermark_ms
        self.removed = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self.removed = True
        self._v = None

    def getCurrentWatermarkMs(self):
        return self._wm

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


def _run_session_fn(batch_ts, state):
    import pandas as pd

    from aics_dask_utils_spark.streaming.ops import _session_fn

    pdfs = [pd.DataFrame({"ts": batch_ts})] if batch_ts else []
    (out,) = list(_session_fn((1,), iter(pdfs), state))
    return out


def test_session_fn_late_event_merges_into_open_session():
    # open session 10:00-10:10 (2 events); a late 9:50 event (within the
    # 30-min gap of start) must merge and extend the session backward,
    # never move `last` backwards
    import datetime as dt

    t = lambda h, m: dt.datetime(2020, 1, 1, h, m)
    state = _FakeGroupState(value=(t(10, 0), t(10, 10), 2))
    out = _run_session_fn([t(9, 50)], state)
    assert len(out) == 1
    assert out["session_start"][0] == t(9, 50)
    assert state.get == (t(9, 50), t(10, 10), 3)
    assert state.timeout_ms is not None  # eviction armed


def test_session_fn_very_late_event_emits_singleton():
    # a late event a full gap BEFORE the open session start belongs to
    # an already-emitted closed session: emitted as its own singleton,
    # open session untouched
    import datetime as dt

    t = lambda h, m: dt.datetime(2020, 1, 1, h, m)
    state = _FakeGroupState(value=(t(10, 0), t(10, 10), 2))
    out = _run_session_fn([t(9, 0)], state)
    assert len(out) == 2
    starts = sorted(out["session_start"])
    assert starts == [t(9, 0), t(10, 0)]
    singleton = out[out["session_start"] == t(9, 0)].iloc[0]
    assert singleton["n_events"] == 1
    assert state.get == (t(10, 0), t(10, 10), 2)


def test_session_fn_timeout_evicts_state():
    # event-time timeout: final version emits, state removed — open
    # sessions cannot accumulate forever in the state store
    import datetime as dt

    t = lambda h, m: dt.datetime(2020, 1, 1, h, m)
    state = _FakeGroupState(value=(t(10, 0), t(10, 10), 2), timed_out=True)
    out = _run_session_fn([], state)
    assert len(out) == 1
    assert out["n_events"][0] == 2
    assert state.removed


def test_session_fn_timeout_never_below_watermark():
    # setTimeoutTimestamp must stay above the current watermark even
    # when last+gap already passed it (Spark rejects timeouts <= wm)
    import datetime as dt

    t = lambda h, m: dt.datetime(2020, 1, 1, h, m)
    wm_ms = int(dt.datetime(2020, 1, 1, 12, 0).timestamp() * 1000)
    state = _FakeGroupState(watermark_ms=wm_ms)
    _run_session_fn([t(10, 0)], state)
    assert state.timeout_ms == wm_ms + 1


def test_custom_session_state_merges_late_batch(spark, tmp_path_factory):
    """Real-engine out-of-order path: a later micro-batch delivers an
    event OLDER than the open session's last but within the gap of its
    start — the state machine must merge it (extending the session
    backward) under the actual applyInPandasWithState runtime with
    EventTimeTimeout armed."""
    import datetime as dt
    import glob
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from aics_dask_utils_spark.streaming.ops import custom_session_windows

    src = tmp_path_factory.mktemp("sess_late_src")

    def write_file(rows, name, mtime):
        tmp = str(src) + f"_{name}_tmp"
        spark.createDataFrame(
            rows,
            "ts timestamp, user_id long, event_id long, event_type string, value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(str(src), f"{name}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (mtime, mtime))

    t = lambda h, m: dt.datetime(2020, 1, 1, h, m)
    # batch 1: session A (10:00, 10:10); batch 2: 12:00 opens session B
    # (watermark advances to 11:00); batch 3: LATE 11:45 (>= watermark,
    # < session B's last, within the 30-min gap of B's start) -> must
    # merge into B, extending it backward to 11:45
    write_file([(t(10, 0), 1, 1, "view", 0.0, ""), (t(10, 10), 1, 2, "view", 0.0, "")], "b1", 1_600_000_000)
    write_file([(t(12, 0), 1, 3, "view", 0.0, "")], "b2", 1_600_000_100)
    write_file([(t(11, 45), 1, 4, "view", 0.0, "")], "b3", 1_600_000_200)

    sdf = (
        spark.readStream.schema(
            "ts timestamp, user_id long, event_id long, event_type string, value double, props string"
        )
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    out = custom_session_windows(sdf)
    name = f"sess_late_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = (
        spark.table(name)
        .groupBy("user_id", "session_start")
        .agg(F.max("n_events").alias("n"))
        .collect()
    )
    got = {(r["session_start"].hour, r["session_start"].minute): r["n"] for r in final}
    # session A intact; session B re-emitted under its corrected start
    # 11:45 with 2 events (the stale 12:00-start emission from batch 2
    # remains in the update log by design — update mode cannot retract)
    assert got[(10, 0)] == 2, got
    assert got[(11, 45)] == 2, got


def test_python_stream_source_checkpoint_recovery(spark, tmp_path):
    """Restarting the pure-Python stream source from its checkpoint must
    resume at the committed offset — no duplicated and no skipped ids —
    exercising the engine's readBetweenOffsets replay path across three
    separate query runs."""
    from pyspark.sql import functions as F

    from aics_dask_utils_spark.sources.python_datasource import (
        register_graftgen_stream,
    )

    register_graftgen_stream(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    for _ in range(3):
        sdf = (
            spark.readStream.format("graftgen_stream")
            .option("n_rows", 360)
            .option("batch_rows", 120)
            .load()
        )
        q = (
            sdf.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 360
    assert got.select("id").distinct().count() == 360  # exactly-once
    assert got.agg(F.min("id"), F.max("id")).first() == (0, 359)


def test_python_stream_sink_epoch_manifests(spark, tmp_path):
    """End-to-end pure-Python stream: the graftgen_stream source feeds
    the graftsink_stream sink; every micro-batch must land one epoch
    manifest whose row totals sum to exactly the source's row count —
    the idempotent-epoch commit contract."""
    import json
    import os

    from aics_dask_utils_spark.sources.python_datasource import (
        register_graftgen_stream,
        register_graftsink_stream,
    )

    register_graftgen_stream(spark)
    register_graftsink_stream(spark)
    out = str(tmp_path / "pysink_stream")
    sdf = (
        spark.readStream.format("graftgen_stream")
        .option("n_rows", 500)
        .option("batch_rows", 200)
        .load()
    )
    q = (
        sdf.writeStream.format("graftsink_stream")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    manifests = sorted(f for f in os.listdir(out) if f.startswith("_manifest-"))
    assert len(manifests) >= 3  # 500 rows / 200-row batches
    total = 0
    for mf in manifests:
        m = json.load(open(os.path.join(out, mf)))
        for fname in m["files"]:
            assert os.path.exists(os.path.join(out, fname))
        total += m["rows"]
    assert total == 500
    # the staged data itself is complete and unique
    lines = []
    for f in os.listdir(out):
        if f.endswith(".graft"):
            lines += open(os.path.join(out, f)).read().splitlines()
    ids = sorted(int(ln.split("\x1f")[0]) for ln in lines)
    assert ids == list(range(500))


def test_transform_with_state_builds_and_gates(spark, sf_dir):
    """transformWithStateInPandas (state-v2: typed value/list/map
    states, TTL, timers): the per-user MapState type-counts operator
    must BUILD and analyze (schema resolved) in any environment; it
    EXECUTES only where google.protobuf exists (the state-v2
    Python<->JVM protocol is protobuf-framed — absent in this
    container, which is environment-forced, like the imaging codecs)."""
    from aics_dask_utils_spark.streaming.ops import (
        per_user_type_counts_tws,
        read_events_stream,
        run_stream_to_memory,
    )

    sdf = per_user_type_counts_tws(read_events_stream(spark, sf_dir))
    assert sdf.isStreaming
    assert [f.name for f in sdf.schema.fields] == ["user_id", "event_type", "n"]

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf absent: state-v2 runtime unavailable here")

    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        name = run_stream_to_memory(sdf, "update")
        got = spark.table(name).groupBy("user_id", "event_type").max("n")
        expected = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy("user_id", "event_type")
            .count()
        )
        assert got.count() == expected.count()
    finally:
        if old:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)


def test_session_fn_two_late_events_group_together():
    # two late events within the gap of EACH OTHER but a full gap before
    # the open session must emit as ONE closed late session, not two
    # overlapping singletons
    import datetime as dt

    t = lambda h, m: dt.datetime(2020, 1, 1, h, m)
    state = _FakeGroupState(value=(t(10, 0), t(10, 10), 2))
    out = _run_session_fn([t(9, 0), t(9, 5)], state)
    assert len(out) == 2  # one closed late session + the open session
    late = out[out["session_start"] == t(9, 0)].iloc[0]
    assert late["n_events"] == 2
    assert state.get == (t(10, 0), t(10, 10), 2)  # open untouched


def test_session_fn_late_chain_merges_into_open():
    # 9:05 is a full gap before the open 10:00 start, but 9:31 bridges:
    # 9:05<->9:31 (26min) and 9:31<->10:00 (29min) both under the 30-min
    # gap, so ALL of it chain-merges into one open session from 9:05
    import datetime as dt

    t = lambda h, m: dt.datetime(2020, 1, 1, h, m)
    state = _FakeGroupState(value=(t(10, 0), t(10, 10), 2))
    out = _run_session_fn([t(9, 5), t(9, 31)], state)
    assert len(out) == 1
    assert state.get == (t(9, 5), t(10, 10), 4)


def test_streaming_cusum_chains_state_and_alarms(spark, tmp_path_factory):
    """Online CUSUM: state chains across two in-order micro-batches
    (the documented order contract), the fold matches a Python
    reference exactly, and the alarm timestamp freezes at the first
    h-crossing even though later rows keep moving S+/S-."""
    import datetime as dt
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F  # noqa: F401

    from aics_dask_utils_spark.streaming.ops import (
        run_stream_to_memory,
        streaming_cusum,
    )

    src = tmp_path_factory.mktemp("cusum_src")

    def write_file(rows, name, mtime):
        tmp = str(src) + f"_{name}_tmp"
        spark.createDataFrame(
            rows, "g string, ts timestamp, v double"
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(str(src), f"{name}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (mtime, mtime))

    t = lambda i: dt.datetime(2020, 1, 1, 0, i)
    # 'shift' jumps from the target (10) to 13 at minute 3 -> alarms;
    # 'stable' hovers at the target -> never alarms
    b1 = [("shift", t(0), 10.0), ("shift", t(1), 10.5), ("stable", t(0), 10.0)]
    b2 = [
        ("shift", t(2), 9.5),
        ("shift", t(3), 13.0),
        ("shift", t(4), 13.5),
        ("shift", t(5), 13.2),
        ("stable", t(1), 9.8),
    ]
    write_file(b1, "b1", 1_600_000_000)
    write_file(b2, "b2", 1_600_000_100)

    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    out = streaming_cusum(
        stream, "g", "ts", "v", target=10.0, std=1.0, k=0.5, h=2.0
    )
    name = run_stream_to_memory(out, "update")
    rows = spark.table(name).collect()
    # final state per group = the row with max n
    final = {}
    for r in rows:
        if r["group"] not in final or r["n"] > final[r["group"]]["n"]:
            final[r["group"]] = r

    def reference(vals):
        s_pos = s_neg = 0.0
        alarm = None
        for ts, v in vals:
            z = (v - 10.0) / 1.0
            s_pos = max(0.0, s_pos + z - 0.5)
            s_neg = max(0.0, s_neg - z - 0.5)
            if alarm is None and max(s_pos, s_neg) > 2.0:
                alarm = ts
        return round(s_pos, 6), round(s_neg, 6), alarm

    shift_ref = reference(
        [(t(0), 10.0), (t(1), 10.5), (t(2), 9.5), (t(3), 13.0),
         (t(4), 13.5), (t(5), 13.2)]
    )
    sh = final["shift"]
    assert sh["n"] == 6
    assert (sh["s_pos"], sh["s_neg"]) == shift_ref[:2]
    assert sh["alarmed"] and sh["first_alarm_ts"] == shift_ref[2]
    st = final["stable"]
    assert st["n"] == 2 and not st["alarmed"] and st["first_alarm_ts"] is None
    # two batches -> two update rows for 'shift': state chained, and
    # the batch-1 row was not yet alarmed
    shift_rows = sorted(
        (r for r in rows if r["group"] == "shift"), key=lambda r: r["n"]
    )
    assert [r["n"] for r in shift_rows] == [2, 6]
    assert not shift_rows[0]["alarmed"]
