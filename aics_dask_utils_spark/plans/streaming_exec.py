"""Streaming-EXECUTION plans (E41–E45): the correctness gate actually
drives Structured Streaming, not a batch stand-in.

Each plan starts a real ``readStream`` over the events parquet,
drains it with ``trigger(availableNow=True)`` into a memory sink, and
returns the sink table — so the DuckDB hash-compare certifies the
streaming path end to end (source → watermark → stateful op → sink).
The single-file source yields one micro-batch, which pins the
semantics the oracle can express:

- complete-mode window aggregations equal the batch aggregation;
- watermark dedup keeps exactly one row per key (projected to the key
  columns so survivor choice — a row-order artifact — can't leak in);
- the ``applyInPandasWithState`` running count's final emission per
  key equals the batch count (max over emissions makes this robust
  to multi-batch replans).

At 100 TB these same queries run unbounded: the watermark bounds
state, and the memory sink becomes a kafka/parquet sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming import (
    dedup_events_within_watermark,
    read_events_stream,
    run_stream_to_memory,
    running_count_per_user,
    session_counts,
    tumbling_counts,
)
from . import register

_EV = "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"


@register(
    "stream_tumbling_exec",
    oracle=f"""
    SELECT to_timestamp(floor(epoch(ts) / 600) * 600)::TIMESTAMP       AS window_start,
           to_timestamp(floor(epoch(ts) / 600) * 600 + 600)::TIMESTAMP AS window_end,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
    FROM {_EV}
    GROUP BY 1, 2, 3
    """,
    doc="EXECUTED stream: tumbling window agg with watermark, availableNow "
    "to a memory sink, hash-compared to the batch oracle (E41,E42,E44)",
    tags=("streaming",),
)
def stream_tumbling_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    sdf = tumbling_counts(read_events_stream(spark, sf_dir))
    name = run_stream_to_memory(sdf, "complete")
    return spark.table(name)


@register(
    "stream_session_exec",
    oracle=f"""
    WITH e AS (SELECT user_id, ts FROM {_EV}),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM e
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
    doc="EXECUTED stream: session windows (30-min gap) per user via "
    "session_window state, availableNow drain (E41,E43,E44)",
    tags=("streaming",),
)
def stream_session_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    sdf = session_counts(read_events_stream(spark, sf_dir), gap="30 minutes")
    name = run_stream_to_memory(sdf, "complete")
    return spark.table(name)


@register(
    "stream_dedup_exec",
    oracle=f"""
    SELECT DISTINCT user_id, event_type FROM {_EV}
    """,
    doc="EXECUTED stream: dropDuplicatesWithinWatermark keeps one row per "
    "(user_id, event_type); projected to the keys so survivor choice "
    "(row-order dependent) stays out of the hash (E41,E44,E45)",
    tags=("streaming",),
)
def stream_dedup_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    sdf = dedup_events_within_watermark(read_events_stream(spark, sf_dir))
    name = run_stream_to_memory(sdf.select("user_id", "event_type"), "append")
    return spark.table(name)


@register(
    "stream_stateful_count_exec",
    oracle=f"""
    SELECT user_id, COUNT(*) AS running_count
    FROM {_EV}
    GROUP BY user_id
    """,
    doc="EXECUTED stream: applyInPandasWithState per-user running count; "
    "the final state emission per user equals the batch count (E45)",
    tags=("streaming",),
)
def stream_stateful_count_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    sdf = running_count_per_user(read_events_stream(spark, sf_dir))
    name = run_stream_to_memory(sdf, "update")
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("running_count").alias("running_count"))
    )


@register(
    "stream_sliding_exec",
    oracle=f"""
    WITH slid AS (
      SELECT e.*,
             to_timestamp(floor(epoch(ts) / 300) * 300 - k * 300)::TIMESTAMP AS window_start
      FROM {_EV} e CROSS JOIN (SELECT unnest([0, 1]) AS k) ks
    )
    SELECT window_start,
           window_start + INTERVAL 10 MINUTE AS window_end,
           COUNT(*) AS n
    FROM slid
    GROUP BY 1, 2
    """,
    doc="EXECUTED stream: 10-min windows sliding every 5 min with "
    "watermark, availableNow drain (E41,E42,E44)",
    tags=("streaming",),
)
def stream_sliding_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import sliding_counts

    sdf = sliding_counts(read_events_stream(spark, sf_dir))
    name = run_stream_to_memory(sdf, "complete")
    return spark.table(name)


@register(
    "stream_stream_join_exec",
    oracle=f"""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           c.event_id AS click_id, c.ts AS click_ts
    FROM (SELECT * FROM {_EV} WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM {_EV} WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 30 MINUTE
     AND c.ts <= p.ts
    """,
    doc="EXECUTED stream-stream interval join: purchases attributed to "
    "the same user's clicks in the prior 30 min; watermarks on both "
    "sides + two-sided time bounds keep join state finite (E41,E44)",
    tags=("streaming", "join"),
)
def stream_stream_join_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import click_purchase_join

    ev = read_events_stream(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase")
    clicks = read_events_stream(spark, sf_dir).where(
        F.col("event_type") == "click"
    )
    out = click_purchase_join(purchases, clicks)
    name = run_stream_to_memory(out, "append")
    return spark.table(name)


@register(
    "stream_foreach_batch_exec",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
    FROM {_EV}
    WHERE value > 50.0
    GROUP BY event_type
    """,
    doc="EXECUTED stream: foreachBatch parquet sink — each micro-batch "
    "lands as an atomic append, then the landed files are aggregated; "
    "checkpointed so a restart resumes, the production stream-to-lake "
    "path (E41,E45,E5)",
    tags=("streaming", "source"),
)
def stream_foreach_batch_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from ..streaming import read_events_stream
    from ..streaming.ops import run_stream_foreach_batch_parquet
    from .sources_plans import _tmp

    # pid-scoped via the shared _tmp helper: concurrent sessions must
    # not rmtree each other's in-flight sink/checkpoint dirs
    path = _tmp(sf_dir, "fb")
    for p in (path, path + "_ckpt"):
        shutil.rmtree(p, ignore_errors=True)
    sdf = read_events_stream(spark, sf_dir).where(F.col("value") > 50.0)
    run_stream_foreach_batch_parquet(sdf, path)
    return (
        spark.read.parquet(path)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(30,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


@register(
    "stream_static_join_exec",
    oracle=f"""
    SELECT c.c_nationkey,
           COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
    FROM {_EV} e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_nationkey
    """,
    doc="EXECUTED stream: stream-static enrichment join — the streaming "
    "events micro-batches join a STATIC dimension (customer; unhinted, "
    "size-planned broadcast at small scale, re-planned per micro-batch "
    "so dimension updates are picked up) "
    "and aggregate per nation in complete mode. The standard 'enrich "
    "the firehose with reference data' topology (E41,E44 family)",
    tags=("streaming", "join"),
)
def stream_static_join_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.deterministic import dsum
    from ..sources import load_table
    from ..streaming.ops import run_stream_to_memory as _run

    ev = read_events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    # No forced broadcast: customer is O(SF). The planner still builds a
    # broadcast hash per micro-batch at small scale from the static
    # side's file-size statistics; at 100 TB the dimension would exceed
    # the broadcast bound and must fall back to a shuffled join.
    joined = ev.join(cust, ev["user_id"] == cust["c_custkey"])
    agg = joined.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value")
    )
    name = _run(agg, "complete")
    return spark.table(name)


@register(
    "stream_update_mode_exec",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n
    FROM {_EV}
    GROUP BY event_type
    """,
    doc="EXECUTED stream: UPDATE output mode — only groups whose "
    "aggregate changed in a micro-batch are emitted; each emission "
    "lands via foreachBatch as an upsert record. With the single "
    "availableNow micro-batch the emitted state equals the batch "
    "aggregate, which the oracle verifies; across many batches the "
    "same sink applies latest-wins by key (E41/E44/E55 composed)",
    tags=("streaming",),
)
def stream_update_mode_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from .sources_plans import _tmp

    path = _tmp(sf_dir, "upd")
    for p in (path, path + "_ckpt"):
        shutil.rmtree(p, ignore_errors=True)

    ev = read_events_stream(spark, sf_dir)
    agg = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(path)

    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", path + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # latest-wins per key over the upsert log (single batch: identity)
    log = spark.read.parquet(path)
    return log.groupBy("event_type").agg(F.max("n").alias("n"))


@register(
    "stream_hll_rollup_exec",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS users_ok
    FROM {_EV}
    GROUP BY 1 ORDER BY 1
    """,
    doc="EXECUTED stream: per-day distinct users via hll_sketch_agg "
    "running INSIDE the streaming aggregation (E41/E44 x E65). "
    "COUNT(DISTINCT) is unsupported on streams — the state store "
    "cannot hold every key — so the mergeable sketch IS the streaming "
    "distinct-count path: per-micro-batch partials merge into ~KB of "
    "state per day. The drained state table is estimated batch-side "
    "and pinned within 5% of the exact batch distinct (sparse-mode "
    "HLL at these cardinalities is exact, so the boolean is stable); "
    "oracle = exact + TRUE",
    tags=("streaming", "sketch", "approx"),
)
def stream_hll_rollup_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import load_table
    from ..streaming import run_stream_to_memory

    sdf = read_events_stream(spark, sf_dir)
    agg = (
        sdf.withWatermark("ts", "1 day")
        .groupBy(F.date_trunc("day", F.col("ts")).cast("date").alias("day"))
        .agg(
            F.expr("hll_sketch_agg(user_id)").alias("sk"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    name = run_stream_to_memory(agg, "complete")
    est = spark.table(name).select(
        "day",
        "n_events",
        F.expr("CAST(hll_sketch_estimate(sk) AS BIGINT)").alias("est_users"),
    )
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).cast("date").alias("day"))
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    return (
        est.join(exact, "day")
        .select(
            "day",
            "n_events",
            "exact_users",
            (
                F.abs(F.col("est_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("users_ok"),
        )
        .orderBy("day")
    )


@register(
    "stream_topk_rollup_exec",
    oracle=f"""
    SELECT event_type AS item,
           COUNT(*) AS est_count,
           TRUE AS count_exact
    FROM {_EV}
    GROUP BY event_type ORDER BY item
    """,
    doc="EXECUTED stream: frequent-items sketch INSIDE the streaming "
    "aggregation (E41 x E65): approx_top_k_accumulate runs as the "
    "streaming agg state — per-micro-batch partials merge in the "
    "state store, the same mergeability the batch rollup exploits "
    "across days. Exact GROUP BY over an unbounded high-cardinality "
    "stream would grow state per key; the sketch caps state at the "
    "tracked-item budget. Budget (10) exceeds |event types| (5), so "
    "the drained estimate is provably exact — asserted in-plan "
    "against the batch counts; oracle = exact + TRUE",
    tags=("streaming", "sketch", "approx"),
)
def stream_topk_rollup_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import load_table
    from ..streaming import run_stream_to_memory

    sdf = read_events_stream(spark, sf_dir)
    agg = sdf.groupBy().agg(
        F.expr("approx_top_k_accumulate(event_type, 10)").alias("st")
    )
    name = run_stream_to_memory(agg, "complete")
    est = spark.table(name).selectExpr(
        "inline(approx_top_k_estimate(st, 10))"
    )
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("item"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        est.join(exact, est["item"] == exact["item"])
        .select(
            exact["item"],
            F.col("count").cast("long").alias("est_count"),
            (F.col("count") == F.col("n")).alias("count_exact"),
        )
        .orderBy("item")
    )


@register(
    "stream_session_state_exec",
    oracle=f"""
    WITH e AS (SELECT user_id, ts FROM {_EV}),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM e
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    doc="EXECUTED stream: session windows as a CUSTOM "
    "applyInPandasWithState machine (E43 x E45) — per-user state "
    "carries the open session, closed sessions emit immediately, the "
    "open session re-emits its latest version in update mode and the "
    "read-back keeps the last emission per (user, start). Same "
    "semantics as F.session_window (verified: the oracle IS the batch "
    "session query), but as the escape-hatch skeleton for session "
    "logic the built-in cannot express (per-session caps, absolute "
    "timeouts, carryover payloads)",
    tags=("streaming", "window"),
)
def stream_session_state_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import run_stream_to_memory
    from ..streaming.ops import custom_session_windows

    sdf = custom_session_windows(read_events_stream(spark, sf_dir))
    name = run_stream_to_memory(sdf, "update")
    return (
        spark.table(name)
        .groupBy("user_id", "session_start")
        .agg(
            F.max("session_end").alias("session_end"),
            F.max("n_events").alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
        .orderBy("user_id", "session_start")
    )


@register(
    "stream_python_source_exec",
    oracle="""
    WITH g AS (
      SELECT i,
             ['alpha','beta','gamma','delta','epsilon'][CAST(i % 5 AS INT) + 1]
               AS label,
             i * 0.5 AS score
      FROM (SELECT unnest(range(0, 1000)) AS i)
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(score AS DECIMAL(30,6))) AS DOUBLE) AS sum_score,
           MIN(i) AS min_id, MAX(i) AS max_id
    FROM g GROUP BY label ORDER BY label
    """,
    doc="EXECUTED pure-Python STREAMING source (E41 x E2 extensibility, "
    "Spark 4 SimpleDataSourceStreamReader): the graftgen_stream "
    "connector advances an explicit offset cursor {next: i} per "
    "micro-batch (the Kafka-offset/CDC-cursor shape), the engine "
    "checkpoints offsets and replays committed ranges via "
    "readBetweenOffsets on recovery, and the drained stream's per-label "
    "aggregate hash-matches an oracle regenerating the table "
    "relationally — exactly-once through a connector with zero JVM "
    "code, 9 real micro-batches",
    tags=("streaming", "source"),
)
def stream_python_source_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from ..functions.deterministic import dsum
    from ..sources.python_datasource import register_graftgen_stream

    register_graftgen_stream(spark)
    sdf = (
        spark.readStream.format("graftgen_stream")
        .option("n_rows", 1000)
        .option("batch_rows", 120)
        .load()
    )
    name = f"pystream_{uuid.uuid4().hex[:8]}"
    q = (
        sdf.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("score").alias("sum_score"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
        )
        .orderBy("label")
    )


def _run_sentinel_outer_join(
    spark: SparkSession, sf_dir: str, prefix: str, how: str
) -> str:
    """Shared scaffolding for the outer stream-stream interval joins:
    stage a 2-micro-batch file source (the real events, then one
    far-future sentinel row per join side whose watermark advance
    flushes every pending unmatched row), run the purchases⋈clicks
    interval join with the given join type into a memory sink, and
    return the sink table name. Sentinel rows carry negative ids so
    callers can filter them from the result."""
    import datetime as dt
    import glob
    import os
    import shutil
    import uuid

    tag = os.path.basename(sf_dir.rstrip("/"))
    # per-invocation uuid in the staging dir (like the memory-sink
    # query name): a fixed path + rmtree-on-entry would let two
    # concurrent sessions delete each other's source files mid-stream
    src = f"/tmp/spark_graft_{prefix}_{tag}_{uuid.uuid4().hex[:8]}"
    os.makedirs(src)
    # batch 1: the real events file; batch 2: the sentinel (later mtime
    # => later micro-batch), one far-future row per join side
    shutil.copy(os.path.join(sf_dir, "events.parquet"), os.path.join(src, "b1.parquet"))
    os.utime(os.path.join(src, "b1.parquet"), (1_600_000_000, 1_600_000_000))
    far = dt.datetime(2100, 1, 1)
    schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    sentinel_tmp = src + "_sentinel"
    spark.createDataFrame(
        [(-1, far, -1, "purchase", 0.0, ""), (-2, far, -1, "click", 0.0, "")],
        schema,
    ).coalesce(1).write.mode("overwrite").parquet(sentinel_tmp)
    part = glob.glob(os.path.join(sentinel_tmp, "part-*.parquet"))[0]
    shutil.copy(part, os.path.join(src, "b2.parquet"))
    os.utime(os.path.join(src, "b2.parquet"), (1_600_000_100, 1_600_000_100))

    sdf = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    ts_col = F.col("ts").cast("timestamp")
    p = (
        sdf.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("pu"),
            ts_col.alias("pts"),
        )
        .withWatermark("pts", "1 hour")
    )
    c = (
        sdf.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("cu"),
            ts_col.alias("cts"),
        )
        .withWatermark("cts", "1 hour")
    )
    joined = p.join(
        c,
        (F.col("cu") == F.col("pu"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 30 minutes"))
        & (F.col("cts") <= F.col("pts")),
        how,
    )
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        # the memory sink now holds the result; drop this invocation's
        # staging dirs so uuid-suffixed paths don't accumulate in /tmp
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(sentinel_tmp, ignore_errors=True)
    return name



@register(
    "stream_stream_left_join_exec",
    oracle=f"""
    WITH j AS (
      SELECT p.event_id AS purchase_id, c.event_id AS click_id
      FROM (SELECT * FROM {_EV} WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT * FROM {_EV} WHERE event_type = 'click') c
        ON c.user_id = p.user_id
       AND c.ts >= p.ts - INTERVAL 30 MINUTE
       AND c.ts <= p.ts
    )
    SELECT (click_id IS NOT NULL) AS matched,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT purchase_id) AS BIGINT) AS n_purchases
    FROM j GROUP BY 1 ORDER BY matched
    """,
    doc="EXECUTED LEFT-OUTER stream-stream interval join (E56 outer "
    "axis): purchases with NO qualifying click must still emit, with "
    "NULL click columns — but an outer stream-stream join only "
    "releases its unmatched rows when the WATERMARK passes their join "
    "window, so the source appends a far-future sentinel micro-batch "
    "(one sentinel row per side, filtered from the result) that "
    "advances both watermarks and flushes every pending row: the "
    "standard end-of-stream/backfill-completion flush pattern. "
    "Matched/unmatched purchase counts hash-match the batch LEFT JOIN "
    "oracle, proving no row was dropped or held back",
    tags=("streaming", "join"),
)
def stream_stream_left_join_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = _run_sentinel_outer_join(spark, sf_dir, "ssjl", "leftOuter")
    return (
        spark.table(name)
        # drop the sentinel row by its event id: a sentinel carries
        # purchase_id = -1, while a NULL-user purchase (kept by the
        # batch LEFT JOIN oracle) must not be dropped by a NULL filter
        .where(F.coalesce(F.col("purchase_id"), F.lit(0)) >= 0)
        .groupBy(F.col("click_id").isNotNull().alias("matched"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("purchase_id").cast("long").alias("n_purchases"),
        )
        .orderBy("matched")
    )


@register(
    "stream_stream_full_outer_join_exec",
    oracle=f"""
    WITH j AS (
      SELECT p.event_id AS purchase_id, c.event_id AS click_id
      FROM (SELECT * FROM {_EV} WHERE event_type = 'purchase') p
      FULL JOIN (SELECT * FROM {_EV} WHERE event_type = 'click') c
        ON c.user_id = p.user_id
       AND c.ts >= p.ts - INTERVAL 30 MINUTE
       AND c.ts <= p.ts
    )
    SELECT (purchase_id IS NOT NULL) AS has_purchase,
           (click_id IS NOT NULL) AS has_click,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT purchase_id) AS BIGINT) AS n_purchases,
           CAST(COUNT(DISTINCT click_id) AS BIGINT) AS n_clicks
    FROM j GROUP BY 1, 2 ORDER BY has_purchase, has_click
    """,
    doc="EXECUTED FULL-OUTER stream-stream interval join (E56, the "
    "last outer axis): unmatched rows from BOTH sides must flush once "
    "the watermark passes their join window, so the source appends one "
    "far-future sentinel row per side (they match each other and are "
    "filtered out) to advance both watermarks — the end-of-stream "
    "flush pattern shared with the left-outer plan. The three-way "
    "matched/purchase-only/click-only breakdown hash-matches the batch "
    "FULL JOIN oracle, proving no side dropped or held back rows",
    tags=("streaming", "join"),
)
def stream_stream_full_outer_join_exec(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    name = _run_sentinel_outer_join(spark, sf_dir, "ssjf", "fullOuter")
    return (
        spark.table(name)
        # the two sentinel rows match each other; drop any row where a
        # sentinel participates, identified by its negative EVENT id
        # (not user_id, so NULL-key rows survive), keep NULL sides
        .where(
            (F.coalesce(F.col("purchase_id"), F.lit(0)) >= 0)
            & (F.coalesce(F.col("click_id"), F.lit(0)) >= 0)
        )
        .groupBy(
            F.col("purchase_id").isNotNull().alias("has_purchase"),
            F.col("click_id").isNotNull().alias("has_click"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("purchase_id").cast("long").alias("n_purchases"),
            F.countDistinct("click_id").cast("long").alias("n_clicks"),
        )
        .orderBy("has_purchase", "has_click")
    )


@register(
    "stream_cusum_exec",
    oracle=f"""
    WITH e AS (
      SELECT event_type AS grp, ts,
             (CAST(value AS DOUBLE) - CAST(50.0 AS DOUBLE))
               / CAST(47.5 AS DOUBLE) AS z
      FROM {_EV}
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
        AND value IS NOT NULL
    ),
    folded AS (
      -- field order is LOAD-BEARING: DuckDB's list_reduce updates a
      -- struct accumulator field-by-field in declaration order, so a
      -- field expression sees already-recomputed earlier fields. "al"
      -- (which needs the OLD a and b) is declared FIRST; every field
      -- then reads only not-yet-overwritten fields, which is also
      -- correct under snapshot semantics.
      SELECT grp,
             list_reduce(
               [struct_pack(al := CAST(NULL AS TIMESTAMP),
                            a := CAST(0 AS DOUBLE), b := CAST(0 AS DOUBLE),
                            n := CAST(0 AS BIGINT))] ||
               list(struct_pack(al := ts, a := z, b := CAST(0 AS DOUBLE),
                                n := CAST(0 AS BIGINT))
                    ORDER BY ts, z),
               (acc, x) -> struct_pack(
                  al := coalesce(acc.al,
                    CASE WHEN greatest(
                           greatest(CAST(0 AS DOUBLE), acc.a + x.a - 0.5),
                           greatest(CAST(0 AS DOUBLE), acc.b - x.a - 0.5))
                         > CAST(8.0 AS DOUBLE)
                    THEN x.al END),
                  a := greatest(CAST(0 AS DOUBLE), acc.a + x.a - 0.5),
                  b := greatest(CAST(0 AS DOUBLE), acc.b - x.a - 0.5),
                  n := acc.n + 1)
             ) AS st
      FROM e GROUP BY grp
    )
    SELECT grp, st.n AS n, ROUND(st.a, 6) AS s_pos, ROUND(st.b, 6) AS s_neg,
           st.al IS NOT NULL AS alarmed, st.al AS first_alarm_ts
    FROM folded ORDER BY grp
    """,
    doc="EXECUTED stream: online two-sided CUSUM monitor per event type "
    "(streaming/ops.py:streaming_cusum, applyInPandasWithState — E45 "
    "custom-state family): events replay through the stream against an "
    "offline-trained reference (target 50.0, sigma 47.5 — the batch "
    "corpus moments; k=0.5, h=8.0 chosen so SOME types alarm and some "
    "don't, exercising both the alarm-freeze and the never-alarmed "
    "NULL-timestamp path), and the final per-group state (n, S+, S-, "
    "first_alarm_ts) hash-matches a DuckDB list_reduce event-time fold "
    "whose accumulator is a 4-field struct riding the same "
    "1-element-list trick as the BPE oracle. Both engines run the "
    "identical IEEE double sequence, so the unrounded statistics are "
    "bit-equal before the 6-dp presentation rounding. State is four "
    "scalars per group — bounded by the group dimension, never the "
    "stream",
    tags=("streaming", "stats"),
)
def stream_cusum_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming import read_events_stream, streaming_cusum

    sdf = streaming_cusum(
        read_events_stream(spark, sf_dir),
        "event_type",
        "ts",
        "value",
        target=50.0,
        std=47.5,
        k=0.5,
        h=8.0,
    )
    name = run_stream_to_memory(sdf, "update")
    # update mode re-emits a group's state each micro-batch it appears
    # in; n is cumulative, so the max-n emission IS the final state
    # (ties only from value-less batches, which re-emit identical rows)
    return (
        spark.table(name)
        .groupBy(F.col("group").alias("grp"))
        .agg(
            F.max_by(
                F.struct("n", "s_pos", "s_neg", "alarmed", "first_alarm_ts"),
                "n",
            ).alias("s")
        )
        .select(
            "grp",
            F.col("s.n").alias("n"),
            F.col("s.s_pos").alias("s_pos"),
            F.col("s.s_neg").alias("s_neg"),
            F.col("s.alarmed").alias("alarmed"),
            F.col("s.first_alarm_ts").alias("first_alarm_ts"),
        )
        .orderBy("grp")
    )
