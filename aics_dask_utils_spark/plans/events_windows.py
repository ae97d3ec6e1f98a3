"""Event-time plans over `events` (E17, E33, E41–E44 batch semantics).

Time-window semantics are defined identically on both engines through
epoch arithmetic (floor(epoch/width)*width), which is exactly how
Spark's ``F.window`` aligns tumbling/sliding windows (epoch origin,
UTC). Session windows follow Spark's half-open [start, last+gap)
semantics, replicated in the oracle via lag/gap/cumsum.

The same aggregations run as true Structured Streaming queries in
:mod:`..streaming`; batch mode is what the DuckDB oracle can verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.deterministic import davg, drounded, dsum
from ..operators.asof import asof_join
from ..sources import load_table
from . import register

# DuckDB view of events with Spark's µs truncation applied.
_EV = "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"


@register(
    "asof_join_events_orders",
    oracle=f"""
    SELECT e.event_id, e.user_id, e.ts, e.event_type,
           o.o_orderkey AS asof_o_orderkey,
           o.o_orderdate AS asof_o_orderdate
    FROM {_EV} e
    LEFT JOIN LATERAL (
      SELECT o_orderkey, o_orderdate
      FROM orders o
      WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      ORDER BY o_orderdate DESC, o_orderkey DESC
      LIMIT 1
    ) o ON TRUE
    """,
    doc="as-of join: each event matched to the latest prior order of the "
    "same user — union+last(ignorenulls) single-shuffle formulation (E17)",
    tags=("events", "join"),
)
def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    orders = load_table(spark, sf_dir, "orders")
    return asof_join(
        ev,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate"],
        tiebreak="o_orderkey",
    )


@register(
    "events_tumbling",
    oracle=f"""
    SELECT to_timestamp(floor(epoch(ts) / 600) * 600)::TIMESTAMP       AS window_start,
           to_timestamp(floor(epoch(ts) / 600) * 600 + 600)::TIMESTAMP AS window_end,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
    FROM {_EV}
    GROUP BY 1, 2, 3
    """,
    doc="10-min tumbling window aggregation (E42 batch form)",
    tags=("events", "window"),
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "events_sliding",
    oracle=f"""
    WITH slid AS (
      SELECT e.*,
             to_timestamp(floor(epoch(ts) / 300) * 300 - k * 300)::TIMESTAMP AS window_start
      FROM {_EV} e CROSS JOIN (SELECT unnest([0, 1]) AS k) ks
    )
    SELECT window_start,
           window_start + INTERVAL 10 MINUTE AS window_end,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
    FROM slid
    GROUP BY 1, 2
    """,
    doc="10-min window sliding every 5 min — each event lands in 2 windows "
    "(E42); Spark materializes the per-event window list, same as the "
    "oracle's unnest",
    tags=("events", "window"),
)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
            "sum_value",
        )
    )


@register(
    "events_session",
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
    doc="session windows with 30-min gap per user (E43 batch form); "
    "Spark session_window semantics: [first_ts, last_ts + gap)",
    tags=("events", "window"),
)
def events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "events_rate_per_type",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_value,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts
    FROM {_EV}
    GROUP BY event_type
    """,
    doc="per-type event profile over the full stream (E33/E20 on events)",
    tags=("events", "agg"),
)
def events_rate_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        dsum("value").alias("sum_value"),
        (dsum("value") / F.count(F.lit(1))).alias("avg_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


@register(
    "events_funnel",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup'   THEN ts END) AS t_signup,
             MIN(CASE WHEN event_type = 'view'     THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click'    THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM {_EV}
      GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_signup,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_view_after_signup,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup
                         AND t_click > t_view
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_click_after_view,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup
                         AND t_click > t_view AND t_purchase > t_click
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
    FROM u
    """,
    doc="ordered conversion funnel signup→view→click→purchase via "
    "conditional-min stage timestamps — one shuffle on user_id, then a "
    "single-row global rollup (E20/E33 sequential-pattern analytics)",
    tags=("events", "agg"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def stage_min(et: str):
        return F.min(F.when(F.col("event_type") == et, F.col("ts")))

    u = ev.groupBy("user_id").agg(
        stage_min("signup").alias("t_signup"),
        stage_min("view").alias("t_view"),
        stage_min("click").alias("t_click"),
        stage_min("purchase").alias("t_purchase"),
    )
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & (F.col("t_view") > F.col("t_signup"))
    s3 = s2 & (F.col("t_click") > F.col("t_view"))
    s4 = s3 & (F.col("t_purchase") > F.col("t_click"))

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    return u.agg(
        F.count(F.lit(1)).alias("n_users"),
        cnt(s1).alias("n_signup"),
        cnt(s2).alias("n_view_after_signup"),
        cnt(s3).alias("n_click_after_view"),
        cnt(s4).alias("n_full_funnel"),
    )


@register(
    "events_daily_active",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
    FROM {_EV}
    GROUP BY 1
    """,
    doc="daily-active rollup: events, distinct users, exact-decimal "
    "value sum per calendar day (E21/E33)",
    tags=("events", "agg"),
)
def events_daily_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dsum("value").alias("sum_value"),
    )


@register(
    "events_retention",
    oracle=f"""
    WITH d AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
               FROM {_EV}),
    firsts AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id)
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, d.day) AS INT) AS day_offset,
           COUNT(DISTINCT d.user_id) AS n_active
    FROM d JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """,
    doc="cohort retention: users bucketed by first-active day, distinct "
    "actives per (cohort, day-offset) — first-touch relation is tiny "
    "per cohort and joins back broadcast-style at scale (E20/E33)",
    tags=("events", "agg"),
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    from pyspark.storagelevel import StorageLevel

    # persisted: the cohort derivation and the retention join both
    # consume the distinct (user, day) relation; without this the
    # events source is scanned (and deduplicated) twice
    d = (
        ev.select(
            "user_id",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    firsts = d.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        d.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "events_anomaly_zscore",
    oracle=f"""
    WITH stats AS (
      SELECT event_type,
             CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(value)
                 AS mean_value,
             ROUND(STDDEV_SAMP(value), 6) AS std_value
      FROM {_EV} GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           (e.value - s.mean_value) / s.std_value AS zscore,
           CAST(ABS((e.value - s.mean_value) / s.std_value) > 2.0 AS INT)
               AS is_anomaly
    FROM {_EV} e JOIN stats s USING (event_type)
    """,
    doc="per-type z-score normalization + outlier flag: tiny stats "
    "relation broadcast back onto the stream — the standard two-pass "
    "normalize at 100 TB (E20/E22/E34)",
    tags=("events", "agg"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        davg("value").alias("mean_value"),
        drounded(F.stddev_samp("value")).alias("std_value"),
    )
    z = (F.col("value") - F.col("mean_value")) / F.col("std_value")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            z.alias("zscore"),
            (F.abs(z) > 2.0).cast("int").alias("is_anomaly"),
        )
    )


@register(
    "events_resample_ffill",
    oracle=f"""
    WITH e AS (
      SELECT user_id,
             to_timestamp(floor(epoch(ts) / 3600) * 3600)::TIMESTAMP AS bucket,
             value
      FROM {_EV}
    ),
    agg AS (
      SELECT user_id, bucket, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
      FROM e GROUP BY user_id, bucket
    ),
    rng AS (SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi FROM agg GROUP BY user_id),
    filled AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      FROM rng
    )
    SELECT f.user_id, f.bucket, COALESCE(a.n, 0) AS n, a.sum_value,
           LAST_VALUE(a.sum_value IGNORE NULLS) OVER (
             PARTITION BY f.user_id ORDER BY f.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM filled f LEFT JOIN agg a ON f.user_id = a.user_id AND f.bucket = a.bucket
    """,
    doc="time-series resample to a regular hourly grid per user: bucket "
    "aggregate, gap-fill missing buckets via per-user sequence+explode, "
    "forward-fill the last observed value (E27/E33/E51 feature-"
    "engineering composite). The dense grid is generated from a tiny "
    "per-user (lo, hi) relation, never by cross-joining a calendar",
    tags=("events", "window"),
)
def events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "user_id",
        F.timestamp_seconds(F.floor(F.unix_timestamp("ts") / 3600) * 3600).alias(
            "bucket"
        ),
        "value",
    )
    from pyspark.storagelevel import StorageLevel

    # persisted: the range derivation and the gap-fill join both
    # consume the hourly grid; without this events is scanned twice
    agg = (
        b.groupBy("user_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rng = agg.groupBy("user_id").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    filled = rng.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("bucket"),
    )
    w = W.partitionBy("user_id").orderBy("bucket")
    return (
        filled.join(agg, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            "bucket",
            F.coalesce("n", F.lit(0)).alias("n"),
            "sum_value",
            F.last("sum_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


@register(
    "events_cumulative_users",
    oracle=f"""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
      FROM {_EV} GROUP BY user_id
    ),
    daily AS (
      SELECT first_day AS day, COUNT(*) AS new_users
      FROM first_seen GROUP BY first_day
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cumulative_users
    FROM daily
    """,
    doc="cumulative distinct users per day (E51): running COUNT(DISTINCT) "
    "done right — each user reduces to one first-seen row (one shuffle "
    "on user), days aggregate new arrivals, a running sum over the tiny "
    "daily relation finishes it. The naive per-day distinct-over-"
    "expanding-window rescans history quadratically; this is linear",
    tags=("events", "window"),
)
def events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    daily = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return daily.select(
        "day", "new_users", F.sum("new_users").over(w).alias("cumulative_users")
    )


@register(
    "events_session_funnel",
    oracle=f"""
    WITH e AS (SELECT user_id, ts, event_type FROM {_EV}),
    flagged AS (
      SELECT user_id, ts, event_type,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type)
                       >= INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_type) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM e
    ),
    sessions AS (
      SELECT user_id, ts, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_type
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    ),
    per_session AS (
      SELECT user_id, session_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM sessions GROUP BY user_id, session_id
    )
    SELECT COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS s_view,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click >= t_view
                    THEN 1 ELSE 0 END) AS BIGINT) AS s_view_click,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click >= t_view
                     AND t_purchase >= t_click THEN 1 ELSE 0 END) AS BIGINT) AS s_full_funnel
    FROM per_session
    """,
    doc="session-scoped conversion funnel (E43+E51 composed): gap-based "
    "sessionization (30-min, lag+cumsum — one window shuffle per user), "
    "then ordered view->click->purchase progression checked with "
    "conditional-min timestamps INSIDE each session. The funnel "
    "analytics every event pipeline ends up needing, without a second "
    "pass over the events",
    tags=("events", "window"),
)
def events_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w_order = W.partitionBy("user_id").orderBy("ts", "event_type")
    # Timestamp subtraction vs an interval literal, NOT unix_timestamp
    # deltas: unix_timestamp truncates to whole seconds, which can flip
    # a gap within 1s of the 30-min boundary relative to the oracle's
    # exact µs interval comparison. ts - lag(ts) is exact and works for
    # both LTZ and NTZ timestamps.
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w_order).isNull()
            | (
                F.col("ts") - F.lag("ts").over(w_order)
                >= F.expr("INTERVAL 30 MINUTES")
            ),
            1,
        ).otherwise(0),
    )
    w_run = w_order.rowsBetween(W.unboundedPreceding, W.currentRow)
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(w_run))
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0)).alias("s_view"),
        F.sum(
            F.when(
                F.col("t_view").isNotNull() & (F.col("t_click") >= F.col("t_view")),
                1,
            ).otherwise(0)
        ).alias("s_view_click"),
        F.sum(
            F.when(
                F.col("t_view").isNotNull()
                & (F.col("t_click") >= F.col("t_view"))
                & (F.col("t_purchase") >= F.col("t_click")),
                1,
            ).otherwise(0)
        ).alias("s_full_funnel"),
    )


@register(
    "events_daily_growth",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
      FROM {_EV} GROUP BY day
    )
    SELECT day, n, total_value,
           n - LAG(n) OVER (ORDER BY day) AS n_delta,
           ROUND((n - LAG(n) OVER (ORDER BY day)) * 100.0
                 / LAG(n) OVER (ORDER BY day), 6) AS pct_change
    FROM daily
    """,
    doc="day-over-day growth (E26/E51): daily aggregate + lag deltas and "
    "percent change — the reporting staple; the lag window runs over "
    "the tiny daily relation, never the event stream",
    tags=("events", "window"),
)
def events_daily_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value")
    )
    w = W.orderBy("day")
    lag_n = F.lag("n").over(w)
    return daily.select(
        "day",
        "n",
        "total_value",
        (F.col("n") - lag_n).alias("n_delta"),
        F.round((F.col("n") - lag_n) * 100.0 / lag_n, 6).alias("pct_change"),
    )


@register(
    "events_pattern_match",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, ts, event_type,
             LAG(event_type, 1) OVER w AS prev1,
             LAG(event_type, 2) OVER w AS prev2
      FROM {_EV}
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id AS purchase_event_id, ts AS purchase_ts
    FROM seq
    WHERE event_type = 'purchase' AND prev1 = 'view' AND prev2 = 'view'
    """,
    doc="sequential pattern detection (MATCH_RECOGNIZE-lite, E26 "
    "composed): find view->view->purchase as three CONSECUTIVE events "
    "per user — two lag columns over a totally-ordered per-user window "
    "(event_id breaks ts ties), then a row filter. One shuffle on "
    "user_id; arbitrary fixed-length patterns are more lag columns, "
    "not more passes",
    tags=("events", "window"),
)
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.lag("event_type", 1).over(w).alias("prev1"),
        F.lag("event_type", 2).over(w).alias("prev2"),
    )
    return seq.where(
        (F.col("event_type") == "purchase")
        & (F.col("prev1") == "view")
        & (F.col("prev2") == "view")
    ).select(
        "user_id",
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("purchase_ts"),
    )


@register(
    "events_ewma",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id, ts, value FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           list_reduce(
             [0.0] || list(value ORDER BY ts, event_id),
             (acc, x) -> acc * 0.7 + x * 0.3
           ) AS ewma_value
    FROM s GROUP BY user_id ORDER BY user_id
    """,
    doc="exponentially-weighted moving average per user — the "
    "inherently ORDER-SENSITIVE recursive time-series feature "
    "(ewma_t = 0.3·x_t + 0.7·ewma_{t-1}, zero-seeded). Expressed as a "
    "deterministic left fold over each user's (ts, event_id)-sorted "
    "series: collect_list + array_sort + F.aggregate — one shuffle on "
    "user_id, the fold runs JVM-side inside the aggregate, and because "
    "both engines execute the identical float operation sequence the "
    "result doubles hash-match bit-exactly with NO rounding. The "
    "sessionized-feature pattern for per-entity state at 100 TB: "
    "per-user series are small even when the corpus is not (E24,E27)",
    tags=("events", "window"),
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    series = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s["value"],
    )
    ewma = F.aggregate(
        series, F.lit(0.0), lambda acc, x: acc * F.lit(0.7) + x * F.lit(0.3)
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            ewma.alias("ewma_value"),
        )
        .orderBy("user_id")
    )


@register(
    "asof_join_forward_tolerance",
    oracle=f"""
    SELECT e.event_id, e.user_id, e.ts, e.event_type,
           CASE WHEN o.o_orderdate IS NOT NULL
                 AND epoch(o.o_orderdate) - epoch(e.ts) <= 7 * 86400
                THEN o.o_orderkey END AS asof_o_orderkey,
           CASE WHEN o.o_orderdate IS NOT NULL
                 AND epoch(o.o_orderdate) - epoch(e.ts) <= 7 * 86400
                THEN o.o_orderdate END AS asof_o_orderdate
    FROM {_EV} e
    LEFT JOIN LATERAL (
      SELECT o_orderkey, o_orderdate
      FROM orders o
      WHERE o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
      ORDER BY o_orderdate ASC, o_orderkey ASC
      LIMIT 1
    ) o ON TRUE
    """,
    doc="FORWARD as-of join with tolerance (pandas merge_asof "
    "direction='forward', tolerance='7d'): each event matched to the "
    "EARLIEST following order of the same user, and matches farther "
    "than 7 days are nulled. Same single-shuffle union+carry as the "
    "backward form — forward just flips the sort, tolerance is one "
    "post-carry predicate, so the scale shape is unchanged: no range "
    "join, no per-row fan-out (E17)",
    tags=("events", "join"),
)
def asof_join_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    orders = load_table(spark, sf_dir, "orders")
    return asof_join(
        ev,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate"],
        tiebreak="o_orderkey",
        direction="forward",
        tolerance_seconds=7 * 86400,
    )


@register(
    "asof_join_nearest",
    oracle=f"""
    WITH m AS (
      SELECT e.event_id, e.user_id, e.ts, e.event_type,
             b.o_orderkey AS b_key, b.o_orderdate AS b_ts,
             f.o_orderkey AS f_key, f.o_orderdate AS f_ts
      FROM {_EV} e
      LEFT JOIN LATERAL (
        SELECT o_orderkey, o_orderdate FROM orders o
        WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
      ) b ON TRUE
      LEFT JOIN LATERAL (
        SELECT o_orderkey, o_orderdate FROM orders o
        WHERE o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
        ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 1
      ) f ON TRUE
    )
    SELECT event_id, user_id, ts, event_type,
           CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL
                  OR epoch(ts) - epoch(b_ts) <= epoch(f_ts) - epoch(ts))
                THEN b_key ELSE f_key END AS asof_o_orderkey,
           CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL
                  OR epoch(ts) - epoch(b_ts) <= epoch(f_ts) - epoch(ts))
                THEN b_ts ELSE f_ts END AS asof_o_orderdate
    FROM m
    """,
    doc="NEAREST as-of join (pandas merge_asof direction='nearest'): "
    "each event matched to the time-closest order of the same user in "
    "EITHER direction; an exact gap tie goes to the prior order (the "
    "pandas rule). Both direction carries run over ONE keyed shuffle "
    "(two per-partition sorts, no range join, no fan-out) — the scale "
    "shape is identical to the backward form (E17)",
    tags=("events", "join"),
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    orders = load_table(spark, sf_dir, "orders")
    return asof_join(
        ev,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate"],
        tiebreak="o_orderkey",
        direction="nearest",
    )


@register(
    "events_markov_transitions",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_type
      FROM {_EV}
    ),
    pairs AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    tot AS (SELECT prev_type, SUM(n) AS t FROM pairs GROUP BY prev_type)
    SELECT p.prev_type, p.next_type, p.n,
           ROUND(p.n::DOUBLE / t.t, 9) AS prob
    FROM pairs p JOIN tot t ON p.prev_type = t.prev_type
    ORDER BY p.prev_type, p.next_type
    """,
    doc="first-order Markov transition matrix over per-user event "
    "sequences (E26/E51 family): lag over a totally-ordered per-user "
    "window yields (prev, next) pairs, one keyed agg counts them, and "
    "row probabilities come from a per-prev total — the "
    "behavioral-model primitive behind next-event prediction and "
    "anomaly scoring. One user-keyed shuffle for the window, then "
    "|types|^2-sized relations; integer ratio to 9dp so the doubles "
    "hash-match",
    tags=("events", "window", "agg"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    )
    pairs = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # per-prev totals as a window over the tiny pair relation — a
    # groupBy+self-join here would re-evaluate the whole user-window
    # subtree for the second consumer (one extra fact shuffle)
    return (
        pairs.withColumn(
            "t", F.sum("n").over(W.partitionBy("prev_type"))
        )
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("t"), 9).alias("prob"),
        )
        .orderBy("prev_type", "next_type")
    )


@register(
    "events_rfm_segments",
    oracle=f"""
    WITH m AS (
      SELECT user_id,
             MAX(ts) AS last_ts,
             COUNT(*) AS freq,
             CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS monetary
      FROM {_EV} WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    scored AS (
      SELECT user_id,
             NTILE(4) OVER (ORDER BY last_ts DESC, user_id) AS r,
             NTILE(4) OVER (ORDER BY freq DESC, user_id) AS f,
             NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS mq
      FROM m
    )
    SELECT r, f, mq,
           COUNT(*) AS n_users,
           MIN(user_id) AS sample_user
    FROM scored GROUP BY r, f, mq ORDER BY r, f, mq
    """,
    doc="RFM segmentation (E25/E51 family — the classic customer-"
    "analytics quartile grid): per-user recency/frequency/monetary "
    "from purchase events, NTILE(4) on each axis with a total "
    "deterministic order (metric, then user_id), then segment "
    "occupancy counts. One user-keyed agg, then each axis gets a "
    "DISTRIBUTED exact global rank (operators/stats.py:"
    "global_row_numbers, two-phase range-partitioned — the |users| "
    "relation never funnels through one task) and the exact-integer "
    "NTILE formula (ntile_from_rank) against a broadcast 1-row "
    "count; bit-identical to F.ntile, fully parallel at 100 TB",
    tags=("events", "window", "agg"),
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import global_row_numbers, ntile_from_rank

    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    m = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("freq"),
        dsum("value").alias("monetary"),
    )
    # three distributed ranks chained over the per-user relation; each
    # stage persists its range-partitioned input internally, so the
    # fact table is scanned exactly once
    r1 = global_row_numbers(
        m, [F.desc("last_ts"), F.asc("user_id")], out_col="_ir"
    )
    r2 = global_row_numbers(
        r1, [F.desc("freq"), F.asc("user_id")], out_col="_if"
    )
    r3 = global_row_numbers(
        r2, [F.desc("monetary"), F.asc("user_id")], out_col="_im"
    )
    # 1-row user count from the persisted rank lineage (no re-scan)
    nrow = r3.agg(F.max("_im").alias("_n"))
    scored = r3.crossJoin(F.broadcast(nrow)).select(
        "user_id",
        ntile_from_rank(F.col("_ir"), F.col("_n"), 4).alias("r"),
        ntile_from_rank(F.col("_if"), F.col("_n"), 4).alias("f"),
        ntile_from_rank(F.col("_im"), F.col("_n"), 4).alias("mq"),
    )
    return (
        scored.groupBy("r", "f", "mq")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("user_id").alias("sample_user"),
        )
        .orderBy("r", "f", "mq")
    )


@register(
    "events_attribution_linear",
    oracle=f"""
    WITH p AS (
      SELECT user_id, ts AS pts, event_id AS pid, value
      FROM {_EV} WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, ts AS cts, event_id AS cid
      FROM {_EV} WHERE event_type = 'click'
    ),
    j AS (
      SELECT p.pid, p.user_id, p.value, c.cid
      FROM p JOIN c ON p.user_id = c.user_id
       AND c.cts <= p.pts AND c.cts >= p.pts - INTERVAL 2 HOUR
    )
    SELECT pid, user_id,
           COUNT(*) AS n_touches,
           ROUND(MAX(value) / COUNT(*), 6) AS credit_per_touch,
           MIN(cid) AS first_click
    FROM j GROUP BY pid, user_id ORDER BY pid
    """,
    doc="linear multi-touch attribution (E51 family — the marketing-"
    "analytics credit model): each purchase's value splits equally "
    "across the same user's clicks in the preceding 2-hour window. "
    "The purchase-click match is an EQUI-join on user_id with a time-"
    "range residual — SortMergeJoin, never a nested loop (same "
    "discipline as join_interval_bucketed); per-purchase credit is "
    "one keyed agg. At 100 TB both sides shuffle once on user_id and "
    "the residual prunes in-stream",
    tags=("events", "join", "agg"),
)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("pts"),
        F.col("event_id").alias("pid"),
        "value",
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cuser"),
        F.col("ts").alias("cts"),
        F.col("event_id").alias("cid"),
    )
    j = p.join(
        c,
        (F.col("user_id") == F.col("cuser"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 2 HOUR")),
    )
    return (
        j.groupBy("pid", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.round(F.max("value") / F.count(F.lit(1)), 6).alias(
                "credit_per_touch"
            ),
            F.min("cid").alias("first_click"),
        )
        .orderBy("pid")
    )


@register(
    "agg_two_level_rollup",
    oracle=f"""
    SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,12))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
    FROM {_EV}
    GROUP BY 1 ORDER BY month
    """,
    doc="two-level rollup / re-aggregation (E20/E23 maintenance "
    "pattern): daily partial aggregate states (count, exact-decimal "
    "sum, min, max) MERGE into monthly aggregates — the monthly result "
    "is computed from the daily partials, never from the raw rows, and "
    "hash-matches an oracle that aggregates raw->monthly directly. "
    "This is the pre-aggregation contract that makes 100 TB dashboards "
    "tractable: the raw scan happens once into ~365 daily rows/key, "
    "every coarser granularity re-aggregates the tiny partial "
    "relation; correctness of the merge (sum-of-sums, min-of-mins, "
    "count-of-counts, day-count = COUNT(*) over daily rows) is exactly "
    "what this plan proves",
    tags=("events", "agg"),
)
def agg_two_level_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("d_n"),
        F.sum(F.col("value").cast("decimal(30,12)")).alias("d_sum"),
        F.min("value").alias("d_min"),
        F.max("value").alias("d_max"),
    )
    monthly = daily.groupBy(F.trunc("day", "month").alias("month")).agg(
        F.sum("d_n").cast("long").alias("n_events"),
        F.sum("d_sum").cast("double").alias("sum_value"),
        F.min("d_min").alias("min_value"),
        F.max("d_max").alias("max_value"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    return monthly.orderBy("month")


@register(
    "events_session_dynamic_gap",
    oracle=f"""
    WITH e AS (
      SELECT user_id, ts,
             ts + CASE WHEN event_type = 'purchase'
                       THEN INTERVAL 60 MINUTE
                       ELSE INTERVAL 30 MINUTE END AS iv_end
      FROM {_EV}
    ),
    m AS (
      SELECT user_id, ts, iv_end,
             MAX(iv_end) OVER (PARTITION BY user_id ORDER BY ts, iv_end
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_end
      FROM e
    ),
    flagged AS (
      SELECT user_id, ts, iv_end,
             CASE WHEN prev_max_end IS NULL OR ts >= prev_max_end
                  THEN 1 ELSE 0 END AS new_session
      FROM m
    ),
    sessions AS (
      SELECT user_id, ts, iv_end,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, iv_end
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(iv_end) AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
    doc="DYNAMIC-gap session windows (E43 depth): purchases hold a "
    "session open for 60 minutes, other events for 30 — the per-row "
    "gap expression every engagement pipeline eventually needs "
    "(checkout flows idle longer than browsing). Spark's built-in "
    "session_window(ts, CASE...) implements interval-union semantics "
    "(merge while ts < running max end; session end = MAX(ts+gap), "
    "which an earlier long-gap event can own — verified empirically); "
    "the oracle re-derives those semantics independently via a "
    "prefix-max window + cumsum, so the hash match cross-checks "
    "Spark's native operator against a from-scratch formulation",
    tags=("events", "window"),
)
def events_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "purchase", F.lit("60 minutes")).otherwise(
        F.lit("30 minutes")
    )
    return (
        ev.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "join_point_in_time",
    oracle="""
    WITH bounds AS (
      SELECT epoch_us(MIN(ts)) AS t0, epoch_us(MAX(ts)) + 1 AS t1 FROM events
    ),
    ks AS (SELECT unnest(range(3)) AS version_k),
    vers AS (
      SELECT c_custkey AS user_id, version_k,
             t0 + version_k * ((t1 - t0 + 2) // 3) AS vf_us,
             CASE WHEN version_k = 2 THEN 9223372036854775807
                  ELSE t0 + (version_k + 1) * ((t1 - t0 + 2) // 3)
             END AS vt_us
      FROM customer, bounds, ks
    )
    SELECT v.version_k,
           COUNT(*) AS n_events,
           COUNT(DISTINCT e.user_id) AS n_users,
           CAST(SUM(CAST(e.value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
    FROM events e
    JOIN vers v ON e.user_id = v.user_id
               AND epoch_us(e.ts) >= v.vf_us AND epoch_us(e.ts) < v.vt_us
    GROUP BY v.version_k
    ORDER BY v.version_k
    """,
    doc="point-in-time (PIT) join against an SCD2-style versioned "
    "dimension: each fact row picks the dimension version whose "
    "[valid_from, valid_to) interval contains its event time — the "
    "feature-store lookup that prevents label leakage in training-data "
    "builds. Planned as an EQUI-join on the entity key with the interval "
    "containment as a residual predicate: per-entity history is short "
    "(here 3 versions), so the match fan-in is bounded and there is no "
    "range-join blowup; deep histories would switch to the as-of "
    "operator (operators/asof.py). Validity boundaries and the "
    "containment test live in exact integer MICROSECONDS on both "
    "engines — no timestamp-coercion ambiguity at the interval edges "
    "(E13/E16/E17 extension)",
    tags=("join", "events", "feature-store"),
)
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    # events.ts is TIMESTAMP_NTZ; session tz is pinned UTC, so the cast
    # to TIMESTAMP (required by unix_micros) is exact.
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    bounds = ev.agg(
        F.min("ts_us").alias("t0"),
        (F.max("ts_us") + F.lit(1)).alias("t1"),
    )
    # ceil-ish integer step so 3 * step covers the whole span; the span
    # is far below 2^53, so floor over the double division matches
    # DuckDB's integer `//` bit-for-bit
    step = F.floor((F.col("t1") - F.col("t0") + F.lit(2)) / F.lit(3)).cast("long")
    vers = (
        cust.select(F.col("c_custkey").alias("user_id"))
        .crossJoin(F.broadcast(bounds))  # 1-row bounds relation
        .select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(2))).alias("version_k"),
            "t0",
            "t1",
        )
        .select(
            "user_id",
            F.col("version_k").cast("long").alias("version_k"),
            (F.col("t0") + F.col("version_k") * step).alias("vf_us"),
            F.when(F.col("version_k") == 2, F.lit(2**63 - 1))
            .otherwise(F.col("t0") + (F.col("version_k") + 1) * step)
            .alias("vt_us"),
        )
    )
    joined = ev.join(
        vers,
        (ev["user_id"] == vers["user_id"])
        & (ev["ts_us"] >= vers["vf_us"])
        & (ev["ts_us"] < vers["vt_us"]),
    )
    return (
        joined.groupBy("version_k")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct(ev["user_id"]).alias("n_users"),
            dsum("value").alias("sum_value"),
        )
        .orderBy("version_k")
    )


# ---------------------------------------------------------------------------
# Distribution-drift diagnostics (EXT, data-validation tooling).
#
# At 100 TB nobody computes an exact Kolmogorov-Smirnov statistic (it
# needs a global sort / rank of every observation); production drift
# monitors histogram both samples onto a FIXED grid and compare the
# binned ECDFs — one map-side-combined groupBy, then all statistics
# derive from the <=100-cell grid. The grid is pinned (width 5 over
# [0, 500), last bin absorbs the tail) so results are deterministic
# and the DuckDB oracle can replay them bit-for-bit.
# ---------------------------------------------------------------------------

#: Fixed drift-grid geometry shared by the plan and its oracle (the
#: PSI smoothing denominator, +50.0, is 0.5 per cell over the
#: 100-cell grid — derived inside the operator from n_bins).
_DRIFT_BIN_WIDTH = 5.0
_DRIFT_LAST_BIN = 99


@register(
    "events_value_drift",
    oracle="""
    WITH e AS (
      -- bin mirrors the operator exactly: BOTH edges clamp
      -- (GREATEST .. 0 for values below the grid, LEAST .. 99 for the
      -- tail) and NULL values are excluded, matching the Spark side.
      SELECT event_type,
             CAST(LEAST(GREATEST(FLOOR(value / 5.0), 0), 99) AS INT) AS bin
      FROM events
      WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
    ),
    b AS (
      SELECT bin,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cb
      FROM e GROUP BY bin
    ),
    t AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
                 CAST(SUM(cb) AS BIGINT) AS n_b FROM b),
    c AS (
      SELECT bin, ca, cb,
             SUM(ca) OVER (ORDER BY bin) AS cua,
             SUM(cb) OVER (ORDER BY bin) AS cub
      FROM b
    )
    SELECT t.n_a, t.n_b,
           ROUND(MAX(ABS(CAST(cua AS DOUBLE) / t.n_a
                         - CAST(cub AS DOUBLE) / t.n_b)), 9) AS ks_d,
           ROUND(list_reduce(
             [0.0] || list(
               ((CAST(ca AS DOUBLE) + 0.5) / (t.n_a + 50.0)
                - (CAST(cb AS DOUBLE) + 0.5) / (t.n_b + 50.0))
               * ln(((CAST(ca AS DOUBLE) + 0.5) / (t.n_a + 50.0))
                    / ((CAST(cb AS DOUBLE) + 0.5) / (t.n_b + 50.0)))
               ORDER BY bin),
             (a, x) -> a + x), 6) AS psi
    FROM c CROSS JOIN t
    GROUP BY t.n_a, t.n_b
    """,
    doc="two-sample distribution drift between the click and purchase "
    "value distributions: binned-ECDF Kolmogorov-Smirnov sup-distance "
    "plus the Population Stability Index on a pinned 100-cell grid "
    "(width 5, tail-absorbing last bin; PSI Laplace-smoothed 0.5/cell). "
    "The production shape of train/serve and day-over-day drift "
    "monitoring: ONE map-side-combined groupBy collapses both samples "
    "to the grid, cumulative counts stay exact integers so the KS term "
    "set is engine-identical, and the PSI doubles fold in pinned bin "
    "order (the mutual-info trick) so the sum is partition- and "
    "engine-independent. Exact KS would need a global rank of every "
    "observation - this is the statistic you can actually afford at "
    "100 TB (EXT events/data-validation)",
    tags=("events", "agg"),
)
def events_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import binned_ecdf_drift

    ev = load_table(spark, sf_dir, "events")
    return binned_ecdf_drift(
        ev,
        "value",
        "event_type",
        "click",
        "purchase",
        bin_width=_DRIFT_BIN_WIDTH,
        n_bins=_DRIFT_LAST_BIN + 1,
    )


@register(
    "events_welch_ttest",
    oracle="""
    WITH g AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv,
             CAST(SUM(CAST(value AS DECIMAL(18,2))
                      * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv2
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    b AS (SELECT n AS n_b, sv AS svb, sv2 AS sv2b
          FROM g WHERE event_type = 'view'),
    a AS (SELECT event_type, n AS n_a, sv AS sva, sv2 AS sv2a
          FROM g WHERE event_type <> 'view')
    SELECT event_type, n_a, n_b,
           ROUND(sva / n_a - svb / n_b, 6) AS mean_diff,
           ROUND((sva / n_a - svb / n_b)
                 / sqrt(((sv2a - sva * sva / n_a) / (n_a - 1)) / n_a
                        + ((sv2b - svb * svb / n_b) / (n_b - 1)) / n_b),
                 6) AS t_stat,
           ROUND(pow(((sv2a - sva * sva / n_a) / (n_a - 1)) / n_a
                     + ((sv2b - svb * svb / n_b) / (n_b - 1)) / n_b, 2)
                 / (pow(((sv2a - sva * sva / n_a) / (n_a - 1)) / n_a, 2)
                      / (n_a - 1)
                    + pow(((sv2b - svb * svb / n_b) / (n_b - 1)) / n_b, 2)
                      / (n_b - 1)), 6) AS df
    FROM a CROSS JOIN b
    ORDER BY event_type
    """,
    doc="per-variant Welch's t-test against the 'view' baseline: the "
    "A/B-experiment primitive, computed from moments only (count, "
    "exact-decimal sum, exact-decimal sum of squares - one keyed scan "
    "with map-side partials, same cost as any grouped agg; the "
    "reference's gather-then-scipy pattern would collect the raw "
    "column). Mean, variance, t and the Welch-Satterthwaite df all "
    "derive in closed form from the 5-row moment grid, every double "
    "expression mirrored token-for-token in the oracle so results are "
    "bit-stable across engines and partitionings. At 100 TB this is "
    "how you score thousands of experiment cells in one pass "
    "(EXT events/experimentation)",
    tags=("events", "agg"),
)
def events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import welch_ttest

    ev = load_table(spark, sf_dir, "events")
    return welch_ttest(ev, "value", "event_type", "view")


@register(
    "events_mann_whitney",
    oracle="""
    WITH e AS (
      -- bin mirrors the operator: both grid edges clamp, NULL values
      -- excluded (same fixed grid as events_value_drift).
      SELECT event_type,
             CAST(LEAST(GREATEST(FLOOR(value / 5.0), 0), 99) AS INT) AS bin
      FROM events
      WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
    ),
    b AS (
      SELECT bin,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cb
      FROM e GROUP BY bin
    ),
    t AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
                 CAST(SUM(cb) AS BIGINT) AS n_b FROM b),
    c AS (
      SELECT bin, ca, cb,
             COALESCE(SUM(cb) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_b_before
      FROM b
    ),
    u AS (
      SELECT list_reduce([0.0] || list(
               CAST(ca AS DOUBLE)
               * (CAST(cum_b_before AS DOUBLE) + CAST(cb AS DOUBLE) / 2.0)
               ORDER BY bin), (a, x) -> a + x) AS u_raw,
             list_reduce([0.0] || list(
               pow(CAST(ca + cb AS DOUBLE), 3) - CAST(ca + cb AS DOUBLE)
               ORDER BY bin), (a, x) -> a + x) AS tie_sum
      FROM c
    )
    SELECT t.n_a, t.n_b,
           ROUND(u.u_raw, 6) AS u_stat,
           ROUND((u.u_raw - CAST(t.n_a AS DOUBLE) * t.n_b / 2.0)
                 / sqrt((CAST(t.n_a AS DOUBLE) * t.n_b / 12.0)
                        * ((CAST(t.n_a AS DOUBLE) + t.n_b + 1.0)
                           - u.tie_sum / ((CAST(t.n_a AS DOUBLE) + t.n_b)
                                          * (CAST(t.n_a AS DOUBLE) + t.n_b
                                             - 1.0)))),
                 6) AS z_score
    FROM u CROSS JOIN t
    """,
    doc="binned two-sample Mann-Whitney U (click vs purchase values) "
    "with a tie-corrected normal z: the nonparametric complement of "
    "events_welch_ttest — no normality assumption, robust to the heavy "
    "tails production metrics actually have. Exact U needs a global "
    "rank; this reuses the pinned 100-cell drift grid, treating each "
    "cell as one midrank tie group (U = sum_i ca_i*(cumB_<i + cb_i/2), "
    "the standard tie treatment) — ONE map-side-combined groupBy, then "
    "pinned-bin-order folds over the <=100 collected cells, every "
    "double expression mirrored token-for-token in the oracle. The "
    "oracle was pre-validated bit-for-bit at sf0.001/0.01/0.1 in round "
    "5 before registration (EXT events/experimentation)",
    tags=("events", "agg"),
)
def events_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import mann_whitney_u

    ev = load_table(spark, sf_dir, "events")
    return mann_whitney_u(
        ev,
        "value",
        "event_type",
        "click",
        "purchase",
        bin_width=_DRIFT_BIN_WIDTH,
        n_bins=_DRIFT_LAST_BIN + 1,
    )
