"""Window-function plans (E25–E28).

Determinism rule: every ORDER BY inside a window carries a unique-key
tiebreak so row_number/lag/rolling frames are total-ordered — required
for cross-engine hashing and for reproducible results across Spark's
own partition orders.

Scale note: a window over ``partitionBy(k)`` shuffles once on ``k`` and
sorts within partitions — the same cost shape as a groupBy. The killer
at 100 TB is a window with NO partition key (single-task sort); none of
these plans do that (``global_topn`` uses TakeOrderedAndProject
instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.deterministic import dsum
from ..sources import load_table
from . import register


@register(
    "window_rank",
    oracle="""
    SELECT c_custkey, c_nationkey,
           ROW_NUMBER() OVER w AS rn,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4)     OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc="ranking functions per nation (E25)",
    tags=("window",),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.col("c_custkey"))
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           LAG(o_totalprice)  OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           CAST(o_totalprice - COALESCE(LAG(o_totalprice) OVER w, o_totalprice)
                AS DOUBLE) AS delta
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="analytic lag/lead/first_value + derived delta (E26)",
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        prev.alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_orderkey").over(w).alias("first_order"),
        (F.col("o_totalprice") - F.coalesce(prev, F.col("o_totalprice")))
        .cast("double")
        .alias("delta"),
    )


@register(
    "window_running",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,6)))
                OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_qty,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,6)))
                OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / LEAST(3, COUNT(*) OVER (PARTITION BY l_suppkey
                      ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
             AS rolling_avg_qty
    FROM lineitem
    """,
    doc="running sum + 3-row rolling mean, decimal-exact (E27)",
    tags=("window",),
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # (orderkey, linenumber) is NOT unique in the driver tables; ROWS
    # frames need a TOTAL order or tied rows make frame contents
    # engine-dependent. l_quantity breaks the remaining ties.
    order = [
        F.col("l_shipdate"),
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.col("l_quantity"),
    ]
    w = W.partitionBy("l_suppkey").orderBy(*order)
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    roll = w.rowsBetween(-2, W.currentRow)
    dec = F.col("l_quantity").cast("decimal(30,6)")
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(dec).over(run).cast("double").alias("running_qty"),
        (
            F.sum(dec).over(roll).cast("double")
            / F.least(F.lit(3), F.count(F.lit(1)).over(roll))
        ).alias("rolling_avg_qty"),
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) t WHERE rn <= 3
    """,
    doc="top-3 orders per customer — the canonical top-k-per-group; "
    "Spark pushes the rank filter into the sort (WindowGroupLimit) (E28)",
    tags=("window", "sort"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           percent_rank() OVER w AS pr,
           cume_dist()    OVER w AS cd,
           nth_value(c_name, 2) OVER w AS second_name
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    doc="distribution window functions percent_rank / cume_dist / "
    "nth_value under a total (tie-broken) order (E25/E26)",
    tags=("window",),
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.nth_value("c_name", 2).over(w).alias("second_name"),
    )


@register(
    "window_trailing_range",
    oracle="""
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER w AS DOUBLE)
               AS sum_last_hour
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
                 CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec
          FROM events) e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    doc="trailing 1-hour per-event rolling stats via RANGE frame on "
    "epoch seconds — the time-based sliding frame (E27) that rows-based "
    "frames can't express; decimal running sum keeps it order-exact",
    tags=("window", "events"),
)
def window_trailing_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, W.currentRow)
    )
    dec = F.col("value").cast("decimal(30,6)")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(dec).over(w).cast("double").alias("sum_last_hour"),
    )
