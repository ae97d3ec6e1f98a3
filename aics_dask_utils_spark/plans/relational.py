"""Relational core plans (E1, E7–E8, E13–E18, E20–E24, E28–E29, E33, E47).

Every plan is declarative DataFrame/SQL — Catalyst gets predicate
pushdown, column pruning and join planning for free. Explicit
``broadcast()`` hints are reserved for build sides whose size is
INDEPENDENT of data scale — fixed-cardinality dims (region=5 rows,
nation=25 rows) and aggregate-derived scalar relations. Anything
O(SF) (customer/supplier/part/orders/lineitem, filtered or not) is
left unhinted: at the 100 TB design point a forced broadcast of a
linear relation is a guaranteed driver OOM, while AQE re-derives the
same broadcast at runtime whenever the actual post-filter size is
under ``spark.sql.autoBroadcastJoinThreshold``. The registry-wide
lint in tests/test_plan_quality.py enforces this contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.deterministic import davg, drounded, dsum
from ..sources import load_table
from . import register


# --------------------------------------------------------------------------
# q1_pricing_summary — TPC-H Q1 shape. The flagship: filter -> groupBy(2)
# -> 8 aggregates -> order. Scan-dominated; at 100 TB the only shuffle is
# the tiny 4-group aggregate exchange (partial aggregation map-side).
# --------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)       AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)  AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_quantity)      AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_discount)      AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary report (E7,E8,E20,E28,E33)",
    tags=("relational", "agg"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# q3_shipping_priority — 3-way join + agg + top-N. customer filter is
# selective -> Catalyst broadcast; orders⋈lineitem is the real shuffle,
# co-partitioned on orderkey.
# --------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective dim filter + fact join + top-N (E13,E14,E28)",
    tags=("relational", "join"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    # Join BEFORE aggregating: the BUILDING-segment filter makes the
    # orders⋈customer side selective, so the join prunes ~80% of
    # lineitems ahead of the group-by. (Pre-aggregating lineitem first —
    # the q18 trick — loses here because the join is reductive.)
    # No broadcast hint on `cust`: filtered (1/5 by segment) but still
    # O(SF) — at the 100 TB design point a forced broadcast of a linear
    # relation fails; AQE picks broadcast itself when the post-filter
    # size is under the threshold.
    return (
        li.join(
            orders.join(
                cust, F.col("c_custkey") == F.col("o_custkey")
            ).select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q5_region_revenue — 5-way star join. region/nation keep broadcast hints
# (fixed cardinality); supplier/customer are O(SF) and rely on AQE.
# lineitem is the only big side, touched once.
# --------------------------------------------------------------------------
@register(
    "q5_region_revenue",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 shape: multi-way star join with broadcast dims (E13,E14,E20)",
    tags=("relational", "join"),
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    dim = (
        supp.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    # `cust` and the supplier-derived `dim` are O(SF) — no forced
    # broadcast (would OOM the driver at 100 TB). Only the fixed-
    # cardinality nation (25) / region (5) inside `dim` keep hints;
    # AQE re-derives the small-side broadcasts at runtime when safe.
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            dim,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


# --------------------------------------------------------------------------
# Join-type coverage
# --------------------------------------------------------------------------
@register(
    "join_left_semi",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    """,
    doc="left-semi join == EXISTS (E15)",
    tags=("relational", "join"),
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return orders.join(
        li, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
    ).select("o_orderkey", "o_totalprice")


@register(
    "join_bloom_pruned",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
    """,
    doc="Bloom-prefiltered left-semi join (operators/bloom.py): the "
    "build side's keys compress into k=3 bit-set relations bounded at "
    "m=65536 rows BY CONSTRUCTION (never O(data)), the probe side is "
    "pruned by k broadcast semi joins evaluated where the probe lives "
    "— zero probe shuffle — and only survivors reach the exact semi "
    "join. Result is bit-identical to plain EXISTS; the Bloom stage "
    "only changes the physical plan. The manual, bound-explicit form "
    "of Spark's runtime bloom-filter rewrite (SPARK-32268), and the "
    "100 TB answer for 'semi join a huge probe against a selective "
    "build' (E13,E15 + scale path)",
    tags=("relational", "join"),
)
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bloom import bloom_semi_join

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49)
    return bloom_semi_join(
        orders, "o_orderkey", li.select("l_orderkey"), "l_orderkey"
    ).select("o_orderkey", "o_totalprice")


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="left-anti join == NOT EXISTS (E15)",
    tags=("relational", "join"),
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_full_outer",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
               FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
               FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
    doc="full-outer join of two aggregates (E13)",
    tags=("relational", "join"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, F.col("nk") == F.col("nk_s"), "full_outer")
        .select(
            F.coalesce("nk", "nk_s").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@register(
    "join_theta",
    oracle="""
    SELECT s_suppkey, c_custkey
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
    """,
    doc="equi + inequality (theta) join (E16); equi key carries the shuffle, "
    "the inequality is a post-join residual — no nested loop at scale",
    tags=("relational", "join"),
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    return supp.join(
        cust,
        (F.col("s_nationkey") == F.col("c_nationkey"))
        & (F.col("s_acctbal") > F.col("c_acctbal")),
    ).select("s_suppkey", "c_custkey")


@register(
    "join_cross",
    oracle="""
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    """,
    doc="cross join — dims only; a cross join over facts is forbidden at scale (E18)",
    tags=("relational", "join"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


# --------------------------------------------------------------------------
# Aggregate coverage
# --------------------------------------------------------------------------
@register(
    "agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_cust,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    doc="exact distinct aggregation (E21)",
    tags=("relational", "agg"),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 6)              AS std_qty,
           ROUND(VAR_SAMP(l_discount), 6)                 AS var_disc,
           ROUND(CORR(l_quantity, l_extendedprice), 6)    AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 6) AS covar_qty_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="statistical aggregates (E22); rounded to 6dp — single-pass moment "
    "accumulation is order-sensitive in the low bits on every engine",
    tags=("relational", "agg"),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        drounded(F.stddev_samp("l_quantity")).alias("std_qty"),
        drounded(F.var_samp("l_discount")).alias("var_disc"),
        drounded(F.corr("l_quantity", "l_extendedprice")).alias("corr_qty_price"),
        drounded(F.covar_samp("l_quantity", "l_extendedprice")).alias(
            "covar_qty_price"
        ),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@register(
    "agg_percentile",
    oracle="""
    SELECT l_linestatus,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 6)  AS median_price,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 6)  AS p90_price
    FROM lineitem GROUP BY l_linestatus
    """,
    doc="exact continuous percentiles (E22); both engines sort+interpolate",
    tags=("relational", "agg"),
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        drounded(F.percentile("l_extendedprice", F.lit(0.5))).alias("median_price"),
        drounded(F.percentile("l_extendedprice", F.lit(0.9))).alias("p90_price"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="hierarchical rollup with GROUPING disambiguation (E23)",
    tags=("relational", "agg"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity").alias("sum_qty"),
    ).select(
        "l_returnflag", "l_linestatus", "g_flag", "g_status", "n", "sum_qty"
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="cube over two dimensions (E23)",
    tags=("relational", "agg"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice").alias("sum_price"),
    ).select(
        "o_orderstatus", "o_orderpriority", "g_status", "g_prio", "n", "sum_price"
    )


@register(
    "agg_collect",
    oracle="""
    SELECT c_nationkey,
           STRING_AGG(CAST(c_custkey AS VARCHAR), ','
                      ORDER BY CAST(c_custkey AS VARCHAR)) AS custkeys,
           COUNT(*) AS n
    FROM customer GROUP BY c_nationkey
    """,
    doc="collect_list canonicalized to a sorted CSV string (E24) — "
    "per-group gather, the reference's gather() generalized",
    tags=("relational", "agg"),
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.concat_ws(
            ",", F.sort_array(F.collect_list(F.col("c_custkey").cast("string")))
        ).alias("custkeys"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_approx",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(*) AS n,
           TRUE AS approx_parts_ok,
           TRUE AS approx_median_ok
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="approx_count_distinct (HLL++) + percentile_approx — the 100 TB "
    "path where exact distinct would shuffle every key (E21,E22). "
    "Sketch estimates are engine-specific, so the CHECKABLE contract is "
    "the accuracy bound: the plan emits exact sides plus booleans "
    "asserting |approx-exact|/exact <= 5% (distinct) and the approx "
    "median landing inside the exact p40-p60 band; the oracle emits the "
    "exact sides and literal TRUE — any sketch drift hash-mismatches",
    tags=("relational", "agg", "approx"),
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey").alias("_approx_parts"),
            F.percentile_approx("l_extendedprice", 0.5, 1000).alias("_approx_med"),
            F.expr("percentile(l_extendedprice, 0.40)").alias("_p40"),
            F.expr("percentile(l_extendedprice, 0.60)").alias("_p60"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            "n",
            (
                F.abs(F.col("_approx_parts") - F.col("exact_parts"))
                <= 0.05 * F.col("exact_parts")
            ).alias("approx_parts_ok"),
            (
                (F.col("_approx_med") >= F.col("_p40"))
                & (F.col("_approx_med") <= F.col("_p60"))
            ).alias("approx_median_ok"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_hll_sketch",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           COUNT(DISTINCT l_partkey) AS exact_distinct_parts,
           TRUE AS union_estimate_ok
    FROM lineitem
    """,
    doc="mergeable HLL sketches (E21 scale path): per-group "
    "hll_sketch_agg(user buckets) -> partial-aggregatable binary state, "
    "merged across groups with hll_union_agg for a grand-total distinct "
    "estimate without re-scanning. THE pattern for distinct-counting "
    "100 TB: sketches combine map-side and union across days/partitions. "
    "Binary sketches are engine-specific, so the checkable contract is "
    "the bound: the plan emits the exact distinct plus a boolean "
    "asserting the unioned estimate lands within 5%; the oracle emits "
    "exact + literal TRUE (estimate-vs-exact tolerance also pinned in "
    "tests/test_sketches.py)",
    tags=("relational", "agg", "approx"),
)
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    exact = li.agg(F.countDistinct("l_partkey").alias("exact"))
    merged = per_flag.agg(
        F.sum("n").alias("n_rows"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("bigint").alias(
            "_approx"
        ),
    )
    return merged.crossJoin(F.broadcast(exact)).select(
        "n_rows",
        F.col("exact").alias("exact_distinct_parts"),
        (
            F.abs(F.col("_approx") - F.col("exact")) <= 0.05 * F.col("exact")
        ).alias("union_estimate_ok"),
    )



# --------------------------------------------------------------------------
# Sort / limit / set ops
# --------------------------------------------------------------------------
@register(
    "global_topn",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    doc="global top-N: Spark plans TakeOrderedAndProject — no full sort (E28)",
    tags=("relational", "sort"),
)
def global_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .limit(25)
    )


@register(
    "set_union_distinct",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
    """,
    doc="UNION (distinct) of two key sets (E29)",
    tags=("relational", "setop"),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    b = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return a.unionByName(b).distinct()


@register(
    "set_intersect_except",
    oracle="""
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         big AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
                 WHERE o_totalprice > 200000)
    SELECT c_custkey, 'both' AS tag FROM (SELECT * FROM building INTERSECT SELECT * FROM big)
    UNION ALL
    SELECT c_custkey, 'only_building' AS tag
    FROM (SELECT * FROM building EXCEPT SELECT * FROM big)
    """,
    doc="INTERSECT + EXCEPT tagged union (E29)",
    tags=("relational", "setop"),
)
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    building = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    big = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    both = building.intersect(big).withColumn("tag", F.lit("both"))
    only_b = building.exceptAll(big).withColumn("tag", F.lit("only_building"))
    return both.unionByName(only_b)


# --------------------------------------------------------------------------
# SQL entry point (E47): same engine, SQL text in — registered views share
# names with the DuckDB oracle's.
# --------------------------------------------------------------------------
@register(
    "sql_entry_point",
    oracle="""
    SELECT n_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS total_balance
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    doc="spark.sql() over registered temp views (E47)",
    tags=("relational", "sql"),
)
def sql_entry_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import register_views

    register_views(spark, sf_dir, ("customer", "nation"))
    return spark.sql(
        """
        SELECT n_name, COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS total_balance
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name
        """
    )


@register(
    "agg_collect_set",
    oracle="""
    SELECT c_nationkey,
           STRING_AGG(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
             AS segments,
           COUNT(DISTINCT c_mktsegment) AS n_segments
    FROM customer GROUP BY c_nationkey
    """,
    doc="collect_set canonicalized to a sorted CSV (E24): the distinct "
    "per-group gather; dedup happens map-side in the partial aggregate",
    tags=("relational", "agg"),
)
def agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.concat_ws(
            ",", F.sort_array(F.collect_set("c_mktsegment"))
        ).alias("segments"),
        F.countDistinct("c_mktsegment").alias("n_segments"),
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
           CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'   THEN 1 ELSE 0 END) AS BIGINT) AS high,
           CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'    THEN 1 ELSE 0 END) AS BIGINT) AS low
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="pivot: long->wide reshape with an explicit value list (a pivot "
    "without one needs an extra distinct pass at 100 TB) (E20)",
    tags=("relational", "agg"),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "5-LOW"])
        .count()
        .select(
            "o_orderstatus",
            F.coalesce(F.col("1-URGENT"), F.lit(0)).alias("urgent"),
            F.coalesce(F.col("2-HIGH"), F.lit(0)).alias("high"),
            F.coalesce(F.col("5-LOW"), F.lit(0)).alias("low"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_unpivot",
    oracle="""
    SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value
    FROM customer WHERE c_custkey <= 200
    UNION ALL
    SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value
    FROM customer WHERE c_custkey <= 200
    """,
    doc="unpivot/melt: wide->long reshape — each row explodes to one row "
    "per measure column, a narrow transform (E7,E29)",
    tags=("relational",),
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 200)
    return cust.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "value")


@register(
    "agg_histogram",
    oracle="""
    SELECT CAST(FLOOR(l_extendedprice / 5000.0) AS BIGINT) AS bin,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY 1
    """,
    doc="fixed-width histogram binning of a measure (floor-divide bucket "
    "key; map-side partial agg makes this a near-free full-scan profile "
    "at 100 TB) (E20/E34)",
    tags=("agg",),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.floor(F.col("l_extendedprice") / F.lit(5000.0))
        .cast("bigint")
        .alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_extendedprice").alias("sum_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@register(
    "agg_mode_median",
    oracle="""
    WITH cnts AS (
      SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
      FROM lineitem GROUP BY 1, 2
    ),
    modes AS (
      SELECT l_returnflag, l_quantity AS mode_qty
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag
                        ORDER BY cnt DESC, l_quantity) AS rn FROM cnts) t
      WHERE rn = 1
    ),
    med AS (
      SELECT l_returnflag, MEDIAN(l_quantity) AS median_qty, COUNT(*) AS n
      FROM lineitem GROUP BY 1
    )
    SELECT med.l_returnflag, median_qty, mode_qty, n
    FROM med JOIN modes USING (l_returnflag)
    """,
    doc="median (interpolated) + deterministic mode (ties break to the "
    "smallest value — unlike the built-in MODE, which is tie-unstable "
    "on both engines) per group (E22)",
    tags=("agg",),
)
def agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cnts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = W.partitionBy("l_returnflag").orderBy(F.desc("cnt"), F.col("l_quantity"))
    modes = (
        cnts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"))
    )
    med = li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("median_qty"),
        F.count(F.lit(1)).alias("n"),
    )
    return med.join(modes, "l_returnflag").select(
        "l_returnflag", "median_qty", "mode_qty", "n"
    )


@register(
    "agg_argminmax",
    oracle="""
    SELECT o_orderstatus,
           struct_extract(max({'p': o_totalprice, 'k': o_orderkey}), 'k')
               AS max_price_orderkey,
           struct_extract(min({'p': o_totalprice, 'k': o_orderkey}), 'k')
               AS min_price_orderkey,
           MAX(o_totalprice) AS max_price,
           MIN(o_totalprice) AS min_price
    FROM orders GROUP BY o_orderstatus
    """,
    doc="arg-max/arg-min per group via lexicographic struct MAX/MIN — "
    "unlike bare MAX_BY/ARG_MAX this is tie-deterministic on both "
    "engines (ties break to the larger/smaller key) (E20/E22)",
    tags=("agg",),
)
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pk = F.struct(F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k"))
    return orders.groupBy("o_orderstatus").agg(
        F.max(pk)["k"].alias("max_price_orderkey"),
        F.min(pk)["k"].alias("min_price_orderkey"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


@register(
    "agg_frequent_pairs",
    oracle="""
    WITH base AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2
      FROM base a JOIN base b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT p1, p2, COUNT(*) AS n_baskets
    FROM pairs GROUP BY p1, p2
    ORDER BY n_baskets DESC, p1, p2 LIMIT 25
    """,
    doc="market-basket frequent pairs (E20/E28 composed): parts "
    "co-occurring in an order, counted and top-k'd. distinct-first "
    "bounds the per-basket fan-out to C(items,2); the pair join is an "
    "equi-join on the basket key (shuffle linear in baskets), top-25 is "
    "TakeOrdered. The co-occurrence primitive under recommenders and "
    "association mining",
    tags=("relational", "agg"),
)
def agg_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select("l_orderkey", "l_partkey").distinct()
    a, b = base.alias("a"), base.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
    return (
        pairs.groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .orderBy(F.desc("n_baskets"), "p1", "p2")
        .limit(25)
    )


@register(
    "set_union_evolved",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_note
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    v2 AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus AS o_note
      FROM orders WHERE o_orderkey % 3 = 1
    )
    SELECT COALESCE(o_note, 'none') AS o_note, COUNT(*) AS n
    FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2) u
    GROUP BY 1 ORDER BY 1
    """,
    doc="union across evolved schemas (E29): unionByName with "
    "allowMissingColumns aligns by NAME and null-fills the missing "
    "column — the safe way to append old- and new-vintage extracts "
    "(positional unionAll would silently misalign)",
    tags=("relational", "setop"),
)
def set_union_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.where(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    v2 = orders.where(F.col("o_orderkey") % 3 == 1).select(
        "o_orderkey", "o_totalprice", F.col("o_orderstatus").alias("o_note")
    )
    u = v1.unionByName(v2, allowMissingColumns=True)
    return (
        u.groupBy(F.coalesce("o_note", F.lit("none")).alias("o_note"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_note")
    )


@register(
    "agg_quantile_bins",
    oracle="""
    WITH b AS (
      SELECT quantile_cont(l_extendedprice, 0.25) AS q1,
             quantile_cont(l_extendedprice, 0.50) AS q2,
             quantile_cont(l_extendedprice, 0.75) AS q3
      FROM lineitem
    )
    SELECT CASE WHEN l_extendedprice < q1 THEN 0
                WHEN l_extendedprice < q2 THEN 1
                WHEN l_extendedprice < q3 THEN 2
                ELSE 3 END AS bin,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM lineitem CROSS JOIN b
    GROUP BY bin ORDER BY bin
    """,
    doc="equal-frequency quantile binning (E22/E52): exact quartile "
    "edges from one percentile aggregate, broadcast back onto the scan "
    "as a CASE — the QuantileDiscretizer pattern for feature binning. "
    "At 100 TB swap the exact percentile for approx_percentile; the "
    "assignment side is unchanged",
    tags=("relational", "agg"),
)
def agg_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    edges = li.agg(
        F.expr("percentile(l_extendedprice, 0.25)").alias("q1"),
        F.expr("percentile(l_extendedprice, 0.50)").alias("q2"),
        F.expr("percentile(l_extendedprice, 0.75)").alias("q3"),
    )
    binned = li.crossJoin(F.broadcast(edges)).withColumn(
        "bin",
        F.when(F.col("l_extendedprice") < F.col("q1"), 0)
        .when(F.col("l_extendedprice") < F.col("q2"), 1)
        .when(F.col("l_extendedprice") < F.col("q3"), 2)
        .otherwise(3),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("cents"),
        )
        .orderBy("bin")
    )


@register(
    "join_interval_bucketed",
    oracle="""
    WITH p AS (
      SELECT event_id AS pid, user_id, CAST(ts AS TIMESTAMP) AS pts
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id AS cid, user_id, CAST(ts AS TIMESTAMP) AS cts
      FROM events WHERE event_type = 'click'
    )
    SELECT p.pid, c.cid, p.user_id,
           CAST(floor(epoch(p.pts)) - floor(epoch(c.cts)) AS BIGINT) AS gap_s
    FROM p JOIN c ON p.user_id = c.user_id
    WHERE c.cts BETWEEN p.pts - INTERVAL 5 MINUTE AND p.pts
    """,
    doc="bucketed interval join (E16 at scale): the range predicate "
    "becomes an EQUI-join — purchases explode to the ~2 time buckets "
    "their 5-minute lookback can touch, clicks map to their own bucket, "
    "join on (user, bucket), verify the exact bounds. Shuffle is linear "
    "in rows x buckets-per-row, where a naive theta join degenerates to "
    "a per-key nested loop (or a full cartesian without the key). "
    "Physical no-nested-loop is pinned in test_plan_quality.py",
    tags=("relational", "join", "events"),
)
def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    W_SEC = 300
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts").alias("pts"),
        F.unix_timestamp("ts").alias("p_epoch"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("cts"),
        F.floor(F.unix_timestamp("ts") / W_SEC).alias("bucket"),
    )
    p_buckets = p.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor((F.col("p_epoch") - W_SEC) / W_SEC),
                F.floor(F.col("p_epoch") / W_SEC),
            )
        ),
    )
    joined = p_buckets.join(
        c,
        (F.col("user_id") == F.col("c_user")) & (p_buckets["bucket"] == c["bucket"]),
    ).where(
        (F.col("cts") >= F.col("pts") - F.expr("interval 5 minutes"))
        & (F.col("cts") <= F.col("pts"))
    )
    return joined.select(
        "pid",
        "cid",
        "user_id",
        (F.unix_timestamp("pts") - F.unix_timestamp("cts")).alias("gap_s"),
    )


@register(
    "join_skew_salted",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
               AS sum_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="SALTED equi-join (E13 skew tier 2): the big side spreads each "
    "join key over 16 sub-keys by hashing a high-cardinality "
    "discriminator (l_linenumber), the small side replicates 16x — for "
    "the hot key a single executor cannot hold once AQE's "
    "partition-splitting is not enough (AQE splits partitions, not "
    "keys). The salt is pmod(hash(...)), deterministic, and internal: "
    "the oracle is the PLAIN join — the hash check proves salting is "
    "result-invariant. Equivalence also asserted at the operator level "
    "in tests/test_scale_patterns.py",
    tags=("relational", "join"),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(
        li, orders, on="l_orderkey", discriminator="l_linenumber", n_salts=16
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_extendedprice").alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_key_skew_profile",
    oracle="""
    WITH g AS (
      SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey
    )
    SELECT COUNT(*) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(MAX(cnt) AS BIGINT) AS max_cnt,
           ROUND(QUANTILE_CONT(cnt, 0.99), 6) AS p99_cnt,
           ROUND(CAST(SUM(cnt) AS DOUBLE) / COUNT(*), 6) AS mean_cnt,
           ROUND(MAX(cnt) / (CAST(SUM(cnt) AS DOUBLE) / COUNT(*)), 6)
             AS skew_ratio
    FROM g
    """,
    doc="join/agg key skew diagnostics (EXT, ops tooling): group-size "
    "distribution of a prospective shuffle key — key count, max and "
    "p99 group size, and max/mean skew ratio. THE pre-flight check "
    "before shuffling 100 TB on a key: a skew_ratio in the hundreds "
    "says salt it (join_skew_salted) or let AQE split it. One keyed "
    "partial-agg pass + a tiny single-row summary",
    tags=("relational", "agg"),
)
def agg_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    mean_cnt = F.sum("cnt").cast("double") / F.count(F.lit(1))
    return g.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_cnt"),
        F.round(F.percentile("cnt", F.lit(0.99)), 6).alias("p99_cnt"),
        F.round(mean_cnt, 6).alias("mean_cnt"),
        F.round(F.max("cnt") / mean_cnt, 6).alias("skew_ratio"),
    )


@register(
    "agg_regression_per_group",
    oracle="""
    WITH t AS (
      SELECT o_orderpriority,
             CAST(date_diff('day', DATE '1992-01-01',
                            CAST(o_orderdate AS DATE)) AS DECIMAL(10,0)) AS x,
             CAST(o_totalprice AS DECIMAL(20,4)) AS y
      FROM orders
    ),
    s AS (
      SELECT o_orderpriority,
             COUNT(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sx2
      FROM t GROUP BY o_orderpriority
    )
    SELECT o_orderpriority,
           n,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * sx2 - sx * sx), 9) AS slope,
           ROUND((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * sx2 - sx * sx)) * sx)
                 / CAST(n AS DOUBLE), 9) AS intercept
    FROM s
    ORDER BY o_orderpriority
    """,
    doc="deterministic per-group OLS regression (E22 extension, the "
    "distributed model-fit primitive): totalprice ~ days-since-epoch "
    "per order priority. Built-in regr_slope/regr_agg accumulate "
    "doubles in partition order and are NOT reproducible across "
    "engines or partitionings, so the moments (n, sum x, sum y, "
    "sum xy, sum x2) accumulate as EXACT decimals — one keyed shuffle "
    "with map-side partials, same cost as any grouped agg — and the "
    "closed-form slope/intercept derive in double at the end, "
    "bit-identical on any engine and any partition count. At 100 TB "
    "this is how you fit millions of per-key trend lines in one pass",
    tags=("relational", "agg"),
)
def agg_regression_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderpriority",
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01"))
        .cast("decimal(10,0)")
        .alias("x"),
        F.col("o_totalprice").cast("decimal(20,4)").alias("y"),
    )
    s = t.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sx2"),
    )
    nd = F.col("n").cast("double")
    slope = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nd * F.col("sx2") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "o_orderpriority",
        "n",
        F.round(slope, 9).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / nd, 9).alias("intercept"),
    ).orderBy("o_orderpriority")


@register(
    "agg_mutual_info",
    oracle="""
    WITH c AS (
      SELECT lang, source, COUNT(*) AS c
      FROM documents GROUP BY lang, source
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c),
    ml AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS nl FROM c GROUP BY lang),
    ms AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ns FROM c GROUP BY source),
    terms AS (
      SELECT c.lang, c.source,
             (CAST(c.c AS DOUBLE) / t.n)
               * ln(CAST(c.c AS DOUBLE) * t.n / (CAST(ml.nl AS DOUBLE) * ms.ns))
               AS mi_term,
             ((CAST(c.c AS DOUBLE) - CAST(ml.nl AS DOUBLE) * ms.ns / t.n)
              * (CAST(c.c AS DOUBLE) - CAST(ml.nl AS DOUBLE) * ms.ns / t.n))
               / (CAST(ml.nl AS DOUBLE) * ms.ns / t.n) AS chi_term
      FROM c
      JOIN ml USING (lang)
      JOIN ms USING (source)
      CROSS JOIN tot t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(list_reduce([0.0] || list(mi_term ORDER BY lang, source),
                             (a, x) -> a + x), 6) AS mi_nats,
           ROUND(list_reduce([0.0] || list(chi_term ORDER BY lang, source),
                             (a, x) -> a + x), 6) AS chi2
    FROM terms
    """,
    doc="mutual information + chi-square between two categorical "
    "columns (lang x source), the feature-association primitive of "
    "corpus balancing and drift detection. One keyed count shuffle "
    "(map-side combined) collapses the data to the |langs|x|sources| "
    "pair grid; marginals come from broadcast-sized aggregates of that "
    "grid, and the double contributions fold in a pinned (lang, "
    "source) order so the summation is engine- and "
    "partitioning-independent (the collect is over the tiny grid, "
    "never the data)",
    tags=("relational", "agg"),
)
def agg_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    # persisted: margins, total, and the term join all consume the tiny
    # contingency grid; without this each re-scans the corpus (4 scans)
    c = (
        docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ml = c.groupBy("lang").agg(F.sum("c").cast("long").alias("nl"))
    ms = c.groupBy("source").agg(F.sum("c").cast("long").alias("ns"))
    tot = c.agg(F.sum("c").cast("long").alias("n"))
    cd = F.col("c").cast("double")
    nd = F.col("n").cast("double")
    e = F.col("nl").cast("double") * F.col("ns") / nd
    terms = (
        c.join(F.broadcast(ml), "lang")
        .join(F.broadcast(ms), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            ((cd / nd) * F.log(cd * nd / (F.col("nl").cast("double") * F.col("ns"))))
            .alias("mi_term"),
            (((cd - e) * (cd - e)) / e).alias("chi_term"),
        )
    )
    folded = terms.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("lang", "source", "mi_term"))),
                lambda s: s["mi_term"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("mi_raw"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("lang", "source", "chi_term"))),
                lambda s: s["chi_term"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("chi_raw"),
    )
    return folded.select(
        "n_pairs",
        F.round("mi_raw", 6).alias("mi_nats"),
        F.round("chi_raw", 6).alias("chi2"),
    )


@register(
    "join_lateral_topn",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           o.o_orderkey, o.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) o
    ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey
    """,
    doc="correlated LATERAL join (Spark 4 lateral subquery, E13/E47 "
    "extension): each customer's top-2 orders by value via a "
    "per-row-correlated subquery with ORDER BY + LIMIT — the SQL form "
    "of top-N-per-group. Catalyst decorrelates the lateral into a "
    "ranked join (no per-row re-execution), so the plan scales as one "
    "keyed shuffle + window, identical to the explicit "
    "row_number formulation (`topk_per_group`) — declarative "
    "correlation, relational execution",
    tags=("relational", "join"),
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment,
               o.o_orderkey, o.o_totalprice
        FROM customer c, LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) o
        ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey
        """
    )


@register(
    "agg_table_profile",
    oracle="""
    WITH long AS (
      SELECT 'orderpriority' AS column_name, o_orderpriority AS value FROM orders
      UNION ALL
      SELECT 'orderstatus', o_orderstatus FROM orders
    ),
    counts AS (
      SELECT column_name, value, COUNT(*) AS c
      FROM long GROUP BY column_name, value
    )
    SELECT column_name,
           CAST(SUM(CASE WHEN value IS NOT NULL THEN c ELSE 0 END) AS BIGINT)
             AS n_values,
           CAST(SUM(CASE WHEN value IS NULL THEN c ELSE 0 END) AS BIGINT)
             AS n_nulls,
           CAST(COUNT(value) AS BIGINT) AS n_distinct,
           ROUND(
             ln(SUM(CASE WHEN value IS NOT NULL THEN c ELSE 0 END))
             - list_reduce(
                 [0.0] || list(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
                               ORDER BY value)
                            FILTER (WHERE value IS NOT NULL),
                 (a, b) -> a + b)
               / SUM(CASE WHEN value IS NOT NULL THEN c ELSE 0 END),
             9) AS entropy_nats
    FROM counts GROUP BY column_name ORDER BY column_name
    """,
    doc="single-pass table profiler: unpivot N categorical columns to "
    "(column_name, value) rows, then ONE keyed aggregate computes count/"
    "null-rate/cardinality/Shannon entropy for every column — the "
    "column-count never multiplies the scan count, so profiling a 100 TB "
    "table costs one pass regardless of schema width. Entropy uses the "
    "pinned-order decimal-free fold (sorted collect_list -> left fold) "
    "so the double sum is engine- and partition-invariant (E7/E20/E29)",
    tags=("agg", "profiling"),
)
def agg_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("orderpriority"),
        F.col("o_orderstatus").alias("orderstatus"),
    )
    long = o.unpivot([], ["orderpriority", "orderstatus"], "column_name", "value")
    # NULL value rows stay in the (column_name, value) aggregate so the
    # null tally shares the single scan; collect_list drops the
    # NULL-valued when() below, keeping the entropy fold non-null-only.
    counts = long.groupBy("column_name", "value").agg(
        F.count(F.lit(1)).alias("c")
    )
    n_values = F.sum(
        F.when(F.col("value").isNotNull(), F.col("c")).otherwise(F.lit(0))
    )
    return (
        counts.groupBy("column_name")
        .agg(
            n_values.alias("n_values"),
            F.sum(
                F.when(F.col("value").isNull(), F.col("c")).otherwise(F.lit(0))
            ).alias("n_nulls"),
            F.count("value").alias("n_distinct"),
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("value").isNotNull(),
                                F.struct(F.col("value"), F.col("c")),
                            )
                        )
                    ),
                    lambda s: s["c"].cast("double")
                    * F.log(s["c"].cast("double")),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("sum_clnc"),
        )
        .select(
            "column_name",
            "n_values",
            "n_nulls",
            "n_distinct",
            F.round(
                F.log(F.col("n_values").cast("double"))
                - F.col("sum_clnc") / F.col("n_values"),
                9,
            ).alias("entropy_nats"),
        )
        .orderBy("column_name")
    )


# --------------------------------------------------------------------------
# agg_corr_matrix — full pairwise Pearson correlation matrix of the
# lineitem measures in ONE scan: every pair's five moments (n, Sx, Sy,
# Sxy, Sxx, Syy shared across pairs) accumulate EXACTLY in a single
# hash aggregate (map-side partial agg, one 1-row reduce) — int64
# multiplies on 100x-scaled 2-dp values, sums widened to decimal — and
# the correlations derive in double afterwards (Pearson is invariant
# to the per-column scaling). The same exact-moments trick as
# agg_regression_per_group, widened to a matrix: order-independent,
# bit-identical cross-engine, and the cost at 100 TB is ONE pass
# regardless of how many pairs are asked for. stack() reshapes the
# 1-row wide result into (col_x, col_y, corr) rows JVM-side.
# --------------------------------------------------------------------------
_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_matrix_oracle() -> str:
    # Integer hot path: the measures are 2-dp, so q = ROUND(x*100) is
    # an exact int64 (<= 1.05e7), every cross product is an exact
    # int64 multiply (<= 1.1e14), and only the SUM widens (HUGEINT in
    # DuckDB, decimal(38,0) in Spark — ANSI-safe). Pearson correlation
    # is invariant to the per-column 100x scaling, so the derived
    # values are identical to the unscaled formulation — measured ~2x
    # faster than decimal(18,4) multiplies, whose (37,8) products
    # leave the JVM's compact-long decimal representation.
    sums = ",\n             ".join(
        f"SUM(CAST(ROUND({c} * 100, 0) AS BIGINT)) AS s_{c}" for c in _CORR_COLS
    )
    prods = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i:]:
            prods.append(
                f"SUM(CAST(ROUND({a} * 100, 0) AS BIGINT)"
                f" * CAST(ROUND({b} * 100, 0) AS BIGINT))"
                f" AS s_{a}_{b}"
            )
    prods_sql = ",\n             ".join(prods)
    rows = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            rows.append(
                f"SELECT '{a}' AS col_x, '{b}' AS col_y,\n"
                f"  ROUND((n * CAST(s_{a}_{b} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))\n"
                f"   / SQRT((n * CAST(s_{a}_{a} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))\n"
                f"        * (n * CAST(s_{b}_{b} AS DOUBLE)"
                f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))), 6)"
                f" AS corr_r\n  FROM m"
            )
    union = "\n  UNION ALL\n  ".join(rows)
    return f"""
    WITH m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             {sums},
             {prods_sql}
      FROM lineitem
    )
    SELECT * FROM ({union}) ORDER BY col_x, col_y
    """


@register(
    "agg_corr_matrix",
    oracle=_corr_matrix_oracle(),
    doc="pairwise Pearson correlation matrix of 4 lineitem measures in "
    "ONE scan: shared exact integer moments (2-dp values scale to "
    "int64, sums widen to decimal) in a single hash aggregate, "
    "correlations derived in double, stack() to long form (E22 "
    "deterministic association stats)",
    tags=("agg", "stats"),
)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = {c: F.round(F.col(c) * 100, 0).cast("bigint") for c in _CORR_COLS}
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    aggs += [
        F.sum(q[c].cast("decimal(38,0)")).alias(f"s_{c}") for c in _CORR_COLS
    ]
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i:]:
            aggs.append(
                F.sum((q[a] * q[b]).cast("decimal(38,0)")).alias(f"s_{a}_{b}")
            )
    m = li.agg(*aggs)

    def _corr(a: str, b: str):
        n = F.col("n")
        sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        sab = F.col(f"s_{a}_{b}").cast("double")
        saa = F.col(f"s_{a}_{a}").cast("double")
        sbb = F.col(f"s_{b}_{b}").cast("double")
        return F.round(
            (n * sab - sa * sb)
            / F.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)),
            6,
        )
    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]
    stack_args: list = []
    for a, b in pairs:
        stack_args += [F.lit(a), F.lit(b), _corr(a, b)]
    return (
        m.select(
            F.stack(F.lit(len(pairs)), *stack_args).alias("col_x", "col_y", "corr_r")
        )
        .orderBy("col_x", "col_y")
    )


@register(
    "agg_exact_quantiles_rank",
    oracle="""
    WITH v AS (
      SELECT l_extendedprice AS price, l_orderkey, l_linenumber
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
    r AS (
      SELECT price,
             ROW_NUMBER() OVER (ORDER BY price, l_orderkey, l_linenumber)
               AS i
      FROM v
    ),
    qs AS (SELECT UNNEST([0.25, 0.5, 0.75, 0.9, 0.99]) AS q)
    SELECT qs.q,
           CAST(CEIL(qs.q * n.n) AS BIGINT) AS pos,
           r.price AS value
    FROM qs CROSS JOIN n
    JOIN r ON r.i = CAST(CEIL(qs.q * n.n) AS BIGINT)
    ORDER BY qs.q
    """,
    doc="EXACT quantiles at fact scale via the distributed two-phase "
    "rank (E22/E52 upgrade): Spark's exact F.percentile buffers every "
    "value of the group in ONE aggregation buffer — a memory wall on "
    "a 100 TB fact column (that plan's correctness baseline lives in "
    "agg_percentile; the approx/sketch paths in agg_approx and the "
    "KLL plans). Here the value relation gets exact global row "
    "numbers (operators/stats.py:global_row_numbers — one range "
    "shuffle, per-partition local rank, 32-row offsets join, no "
    "single-task sort), and each requested q becomes one rank lookup "
    "pos = ceil(q*n) resolved by an AQE-broadcast 5-row join against "
    "the ranked relation. Type-1 (discrete) quantiles: the value at a "
    "given rank is unique regardless of tie order, so the unique "
    "(orderkey, linenumber) tiebreak only pins the RANKS, never the "
    "answer. Fully parallel at any scale",
    tags=("lineitem", "agg", "stats"),
)
def agg_exact_quantiles_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import global_row_numbers

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_extendedprice").isNotNull())
        .select(
            F.col("l_extendedprice").alias("price"),
            "l_orderkey",
            "l_linenumber",
        )
    )
    ranked = global_row_numbers(
        li, ["price", "l_orderkey", "l_linenumber"], out_col="i"
    ).select("price", "i")
    # 1-row count from the persisted rank lineage (no source re-scan)
    n_row = ranked.agg(F.max("i").alias("n"))
    qs = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(q) for q in (0.25, 0.5, 0.75, 0.9, 0.99)])
        ).alias("q")
    )
    pos = qs.crossJoin(F.broadcast(n_row)).select(
        "q", F.ceil(F.col("q") * F.col("n")).cast("long").alias("pos")
    )
    return (
        pos.join(ranked, pos["pos"] == ranked["i"])
        .select("q", "pos", F.col("price").alias("value"))
        .orderBy("q")
    )
