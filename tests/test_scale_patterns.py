"""Scale-pattern tests: salting equivalence and bucketed shuffle
elimination — the claims README makes about 100 TB behavior, asserted
on the physical plan, not taken on faith.
"""

import pytest
from pyspark.sql import functions as F

from aics_dask_utils_spark.operators.skew import (
    bucketed_join_ready,
    salted_join,
    write_bucketed,
)
from aics_dask_utils_spark.sources import load_table


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_linenumber").alias("s")
    )
    salted = salted_join(
        li, orders, on="l_orderkey", discriminator="l_linenumber", n_salts=8
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("l_linenumber").alias("s"))
    assert plain.collect() == salted.collect()


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, 10), (1, 11), (2, 12)], ["k", "d"])
    small = spark.createDataFrame([(1, "x")], ["k", "v"])
    got = salted_join(big, small, on="k", discriminator="d", n_salts=4, how="left")
    rows = {(r.k, r.d, r.v) for r in got.collect()}
    assert rows == {(1, 10, "x"), (1, 11, "x"), (2, 12, None)}


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    write_bucketed(li, "li_bucketed", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(
        orders, "orders_bucketed", ["o_orderkey"], 8, sort_cols=["o_orderkey"]
    )
    yield "li_bucketed", "orders_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_eliminates_exchange(spark, sf_dir, bucketed_tables):
    li_t, o_t = bucketed_tables
    li = bucketed_join_ready(spark, li_t)
    orders = bucketed_join_ready(spark, o_t)
    joined = li.join(
        orders.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey")
    ).select("l_orderkey", "o_totalprice", "l_quantity")
    plan = _plan_of(joined)
    # co-bucketed scan-side distribution: the sort-merge join must not
    # shuffle either side
    assert "Exchange hashpartitioning" not in plan, plan
    # and the result is still correct
    n_plain = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert joined.count() == n_plain


def test_bucketed_groupby_eliminates_exchange(spark, bucketed_tables):
    li_t, _ = bucketed_tables
    li = bucketed_join_ready(spark, li_t)
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert "Exchange hashpartitioning" not in _plan_of(agg)


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """Runtime bloom-filter join pruning (Spark 3.5+ InjectRuntimeFilter):
    a selective dimension filter materializes a bloom filter that is
    pushed into the fact side BEFORE the join, so at 100 TB the shuffle
    carries only rows that might match. The thresholds exist to keep
    tiny local inputs from qualifying — production defaults
    (creationSideThreshold 10MB, scan-size threshold 10GB) are the
    right ones at scale; here they are narrowed to demonstrate the
    mechanism on sf-scale data."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in optimized.lower(), optimized
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bloom_semi_join_same_name_key(spark, sf_dir):
    """The canonical same-name semi join (probe_key == build_key) must
    resolve unambiguously (r7 ADVICE: the un-aliased build projection
    raised AMBIGUOUS_REFERENCE) and equal the plain left-semi join
    exactly — on both the exact and the prefilter-only paths."""
    from aics_dask_utils_spark.operators.bloom import bloom_semi_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select(F.col("o_orderkey").alias("l_orderkey"))
    got = bloom_semi_join(li, "l_orderkey", orders, "l_orderkey")
    want = li.join(orders, "l_orderkey", "left_semi")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    # exact=False may keep Bloom false positives but never loses a match
    pre = bloom_semi_join(
        li, "l_orderkey", orders, "l_orderkey", exact=False
    )
    assert want.exceptAll(pre).count() == 0


def test_analyze_table_feeds_cbo_row_counts(spark, sf_dir, tmp_path):
    """ANALYZE TABLE COMPUTE STATISTICS gives the cost-based optimizer
    exact row counts (file sizes alone it already has): before ANALYZE
    the optimized plan carries no rowCount, after it carries the exact
    cardinality — the input join-reordering and broadcast decisions key
    on for standing 100 TB dimension tables."""
    import uuid

    name = f"nation_stats_{uuid.uuid4().hex[:8]}"
    loc = str(tmp_path / name)
    load_table(spark, sf_dir, "nation").write.parquet(loc)
    spark.sql(
        f"CREATE TABLE {name} (n_nationkey INT, n_name STRING, n_regionkey INT)"
        f" USING parquet LOCATION '{loc}'"
    )
    saved = spark.conf.get("spark.sql.cbo.enabled", None)
    try:
        spark.conf.set("spark.sql.cbo.enabled", "true")

        def row_count():
            stats = (
                spark.table(name)
                ._jdf.queryExecution()
                .optimizedPlan()
                .stats()
            )
            rc = stats.rowCount()
            return rc.get() if rc.isDefined() else None

        assert row_count() is None
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
        n = spark.table(name).count()
        assert int(str(row_count())) == n
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.cbo.enabled")
        else:
            spark.conf.set("spark.sql.cbo.enabled", saved)
        spark.sql(f"DROP TABLE IF EXISTS {name}")
