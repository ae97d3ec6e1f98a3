"""HLL DataSketches: mergeability and estimate accuracy (E21 scale path)."""

from pyspark.sql import functions as F

from aics_dask_utils_spark.sources import load_table


def test_hll_union_estimate_close_to_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select(F.countDistinct("l_partkey").alias("d")).first()["d"]
    est = (
        li.groupBy("l_returnflag")
        .agg(F.hll_sketch_agg("l_partkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()["est"]
    )
    assert abs(est - exact) / exact < 0.05


def test_hll_sketch_merge_equals_single_pass(spark, sf_dir):
    """Splitting the scan and unioning sketches must estimate the same
    cardinality as one sketch over everything (mergeability)."""
    li = load_table(spark, sf_dir, "lineitem")
    one = li.agg(F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey"))).first()[0]
    split = (
        li.withColumn("half", F.col("l_orderkey") % 2)
        .groupBy("half")
        .agg(F.hll_sketch_agg("l_partkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")))
        .first()[0]
    )
    assert one == split


def test_cms_heavy_hitters_guards_key_cardinality(spark, tmp_path):
    """agg_cms_heavy_hitters collects the keyed-count relation and
    probes the CMS driver-side — sound only for small key domains. On
    a table whose key has >1000 distinct values it must refuse loudly
    instead of hauling the whole relation onto the driver."""
    import pytest as _pytest

    from aics_dask_utils_spark.plans import all_plans

    spark.range(5000).selectExpr(
        "concat('Brand#', id % 2000) AS p_brand"
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    plan = all_plans()["agg_cms_heavy_hitters"].fn
    with _pytest.raises(ValueError, match="small key domains"):
        plan(spark, str(tmp_path))
