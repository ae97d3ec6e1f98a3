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
