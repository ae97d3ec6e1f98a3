"""Observation API: data-quality counters piggybacking on a production
pass — row counts and violation tallies come back to the driver from
the SAME job that does the work, no second scan (the instrumentation
every 100 TB pipeline stage needs)."""

from pyspark.sql import Observation
from pyspark.sql import functions as F

from aics_dask_utils_spark.sources import load_table


def test_observe_collects_metrics_in_one_pass(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("scan_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum((F.col("l_quantity") <= 0).cast("long")).alias("nonpositive_qty"),
        F.sum(F.col("l_shipdate").isNull().cast("long")).alias("null_shipdate"),
    )
    kept = observed.where(F.col("l_quantity") >= 30).count()
    metrics = obs.get
    assert metrics["rows_seen"] == li.count()
    assert kept < metrics["rows_seen"]
    assert metrics["nonpositive_qty"] == 0
    assert metrics["null_shipdate"] == 0
