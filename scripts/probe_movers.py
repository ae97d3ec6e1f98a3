"""Idle fresh-JVM min-of-2 probe for bench movers (r6 verdict task 4).

Runs each named query in its OWN JVM (fresh `spark-submit`-equivalent
session per query, like bench.py's isolated mode but one query per
process) on an otherwise idle machine, at the bench SF, and prints a
JSON line per query: warm-up + two timed runs, min reported.

Usage: python scripts/probe_movers.py [name ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

DEFAULT = ["agg_table_profile", "agg_regression_per_group", "ann_topk_pandas"]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from aics_dask_utils_spark.session import get_spark
from aics_dask_utils_spark.plans import all_plans
name = {name!r}
spark = get_spark(master="local[{cpus}]", app_name="probe-" + name,
                  shuffle_partitions=int({cpus!r}))
plans = all_plans()
plans["q6_forecast_revenue"].fn(spark, {sf!r}).count()  # JVM warm-up
spark.catalog.clearCache()
plans[name].fn(spark, {sf!r}).count()  # query warm-up
spark.sparkContext._jvm.System.gc()
ts = []
for _ in range(2):
    t0 = time.perf_counter()
    plans[name].fn(spark, {sf!r}).count()
    ts.append(round(time.perf_counter() - t0, 4))
    spark.catalog.clearCache()
print(json.dumps({{"name": name, "runs": ts, "min": min(ts)}}))
spark.stop()
"""


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = sys.argv[1:] or DEFAULT
    for name in names:
        code = _CHILD.format(repo=repo, name=name, cpus=CPUS, sf=SF_DIR)
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            check=False,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        print(line[-1] if line else json.dumps({"name": name, "error": out.stderr[-300:]}))


if __name__ == "__main__":
    main()
