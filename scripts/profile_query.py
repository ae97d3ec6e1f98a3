"""Per-query optimization probe (guide §1): capture .explain("formatted")
and/or time the computation against the noop sink in one fresh session.

Usage:
  python scripts/profile_query.py explain OUT_DIR name [name ...]
      -> writes OUT_DIR/<name>.txt with the formatted physical plan
  python scripts/profile_query.py time name [name ...]
      -> per name: warm-up noop write, then best-of-2 timed noop writes
         (labels the jobs so the UI/event log is readable)

Timing uses df.write.format("noop") per guide §1.4 so every column of
every row is computed and nothing is driver-collected; explain capture
never executes the plan.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aics_dask_utils_spark.plans import all_plans  # noqa: E402
from aics_dask_utils_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    mode = sys.argv[1]
    if mode == "explain":
        out_dir, names = sys.argv[2], sys.argv[3:]
        os.makedirs(out_dir, exist_ok=True)
    else:
        out_dir, names = "", sys.argv[2:]
    plans = all_plans()
    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="aics_dask_utils_spark-profile",
        shuffle_partitions=CPUS,
    )
    for name in names:
        df = plans[name].fn(spark, SF_DIR)
        if mode == "explain":
            plan_txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(out_dir, f"{name}.txt")
            with open(path, "w") as f:
                f.write(plan_txt)
            print(f"wrote {path} ({len(plan_txt)} chars)")
        else:
            spark.sparkContext.setJobDescription(f"profile:{name}:warmup")
            _noop(df)
            spark.sparkContext._jvm.System.gc()
            best = float("inf")
            for i in range(2):
                spark.sparkContext.setJobDescription(f"profile:{name}:timed{i}")
                t0 = time.perf_counter()
                _noop(plans[name].fn(spark, SF_DIR))
                best = min(best, time.perf_counter() - t0)
            print(f"{name}\t{best:.3f}s (noop, best-of-2)")
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
