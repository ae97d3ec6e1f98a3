"""Registry-wide duplicate-scan audit (build/analyze only, no execution).

For every registered plan, count how many parquet-scan sections of the
SAME source file appear in the formatted physical plan. More than one
scan of the same file is the duplicate-lineage smell: a shared
intermediate consumed by 2+ downstream branches without persistence,
so every consumer re-derives it from a fresh source scan — the exact
cost class that turns into repeated 100 TB fact-table reads.

Not every multi-scan is a bug: TPC-H self-joins at different
granularity, the sketch plans' deliberate exact-vs-estimate
certification passes, and two-branch splits (cap_per_key,
decontaminate train/eval) legitimately read a source twice. Use this
as a review worklist, not a gate — the round-7 sweep fixed the
pathological cases (triangle counts 12 -> 2, LM scorers 4 -> 1,
grid statistics 4 -> 1).

Usage: python scripts/audit_duplicate_scans.py [sf_dir]
"""
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aics_dask_utils_spark.session import get_spark
from aics_dask_utils_spark.plans import all_plans


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    flagged = 0
    for name, spec in sorted(all_plans().items()):
        try:
            df = spec.fn(spark, sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            scans = re.findall(
                r"\(\d+\) Scan parquet[\s\S]{0,400}?Location.*?\[file:(\S+?)\]",
                plan,
            )
            dup = {
                f.rsplit("/", 1)[-1]: c
                for f, c in Counter(scans).items()
                if c > 1
            }
            if dup:
                flagged += 1
                print(f"{name}: {dup}", flush=True)
        except Exception as ex:  # build errors are themselves findings
            flagged += 1
            print(f"{name}: ERROR {str(ex)[:120]}", flush=True)
        spark.catalog.clearCache()
    print(f"flagged: {flagged}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
