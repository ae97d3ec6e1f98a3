"""Full-registry oracle sweep: run every registered plan against its
DuckDB oracle at the given SF dir and write a per-plan PASS/FAIL log.

Usage: python scripts/sweep_registry.py <sf_dir> <log_path> [tag]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aics_dask_utils_spark.session import get_spark
from aics_dask_utils_spark.testing import run_plan_vs_oracle, duckdb_connection
from aics_dask_utils_spark.plans import all_plans


def main() -> int:
    sf, log = sys.argv[1], sys.argv[2]
    tag = sys.argv[3] if len(sys.argv) > 3 else "round 5"
    spark = get_spark(master="local[16]", shuffle_partitions=16)
    con = duckdb_connection(sf)
    t0 = time.time()
    fails = 0
    lines = []
    for n in sorted(all_plans()):
        try:
            run_plan_vs_oracle(spark, n, sf, con=con)
            lines.append(f"PASS {n}")
        except Exception as ex:
            fails += 1
            lines.append(f"FAIL {n} {str(ex)[:200]}")
        spark.catalog.clearCache()
    total = len(lines)
    lines.append(
        f"full-registry ANSI-on sweep {sf.rstrip('/').split('/')[-1]} ({tag}): "
        f"{total - fails}/{total} green, {fails} fail, {int(time.time() - t0)}s"
    )
    # write the complete log in one shot so a killed run can never
    # leave a truncated log that looks authoritative (r4 lesson)
    with open(log, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    print(lines[-1], flush=True)
    con.close()
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
