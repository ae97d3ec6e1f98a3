"""Driver correctness-gate simulation: run the FIRST 50 registry slots
(the window the grading driver checks) against their DuckDB oracles at
sf0.01 — the same plans, order, and comparison the driver applies.

Usage: python scripts/gate_sim.py [sf_dir] [log_path] [tag]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aics_dask_utils_spark.session import get_spark
from aics_dask_utils_spark.testing import run_plan_vs_oracle, duckdb_connection
from aics_dask_utils_spark.plans import all_plans


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    log = sys.argv[2] if len(sys.argv) > 2 else "docs/gatesim.log"
    tag = sys.argv[3] if len(sys.argv) > 3 else "round-10 re-cut"
    spark = get_spark(master="local[16]", shuffle_partitions=16)
    con = duckdb_connection(sf)
    t0 = time.time()
    fails = 0
    lines = []
    window = list(all_plans())[:50]
    for n in window:
        try:
            run_plan_vs_oracle(spark, n, sf, con=con)
            lines.append(f"PASS {n}")
        except Exception as ex:
            fails += 1
            lines.append(f"FAIL {n} {str(ex)[:200]}")
        spark.catalog.clearCache()
    lines.append(
        f"gate simulation (first {len(window)} window slots, "
        f"{sf.rstrip('/').split('/')[-1]}, {tag}): "
        f"{len(window) - fails}/{len(window)} green, {int(time.time() - t0)}s"
    )
    with open(log, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    print(lines[-1], flush=True)
    con.close()
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
