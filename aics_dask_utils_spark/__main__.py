"""CLI: list, explain, run, and verify the registered plans.

    python -m aics_dask_utils_spark list [--tag dedup]
    python -m aics_dask_utils_spark run <plan> [--sf-dir DIR] [--limit N]
    python -m aics_dask_utils_spark explain <plan> [--sf-dir DIR]
    python -m aics_dask_utils_spark verify <plan> [--sf-dir DIR]

``verify`` runs the plan AND its DuckDB oracle on the same parquet
and hash-compares the results (dtype-strict) — the same gate the test
suite and the grading driver apply.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="aics_dask_utils_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ls = sub.add_parser("list", help="list registered plans")
    ls.add_argument("--tag", default=None, help="filter by tag")

    for name in ("run", "explain", "verify"):
        sp = sub.add_parser(name)
        sp.add_argument("plan")
        sp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if name == "run":
            sp.add_argument("--limit", type=int, default=20)

    args = p.parse_args(argv)

    from .plans import all_plans

    plans = all_plans()
    if args.cmd == "list":
        for name, spec in sorted(plans.items()):
            if args.tag and args.tag not in spec.tags:
                continue
            oracle = "oracle" if spec.oracle else "rows-only"
            print(f"{name:32s} [{oracle}] {spec.doc.splitlines()[0][:80]}")
        return 0

    if args.plan not in plans:
        print(f"unknown plan: {args.plan}", file=sys.stderr)
        return 2

    from .session import get_spark

    spark = get_spark()
    try:
        if args.cmd == "verify":
            from .testing import run_plan_vs_oracle

            try:
                run_plan_vs_oracle(spark, args.plan, args.sf_dir)
            except Exception as ex:
                print(f"FAIL {args.plan}: {ex}", file=sys.stderr)
                return 1
            if plans[args.plan].oracle is None:
                # no SQL oracle registered: only the rows-only check ran
                print(f"PASS {args.plan} (rows-only check at {args.sf_dir})")
            else:
                print(f"PASS {args.plan} (oracle hash-match at {args.sf_dir})")
            return 0
        df = plans[args.plan].fn(spark, args.sf_dir)
        if args.cmd == "explain":
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=False)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
