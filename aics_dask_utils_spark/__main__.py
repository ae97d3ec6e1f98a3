"""CLI: list, explain, and run the registered plans.

    python -m aics_dask_utils_spark list [--tag dedup]
    python -m aics_dask_utils_spark run <plan> [--sf-dir DIR] [--limit N]
    python -m aics_dask_utils_spark explain <plan> [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="aics_dask_utils_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ls = sub.add_parser("list", help="list registered plans")
    ls.add_argument("--tag", default=None, help="filter by tag")

    for name in ("run", "explain"):
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
