"""Run any registry query from the command line.

Usage::

    python -m pgdedupe_spark.query <name> [--sf-dir DIR] [--limit N]
        [--explain] [--list]

`--list` prints every registered query (with ✓ for oracle-checked);
`--explain` prints the formatted physical plan instead of rows.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pgdedupe_spark.query")
    p.add_argument("name", nargs="?", help="registry query name")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="parquet table dir")
    p.add_argument("--limit", type=int, default=20, help="rows to show")
    p.add_argument("--explain", action="store_true", help="print the physical plan")
    p.add_argument("--list", action="store_true", help="list registered queries")
    args = p.parse_args(argv)

    from pgdedupe_spark import registry

    if args.list or not args.name:
        for name in sorted(registry.QUERIES):
            mark = "✓" if name in registry.ORACLES else " "
            print(f"  {mark} {name}")
        return 0
    if args.name not in registry.QUERIES:
        print(f"unknown query: {args.name}", file=sys.stderr)
        return 2

    from pgdedupe_spark.session import get_spark

    spark = get_spark("pgdedupe_spark_query")
    spark.sparkContext.setLogLevel("ERROR")
    df = registry.QUERIES[args.name](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=40)
        print(f"({df.count()} rows total)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
