"""Run any registry query — or ad-hoc SQL — from the command line.

Usage::

    python -m pgdedupe_spark.query <name> [--sf-dir DIR] [--limit N]
        [--explain] [--list]
    python -m pgdedupe_spark.query --sql "SELECT ..." [--sf-dir DIR]

`--list` prints every registered query (with ✓ for oracle-checked);
`--explain` prints the formatted physical plan instead of rows; `--sql`
registers every sf table as a temp view and runs the given statement —
the ad-hoc SQL front-end (SURVEY §2.1 S5): the same Catalyst plans as
the DataFrame API, so pushdown/pruning/AQE apply identically.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import DataFrame, SparkSession


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every sf parquet table as a temp view (events additionally
    normalized to an exact `ts_us` BIGINT column, matching the registry's
    time convention) and return the view names."""
    from pgdedupe_spark import registry
    from pgdedupe_spark.session import load_tables

    out = []
    for name, df in load_tables(spark, sf_dir).items():
        if name == "events":
            df = registry._events(spark, sf_dir)
        df.createOrReplaceTempView(name)
        out.append(name)
    return out


def run_sql(spark: SparkSession, sf_dir: str, statement: str) -> DataFrame:
    """S5 SQL→DataFrame bridge: views over the sf tables + one
    ``spark.sql`` call. The result is a plain DataFrame — compose it with
    any operator in the package."""
    register_tables(spark, sf_dir)
    return spark.sql(statement)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pgdedupe_spark.query")
    p.add_argument("name", nargs="?", help="registry query name")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="parquet table dir")
    p.add_argument("--limit", type=int, default=20, help="rows to show")
    p.add_argument("--explain", action="store_true", help="print the physical plan")
    p.add_argument("--list", action="store_true", help="list registered queries")
    p.add_argument("--sql", help="ad-hoc SQL over the sf tables (temp views)")
    args = p.parse_args(argv)

    from pgdedupe_spark import registry

    if args.sql:
        from pgdedupe_spark.session import get_spark

        spark = get_spark("pgdedupe_spark_sql")
        spark.sparkContext.setLogLevel("ERROR")
        df = run_sql(spark, args.sf_dir, args.sql)
        if args.explain:
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=40)
        return 0

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
