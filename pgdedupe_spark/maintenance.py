"""Table-maintenance CLI: the operational surface a long-lived deployment
runs on a schedule (the analog of Postgres ANALYZE / VACUUM in the
reference's world, re-expressed for parquet tables).

Usage::

    python -m pgdedupe_spark.maintenance stats   <table.parquet> [cols...]
    python -m pgdedupe_spark.maintenance compact <in.parquet> <out.parquet>
        [--target-mb N] [--sort-by col[,col...] | --zorder-by col[,col...]]
    python -m pgdedupe_spark.maintenance files   <table.parquet>
    python -m pgdedupe_spark.maintenance validate <table.parquet> <rules.json>

`stats` prints per-column (rows, nulls, exact ndv) from ONE aggregation
pass (operators/stats.analyze_table); `compact` rewrites shattered
tables into size-targeted — optionally range- or Z-order-clustered —
files (sources/io.compact_table); `files` prints the raw
file-count/bytes health check; `validate` runs declarative expectation
rules (operators/quality.validate_table — foreign_key rules reference
another parquet table via "ref_path") and exits 1 if any rule fails.
All are thin shells over the library operators the tests pin, so the
CLI adds surface, not logic.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pgdedupe_spark.maintenance")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("stats", help="per-column rows/nulls/ndv (one pass)")
    ps.add_argument("path")
    ps.add_argument("cols", nargs="*", help="columns (default: all)")

    pc = sub.add_parser("compact", help="rewrite into size-targeted files")
    pc.add_argument("path")
    pc.add_argument("out")
    pc.add_argument("--target-mb", type=int, default=128)
    pc.add_argument("--sort-by", help="comma-separated sort/cluster columns")
    pc.add_argument(
        "--zorder-by",
        help="comma-separated numeric columns for Morton-code (Z-order) "
        "clustering — per-file min/max pruning in every listed dimension",
    )

    pf = sub.add_parser("files", help="file count + bytes health check")
    pf.add_argument("path")

    pv = sub.add_parser("validate", help="run expectation rules; exit 1 on failure")
    pv.add_argument("path")
    pv.add_argument("rules", help="JSON file: list of rule dicts")

    args = p.parse_args(argv)

    from pgdedupe_spark.session import get_spark
    from pgdedupe_spark.sources.io import compact_table, table_file_stats

    spark = get_spark("pgdedupe_spark_maintenance")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "files":
        n, total = table_file_stats(spark, args.path)
        print(f"{n} data files, {total} bytes ({total / max(n, 1) / 1e6:.1f} MB avg)")
        return 0

    if args.cmd == "stats":
        from pgdedupe_spark.operators.stats import analyze_table

        df = spark.read.parquet(args.path)
        cols = args.cols or df.columns
        for r in analyze_table(df, cols).collect():
            print(f"{r.column:>24}  rows={r.n_rows}  nulls={r.n_nulls}  ndv={r.n_distinct}")
        return 0

    if args.cmd == "compact":
        sort_by = args.sort_by.split(",") if args.sort_by else None
        zorder_by = args.zorder_by.split(",") if args.zorder_by else None
        n0, b0 = table_file_stats(spark, args.path)
        out = compact_table(
            spark, args.path, args.out,
            target_file_bytes=args.target_mb * 1024 * 1024,
            sort_by=sort_by,
            zorder_by=zorder_by,
        )
        n1, b1 = table_file_stats(spark, args.out)
        print(f"{n0} files ({b0} B) -> {n1} files ({b1} B), {out.count()} rows")
        return 0

    if args.cmd == "validate":
        import json

        from pgdedupe_spark.operators.quality import validate_table

        with open(args.rules) as fh:
            rules = json.load(fh)
        for r in rules:
            if r.get("rule") == "foreign_key":
                r["ref"] = spark.read.parquet(r.pop("ref_path"))
        report = validate_table(spark.read.parquet(args.path), rules).collect()
        failed = 0
        for r in report:
            mark = "ok  " if r.passed else "FAIL"
            failed += 0 if r.passed else 1
            print(f"{mark}  {r.rule:>12}({r.column})  violations={r.violations}")
        return 1 if failed else 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
