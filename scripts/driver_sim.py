"""Strict simulation of the driver's t2 correctness harness.

Unlike tests/oracle_utils.py (which normalizes list values), this mimics the
driver's pandas canonicalizer exactly: sort columns by name, then
``sort_values`` over ALL columns — which raises ``TypeError: unhashable
type`` if any cell is a list/ndarray. Round-1 lost 3 queries to that; this
script is the gate that proves round-2 outputs are driver-canonicalizable.

Run:  python scripts/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import math
import sys
import time

import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    df = df[cols]
    if len(df):
        df = df.sort_values(by=cols, kind="mergesort")
    return df.reset_index(drop=True)


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if hasattr(v, "item"):
        return _norm(v.item())
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _value_rows(df: pd.DataFrame):
    return [tuple(_norm(v) for v in row) for row in df.itertuples(index=False)]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from tests.oracle_utils import duckdb_conn

    from pgdedupe_spark.session import get_spark

    spark = get_spark()
    queries = entry.queries()
    oracles = entry.oracle_sql()
    con = duckdb_conn(sf_dir)

    results = {}
    n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        row = {"secs": None, "rows": None, "status": "ok"}
        try:
            sdf = _canon(fn(spark, sf_dir).toPandas())
            row["rows"] = len(sdf)
            if name in oracles:
                odf = _canon(con.execute(oracles[name]).fetchdf())
                assert sorted(sdf.columns) == sorted(odf.columns), (
                    f"schema: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
                )
                assert len(sdf) == len(odf), f"rows: spark={len(sdf)} oracle={len(odf)}"
                srows, orows = _value_rows(sdf), _value_rows(odf)
                for i, (a, b) in enumerate(zip(srows, orows)):
                    assert a == b, f"row #{i}: spark={a} oracle={b}"
            else:
                row["status"] = "rows_only"
        except Exception as e:  # noqa: BLE001
            row["status"] = f"FAIL: {type(e).__name__}: {str(e)[:300]}"
            n_fail += 1
        row["secs"] = round(time.time() - t0, 2)
        results[name] = row
        print(f"{row['status']:<10.10} {row['secs']:>7.2f}s {row['rows'] if row['rows'] is not None else '-':>7} {name}", flush=True)

    print(json.dumps({"total": len(results), "fail": n_fail}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
