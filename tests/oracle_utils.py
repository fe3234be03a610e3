"""Local replica of the driver's t2 correctness check: run a registered
Spark query and its DuckDB oracle SQL side-by-side, compare row count,
column names, and order-insensitive values (columns sorted by name)."""

from __future__ import annotations

import math
import os

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(v):
    import numpy as np

    if isinstance(v, np.ndarray):
        return tuple(_norm(x) for x in v.tolist())
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _norm(v.item())
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def compare(spark, sf_dir: str, name: str, queries: dict, oracles: dict) -> None:
    sdf = queries[name](spark, sf_dir).toPandas()
    con = duckdb_conn(sf_dir)
    odf = con.execute(oracles[name]).fetchdf()

    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: row count spark={len(sdf)} oracle={len(odf)}"

    cols = sorted(sdf.columns)
    srows = sorted(tuple(_norm(v) for v in row) for row in sdf[cols].itertuples(index=False))
    orows = sorted(tuple(_norm(v) for v in row) for row in odf[cols].itertuples(index=False))
    for i, (a, b) in enumerate(zip(srows, orows)):
        assert a == b, f"{name}: first differing row #{i}:\n  spark={a}\n  oracle={b}"
