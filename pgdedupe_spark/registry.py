"""Query/oracle registry — the driver-facing inventory of implemented
operators (SURVEY.md §2), each phrased against the driver's parquet tables
(TESTDATA.md) with a DuckDB-checkable ANSI-SQL oracle where expressible.

Conventions (driver contract):
* every computed column aliased identically in Spark and SQL;
* doubles that pass through aggregation are rounded via exact decimal
  arithmetic in BOTH engines so partial-aggregation order can't flip a hash;
* deterministic total orders wherever ids/ranks are assigned.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# A1 + P2 + W1 — the pipeline's stage-1 exact-duplicate collapse
# (pgdedupe/run.py:62-99) phrased on `documents`. Flagship / entry().
# ---------------------------------------------------------------------------


@query(
    "a1_exact_collapse",
    oracle="""
    WITH g AS (
      SELECT text, lang, source, n_chars,
             array_agg(doc_id ORDER BY doc_id) AS src_ids
      FROM documents
      WHERE n_chars > 0
      GROUP BY text, lang, source, n_chars
    )
    SELECT text, lang, source, n_chars, src_ids,
           row_number() OVER (
             ORDER BY text NULLS FIRST, lang NULLS FIRST,
                      source NULLS FIRST, n_chars NULLS FIRST
           ) AS _unique_id
    FROM g
    """,
)
def a1_exact_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pgdedupe_spark.operators.collapse import collapse_exact_duplicates

    docs = _t(spark, sf_dir, "documents")
    return collapse_exact_duplicates(
        docs,
        field_cols=["text", "lang", "source", "n_chars"],
        key_col="doc_id",
        filter_condition="n_chars > 0",
    )
