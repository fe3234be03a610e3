"""Driver-replica correctness gate: every registered query with an oracle is
compared against DuckDB at sf0.001 (fast; the driver itself uses sf0.01 —
run with SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full check)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_utils import compare

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema) > 0


def test_all_queries_have_callables():
    assert QUERIES, "no queries registered"
    for name, fn in QUERIES.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, sf_dir, name):
    compare(spark, sf_dir, name, QUERIES, ORACLES)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_driver_canonicalizable_schema(spark, sf_dir, name):
    """The driver's canonicalizer pandas-sorts every output column; array/
    map/struct columns crash it (CORRECTNESS_r01: a1/j2/a11 TypeError:
    unhashable type 'list'). Pin that every registered query emits only
    atomic column types — arrays must be stringified at the query boundary."""
    from pyspark.sql import types as T

    schema = QUERIES[name](spark, sf_dir).schema
    for field in schema:
        assert not isinstance(
            field.dataType, (T.ArrayType, T.MapType, T.StructType)
        ), f"{name}.{field.name} is {field.dataType.simpleString()}"
