"""Driver-replica correctness gate: every registered query with an oracle is
compared against DuckDB at sf0.001 (fast; the driver itself uses sf0.01 —
run with SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full check)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_utils import compare

from pgdedupe_spark import registry as _registry

# Registry-wide, not just the driver ordering: rows demoted to
# registry.PYTEST_ONLY (out of the driver's 100-query rotation,
# VERDICT r5 #3) keep full DuckDB-parity coverage here.
QUERIES = dict(entrymod.queries())
ORACLES = dict(entrymod.oracle_sql())
for _n in sorted(_registry.PYTEST_ONLY):
    QUERIES[_n] = _registry.QUERIES[_n]
    if _n in _registry.ORACLES:
        ORACLES[_n] = _registry.ORACLES[_n]


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
