"""Extra OLAP shapes (pgdedupe_spark/olap.py) — DuckDB parity through the
driver's own canonicalization, at two scale factors, plus nonemptiness so
a predicate drifting out of the data domain can't green-wash a test."""

from __future__ import annotations

import pytest

from pgdedupe_spark import olap
from tests.oracle_utils import compare

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("name", sorted(olap.QUERIES))
@pytest.mark.parametrize("sf_dir", SFS)
def test_olap_extra_parity(spark, name, sf_dir):
    compare(spark, sf_dir, name, olap.QUERIES, olap.ORACLES)
    assert olap.QUERIES[name](spark, sf_dir).count() > 0


def test_q4_semi_join_and_q16_anti_join_plans(spark):
    """The EXISTS/NOT IN shapes must plan as dedicated semi/anti joins,
    never deduplicating inner joins or nested loops over the fact side."""
    sf = SFS[0]
    q4 = olap.QUERIES["q4_order_priority"](spark, sf)
    p4 = q4._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in p4
    q16 = olap.QUERIES["q16_supplier_variety"](spark, sf)
    p16 = q16._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in p16
    assert "CartesianProduct" not in p4 and "CartesianProduct" not in p16
