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


def test_q21_exists_pair_plans_as_semi_plus_anti(spark):
    """The EXISTS/NOT-EXISTS pair must plan as one LeftSemi and one
    LeftAnti join — if either decorrelation regresses to a nested loop
    or an inner-join+distinct the probe re-scans per outer row."""
    sf = SFS[0]
    p = (
        olap.QUERIES["q21_waiting_supplier"](spark, sf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in p and "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_q8_snowflake_broadcasts_every_dim(spark):
    """Q8's seven joins: all five dim sides (part, supplier,two nation
    roles, region) must broadcast — any dim that falls to sort-merge
    shuffles the fact table once more per join at 100 TB."""
    sf = SFS[0]
    p = (
        olap.QUERIES["q8_market_share"](spark, sf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert p.count("BroadcastHashJoin") >= 5
    assert "CartesianProduct" not in p


@pytest.mark.parametrize("name", sorted(olap.QUERIES))
def test_olap_query_is_deterministic(spark, name):
    """Same D13 contract the registry carries (test_determinism_registry):
    two runs in one session, identical row multisets."""
    from collections import Counter

    from tests.oracle_utils import _norm

    def rows():
        df = olap.QUERIES[name](spark, SFS[0])
        return Counter(tuple(_norm(v) for v in row) for row in df.collect())

    assert rows() == rows(), f"{name}: nondeterministic"


def test_full_tpch_pattern_sweep_is_complete():
    """Every classic q1–q22 plan pattern has a named analog between the
    driver registry and olap.py — the breadth claim in the module
    docstring, pinned so a refactor can't silently drop one."""
    from pgdedupe_spark import registry

    names = set(registry.QUERIES) | set(olap.QUERIES)
    analogs = {
        1: "q1_pricing_summary", 2: "q2_min_balance_supplier",
        3: "q3_shipping_priority", 4: "q4_order_priority",
        5: "q5_regional_revenue", 6: "q6_forecast_revenue",
        7: "q7_nation_flow", 8: "q8_market_share",
        9: "q9_product_profit", 10: "q10_returned_items",
        11: "q11_heavy_parts", 12: "q12_shipmode_priority",
        13: "q13_customer_distribution", 14: "q14_promo_share",
        15: "q15_top_supplier", 16: "q16_supplier_variety",
        17: "q17_small_qty_revenue", 18: "q18_large_orders",
        19: "q19_disjunctive_revenue", 20: "q20_part_promotion",
        21: "q21_waiting_supplier", 22: "q22_idle_customers",
    }
    missing = {q: n for q, n in analogs.items() if n not in names}
    assert not missing, missing
