"""Bucketed co-located joins: same key, same bucket count → join with NO
Exchange on either side (the write-once / join-shuffle-free layout that
replaces the reference's persistent b-tree indexes at 100 TB)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pgdedupe_spark.plans import explain_str
from pgdedupe_spark.sources.io import write_bucketed

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    o = write_bucketed(
        orders, "b_orders", str(tmp_path / "b_orders"), ["o_orderkey"], 8,
        sort_cols=["o_orderkey"],
    )
    li = write_bucketed(
        lineitem, "b_lineitem", str(tmp_path / "b_lineitem"), ["l_orderkey"], 8,
        sort_cols=["l_orderkey"],
    )
    yield o, li
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    o, li = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
        plan = explain_str(joined, "simple")
        join_section = plan.split("HashAggregate")[-1]  # below the final agg
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_section, join_section
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    o, li = bucketed_pair
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    got = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
