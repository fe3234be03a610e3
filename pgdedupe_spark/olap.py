"""Extra TPC-H-class OLAP shapes, DuckDB-parity-checked in pytest.

The driver's 50-row correctness window alternates over exactly 100
registered queries (__spark_entry__.py), so these breadth shapes live
outside the registry and are verified the same way locally instead:
tests/test_olap_extra.py runs each Spark plan and its oracle SQL
side-by-side through tests/oracle_utils.compare (same canonicalization
the driver uses) at two scale factors.

Shapes covered (the classic plan patterns q1/q3/q5/q10/q13/q17/q18 in
the registry don't already exercise):

* q4-like   — EXISTS correlated semi join with a non-equi residual
* q7-like   — two-role dimension (nation twice) with an inequality theta
* q16-like  — NOT IN anti join feeding a grouped COUNT(DISTINCT)
* q19-like  — disjunction of conjunctions across both join sides
* q22-like  — decorrelated scalar-aggregate threshold + NOT EXISTS,
              cross-multiplied (bal·cnt > sum) so the compare is exact
              decimal on both engines (same trick as q17)

All money math follows the repo's decimal discipline: multiply/aggregate
in DECIMAL(18,2), cast the final aggregate to DOUBLE.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str):
    def deco(fn):
        QUERIES[name] = fn
        ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


_dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
_REV = "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"


@_q(
    "q4_order_priority",
    f"""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """EXISTS with a correlated non-equi residual → LEFT SEMI join whose
    condition carries both the key equality and the date comparison; the
    probe (orders) streams, lineitem never duplicates order rows."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@_q(
    "q7_nation_flow",
    f"""
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation, {_REV} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE n1.n_nationkey <> n2.n_nationkey
    GROUP BY n1.n_name, n2.n_name
    """,
)
def q7_nation_flow(spark, sf_dir):
    """Cross-nation revenue flow: the nation dim joins TWICE under
    different roles (broadcast both), with the `<>` inequality as a
    post-join filter on broadcast keys — never a nested loop."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("_ck"), F.col("n_name").alias("cust_nation"))
    n2 = n.select(F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation"))
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n1, F.col("c_nationkey") == F.col("_ck"))
        .join(n2, F.col("s_nationkey") == F.col("_sk"))
        .filter(F.col("_ck") != F.col("_sk"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@_q(
    "q16_supplier_variety",
    """
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size <= 10
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000)
    GROUP BY p_brand, p_size
    """,
)
def q16_supplier_variety(spark, sf_dir):
    """NOT IN over a non-null key → LEFT ANTI join (build side = the
    excluded suppliers, tiny), then a grouped exact COUNT(DISTINCT)."""
    l = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size") <= 10)
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 2000)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        l.join(bad, "l_suppkey", "left_anti")
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@_q(
    "q19_disjunctive_revenue",
    f"""
    SELECT COALESCE({_REV}, 0.0) AS revenue, COUNT(*) AS n_rows
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND CAST(l_quantity AS DECIMAL(18,2)) < 25)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND CAST(l_quantity AS DECIMAL(18,2)) < 35)
    """,
)
def q19_disjunctive_revenue(spark, sf_dir):
    """OR-of-ANDs across both join sides (the q19 pattern): Catalyst
    extracts the common-prefix part predicates (brand/size disjunction)
    for scan pushdown while the mixed terms stay as the join residual."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & (_dec("l_quantity") < 25)
    )
    cond2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & (_dec("l_quantity") < 35)
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond1 | cond2)
        .agg(
            F.coalesce(
                F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).cast(
                    "double"
                ),
                F.lit(0.0),
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@_q(
    "q22_idle_customers",
    """
    WITH pos AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s,
             COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totbal
    FROM customer, pos
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
)
def q22_idle_customers(spark, sf_dir):
    """Decorrelated scalar-aggregate threshold (above-average balance)
    + NOT EXISTS (never placed an urgent order — every customer in this
    dataset has SOME order, so the correlate carries a filter),
    cross-multiplied to exact decimals — `bal·n > s` instead of
    `bal > s/n` — so no engine's division rounding can flip the
    strict-> boundary (q17's trick). The 1-row aggregate attaches as a
    broadcast nested-loop join of a single row; the anti join's build
    side is the filtered orders key set."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    pos = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            F.sum(_dec("c_acctbal")).cast("decimal(38,2)").alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    return (
        c.join(o, "c_custkey", "left_anti")
        .crossJoin(F.broadcast(pos))
        .filter(_dec("c_acctbal") * F.col("_n") > F.col("_s"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totbal"),
        )
    )
