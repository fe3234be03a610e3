"""Skew utilities: salted two-phase aggregation and salted join must be
result-transparent (identical to the unsalted plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pgdedupe_spark.operators.skew import (
    add_salt,
    replicate_small_side,
    salted_aggregate,
)


def _skewed(spark):
    # one hot key (0) holding 80% of rows + a long tail
    rows = [(i, i % 5 if i % 5 else 0, float(i % 97)) for i in range(5000)]
    return spark.createDataFrame(rows, "row_id long, key long, v double")


def test_salted_aggregate_equals_direct(spark):
    df = _skewed(spark)
    got = salted_aggregate(
        df,
        keys=["key"],
        aggs={
            "n": ("count", F.lit(1)),
            "total": ("sum", F.col("v")),
            "lo": ("min", F.col("v")),
            "hi": ("max", F.col("v")),
        },
        unique_col="row_id",
        salt_n=7,
    )
    want = df.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("total"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_equals_direct(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(5)], "key long, name string")
    n = 7
    salted_big = add_salt(big, "row_id", n)
    salted_small = replicate_small_side(small, n)
    got = salted_big.join(salted_small, ["key", "_salt"]).select("row_id", "key", "name")
    want = big.join(small, "key").select("row_id", "key", "name")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salt_is_deterministic(spark):
    df = _skewed(spark)
    a = sorted(map(tuple, add_salt(df, "row_id", 16).collect()))
    b = sorted(map(tuple, add_salt(df, "row_id", 16).collect()))
    assert a == b
