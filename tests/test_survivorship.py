"""Survivorship (golden record) + blocking-metrics contracts beyond the
driver oracle: NULL handling, every tie-break, input validation, and the
one-aggregation plan shape the 100 TB claim rests on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgdedupe_spark.operators.survivorship import blocking_metrics, golden_record


def test_golden_record_rules_and_ties(spark):
    rows = [
        # cluster 1: name lengths tie (ab/cd) → smallest; mode ties x/y → x
        (1, 10, "ab", "x"),
        (1, 11, "cd", "y"),
        (1, 12, None, "x"),
        (1, 13, "e", "y"),
        # cluster 2: all-NULL name; single segment
        (2, 20, None, "z"),
        (2, 21, None, None),
    ]
    df = spark.createDataFrame(rows, "cluster int, seq long, name string, seg string")
    out = {
        r["cluster"]: r
        for r in golden_record(
            df,
            "cluster",
            {"name": "longest", "seg": "mode", "seq": "max"},
            seq_col="seq",
        ).collect()
    }
    assert out[1]["n_members"] == 4
    assert out[1]["name"] == "ab"  # longest (len 2), tie ab/cd → smallest
    assert out[1]["seg"] == "x"  # 2x vs 2y → tie → smallest
    assert out[1]["seq"] == 13
    assert out[2]["name"] is None  # all-NULL field stays NULL
    assert out[2]["seg"] == "z"  # NULLs never win mode


def test_golden_record_latest_first(spark):
    rows = [(1, 1, "old"), (1, 5, None), (1, 3, "mid")]
    df = spark.createDataFrame(rows, "cluster int, seq long, v string")
    got = golden_record(
        df, "cluster", {"v": "latest"}, seq_col="seq"
    ).collect()[0]
    # NULL at the max seq is skipped: latest NON-NULL value wins
    assert got["v"] == "mid"
    first = golden_record(df, "cluster", {"v": "first"}, seq_col="seq").collect()[0]
    assert first["v"] == "old"


def test_golden_record_null_seq_never_wins(spark):
    """Rows with NULL seq are excluded from latest/first (ADVICE r8:
    unguarded, a NULL seq compared lowest and won `first`)."""
    rows = [(1, None, "ghost"), (1, 2, "real-first"), (1, 7, "real-latest")]
    df = spark.createDataFrame(rows, "cluster int, seq long, v string")
    first = golden_record(df, "cluster", {"v": "first"}, seq_col="seq").collect()[0]
    assert first["v"] == "real-first"
    latest = golden_record(df, "cluster", {"v": "latest"}, seq_col="seq").collect()[0]
    assert latest["v"] == "real-latest"
    # all seqs NULL → rule yields NULL rather than an arbitrary value
    allnull = spark.createDataFrame(
        [(1, None, "a"), (1, None, "b")], "cluster int, seq long, v string"
    )
    assert golden_record(allnull, "cluster", {"v": "first"}, seq_col="seq").collect()[0]["v"] is None


def test_golden_record_validation(spark):
    df = spark.createDataFrame([(1, "a")], "cluster int, v string")
    with pytest.raises(ValueError, match="unknown rules"):
        golden_record(df, "cluster", {"v": "best"})
    with pytest.raises(ValueError, match="not in frame"):
        golden_record(df, "cluster", {"w": "min"})
    with pytest.raises(ValueError, match="seq_col"):
        golden_record(df, "cluster", {"v": "latest"})


def test_golden_record_single_aggregation_plan(spark, sf_dir):
    """All non-mode rules ride ONE cluster-keyed hash aggregate; the one
    mode field adds exactly one more aggregate + a cluster-keyed join.
    No windows, no Python, no extra scans of the input."""
    from pgdedupe_spark import registry

    plan = (
        registry.QUERIES["er_golden_record"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan
    assert "PythonUDF" not in plan
    # two aggregation pipelines (main + the single mode field), each with
    # a partial+final pair
    assert plan.count("HashAggregate") <= 6, plan


def test_blocking_metrics_known_values(spark):
    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 5)], "id1 long, id2 long"
    )
    truth = spark.createDataFrame([(1, 2), (6, 7)], "id1 long, id2 long")
    row = blocking_metrics(cand, truth, 10).collect()[0]
    assert row["n_candidates"] == 3 and row["n_truth"] == 2 and row["n_hits"] == 1
    assert abs(row["reduction_ratio"] - (1 - 3 / 45)) < 1e-12
    assert row["completeness"] == 0.5
    assert abs(row["quality"] - 1 / 3) < 1e-12


def test_blocking_metrics_empty_truth_yields_null(spark):
    cand = spark.createDataFrame([(1, 2)], "id1 long, id2 long")
    truth = spark.createDataFrame([], "id1 long, id2 long")
    row = blocking_metrics(cand, truth, 4).collect()[0]
    assert row["completeness"] is None
    assert row["n_truth"] == 0
