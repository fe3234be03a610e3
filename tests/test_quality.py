"""Data-validation rules (operators/quality.py): every rule kind, the
one-pass plan property, and the report contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from pgdedupe_spark.operators.quality import validate_table


def _frame(spark):
    rows = [
        (1, "en", 10, "web"),
        (2, "en", -3, "web"),        # in_range violation (n < 0)
        (2, "de", 5, "books"),       # duplicate id
        (None, "xx", 7, "web"),      # null id + lang outside set
        (4, "de", 9, "Web!"),        # matches violation (uppercase+punct)
    ]
    return spark.createDataFrame(rows, "id int, lang string, n int, source string")


def test_all_row_local_rules(spark):
    df = _frame(spark)
    rules = [
        {"rule": "not_null", "col": "id"},
        {"rule": "unique", "col": "id"},
        {"rule": "in_range", "col": "n", "min": 0, "max": 100},
        {"rule": "in_set", "col": "lang", "values": ["en", "de"]},
        {"rule": "matches", "col": "source", "pattern": "^[a-z_]+$"},
    ]
    got = {(r.rule, r.column): (r.violations, r.passed) for r in validate_table(df, rules).collect()}
    assert got == {
        ("not_null", "id"): (1, False),
        ("unique", "id"): (1, False),        # id=2 twice → one extra row
        ("in_range", "n"): (1, False),
        ("in_set", "lang"): (1, False),
        ("matches", "source"): (1, False),
    }


def test_multi_col_unique_and_pass(spark):
    df = _frame(spark)
    out = {r.rule: r for r in validate_table(df, [
        {"rule": "unique", "cols": ["id", "lang"]},
        {"rule": "in_range", "col": "n", "max": 100},
    ]).collect()}
    assert out["unique"].violations == 0 and out["unique"].passed
    assert out["in_range"].passed


def test_foreign_key_rule(spark):
    df = _frame(spark)
    dims = spark.createDataFrame([("web",), ("books",)], "src string")
    out = validate_table(
        df, [{"rule": "foreign_key", "col": "source", "ref": dims, "ref_col": "src"}]
    ).collect()
    assert out[0].violations == 1  # "Web!" unresolved; NULLs would be skipped
    assert not out[0].passed


def test_row_local_rules_share_one_aggregation(spark):
    """All row-local rules must compile into ONE aggregation pass — the
    plan may contain at most the two exchanges of a single global agg
    (partial + final), regardless of rule count."""
    import re

    df = _frame(spark)
    out = validate_table(df, [
        {"rule": "not_null", "col": "id"},
        {"rule": "in_range", "col": "n", "min": 0},
        {"rule": "in_set", "col": "lang", "values": ["en", "de"]},
        {"rule": "matches", "col": "source", "pattern": "^[a-z_]+$"},
        {"rule": "unique", "col": "id"},
    ])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one logical aggregation: a single scan of the input frame
    assert len(re.findall(r"Scan ExistingRDD", plan)) == 1, plan


def test_empty_rules_and_empty_frame(spark):
    df = _frame(spark)
    assert validate_table(df, []).count() == 0
    empty = spark.createDataFrame([], "id int, lang string, n int, source string")
    out = {r.rule: r for r in validate_table(empty, [
        {"rule": "not_null", "col": "id"},
        {"rule": "unique", "col": "id"},
    ]).collect()}
    assert out["not_null"].violations == 0 and out["not_null"].passed
    assert out["unique"].violations == 0 and out["unique"].passed


def test_in_range_without_bounds_rejected(spark):
    """A boundless in_range rule always passed silently (ADVICE r5) —
    it is a config typo and must raise."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="in_range"):
        validate_table(_frame(spark), [{"rule": "in_range", "col": "n"}])


def test_rule_labels_are_injection_safe(spark):
    """Rule/column labels travel as lit() values, not interpolated SQL —
    a quoted/backticked column name must neither break nor inject."""
    df = _frame(spark).withColumnRenamed("n", "weird `col` 'name'")
    out = validate_table(
        df, [{"rule": "in_range", "col": "weird `col` 'name'", "min": 0}]
    ).collect()
    assert len(out) == 1
    assert out[0].column == "weird `col` 'name'"
    assert out[0].violations == 1  # the fixture's n=-3 row, correctly counted
