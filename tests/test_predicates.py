"""Predicate-zoo unit tests (SURVEY §2 D6/D7; VERDICT r1 'richer predicate
zoo'). Each simple predicate is pinned against hand-computed block keys —
semantics mirror dedupe's predicates.py (reference wiring run.py:213-222).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgdedupe_spark.operators.blocking import (
    PREDICATES,
    rare_token_blocking_map,
)


def _keys(spark, pred, value, *args):
    df = spark.createDataFrame([(value,)], "v string")
    row = df.select(PREDICATES[pred](F.col("v"), *args).alias("k")).first()
    return sorted(row["k"])


CASES = [
    ("whole_field", "abc def", (), ["abc def"]),
    ("first_chars", "abcdef", (3,), ["abc"]),
    ("last_chars", "abcdef", (3,), ["def"]),
    ("tokens", "b a  b", (), ["a", "b"]),
    ("first_token", "foo bar", (), ["foo"]),
    ("char_ngrams", "abcd", (3,), ["abc", "bcd"]),
    ("common_integers", "a12 b345 a12", (), ["12", "345"]),
    ("first_integer", "a12 b345", (), ["12"]),
    ("first_integer", "no digits", (), []),
    ("near_integers", "x41", (), ["40", "41", "42"]),
    ("alpha_numeric", "ab-12, cd!", (), ["12", "ab", "cd"]),
    ("suffixes", "abcdefg", (5,), ["abcdefg", "bcdefg", "cdefg"]),
    ("suffixes", "abc", (5,), []),
    ("fingerprint", "beta alpha beta", (), ["alphabeta"]),
    ("one_gram_fingerprint", "cab bca", (), ["abc"]),
    ("two_gram_fingerprint", "aba", (), ["abba"]),
    ("sorted_acronym", "delta alpha charlie", (), ["acd"]),
    ("common_two_tokens", "a b c", (), ["a b", "b c"]),
    ("common_two_tokens", "solo", (), []),
    ("common_three_tokens", "a b c d", (), ["a b c", "b c d"]),
    ("common_three_tokens", "a b", (), []),
    ("soundex_code", "Robert", (), ["R163"]),
    ("soundex_tokens", "Robert Rupert", (), ["R163"]),
    ("exists_field", "x", (), ["1"]),
    ("exists_field", "  ", (), ["0"]),
    ("hundred_ints", "a123 b99", (), ["0", "100"]),
    ("round_magnitude", "1234", (), ["1000"]),
    ("round_magnitude", "0.062", (), ["0"]),  # 0.06 → long cast → 0
    ("round_magnitude", "0", (), ["0"]),
    ("round_magnitude", "not a number", (), []),
]


@pytest.mark.parametrize("pred,value,args,expected", CASES, ids=lambda c: str(c)[:40])
def test_predicate_keys(spark, pred, value, args, expected):
    assert _keys(spark, pred, value, *args) == expected


@pytest.mark.parametrize("pred", sorted(set(PREDICATES) - {"exists_field"}))
def test_null_yields_no_keys(spark, pred):
    """dedupe skips missing values: NULL field → no block keys (except
    existsPredicate, whose whole point is keying on absence)."""
    args = {"first_chars": (3,), "last_chars": (3,), "char_ngrams": (3,), "suffixes": (5,)}.get(pred, ())
    assert _keys(spark, pred, None, *args) == []


def test_exists_field_null(spark):
    assert _keys(spark, "exists_field", None) == ["0"]


def test_rare_token_blocking_map(spark):
    """TF-IDF-canopy analog: hot tokens (df > max_df) and hapax tokens
    (df < min_df) produce no blocks; informative mid-frequency tokens do."""
    rows = [
        (1, "inc acme widgets"),
        (2, "inc acme gadgets"),
        (3, "inc zenith gadgets"),
        (4, "inc zenith"),
        (5, "inc onlyonce"),
    ]
    df = spark.createDataFrame(rows, "_unique_id long, name string")
    bmap = rare_token_blocking_map(df, "name", max_df=3, min_df=2)
    got = {(r["block_key"], r["_unique_id"]) for r in bmap.collect()}
    # "inc" df=5 > 3 → suppressed; "onlyonce"/"widgets" df=1 → suppressed
    assert got == {
        ("rare:name:acme", 1),
        ("rare:name:acme", 2),
        ("rare:name:gadgets", 2),
        ("rare:name:gadgets", 3),
        ("rare:name:zenith", 3),
        ("rare:name:zenith", 4),
    }
