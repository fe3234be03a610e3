"""D5 blocking-rule learning + D2 pair sampling (SURVEY.md §2.7)."""

from __future__ import annotations

import pytest

from pgdedupe_spark.ml.learning import (
    _coverage_matrix,
    candidate_rules,
    learn_blocking_rules,
    sample_record_pairs,
)
from tests.datagen import generate_population, training_pairs

FIELDS = ["first_name", "last_name", "ssn", "sex", "dob"]


def test_learned_rules_hit_recall(spark):
    tp = training_pairs()
    rules = learn_blocking_rules(spark, tp, FIELDS, recall=0.9)
    assert rules, "no rules learned"
    # recompute coverage of the learned set over the labeled matches
    cov = _coverage_matrix(spark, tp["match"], FIELDS, rules)
    covered = sum(1 for row in cov if any(row))
    assert covered >= 0.9 * len(tp["match"]), (covered, len(tp["match"]))


def test_learning_is_deterministic(spark):
    tp = training_pairs()
    r1 = learn_blocking_rules(spark, tp, FIELDS, recall=0.9)
    r2 = learn_blocking_rules(spark, tp, FIELDS, recall=0.9)
    assert r1 == r2


def test_unreachable_recall_stops(spark):
    """If no candidate rule covers the matches, the greedy loop must
    terminate (reference behavior: dedupe raises/underachieves, never
    spins)."""
    # opposite null-masks so even exists_field ("0" vs "1") can't cover
    tp = {
        "match": [({"first_name": "ab", "last_name": None}, {"first_name": None, "last_name": "zq"})],
        "distinct": [],
    }
    rules = learn_blocking_rules(spark, tp, ["first_name", "last_name"], recall=1.0)
    assert rules == []


def test_sample_pairs_deterministic_and_bounded(spark):
    rows, _, _ = generate_population(100, seed=0)
    df = spark.createDataFrame(
        rows,
        "entry_id long, first_name string, last_name string, ssn string, sex string, dob string",
    )
    p1 = sorted(map(tuple, sample_record_pairs(df, "entry_id", 50, seed=1).collect()))
    p2 = sorted(map(tuple, sample_record_pairs(df, "entry_id", 50, seed=1).collect()))
    assert p1 == p2
    assert 0 < len(p1) <= 50
    assert all(a != b for a, b in p1)
    # a different seed gives a different pairing
    p3 = sorted(map(tuple, sample_record_pairs(df, "entry_id", 50, seed=2).collect()))
    assert p1 != p3


def test_candidate_rule_space_shape():
    from pgdedupe_spark.ml.learning import DEFAULT_TEMPLATES

    rules = candidate_rules(FIELDS)
    assert len(DEFAULT_TEMPLATES) >= 20, "predicate zoo regressed"
    assert len(rules) == len(DEFAULT_TEMPLATES) * len(FIELDS)
    assert all(len(r) == 3 for r in rules)
