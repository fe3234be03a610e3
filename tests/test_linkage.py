"""Two-dataset record linkage (operators/linkage.py): symmetric best
match one-to-one assignment and the iterated-rounds greedy relaxation,
on crafted conflict scenarios with known answers. The registry row
er_record_linkage covers the blocking+scoring+assignment composition
against DuckDB at both SFs."""

from __future__ import annotations

from pgdedupe_spark.operators.linkage import best_match_links, linkage_rounds


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_l long, id_r long, score double")


def test_best_match_is_mutual_and_one_to_one(spark):
    # A(1) prefers B1(10); B1 prefers A. C(2) also wants B1 but loses.
    pairs = _pairs(
        spark,
        [(1, 10, 0.9), (2, 10, 0.85), (1, 11, 0.6), (2, 11, 0.8)],
    )
    out = {(r.id_l, r.id_r) for r in best_match_links(pairs, threshold=0.5).collect()}
    # round 1 of mutual best: (1,10) mutual; (2,11) also mutual (2's best
    # after 10 is... 2's best IS 10 (0.85) — not mutual, so 2 unmatched)
    assert out == {(1, 10)}


def test_best_match_threshold_and_ties(spark):
    # sub-threshold pair never matches; tie on score breaks to smaller id
    pairs = _pairs(spark, [(1, 10, 0.4), (2, 20, 0.7), (2, 21, 0.7)])
    out = {(r.id_l, r.id_r) for r in best_match_links(pairs, threshold=0.5).collect()}
    assert out == {(2, 20)}


def test_linkage_rounds_recovers_conflict_losers(spark):
    # Greedy: (1,10) at 0.9; then 2 (who lost 10) should take 11 at 0.8
    # in round 2 — single-round mutual best leaves 2 unmatched.
    pairs = _pairs(
        spark,
        [(1, 10, 0.9), (2, 10, 0.85), (2, 11, 0.8), (1, 11, 0.6)],
    )
    one = best_match_links(pairs, threshold=0.5).collect()
    assert {(r.id_l, r.id_r) for r in one} == {(1, 10)}
    multi = linkage_rounds(pairs, threshold=0.5, max_rounds=3).collect()
    got = {(r.id_l, r.id_r): r.match_round for r in multi}
    assert got == {(1, 10): 1, (2, 11): 2}
    # one-to-one across rounds
    ls = [r.id_l for r in multi]
    rs = [r.id_r for r in multi]
    assert len(set(ls)) == len(ls) and len(set(rs)) == len(rs)
