"""Two-dataset record linkage (the dedupe library's RecordLink mode —
matching entities BETWEEN datasets, vs the within-table dedup the
reference pipeline runs; dedupe docs: RecordLink / "link two datasets").

The within-table machinery (blocking.py candidate generation, scoring.py
classifiers, clustering.py CC+HAC) carries over unchanged for pair
GENERATION; what linkage adds is the assignment contract: each left
record matches AT MOST one right record and vice versa (one-to-one),
which clustering's transitive components deliberately do not enforce.

Spark-first assignment: the classic greedy max-weight matching is
sequential, so we use SYMMETRIC BEST MATCH (mutual nearest neighbor) —
a pair survives iff it is its left record's best-scoring candidate AND
its right record's best-scoring candidate. One window per side over the
candidate-pair frame (two hash exchanges keyed by either id — bounded by
candidate volume, which blocking already caps), deterministic tie-breaks
on the partner id, fully SQL-expressible (the registry oracle replays it
verbatim). Mutual-best is the standard distributed relaxation of greedy
matching: every mutual-best pair is also in the greedy solution, so
precision is greedy-or-better; recall defers conflicted records to the
next round (see linkage_rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def best_match_links(
    scored_pairs: DataFrame,
    left_id: str = "id_l",
    right_id: str = "id_r",
    score_col: str = "score",
    threshold: float = 0.5,
) -> DataFrame:
    """One-to-one links via symmetric best match.

    Input: candidate pairs ``(left_id, right_id, score)`` (one row per
    candidate; callers generate them with any blocking strategy). Output:
    the subset that is mutually best with ``score >= threshold``, plus
    both rank columns (always 1 — kept for schema self-documentation).

    Ties break on the partner id ascending, so the result is a
    deterministic function of the input — no RNG, engine-portable."""
    wl = Window.partitionBy(left_id).orderBy(
        F.col(score_col).desc(), F.col(right_id)
    )
    wr = Window.partitionBy(right_id).orderBy(
        F.col(score_col).desc(), F.col(left_id)
    )
    return (
        scored_pairs.filter(F.col(score_col) >= threshold)
        .withColumn("rank_l", F.row_number().over(wl))
        .withColumn("rank_r", F.row_number().over(wr))
        .filter((F.col("rank_l") == 1) & (F.col("rank_r") == 1))
        .select(left_id, right_id, score_col)
    )


def linkage_rounds(
    scored_pairs: DataFrame,
    left_id: str = "id_l",
    right_id: str = "id_r",
    score_col: str = "score",
    threshold: float = 0.5,
    max_rounds: int = 3,
) -> DataFrame:
    """Iterated symmetric best match: after each round, remove pairs that
    touch an already-matched record and re-run on the remainder, so
    records that lost a conflict can still match their second-best
    partner. Converges to the greedy max-weight matching as rounds → ∞;
    ``max_rounds`` bounds driver-side iteration (each round is one fixed
    DataFrame computation — no growing lineage problem at 3 rounds; pass
    a checkpointed frame for more).

    Returns links with a ``match_round`` column (1-based)."""
    remaining = scored_pairs.filter(F.col(score_col) >= threshold)
    out: DataFrame | None = None
    for rnd in range(1, max_rounds + 1):
        links = best_match_links(
            remaining, left_id, right_id, score_col, threshold
        ).withColumn("match_round", F.lit(rnd))
        out = links if out is None else out.unionByName(links)
        # drop every candidate touching a matched record on either side
        remaining = (
            remaining.join(
                links.select(F.col(left_id)), left_id, "left_anti"
            ).join(links.select(F.col(right_id)), right_id, "left_anti")
        )
    return out
