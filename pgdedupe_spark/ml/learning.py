"""Blocking-rule learning (SURVEY.md §2.7 D5) + pair sampling (D2).

The reference delegates both to the `dedupe` library: `deduper.train`
learns a predicate set by greedy set-cover over the labeled matches
(`pgdedupe/run.py:175-178`, recall knob `run.py:31`), and `deduper.sample`
draws random record pairs for labeling (`run.py:139-150`).

Spark-first shape:
* Rule *evaluation* (does predicate p cover labeled pair (a,b)?) runs as one
  DataFrame pass over the labeled pairs — every candidate rule becomes a
  boolean column (shared non-empty key intersection), so the coverage
  matrix for R rules × P pairs is a single JVM-side select + collect.
  Labeled samples are small by construction (hundreds of pairs), so the
  greedy cover itself is driver-side Python, exactly like the reference.
* Pair sampling is distributed and deterministic: two independent
  pseudo-random total orders (xxhash64 of id + seed), rank-joined — no
  driver-side materialization of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgdedupe_spark.operators.blocking import PREDICATES
from pgdedupe_spark.operators.ids import add_deterministic_id

# (predicate, extra_args) templates instantiated per field to form the
# candidate rule space — mirrors dedupe's simple-predicate zoo
# (dedupe/predicates.py; wired in reference run.py:213-222)
DEFAULT_TEMPLATES: list[tuple[str, tuple]] = [
    ("whole_field", ()),
    ("first_chars", (3,)),
    ("first_chars", (5,)),
    ("first_chars", (7,)),
    ("last_chars", (3,)),
    ("first_token", ()),
    ("tokens", ()),
    ("char_ngrams", (4,)),
    ("common_integers", ()),
    ("first_integer", ()),
    ("near_integers", ()),
    ("alpha_numeric", ()),
    ("suffixes", (5,)),
    ("fingerprint", ()),
    ("one_gram_fingerprint", ()),
    ("two_gram_fingerprint", ()),
    ("sorted_acronym", ()),
    ("common_two_tokens", ()),
    ("common_three_tokens", ()),
    ("soundex_code", ()),
    ("soundex_tokens", ()),
    ("exists_field", ()),
    ("hundred_ints", ()),
    ("round_magnitude", ()),
]


def candidate_rules(fields: list[str]) -> list[tuple[str, str, tuple]]:
    return [(pred, f, args) for f in fields for pred, args in DEFAULT_TEMPLATES]


def _coverage_matrix(
    spark: SparkSession,
    pairs: list[tuple[dict, dict]],
    fields: list[str],
    rules: list[tuple[str, str, tuple]],
) -> list[list[bool]]:
    """One row per labeled pair, one boolean column per candidate rule:
    True iff the rule emits a shared block key for the pair.

    CONTRACT: the collect() is bounded by the *labeled* pair count — the
    human-labeled training set (hundreds of pairs, same driver-side scale
    as the reference's dedupe.train at run.py:175-178), never the corpus.
    The guard below makes the bound explicit rather than an OOM."""
    if len(pairs) > 100_000:
        raise ValueError(
            f"{len(pairs)} labeled pairs exceeds the driver-side coverage-"
            "matrix bound (100k); labeled sets are human-scale by contract"
        )
    rows = [
        tuple(a.get(f) for f in fields) + tuple(b.get(f) for f in fields)
        for a, b in pairs
    ]
    schema = ", ".join(
        [f"a_{f} string" for f in fields] + [f"b_{f} string" for f in fields]
    )
    df = spark.createDataFrame(rows, schema)
    cols = []
    for i, (pred, field, args) in enumerate(rules):
        ka = PREDICATES[pred](F.col(f"a_{field}"), *args)
        kb = PREDICATES[pred](F.col(f"b_{field}"), *args)
        cols.append((F.size(F.array_intersect(ka, kb)) > 0).alias(f"r{i}"))
    collected = df.select(*cols).collect()
    return [[bool(row[f"r{i}"]) for i in range(len(rules))] for row in collected]


def learn_blocking_rules(
    spark: SparkSession,
    training_pairs: dict[str, list[tuple[dict, dict]]],
    fields: list[str],
    recall: float = 0.9,
    rules: list[tuple[str, str, tuple]] | None = None,
    distinct_penalty: float = 1.0,
) -> list[tuple[str, str, tuple]]:
    """Greedy weighted set-cover: pick rules until ≥ `recall` of labeled
    matches are covered. A rule's score = newly-covered matches −
    `distinct_penalty` × distinct-pairs it covers (the proxy for block
    size / comparison cost, standing in for dedupe's index-cost model)."""
    rules = rules or candidate_rules(fields)
    matches = training_pairs.get("match", [])
    distincts = training_pairs.get("distinct", [])
    if not matches:
        raise ValueError("no labeled matches to learn from")

    m_cov = _coverage_matrix(spark, matches, fields, rules)
    d_cov = (
        _coverage_matrix(spark, distincts, fields, rules)
        if distincts
        else [[False] * len(rules)]
    )
    d_count = [sum(row[i] for row in d_cov) for i in range(len(rules))]

    target = recall * len(matches)
    uncovered = set(range(len(matches)))
    chosen: list[int] = []
    while len(matches) - len(uncovered) < target:
        best, best_score, best_gain = None, float("-inf"), 0
        for i in range(len(rules)):
            if i in chosen:
                continue
            gain = sum(1 for p in uncovered if m_cov[p][i])
            if gain == 0:
                continue
            score = gain - distinct_penalty * d_count[i]
            # deterministic tie-break on rule index
            if score > best_score or (score == best_score and best is None):
                best, best_score, best_gain = i, score, gain
        if best is None:
            break  # no rule covers anything new — recall target unreachable
        chosen.append(best)
        uncovered -= {p for p in uncovered if m_cov[p][best]}
    return [rules[i] for i in chosen]


def sample_record_pairs(
    entries: DataFrame, id_col: str, n: int, seed: int = 0
) -> DataFrame:
    """D2: n deterministic pseudo-random record pairs, fully distributed.

    Two independent total orders of the id space (xxhash64 with different
    seed salts), each ranked with the scale-path serial-id operator, then
    rank-joined — a random derangement-ish pairing with no collect() and no
    Python RNG. Self-pairs are dropped (so ≤ n pairs come back)."""
    ids = entries.select(F.col(id_col).alias("_id")).distinct()

    def ranked(salt: int, out: str) -> DataFrame:
        h = ids.withColumn("_h", F.xxhash64(F.lit(seed + salt), F.col("_id")))
        r = add_deterministic_id(h, ["_h", "_id"], id_col="_rk")
        return r.filter(F.col("_rk") <= n).select("_rk", F.col("_id").alias(out))

    return (
        ranked(0, "id1")
        .join(ranked(1, "id2"), "_rk")
        .filter(F.col("id1") != F.col("id2"))
        .select("id1", "id2")
    )
