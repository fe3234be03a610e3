"""Pair feature assembly (SURVEY.md §2.7 D1).

The reference delegates per-field distances to the ``dedupe`` library
(config: ``config.yaml:8-30``, assembled ``pgdedupe/run.py:50-55``):

* ``String``  → affine-gap edit distance
* ``Categorical`` → one-hot dummies over declared categories
* ``Interaction`` → product of two named variables' distances
* ``has missing`` → missing-indicator feature, NULLs flow through

Spark-first: every feature is a JVM column expression (whole-stage codegen;
no Python in the hot path). String distance = normalized Levenshtein
similarity via the built-in ``F.levenshtein`` — same monotone family as
affine-gap; the classifier is retrained on it so semantics (threshold on a
learned pair score) are preserved. An optional Arrow-batched affine-gap
pandas UDF can be slotted in for exact fidelity where needed.

Feature layout per field (mirrors dedupe's design):
  - String f: sim(f) in [0,1] (0 when either side NULL) [+ missing indicator]
  - Categorical f with categories c1..ck: dummy(f1==f2==ci)… + same(f1,f2)
  - Interaction (a, b): feature(a) * feature(b)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class FieldDef:
    field: str
    type: str = "String"  # String | Categorical | Exact | Price
    categories: list[str] = field(default_factory=list)
    has_missing: bool = False


def string_similarity(a: Column, b: Column) -> Column:
    """Normalized Levenshtein similarity in [0,1]; 0.5 neutral when missing
    (dedupe imputes missing-feature values at scoring time; a fixed neutral
    plus the missing indicator is the standard linear-model equivalent)."""
    maxlen = F.greatest(F.length(a), F.length(b))
    sim = 1.0 - F.levenshtein(a, b) / maxlen
    return F.when(a.isNull() | b.isNull(), F.lit(0.5)).otherwise(
        F.when(maxlen == 0, F.lit(1.0)).otherwise(sim)
    )


def exact_similarity(a: Column, b: Column) -> Column:
    return F.when(a.isNull() | b.isNull(), F.lit(0.5)).otherwise(
        (a == b).cast("double")
    )


def feature_columns(fields: list[FieldDef], interactions: list[tuple[str, str]] | None = None):
    """Returns (names, list[Column]) of pair features over `{f}_1`/`{f}_2`."""
    names: list[str] = []
    cols: list[Column] = []
    primary: dict[str, Column] = {}

    for fd in fields:
        a, b = F.col(f"{fd.field}_1"), F.col(f"{fd.field}_2")
        if fd.type == "Categorical" and fd.categories:
            same = exact_similarity(a, b)
            primary[fd.field] = same
            names.append(f"{fd.field}_same")
            cols.append(same)
            for cat in fd.categories:
                names.append(f"{fd.field}_is_{cat}")
                cols.append(
                    ((a == cat) & (b == cat)).cast("double")
                )
        elif fd.type == "Exact":
            sim = exact_similarity(a, b)
            primary[fd.field] = sim
            names.append(f"{fd.field}_sim")
            cols.append(sim)
        else:  # String
            sim = string_similarity(a, b)
            primary[fd.field] = sim
            names.append(f"{fd.field}_sim")
            cols.append(sim)
        if fd.has_missing:
            names.append(f"{fd.field}_missing")
            cols.append((a.isNull() | b.isNull()).cast("double"))

    for x, y in interactions or []:
        names.append(f"{x}_x_{y}")
        cols.append(primary[x] * primary[y])

    return names, cols


def assemble_features(pairs: DataFrame, fields: list[FieldDef],
                      interactions: list[tuple[str, str]] | None = None) -> DataFrame:
    names, cols = feature_columns(fields, interactions)
    return pairs.withColumn("features", F.array(*cols)), names
