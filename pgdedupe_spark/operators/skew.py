"""Skew handling (SURVEY.md §4 hazard 1: hot block keys).

AQE's skew-join splitting covers the join case at runtime; these utilities
cover the *aggregation* case and give an explicit, deterministic salting
primitive for when runtime splitting isn't available (e.g. a fixed
production partitioning).

`salted_aggregate` is the classic two-phase pattern: partial-aggregate on
(key, salt) — spreading a hot key over `salt_n` reducers — then finish on
key alone. For algebraic aggregates (sum/count/min/max) the result is
identical to the direct group-by, which is exactly what the oracle-checked
`skew_salted_agg` registry query asserts. Salt is `xxhash64 % n` of a
unique column, not `rand()`, so plans stay deterministic and re-runnable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def add_salt(
    df: DataFrame, unique_col: str | list[str], salt_n: int, salt_col: str = "_salt"
) -> DataFrame:
    """Deterministic salt in [0, salt_n) from a unique column (or column
    tuple) hash. The salt source must VARY WITHIN a hot key — salting by
    the join/group key itself gives every row of the hot key the same salt
    and spreads nothing."""
    cols = [unique_col] if isinstance(unique_col, str) else list(unique_col)
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt_n))
    )


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column | str]],
    unique_col: str,
    salt_n: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    ``aggs`` maps output name → ``(fn, column)`` where fn ∈ {sum, count,
    min, max} (the algebraic aggregates — two-phase is exact for them).
    Phase 1 groups by keys+salt (hot keys fan out over ``salt_n`` partial
    groups); phase 2 re-aggregates partials: sums/counts re-sum, min/max
    re-apply. Spark's own partial aggregation does this per-partition
    already — the salt adds a *shuffle-level* split, which is what saves
    you when one key exceeds a single reducer's memory.
    """
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    combiners = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    salted = add_salt(df, unique_col, salt_n)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[fns[fn](col).alias(f"_p_{name}") for name, (fn, col) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[combiners[fn](f"_p_{name}").alias(name) for name, (fn, _) in aggs.items()]
    )


def replicate_small_side(small: DataFrame, salt_n: int, salt_col: str = "_salt") -> DataFrame:
    """Salted-join companion: explode the small side ×salt_n so it joins
    against every salt of the (salted) big side. Join on key + salt."""
    return small.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)).cast("array<long>"))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    unique_col: str | list[str],
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Explicit salted equi-join for hot keys: the big side gets a
    deterministic salt, the small side replicates ×``salt_n``, and the join
    runs on ``keys + salt`` so one hot key spreads over ``salt_n`` reducers.

    Exact for inner/left joins (each big row still meets every matching
    small row exactly once — on its own salt). Use when AQE's runtime skew
    split is unavailable (fixed production partitioning, non-AQE engines);
    under AQE prefer the plain join and let the runtime split."""
    b = add_salt(big, unique_col, salt_n)
    s = replicate_small_side(small, salt_n)
    return b.join(s, on + ["_salt"], how).drop("_salt")
