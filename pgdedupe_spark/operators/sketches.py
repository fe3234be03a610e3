"""Mergeable distinct-count sketches (HLL rollup — the datasketches path).

`events_daily_from_hourly` re-aggregates counts/sums exactly from the
hourly table, but DISTINCT counts cannot re-aggregate from counts: a
daily distinct is not the sum of hourly distincts. The mergeable-sketch
pattern solves exactly this at 100 TB — materialize a binary HLL sketch
per fine-grained bucket ONCE (Spark 3.5+ `hll_sketch_agg`, Apache
DataSketches-compatible), then answer ANY coarser rollup by unioning
sketches (`hll_union_agg`), never re-scanning raw events. A day/week/
month/all-time distinct-user query over a year of data touches 365/52/12
sketch rows instead of the raw fact table.

Accuracy is the HLL contract (relative standard error ≈ 1.04/√2^lgK) and
— crucially — merging loses nothing: the union of sketches is byte-
equivalent to sketching the concatenated input, pinned exactly in
tests/test_sketches.py. Rows-only vs SQL oracles (binary sketch state is
engine-specific), so the contract lives in pytest, like the recall pins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sketch_rollup(
    df: DataFrame,
    bucket_col: Column,
    key_col: str,
    group_cols: list[str] | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """Materialize one HLL sketch of ``key_col`` per (group, bucket) —
    the write-once fine-grained layer. One aggregation pass; sketch
    state is lg_k-bounded (2^12 registers ≈ 4 KB) per group regardless
    of row count."""
    groups = [F.col(c) for c in (group_cols or [])]
    return df.groupBy(*groups, bucket_col.alias("bucket")).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_sketch_rollup(
    sketches: DataFrame,
    coarse_bucket: Column,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Roll fine sketches up to a coarser grain by UNIONING sketch state
    (never re-scanning raw data): distinct estimates at the coarse grain
    plus the merged sketch itself, so the output is again a mergeable
    layer (day → month → year chains compose)."""
    groups = [F.col(c) for c in (group_cols or [])]
    return (
        sketches.groupBy(*groups, coarse_bucket.alias("bucket"))
        .agg(
            F.hll_union_agg("sketch").alias("sketch"),
            F.sum("n_rows").alias("n_rows"),
        )
        .withColumn(
            "distinct_est", F.hll_sketch_estimate("sketch").cast("long")
        )
    )
