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


def mg_summaries(tokens: DataFrame, col: str, capacity: int = 4096) -> DataFrame:
    """Per-partition Misra–Gries (space-saving) frequency summaries — the
    mergeable heavy-hitter layer (new r7), the frequency twin of the HLL
    distinct layer above.

    Why not ``groupBy(col).count()``: partial aggregation combines
    map-side, but the shuffle still carries ONE ROW PER DISTINCT TOKEN
    PER PARTITION — at 100 TB the rare-token long tail dominates that
    exchange (billions of singletons). The MG summary caps each
    partition's contribution at ``capacity`` rows with the classic
    guarantee: per-partition undercount ≤ n_p/(capacity+1), and summing
    summaries keeps total undercount ≤ Σ decrements (reported exactly in
    ``decr``, so callers get a per-run bound, not just the worst case).

    Arrow-batched ``mapInPandas`` with per-PARTITION dict state (the one
    legitimate Python tier: per-partition imperative state no DataFrame
    op expresses); inside a batch the counting is vectorized
    ``value_counts``. Output (token, mg_count, pid, decr): mg_count the
    surviving counter, decr the partition's total decrement (constant
    within a partition)."""
    import pandas as pd

    def _mg(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        counts: dict = {}
        decr = 0
        for pdf in batches:
            vc = pdf["token"].dropna().value_counts()
            for tok, c in vc.items():
                counts[tok] = counts.get(tok, 0) + int(c)
            if len(counts) > capacity:
                vals = sorted(counts.values(), reverse=True)
                thresh = vals[capacity]  # (capacity+1)-th largest
                decr += thresh
                counts = {t: c - thresh for t, c in counts.items() if c > thresh}
        yield pd.DataFrame(
            {
                "token": list(counts.keys()),
                "mg_count": list(counts.values()),
                "pid": pid,
                "decr": decr,
            }
        )

    return tokens.select(F.col(col).alias("token")).mapInPandas(
        _mg, schema="token string, mg_count long, pid int, decr long"
    )


def heavy_hitters(
    tokens: DataFrame, col: str, k: int = 20, capacity: int = 4096, exact: bool = True
) -> DataFrame:
    """Top-k most frequent tokens without ever shuffling the full
    vocabulary: per-partition MG summaries → merge by summation (≤
    capacity rows per partition cross the wire) → optional second scan
    that counts ONLY the top-``capacity`` candidates exactly (broadcast
    semi join, so the rare tail still never shuffles).

    Guarantee (pinned in tests/test_sketches.py): with ``exact=True``
    the result equals the brute-force top-k whenever the true k-th
    count exceeds the summed decrement bound (every token that big is
    guaranteed into the candidate set); with ``exact=False`` the
    approx_count is within [true − Σdecr, true]. Deterministic
    tie-break: count desc, token asc.

    Output (token, count, rank) — ``count`` exact or approximate per the
    flag."""
    from pyspark.sql import Window

    summaries = mg_summaries(tokens, col, capacity)
    merged = summaries.groupBy("token").agg(F.sum("mg_count").alias("approx_count"))
    cand = merged.orderBy(F.col("approx_count").desc(), "token").limit(capacity)
    if exact:
        counted = (
            tokens.select(F.col(col).alias("token"))
            .join(F.broadcast(cand.select("token")), "token", "left_semi")
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("count"))
        )
    else:
        counted = cand.select("token", F.col("approx_count").alias("count"))
    w = Window.orderBy(F.col("count").desc(), F.col("token"))
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("token", "count", "rank")
    )
