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


def quantile_histogram_rollup(
    df: DataFrame,
    bucket_col: Column,
    value_col: str,
    group_cols: list[str] | None = None,
    n_bins: int = 128,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Per-(group, bucket) fixed-edge histograms — the QUANTILE member of
    the mergeable-summary triad (HLL = distinct, MG = frequency, this =
    numeric distribution; new r7).

    ``percentile_approx`` answers a quantile over raw rows, but its GK
    state is not a storable/mergeable column: a daily p99 cannot be
    assembled from hourly percentile results. Fixed-edge bin counts CAN —
    merging is per-bin summation, EXACTLY equal to histogramming the
    concatenated input (no estimation error added by the rollup, pinned
    bit-exact in tests/test_sketches.py), and quantile reads are then
    O(n_bins) over the summary, never a raw re-scan. Estimation error is
    the usual histogram contract: ≤ one bin width, set by (hi−lo)/n_bins.

    ``lo``/``hi`` pin the shared bin edges; when omitted, ONE extra
    aggregate-only pass computes the global min/max (documented — at
    100 TB pass fixed domain bounds instead). Values outside [lo, hi]
    clamp into the edge bins so merged layers stay consistent under
    drift. Output (…groups, bucket, bins map<int,bigint>, n_rows, lo,
    hi, n_bins) — the map is sparse (only occupied bins), bounded by
    n_bins entries per row."""
    groups = [F.col(c) for c in (group_cols or [])]
    if lo is None or hi is None:
        row = df.agg(
            F.min(F.col(value_col).cast("double")).alias("lo"),
            F.max(F.col(value_col).cast("double")).alias("hi"),
        ).collect()[0]
        lo = float(row.lo) if lo is None else lo
        hi = float(row.hi) if hi is None else hi
    width = (hi - lo) / n_bins if hi > lo else 1.0
    bin_expr = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(value_col).cast("double") - F.lit(lo)) / F.lit(width)).cast("int"),
        ),
    )
    per_bin = df.groupBy(*groups, bucket_col.alias("bucket"), bin_expr.alias("bin")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    gcols = [*(group_cols or []), "bucket"]
    return (
        per_bin.groupBy(*gcols)
        .agg(
            F.map_from_arrays(
                F.collect_list("bin"), F.collect_list("cnt")
            ).alias("bins"),
            F.sum("cnt").alias("n_rows"),
        )
        .withColumn("lo", F.lit(float(lo)))
        .withColumn("hi", F.lit(float(hi)))
        .withColumn("n_bins", F.lit(int(n_bins)))
    )


def merge_quantile_rollup(
    hists: DataFrame, coarse_bucket: Column, group_cols: list[str] | None = None
) -> DataFrame:
    """Roll fine histograms to a coarser bucket by summing per-bin counts
    (explode map → re-aggregate): the result is again a histogram layer
    with the SAME edges, so day → month → year chains compose and every
    level is bit-identical to histogramming raw data at that grain."""
    gcols = [*(group_cols or [])]
    exploded = hists.select(
        *gcols,
        coarse_bucket.alias("bucket"),
        "lo",
        "hi",
        "n_bins",
        F.explode("bins").alias("bin", "cnt"),
    )
    per_bin = exploded.groupBy(*gcols, "bucket", "lo", "hi", "n_bins", "bin").agg(
        F.sum("cnt").alias("cnt")
    )
    return (
        per_bin.groupBy(*gcols, "bucket", "lo", "hi", "n_bins")
        .agg(
            F.map_from_arrays(F.collect_list("bin"), F.collect_list("cnt")).alias("bins"),
            F.sum("cnt").alias("n_rows"),
        )
        .select(*gcols, "bucket", "bins", "n_rows", "lo", "hi", "n_bins")
    )


def histogram_quantiles(hists: DataFrame, qs: list[float]) -> DataFrame:
    """Quantile estimates straight from a histogram layer (no raw-data
    scan): for each requested q, walk the cumulative bin counts to the
    first bin where cum ≥ q·n and interpolate linearly inside it. All
    JVM expressions — one sort + one fold over each row's ≤ n_bins map
    entries. Output adds ``q_<q>`` double columns."""
    out = hists
    width = (F.col("hi") - F.col("lo")) / F.col("n_bins")
    entries = F.array_sort(F.map_entries(F.col("bins")))
    for q in qs:
        target = F.col("n_rows").cast("double") * F.lit(float(q))
        # fold: (cum, answer); once answer is set it sticks
        est = F.aggregate(
            entries,
            F.struct(
                F.lit(0.0).alias("cum"), F.lit(None).cast("double").alias("ans")
            ),
            lambda acc, e: F.struct(
                (acc["cum"] + e["value"].cast("double")).alias("cum"),
                F.when(acc["ans"].isNotNull(), acc["ans"])
                .when(
                    acc["cum"] + e["value"].cast("double") >= target,
                    F.col("lo")
                    + (
                        e["key"].cast("double")
                        + F.when(
                            e["value"] > 0,
                            (target - acc["cum"]) / e["value"].cast("double"),
                        ).otherwise(F.lit(0.5))
                    )
                    * width,
                )
                .otherwise(F.lit(None).cast("double"))
                .alias("ans"),
            ),
            lambda acc: F.coalesce(acc["ans"], F.col("hi")),
        )
        out = out.withColumn(f"q_{str(q).replace('.', '_')}", est)
    return out


# ---------------------------------------------------------------------------
# Mergeable Bloom-filter membership layer
# ---------------------------------------------------------------------------


def _bloom_positions(col: Column, num_bits: int, num_hashes: int) -> Column:
    """The k bit positions of a value: pmod(xxhash64(seed_i, v), m) for
    seed_i in 0..k-1 — pure JVM, deterministic, scan-local."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), col), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )


def bloom_build(
    df: DataFrame, col: str, num_bits: int = 1 << 22, num_hashes: int = 5
) -> DataFrame:
    """Mergeable Bloom filter over ``col`` as a SPARSE bitmap table
    (word_idx → 64-bit word), the membership twin of the HLL distinct
    layer above.

    Why a table and not a driver-side bitset: at 100 TB a corpus-key
    Bloom sized for billions of keys is gigabytes — it must itself stay
    distributed. Rows only exist for non-zero words, the row count is
    bounded by num_bits/64 regardless of input size, and the build is
    one explode (k small ints per key) + one bit_or aggregate with
    map-side combine. Merging two filters (incremental maintenance:
    OR the new batch's filter into the standing one) is the same
    bit_or aggregate over the union — bloom_merge below, pinned
    bit-identical to a direct build in tests/test_sketches.py.

    The membership contract: NO false negatives ever (positions are
    deterministic); false positives at the classic (1-e^(-kn/m))^k
    rate. Callers that need exactness confirm candidates with an exact
    join — the filter's job is to keep definitively-new keys out of
    that join entirely (dedup.incremental_exact_flags)."""
    pos = (
        df.select(
            F.explode(_bloom_positions(F.col(col), num_bits, num_hashes)).alias(
                "_bf_pos"
            )
        )
    )
    return (
        pos.select(
            F.shiftright("_bf_pos", 6).alias("word_idx"),
            F.expr("shiftleft(1L, CAST(_bf_pos % 64 AS INT))").alias("bits"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of two Bloom filters BUILT WITH THE SAME (num_bits,
    num_hashes): bitwise OR per word. Lossless: merge(build(X),
    build(Y)) is bit-identical to build(X ∪ Y)."""
    return (
        a.unionByName(b).groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))
    )


def bloom_might_contain(
    probe: DataFrame,
    col: str,
    bloom: DataFrame,
    num_bits: int,
    num_hashes: int,
    id_col: str,
    out_col: str = "might_contain",
) -> DataFrame:
    """Add a boolean ``out_col`` to ``probe``: False ⇒ the value is
    DEFINITELY absent from the filtered set; True ⇒ present or a false
    positive. Raises on a pre-existing ``out_col`` (and on an ``id_col``
    named like the internal word_idx/mask columns) rather than silently
    clobbering — the compact_table ``_z`` guard convention.

    Plan shape: explode the k positions per probe row, equi-join the
    sparse filter on word_idx (the filter side is bounded by num_bits/64
    rows — broadcastable for typical sizes, a cheap shuffle join keyed
    by word_idx beyond that; AQE picks), then every(bit set) per probe
    id and a join back on ``id_col``. The probe's k-row blowup is
    constant-factor; nothing scales with the FILTERED set's size."""
    if out_col in probe.columns:
        raise ValueError(f"probe already has a column named {out_col!r}")
    if id_col in ("word_idx", "_bf_mask", "bits"):
        raise ValueError(f"id_col {id_col!r} collides with internal columns")
    tmp = "_bf_pos"
    while tmp in probe.columns:
        tmp += "_"
    exploded = probe.select(
        F.col(id_col),
        F.explode(_bloom_positions(F.col(col), num_bits, num_hashes)).alias(tmp),
    ).select(
        id_col,
        F.shiftright(tmp, 6).alias("word_idx"),
        F.expr(f"shiftleft(1L, CAST({tmp} % 64 AS INT))").alias("_bf_mask"),
    )
    flags = (
        exploded.join(bloom, "word_idx", "left")
        .select(
            id_col,
            (
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.col("_bf_mask")) == F.col("_bf_mask"))
            ).alias("_bf_hit"),
        )
        .groupBy(id_col)
        .agg(F.every("_bf_hit").alias(out_col))
    )
    return probe.join(flags, id_col, "left")


# ---------------------------------------------------------------------------
# Mergeable Count-Min frequency layer
# ---------------------------------------------------------------------------



def _cm_positions(col: Column, width: int, depth: int) -> Column:
    """The depth (d, w) counter positions of a value — ONE definition
    shared by cm_build and cm_estimate, so built cells and probed cells
    can never drift apart (the never-undercount contract depends on
    them corresponding exactly)."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("d"),
                F.pmod(F.xxhash64(F.lit(i), col), F.lit(width)).alias("w"),
            )
            for i in range(depth)
        ]
    )


def cm_build(
    df: DataFrame, col: str, width: int = 2048, depth: int = 4
) -> DataFrame:
    """Count-Min sketch of the ``col`` stream as a sparse counter table
    (d, w, cnt) — the point-FREQUENCY member of the sketch algebra
    (HLL = distinct count, MG = top-k, quantile-histogram = ranks,
    Bloom = membership, CM = per-item frequency). Row count is bounded
    by depth × width regardless of stream size; the build is one explode
    (depth small ints per item) + one sum aggregate with map-side
    combine. Merge = per-cell summation (cm_merge), EXACTLY equal to
    sketching the concatenated stream — pinned in tests.

    Estimate contract (cm_estimate): never under the true count;
    over by ≤ 2·N/width with probability ≥ 1 − 2^−depth (Cormode &
    Muthukrishnan's classic bound with ε = 2/width)."""
    pos = df.select(
        F.explode(_cm_positions(F.col(col), width, depth)).alias("_p")
    )
    return (
        pos.select("_p.d", "_p.w")
        .groupBy("d", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of two CM sketches built with the SAME (width, depth):
    per-cell summation. Lossless: merge(build(X), build(Y)) equals
    build(X ∪ Y) cell-for-cell."""
    return a.unionByName(b).groupBy("d", "w").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    cm: DataFrame,
    items: DataFrame,
    col: str,
    width: int = 2048,
    depth: int = 4,
    out_col: str = "est",
) -> DataFrame:
    """Point-frequency estimates for ``items``: min over the depth
    counters at each item's positions (absent cell ⇒ that row counts 0,
    so the min—and the estimate—is 0 only for never-seen items). The
    sketch side is bounded by depth × width rows (broadcastable at the
    defaults; a shuffle join keyed by (d, w) beyond — AQE picks); the
    probe explodes depth rows per item."""
    if out_col in items.columns:
        raise ValueError(f"items already has a column named {out_col!r}")
    tmp = "_cm_d"
    while tmp in items.columns:
        tmp += "_"
    probes = items.select(
        F.col(col).alias("_cm_item"),
        F.explode(_cm_positions(F.col(col), width, depth)).alias(tmp),
    ).select("_cm_item", f"{tmp}.d", f"{tmp}.w")
    return (
        probes.join(cm, ["d", "w"], "left")
        .groupBy(F.col("_cm_item").alias(col))
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias(out_col))
    )
