"""Temporal operators Spark lacks natively: the as-of join.

An as-of (backward) join matches every left row to the single most recent
right row with ``order_col`` ≤ the left row's, per key — the canonical
time-series enrichment (trades⟶quotes, clicks⟶last purchase). Spark has no
built-in; the naive formulations are a range join (quadratic blowup) or a
groupBy-collect (driver-sized state). This is the Spark-first composition:

1. union the two inputs with a side tag, right columns nulled on left rows
   and vice versa;
2. one window per key ordered by ``(order_col, side)`` — right rows sort
   before left rows at equal timestamps, so ties match inclusively;
3. ``last(value, ignorenulls=True)`` over UNBOUNDED PRECEDING..CURRENT ROW
   carries the latest right payload forward;
4. keep the left rows.

Cost: ONE shuffle (hash by key) + an in-partition sort — the same plan a
merge-based as-of join does on a time-series engine, and it scales linearly
with AQE handling hot keys. The right side should be unique per
``(keys, order_col)``; pre-aggregate if not (ties inside the right frame
are otherwise resolved by last-in-sort-order, which is nondeterministic
without a tiebreak column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Backward as-of join (inclusive): left enriched with the latest
    ``value_cols`` from right where ``right.order_col <= left.order_col``
    within ``key_cols``; NULLs where no right row precedes."""
    lcols = left.columns
    struct_cols = key_cols + [order_col]

    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"_v_{v}") for v in value_cols],
    )
    r_tagged = right.select(
        *struct_cols,
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in struct_cols
        ],
        F.lit(0).alias("_side"),
        *[F.col(v).alias(f"_v_{v}") for v in value_cols],
    )
    ordered_cols = lcols + ["_side"] + [f"_v_{v}" for v in value_cols]
    unioned = l_tagged.select(*ordered_cols).unionByName(r_tagged.select(*ordered_cols))

    w = Window.partitionBy(*key_cols).orderBy(order_col, "_side").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    filled = unioned.select(
        *lcols,
        "_side",
        *[
            F.last(f"_v_{v}", ignorenulls=True).over(w).alias(f"_v_{v}")
            for v in value_cols
        ],
    )
    return filled.filter(F.col("_side") == 1).select(
        *lcols, *[F.col(f"_v_{v}").alias(v) for v in value_cols]
    )


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    key_cols: list[str],
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
) -> DataFrame:
    """Point-in-interval join: every (point row, range row) pair with
    ``lo <= point <= hi`` within ``key_cols`` — inclusive both ends.

    A naive non-equi join plans as a nested loop (quadratic, interpreted
    condition). The scale path buckets the axis: each range explodes to the
    ``(hi - lo) / bucket_width + 1`` buckets it overlaps, each point maps to
    exactly ONE bucket, and the join becomes an equi-join on
    ``(keys..., bucket)`` followed by the exact BETWEEN filter in a codegen
    stage. Each qualifying pair meets in exactly one bucket (the point's),
    so no dedup pass is needed. Pick ``bucket_width`` near the typical range
    span: output work is then O(pairs), not O(n·m).
    """
    b_point = F.floor(F.col(point_col) / F.lit(int(bucket_width)))
    p = points.withColumn("_bkt", b_point)
    r = ranges.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(int(bucket_width))),
                F.floor(F.col(hi_col) / F.lit(int(bucket_width))),
            )
        ),
    )
    joined = p.join(r, key_cols + ["_bkt"]).filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    )
    return joined.drop("_bkt")


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    scale: int = 10000,
    bucket_width: int | None = None,
) -> DataFrame:
    """Per-key time-weighted average via trapezoidal integration — the
    hypertable-style `time_weight('Linear')` aggregate: irregular samples
    weighted by how long each value held, not how often it was sampled.

    Exactness contract (the cross-engine double rule): values quantize to
    longs (floor(double(v)*scale + 0.5), the shared quantizer convention),
    each trapezoid contributes the INTEGER (q_i + q_{i+1})·Δt computed in
    DECIMAL(38,0) (cast BEFORE the multiply — the per-segment product can
    exceed int64 even when each factor fits), and both
    the area and time sums accumulate as DECIMAL(38,0) — order-independent
    across partitions, overflow-safe past int64, exact in Spark and DuckDB
    (HUGEINT there). The single final division produces the double:
    twa = Σ(q_i+q_{i+1})·Δt_i / (2·scale·ΣΔt_i). Keys whose samples all
    share one timestamp have zero integration span → NULL twa (emitted,
    not dropped — the caller decides the fallback).

    One shuffle (hash by key) + in-partition sort for the lead window; the
    aggregation reuses the window's partitioning (no second exchange).
    ``tiebreak_col`` makes equal-timestamp ordering deterministic; dt=0
    segments contribute zero area either way.

    ``bucket_width`` (opt-in) is the HOT-KEY scale path (SCALE.md): a
    pathologically hot key otherwise sorts its entire history in one
    partition (inherent to per-key ordered integration). With a bucket
    width, samples integrate within (key, floor(ts/width)) buckets first —
    parallel across buckets — and only the per-bucket summaries (one row
    per non-empty bucket: partial sums + boundary samples) flow through
    the per-key window that stitches the bucket-boundary trapezoids. The
    per-key state drops from O(samples) to O(buckets). Time buckets
    partition the axis monotonically, so global per-key sample order is
    exactly bucket-order-then-intra-bucket-order and the decimal sums are
    IDENTICAL to the single-pass path (pinned by property test); cost is
    one extra shuffle (by (key, bucket), then by key)."""
    q = F.floor(F.col(value_col).cast("double") * scale + F.lit(0.5)).cast("long")

    # cast to decimal BEFORE the multiply: (q+nq)·Δt in int64 can exceed
    # 2^63 (|v|≈15 at scale=10000 with a year-scale µs gap already does),
    # and Spark's non-ANSI int64 multiply wraps silently while DuckDB's
    # BIGINT raises — the decimal-first product is exact on both engines
    def _area2(qc: str, nqc, dtc) -> F.Column:
        return (
            (F.col(qc).cast("decimal(38,0)") + nqc.cast("decimal(38,0)"))
            * dtc.cast("decimal(38,0)")
        ).cast("decimal(38,0)")

    def _finish(agg: DataFrame) -> DataFrame:
        return agg.select(
            key_col,
            "n_samples",
            F.when(
                F.col("_span") > 0,
                F.col("_area2").cast("double")
                / (F.lit(2.0) * scale * F.col("_span").cast("double")),
            ).alias("twa_value"),
        )

    if bucket_width is None:
        w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
        seg = (
            df.select(F.col(key_col), F.col(ts_col), F.col(tiebreak_col), q.alias("_q"))
            .withColumn("_nq", F.lead("_q").over(w))
            .withColumn("_dt", (F.lead(ts_col).over(w) - F.col(ts_col)).cast("long"))
        )
        return _finish(
            seg.groupBy(key_col).agg(
                F.count(F.lit(1)).alias("n_samples"),
                F.sum(_area2("_q", F.col("_nq"), F.col("_dt"))).alias("_area2"),
                F.sum(F.col("_dt").cast("decimal(38,0)")).alias("_span"),
            )
        )

    # hot-key path: intra-bucket integration (parallel), then stitch
    # bucket boundaries over the small per-bucket frame
    b = df.select(
        F.col(key_col), F.col(ts_col), F.col(tiebreak_col), q.alias("_q")
    ).withColumn("_bkt", F.floor(F.col(ts_col) / F.lit(int(bucket_width))))
    w_in = Window.partitionBy(key_col, "_bkt").orderBy(ts_col, tiebreak_col)
    seg = b.withColumn("_nq", F.lead("_q").over(w_in)).withColumn(
        "_dt", (F.lead(ts_col).over(w_in) - F.col(ts_col)).cast("long")
    )
    per_bkt = seg.groupBy(key_col, "_bkt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(_area2("_q", F.col("_nq"), F.col("_dt"))).alias("_a"),
        F.sum(F.col("_dt").cast("decimal(38,0)")).alias("_s"),
        # boundary samples: (ts, tiebreak) is the within-bucket total order,
        # so struct min/max pick the bucket's first/last sample exactly
        F.min(F.struct(F.col(ts_col).alias("_t"), F.col(tiebreak_col).alias("_tb"),
                       F.col("_q").alias("_q"))).alias("_first"),
        F.max(F.struct(F.col(ts_col).alias("_t"), F.col(tiebreak_col).alias("_tb"),
                       F.col("_q").alias("_q"))).alias("_last"),
    )
    w_b = Window.partitionBy(key_col).orderBy("_bkt")
    stitched = per_bkt.withColumn("_nfirst", F.lead("_first").over(w_b)).withColumn(
        "_bdt", (F.col("_nfirst._t") - F.col("_last._t")).cast("long")
    )
    return _finish(
        stitched.groupBy(key_col).agg(
            F.sum("_n").alias("n_samples"),
            (
                F.coalesce(F.sum("_a"), F.lit(0).cast("decimal(38,0)"))
                + F.coalesce(
                    F.sum(_area2("_last._q", F.col("_nfirst._q"), F.col("_bdt"))),
                    F.lit(0).cast("decimal(38,0)"),
                )
            ).alias("_area2"),
            (
                F.coalesce(F.sum(F.col("_s")), F.lit(0).cast("decimal(38,0)"))
                + F.coalesce(
                    F.sum(F.col("_bdt").cast("decimal(38,0)")),
                    F.lit(0).cast("decimal(38,0)"),
                )
            ).alias("_span"),
        )
    )


def ordered_funnel(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
) -> DataFrame:
    """Ordered conversion funnel: for each stage s_i, count the keys whose
    FIRST s_i event occurs at-or-after their first occurrences of every
    earlier stage (the classic product-analytics funnel, here as one
    conditional-aggregation pass + an iterated as-of comparison, no joins
    per stage).

    Plan: one groupBy(key) computes min(ts) per stage via
    conditional aggregation (single shuffle, map-side combine); the
    stage-ordering predicate is then pure row-local arithmetic, and the
    final stage counts come from one more tiny aggregation. At 100 TB:
    2 shuffles total, state = one row per key, never per event."""
    firsts = df.groupBy(key_col).agg(
        *[
            F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f"_t{i}")
            for i, s in enumerate(stages)
        ]
    )
    # reached stage i ⇔ every first-occurrence chain t0 ≤ t1 ≤ … ≤ ti holds
    reached = [F.col("_t0").isNotNull()]
    for i in range(1, len(stages)):
        reached.append(
            reached[i - 1]
            & F.col(f"_t{i}").isNotNull()
            & (F.col(f"_t{i}") >= F.col(f"_t{i-1}"))
        )
    counted = firsts.select(
        *[F.when(reached[i], 1).otherwise(0).alias(f"_r{i}") for i in range(len(stages))]
    ).agg(
        *[
            # coalesce: SUM over ZERO keys is NULL, but an empty funnel's
            # stage counts are 0 (oracle mirrors with coalesce(SUM..,0))
            F.coalesce(F.sum(f"_r{i}"), F.lit(0).cast("bigint")).alias(f"_n{i}")
            for i in range(len(stages))
        ]
    )
    # long form: (stage_no, stage, n_keys) — one row per stage
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("stage_no"),
                F.lit(s).alias("stage"),
                F.col(f"_n{i}").alias("n_keys"),
            )
            for i, s in enumerate(stages)
        ]
    )
    return counted.select(F.explode(rows).alias("_s")).select(
        F.col("_s.stage_no").alias("stage_no"),
        F.col("_s.stage").alias("stage"),
        F.col("_s.n_keys").alias("n_keys"),
    )


def gapfill_locf(
    df,
    key_col: str,
    ts_us_col: str,
    value_col: str,
    bucket_us: int,
):
    """Gap-filled time buckets with last-observation-carried-forward — the
    hypertable `time_bucket_gapfill` + `locf` analog.

    Per key: generate the FULL bucket series spanning [min, max] of that
    key's observed buckets (`sequence` + `explode` — JVM, no driver
    loop), left-join the actual per-bucket aggregates, then carry the
    last seen value forward into empty buckets.

    LOCF deliberately avoids ``last(..., ignorenulls=True)``: the
    portable islands formulation — a running count of non-null
    observations assigns each empty bucket to its predecessor's island,
    and ``max`` over (key, island) recovers the single non-null value —
    uses only operators every SQL engine spells identically, so the
    DuckDB oracle is the same algorithm, not a dialect cousin.

    Scale: bucket count is span/bucket_us per key (independent of row
    count); both windows and the join share one hash partitioning on the
    key. A pathological key spanning decades at 1 s buckets densifies to
    ~10⁹ rows — bound the span or coarsen the bucket, same contract as
    any gapfill."""
    from pyspark.sql import Window

    b = (F.col(ts_us_col) - F.col(ts_us_col) % F.lit(int(bucket_us))).alias("bucket_us")
    actual = df.groupBy(F.col(key_col), b).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(value_col).cast("decimal(18,4)")).alias("_sv"),
    )
    span = actual.groupBy(key_col).agg(
        F.min("bucket_us").alias("_lo"), F.max("bucket_us").alias("_hi")
    )
    buckets = span.select(
        key_col,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(int(bucket_us)))
        ).alias("bucket_us"),
    )
    filled = buckets.join(actual, [key_col, "bucket_us"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grp = F.sum(F.when(F.col("_sv").isNotNull(), 1).otherwise(0)).over(w)
    filled = filled.withColumn("_grp", grp)
    wg = Window.partitionBy(key_col, "_grp")
    return filled.select(
        F.col(key_col),
        "bucket_us",
        F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
        F.max("_sv").over(wg).cast("double").alias("locf_value"),
    )


def rolling_robust_z(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    window_rows: int = 24,
    k: float = 4.0,
) -> DataFrame:
    """Trailing-window robust anomaly score per key: each row's value is
    compared against the median and IQR of the ``window_rows`` rows
    STRICTLY BEFORE it (the anomaly must not drag its own baseline), in
    ``order_cols`` order. Appends ``roll_med``, ``roll_iqr``,
    ``robust_z`` ((v − med)/(0.7413·IQR), the normal-consistent robust
    z; NULL when the trailing window is short or IQR is 0) and
    ``is_anomaly`` (|z| > k).

    IQR, not MAD: a rolling MAD needs the median of |x − frame-median|
    — a window nested inside a window, which no engine's frame model
    expresses; p75−p25 over the same frame is the standard
    one-pass-window robust scale (consistency constant 0.7413 =
    1/1.349). All three percentiles and the count share ONE window
    spec, so Spark plans a single partitioning+sort pass — one shuffle
    keyed by ``key_cols``, the floor for any ordered per-key scan.
    ``order_cols`` must be a deterministic total order per key (add a
    row id to break timestamp ties)."""
    clash = {"roll_med", "roll_iqr", "robust_z", "is_anomaly"} & set(df.columns)
    if clash:
        raise ValueError(f"input already has columns {sorted(clash)}")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(-window_rows, -1)
    )
    med = F.expr(f"percentile({value_col}, 0.5)").over(w)
    p25 = F.expr(f"percentile({value_col}, 0.25)").over(w)
    p75 = F.expr(f"percentile({value_col}, 0.75)").over(w)
    n = F.count(F.lit(1)).over(w)
    out = (
        df.withColumn("roll_med", F.when(n >= window_rows, med))
        .withColumn("roll_iqr", F.when(n >= window_rows, p75 - p25))
        .withColumn(
            "robust_z",
            F.when(
                (F.col("roll_iqr").isNotNull()) & (F.col("roll_iqr") != 0),
                (F.col(value_col) - F.col("roll_med"))
                / (F.lit(0.7413) * F.col("roll_iqr")),
            ),
        )
        .withColumn(
            "is_anomaly",
            F.when(
                F.col("robust_z").isNotNull(), F.abs(F.col("robust_z")) > F.lit(k)
            ).otherwise(F.lit(False)),
        )
    )
    return out
