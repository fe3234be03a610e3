"""Table statistics (ANALYZE) and distribution summaries.

A 100 TB engine needs its own metadata: per-column null/cardinality
stats feed join-strategy and skew decisions (the same numbers ANALYZE
feeds Postgres' planner in the reference's world), and fixed-range
histograms summarize value distributions without a sort.

* :func:`analyze_table` — one aggregation pass computes (n_rows,
  n_nulls, n_distinct) for every requested column, then `stack` pivots
  the single wide row to one row per column. Exact distinct counts:
  Spark plans multi-distinct aggregates with one Expand (grouping-set
  style), so the cost is one shuffle regardless of column count. For
  columns where exact ndv is overkill at scale, `approx_count_distinct`
  (HLL++) is the drop-in — the events suite already exercises it
  (`events_approx_distinct`); ANALYZE keeps exact so the oracle is
  bit-for-bit.
* :func:`fixed_histogram` — clamped fixed-range bucketing with explicit
  double arithmetic (floor((v−lo)/(hi−lo)·n)), deliberately NOT a
  percentile sort: one map-side-combining aggregation, and the same
  expression is expressible in any engine for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def analyze_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct) per requested column, from
    ONE aggregation over the table. Output stays a DataFrame (write it
    next to the table as the stats sidecar)."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{c}', _n - `_nn_{c}`, `_nd_{c}`" for c in cols)
    return wide.selectExpr(
        "_n AS n_rows",
        f"stack({len(cols)}, {stack}) AS (column, n_nulls, n_distinct)",
    ).select("column", "n_rows", "n_nulls", "n_distinct")


def fixed_histogram(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lo: float,
    hi: float,
    n_buckets: int,
) -> DataFrame:
    """Clamped fixed-range histogram: bucket i covers
    [lo + i·(hi−lo)/n, lo + (i+1)·(hi−lo)/n), values outside clamp to the
    edge buckets. Pure double arithmetic (IEEE-identical across engines)
    so the DuckDB oracle reproduces buckets exactly."""
    v = F.col(value_col).cast("double")
    raw = F.floor((v - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(n_buckets))
    bucket = F.least(
        F.greatest(raw.cast("int"), F.lit(0)), F.lit(int(n_buckets) - 1)
    )
    return (
        df.groupBy(*group_cols, bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def robust_outlier_flags(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: float = 3.0,
    exact: bool = True,
) -> DataFrame:
    """Median/MAD outlier detection — the robust quality filter (mean/
    stddev gates are themselves dragged by the outliers they're meant to
    catch; median ± k·1.4826·MAD is the standard resistant replacement,
    1.4826 scaling MAD to σ under normality). Appends per-row
    ``group_median``, ``group_mad``, ``robust_z`` (NULL when MAD is 0)
    and ``is_outlier`` (MAD 0 ⇒ any deviation flags).

    ``robust_z`` is SIGNED — (value − median)/(1.4826·MAD) — so
    thresholding ``z < -k`` finds low-side outliers and the sign says
    which tail (ADVICE r7: the former |.|-based z silently broke such
    callers and disagreed with temporal.rolling_robust_z under the same
    name). ``is_outlier`` uses the absolute deviation as before.

    Oracle-exact by construction (``exact=True``): medians come from the
    EXACT interpolating percentile, so on integer-ish columns every
    statistic is a representable double and both engines agree
    bit-for-bit. Exact percentile buffers a per-group value-count map —
    unbounded state on high-cardinality double domains — so at extreme
    scale pass ``exact=False``: both percentiles swap to
    ``approx_percentile`` (bounded KLL-style sketch state, default
    accuracy 1/10000), same plan shape, statistically-equal stats
    (equivalence pinned on bounded domains in tests/test_stats.py).

    Plan shape: two sequential aggregations (median, then MAD of
    deviations — inherently ordered) + broadcast joins of the
    group-sized stat frames back onto the rows, so the fact side never
    hash-shuffles for a join. The plan scans the (column-pruned) input
    three times rather than caching it — at 100 TB re-scanning a pruned
    column beats materializing the fact; persist ``df`` first if it is
    small and reused. Grouping is optional: global mode uses a constant
    group key (one reducer holds the percentile state — the
    exact-global-median floor in any engine; ``exact=False`` bounds it)."""
    out_cols = {"group_median", "group_mad", "robust_z", "is_outlier"}
    clash = out_cols & set(df.columns)
    if clash:
        raise ValueError(f"input already has columns {sorted(clash)}")
    pctl = "percentile" if exact else "approx_percentile"
    gb = list(group_cols) if group_cols else []
    tmp_g = "_rof_g"
    while tmp_g in df.columns:
        tmp_g += "_"
    base = df if gb else df.withColumn(tmp_g, F.lit(1))
    keys = gb if gb else [tmp_g]
    med = base.groupBy(*keys).agg(
        F.expr(f"{pctl}({value_col}, 0.5)").cast("double").alias("group_median")
    )
    dev = (
        base.join(F.broadcast(med), keys)
        .withColumn("_rof_sd", F.col(value_col) - F.col("group_median"))
        .withColumn("_rof_ad", F.abs(F.col("_rof_sd")))
    )
    mad = dev.groupBy(*keys).agg(
        F.expr(f"{pctl}(_rof_ad, 0.5)").cast("double").alias("group_mad")
    )
    out = (
        dev.join(F.broadcast(mad), keys)
        .withColumn(
            "robust_z",
            F.when(F.col("group_mad") == 0, F.lit(None).cast("double")).otherwise(
                F.col("_rof_sd") / (F.lit(1.4826) * F.col("group_mad"))
            ),
        )
        .withColumn(
            "is_outlier",
            F.col("_rof_ad") > F.lit(k) * F.lit(1.4826) * F.col("group_mad"),
        )
        .drop("_rof_sd", "_rof_ad")
    )
    return out.drop(tmp_g) if not gb else out


def rate_wilson_ci(
    df: DataFrame,
    success: Column,
    group_cols: list[str],
    z: float = 1.959963984540054,
) -> DataFrame:
    """Per-group success rate with a Wilson score interval — the CI that
    stays inside [0,1] and behaves at small n / extreme rates where the
    naive normal interval collapses (the metric-report primitive for
    conversion/defect/dedup-rate dashboards). ``success`` is any boolean
    Column; default z is the exact two-sided 95% quantile.

    NULL semantics (ADVICE r7): a NULL ``success`` counts as FAILURE —
    it is coalesced to false before summing, so n (count of all rows)
    and k (count of successes) share one definition and an all-NULL
    group yields k=0 with a well-defined interval, never a NULL rate.
    Filter NULLs upstream if "unknown ≠ failure" in your domain.

    Output: group cols + n, k, rate, ci_lo, ci_hi. One map-side-combined
    aggregation (count + conditional count) keyed by the group; the
    interval arithmetic is row-local on the aggregate row. The formula
    is evaluated in one fixed operation order, mirrored textually by the
    oracle SQL, so doubles match bit-for-bit across engines."""
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.coalesce(success, F.lit(False)).cast("long")).alias("k"),
    )
    zz = z * z
    return (
        agg.withColumn("_nd", F.col("n").cast("double"))
        .withColumn("rate", F.col("k").cast("double") / F.col("_nd"))
        .withColumn("_den", F.lit(1.0) + F.lit(zz) / F.col("_nd"))
        .withColumn("_ctr", F.col("rate") + F.lit(zz) / (F.lit(2.0) * F.col("_nd")))
        .withColumn(
            "_mrg",
            F.lit(z)
            * F.sqrt(
                F.col("rate") * (F.lit(1.0) - F.col("rate")) / F.col("_nd")
                + F.lit(zz) / (F.lit(4.0) * F.col("_nd") * F.col("_nd"))
            ),
        )
        # clamp: the interval is mathematically inside [0,1] but fp
        # rounding can exceed by an ulp at p∈{0,1}; the oracle mirrors
        .withColumn(
            "ci_lo",
            F.greatest((F.col("_ctr") - F.col("_mrg")) / F.col("_den"), F.lit(0.0)),
        )
        .withColumn(
            "ci_hi",
            F.least((F.col("_ctr") + F.col("_mrg")) / F.col("_den"), F.lit(1.0)),
        )
        .drop("_nd", "_den", "_ctr", "_mrg")
    )


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    n_buckets: int,
    group_cols: list[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """Equi-depth (quantile-bucketed) histogram WITHOUT a global sort:
    the classic ntile formulation needs a total order — on Spark that is
    a single-partition window, the canonical scale-killer. Instead the
    exact interpolating percentile computes the n−1 bucket boundaries in
    one partial-aggregatable pass, the boundary array broadcasts back,
    and each row's bucket is `count(boundaries < value)` — a row-local
    codegen fold that is deterministic under ties (equal values always
    land in the same bucket, unlike ntile's row-order splits). Output:
    group cols + bucket, n_rows, lo, hi. Under heavy ties buckets are
    approximately equal-depth — the deterministic trade.

    State bound: exact ``percentile`` buffers a per-group value-count
    map — unbounded on high-cardinality double domains. At extreme
    scale pass ``exact=False`` to swap in ``approx_percentile``
    (bounded sketch state, same plan shape; boundaries may differ by
    the sketch accuracy — equivalence on bounded domains pinned in
    tests/test_stats.py). NULL values compare NULL against every
    boundary, so the filter keeps nothing and NULLs land in bucket 0
    by construction (ADVICE r7) — filter them upstream if bucket 0
    must stay pure.

    Oracle parity note: the boundary probabilities must be the same
    literals both sides; n_buckets with non-terminating binary
    fractions (e.g. 3) still match because both engines fold the same
    double literal."""
    gb = list(group_cols) if group_cols else []
    pctl = "percentile" if exact else "approx_percentile"
    tmp_g = "_edh_g"
    while tmp_g in df.columns:
        tmp_g += "_"
    base = df if gb else df.withColumn(tmp_g, F.lit(1))
    keys = gb if gb else [tmp_g]
    probs = ", ".join(repr(i / n_buckets) for i in range(1, n_buckets))
    bnds = base.groupBy(*keys).agg(
        F.expr(f"cast({pctl}({value_col}, array({probs})) as array<double>)").alias(
            "_bnds"
        )
    )
    j = base.join(F.broadcast(bnds), keys)
    bucket = (
        F.size(F.filter(F.col("_bnds"), lambda b: F.col(value_col) > b))
        .cast("int")
        .alias("bucket")
    )
    out = j.groupBy(*keys, bucket).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
    )
    return out.drop(tmp_g) if not gb else out
