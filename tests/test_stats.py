"""ANALYZE / histogram operator contracts beyond the driver oracle:
null accounting, clamping at the range edges, and the one-pass plan."""

from __future__ import annotations

from pgdedupe_spark.operators.stats import analyze_table, fixed_histogram


def test_analyze_counts_nulls_and_ndv(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, "b")], "id long, s string"
    )
    got = {r.column: (r.n_rows, r.n_nulls, r.n_distinct) for r in analyze_table(df, ["id", "s"]).collect()}
    assert got == {"id": (4, 0, 4), "s": (4, 1, 2)}


def test_analyze_is_single_aggregation(spark):
    """All columns' stats must come from ONE aggregate over the input —
    no per-column re-scan (the oracle's UNION of scans is the shape this
    operator exists to avoid)."""
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    plan = analyze_table(df, ["id", "s"])._jdf.queryExecution().optimizedPlan().toString()
    # the input relation appears exactly once (no UNION of per-column
    # scans), and the multi-distinct plans as a single Expand
    assert plan.count("LogicalRDD") == 1, plan
    assert plan.count("Expand") == 1, plan


def test_histogram_clamps_out_of_range(spark):
    df = spark.createDataFrame(
        [("t", -5.0), ("t", 0.0), ("t", 9.99), ("t", 50.0), ("t", 999.0)],
        "g string, v double",
    )
    got = {(r.g, r.bucket): r.n for r in fixed_histogram(df, "v", ["g"], 0.0, 100.0, 10).collect()}
    # -5 clamps to bucket 0 (with 0.0); 9.99 → 0; 50 → 5; 999 clamps to 9
    assert got == {("t", 0): 3, ("t", 5): 1, ("t", 9): 1}


def test_approx_percentile_rank_error_contract(spark, sf_dir):
    """Sketch-accuracy contract for approximate percentiles (the quantile
    sibling of the HLL 5% contract in events_approx_distinct): with
    accuracy=10000 the KLL/GK sketch guarantees rank error <= n/accuracy,
    so each approx quantile must land between the exact quantiles at
    p +/- 0.01 — the bound a 100 TB deployment would size (exact
    percentiles need a full sort per group; the sketch is one pass)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ps = [0.5, 0.9, 0.99]
    row = ev.agg(
        F.percentile_approx("value", ps, 10000).alias("approx"),
        F.percentile("value", [max(p - 0.01, 0.0) for p in ps]).alias("lo"),
        F.percentile("value", [min(p + 0.01, 1.0) for p in ps]).alias("hi"),
    ).collect()[0]
    for p, a, lo, hi in zip(ps, row.approx, row.lo, row.hi):
        assert lo <= a <= hi, (p, a, lo, hi)


def test_robust_outlier_flags_known_values(spark):
    """Hand-computed median/MAD: values [1..9, 100] per one group —
    median 5.5, MAD 2.5, so 100 flags at k=3 and 9 does not."""
    from pgdedupe_spark.operators.stats import robust_outlier_flags

    vals = list(range(1, 10)) + [100]
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, x long")
    out = {r["x"]: r for r in robust_outlier_flags(df, "x", ["grp"]).collect()}
    assert out[1]["group_median"] == 5.5 and out[1]["group_mad"] == 2.5
    assert out[100]["is_outlier"] and not out[9]["is_outlier"]
    # z = |100-5.5| / (1.4826*2.5)
    assert abs(out[100]["robust_z"] - 94.5 / (1.4826 * 2.5)) < 1e-12


def test_robust_outlier_flags_zero_mad_group(spark):
    """Constant group (MAD 0): z is NULL and ANY deviation flags —
    the degenerate case a stddev filter divides by zero on."""
    from pgdedupe_spark.operators.stats import robust_outlier_flags

    df = spark.createDataFrame(
        [("a", 7), ("a", 7), ("a", 7), ("a", 8)], "grp string, x long"
    )
    rows = robust_outlier_flags(df, "x", ["grp"]).collect()
    for r in rows:
        assert r["robust_z"] is None
        assert r["is_outlier"] == (r["x"] != 7)


def test_robust_outlier_flags_global_mode_and_clash(spark):
    import pytest

    from pgdedupe_spark.operators.stats import robust_outlier_flags

    df = spark.createDataFrame([(v,) for v in (1, 2, 3, 50)], "x long")
    out = robust_outlier_flags(df, "x")
    assert set(out.columns) == {"x", "group_median", "group_mad", "robust_z", "is_outlier"}
    got = {r["x"]: r["is_outlier"] for r in out.collect()}
    assert got[50] and not got[2]

    bad = df.withColumn("is_outlier", df["x"] > 0)
    with pytest.raises(ValueError, match="is_outlier"):
        robust_outlier_flags(bad, "x")


def test_robust_outlier_flags_broadcasts_stats(spark, sf_dir):
    """Both stat frames are group-sized: they broadcast; the fact side
    never hash-shuffles for a join. The dev subtree is deliberately
    unmaterialized (you don't cache a 100 TB fact), so the median join
    appears twice — 3 broadcast joins total, zero sort-merge."""
    from pgdedupe_spark import registry

    plan = (
        registry.QUERIES["stats_robust_outliers"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") == 3, plan
    assert "SortMergeJoin" not in plan
    assert "PythonUDF" not in plan


def test_rate_wilson_ci_known_values_and_edges(spark):
    """Hand-checked Wilson interval (k=8, n=10, z=1.96-exact) plus the
    edge cases the naive normal interval gets wrong: k=0 keeps a
    positive upper bound, k=n keeps a sub-1 lower bound, all bounds
    inside [0,1]."""
    import math

    from pyspark.sql import functions as F

    from pgdedupe_spark.operators.stats import rate_wilson_ci

    rows = [("a", i < 8) for i in range(10)]
    rows += [("b", False) for _ in range(20)]
    rows += [("c", True) for _ in range(15)]
    df = spark.createDataFrame(rows, "grp string, ok boolean")
    out = {r["grp"]: r for r in rate_wilson_ci(df, F.col("ok"), ["grp"]).collect()}

    z = 1.959963984540054
    n, p = 10.0, 0.8
    den = 1 + z * z / n
    ctr = p + z * z / (2 * n)
    mrg = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    a = out["a"]
    assert a["n"] == 10 and a["k"] == 8 and abs(a["rate"] - 0.8) < 1e-15
    assert abs(a["ci_lo"] - (ctr - mrg) / den) < 1e-12
    assert abs(a["ci_hi"] - (ctr + mrg) / den) < 1e-12

    b, c = out["b"], out["c"]
    assert b["k"] == 0 and b["ci_lo"] == 0.0 and b["ci_hi"] > 0.1
    assert c["k"] == 15 and c["ci_hi"] <= 1.0 and c["ci_lo"] < 1.0
    for r in out.values():
        assert 0.0 <= r["ci_lo"] <= r["rate"] <= r["ci_hi"] <= 1.0


def test_equi_depth_histogram_depths_and_determinism(spark):
    """100 distinct values into 4 buckets: exact 25-per-bucket depths
    with contiguous [lo,hi] ranges; ties land deterministically (equal
    values share a bucket, unlike ntile's row-order splits)."""
    from pgdedupe_spark.operators.stats import equi_depth_histogram

    df = spark.createDataFrame([(i,) for i in range(1, 101)], "v long")
    out = sorted(
        map(tuple, equi_depth_histogram(df, "v", 4).select(
            "bucket", "n_rows", "lo", "hi").collect())
    )
    assert [r[1] for r in out] == [25, 25, 25, 25]
    assert [r[0] for r in out] == [0, 1, 2, 3]
    for (b1, _, _, hi1), (b2, _, lo2, _) in zip(out, out[1:]):
        assert hi1 < lo2  # disjoint, ordered ranges

    # heavy ties: all-equal values land in ONE bucket, not split by order
    ties = spark.createDataFrame([(7,)] * 50, "v long")
    got = equi_depth_histogram(ties, "v", 4).collect()
    assert len(got) == 1 and got[0]["n_rows"] == 50


def test_equi_depth_histogram_no_global_sort(spark, sf_dir):
    """The reason the operator exists: no single-partition window, no
    global Sort — boundaries broadcast and assignment is row-local."""
    from pgdedupe_spark import registry

    plan = (
        registry.QUERIES["stats_equidepth"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert "PythonUDF" not in plan


def test_robust_z_is_signed(spark):
    """ADVICE r7: robust_z carries the deviation SIGN — a low-side
    outlier has z < 0, so callers thresholding z < -k actually find it
    (the former |.|-based z silently returned nothing for them), and the
    semantics now agree with temporal.rolling_robust_z under the same
    column name."""
    from pgdedupe_spark.operators.stats import robust_outlier_flags

    vals = list(range(1, 10)) + [100, -80]
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, x long")
    out = {r["x"]: r for r in robust_outlier_flags(df, "x", ["grp"], k=3.0).collect()}
    assert out[100]["robust_z"] > 0 and out[-80]["robust_z"] < 0
    assert out[100]["is_outlier"] and out[-80]["is_outlier"]
    med = out[1]["group_median"]
    mad = out[1]["group_mad"]
    assert abs(out[-80]["robust_z"] - (-80 - med) / (1.4826 * mad)) < 1e-12


def test_rate_wilson_ci_null_is_failure(spark):
    """ADVICE r7: NULL success coalesces to failure so n and k share one
    definition — an all-NULL group yields k=0 with a real interval,
    never a NULL rate."""
    from pyspark.sql import functions as F

    from pgdedupe_spark.operators.stats import rate_wilson_ci

    rows = [("a", True), ("a", None), ("a", False), ("b", None), ("b", None)]
    df = spark.createDataFrame(rows, "grp string, ok boolean")
    out = {r["grp"]: r for r in rate_wilson_ci(df, F.col("ok"), ["grp"]).collect()}
    assert out["a"]["n"] == 3 and out["a"]["k"] == 1
    assert out["b"]["n"] == 2 and out["b"]["k"] == 0
    assert out["b"]["rate"] == 0.0 and out["b"]["ci_lo"] == 0.0
    assert 0.0 < out["b"]["ci_hi"] < 1.0


def test_percentile_exact_approx_equivalence(spark, sf_dir):
    """VERDICT r7 #7: the approx (bounded-state) switch must agree with
    exact within the sketch's rank-error contract — exact `percentile`
    interpolates between ranks while `approx_percentile` returns a real
    element, so equality is rank-based, not bitwise: every approx
    equi-depth bucket must hold its target share of rows within 2% of
    the group, and the approx median/MAD must land between the exact
    p=0.49/0.51 quantiles. Pins that the 100 TB escape hatch computes
    the same statistics, not just 'runs'."""
    from pyspark.sql import functions as F

    from pgdedupe_spark.operators.stats import (
        equi_depth_histogram,
        robust_outlier_flags,
    )

    df = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "event_type", "value as v"
    )
    totals = {
        r["event_type"]: r["n"]
        for r in df.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    ha = equi_depth_histogram(df, "v", 4, ["event_type"], exact=False).collect()
    assert {r["event_type"] for r in ha} == set(totals)
    for r in ha:
        share = r["n_rows"] / totals[r["event_type"]]
        assert abs(share - 0.25) < 0.02, (r, share)

    exact_band = {
        r["event_type"]: r
        for r in df.groupBy("event_type")
        .agg(
            F.expr("percentile(v, 0.49)").alias("lo"),
            F.expr("percentile(v, 0.51)").alias("hi"),
        )
        .collect()
    }
    fa = robust_outlier_flags(df, "v", ["event_type"], exact=False).select(
        "event_type", "group_median"
    ).distinct().collect()
    for r in fa:
        band = exact_band[r["event_type"]]
        assert band["lo"] <= r["group_median"] <= band["hi"], (r, band)
