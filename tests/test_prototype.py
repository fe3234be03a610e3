"""SSL-prototypes pruning (kmeans.prototype_scores / prototype_prune):
planted-cluster recovery, ceil-fraction keep counts, exact==shared-fit
with kmeans_exact, approx (percentile-cutoff) mode contracts, plan pins,
empty input. Reference semantics: Sorscher et al. 2022 (SSL prototypes),
Tirumala et al. 2023 (D4 composition)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pgdedupe_spark.operators.kmeans import (
    kmeans_exact,
    prototype_prune,
    prototype_scores,
)

DIM = 4


def _planted(spark):
    """Three tight clusters around distinct corners + one far outlier per
    cluster. ids encode the cluster for easy assertions."""
    rows = []
    centers = [[0.0] * DIM, [1.0] * DIM, [-1.0] * DIM]
    for c, ctr in enumerate(centers):
        for i in range(10):
            jitter = 0.001 * i
            rows.append((c * 100 + i, [v + jitter for v in ctr]))
        rows.append((c * 100 + 99, [v + 0.4 for v in ctr]))  # hard outlier
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>")


def test_scores_share_fit_with_kmeans_exact(spark):
    df = _planted(spark)
    km = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_exact(df, "vec_id", "embedding", k=3, iterations=2, dim=DIM).collect()
    }
    sc = prototype_scores(df, "vec_id", "embedding", k=3, iterations=2, dim=DIM).collect()
    assert {r["vec_id"]: r["cluster"] for r in sc} == km
    # outliers are the farthest member of their cluster
    by_cluster: dict[int, list] = {}
    for r in sc:
        by_cluster.setdefault(r["cluster"], []).append(r)
    assert len(by_cluster) == 3
    for members in by_cluster.values():
        hardest = max(members, key=lambda r: (r["proto_dist"], r["vec_id"]))
        assert hardest["vec_id"] % 100 == 99, members


def test_exact_prune_keeps_ceil_fraction_of_hardest(spark):
    df = _planted(spark)
    out = prototype_prune(
        df, "vec_id", "embedding", k=3, iterations=2, keep_pct=40, dim=DIM
    ).collect()
    assert len(out) == 33  # every input row is emitted
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for members in by_cluster.values():
        n = len(members)
        keep_n = math.ceil(n * 40 / 100)
        kept = [r for r in members if r["kept"] == 1]
        assert len(kept) == keep_n, members
        # kept = exactly the keep_n smallest hard_ranks, and every kept
        # dist >= every dropped dist (modulo the id tie-break)
        assert sorted(r["hard_rank"] for r in kept) == list(range(1, keep_n + 1))
        min_kept = min(r["proto_dist"] for r in kept)
        for r in members:
            if r["kept"] == 0:
                assert r["proto_dist"] <= min_kept
        # the planted outlier always survives
        assert any(r["vec_id"] % 100 == 99 for r in kept)


def test_approx_mode_cutoff_contract(spark):
    """approx path: kept iff dist >= the cluster's percentile cutoff — so
    every kept dist dominates every dropped dist, the hardest example is
    always kept, and the run is deterministic."""
    df = _planted(spark)
    out = prototype_prune(
        df, "vec_id", "embedding", k=3, iterations=2, keep_pct=40, dim=DIM, exact=False
    ).collect()
    assert len(out) == 33
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for members in by_cluster.values():
        kept = [r for r in members if r["kept"] == 1]
        dropped = [r for r in members if r["kept"] == 0]
        assert kept, members
        if dropped:
            assert min(r["proto_dist"] for r in kept) >= max(
                r["proto_dist"] for r in dropped
            )
        hardest = max(members, key=lambda r: r["proto_dist"])
        assert hardest["kept"] == 1
    again = prototype_prune(
        df, "vec_id", "embedding", k=3, iterations=2, keep_pct=40, dim=DIM, exact=False
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_plan_pins(spark):
    df = _planted(spark)
    score_plan = (
        prototype_scores(df, "vec_id", "embedding", k=3, iterations=1, dim=DIM)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # scoring is a pure projection against centroid literals
    assert "Join" not in score_plan, score_plan
    assert "PythonUDF" not in score_plan
    exact_plan = (
        prototype_prune(df, "vec_id", "embedding", k=3, iterations=1, dim=DIM)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert exact_plan.count("Window") == 1, exact_plan
    assert "BroadcastHashJoin" in exact_plan  # <= k count rows broadcast
    assert "SortMergeJoin" not in exact_plan
    approx_plan = (
        prototype_prune(
            df, "vec_id", "embedding", k=3, iterations=1, dim=DIM, exact=False
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in approx_plan, approx_plan
    assert "BroadcastHashJoin" in approx_plan
    assert "SortMergeJoin" not in approx_plan


def test_empty_input_schemas(spark):
    empty = spark.createDataFrame([], "vec_id int, embedding array<float>")
    sc = prototype_scores(empty, "vec_id", "embedding", k=2, iterations=1)
    assert [f.name for f in sc.schema] == ["vec_id", "cluster", "proto_dist"]
    assert sc.count() == 0
    km = kmeans_exact(empty, "vec_id", "embedding", k=2, iterations=1)
    assert [f.name for f in km.schema] == ["vec_id", "cluster"]
    assert km.count() == 0


def test_degenerate_keep_pct_short_circuits(spark):
    """ADVICE r10: keep_pct=0 must keep NOTHING (the >= cutoff test would
    otherwise still pass the max-distance rows) and keep_pct=100 must
    keep everything — in both exact and approx modes."""
    from pgdedupe_spark.operators.kmeans import prototype_prune

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for exact in (True, False):
        none = prototype_prune(
            df, "vec_id", "embedding", k=2, iterations=1, keep_pct=0, exact=exact
        )
        assert none.filter("kept = 1").count() == 0, exact
        assert none.count() == df.count()
        every = prototype_prune(
            df, "vec_id", "embedding", k=2, iterations=1, keep_pct=100, exact=exact
        )
        assert every.filter("kept = 0").count() == 0, exact
        assert every.count() == df.count()
    # exact mode keeps its rank column in the degenerate paths
    cols = prototype_prune(
        df, "vec_id", "embedding", k=2, iterations=1, keep_pct=0, exact=True
    ).columns
    assert cols == ["vec_id", "cluster", "proto_dist", "hard_rank", "kept"]


def test_fractional_keep_pct_still_keeps_a_sliver(spark):
    """Review r11 regression: keep_pct=0.5 in approx mode used to keep
    ~0.5% per cluster; an int() truncation turned it into keep-nothing.
    It must keep at least the single hardest row per cluster again (the
    >= cutoff at the extreme percentile) and never the whole cluster.
    ADVICE r11: the EXACT branch had the same int() truncation — its
    ceil-fraction threshold now quantizes the float, so exact=True with
    keep_pct=0.5 keeps exactly ceil(n·0.005) per cluster, and integer
    percentages are bit-identical to the historical expression."""
    from pgdedupe_spark.operators.kmeans import prototype_prune

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = prototype_prune(
        df, "vec_id", "embedding", k=2, iterations=1, keep_pct=0.5, exact=False
    )
    kept = out.filter("kept = 1").count()
    assert kept >= 1
    assert kept < out.count()

    exact_out = prototype_prune(
        df, "vec_id", "embedding", k=2, iterations=1, keep_pct=0.5, exact=True
    ).cache()
    sizes = {
        r["cluster"]: (r["n"], r["kept_n"])
        for r in exact_out.groupBy("cluster")
        .agg(
            F.count("*").alias("n"),
            F.sum("kept").alias("kept_n"),
        )
        .collect()
    }
    assert sizes, "fit produced no clusters"
    for n, kept_n in sizes.values():
        assert kept_n == (n * 5000 + 999_999) // 1_000_000, (n, kept_n)
        assert kept_n >= 1
    exact_out.unpersist()

    # integer pct: new quantized expression ≡ historical (n*pct+99) div 100
    out40 = prototype_prune(
        df, "vec_id", "embedding", k=2, iterations=1, keep_pct=40, exact=True
    ).cache()
    for r in (
        out40.groupBy("cluster")
        .agg(F.count("*").alias("n"), F.sum("kept").alias("kept_n"))
        .collect()
    ):
        assert r["kept_n"] == (r["n"] * 40 + 99) // 100, (r["n"], r["kept_n"])
    out40.unpersist()
