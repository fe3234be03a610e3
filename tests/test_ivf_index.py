"""Persisted IVF index: write-once (cell= parquet partitions of ids only,
centroids as a self-describing sidecar), query-many with static partition
pruning on the probed cells — parity with the in-memory path and the
pruned-scan plan are both pinned."""

from __future__ import annotations

from pgdedupe_spark.operators.similarity import (
    ivf_cosine_topk,
    ivf_topk_from_index,
    write_ivf_index,
)

PARAMS = dict(n_centroids=16, seed=42)


def _rows(df):
    return sorted(
        (r.query_id, r.neighbor_id, round(r.sim, 9), r.rank) for r in df.collect()
    )


def test_index_parity_with_in_memory(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, "vec_id", "embedding", path, **PARAMS)

    direct = ivf_cosine_topk(emb, "vec_id", "embedding", k=5, n_probe=4, **PARAMS)
    indexed = ivf_topk_from_index(
        spark, path, emb, "vec_id", "embedding", k=5, n_probe=4
    )
    assert _rows(direct) == _rows(indexed)


def test_index_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, "vec_id", "embedding", path, **PARAMS)

    out = ivf_topk_from_index(spark, path, emb, "vec_id", "embedding", k=5, n_probe=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # identify the index scan by its partition column (plan Location paths
    # truncate); the probed cells must appear as static partition filters
    idx_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "cell#" in ln
    ]
    assert idx_scans, f"no index scan found in plan:\n{plan}"
    assert any("PartitionFilters: [cell" in ln or "PartitionFilters: [(" in ln
               for ln in idx_scans), (
        f"index scan has no static partition filters:\n{idx_scans}"
    )


def test_reader_uses_persisted_id_col(spark, sf_dir, tmp_path):
    # self-describing index: the reader renames the index side by the
    # persisted id_col from /meta, so a caller whose base frame uses a
    # different id name still gets the right join
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, "vec_id", "embedding", path, **PARAMS)

    renamed = emb.withColumnRenamed("vec_id", "doc_pk")
    out = ivf_topk_from_index(
        spark, path, renamed, "doc_pk", "embedding", k=5, n_probe=4,
        query_filter="doc_pk < 10",
    )
    baseline = ivf_topk_from_index(
        spark, path, emb, "vec_id", "embedding", k=5, n_probe=4
    )
    assert _rows(out) == _rows(baseline)


def test_empty_query_set(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, "vec_id", "embedding", path, **PARAMS)
    out = ivf_topk_from_index(
        spark, path, emb, "vec_id", "embedding", k=5, query_filter="vec_id < 0"
    )
    assert out.count() == 0
