"""Persisted LSH index: write-once (table=/bucket= parquet partitions of
ids only), query-many with static partition pruning. The 100 TB contract:
probing P (table, bucket) pairs must scan P directories, never the corpus
— pinned here on the physical plan, alongside exact parity with the
in-memory path (same planes ⇒ same candidates ⇒ same top-k)."""

from __future__ import annotations

from pgdedupe_spark.operators.similarity import (
    lsh_cosine_topk,
    lsh_topk_from_index,
    write_lsh_index,
)

PARAMS = dict(n_planes=4, n_tables=8, dim=64, seed=42)


def _rows(df):
    return sorted(
        (r.query_id, r.neighbor_id, round(r.sim, 9), r.rank) for r in df.collect()
    )


def test_index_parity_with_in_memory(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "lsh_index")
    write_lsh_index(emb, "vec_id", "embedding", path, **PARAMS)

    direct = lsh_cosine_topk(
        emb, "vec_id", "embedding", k=5, n_flip_probes=4, **PARAMS
    )
    indexed = lsh_topk_from_index(
        spark, path, emb, "vec_id", "embedding", k=5, n_flip_probes=4
    )
    assert _rows(direct) == _rows(indexed)


def test_index_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "lsh_index")
    write_lsh_index(emb, "vec_id", "embedding", path, **PARAMS)

    out = lsh_topk_from_index(spark, path, emb, "vec_id", "embedding", k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the index scan must carry the probe set as partition filters (static
    # pruning: non-probed table=/bucket= directories are never opened).
    # Identify it by its partition columns — plan Location strings truncate
    # long tmp paths, so matching on the path is unreliable.
    idx_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "table#" in ln and "bucket#" in ln
    ]
    assert idx_scans, f"no index scan found in plan:\n{plan}"
    # the filter must not be empty — probe pairs appear as literals
    assert any("PartitionFilters: [(" in ln for ln in idx_scans), (
        f"index scan has no static partition filters:\n{idx_scans}"
    )


def test_reader_uses_persisted_id_col(spark, sf_dir, tmp_path):
    # the index is self-describing: a reader whose base frame uses a
    # DIFFERENT id column name than the writer's must still resolve the
    # index side by the persisted id_col, not the caller's argument
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "lsh_index")
    write_lsh_index(emb, "vec_id", "embedding", path, **PARAMS)

    renamed = emb.withColumnRenamed("vec_id", "doc_pk")
    out = lsh_topk_from_index(
        spark, path, renamed, "doc_pk", "embedding", k=5,
        n_flip_probes=4, query_filter="doc_pk < 10",
    )
    baseline = lsh_topk_from_index(
        spark, path, emb, "vec_id", "embedding", k=5, n_flip_probes=4
    )
    assert _rows(out) == _rows(baseline)


def test_empty_query_set(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "lsh_index")
    write_lsh_index(emb, "vec_id", "embedding", path, **PARAMS)
    out = lsh_topk_from_index(
        spark, path, emb, "vec_id", "embedding", k=5, query_filter="vec_id < 0"
    )
    assert out.count() == 0
