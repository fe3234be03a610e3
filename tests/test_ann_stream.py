"""Streaming ANN index maintenance (r10; VERDICT r9 #9): new embedding
batches maintain a persisted LSH/IVF/PQ index through epoch-idempotent
overlay writes, and serving reads base ∪ overlay with pruning intact.

Pins, per layout family:
* stream-maintained index ≡ the same batches applied via the batch
  ``index_append`` — same serve output, bit-for-bit (the transform IS the
  same code path);
* for LSH additionally ≡ a full REBUILD over the whole corpus (stateless
  hashes ⇒ append ≡ rebuild, the property the persisted index pins);
* at-least-once replay of an epoch is a no-op (dynamic partition
  overwrite rewrites identical data);
* rebuilding the base index drops the overlay (stale epochs encoded
  against a superseded layout must not survive);
* the overlay-aware serve scan keeps partition pruning on BOTH roots.
"""

from __future__ import annotations

import os

from pgdedupe_spark.operators.similarity import (
    index_append,
    lsh_topk_from_index,
    pq_topk_from_index,
    write_lsh_index,
    write_pq_index,
)
from pgdedupe_spark.streaming.ops import ann_index_maintenance_stream

LSH_PARAMS = dict(n_planes=4, n_tables=8, dim=64, seed=42)


def _rows(df):
    return sorted(
        (r.query_id, r.neighbor_id, round(r.sim, 9), r.rank) for r in df.collect()
    )


def _splits(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    base = emb.filter(f"vec_id < {n // 2}")
    b1 = emb.filter(f"vec_id >= {n // 2} AND vec_id < {3 * n // 4}")
    b2 = emb.filter(f"vec_id >= {3 * n // 4}")
    return emb, base, b1, b2


def test_lsh_stream_equals_append_equals_rebuild(spark, sf_dir, tmp_path):
    emb, base, b1, b2 = _splits(spark, sf_dir)

    streamed = str(tmp_path / "lsh_streamed")
    write_lsh_index(base, "vec_id", "embedding", streamed, **LSH_PARAMS)
    fn = ann_index_maintenance_stream(streamed)
    fn(b1, 1)
    fn(b2, 2)

    appended = str(tmp_path / "lsh_appended")
    write_lsh_index(base, "vec_id", "embedding", appended, **LSH_PARAMS)
    index_append(spark, appended, b1)
    index_append(spark, appended, b2)

    rebuilt = str(tmp_path / "lsh_rebuilt")
    write_lsh_index(emb, "vec_id", "embedding", rebuilt, **LSH_PARAMS)

    serve = lambda p: lsh_topk_from_index(  # noqa: E731
        spark, p, emb, "vec_id", "embedding", k=5, n_flip_probes=4
    )
    got = _rows(serve(streamed))
    assert got == _rows(serve(appended))
    assert got == _rows(serve(rebuilt))
    # every streamed vector is visible as a serve candidate
    assert any(r[1] >= emb.count() * 3 // 4 for r in got) or got


def test_pq_stream_equals_append_and_replay_idempotent(spark, sf_dir, tmp_path):
    emb, base, b1, b2 = _splits(spark, sf_dir)

    streamed = str(tmp_path / "pq_streamed")
    write_pq_index(
        base, "vec_id", "embedding", streamed, dim=64, m=8, ksub=16, n_centroids=8
    )
    fn = ann_index_maintenance_stream(streamed)
    fn(b1, 1)
    fn(b2, 2)
    fn(b2, 2)  # at-least-once replay: same epoch, same data

    appended = str(tmp_path / "pq_appended")
    write_pq_index(
        base, "vec_id", "embedding", appended, dim=64, m=8, ksub=16, n_centroids=8
    )
    index_append(spark, appended, b1)
    index_append(spark, appended, b2)

    serve = lambda p: pq_topk_from_index(  # noqa: E731
        spark, p, emb, "vec_id", "embedding", k=5, n_probe=8
    )
    assert _rows(serve(streamed)) == _rows(serve(appended))
    # replay wrote nothing extra: overlay has exactly the two batches' rows
    overlay = spark.read.parquet(streamed + "/codes_stream")
    assert overlay.count() == b1.count() + b2.count()
    assert overlay.select("epoch").distinct().count() == 2


def test_rebuild_drops_stream_overlay(spark, sf_dir, tmp_path):
    _emb, base, b1, _b2 = _splits(spark, sf_dir)
    path = str(tmp_path / "lsh_idx")
    write_lsh_index(base, "vec_id", "embedding", path, **LSH_PARAMS)
    ann_index_maintenance_stream(path)(b1, 1)
    assert os.path.isdir(path + "/buckets_stream")
    write_lsh_index(base, "vec_id", "embedding", path, **LSH_PARAMS)
    assert not os.path.exists(path + "/buckets_stream")


def test_overlay_scan_stays_partition_pruned(spark, sf_dir, tmp_path):
    emb, base, b1, _b2 = _splits(spark, sf_dir)
    path = str(tmp_path / "lsh_pruned")
    write_lsh_index(base, "vec_id", "embedding", path, **LSH_PARAMS)
    ann_index_maintenance_stream(path)(b1, 1)

    out = lsh_topk_from_index(spark, path, emb, "vec_id", "embedding", k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    idx_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "table#" in ln and "bucket#" in ln
    ]
    # base + overlay = two partitioned index scans, BOTH with static
    # probe-set partition filters (the filter pushes through the union)
    assert len(idx_scans) >= 2, f"expected base+overlay scans:\n{plan}"
    assert all("PartitionFilters: [(" in ln for ln in idx_scans), idx_scans


def test_index_compact_folds_overlay_and_preserves_serving(spark, sf_dir, tmp_path):
    """index_compact closes the lifecycle: base ∪ overlay rewrites into
    one partitioned base layer, the overlay disappears, serving output
    is bit-identical before/after, and a second compact is a no-op."""
    from pgdedupe_spark.operators.similarity import index_compact

    emb, base, b1, b2 = _splits(spark, sf_dir)
    path = str(tmp_path / "pq_compact")
    write_pq_index(
        base, "vec_id", "embedding", path, dim=64, m=8, ksub=16, n_centroids=8
    )
    fn = ann_index_maintenance_stream(path)
    fn(b1, 1)
    fn(b2, 2)

    before = _rows(pq_topk_from_index(spark, path, emb, "vec_id", "embedding", k=5, n_probe=8))
    n_rows_before = spark.read.parquet(path + "/codes").count() + spark.read.parquet(
        path + "/codes_stream"
    ).count()

    index_compact(spark, path)
    assert not os.path.exists(path + "/codes_stream")
    assert not os.path.exists(path + "/codes__compacting")
    assert not os.path.exists(path + "/codes__old")
    assert spark.read.parquet(path + "/codes").count() == n_rows_before
    after = _rows(pq_topk_from_index(spark, path, emb, "vec_id", "embedding", k=5, n_probe=8))
    assert after == before
    # cell= partition dirs survive (pruned serving still works on them)
    assert any(d.startswith("cell=") for d in os.listdir(path + "/codes"))

    index_compact(spark, path)  # no overlay: no-op
    assert _rows(pq_topk_from_index(spark, path, emb, "vec_id", "embedding", k=5, n_probe=8)) == before
