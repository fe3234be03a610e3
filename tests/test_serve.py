"""The registry's persisted-index SERVING queries (ann_lsh_serve /
ann_ivf_serve) must return exactly what the in-memory approximate paths
(ann_lsh_topk / ann_ivf_topk) return — the disk layout changes the plan
(static partition pruning), never the answer. Rows-only at the driver, so
this equality is the correctness pin."""

from __future__ import annotations

from pgdedupe_spark import registry


def _rows(df):
    return sorted(
        (r.query_id, r.neighbor_id, round(r.sim, 9), r.rank) for r in df.collect()
    )


def test_lsh_serve_equals_in_memory(spark, sf_dir):
    serve = registry.QUERIES["ann_lsh_serve"](spark, sf_dir)
    mem = registry.QUERIES["ann_lsh_topk"](spark, sf_dir)
    assert _rows(serve) == _rows(mem)
    assert serve.count() > 0


def test_ivf_serve_equals_in_memory(spark, sf_dir):
    serve = registry.QUERIES["ann_ivf_serve"](spark, sf_dir)
    mem = registry.QUERIES["ann_ivf_topk"](spark, sf_dir)
    assert _rows(serve) == _rows(mem)
    assert serve.count() > 0


def test_serve_rerun_is_deterministic(spark, sf_dir):
    # the driver's determinism gate runs every registry query twice; the
    # write side must be idempotent (mode overwrite) and the read side
    # stable under a fresh write
    a = _rows(registry.QUERIES["ann_lsh_serve"](spark, sf_dir))
    b = _rows(registry.QUERIES["ann_lsh_serve"](spark, sf_dir))
    assert a == b


def test_index_append_lsh_equals_rebuild(spark, tmp_path):
    """LSH hyperplanes are seed-deterministic, so append must be
    bit-for-bit equivalent to a full rebuild: same (id, table, bucket)
    membership and identical serving results."""
    from pgdedupe_spark.corpus import hash_embeddings
    from pgdedupe_spark.operators.similarity import (
        index_append,
        lsh_topk_from_index,
        write_lsh_index,
    )

    emb = hash_embeddings(spark, n_vecs=600, dim=64)
    full, incr = str(tmp_path / "full"), str(tmp_path / "incr")
    write_lsh_index(emb, "vec_id", "embedding", full, n_planes=4, n_tables=4)
    write_lsh_index(
        emb.filter("vec_id < 300"), "vec_id", "embedding", incr, n_planes=4, n_tables=4
    )
    index_append(spark, incr, emb.filter("vec_id >= 300"))

    rows = lambda p: {  # noqa: E731
        (r.vec_id, r.table, r.bucket)
        for r in spark.read.parquet(p + "/buckets").collect()
    }
    assert rows(full) == rows(incr)

    serve = lambda p: {  # noqa: E731
        (r.query_id, r.neighbor_id, r.rank)
        for r in lsh_topk_from_index(
            spark, p, emb, "vec_id", "embedding", k=3, query_filter="vec_id < 5"
        ).collect()
    }
    assert serve(full) == serve(incr)


def test_index_append_ivf_and_pq_serve_appended_batch(spark, tmp_path):
    """IVF/PQ appends assign against the PERSISTED centroids/codebooks —
    the cells stay internally consistent and serving must find planted
    twins that live only in the appended batch (query 901 pairs with 900;
    both appended after the index was built on vectors < 500)."""
    from pgdedupe_spark.corpus import hash_embeddings
    from pgdedupe_spark.operators.similarity import (
        index_append,
        ivf_topk_from_index,
        pq_topk_from_index,
        write_ivf_index,
        write_pq_index,
    )

    emb = hash_embeddings(spark, n_vecs=1000, dim=64)
    first, rest = emb.filter("vec_id < 500"), emb.filter("vec_id >= 500")

    ivf = str(tmp_path / "ivf")
    write_ivf_index(first, "vec_id", "embedding", ivf, n_centroids=8)
    index_append(spark, ivf, rest)
    assert spark.read.parquet(ivf + "/cells").count() == 1000
    out = ivf_topk_from_index(
        spark, ivf, emb, "vec_id", "embedding", k=3, n_probe=8,
        query_filter="vec_id IN (901)",
    ).collect()
    assert {r.neighbor_id for r in out if r.rank == 1} == {900}

    pq = str(tmp_path / "pq")
    write_pq_index(first, "vec_id", "embedding", pq, dim=64, m=16, ksub=16, n_centroids=8)
    index_append(spark, pq, rest)
    assert spark.read.parquet(pq + "/codes").count() == 1000
    out = pq_topk_from_index(
        spark, pq, emb, "vec_id", "embedding", k=3, n_probe=8, refine=8,
        query_filter="vec_id IN (901)",
    ).collect()
    assert {r.neighbor_id for r in out if r.rank == 1} == {900}
