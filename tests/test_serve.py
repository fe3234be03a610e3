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
