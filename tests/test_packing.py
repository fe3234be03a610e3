"""Sequence-packing / token-budget operators (operators/packing.py).

The prefix sum is the load-bearing piece: it must equal a global-window
cumulative sum for ANY partitioning (the range boundaries are sampled, so
correctness can't depend on where they land), and the scale plan must not
contain a global (no-partition-spec) window — that is the whole point of
the operator."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pgdedupe_spark.operators.packing import (
    pack_assignments,
    prefix_sum,
    token_budget_select,
)


def _docs(spark, n=137, seed=7):
    # deterministic pseudo-random token counts incl. zeros and big docs
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64(F.col("id") + seed), F.lit(300))).alias("n_tok"),
    )
    return df.withColumn(
        "n_tok", F.when(F.col("doc_id") % 13 == 0, F.lit(0)).otherwise(F.col("n_tok"))
    )


def _global_cumsum(df, order_cols, value_col):
    w = Window.orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, -1)
    return df.withColumn("cum_before", F.coalesce(F.sum(value_col).over(w), F.lit(0)))


def test_prefix_sum_matches_global_window(spark):
    df = _docs(spark)
    got = {
        r.doc_id: r.cum_before
        for r in prefix_sum(df, [F.col("doc_id").asc()], "n_tok", num_partitions=7).collect()
    }
    want = {
        r.doc_id: r.cum_before
        for r in _global_cumsum(df, [F.col("doc_id").asc()], "n_tok").collect()
    }
    assert got == want


def test_prefix_sum_desc_order_and_partition_independence(spark):
    df = _docs(spark, n=90)
    order = [F.col("n_tok").desc_nulls_last(), F.col("doc_id").asc()]
    want = {r.doc_id: r.cum_before for r in _global_cumsum(df, order, "n_tok").collect()}
    for nparts in (1, 3, 16):
        got = {
            r.doc_id: r.cum_before
            for r in prefix_sum(df, order, "n_tok", num_partitions=nparts).collect()
        }
        assert got == want, f"num_partitions={nparts}"


def test_prefix_sum_plan_has_no_global_window(spark):
    out = prefix_sum(_docs(spark), [F.col("doc_id").asc()], "n_tok", num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the ranged+_pid frame must be MATERIALIZED (spark_partition_id is a
    # physical-placement function — without the checkpoint, the totals and
    # window branches can read the exchange with different AQE coalescing
    # and disagree on _pid; see packing.py docstring): the plan reads the
    # frozen RDD, with the rangepartitioning exchange inside its lineage
    assert "existingrdd" in plan.lower(), plan
    for ln in plan.splitlines():
        # the only windows over row data must be partitioned by _pid; the
        # offsets window runs over the one-row-per-partition totals frame
        if "Window" in ln and "n_tok" in ln:
            assert "_pid" in ln, f"global window over row data:\n{ln}"


def test_pack_invariants(spark):
    ctx = 64
    df = _docs(spark)
    rows = pack_assignments(df, "doc_id", "n_tok", ctx=ctx, num_partitions=5).collect()
    toks = {r.doc_id: r.n_tok for r in df.collect()}

    # per-document: slices are contiguous from offset 0 and sum to n_tok
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {d for d, n in toks.items() if n > 0}
    for d, slices in by_doc.items():
        slices.sort(key=lambda r: r.doc_off)
        assert slices[0].doc_off == 0
        assert sum(s.n_tok_in_pack for s in slices) == toks[d]
        off = 0
        for s in slices:
            assert s.doc_off == off
            assert 0 <= s.pack_off < ctx
            assert s.pack_off + s.n_tok_in_pack <= ctx
            off += s.n_tok_in_pack

    # per-pack: full except the last, and pack ids are dense from 0
    by_pack = {}
    for r in rows:
        by_pack[r.pack_id] = by_pack.get(r.pack_id, 0) + r.n_tok_in_pack
    n_packs = max(by_pack) + 1
    assert set(by_pack) == set(range(n_packs))
    total = sum(n for n in toks.values())
    for pid, n in by_pack.items():
        assert n == (ctx if pid < n_packs - 1 else total - ctx * (n_packs - 1))


def test_budget_select_invariants(spark):
    df = _docs(spark)
    budget = 2_000
    order = [F.col("n_tok").desc_nulls_last(), F.col("doc_id").asc()]
    out = token_budget_select(df, "n_tok", budget, order, num_partitions=6).collect()
    total = sum(r.n_tok for r in df.collect())

    assert sum(r.take_tokens for r in out) == min(budget, total)
    truncated = [r for r in out if r.truncated]
    assert len(truncated) <= 1  # only the boundary document is clipped
    for r in out:
        assert r.cum_before < budget
        assert r.take_tokens == min(r.n_tok, budget - r.cum_before)


def test_scale_probe_invariants_at_floor_size(spark):
    """pack_scale_probe's 2-row summary is itself an invariant check:
    pack slices must conserve every token, and the budget take must hit
    the budget EXACTLY (the r5 _pid/AQE-coalescing regression showed up
    as take > budget — this pins the fix at the probe's floor size)."""
    from pgdedupe_spark import registry

    rows = {r.part: r for r in registry.QUERIES["pack_scale_probe"](spark, "sf0.001").collect()}
    n = 200_000
    assert rows["budget"].tok == n * 64
    assert rows["pack"].tok > 0
    # conservation: pack slices sum to the full corpus token count
    from pyspark.sql import functions as F

    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(11)), F.lit(256)).alias("n_tok"),
    )
    assert rows["pack"].tok == docs.agg(F.sum("n_tok")).collect()[0][0]


def test_empty_and_degenerate_inputs(spark):
    empty = spark.createDataFrame([], "doc_id long, n_tok long")
    assert prefix_sum(empty, [F.col("doc_id").asc()], "n_tok").count() == 0
    assert pack_assignments(empty, "doc_id", "n_tok", ctx=8).count() == 0
    assert (
        token_budget_select(empty, "n_tok", 10, [F.col("doc_id").asc()]).count() == 0
    )
    # all-zero token counts → no packs
    zeros = spark.createDataFrame([(1, 0), (2, 0)], "doc_id long, n_tok long")
    assert pack_assignments(zeros, "doc_id", "n_tok", ctx=8).count() == 0


def test_write_training_shards_layout(spark, tmp_path):
    from pgdedupe_spark.operators.packing import write_training_shards

    docs = _docs(spark, n=400)
    total = sum(r.n_tok for r in docs.collect())
    ctx, pps = 64, 4
    out = str(tmp_path / "shards")
    got = write_training_shards(docs, "doc_id", "n_tok", out, ctx=ctx, packs_per_shard=pps, seed=3)

    # partition layout on disk: shard= directories, prunable
    import os as _os

    shards = sorted(d for d in _os.listdir(out) if d.startswith("shard="))
    assert len(shards) >= 2

    # token conservation and exact shard sizing (all but the last full)
    per_shard = {
        r.shard: r.tok
        for r in got.groupBy("shard").agg(F.sum("n_tok_in_pack").alias("tok")).collect()
    }
    assert sum(per_shard.values()) == total
    last = max(per_shard)
    for s, tok in per_shard.items():
        if s != last:
            assert tok == ctx * pps, (s, tok)

    # different seed ⇒ different deal (the epoch re-shuffle)
    out2 = str(tmp_path / "shards2")
    got2 = write_training_shards(docs, "doc_id", "n_tok", out2, ctx=ctx, packs_per_shard=pps, seed=4)
    a = {(r.doc_id, r.pack_id) for r in got.collect()}
    b = {(r.doc_id, r.pack_id) for r in got2.collect()}
    assert a != b


def test_shard_read_prunes_partitions(spark, tmp_path):
    """A trainer reading one shard must scan only that shard= directory:
    the filter lands in the scan's PartitionFilters (same discipline the
    persisted ANN indexes pin)."""
    from pgdedupe_spark.operators.packing import write_training_shards

    out = str(tmp_path / "shards")
    write_training_shards(_docs(spark, n=300), "doc_id", "n_tok", out,
                          ctx=64, packs_per_shard=2, seed=1)
    one = spark.read.parquet(out).filter(F.col("shard") == 1)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "shard" in m.group(1), plan[:1500]


def test_write_training_shards_deterministic(spark, tmp_path):
    """Same seed → byte-identical shard assignment across writes (the
    registry-wide determinism discipline, applied to the composed
    layout writer)."""
    from pgdedupe_spark.operators.packing import write_training_shards

    docs = _docs(spark, n=250)
    outs = []
    for name in ("a", "b"):
        out = str(tmp_path / name)
        got = write_training_shards(docs, "doc_id", "n_tok", out,
                                    ctx=64, packs_per_shard=3, seed=9)
        outs.append(sorted(map(tuple, got.collect())))
    assert outs[0] == outs[1]


def test_nonpositive_ctx_and_shard_size_rejected(spark, tmp_path):
    """ctx=0 used to NULL out `_start div ctx` and silently return an
    empty frame (ADVICE r5) — both knobs now fail fast on the driver."""
    import pytest as _pytest

    from pgdedupe_spark.operators.packing import write_training_shards

    docs = spark.createDataFrame([(1, 5)], "doc_id long, n_tok long")
    for bad in (0, -4):
        with _pytest.raises(ValueError, match="ctx"):
            pack_assignments(docs, "doc_id", "n_tok", ctx=bad)
    with _pytest.raises(ValueError, match="packs_per_shard"):
        write_training_shards(
            docs, "doc_id", "n_tok", str(tmp_path / "s"), ctx=8, packs_per_shard=0
        )


def test_chunk_documents_matches_reference(spark):
    """Per-document chunking vs a pure-python reference over edge-shaped
    docs: shorter than a chunk, exactly one chunk, exact multiple,
    one-past-multiple, overlap regimes, zero tokens."""
    from pgdedupe_spark.operators.packing import chunk_documents

    docs = [(i, n) for i, n in enumerate([0, 1, 7, 8, 9, 16, 17, 100])]
    df = spark.createDataFrame(docs, "doc_id long, n_tok long")

    def ref(n_tok, chunk, overlap):
        """First-principles: emit the first chunk, then keep striding while
        the PREVIOUS chunk did not already reach the end of the document
        (a further chunk would only re-cover overlap)."""
        if n_tok <= 0:
            return []
        stride = chunk - overlap
        out, start = [(0, 0, min(chunk, n_tok))], stride
        while out[-1][1] + chunk < n_tok:
            out.append((len(out), start, min(chunk, n_tok - start)))
            start += stride
        return out

    for chunk, overlap in [(8, 0), (8, 3), (5, 4), (8, 7)]:
        got = {
            (r.doc_id, r.chunk_idx): (r.start_tok, r.n_tok_in_chunk)
            for r in chunk_documents(df, "doc_id", "n_tok", chunk, overlap).collect()
        }
        for doc_id, n_tok in docs:
            want = ref(n_tok, chunk, overlap)
            mine = sorted(
                ((k[1], v) for k, v in got.items() if k[0] == doc_id)
            )
            # coverage invariant: union of intervals == [0, n_tok), no gaps
            covered = 0
            for _, (start, ln) in mine:
                assert start <= covered, (doc_id, chunk, overlap, mine)
                covered = max(covered, start + ln)
            assert covered == n_tok, (doc_id, chunk, overlap, mine)
            # full chunks except possibly the last
            for _, (start, ln) in mine[:-1]:
                assert ln == chunk
            # reference agreement on chunk starts/lengths
            assert [(i, (s, ln)) for i, s, ln in want] == mine, (doc_id, chunk, overlap)


def test_chunk_documents_validation(spark):
    import pytest as _pytest

    from pgdedupe_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tok long")
    with _pytest.raises(ValueError, match="chunk"):
        chunk_documents(df, "doc_id", "n_tok", 0)
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "doc_id", "n_tok", 4, 4)
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "doc_id", "n_tok", 4, -1)


def test_chunk_documents_plan_has_no_shuffle(spark):
    """Per-document chunking is embarrassingly parallel — the executed
    plan must contain no Exchange (a shuffle here would mean the interval
    arithmetic accidentally grew a global dependency)."""
    from pgdedupe_spark.operators.packing import chunk_documents

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 50 + 1).alias("n_tok")
    )
    out = chunk_documents(df, "doc_id", "n_tok", 16, 4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
