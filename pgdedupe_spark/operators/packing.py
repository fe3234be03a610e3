"""Sequence packing / token-budget selection (LLM training-data prep).

Concat-then-chunk packing — the GPT-style recipe: concatenate documents in
a deterministic order and slice the token stream into fixed ``ctx``-length
blocks — is a *prefix-sum* problem. Each document occupies the global token
interval ``[cum_before, cum_before + n_tok)``; the packs it overlaps are
``start div ctx .. (end-1) div ctx``, and its contribution to each pack is
pure interval arithmetic. Token-budget selection (take the best documents
until a budget is filled, DoReMi/quality-sampling style) reads the same
prefix sum against a threshold.

Scale design (100 TB): a prefix sum over the whole corpus cannot use a
single global window (one partition would sort everything — Spark even
warns ``WindowExec: No Partition Defined``). :func:`prefix_sum` mirrors
``add_deterministic_id`` (operators/ids.py): range-partition on the order
key, cumulative-sum *within* partitions (parallel windows), then offset
each partition by the broadcast cumulative totals of earlier partitions —
two narrow passes, no global sort. The result is independent of where the
range boundaries land because the order key is required to be unique.

The reference has no packing analog (it stops at entity resolution); this
module is part of the training-data extension family alongside
operators/dedup.py and operators/curation.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def prefix_sum(
    df: DataFrame,
    order_exprs: list[Column],
    value_col: str,
    out_col: str = "cum_before",
    num_partitions: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Exclusive running sum of ``value_col`` in ``order_exprs`` order,
    without a single-partition sort.

    1. ``repartitionByRange`` on the order key → non-overlapping ranges.
    2. Within-partition exclusive cumulative sum (window partitioned by
       partition id — parallel, no global sort).
    3. Offset each partition by the total of earlier partitions; the
       per-partition totals frame is one row per partition and is joined
       back via broadcast.

    ``order_exprs`` must define a total order (include a unique key as the
    last expression) — otherwise ties could swap rows between runs. With a
    total order, the output does not depend on where the sampled range
    boundaries fall. ``materialize`` localCheckpoints the input first:
    ``repartitionByRange`` samples its input to pick bounds, so a
    non-trivial upstream would otherwise execute twice (same rationale as
    ``add_deterministic_id``, operators/ids.py:49).

    The ranged frame itself is ALWAYS materialized before ``_pid`` is
    consumed: ``spark_partition_id()`` is a physical-placement function,
    and the totals branch and the window branch would otherwise evaluate
    it independently — AQE is free to coalesce each branch's shuffle read
    differently, giving the two branches DISAGREEING ``_pid`` values and
    silently misaligned offsets (observed at 2M rows). One executor-side
    materialization freezes the assignment; swap for ``checkpoint(dir)``
    on clusters with lossy executors.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    if materialize:
        df = df.localCheckpoint(eager=True)
    ranged = (
        df.repartitionByRange(num_partitions, *order_exprs)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = ranged.groupBy("_pid").agg(F.sum(value_col).alias("_ptotal"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_offset", F.coalesce(F.sum("_ptotal").over(w_off), F.lit(0)).cast("long")
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ranged.join(F.broadcast(offsets.select("_pid", "_offset")), "_pid")
        .withColumn(
            out_col,
            (
                F.col("_offset")
                + F.coalesce(F.sum(value_col).over(w_local), F.lit(0))
            ).cast("long"),
        )
        .drop("_pid", "_offset")
    )


def pack_assignments(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    ctx: int,
    order_exprs: list[Column] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Concat-then-chunk packing map: one row per (document, pack) overlap.

    Documents are concatenated in ``order_exprs`` order (default: by
    ``id_col``) and the token stream is cut into ``ctx``-sized packs.
    Output columns:

    * ``pack_id``    — which pack this slice lands in (0-based),
    * ``doc_off``    — offset of the slice within the document,
    * ``pack_off``   — offset of the slice within the pack,
    * ``n_tok_in_pack`` — slice length.

    Invariants (pinned in tests/test_packing.py): every pack except the
    last holds exactly ``ctx`` tokens; per-document slice lengths sum to
    the document's token count; zero-token documents contribute nothing.

    All arithmetic is integer (``div``, not floating division) so the map
    is exact at any corpus size. Output size is Σ ceil(n_tok/ctx) + (#docs
    that straddle a boundary) ≈ input size — the explode is bounded.
    """
    if ctx <= 0:
        # ctx=0 would make `_start div ctx` NULL and the explode silently
        # drop every row — an empty frame masquerading as success
        raise ValueError(f"ctx must be a positive pack length, got {ctx}")
    if order_exprs is None:
        order_exprs = [F.col(id_col).asc_nulls_first()]
    base = df.filter(F.col(n_tokens_col) > F.lit(0))
    c = prefix_sum(base, order_exprs, n_tokens_col, "_start", num_partitions)
    start = F.col("_start")
    end = start + F.col(n_tokens_col)
    ctx_l = F.lit(ctx).cast("long")
    first_pack = F.expr(f"_start div {ctx}")
    last_pack = F.expr(f"(_start + {n_tokens_col} - 1) div {ctx}")
    pack_lo = F.col("pack_id") * ctx_l  # pack's global token interval start
    slice_lo = F.greatest(start, pack_lo)
    slice_hi = F.least(end, pack_lo + ctx_l)
    return (
        c.withColumn("pack_id", F.explode(F.sequence(first_pack, last_pack)))
        .select(
            F.col(id_col),
            F.col("pack_id").cast("long").alias("pack_id"),
            (slice_lo - start).cast("long").alias("doc_off"),
            (slice_lo - pack_lo).cast("long").alias("pack_off"),
            (slice_hi - slice_lo).cast("long").alias("n_tok_in_pack"),
        )
    )


def token_budget_select(
    df: DataFrame,
    n_tokens_col: str,
    budget: int,
    order_exprs: list[Column],
    num_partitions: int | None = None,
) -> DataFrame:
    """Select documents in priority order until ``budget`` tokens are
    taken; the document that crosses the budget line is truncated.

    Adds ``cum_before`` (tokens taken by higher-priority documents),
    ``take_tokens`` (this document's contribution, clipped to the
    remaining budget) and ``truncated``. At scale the post-filter
    ``cum_before < budget`` prunes everything past the boundary partition
    — the prefix sum itself is the only full pass.
    """
    c = prefix_sum(df, order_exprs, n_tokens_col, "cum_before", num_partitions)
    remaining = F.lit(budget).cast("long") - F.col("cum_before")
    return (
        c.filter(F.col("cum_before") < F.lit(budget))
        .withColumn("take_tokens", F.least(F.col(n_tokens_col).cast("long"), remaining))
        .withColumn("truncated", F.col(n_tokens_col) > remaining)
    )


def write_training_shards(
    docs: DataFrame,
    id_col: str,
    n_tokens_col: str,
    out_path: str,
    ctx: int,
    packs_per_shard: int,
    seed: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """The composed training-shard layout: epoch-shuffle the corpus
    (seeded xxhash64 order — curation.corpus_shuffle_order), cut the
    concatenated token stream into ``ctx``-length packs via the
    distributed prefix sum, group packs into shards, and write the
    (doc, pack) slice map partitioned by ``shard=``.

    A trainer reading shard s gets exactly the documents+offsets needed
    to assemble its packs (partition pruning on ``shard=``); a new
    ``seed`` re-deals the whole corpus into a fresh epoch. Returns the
    written frame (one row per doc×pack slice). Shard sizes are exact:
    every shard holds ``packs_per_shard·ctx`` tokens except the last."""
    from pgdedupe_spark.operators.curation import corpus_shuffle_order

    if packs_per_shard <= 0:
        raise ValueError(f"packs_per_shard must be positive, got {packs_per_shard}")
    order = [corpus_shuffle_order(docs, id_col, seed), F.col(id_col).asc()]
    slices = pack_assignments(
        docs, id_col, n_tokens_col, ctx, order_exprs=order,
        num_partitions=num_partitions,
    ).withColumn("shard", F.expr(f"pack_id div {int(packs_per_shard)}"))
    (
        slices.repartition("shard")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(out_path)
    )
    return docs.sparkSession.read.parquet(out_path)


def chunk_documents(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    chunk: int,
    overlap: int = 0,
) -> DataFrame:
    """Per-document fixed-size chunking with overlap — the RAG/serving
    sibling of :func:`pack_assignments` (which chunks the *concatenated*
    corpus stream; this chunks each document independently, so no prefix
    sum and no cross-document coupling).

    One output row per chunk: ``chunk_idx`` (0-based), ``start_tok``
    (offset within the document), ``n_tok_in_chunk``. Chunks start at
    ``0, chunk-overlap, 2·(chunk-overlap), …`` while the start still
    exposes ≥1 token the previous chunk didn't cover (``start <
    n_tok - overlap``, plus chunk 0 for any non-empty doc); the last
    chunk truncates at the document end.

    Invariants (pinned in tests/test_packing.py):
    * zero-token documents contribute nothing;
    * chunk coverage: union of [start, start+len) intervals == [0, n_tok)
      (no gaps — consecutive starts differ by chunk-overlap < chunk);
    * every chunk except possibly the last has length ``chunk`` iff
      n_tok >= chunk.

    Scale shape: pure per-row interval arithmetic + one bounded explode
    (fan-out ≈ n_tok/(chunk-overlap) per doc) — embarrassingly parallel,
    no shuffle, no Python."""
    if chunk <= 0:
        raise ValueError(f"chunk must be positive, got {chunk}")
    if overlap < 0 or overlap >= chunk:
        raise ValueError(f"overlap must satisfy 0 <= overlap < chunk, got {overlap}")
    stride = chunk - overlap
    n_tok = F.col(n_tokens_col).cast("long")
    # last start index: largest k with k*stride < n_tok - overlap, and k>=0
    # (integer `div`, same discipline as pack_assignments — float division
    # would round at 2^53-scale token counts)
    last_k = F.greatest(
        F.lit(0).cast("long"),
        F.expr(f"(CAST(`{n_tokens_col}` AS BIGINT) - {int(overlap)} - 1) div {int(stride)}"),
    )
    base = df.filter(n_tok > 0)
    start = F.col("chunk_idx") * stride
    return (
        base.withColumn("chunk_idx", F.explode(F.sequence(F.lit(0).cast("long"), last_k)))
        .select(
            F.col(id_col),
            F.col("chunk_idx"),
            start.cast("long").alias("start_tok"),
            F.least(F.lit(chunk).cast("long"), n_tok - start).alias("n_tok_in_chunk"),
        )
    )
