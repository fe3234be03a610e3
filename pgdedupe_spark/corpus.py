"""Deterministic synthetic corpora for exercising dedup operators on
NON-degenerate vocabularies.

The driver's `documents` table is vocabulary-degenerate (≈2k distinct
5-gram shingles at sf0.1), which makes every candidate filter in
`ngram_jaccard_pairs` prune ~nothing and only ever exercises the bitmap
verify regime. Real corpora are Zipfian: a handful of hot tokens plus a
huge rare tail — that is the regime the AllPairs/PPJoin prefix filter is
built for, and the one the 100 TB path (sorted-int-array verify) runs in.

`zipf_corpus` builds such a corpus entirely JVM-side (xxhash64-seeded,
no Python in the row path, deterministic for a given seed):

* token ranks are log-uniform (P(rank ∈ [a,b]) ∝ ln b − ln a), the
  continuous analog of Zipf rank-frequency — a few very hot tokens, a
  long rare tail;
* every `dup_every`-th document is a near-duplicate of its predecessor
  with `mutate_pct`% of token positions re-drawn, planting known
  high-Jaccard pairs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_M = 1_000_003  # prime modulus for hash → uniform(0,1)


def zipf_corpus(
    spark: SparkSession,
    n_docs: int = 2000,
    doc_len: int = 60,
    vocab: int = 200_000,
    dup_every: int = 10,
    mutate_pct: int = 10,
    seed: int = 7,
) -> DataFrame:
    """(doc_id: long, text: string) with Zipfian token frequencies and a
    planted near-duplicate pair (doc_id-1, doc_id) for every doc_id with
    doc_id % dup_every == 1."""
    ln_v = math.log(float(vocab))
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    is_dup = (F.col("doc_id") % dup_every == 1) & (F.col("doc_id") > 0)
    src = F.when(is_dup, F.col("doc_id") - 1).otherwise(F.col("doc_id"))

    def token(pos):
        # a mutated position re-draws from the doc's OWN id-space; everything
        # else draws from the source doc so near-dups share ~(100-mutate_pct)%
        mutated = is_dup & (F.pmod(F.xxhash64(F.lit(seed + 1), F.col("doc_id"), pos), F.lit(100)) < mutate_pct)
        h = F.when(mutated, F.xxhash64(F.lit(seed + 2), F.col("doc_id"), pos)).otherwise(
            F.xxhash64(F.lit(seed), src, pos)
        )
        u = (F.pmod(h, F.lit(_M)) + F.lit(0.5)) / F.lit(float(_M))
        rank = F.greatest(
            F.lit(1).cast("long"),
            F.least(F.lit(vocab).cast("long"), F.floor(F.exp(u * F.lit(ln_v)))),
        )
        return F.concat(F.lit("t"), rank.cast("string"))

    return base.select(
        "doc_id",
        F.array_join(F.transform(F.sequence(F.lit(1), F.lit(doc_len)), token), " ").alias("text"),
    )


def hash_embeddings(
    spark: SparkSession,
    n_vecs: int = 50_000,
    dim: int = 64,
    cluster_every: int = 10,
    jitter_pct: int = 5,
    seed: int = 11,
) -> DataFrame:
    """(vec_id: long, embedding: array<float>) — deterministic pseudo-random
    embeddings built entirely JVM-side (xxhash64 → uniform[-1,1] per
    component, no RNG, no Python in the row path), sized for ANN stress
    runs beyond the driver's 5k-vector table.

    Every ``cluster_every``-th vector is a planted near-duplicate of its
    predecessor with ``jitter_pct``% of components re-drawn (cosine ≈0.95
    at 5%), so stress benchmarks have TRUE neighbors to find — on pure
    uniform noise every "neighbor" is an artifact and recall is
    meaningless."""
    base = spark.range(n_vecs).select(F.col("id").alias("vec_id"))
    is_dup = (F.col("vec_id") % cluster_every == 1) & (F.col("vec_id") > 0)
    src = F.when(is_dup, F.col("vec_id") - 1).otherwise(F.col("vec_id"))

    def component(d):
        jittered = is_dup & (
            F.pmod(F.xxhash64(F.lit(seed + 1), F.col("vec_id"), d), F.lit(100))
            < jitter_pct
        )
        h = F.when(
            jittered, F.xxhash64(F.lit(seed + 2), F.col("vec_id"), d)
        ).otherwise(F.xxhash64(F.lit(seed), src, d))
        u = (F.pmod(h, F.lit(_M)) + F.lit(0.5)) / F.lit(float(_M))
        return (u * 2.0 - 1.0).cast("float")

    return base.select(
        "vec_id",
        F.array(*[component(F.lit(d)) for d in range(dim)]).alias("embedding"),
    )


def clustered_embeddings(
    spark: SparkSession,
    n_vecs: int = 5000,
    dim: int = 64,
    n_hot: int = 8,
    hot_pct: int = 80,
    spread_pct: int = 25,
    cluster_every: int = 10,
    jitter_pct: int = 5,
    seed: int = 23,
) -> DataFrame:
    """(vec_id, embedding) — the ADVERSARIAL distribution for bucketed ANN
    indexes: ``hot_pct``% of vectors concentrate in ``n_hot`` tight
    clusters (vector = cluster center + ``spread_pct``% jitter; within-
    cluster cosine ≈ 0.95 at the default) and the rest are uniform
    background, with the same planted near-duplicate twins as
    :func:`hash_embeddings` (every ``cluster_every``-th vector copies its
    predecessor, twins always share cluster membership).

    This is where LSH/IVF/PQ actually fail at 100 TB: a near-uniform
    corpus spreads evenly over buckets/cells, while real embedding
    corpora are mixture-shaped — hot cells hold many× the mean, bucket
    joins straggle, and coarse quantizers trained on uniform assumptions
    collapse recall. Built entirely JVM-side, deterministic for a given
    seed (xxhash64, no RNG, no Python in the row path)."""
    base = spark.range(n_vecs).select(F.col("id").alias("vec_id"))
    is_dup = (F.col("vec_id") % cluster_every == 1) & (F.col("vec_id") > 0)
    src = F.when(is_dup, F.col("vec_id") - 1).otherwise(F.col("vec_id"))
    is_hot = F.pmod(F.xxhash64(F.lit(seed + 3), src), F.lit(100)) < hot_pct
    cl = F.pmod(F.xxhash64(F.lit(seed + 4), src), F.lit(n_hot))

    def _unif(h):
        return (F.pmod(h, F.lit(_M)) + F.lit(0.5)) / F.lit(float(_M)) * 2.0 - 1.0

    def component(d):
        jittered = is_dup & (
            F.pmod(F.xxhash64(F.lit(seed + 1), F.col("vec_id"), d), F.lit(100))
            < jitter_pct
        )
        center = _unif(F.xxhash64(F.lit(seed + 5), cl, d))
        noise = _unif(F.xxhash64(F.lit(seed), src, d))
        clustered = center + noise * F.lit(spread_pct / 100.0)
        body = F.when(is_hot, clustered).otherwise(noise)
        redraw = _unif(F.xxhash64(F.lit(seed + 2), F.col("vec_id"), d))
        return F.when(jittered, redraw).otherwise(body).cast("float")

    return base.select(
        "vec_id",
        F.array(*[component(F.lit(d)) for d in range(dim)]).alias("embedding"),
    )
