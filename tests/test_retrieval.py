"""BM25 + RRF retrieval (operators/retrieval.py): scores pinned against
an independent first-principles reference, plan shape pinned hit-bounded."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from pgdedupe_spark.operators.retrieval import bm25_scores, bm25_topk, rrf_fuse

DOCS = [
    (0, "spark join window merge join"),
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "merge merge merge merge merge merge merge merge"),
    (3, "window functions partition a join into frames"),
    (4, "nothing relevant here at all"),
    (5, "JOIN Window MERGE mixed Case tokens"),
    (6, ""),
]
TERMS = ["join", "window", "merge"]


def _ref_bm25(docs, terms, k1=1.2, b=0.75):
    """Straight-from-the-paper reference: dict-of-dicts, no Spark."""
    toks = {i: re.findall(r"[a-z0-9]+", t.lower()) for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    scores = {}
    for i, v in toks.items():
        s, hits = 0.0, 0
        for t in terms:
            tf = v.count(t)
            if not tf:
                continue
            hits += 1
            idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if hits:
            scores[i] = (s, hits)
    return scores


def test_bm25_matches_first_principles_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc_id: (r.score, r.n_hits)
        for r in bm25_scores(df, "doc_id", "text", TERMS).collect()
    }
    ref = _ref_bm25(DOCS, TERMS)
    assert set(got) == set(ref)
    for i, (s, hits) in ref.items():
        assert got[i][1] == hits, i
        assert abs(got[i][0] - s) < 1e-6, (i, got[i][0], s)


def test_bm25_topk_order_and_ties(spark):
    """Saturation sanity (doc 2's 8x'merge' must NOT dominate doc 0's
    3-term coverage) and the deterministic tie-break."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    top = bm25_topk(df, "doc_id", "text", TERMS, k=3).collect()
    assert [r.rank for r in top] == [1, 2, 3]
    ref = sorted(
        _ref_bm25(DOCS, TERMS).items(), key=lambda kv: (-kv[1][0], kv[0])
    )
    assert [r.doc_id for r in top] == [i for i, _ in ref[:3]]


def test_bm25_exchange_is_hit_bounded(spark):
    """The scale contract: the term filter sits UNDER the first
    aggregate, so what shuffles is matching (doc, term) rows, not the
    corpus vocabulary. Pinned on the executed plan: the string filter
    appears below any Exchange."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = bm25_scores(df, "doc_id", "text", TERMS)._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    # plans print root-first, so "shuffle above, filter below" reads as:
    # the tf branch's Exchange appears BEFORE the IN-filter, which
    # appears BEFORE the Generate(explode) feeding it — the term filter
    # is evaluated between tokenization and the shuffle.
    ex = plan.find("Exchange hashpartitioning(doc_id")
    flt = plan.find("IN (join,window,merge)")
    gen = plan.find("Generate explode")
    assert -1 not in (ex, flt, gen), plan
    assert ex < flt < gen, plan


def test_rrf_fuse_matches_reference_and_rewards_consensus(spark):
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "id long, rank int")
    b = spark.createDataFrame([(3, 1), (1, 2), (9, 3)], "id long, rank int")
    out = {r.id: (r.rrf_score, r.n_sources, r.rank)
           for r in rrf_fuse([a, b], "id", k=60).collect()}
    ref = {
        1: 1 / 61 + 1 / 62,
        3: 1 / 63 + 1 / 61,
        2: 1 / 62,
        9: 1 / 63,
    }
    assert set(out) == set(ref)
    for i, s in ref.items():
        assert abs(out[i][0] - s) < 1e-9, i
    # consensus docs (in both lists) outrank single-list docs here
    assert out[1][2] == 1 and out[3][2] == 2
    assert out[1][1] == 2 and out[2][1] == 1


def test_rrf_topk_and_empty_list_safe(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], "id long, rank int")
    empty = a.filter(F.lit(False))
    out = rrf_fuse([a, empty], "id", topk=1).collect()
    assert len(out) == 1 and out[0].id == 1


def test_hybrid_rrf_over_ivf_scale_tier(spark, sf_dir):
    """The hybrid pair at the SCALE tier: swap the brute-force dense
    ranker for the IVF approximate one (similarity.ivf_cosine_topk) and
    pin that the fused top-10 stays ≥0.8 overlapped with the brute
    hybrid — the fusion layer is ranker-agnostic, so hybrid quality
    degrades no faster than the ANN tier's own recall (0.96 pinned in
    test_recall.py)."""
    from pyspark.sql import functions as F

    from pgdedupe_spark.operators.retrieval import bm25_topk, rrf_fuse
    from pgdedupe_spark.operators.similarity import cosine_topk, ivf_cosine_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sparse = bm25_topk(docs, "doc_id", "text", ["join", "window", "merge"], k=20)

    def fused(dense):
        d = dense.select(F.col("neighbor_id").alias("doc_id"), "rank")
        return rrf_fuse([sparse.select("doc_id", "rank"), d], "doc_id", topk=10)

    brute = fused(cosine_topk(emb, "vec_id", "embedding", k=20, query_filter="vec_id = 0"))
    ivf = fused(
        ivf_cosine_topk(
            emb, "vec_id", "embedding", k=20,
            n_centroids=16, n_probe=12, query_filter="vec_id = 0",
        )
    )
    b = [r.doc_id for r in brute.collect()]
    a = [r.doc_id for r in ivf.collect()]
    assert len(b) == len(a) == 10
    assert len(set(b) & set(a)) >= 8, (b, a)


def test_bm25_batch_equals_per_query_runs(spark):
    """One corpus pass for N queries must equal N single-query runs —
    including df(term) being corpus-global (shared across queries), and
    the per-query window keyed so ranks never leak across queries."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    from pgdedupe_spark.operators.retrieval import bm25_topk_batch

    qsets = {100: ["join", "window"], 200: ["merge"], 300: ["zzz_absent"]}
    qdf = spark.createDataFrame(
        [(qid, t) for qid, ts in qsets.items() for t in ts],
        "query_id long, term string",
    )
    batch = {}
    for r in bm25_topk_batch(df, "doc_id", "text", qdf, k=5).collect():
        batch.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score, r.n_hits))
    assert set(batch) == {100, 200}  # no-hit query yields no rows
    for qid, terms in list(qsets.items())[:2]:
        single = [
            (r.rank, r.doc_id, r.score, r.n_hits)
            for r in bm25_topk(df, "doc_id", "text", terms, k=5).collect()
        ]
        assert sorted(batch[qid]) == sorted(single), qid


def test_rag_chunk_then_retrieve_composition(spark):
    """End-to-end RAG retrieval path: chunk_documents assigns per-doc
    token windows → chunk text materializes as a pure slice over
    word_tokens (no Python) → BM25 over CHUNKS finds the planted
    passage, not just the document — the chunk-granularity retrieval a
    RAG serving stack actually runs."""
    from pyspark.sql import functions as F

    from pgdedupe_spark.operators.dedup import word_tokens
    from pgdedupe_spark.operators.packing import chunk_documents
    from pgdedupe_spark.operators.retrieval import bm25_topk

    filler = " ".join(f"filler{i}" for i in range(40))
    planted = "spark join window merge retrieval target passage"
    docs = spark.createDataFrame(
        [(0, f"{filler} {planted} {filler}"),   # needle mid-document
         (1, f"{filler} {filler}")],
        "doc_id long, text string",
    )
    toks = docs.select(
        "doc_id", word_tokens(F.col("text")).alias("_toks")
    ).withColumn("n_tokens", F.size("_toks"))
    chunks = chunk_documents(toks, "doc_id", "n_tokens", chunk=16, overlap=4)
    chunk_docs = (
        chunks.join(toks, "doc_id")
        .select(
            (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("chunk_id"),
            "doc_id",
            "chunk_idx",
            F.array_join(
                F.slice(F.col("_toks"), F.col("start_tok") + 1, F.col("n_tok_in_chunk")),
                " ",
            ).alias("text"),
        )
    )
    top = bm25_topk(
        chunk_docs, "chunk_id", "text", ["retrieval", "target", "passage"], k=3
    ).collect()
    assert top, "planted passage not found"
    # the winning chunk lives in doc 0 and actually contains the needle
    best = top[0]
    assert best.chunk_id // 1000 == 0
    row = chunk_docs.filter(F.col("chunk_id") == best.chunk_id).first()
    assert "target" in row.text and "passage" in row.text
    # doc 1 (no needle) contributes no scored chunk
    assert all(r.chunk_id // 1000 == 0 for r in top)


def test_bm25_topk_plans_as_take_ordered(spark):
    """A common query term must not funnel its whole matching set into a
    single-partition window: the global top-k plans as
    TakeOrderedAndProject (per-partition top-k + driver merge)."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        bm25_topk(df, "doc_id", "text", TERMS, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
