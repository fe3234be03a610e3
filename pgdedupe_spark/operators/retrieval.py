"""Sparse + hybrid retrieval: BM25 scoring/top-k and reciprocal-rank
fusion (RRF) of heterogeneous rankings.

Extends the reference's matching pipeline (dssg/pgdedupe is record
linkage, not retrieval) with the query side of a RAG data stack: the
corpus the dedup/curation operators produce is ultimately SERVED, and
BM25-over-tokens + RRF-with-ANN is the standard first-stage retrieval
pair (Robertson/Spärck Jones BM25; Cormack et al. RRF). The dense
counterpart lives in operators/similarity.py (brute/LSH/IVF/PQ top-k);
`rrf_fuse` is the join point.

Scale design (100 TB):
* bm25 — one corpus tokenization scan; the per-term explode is filtered
  to the QUERY's terms before anything shuffles, so the exchange carries
  only matching (doc, term) rows — bounded by corpus hits, never corpus
  tokens. Corpus stats (N, avgdl) are a 1-row aggregate and the per-term
  document frequencies are ≤|terms| rows: both broadcast. No Python.
* rrf_fuse — a union of already-small ranked lists + one hash agg keyed
  by doc; cost is O(Σ list lengths), independent of corpus size.

Determinism contract (registry rows text_bm25_topk / hybrid_search_rrf
hash-match full DuckDB oracles): every per-row double that crosses an
aggregation is rounded through DECIMAL first (registry conventions), the
BM25 formula is written textually identically in both engines, and all
rank assignments tie-break on the id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pgdedupe_spark.operators.dedup import word_tokens



def _bm25_contrib(k1: float, b: float):
    """The per-(doc, term) BM25 contribution over the internal columns
    (_n, _sumdl, _df, _tf, _dl) — ONE definition, used by both the
    single-query and batch paths, and textually mirrored in the registry
    oracles (keep in sync)."""
    return F.expr(
        f"""
        ln(1.0 + (CAST(_n AS DOUBLE) - CAST(_df AS DOUBLE) + 0.5)
                 / (CAST(_df AS DOUBLE) + 0.5))
        * ((CAST(_tf AS DOUBLE) * ({k1} + 1.0))
           / (CAST(_tf AS DOUBLE)
              + {k1} * (1.0 - {b} + {b} * CAST(_dl AS DOUBLE)
                                    * CAST(_n AS DOUBLE)
                                    / CAST(_sumdl AS DOUBLE))))
        """
    )


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 scores of every document that matches ≥1 query term:
    (id, score DOUBLE, n_hits). idf = ln(1 + (N - df + 0.5)/(df + 0.5))
    (the non-negative Lucene form); tf saturation with k1/b length
    normalization against the corpus mean length over word_tokens."""
    toks = docs.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("_toks")
    ).withColumn("_dl", F.size("_toks"))
    stats = toks.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_dl").alias("_sumdl")
    )
    tf = (
        toks.select(F.col(id_col), "_dl", F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(list(terms)))
        .groupBy(id_col, "_dl", "term")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    j = tf.join(F.broadcast(df_t), "term").crossJoin(F.broadcast(stats))
    contrib = _bm25_contrib(k1, b)
    return (
        j.select(F.col(id_col), contrib.cast("decimal(18,8)").alias("_c"))
        .groupBy(id_col)
        .agg(
            F.sum("_c").cast("double").alias("score"),
            F.count(F.lit(1)).alias("n_hits"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 matches with a deterministic total order (score desc,
    id asc): (id, score, n_hits, rank). orderBy+limit plans as
    TakeOrderedAndProject (per-partition top-k, merged on the driver) so
    a COMMON query term never funnels its whole matching set through a
    single-partition window; the rank window then runs over k rows."""
    order = [F.col("score").desc(), F.col(id_col)]
    top = bm25_scores(docs, id_col, text_col, terms, k1, b).orderBy(*order).limit(k)
    return top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str,
    rank_col: str = "rank",
    k: int = 60,
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked lists (each (id, rank), rank
    1-based): rrf_score = Σ_lists 1/(k + rank), plus n_sources — the
    standard scoreless combiner for BM25 ⊕ ANN hybrid search. Each
    addend is an exact rational of small ints rounded through
    DECIMAL(18,12) so the fused order is engine-reproducible; final
    rank tie-breaks (score desc, n_sources desc, id asc)."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    tagged = [
        r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(k) + F.col(rank_col).cast("double")))
            .cast("decimal(18,12)")
            .alias("_rr"),
        )
        for r in rankings
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    fused = u.groupBy(id_col).agg(
        F.sum("_rr").cast("double").alias("rrf_score"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    w = Window.orderBy(
        F.col("rrf_score").desc(), F.col("n_sources").desc(), F.col(id_col)
    )
    out = fused.withColumn("rank", F.row_number().over(w))
    if topk is not None:
        out = out.filter(F.col("rank") <= topk)
    return out


def bm25_topk_batch(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    queries: DataFrame,
    query_id_col: str = "query_id",
    term_col: str = "term",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Serve MANY queries in one corpus pass: ``queries`` is the long
    (query_id, term) frame; output is per-query BM25 top-k
    (query_id, id, score, n_hits, rank).

    Same hit-bounded plan as bm25_scores with the query set joined in
    place of the IN-filter: the corpus token explode semi-joins the
    DISTINCT term vocabulary of all queries (broadcast — query sets are
    tiny next to a corpus), so one tokenization scan serves the whole
    batch and the exchange still carries only matching (doc, term) rows.
    df(term) stays per-TERM (shared across queries); the per-query
    expansion happens after the tf aggregate, bounded by hits × queries-
    containing-the-term. Top-k is one window keyed by query."""
    toks = docs.select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("_toks")
    ).withColumn("_dl", F.size("_toks"))
    stats = toks.agg(F.count(F.lit(1)).alias("_n"), F.sum("_dl").alias("_sumdl"))
    q = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(term_col).alias("term")
    ).distinct()
    vocab = q.select("term").distinct()
    tf = (
        toks.select(F.col(id_col), "_dl", F.explode("_toks").alias("term"))
        .join(F.broadcast(vocab), "term", "left_semi")
        .groupBy(id_col, "_dl", "term")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    j = (
        tf.join(F.broadcast(df_t), "term")
        .join(F.broadcast(q), "term")
        .crossJoin(F.broadcast(stats))
    )
    contrib = _bm25_contrib(k1, b)
    scored = (
        j.select(
            F.col("_qid").alias(query_id_col),
            F.col(id_col),
            contrib.cast("decimal(18,8)").alias("_c"),
        )
        .groupBy(query_id_col, id_col)
        .agg(
            F.sum("_c").cast("double").alias("score"),
            F.count(F.lit(1)).alias("n_hits"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
