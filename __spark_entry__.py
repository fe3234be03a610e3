"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``pgdedupe_spark/``; the query/oracle registry in
``pgdedupe_spark/registry.py``. Every computed column is aliased identically
in the Spark code and the oracle SQL (driver compares columns by name).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pgdedupe_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the pipeline's stage-1
    exact-duplicate collapse (SURVEY.md §2 A1+P2+W1) over `documents`."""
    return registry.QUERIES["a1_exact_collapse"](spark, "/root/testdata/sf0.001")


# The driver checks exactly the first 50 queries per round, so the dict
# below is PRIORITY-ordered and rotated each round (bookkeeping pinned by
# tests/test_entry_contract.py). Round 13 executes the wholesale
# tail↔priority swap the r12 _TAIL header staged: _PRIORITY below is the
# r11 window (all 50 green full-hash in CORRECTNESS_r11) plus the four
# r12-born rows that displaced saturated/subsumed siblings inside it; the
# r12 window moves to _TAIL unchanged (all 50 green full-hash in
# CORRECTNESS_r12, and re-verified green at sf0.01 this round alongside
# the whole set — 332/332 oracle tests). No r13-born driver-eligible
# query exists (streaming_dedup_probe is bench-only), so the swap is a
# pure exchange. The two lists partition the 100 driver-eligible queries
# in alternating rounds — keep it that way (new queries must displace
# into the other half, demote a saturated row to registry.PYTEST_ONLY,
# or be bench/pytest-only), or the "no query >2 rounds without a driver
# row" promise breaks.
_PRIORITY = [
    # -- the r11 window (r13 rotation; was _TAIL through r12) --
    "text_quality_model",  # learned LR quality filter, pinned weights (full hash)
    "hybrid_search_rrf",  # BM25+dense reciprocal-rank fusion (full hash)
    "pipeline_corpus_curation",  # composed curation pipeline (full hash)
    "dedup_incremental_exact",  # Bloom-screened incremental dedup (full hash)
    "pipeline_llm_prep",  # Gopher gate → dedup → DSIR selection (full hash)
    "er_record_linkage",  # two-dataset RecordLink, symmetric best match (full hash)
    "text_gopher_rules",  # MassiveText §A1.1 heuristic gate (full hash)
    "curation_dsir_sample",  # DSIR Gumbel-top-k selection (full hash)
    "curation_c4_clean",  # C4 line-level cleaning (full hash)
    "text_gopher_full",  # complete table-A1 filter: A1.1 AND A1.2 (full hash)
    "ann_knn_join",  # two-table kNN join, pinned centroids (full hash)
    "corpus_leakage_safe_split",  # near-dup-cluster split (full hash, r11 promote)
    # -- r9 window rotated back in --
    "dedup_simhash_portable",  # md5-hash twin: simhash under full hash oracle
    "er_golden_record",  # survivorship golden record
    "er_blocking_metrics",  # blocking quality scorecard
    "ml_kmeans_exact",  # exact-integer Lloyd's k-means
    "ml_contrastive_negatives",  # deterministic negative sampling
    "q_ranking_windows",  # NTILE/PERCENT_RANK/CUME_DIST/LAG suite
    "events_attribution_outer",  # stream-stream LEFT OUTER batch twin (r6)
    "q21_waiting_supplier",  # EXISTS+NOT-EXISTS self-joins, <> residuals
    "q20_part_promotion",  # nested-IN w/ correlated agg, decorrelated
    "q12_shipmode_priority",  # fact-fact non-equi residual, one-pass counts
    "a1_exact_collapse",
    "pipeline_entity_map",
    "d5_learned_rules",
    "ann_lsh_serve",
    "ann_ivf_serve",
    "events_user_state",
    "q3_shipping_priority",
    "q10_returned_items",
    "q18_large_orders",
    "q17_small_qty_revenue",
    "j10_merge_upsert",
    "j11_cdc_apply",
    "stats_analyze",
    "w3_rolling",
    "events_retention",
    "events_gapfill",
    "ann_pq_topk",  # full hash since r10 (pinned-integer PQ oracle)
    "decontaminate_ngrams",
    "text_gopher_repetition",  # full A1.2 battery; subsumes repetition_signals
    "dedup_near_clusters",
    "text_duplicated_spans",
    "skew_salted_agg",
    "skew_salted_join",
    "dedup_ngram_jaccard",
    # r12-born: persisted-index serve path for the compressed kNN join
    # (bit-identical twin of ann_pq_knn_join under the shared pinned
    # layout) — takes the slot of ann_lsh_topk, whose hash check is
    # strictly subsumed by ann_lsh_serve's identical-result oracle
    # (both rode this window; the serve row stays)
    "ann_pq_knn_serve",
    # r12-born: gazetteer-mode linkage (dedupe's third mode — one-way
    # match of a new batch against the persisted canonical set) — takes
    # the slot of ann_ivf_topk, whose hash check is strictly subsumed by
    # ann_ivf_serve's identical-result oracle (both rode this window;
    # the serve row stays)
    "er_gazetteer_match",
    "j6_update_join",
    "g1_connected_components",
]
_TAIL = [
    # the r12 window (becomes the r14 _PRIORITY on the next wholesale
    # swap; any future-born full-hash composite should join it then,
    # displacing a saturated simple row, per the ≤2-round promise)
    "text_language_id_learned",  # pinned-integer NB language id (full hash)
    "ann_pq_knn_join",  # compressed IVFADC two-table kNN join (full hash)
    "corpus_budget_epochs",  # token-budget epoch water-fill (full hash)
    # -- r10 window --
    "er_completeness",  # notebook cells 26-31 completeness analytics
    "q2_min_balance_supplier",  # correlated-min supplier match
    "q6_forecast_revenue",  # single-table selective agg
    "q9_product_profit",  # 6-way profit snowflake
    "q11_heavy_parts",  # HAVING vs scalar-subquery threshold
    "q14_promo_share",  # conditional-agg ratio
    "dedup_minhash_portable",  # md5-hash twin: dedup core under full hash oracle
    "q15_top_supplier",  # argmax-vs-derived-max
    "q8_market_share",  # 7-join snowflake, nation in two roles
    "q_grouping_sets",  # explicit GROUPING SETS + GROUPING() id
    "graph_pagerank",  # iterative op under an exact-integer hash oracle
    "j14_snapshot_diff",  # full-outer reconciliation, IS DISTINCT FROM
    "events_rolling_anomaly",  # window percentiles + robust z
    "ann_pq_serve",  # full hash since r9 (pinned-integer IVFADC layout)
    "multimodal_audio_native",  # full hash since r9 (pinned-VALUES oracle)
    "pack_sequences",
    "corpus_token_budget",
    "q13_customer_distribution",
    "q7_nation_flow",
    "q16_supplier_variety",
    "q19_disjunctive_revenue",
    "q22_idle_customers",
    "dedup_incremental",
    "q1_pricing_summary",
    "q5_regional_revenue",
    "dedup_canonical_pick",
    "w2_window_suite",
    "dedup_exact_norm",
    "d6_rare_token_blocks",
    "d4_pair_scores",
    "d3_uncertain_pairs",
    "j1_plural_block",
    "j2_smaller_coverage",
    "j7_candidate_pairs",
    "j5_exact_edges",
    "w1_serial_ids",
    "ann_cosine_topk",
    "events_funnel",
    "dedup_embedding_cosine",
    "embedding_label_centroids",
    "events_sessionize",
    "events_json_props",
    "events_asof_join",
    "events_approx_distinct",
    "events_range_join",
    "events_hourly_rollup",
    "events_user_seq",
]


# synthetic-input benchmark queries: no parquet table input and/or not
# DuckDB-reproducible (xxhash64-seeded corpus) — benched + pytest-pinned,
# not part of the driver's oracle contract
_BENCH_ONLY = {
    "bpe_encode_probe",
    "unigram_encode_probe",
    "dedup_ngram_zipf",
    "ann_lsh_stress",
    "merge_scale_probe",
    "pack_scale_probe",
    "cc_scale_probe",
    "ann_pq_stress",
    "pagerank_scale_probe",
    "pairs_skew_probe",
    "tpch_sf1_probe",
    "pipeline_scale_probe",
    "curation_scale_probe",
    "dedup_scale_probe",
    "llm_prep_scale_probe",
    "multimodal_scale_probe",
    # r13: streaming-tier probe — the streaming machinery (availableNow
    # micro-batches, stateful foreachBatch) is not DuckDB-reproducible;
    # correctness rides in-band (stream≡batch self-check columns) and is
    # pytest-pinned (tests/test_streaming.py), like every other probe
    "streaming_dedup_probe",
}


def _ordered_names() -> list[str]:
    skip = _BENCH_ONLY | registry.PYTEST_ONLY
    names = [n for n in registry.QUERIES if n not in skip]
    order = [n for n in _PRIORITY if n in registry.QUERIES]
    order += [n for n in names if n not in order and n not in _TAIL]
    order += [n for n in _TAIL if n in registry.QUERIES]
    return order


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return {n: registry.QUERIES[n] for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted ⇒ rows-only check)."""
    return {n: registry.ORACLES[n] for n in _ordered_names() if n in registry.ORACLES}
