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
# tests/test_entry_contract.py). Round 6 executes the wholesale tail↔priority
# swap promised in r5: _PRIORITY below is the entire r5 _TAIL — led by the
# five queries that have NEVER had a driver row (new in r5, window was full)
# and the five olap.py TPC-H shapes newly promoted into the rotation
# (VERDICT r5 #3) in place of five saturated trivial rows now demoted to
# registry.PYTEST_ONLY (still DuckDB-checked every pytest run). _TAIL is the
# entire r5 _PRIORITY (all green in CORRECTNESS_r05 and re-verified at
# sf0.001 by tests/test_oracle.py every pytest run); rotate it back in r7.
_PRIORITY = [
    # -- never driver-checked (new in r5; window was full) — lead with these --
    "ann_pq_serve",  # persisted PQ/IVFADC serving (rows-only; pytest recall pin)
    "multimodal_audio_native",  # native WAV decode features (exact pytest pin)
    "pack_sequences",  # prefix-sum pack map, oracle-eligible
    "corpus_token_budget",  # prefix-sum budget selection, oracle-eligible
    "q13_customer_distribution",  # TPC-H Q13: pre-agg before outer join
    # -- newly promoted olap.py shapes (VERDICT r5 #3): first driver rows --
    "q4_order_priority",  # EXISTS correlated semi join + non-equi residual
    "q7_nation_flow",  # two-role dimension join with inequality theta
    "q16_supplier_variety",  # NOT-IN anti join -> grouped COUNT(DISTINCT)
    "q19_disjunctive_revenue",  # disjunction of conjunctions across join sides
    "q22_idle_customers",  # decorrelated scalar threshold + NOT EXISTS
    # -- r4-green tail rotated back in (no driver row since r4) --
    "dedup_incremental",
    "q1_pricing_summary",
    "q5_regional_revenue",
    "dedup_canonical_pick",
    "j3_singleton_coalesce",
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
    "events_daily_from_hourly",
    "events_pivot",
    "p2_filter_projection",
    "stats_validate",  # data-quality gate under the hard signal (new r6)
    "a7_mode_plurality",
    "a8_ratio_metrics",
    "a11_percentiles",
    "f5_concat_null",
    "f9_string_funcs",
    "f10_datetime_funcs",
    "j8_anti_join",
    "j9_semi_join",
    "text_token_counts",
    "text_tfidf",
]
_TAIL = [
    # r7 rotation is a wholesale swap again: _TAIL below is EXACTLY the r5
    # window (all 50 green in CORRECTNESS_r05: 43 hash-matched + 7
    # rows-only-by-design) and _PRIORITY above is exactly 50, covering all
    # 100 driver-eligible queries in alternating rounds — keep it that way
    # (new queries must displace into the other half, demote a saturated
    # row to registry.PYTEST_ONLY, or be bench/pytest-only), or the
    # "no query >2 rounds without a driver row" promise breaks.
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
    "a13_cube",
    "stats_analyze",
    "events_histogram",
    "w3_rolling",
    "f11_string_agg",
    "events_retention",
    "events_gapfill",
    "j12_full_outer",
    "a14_except",
    "f12_posexplode",
    "a15_union_by_name",
    "events_attribution",
    "ann_pq_topk",
    "events_time_weighted",
    "corpus_mix_weighted",
    "a10_rollup",
    "a12_setops",
    "f_array_ops",
    "decontaminate_ngrams",
    "text_repetition_signals",
    "pii_redact_ids",
    "corpus_quota_sample",
    "dedup_near_clusters",
    "text_duplicated_spans",
    "skew_salted_agg",
    "skew_salted_join",
    "sample_stratified",
    "dedup_ngram_jaccard",
    "text_quality_stats",
    "text_language_id",
    "text_fingerprint",
    "multimodal_binary_stats",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "j6_update_join",
    "g1_connected_components",
]


# synthetic-input benchmark queries: no parquet table input and/or not
# DuckDB-reproducible (xxhash64-seeded corpus) — benched + pytest-pinned,
# not part of the driver's oracle contract
_BENCH_ONLY = {
    "dedup_ngram_zipf",
    "ann_lsh_stress",
    "merge_scale_probe",
    "pack_scale_probe",
    "cc_scale_probe",
    "ann_pq_stress",
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
