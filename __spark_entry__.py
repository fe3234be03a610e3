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
# tests/test_entry_contract.py): (1) queries NEW this round, (2) queries
# whose code or oracle changed, (3) the oldest-checked greens to fill the
# window. Everything in _TAIL was green at its last driver check (r4, or
# r5 via scripts/driver_sim locally for the newest) and stays pinned by
# tests/test_oracle.py every pytest run — rotate the tail back in next
# round so no query goes >2 rounds without a driver row; ann_pq_serve and
# multimodal_audio_native (new in r5, tail-listed for space) go first.
_PRIORITY = [
    # -- new in r5: end-to-end pipeline row, learned rules, index serving --
    "a1_exact_collapse",  # flagship (entry)
    "pipeline_entity_map",  # collapse→block→pairs→score→CC composed
    "d5_learned_rules",  # D5 greedy set-cover, pinned-literal oracle
    "ann_lsh_serve",  # persisted-index serving (rows-only; pytest parity)
    "ann_ivf_serve",  # persisted-index serving (rows-only; pytest parity)
    # -- new in r5 (second batch): streaming-state twin, OLAP breadth, PQ --
    "events_user_state",  # batch twin of applyInPandasWithState final state
    "q3_shipping_priority",  # TPC-H Q3 shape: dim filter → 2 fact joins → topN
    "q10_returned_items",  # TPC-H Q10 shape: quarter window → revenue top-20
    "q18_large_orders",  # TPC-H Q18 shape: HAVING subquery → semi join
    "q17_small_qty_revenue",  # TPC-H Q17 shape: decorrelated scalar subquery
    "j10_merge_upsert",  # SCD1 MERGE as anti-join+union snapshot rewrite
    "j11_cdc_apply",  # compacted I/U/D change feed applied in one pass
    "a13_cube",  # CUBE grouping sets: one Expand+agg pass
    "stats_analyze",  # ANALYZE: one-pass multi-column stats (planner metadata)
    "events_histogram",  # fixed-range clamped bucketing, no sort
    "w3_rolling",  # ROWS + time-RANGE frame aggregates (one shuffle)
    "f11_string_agg",  # ordered LISTAGG via collect_list→array_sort→join
    "events_retention",  # cohort retention matrix (2 aggs + broadcast join)
    "events_gapfill",  # time_bucket_gapfill + LOCF (portable islands form)
    "j12_full_outer",  # FULL OUTER with provenance (SMJ, not broadcastable)
    "a14_except",  # EXCEPT set difference (a12's INTERSECT twin)
    "f12_posexplode",  # positional explode (LATERAL VIEW posexplode)
    "a15_union_by_name",  # schema-aligned union (unionByName, null-filled)
    "events_attribution",  # batch twin of the stream-stream join (parity pinned)
    "ann_pq_topk",  # product-quantization ADC (rows-only; recall pinned)
    # -- oracle/code changed in r5 (ADVICE fixes): must re-verify --
    "events_time_weighted",  # decimal-before-multiply + HUGEINT oracle
    "corpus_mix_weighted",  # explicit floor on both engines
    # -- r3-green tail rotated back in (no driver row for 2 rounds) --
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
    # -- rows-only approximate queries, rotated in per VERDICT r4 #1 --
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_lsh_topk",
    "ann_ivf_topk",
    # -- r4-green fill: core pipeline + dedup/ANN families stay watched
    # (j1/j2/j7/j5 rotated to tail: pipeline_entity_map composes the same
    # blocking chain in-window, and test_plans re-pins j1 every run) --
    "j6_update_join",
    "g1_connected_components",
]
_TAIL = [
    # r6 rotation is a wholesale swap: _TAIL below is EXACTLY 50 entries
    # and _PRIORITY is exactly 50, covering all 100 driver-eligible
    # queries in alternating rounds — keep it that way (new queries must
    # displace into the other half or be bench/pytest-only), or the
    # "no query >2 rounds without a driver row" promise breaks.
    # ann_pq_serve is new in r5 but the window is full; its recall,
    # IVFADC parity, and partition pruning are pytest-pinned
    # (tests/test_pq.py) — rotate it into the window in r6.
    "ann_pq_serve",
    "multimodal_audio_native",  # new in r5; feature values pytest-pinned
    "pack_sequences",  # new in r5; prefix-sum scale path, oracle-eligible
    "corpus_token_budget",  # new in r5; oracle-eligible
    "q13_customer_distribution",  # new in r5; oracle-eligible
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
    # green in r4 (CORRECTNESS_r04) — rotate back into the window in r6 so
    # no query goes >2 rounds without a driver row. ann_cosine_topk is
    # additionally exercised every pytest run as the recall anchor for all
    # five approximate ANN queries.
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
    "p3_distinct",
    "p5_empty_clone",
    "p6_topk",
    "a6_counts",
    "a7_mode_plurality",
    "a8_ratio_metrics",
    "a9_union_distinct",
    "a11_percentiles",
    "f5_concat_null",
    "f6_cast_ratio",
    "f9_string_funcs",
    "f10_datetime_funcs",
    "j8_anti_join",
    "j9_semi_join",
    "text_token_counts",
    "text_tfidf",
]


# synthetic-input benchmark queries: no parquet table input and/or not
# DuckDB-reproducible (xxhash64-seeded corpus) — benched + pytest-pinned,
# not part of the driver's oracle contract
_BENCH_ONLY = {"dedup_ngram_zipf", "ann_lsh_stress", "merge_scale_probe", "pack_scale_probe"}


def _ordered_names() -> list[str]:
    names = [n for n in registry.QUERIES if n not in _BENCH_ONLY]
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
