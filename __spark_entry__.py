"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the engine's operator surface
(SURVEY.md §2 shapes + pipeline extensions) for the sf0.01 DuckDB
correctness gate. Implementations live in
``distribution_engine_smt_spark.driver_queries`` (+ ``pipeline.*``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distribution_engine_smt_spark import driver_queries  # noqa: E402
from distribution_engine_smt_spark import pipeline  # noqa: E402,F401  (registers extension queries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (get_discussions_by_created shape: broadcast dimension
    left join + muted suppression + pushed-down range filter + top-k) on
    /root/testdata/sf0.001."""
    return driver_queries.discussions_by_created(spark, "/root/testdata/sf0.001")


# The driver caps its oracle pass at 50 queries per round (observed in r2;
# see docs/PLANS.md "Driver 50-query cap"), so we rotate: queries with ZERO
# driver rows across r1-r4 run FIRST (retiring the verification debt VERDICT
# r4 flagged), then this round's modified queries, then the once-verified
# r4 additions, and multi-round-green untouched queries rotate past the cap.
# Every query keeps its oracle and stays hash-checked locally each round
# regardless of position (tests/test_driver_queries.py).
_DRIVER_PRIORITY = [
    # --- r10 head: VERDICT r9 #1 verbatim — "fill the entire r10 head
    # with the stalest 50; new work goes BEHIND them". In order:
    # 1) zero driver rows (new this round): the adaptive-lifecycle
    #    decision rows (VERDICT r9 #5/#6)
    "adaptive_maintenance_audit",
    "clustered_adaptive_merge_audit",
    # 2) the staleness tail, stalest-first: every query whose last green
    #    driver row is r06 or older — 10 at r03 (the five deferred from
    #    the r9 head promise lead), 4 at r04, 10 at r05, 19 of 21 at r06.
    #    Two r06 queries (deterministic_shuffle, source_vocab_overlap —
    #    age 4 after this round, still inside the bound) defer to the
    #    r11 head to make room for the round-modified audits below;
    #    tests/test_local_correctness.py asserts the age bound holds.
    "discussions_by_promoted",
    "feed_semijoin",
    "follow_counts",
    "latest_event_per_key",
    "payout_accumulation",
    "post_with_votes",
    "reblogged_by_agg",
    "replies_in_notin",
    "set_diff_reconcile",
    "tag_membership",
    "kmv_distinct",
    "range_join_events",
    "sessionize",
    "tumbling_event_counts",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "embedding_dim_stats",
    "multimodal_frame_sample",
    "pricing_summary",
    "regional_revenue",
    "sampled_quantiles",
    "token_count_quantiles",
    "weighted_sample",
    "zipf_slope",
    "daily_moving_avg",
    "events_pivot",
    "graph_pagerank",
    "hll_daily_merge",
    "hll_distinct",
    "hourly_hll_distinct",
    "kmv_set_ops",
    "langid_confusion",
    "length_histogram",
    "multimodal_resize",
    "normalize_text",
    "pii_redact",
    "sales_rollup",
    "segment_region_cube",
    "shipping_priority",
    "sliding_event_counts",
    "top_ngrams",
    "unigram_perplexity",
    "url_density",
    # 3) round-modified (r09-green, re-verified because their
    #    implementation changed this round — see _ROUND_MODIFIED)
    "embedding_lsh_recall_audit",
    "embedding_lsh_multiprobe_recall_audit",
    "embedding_lsh_flips1_recall_audit",
    "clustered_adaptive_occupancy_audit",
    "clustered_adaptive_probe_recall_audit",
]
# multi-round-green AND untouched this round — rotated past the 50-slot
# cap (regenerated each round so head + this = registry). Every one
# stays hash-checked locally each round (tests/test_driver_queries.py)
# and in the committed LOCAL_CORRECTNESS artifact (local_correctness.py).
_DRIVER_ROTATE_LAST = [
    "above_nation_avg_balance",
    "account_history_page",
    "ann_ivf_kmeans_nprobe",
    "ann_ivf_kmeans_topk",
    "ann_ivf_nprobe_topk",
    "ann_ivf_sharded_recall_audit",
    "ann_ivf_sharded_topk",
    "ann_ivf_topk",
    "ann_ivfpq_batch",
    "ann_ivfpq_residual_topk",
    "ann_ivfpq_topk",
    "ann_ivfpq_trained_topk",
    "ann_pq_topk",
    "ann_pq_trained_topk",
    "ann_query_batch",
    "ann_recall_audit",
    "ann_sq8_topk",
    "ann_topk_bruteforce",
    "asof_purchase_attribution",
    "authorperm_codec",
    "balanced_sample",
    "bigram_perplexity",
    "blog_union_minjoin",
    "bloom_membership",
    "bm25_search",
    "build_vocab",
    "children_counts",
    "chunk_dedup",
    "chunk_documents",
    "chunk_excise",
    "clustered_fixture_stats",
    "clustered_ivf_occupancy_audit",
    "clustered_ivfpq_residual_recall_audit",
    "clustered_ivfpq_residual_topk",
    "clustered_ivfpq_trained_recall_audit",
    "clustered_ivfpq_trained_topk",
    "clustered_kmeans_agreement_audit",
    "clustered_mass_fixture_stats",
    "clustered_mass_occupancy_audit",
    "clustered_mass_semdedup_audit",
    "clustered_pq_variant_audit",
    "clustered_semdedup_audit",
    "cms_heavy_hitters",
    "corpus_datasheet",
    "cross_source_dup_matrix",
    "curated_corpus",
    "curriculum_buckets",
    "decontaminate",
    "dedup_best_representative",
    "dedup_cluster_stats",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_embedding_lsh_flips1",
    "dedup_embedding_lsh_flips3",
    "dedup_embedding_lsh_multiprobe",
    "dedup_embedding_lsh_single_probe",
    "dedup_exact",
    "dedup_exact_keep_first",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "deterministic_shuffle",
    "discussions_by_created",
    "discussions_by_hot",
    "discussions_by_payout_keyset",
    "discussions_by_trending",
    "doc_novelty",
    "dup_inflation",
    "earliest_event_per_user",
    "embedding_kmeans",
    "embedding_lsh_planted_recall_audit",
    "embedding_outliers",
    "event_funnel",
    "event_zscore_anomaly",
    "hard_negatives",
    "index_occupancy_audit",
    "ivfpq_recall_audit",
    "ivfpq_residual_recall_audit",
    "ivfpq_trained_recall_audit",
    "json_double_decode",
    "json_props_sum",
    "leakage_free_split",
    "lsh_recall_audit",
    "lsh_recall_audit_sampled",
    "minhash_decontaminate",
    "mixture_weights",
    "multimodal_decode",
    "multimodal_metadata_stats",
    "pack_sequences",
    "pq_recall_audit",
    "pq_train",
    "pq_trained_recall_audit",
    "prefix_select",
    "quality_filter",
    "quantile_error_audit",
    "recent_orders_window",
    "reward_curves",
    "rrf_hybrid_search",
    "segment_nation_counts",
    "semdedup",
    "source_vocab_overlap",
    "split_leakage_audit",
    "stratified_sample",
    "substring_dup_spans",
    "supplier_visible_revenue",
    "text_fingerprint",
    "text_lang_id",
    "text_quality_score",
    "text_repetition",
    "text_token_counts",
    "tfidf_keywords",
    "thread_tree",
    "time_format_wire",
    "top_boilerplate_spans",
    "trending_tags",
]

# ROTATION POLICY (standing rule, not a one-off): any query whose
# implementation changed during the CURRENT round must sit inside the
# driver's top-50 so this round's CORRECTNESS pass covers the change; only
# queries green in 2+ prior rounds AND untouched this round may be rotated
# past position 50. Update this list every round alongside the code;
# tests/test_driver_queries.py::test_round_modified_queries_inside_driver_cap
# enforces the placement (and that nothing listed here is simultaneously
# rotated last).
_ROUND_MODIFIED = [
    # r10 (this round): the recall-audit family now reads the
    # materialized embedding pair store (stored_pairs read-or-compute)
    # and the two clustered_adaptive audits read the materialized
    # mass-fixture fit store — execution path changed, results
    # hash-pinned unchanged, re-verified this round.
    "embedding_lsh_recall_audit",
    "embedding_lsh_multiprobe_recall_audit",
    "embedding_lsh_flips1_recall_audit",
    "clustered_adaptive_occupancy_audit",
    "clustered_adaptive_probe_recall_audit",
]


def _ordered(names: list[str]) -> list[str]:
    head = [n for n in _DRIVER_PRIORITY if n in names]
    head += [n for n in _ROUND_MODIFIED if n in names and n not in head]
    tail = [n for n in _DRIVER_ROTATE_LAST if n in names]
    mid = [n for n in names if n not in set(head) | set(tail)]
    return head + mid + tail


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = driver_queries.QUERIES
    return {n: q[n] for n in _ordered(list(q))}


def oracle_sql() -> dict[str, str]:
    o = driver_queries.ORACLE_SQL
    return {n: o[n] for n in _ordered(list(driver_queries.QUERIES)) if n in o}
