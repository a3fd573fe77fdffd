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
# see docs/PLANS.md "Driver 50-query cap"), so we rotate: the r13 head is
# (1) the 13 queries whose driver evidence is age 5 after r12 — the eight
# r08-cohort names VERDICT r12 #3 requires to LEAD this head plus the five
# rotated out in r12 session 1 (tests/test_local_correctness.py enforces
# the <= 4 hard bound), (2) this round's modified-query REPRESENTATIVES
# (_ROUND_MODIFIED — the r12 precedent: one head slot per rewritten
# kernel family; EVERY touched query is hash-checked in the committed
# full-registry LOCAL_CORRECTNESS artifact), and (3) the stalest age-4
# queries filling the cap to exactly 50.
_DRIVER_PRIORITY = [
    # --- age-5 cohort (last driver-green r08): MUST lead the r13 head
    "blog_union_minjoin",
    "children_counts",
    "cross_source_dup_matrix",
    "dedup_cluster_stats",
    "dedup_clusters",
    "dedup_exact",
    "embedding_outliers",
    "hard_negatives",
    "leakage_free_split",
    "mixture_weights",
    "quantile_error_audit",
    "substring_dup_spans",
    "top_boilerplate_spans",
    # --- stalest age-4 fill (last driver-green r09)
    "decontaminate",
    "dedup_exact_keep_first",
    "discussions_by_created",
]
# multi-round-green AND untouched this round — rotated past the 50-slot
# cap (regenerated each round so head + this = registry). Every one
# stays hash-checked locally each round (tests/test_driver_queries.py)
# and in the committed LOCAL_CORRECTNESS artifact (local_correctness.py).
# Disjoint from _DRIVER_PRIORITY and _ROUND_MODIFIED by construction
# (ADVICE r11 #3); test_rotation_lists_are_disjoint pins it.
_DRIVER_ROTATE_LAST = [
    "above_nation_avg_balance",
    "account_history_page",
    "adaptive_maintenance_audit",
    "ann_ivf_kmeans_topk",
    "ann_ivf_nprobe_topk",
    "ann_ivfpq_trained_topk",
    "ann_pq_topk",
    "asof_purchase_attribution",
    "authorperm_codec",
    "balanced_sample",
    "bigram_perplexity",
    "bm25_search",
    "build_vocab",
    "chunk_dedup",
    "chunk_documents",
    "chunk_excise",
    "clustered_adaptive_ivfpq_topk",
    "clustered_adaptive_merge_audit",
    "clustered_adaptive_occupancy_audit",
    "clustered_adaptive_semdedup_audit",
    "clustered_adaptive_semdedup_w2_audit",
    "clustered_adaptive_semdedup_w2k16_audit",
    "clustered_adaptive_topk_p1",
    "clustered_adaptive_topk_p2",
    "clustered_ivf_occupancy_audit",
    "clustered_ivfpq_residual_recall_audit",
    "clustered_ivfpq_trained_topk",
    "clustered_kmeans_agreement_audit",
    "clustered_mass_occupancy_audit",
    "clustered_mass_semdedup_audit",
    "corpus_datasheet",
    "curated_corpus",
    "curriculum_buckets",
    "daily_moving_avg",
    "dedup_best_representative",
    "dedup_embedding_lsh",
    "dedup_embedding_lsh_flips1",
    "dedup_embedding_lsh_flips3",
    "dedup_embedding_lsh_multiprobe",
    "dedup_embedding_lsh_single_probe",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "deterministic_shuffle",
    "discussions_by_hot",
    "discussions_by_payout_keyset",
    "discussions_by_promoted",
    "discussions_by_trending",
    "doc_novelty",
    "dup_inflation",
    "earliest_event_per_user",
    "embedding_kmeans",
    "embedding_lsh_flips1_recall_audit",
    "embedding_lsh_multiprobe_recall_audit",
    "embedding_lsh_planted_recall_audit",
    "embedding_lsh_recall_audit",
    "event_funnel",
    "events_pivot",
    "feed_semijoin",
    "follow_counts",
    "hll_daily_merge",
    "hll_distinct",
    "hourly_hll_distinct",
    "ivfpq_residual_recall_audit",
    "ivfpq_trained_recall_audit",
    "json_double_decode",
    "json_props_sum",
    "kmv_distinct",
    "langid_confusion",
    "latest_event_per_key",
    "length_histogram",
    "lsh_recall_audit",
    "lsh_recall_audit_sampled",
    "minhash_decontaminate",
    "multimodal_decode",
    "multimodal_frame_sample",
    "multimodal_metadata_stats",
    "multimodal_resize",
    "normalize_text",
    "pack_sequences",
    "payout_accumulation",
    "pii_redact",
    "post_with_votes",
    "pq_recall_audit",
    "pq_train",
    "prefix_select",
    "pricing_summary",
    "quality_filter",
    "range_join_events",
    "reblogged_by_agg",
    "recent_orders_window",
    "regional_revenue",
    "replies_in_notin",
    "reward_curves",
    "rrf_hybrid_search",
    "sales_rollup",
    "sampled_quantiles",
    "segment_nation_counts",
    "segment_region_cube",
    "sessionize",
    "set_diff_reconcile",
    "shipping_priority",
    "sliding_event_counts",
    "source_vocab_overlap",
    "stratified_sample",
    "supplier_visible_revenue",
    "tag_membership",
    "text_fingerprint",
    "text_lang_id",
    "text_quality_score",
    "text_repetition",
    "text_token_counts",
    "tfidf_keywords",
    "time_format_wire",
    "token_count_quantiles",
    "top_ngrams",
    "trending_tags",
    "tumbling_event_counts",
    "unigram_perplexity",
    "url_density",
    "weighted_sample",
]

# ROTATION POLICY (standing rule, not a one-off): any query whose
# implementation changed during the CURRENT round must be covered by this
# round's correctness evidence — family REPRESENTATIVES sit inside the
# driver's top-50 (the cap cannot hold every touched query in a
# kernel-conversion round; r12 set the precedent) and every touched query
# is hash-checked in the committed LOCAL_CORRECTNESS full sweep. Only
# queries green in 2+ prior rounds AND untouched this round may be
# rotated past position 50.
# tests/test_driver_queries.py::test_round_modified_queries_inside_driver_cap
# enforces the placement (and that nothing listed here is simultaneously
# rotated last).
_ROUND_MODIFIED = [
    # r13 OPTIMIZATION round, construction-cost collapse wave 2: bodies
    # rewritten as one-parse SQL text (selectExpr/F.expr) — plan-identical
    # by construction (plans/r13/<q>_{before,after}.txt normalize to zero
    # diff lines; kernel parity pinned in tests/test_sql_expr_parity.py;
    # results hash-pinned unchanged vs the DuckDB oracles). Store
    # read-or-compute: the two fixture-stats queries + the semdedup
    # audit's fixture input now read the cf/cmass fit stores when built.
    "ann_sq8_topk",
    "ann_topk_bruteforce",
    "ann_ivf_topk",
    "ann_ivf_kmeans_nprobe",
    "ann_ivfpq_topk",
    "ann_pq_trained_topk",
    "ann_ivfpq_residual_topk",
    "ann_ivfpq_batch",
    "ann_query_batch",
    "dedup_embedding_cosine",
    "semdedup",
    "ann_ivf_sharded_topk",
    "ivfpq_recall_audit",
    "ann_recall_audit",
    "pq_trained_recall_audit",
    "ann_ivf_sharded_recall_audit",
    "clustered_fixture_stats",
    "clustered_mass_fixture_stats",
    "clustered_semdedup_audit",
    "clustered_pq_variant_audit",
    "clustered_ivfpq_residual_topk",
    "clustered_ivfpq_trained_recall_audit",
    "clustered_adaptive_probe_recall_audit",
    "cms_heavy_hitters",
    "kmv_set_ops",
    "bloom_membership",
    "embedding_dim_stats",
    "index_occupancy_audit",
    "split_leakage_audit",
    "event_zscore_anomaly",
    "zipf_slope",
    "dedup_minhash_lsh",
    "thread_tree",
    "graph_pagerank",
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
