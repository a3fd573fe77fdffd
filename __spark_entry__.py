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
    # --- r7 head, in priority order:
    # 1) zero driver rows (new this round: the width-ladder occupancy
    #    audit, the embedding-LSH recall audit, and the sampled-baseline
    #    LSH recall audit) — must sit in the cap
    # 2) exactly one green row across r1-r6 — each gets its second row
    #    (VERDICT r6 next-round #6: dup_inflation / split_leakage_audit)
    # 3) the rest of this round's modified set (_ROUND_MODIFIED below)
    # 4) fill to 50 with the lowest-coverage (2-row) stable queries so
    #    coverage keeps deepening instead of re-verifying 3-row queries
    "embedding_lsh_recall_audit",
    "index_occupancy_audit",
    "lsh_recall_audit_sampled",
    "ann_ivfpq_topk",
    "ivfpq_recall_audit",
    "pq_train",
    "ann_pq_trained_topk",
    "pq_trained_recall_audit",
    "ann_ivfpq_batch",
    "dedup_embedding_lsh_multiprobe",
    "embedding_lsh_multiprobe_recall_audit",
    "ann_recall_audit",
    "bigram_perplexity",
    "chunk_dedup",
    "chunk_excise",
    "dedup_cluster_stats",
    "dup_inflation",
    "lsh_recall_audit",
    "pq_recall_audit",
    "split_leakage_audit",
    "ann_pq_topk",
    "dedup_embedding_lsh",
    "dedup_minhash_lsh",
    "minhash_decontaminate",
    "embedding_kmeans",
    "semdedup",
    "ann_ivf_kmeans_topk",
    "ann_ivf_kmeans_nprobe",
    "cross_source_dup_matrix",
    "dedup_clusters",
    "dedup_best_representative",
    "corpus_datasheet",
    "dedup_ngram_jaccard",
    "above_nation_avg_balance",
    "ann_ivf_nprobe_topk",
    "ann_query_batch",
    "ann_sq8_topk",
    "asof_purchase_attribution",
    "authorperm_codec",
    "balanced_sample",
    "bloom_membership",
    "bm25_search",
    "build_vocab",
    "chunk_documents",
    "cms_heavy_hitters",
    "curated_corpus",
    "curriculum_buckets",
    "earliest_event_per_user",
    "event_funnel",
    "event_zscore_anomaly",
]
# multi-round-green (2+ driver rows each) AND untouched this round —
# rotated past the cap. With 138 registered queries and the 50-slot cap,
# exactly 88 sit here so the cut is EXPLICIT (chosen stable queries)
# rather than whatever lands at positions 51+ of registration order.
_DRIVER_ROTATE_LAST = [
    "account_history_page",
    "ann_ivf_topk",
    "ann_topk_bruteforce",
    "blog_union_minjoin",
    "children_counts",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_exact_keep_first",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "embedding_dim_stats",
    "embedding_outliers",
    "doc_novelty",
    "daily_moving_avg",
    "decontaminate",
    "deterministic_shuffle",
    "events_pivot",
    "graph_pagerank",
    "discussions_by_created",
    "discussions_by_hot",
    "discussions_by_payout_keyset",
    "discussions_by_promoted",
    "discussions_by_trending",
    "feed_semijoin",
    "follow_counts",
    "hard_negatives",
    "hll_daily_merge",
    "hll_distinct",
    "hourly_hll_distinct",
    "json_double_decode",
    "json_props_sum",
    "kmv_distinct",
    "kmv_set_ops",
    "langid_confusion",
    "latest_event_per_key",
    "leakage_free_split",
    "length_histogram",
    "mixture_weights",
    "multimodal_decode",
    "multimodal_frame_sample",
    "multimodal_metadata_stats",
    "multimodal_resize",
    "normalize_text",
    "pack_sequences",
    "payout_accumulation",
    "pii_redact",
    "post_with_votes",
    "prefix_select",
    "pricing_summary",
    "quality_filter",
    "quantile_error_audit",
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
    "substring_dup_spans",
    "supplier_visible_revenue",
    "tag_membership",
    "text_fingerprint",
    "text_lang_id",
    "text_quality_score",
    "text_repetition",
    "text_token_counts",
    "tfidf_keywords",
    "thread_tree",
    "time_format_wire",
    "token_count_quantiles",
    "top_boilerplate_spans",
    "top_ngrams",
    "trending_tags",
    "tumbling_event_counts",
    "unigram_perplexity",
    "url_density",
    "weighted_sample",
    "zipf_slope",
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
    # r7 (this round): corpus-size-derived index widths (pipeline/params.py
    # ladders — VERDICT r6 next-round #1) touched the RHP-LSH chain, the
    # MinHash-LSH chain + its signature store, the all-pairs baseline
    # (store-aware + sampled mode), and the trained-IVF family (multi-rung
    # oracles); the PQ re-tune (8x8 subspaces, K=8, CAND=300, single-fold
    # encoder — #2) touched ann_pq_topk/pq_recall_audit; the ADVICE
    # zero-guards touched dup_inflation/split_leakage_audit; the occupancy,
    # embedding-LSH-recall, and sampled-LSH-recall audits are new.
    "ann_pq_topk",
    "pq_recall_audit",
    "dedup_embedding_lsh",
    "dedup_minhash_lsh",
    "minhash_decontaminate",
    "lsh_recall_audit",
    "ann_recall_audit",
    "embedding_kmeans",
    "semdedup",
    "ann_ivf_kmeans_topk",
    "ann_ivf_kmeans_nprobe",
    "cross_source_dup_matrix",
    "dedup_clusters",
    "dedup_best_representative",
    "corpus_datasheet",
    "dup_inflation",
    "split_leakage_audit",
    "dedup_ngram_jaccard",
    "embedding_lsh_recall_audit",
    "index_occupancy_audit",
    "lsh_recall_audit_sampled",
    # second wave: IVF-PQ probe + its recall audit (new, zero driver rows)
    "ann_ivfpq_topk",
    "ivfpq_recall_audit",
    # third wave: trained PQ codebooks (new, zero driver rows)
    "pq_train",
    "ann_pq_trained_topk",
    "pq_trained_recall_audit",
    # fourth wave: batched serving through the IVF-PQ index (new)
    "ann_ivfpq_batch",
    # fifth wave: multi-probe RHP LSH + its recall audit (new)
    "dedup_embedding_lsh_multiprobe",
    "embedding_lsh_multiprobe_recall_audit",
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
