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
    # --- zero driver rows in r1-r4 (VERDICT r4 "What's missing" #3) +
    # --- quantile_error_audit (new this round): the top-18 slots
    "normalize_text",
    "langid_confusion",
    "curriculum_buckets",
    "substring_dup_spans",
    "corpus_datasheet",
    "length_histogram",
    "embedding_kmeans",
    "ann_ivf_kmeans_nprobe",
    "graph_pagerank",
    "multimodal_resize",
    "pii_redact",
    "url_density",
    "top_ngrams",
    "bm25_search",
    "deterministic_shuffle",
    "source_vocab_overlap",
    "event_zscore_anomaly",
    "quantile_error_audit",
    # --- exactly one driver row (green r4), untouched this round: fill
    # --- the remaining head slots so each gets a second round of evidence
    "token_count_quantiles",
    "zipf_slope",
    "build_vocab",
    "embedding_outliers",
    "mixture_weights",
    "ann_ivf_nprobe_topk",
    "ann_sq8_topk",
    "ann_query_batch",
    "ann_pq_topk",
    "hard_negatives",
    "embedding_dim_stats",
    "top_boilerplate_spans",
    "ann_ivf_kmeans_topk",
    "semdedup",
    "leakage_free_split",
    "doc_novelty",
    "weighted_sample",
    "multimodal_frame_sample",
    "pricing_summary",
    "regional_revenue",
]
# multi-round-green (1-3 driver rows each) AND untouched this round —
# rotated past the cap. With 118 registered queries and the 50-slot cap,
# exactly 68 sit here so the cut is EXPLICIT (chosen stable queries)
# rather than whatever lands at positions 51+ of registration order.
_DRIVER_ROTATE_LAST = [
    "discussions_by_created",
    "discussions_by_trending",
    "discussions_by_hot",
    "discussions_by_payout_keyset",
    "discussions_by_promoted",
    "trending_tags",
    "blog_union_minjoin",
    "feed_semijoin",
    "replies_in_notin",
    "reblogged_by_agg",
    "latest_event_per_key",
    "thread_tree",
    "follow_counts",
    "account_history_page",
    "earliest_event_per_user",
    "set_diff_reconcile",
    "supplier_visible_revenue",
    "tag_membership",
    "children_counts",
    "payout_accumulation",
    "json_props_sum",
    "recent_orders_window",
    "authorperm_codec",
    "segment_nation_counts",
    "post_with_votes",
    "prefix_select",
    "reward_curves",
    "time_format_wire",
    "json_double_decode",
    "text_token_counts",
    "text_lang_id",
    "text_quality_score",
    "text_fingerprint",
    "ann_topk_bruteforce",
    "ann_ivf_topk",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_exact_keep_first",
    "pack_sequences",
    "stratified_sample",
    "quality_filter",
    "balanced_sample",
    "chunk_documents",
    "decontaminate",
    "text_repetition",
    "curated_corpus",
    "multimodal_decode",
    "multimodal_metadata_stats",
    "sales_rollup",
    "events_pivot",
    "daily_moving_avg",
    "segment_region_cube",
    "shipping_priority",
    "above_nation_avg_balance",
    "rrf_hybrid_search",
    "unigram_perplexity",
    "sessionize",
    "asof_purchase_attribution",
    "kmv_distinct",
    "tumbling_event_counts",
    "range_join_events",
    "sliding_event_counts",
    "event_funnel",
    "hll_distinct",
    "cms_heavy_hitters",
    "kmv_set_ops",
    "hll_daily_merge",
    "hourly_hll_distinct",
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
    # r5 (this round): SimHash pair scan rewritten from an interpreted
    # F.aggregate lambda fold to two packed-long bit_count(xor) codegen
    # terms (the r4 13x bench regression), and its producer re-projected
    "dedup_simhash",
    "dedup_simhash_pairs",
    # r5: sampled_quantiles is now sample-only (the exact full-sort rider
    # moved to the NEW quantile_error_audit query, in _DRIVER_PRIORITY);
    # its oracle changed accordingly
    "sampled_quantiles",
    # r5: fp_rate denominator guarded with greatest(...,1) in BOTH engines
    # (ADVICE: degenerate all-members probe set divided by zero)
    "bloom_membership",
    # r5: persist() -> tracked_persist() cache-discipline sweep (release
    # after last consumer; bench clears between queries) touched these
    # builders and the consumers of the memoized MinHash pair stream
    "minhash_decontaminate",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_embedding_lsh",
    "tfidf_keywords",
    "cross_source_dup_matrix",
    "dedup_best_representative",
    "dedup_clusters",
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
