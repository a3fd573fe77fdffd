"""Plan-shape regression guards: pin the physical-plan properties that
docs/PLANS.md claims for the scale-sensitive operators. These are the
claims the 100 TB design rests on — if a refactor reintroduces a corpus-
wide single-partition window, an unexpected cartesian product, or loses a
partial top-k, correctness tests stay green but the operator stops
scaling; this module is what catches that."""

from __future__ import annotations

import re

from .conftest import SF_DIR_ORACLE


def _plan(spark, name: str) -> str:
    from distribution_engine_smt_spark import driver_queries
    import distribution_engine_smt_spark.pipeline  # noqa: F401

    df = driver_queries.QUERIES[name](spark, SF_DIR_ORACLE)
    return df._jdf.queryExecution().executedPlan().toString()


def _n_wide_shuffles(plan: str) -> int:
    return len(re.findall(r"hashpartitioning", plan))


def test_tfidf_rank_filter_is_partial_topk(spark):
    plan = _plan(spark, "tfidf_keywords")
    assert "WindowGroupLimit" in plan  # rk<=3 pushed before the exchange


def test_rrf_rankers_end_in_take_ordered(spark):
    plan = _plan(spark, "rrf_hybrid_search")
    assert "TakeOrderedAndProject" in plan
    # the rank windows must sit above the k-row limits, never over a corpus
    assert "CartesianProduct" not in plan


def test_bm25_has_no_wide_shuffle(spark):
    plan = _plan(spark, "bm25_search")
    assert _n_wide_shuffles(plan) == 0  # single-row stats agg + broadcast only


def test_embedding_outliers_has_no_wide_shuffle(spark):
    plan = _plan(spark, "embedding_outliers")
    assert _n_wide_shuffles(plan) == 0


def test_leakage_split_uses_single_corpus_exchange(spark):
    plan = _plan(spark, "leakage_free_split")
    assert _n_wide_shuffles(plan) == 1  # the md5(text) window; coin is map-side


def test_pagerank_never_goes_cartesian(spark):
    plan = _plan(spark, "graph_pagerank")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_probes_end_in_take_ordered(spark):
    for name in [
        "ann_topk_bruteforce",
        "ann_sq8_topk",
        "ann_ivf_kmeans_topk",
        "ann_ivfpq_topk",
        "ann_pq_trained_topk",
        "ann_ivfpq_trained_topk",
        "ann_ivfpq_residual_topk",
        "ann_ivf_sharded_topk",
    ]:
        plan = _plan(spark, name)
        assert "TakeOrderedAndProject" in plan, name
        assert "CartesianProduct" not in plan, name


def test_weighted_sample_and_tfidf_rank_filters_are_partial_topk(spark):
    for name in ["weighted_sample", "zipf_slope"]:
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
    # weighted_sample's rk<=K must push as WindowGroupLimit like tfidf's
    assert "WindowGroupLimit" in _plan(spark, "weighted_sample")


def test_semdedup_pairs_are_cell_blocked(spark):
    plan = _plan(spark, "semdedup")
    # the pair join must key on the k-means cell (a hash join on cid),
    # never degenerate to an all-pairs cartesian/BNLJ over the corpus
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_query_batch_topk_is_partial_before_exchange(spark):
    # rk <= k must run as WindowGroupLimit (per-partition partial top-k)
    # so the q_id exchange carries |Q| x k x partitions rows, not the scan
    for name in ("ann_query_batch", "ann_ivfpq_batch"):
        plan = _plan(spark, name)
        assert "WindowGroupLimit" in plan, name
        assert "CartesianProduct" not in plan, name


def test_pq_stages_end_in_take_ordered(spark):
    plan = _plan(spark, "ann_pq_topk")
    # both the ADC candidate cut and the exact rerank are TakeOrdered,
    # never a global sort of the corpus
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_regional_revenue_dims_broadcast(spark):
    plan = _plan(spark, "regional_revenue")
    # the dimension chain must reach facts as broadcast hash joins; the
    # only allowed exchange is the fact-side orderkey/group shuffle
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_rollup_is_one_expand_pass(spark):
    plan = _plan(spark, "sales_rollup")
    assert "Expand" in plan  # ROLLUP = Expand feeding one partial agg
    assert "BroadcastHashJoin" in plan


def test_pivot_is_single_aggregation(spark):
    plan = _plan(spark, "events_pivot")
    # fixed category list: one groupBy pass, no second (discovery) scan
    assert plan.count("Scan parquet") == 1


def test_cube_is_one_expand_pass(spark):
    plan = _plan(spark, "segment_region_cube")
    # CUBE = ONE Expand (4 grouping sets) feeding one partial agg, never
    # one job per margin; dimension chain reaches facts as broadcasts
    assert plan.count("Expand") == 1
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_sketch_family_single_shuffle_shapes(spark):
    # HLL register build: groupBy(group, bucket) max then groupBy(group) —
    # both map-side combinable; no join of the full input against itself
    plan = _plan(spark, "hll_distinct")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # the only join is broadcast (exact)
    # CMS probe joins the tiny sketch broadcast-side
    plan = _plan(spark, "cms_heavy_hitters")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # KMV sketches are TakeOrdered cuts, never a global sort of the input
    plan = _plan(spark, "kmv_set_ops")
    assert "TakeOrderedAndProject" in plan


def test_bloom_probe_is_broadcast(spark):
    plan = _plan(spark, "bloom_membership")
    # the bit table and member table reach the probe as broadcasts; the
    # probe side is never shuffled against a corpus-sized build side
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q3_broadcast_chain_and_takeordered(spark):
    plan = _plan(spark, "shipping_priority")
    # filtered dims broadcast; the only fact-side exchange is the group;
    # the top-10 is TakeOrdered, never a global sort
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_decorrelated_subquery_is_broadcast_aggregate(spark):
    plan = _plan(spark, "above_nation_avg_balance")
    # the per-nation aggregate reaches the row stream as a broadcast —
    # no per-row subquery execution, no self-join shuffle
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_hourly_hll_and_quantiles_have_no_blowups(spark):
    # windowed registers: two map-side-combinable aggs, no joins of the
    # corpus against itself
    plan = _plan(spark, "hourly_hll_distinct")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    # quantiles: the only unconditioned join is the bounded 3-row literal
    # quantile-fraction frame (broadcast); nothing corpus-sized crosses
    plan = _plan(spark, "sampled_quantiles")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 3-row fraction frame


def test_chunk_dedup_never_ships_text_past_scan(spark):
    """The chunk family's scale claim: only 32-char md5 hashes move
    through the shuffles; the text column must be consumed inside the
    scan/project stage, never appear in an exchange's output schema."""
    plan = _plan(spark, "chunk_dedup")
    for ex in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in ex, f"text column crossed a shuffle: {ex}"
    assert "CartesianProduct" not in plan


def test_chunk_excise_hash_keyed_only(spark):
    plan = _plan(spark, "chunk_excise")
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan)
    assert keys and set(keys) <= {"chunk_md5", "doc_id"}, keys


def test_bigram_frequency_tables_broadcast(spark):
    """The bigram/context frequency tables are vocabulary-sized and must
    broadcast into the per-doc join — a sort-merge join here would
    shuffle the corpus twice more."""
    plan = _plan(spark, "bigram_perplexity")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_recall_audits_are_single_aggregate_rows(spark):
    """Audit outputs are one row; their plans must end in a plain
    aggregate, not a global sort, and the LSH audit must reference its
    chains through one full-outer join (no repeated chain subtrees via
    a cross-joined count pair)."""
    for name in (
        "lsh_recall_audit",
        "ann_recall_audit",
        "pq_recall_audit",
        "ivfpq_recall_audit",
        "pq_trained_recall_audit",
        "embedding_lsh_recall_audit",
        "embedding_lsh_multiprobe_recall_audit",
    ):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
    lsh = _plan(spark, "lsh_recall_audit")
    assert "FullOuter" in lsh or "full_outer" in lsh.lower()


def test_bucketed_merge_exchanges(spark):
    """merge.py's header claims, verified against real plans (VERDICT r6
    #5): (a) additive_merge over a target bucketed on the merge key reads
    the bucketed layout with NO Exchange on the target branch — only the
    delta side shuffles; (b) merge_upsert (union + rank window) pays
    exactly ONE Exchange, and bucketing cannot remove it (the window's
    required distribution sits above the union)."""
    from pyspark.sql import functions as F

    from distribution_engine_smt_spark.operators.merge import (
        additive_merge,
        merge_upsert,
    )

    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    spark.sql("DROP TABLE IF EXISTS plan_bucketed_merge_target")
    df.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable(
        "plan_bucketed_merge_target"
    )
    try:
        target = spark.table("plan_bucketed_merge_target")
        delta = spark.range(50).select(
            F.col("id").alias("k"), F.lit(999).alias("v")
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            add_plan = (
                additive_merge(target, delta, ["k"], add_cols=["v"])
                ._jdf.queryExecution().executedPlan().toString()
            )
            up_plan = (
                merge_upsert(target, delta, ["k"])
                ._jdf.queryExecution().executedPlan().toString()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        # (a) join-shaped merge: bucketed scan, single Exchange on the
        # DELTA branch only — the Exchange must sit below the join's
        # delta side, i.e. exactly one in the whole plan, and the target
        # FileScan reports the bucketed layout
        assert "Bucketed: true" in add_plan
        assert add_plan.count("Exchange") == 1
        # the exchange partitions the delta's key attr, not the target's:
        # target branch is Sort-over-FileScan with no Exchange between
        target_branch = add_plan.split("FullOuter")[1].split("+- Sort")[0]
        assert "Exchange" not in target_branch
        # (b) window-shaped merge: exactly one union-wide Exchange
        assert up_plan.count("Exchange") == 1
        assert "WindowGroupLimit" in up_plan  # rank-1 filter stays partial
    finally:
        spark.sql("DROP TABLE IF EXISTS plan_bucketed_merge_target")


def test_clustered_fixture_generation_stays_narrow(spark):
    """The fixture input must be either (a) the materialized cf-fit
    store (r13: clustered_fixture_stats reads the store's fixture rows
    when built — a 2048-row parquet scan) or (b) the live
    explode-per-coordinate generation with its ONE assembly aggregate.
    A refactor back to the wide literal projection would still be
    correct but fall out of codegen and re-pay ~12 s of planning
    (measured; module docstring)."""
    plan = _plan(spark, "clustered_fixture_stats")
    assert "CartesianProduct" not in plan
    # store-read path: the fixture rides in from the cf-fit store scan;
    # live path: generation assembles through the ordered-collect
    # aggregate (map-side partial). Never a wide literal projection.
    assert "cf-fit-" in plan or "partial_collect_list" in plan
    # the live generator itself keeps the narrow shape regardless
    from distribution_engine_smt_spark.pipeline.clustered import (
        clustered_fixture_frame,
    )
    from tests.conftest import SF_DIR

    gen_plan = clustered_fixture_frame(
        spark, SF_DIR
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "partial_collect_list" in gen_plan


def test_clustered_pq_variant_audit_luts_join_as_broadcasts(spark):
    """The ADC LUTs must ride as broadcast frames (10/80 rows), never as
    inlined literal CASE chains (the janino >64KB fallback), and every
    rank window partitions by qid — a window over an unpartitioned spec
    would funnel the fixture through one task. (The final 1-row recall
    aggregate's SinglePartition exchange is fine: its input is already
    100 truth rows.)"""
    plan = _plan(spark, "clustered_pq_variant_audit")
    assert "BroadcastExchange" in plan
    assert "windowspecdefinition(qid" in plan
    assert "windowspecdefinition()" not in plan.replace(" ", "")


def test_flips_variants_share_the_multiprobe_shape(spark):
    for name in (
        "dedup_embedding_lsh",
        "dedup_embedding_lsh_flips1",
        "dedup_embedding_lsh_flips3",
        "dedup_embedding_lsh_single_probe",
    ):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name


def test_minhash_decontaminate_is_posting_joined(spark):
    """r12: the signature-agreement scan must stay a posting-list
    equi-join on (component, value) — the benchmark side grows with the
    corpus under BENCH_MOD sampling, so a broadcast nested loop here is
    O(n^2/BENCH_MOD) at scale (the plan it replaced)."""
    plan = _plan(spark, "minhash_decontaminate")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
