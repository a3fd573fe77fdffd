"""Semantic tests for the mergeable-sketch family beyond the oracle
hash-match: HLL's estimate must land within its theoretical error band,
CMS estimates are one-sided (never below the true count), and KMV set
operations must respect set algebra (jaccard in [0,1], intersection <=
union, complete sketches exact)."""

from __future__ import annotations

import math

from distribution_engine_smt_spark.pipeline.sketches import (
    HLL_M,
    KMV_K,
    cms_heavy_hitters,
    hll_distinct,
    kmv_set_ops,
)

from .conftest import SF_DIR, SF_DIR_ORACLE


def test_hll_estimate_within_error_band(spark):
    rows = hll_distinct(spark, SF_DIR_ORACLE).collect()
    assert rows, "no groups"
    # standard error of HLL is ~1.04/sqrt(m); allow 4 sigma
    tol = 4 * 1.04 / math.sqrt(HLL_M)
    for r in rows:
        assert r["n_exact"] > 0
        rel = abs(r["est_distinct"] - r["n_exact"]) / r["n_exact"]
        assert rel <= tol, f"{r['event_type']}: rel error {rel:.3f} > {tol:.3f}"
        # register-state invariants: v_empty counts unhit buckets
        assert 0 <= r["v_empty"] <= HLL_M


def test_hll_small_cardinality_linear_counting(spark):
    # sf0.001 has ~15 users per type -> the linear-counting branch
    rows = hll_distinct(spark, SF_DIR).collect()
    for r in rows:
        if r["n_exact"] < HLL_M and r["v_empty"] > 0:
            expect = HLL_M * math.log(HLL_M / r["v_empty"])
            # branch may not trigger if raw_e > 2.5m; only assert when the
            # estimate visibly matches the linear-counting formula shape
            if abs(r["est_distinct"] - round(expect, 2)) < 1e-9:
                return
    # at minimum the estimates stay positive and finite
    assert all(r["est_distinct"] > 0 for r in rows)


def test_cms_overestimates_only(spark):
    rows = cms_heavy_hitters(spark, SF_DIR_ORACLE).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["est_cms"] >= r["n_exact"], (
            f"CMS underestimated {r['tok']}: {r['est_cms']} < {r['n_exact']}"
        )
    # top-20 ordering is by exact count desc then token asc
    counts = [r["n_exact"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_kmv_set_ops_algebra(spark):
    [r] = kmv_set_ops(spark, SF_DIR_ORACLE).collect()
    assert 0.0 <= r["jaccard_est"] <= 1.0
    assert r["est_intersect"] <= r["est_union"] + 1e-9
    assert 1 <= r["k_used"] <= KMV_K
    assert r["n_intersect_exact"] <= r["n_union_exact"]
    # the three disjoint fractions partition the union sketch, so their
    # estimates must sum back to the union estimate (up to rounding)
    assert (
        abs(
            r["est_intersect"] + r["est_a_minus_b"] + r["est_b_minus_a"]
            - r["est_union"]
        )
        < 0.01
    )
    # estimates should be in the right ballpark of the exact answers
    assert r["est_union"] > 0
    rel = abs(r["est_union"] - r["n_union_exact"]) / r["n_union_exact"]
    assert rel < 1.0, f"union estimate off by {rel:.2f}x"


def test_kmv_set_ops_exact_when_sketch_complete(spark):
    # sf0.001: fewer than k distinct users -> sketches are complete sets,
    # so the union estimate degrades to the exact union count
    [r] = kmv_set_ops(spark, SF_DIR).collect()
    if r["k_used"] < KMV_K:
        assert r["est_union"] == float(r["n_union_exact"])
        assert r["jaccard_est"] == (
            round(r["n_intersect_exact"] / r["n_union_exact"], 4)
        )


def test_bloom_no_false_negatives_and_visible_fp(spark):
    from distribution_engine_smt_spark.pipeline.sketches import (
        BLOOM_BITS,
        BLOOM_K,
        bloom_membership,
    )

    [r] = bloom_membership(spark, SF_DIR_ORACLE).collect()
    # the one hard Bloom guarantee
    assert r["n_false_negative"] == 0
    # every true member is flagged
    assert r["n_flagged"] >= r["n_true_members"]
    # the filter state is bounded by k * m whatever the key count
    assert r["n_bits_set"] <= BLOOM_K * BLOOM_BITS
    # sized so the fp band is visible (catches a degenerate all-flagged
    # or nothing-flagged wiring bug) but still prunes most non-members
    assert 0 < r["n_false_positive"] < (r["n_probed"] - r["n_true_members"]) / 2


def test_hll_daily_merge_is_lossless(spark):
    from distribution_engine_smt_spark.pipeline.sketches import hll_daily_merge

    for sf in (SF_DIR, SF_DIR_ORACLE):
        [r] = hll_daily_merge(spark, sf).collect()
        # max is associative over any partitioning: merging daily register
        # tables must give EXACTLY the single-pass sketch
        assert r["est_merged"] == r["est_direct"]
        assert r["n_days"] >= 1


def test_sampled_quantiles_error_bounded(spark):
    # quantile_error_audit = sampled_quantiles' estimate joined with the
    # exact full-sort rank quantile (split out of the default query in r5
    # so the benched path never sorts the corpus); the audit is where the
    # error bound is observable
    from distribution_engine_smt_spark.pipeline.sketches import quantile_error_audit

    rows = quantile_error_audit(spark, SF_DIR_ORACLE).collect()
    assert rows
    for r in rows:
        # the sample is a real subset
        assert 0 < r["n_sample"] < r["n_total"]
        # rank error of p-sampling is O(1/sqrt(n_sample)) in quantile
        # space; translate loosely into value space via a generous band
        assert abs(r["est_value"] - r["exact_value"]) <= max(
            0.35 * abs(r["exact_value"]), 1.0
        ), f"{r['event_type']}/{r['q']}: {r['est_value']} vs {r['exact_value']}"
    # p50 <= p90 <= p99 within every group, for both estimate and truth
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[r["q"]] = r
    for t, qs in by_type.items():
        assert set(qs) == {"p50", "p90", "p99"}
        assert qs["p50"]["est_value"] <= qs["p90"]["est_value"] <= qs["p99"]["est_value"]
        assert qs["p50"]["exact_value"] <= qs["p90"]["exact_value"] <= qs["p99"]["exact_value"]


def test_register_store_prunes_partitions_and_matches_direct(spark, tmp_path):
    import pyspark.sql.functions as F

    from distribution_engine_smt_spark.pipeline.sketches import (
        build_hll_register_store,
        hll_estimate,
        hll_registers,
        range_distinct_estimate,
    )
    from distribution_engine_smt_spark.tables import load_tpch

    store = str(tmp_path / "hll_store")
    build_hll_register_store(spark, SF_DIR_ORACLE, store)

    start, end = "2024-02-01", "2024-03-01"
    ev = load_tpch(spark, SF_DIR_ORACLE)["events"]
    in_range = ev.filter(
        (F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd") >= start)
        & (F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd") < end)
    )
    if in_range.isEmpty():  # corpus time range moved — pick its first month
        first = ev.agg(F.min(F.date_trunc("day", F.col("ts")))).collect()[0][0]
        start = first.strftime("%Y-%m-01")
        end = (first.replace(day=28) + __import__("datetime").timedelta(days=7)).strftime("%Y-%m-01")
        in_range = ev.filter(
            (F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd") >= start)
            & (F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd") < end)
        )
    assert not in_range.isEmpty()

    est_df = range_distinct_estimate(spark, store, start, end)
    # the day range must reach the scan as a PARTITION filter (pruned
    # directories), not a post-scan predicate over all days
    plan = est_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "day#" in plan.split("PartitionFilters:")[1].split("]")[0]

    [stored] = est_df.collect()
    direct_reg = hll_registers(
        in_range, [], "CAST(CAST(user_id AS STRING) AS BINARY)"
    )
    [direct] = hll_estimate(direct_reg, []).collect()
    assert stored["est_distinct"] == direct["est_distinct"]
    assert stored["s_int"] == direct["s_int"]


def test_sample_store_prunes_partitions_and_matches_direct(spark, tmp_path):
    import pyspark.sql.functions as F

    from distribution_engine_smt_spark.pipeline.sketches import (
        build_quantile_sample_store,
        quantile_sample_predicate,
        range_quantile_estimate,
        rank_quantiles,
    )
    from distribution_engine_smt_spark.tables import load_tpch

    store = str(tmp_path / "sample_store")
    build_quantile_sample_store(spark, SF_DIR_ORACLE, store)

    ev = load_tpch(spark, SF_DIR_ORACLE)["events"]
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    days = sorted(
        r[0] for r in ev.select(day.alias("d")).distinct().collect()
    )
    start, end = days[0], days[len(days) // 2]  # first half of the range

    est_df = range_quantile_estimate(spark, store, start, end)
    plan = est_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan

    stored = {
        (r["event_type"], r["label"]): (r["value"], r["n_sample"])
        for r in est_df.collect()
    }
    direct_sample = ev.filter((day >= start) & (day < end)).filter(
        quantile_sample_predicate()
    )
    direct = {
        (r["event_type"], r["label"]): (r["value"], r["n_sample"])
        for r in rank_quantiles(spark, direct_sample, "n_sample").collect()
    }
    assert stored == direct
    assert stored  # non-degenerate range


def test_cms_store_prunes_partitions_and_matches_direct(spark, tmp_path):
    import pyspark.sql.functions as F

    from distribution_engine_smt_spark.pipeline.sketches import (
        build_cms_store,
        range_token_frequency_estimate,
    )
    from distribution_engine_smt_spark.tables import load_tpch

    store = str(tmp_path / "cms_store")
    build_cms_store(spark, SF_DIR_ORACLE, store)

    docs = load_tpch(spark, SF_DIR_ORACLE)["documents"]
    day = (
        F.date_add(
            F.lit("2024-01-01").cast("date"), (F.col("doc_id") / 100).cast("int")
        ).cast("string")
    )
    days = sorted(r[0] for r in docs.select(day.alias("d")).distinct().collect())
    start, end = days[0], days[len(days) // 2]

    # probe the 5 most frequent tokens of the in-range slice
    in_range = docs.filter((day >= start) & (day < end))
    toks = in_range.select(
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    )
    top = (
        toks.groupBy("tok")
        .count()
        .orderBy(F.col("count").desc(), F.col("tok").asc())
        .limit(5)
        .collect()
    )
    probe_tokens = [r["tok"] for r in top]
    truth = {r["tok"]: r["count"] for r in top}

    est_df = range_token_frequency_estimate(spark, store, probe_tokens, start, end)
    plan = est_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan

    est = {r["tok"]: r["est_count"] for r in est_df.collect()}
    assert set(est) == set(probe_tokens)
    for t in probe_tokens:
        # sum-merged store preserves the one-sided CMS guarantee
        assert est[t] >= truth[t]
