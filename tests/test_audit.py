"""Semantic property tests for the corpus-audit operators (the DuckDB
hash-match in test_driver_queries.py is the primary gate; these pin the
properties the oracle can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distribution_engine_smt_spark import tables
from distribution_engine_smt_spark.pipeline.audit import (
    N_BUCKETS,
    OUT_TOP,
    curriculum_buckets,
    embedding_outliers,
    langid_confusion,
)
from distribution_engine_smt_spark.pipeline.dedup import substring_dup_spans

from .conftest import SF_DIR


def test_confusion_matrix_totals_match_corpus(spark):
    docs = tables.load_tpch(spark, SF_DIR)["documents"]
    out = langid_confusion(spark, SF_DIR)
    assert out.agg(F.sum("n_docs")).first()[0] == docs.count()
    # every declared lang appears
    assert {r["lang"] for r in out.collect()} == {
        r["lang"] for r in docs.select("lang").distinct().collect()
    }


def test_curriculum_buckets_are_balanced_within_one(spark):
    out = curriculum_buckets(spark, SF_DIR).collect()
    by_source: dict[str, list] = {}
    for r in out:
        by_source.setdefault(r["source"], []).append(r)
    for source, rows in by_source.items():
        buckets = sorted(r["bucket"] for r in rows)
        assert buckets == list(range(1, len(buckets) + 1))
        assert buckets[-1] <= N_BUCKETS
        counts = [r["n_docs"] for r in rows]
        assert max(counts) - min(counts) <= 1, (source, counts)
        # quality must be non-decreasing across buckets
        ordered = sorted(rows, key=lambda r: r["bucket"])
        for a, b in zip(ordered, ordered[1:]):
            assert a["q_max"] <= b["q_min"] or abs(a["q_max"] - b["q_min"]) < 1e-9


def test_embedding_outliers_sorted_by_deviation(spark):
    rows = embedding_outliers(spark, SF_DIR).collect()
    assert len(rows) == OUT_TOP
    zs = [abs(r["z"]) for r in rows]
    assert zs == sorted(zs, reverse=True)


def test_substring_spans_flag_exact_duplicates(spark):
    """Documents with identical text must have every window duplicated."""
    docs = tables.load_tpch(spark, SF_DIR)["documents"]
    dup_docs = (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.count("*").alias("n"), F.collect_list("doc_id").alias("ids"))
        .where(F.col("n") >= 2)
        .collect()
    )
    out = {r["doc_id"]: r for r in substring_dup_spans(spark, SF_DIR).collect()}
    checked = 0
    for g in dup_docs:
        for d in g["ids"]:
            if d in out:  # docs shorter than one window are excluded
                assert out[d]["dup_frac"] == 1.0, (d, out[d])
                checked += 1
    # fractions are consistent: n_dup <= n_windows, frac in [0, 1]
    for r in out.values():
        assert 0 <= r["n_dup_windows"] <= r["n_windows"]
        assert 0.0 <= r["dup_frac"] <= 1.0


def test_frame_sample_caps_and_strides(spark):
    from distribution_engine_smt_spark.pipeline.multimodal import (
        FRAME_CAP,
        FRAME_HOP,
        multimodal_frame_sample,
    )

    rows = multimodal_frame_sample(spark, SF_DIR).collect()
    assert rows, "no frames sampled"
    per_doc: dict[int, list[int]] = {}
    for r in rows:
        assert r["doc_id"] % 3 == 2  # video payloads only
        assert r["frame_idx"] % FRAME_HOP == 0
        per_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for d, idxs in per_doc.items():
        assert len(idxs) <= FRAME_CAP, (d, idxs)
        assert sorted(idxs) == list(range(0, FRAME_HOP * len(idxs), FRAME_HOP))


def test_trained_ivf_agrees_with_bruteforce_on_shared_results(spark):
    """The trained-IVF probe computes the SAME cosine as the exact
    brute-force ranker for any vector both return, and never exceeds the
    brute-force best."""
    from distribution_engine_smt_spark.pipeline.clustering import (
        ann_ivf_kmeans_topk,
    )
    from distribution_engine_smt_spark.pipeline.similarity import (
        ann_topk_bruteforce,
    )

    ivf = {r["vec_id"]: r["cos"] for r in ann_ivf_kmeans_topk(spark, SF_DIR).collect()}
    bf = {r["vec_id"]: r["cos"] for r in ann_topk_bruteforce(spark, SF_DIR).collect()}
    assert ivf, "IVF probe returned nothing"
    for vid in set(ivf) & set(bf):
        assert ivf[vid] == bf[vid]  # bit-identical fixed-order folds
    assert max(ivf.values()) <= max(bf.values()) + 0.0


def test_resize_emits_error_row_for_null_payload(spark):
    """Null payloads must surface as 'error:empty' rows (matching the
    oracle's CASE branches), never silently disappear."""
    from distribution_engine_smt_spark.pipeline.multimodal import resize_media

    media = spark.createDataFrame(
        [(1, "image/png", bytearray(b"abc")), (2, "image/png", None)],
        "doc_id long, media_type string, payload binary",
    )
    rows = {r["doc_id"]: r for r in resize_media(media).collect()}
    assert rows[1]["status"] == "ok:stub" and rows[1]["out_bytes"] == 224 * 224 * 3
    err = rows[2]
    assert err["status"] == "error:empty"
    assert err["width"] is None and err["height"] is None
    assert err["scale_num"] is None and err["out_bytes"] == 0


def test_nprobe_trained_ivf_dominates_single_cell_probe(spark):
    """nprobe=2 searches a superset of the single-cell probe, so its
    ranked cosine list must dominate position-by-position."""
    from distribution_engine_smt_spark.pipeline.clustering import (
        ann_ivf_kmeans_nprobe,
        ann_ivf_kmeans_topk,
    )

    single = [r["cos"] for r in ann_ivf_kmeans_topk(spark, SF_DIR).collect()]
    multi = [r["cos"] for r in ann_ivf_kmeans_nprobe(spark, SF_DIR).collect()]
    assert multi and single
    for m, s in zip(multi, single):
        assert m >= s
