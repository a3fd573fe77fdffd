"""The tumbling-window streaming aggregation must produce exactly the batch
twin's result when it drains the same data (availableNow catch-up)."""

from __future__ import annotations

import os

from distribution_engine_smt_spark.pipeline.temporal import tumbling_event_counts
from distribution_engine_smt_spark.streaming.windows import run_tumbling_stream

from .conftest import SF_DIR_ORACLE


def test_stream_matches_batch_twin(spark, tmp_path):
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in tumbling_event_counts(spark, SF_DIR_ORACLE).collect()
    }
    assert batch

    src = os.path.join(SF_DIR_ORACLE, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    # the file-stream source wants a directory; stage the file via symlink
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    os.symlink(src, stream_dir / "events.parquet")
    q = run_tumbling_stream(
        spark,
        str(stream_dir),
        raw_schema,
        str(tmp_path / "ckpt"),
        query_name="tw_test",
    )
    q.awaitTermination(120)
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM tw_test").collect()
    }
    assert streamed == batch


def test_streaming_dedup_keeps_one_per_content_hash(spark, tmp_path):
    import pyspark.sql.functions as F

    from distribution_engine_smt_spark.streaming.windows import run_streaming_dedup
    from distribution_engine_smt_spark.tables import load_tpch

    docs = load_tpch(spark, SF_DIR_ORACLE)["documents"]
    batch_hashes = {
        r["h"]
        for r in docs.select(F.md5(F.col("text").cast("binary")).alias("h"))
        .distinct()
        .collect()
    }

    # stage the corpus TWICE (two files, identical rows): the stream sees
    # every document duplicated and must keep exactly one per content hash
    src = os.path.join(SF_DIR_ORACLE, "documents.parquet")
    raw_schema = spark.read.parquet(src).schema
    stream_dir = tmp_path / "docs_stream"
    stream_dir.mkdir()
    os.symlink(src, stream_dir / "wave1.parquet")
    os.symlink(src, stream_dir / "wave2.parquet")
    q = run_streaming_dedup(
        spark, str(stream_dir), raw_schema, str(tmp_path / "ckpt2"),
        query_name="sd_test",
    )
    q.awaitTermination(120)
    kept = spark.sql("SELECT * FROM sd_test").collect()
    assert {r["h"] for r in kept} == batch_hashes  # every content survives once
    assert len(kept) == len(batch_hashes)          # and exactly once


def test_stream_sessionize_matches_batch_twin(spark, tmp_path):
    import pyspark.sql.functions as F

    from distribution_engine_smt_spark.pipeline.temporal import sessionize
    from distribution_engine_smt_spark.streaming.windows import (
        run_sessionize_stream,
        session_counts,
    )

    # batch twin #1: same session_window column logic over the static table
    ev = (
        spark.read.parquet(os.path.join(SF_DIR_ORACLE, "events.parquet"))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    batch = {
        (r["user_id"], r["start_ts"]): (r["end_ts"], r["n_events"])
        for r in session_counts(ev).collect()
    }
    assert batch

    src = os.path.join(SF_DIR_ORACLE, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stream_dir = tmp_path / "sess_stream"
    stream_dir.mkdir()
    os.symlink(src, stream_dir / "events.parquet")
    q = run_sessionize_stream(
        spark, str(stream_dir), raw_schema, str(tmp_path / "ckpt4"),
        query_name="sess_test",
    )
    q.awaitTermination(180)
    streamed = {
        (r["user_id"], r["start_ts"]): (r["end_ts"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_test").collect()
    }
    assert streamed == batch

    # batch twin #2: the lag-based sessionize operator (the oracled query)
    # agrees on session STRUCTURE — no exact-boundary gaps in the corpus,
    # so per-user session counts and event multisets are identical
    lag_based = sessionize(spark, SF_DIR_ORACLE).collect()
    assert len(lag_based) == len(streamed)
    from collections import Counter

    assert Counter((r["user_id"], r["n_events"]) for r in lag_based) == Counter(
        (u, n) for (u, _), (_, n) in streamed.items()
    )


def test_stream_range_join_matches_batch_twin(spark, tmp_path):
    from distribution_engine_smt_spark.pipeline.temporal import range_join_events
    from distribution_engine_smt_spark.streaming.windows import run_range_join_stream

    batch = {
        (r["error_id"], r["signup_id"]): r["dt_us"]
        for r in range_join_events(spark, SF_DIR_ORACLE).collect()
    }
    assert batch

    src = os.path.join(SF_DIR_ORACLE, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stream_dir = tmp_path / "rj_stream"
    stream_dir.mkdir()
    os.symlink(src, stream_dir / "events.parquet")
    q = run_range_join_stream(
        spark, str(stream_dir), raw_schema, str(tmp_path / "ckpt3"),
        query_name="rj_test",
    )
    q.awaitTermination(180)
    streamed = {
        (r["error_id"], r["signup_id"]): r["dt_us"]
        for r in spark.sql("SELECT * FROM rj_test").collect()
    }
    assert streamed == batch


def test_stream_media_decode_matches_batch_twin(spark, tmp_path):
    import os

    from distribution_engine_smt_spark.pipeline.multimodal import (
        multimodal_decode,
        run_media_decode_stream,
    )

    src = os.path.join(SF_DIR_ORACLE, "documents.parquet")
    raw_schema = spark.read.parquet(src).schema
    stream_dir = tmp_path / "media_stream"
    stream_dir.mkdir()
    os.symlink(src, stream_dir / "wave1.parquet")
    q = run_media_decode_stream(
        spark, str(stream_dir), raw_schema, str(tmp_path / "ckpt_media"),
        query_name="md_test",
    )
    q.awaitTermination(120)
    streamed = {
        r["doc_id"]: (r["media_type"], r["n_bytes"], r["width"], r["height"], r["status"])
        for r in spark.sql("SELECT * FROM md_test").collect()
    }
    batch = {
        r["doc_id"]: (r["media_type"], r["n_bytes"], r["width"], r["height"], r["status"])
        for r in multimodal_decode(spark, SF_DIR_ORACLE).collect()
    }
    assert streamed == batch


def test_sliding_stream_matches_batch_twin(spark, tmp_path):
    from distribution_engine_smt_spark.pipeline.temporal import sliding_event_counts
    from distribution_engine_smt_spark.streaming.windows import run_sliding_stream

    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in sliding_event_counts(spark, SF_DIR_ORACLE).collect()
    }
    assert batch
    # overlap sanity: sliding windows must hold ~2x the tumbling total
    assert sum(n for n, _ in batch.values()) == 2 * sum(
        r["n_events"]
        for r in tumbling_event_counts(spark, SF_DIR_ORACLE).collect()
    )

    src = os.path.join(SF_DIR_ORACLE, "events.parquet")
    raw_schema = spark.read.parquet(src).schema
    stream_dir = tmp_path / "events_sliding"
    stream_dir.mkdir()
    os.symlink(src, stream_dir / "events.parquet")
    q = run_sliding_stream(
        spark,
        str(stream_dir),
        raw_schema,
        str(tmp_path / "ckpt_sliding"),
        query_name="sw_test",
    )
    q.awaitTermination(120)
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sw_test").collect()
    }
    assert streamed == batch


def test_hll_stream_registers_survive_restart_and_match_batch(spark, tmp_path):
    """Two-wave drain with a checkpoint restart between waves: the
    streaming register state must merge across waves (max-merge in the
    state store) and finalize to exactly the batch sketch."""
    import pyspark.sql.functions as F

    from distribution_engine_smt_spark.pipeline.sketches import (
        hll_distinct,
        hll_estimate,
        hll_registers,
    )
    from distribution_engine_smt_spark.streaming.windows import run_hll_stream
    from distribution_engine_smt_spark.tables import load_tpch

    ev = load_tpch(spark, SF_DIR_ORACLE)["events"].select("event_type", "user_id")
    wave1 = ev.filter(F.col("user_id") % 2 == 0)
    wave2 = ev.filter(F.col("user_id") % 2 == 1)

    stream_dir = tmp_path / "hll_stream"
    stream_dir.mkdir()
    out_dir = str(tmp_path / "hll_registers")
    ckpt = str(tmp_path / "hll_ckpt")
    wave1.write.parquet(str(stream_dir / "wave1"))
    schema = wave1.schema

    def drain():
        q = run_hll_stream(
            spark, str(stream_dir / "*"), schema, out_dir, ckpt
        )
        q.awaitTermination(120)

    drain()
    regs_w1 = {
        (r["event_type"], r["bucket"]): r["m_j"]
        for r in spark.read.parquet(out_dir).collect()
    }
    batch_regs_w1 = {
        (r["event_type"], r["bucket"]): r["m_j"]
        for r in hll_registers(
            wave1, ["event_type"], "CAST(CAST(user_id AS STRING) AS BINARY)"
        ).collect()
    }
    assert regs_w1 == batch_regs_w1

    # wave 2 lands; a NEW query on the SAME checkpoint resumes the state
    wave2.write.parquet(str(stream_dir / "wave2"))
    drain()
    streamed = spark.read.parquet(out_dir)
    batch_regs = {
        (r["event_type"], r["bucket"]): r["m_j"]
        for r in hll_registers(
            ev, ["event_type"], "CAST(CAST(user_id AS STRING) AS BINARY)"
        ).collect()
    }
    assert {
        (r["event_type"], r["bucket"]): r["m_j"] for r in streamed.collect()
    } == batch_regs

    # finalizing the streamed registers gives the batch query's estimates
    est_stream = {
        r["event_type"]: r["est_distinct"]
        for r in hll_estimate(streamed, ["event_type"]).collect()
    }
    est_batch = {
        r["event_type"]: r["est_distinct"]
        for r in hll_distinct(spark, SF_DIR_ORACLE).collect()
    }
    assert est_stream == est_batch


def test_cms_stream_cells_survive_restart_and_match_batch(spark, tmp_path):
    """Additive-merge twin of the HLL restart test: the streamed CMS cell
    grid after a two-wave drain with a checkpoint restart must equal the
    batch grid built from the full corpus in one pass."""
    import pyspark.sql.functions as F

    from distribution_engine_smt_spark.pipeline.sketches import cms_cells
    from distribution_engine_smt_spark.streaming.windows import run_cms_stream
    from distribution_engine_smt_spark.tables import load_tpch

    docs = load_tpch(spark, SF_DIR_ORACLE)["documents"].select("doc_id", "text")
    wave1 = docs.filter(F.col("doc_id") % 2 == 0)
    wave2 = docs.filter(F.col("doc_id") % 2 == 1)

    stream_dir = tmp_path / "cms_stream"
    stream_dir.mkdir()
    out_dir = str(tmp_path / "cms_cells")
    ckpt = str(tmp_path / "cms_ckpt")
    wave1.write.parquet(str(stream_dir / "wave1"))
    schema = wave1.schema

    def drain():
        q = run_cms_stream(spark, str(stream_dir / "*"), schema, out_dir, ckpt)
        q.awaitTermination(120)

    drain()
    wave2.write.parquet(str(stream_dir / "wave2"))
    drain()

    streamed = {
        (r["j"], r["bucket"]): r["cell"]
        for r in spark.read.parquet(out_dir).collect()
    }
    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    )
    batch = {
        (r["j"], r["bucket"]): r["cell"] for r in cms_cells(toks).collect()
    }
    assert streamed == batch


def test_hourly_hll_stream_matches_batch_twin(spark, tmp_path):
    """Windowed-register variant of the HLL restart test: streamed
    per-hour registers across a two-wave drain finalize to exactly the
    batch hourly estimates."""
    import pyspark.sql.functions as F

    from distribution_engine_smt_spark.pipeline.sketches import (
        hll_estimate,
        hourly_hll_distinct,
    )
    from distribution_engine_smt_spark.streaming.windows import (
        run_hourly_hll_stream,
    )
    from distribution_engine_smt_spark.tables import load_tpch

    ev = load_tpch(spark, SF_DIR_ORACLE)["events"].select(
        "event_id", "ts", "user_id"
    )
    wave1 = ev.filter(F.col("event_id") % 2 == 0)
    wave2 = ev.filter(F.col("event_id") % 2 == 1)

    stream_dir = tmp_path / "hhll_stream"
    stream_dir.mkdir()
    out_dir = str(tmp_path / "hhll_registers")
    ckpt = str(tmp_path / "hhll_ckpt")
    wave1.write.parquet(str(stream_dir / "wave1"))
    schema = wave1.schema

    def drain():
        q = run_hourly_hll_stream(
            spark, str(stream_dir / "*"), schema, out_dir, ckpt
        )
        q.awaitTermination(120)

    drain()
    wave2.write.parquet(str(stream_dir / "wave2"))
    drain()

    est_stream = {
        r["hour"]: r["est_distinct"]
        for r in hll_estimate(spark.read.parquet(out_dir), ["hour"]).collect()
    }
    est_batch = {
        r["hour"]: r["est_distinct"]
        for r in hourly_hll_distinct(spark, SF_DIR_ORACLE).collect()
    }
    assert est_stream == est_batch


def test_sample_store_stream_equals_batch_store(spark, tmp_path):
    """The incrementally-maintained sample store (two waves, checkpoint
    restart between) holds exactly the batch-built store's rows, and
    range quantiles over it match the batch answer."""
    import pyspark.sql.functions as F

    from distribution_engine_smt_spark.pipeline.sketches import (
        quantile_sample_predicate,
        rank_quantiles,
    )
    from distribution_engine_smt_spark.streaming.windows import (
        run_sample_store_stream,
    )
    from distribution_engine_smt_spark.tables import load_tpch

    ev = load_tpch(spark, SF_DIR_ORACLE)["events"].select(
        "event_type", "event_id", "value", "ts"
    )
    wave1 = ev.filter(F.col("event_id") % 2 == 0)
    wave2 = ev.filter(F.col("event_id") % 2 == 1)

    stream_dir = tmp_path / "ss_stream"
    stream_dir.mkdir()
    out_dir = str(tmp_path / "ss_store")
    ckpt = str(tmp_path / "ss_ckpt")
    wave1.write.parquet(str(stream_dir / "wave1"))
    schema = wave1.schema

    def drain():
        q = run_sample_store_stream(
            spark, str(stream_dir / "*"), schema, out_dir, ckpt
        )
        q.awaitTermination(120)

    drain()
    wave2.write.parquet(str(stream_dir / "wave2"))
    drain()

    stored = spark.read.parquet(out_dir)
    batch_sample = ev.filter(quantile_sample_predicate())
    assert {
        (r["event_type"], r["event_id"], r["value"])
        for r in stored.collect()
    } == {
        (r["event_type"], r["event_id"], r["value"])
        for r in batch_sample.collect()
    }

    # quantiles computed over the streamed store match the batch sample
    streamed_q = {
        (r["event_type"], r["label"]): r["value"]
        for r in rank_quantiles(spark, stored, "n").collect()
    }
    batch_q = {
        (r["event_type"], r["label"]): r["value"]
        for r in rank_quantiles(spark, batch_sample, "n").collect()
    }
    assert streamed_q == batch_q
