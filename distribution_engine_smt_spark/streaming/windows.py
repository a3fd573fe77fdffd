"""Event-time tumbling-window aggregation — the Structured Streaming
windowed-agg shape (`F.window` + watermark) with a batch twin.

The SAME column logic serves both paths: the batch query
(`pipeline.temporal.tumbling_event_counts`) runs it over the static events
table and is oracled against DuckDB's date_trunc, while
`run_tumbling_stream` runs it as a real readStream with an event-time
watermark. At scale the streaming path is the one you deploy (incremental
state, late-data eviction via watermark); the batch path is the backfill.

Sums are computed in DECIMAL(18,2) space (cast the INPUT double, never a
product) so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WINDOW = "1 hour"
WATERMARK = "1 hour"


def tumbling_counts(events: DataFrame) -> DataFrame:
    """Per (hour, event_type): event count + exact decimal value sum.
    Epoch-aligned 1-hour tumbling windows, so `window.start` equals
    DuckDB's `date_trunc('hour', ts)`."""
    return (
        events.groupBy(F.window(F.col("ts"), WINDOW).alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            # decimal-space sum (exact, engine-portable), double on the way
            # out so both engines stringify identically
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_tumbling_stream(
    spark,
    source_dir: str,
    schema,
    checkpoint_dir: str,
    query_name: str = "tumbling_counts",
    output_mode: str = "complete",
):
    """Streaming twin: file source -> watermark -> tumbling agg -> memory
    sink. availableNow drains the source then stops, which is also the
    catch-up/backfill pattern for a real deployment.

    Output mode governs state retention: in the default ``complete`` mode
    Spark keeps ALL window state regardless of the watermark — that is
    demo/test plumbing (the memory sink re-emits the full result, which is
    what the drain-equals-batch test compares).  For production pass
    ``update`` (or ``append``) with a keyed/append sink: only then does the
    watermark actually evict windows older than max event time minus 1 h —
    otherwise a month of events keeps 720 windows x event_types live
    forever.  The watermark declaration itself is shared by both modes.
    """
    raw = spark.readStream.schema(schema).parquet(source_dir)
    if dict(raw.dtypes).get("ts") == "bigint":
        # driver parquet stores TIMESTAMP(NANOS) -> read as nanos long
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # watermarks require TIMESTAMP (not NTZ); session TZ is pinned UTC so
    # the wall-clock values match the batch twin's NTZ values exactly
    raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = tumbling_counts(raw.withWatermark("ts", WATERMARK))
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


SESSION_GAP = "30 minutes"


def session_counts(events: DataFrame) -> DataFrame:
    """Per (user, session): event count + span, sessions defined by
    ``F.session_window`` with a 30-minute inactivity gap — the same gap as
    the batch ``pipeline.temporal.sessionize``.

    Semantic note (documented, not a bug): ``session_window`` starts a new
    session when an event lands AT exactly last_ts + gap, while the batch
    lag-based formulation keeps it (``gap > threshold`` starts new).  The
    two disagree only on microsecond-exact 30:00.000000 gaps, which real
    event streams don't produce; the drain-equals-batch test asserts
    equality against BOTH formulations on the test corpus.
    """
    return (
        events.groupBy(
            F.session_window(F.col("ts"), SESSION_GAP).alias("w"), "user_id"
        )
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("start_ts"),
            F.col("w.end").alias("end_ts"),
            "n_events",
        )
    )


def run_sessionize_stream(
    spark,
    source_dir: str,
    schema,
    checkpoint_dir: str,
    query_name: str = "session_counts",
    output_mode: str = "complete",
):
    """Streaming twin of ``pipeline.temporal.sessionize``: file source ->
    watermark -> session-window agg -> memory sink.  Session windows are
    the one windowed aggregation whose state Spark must MERGE as rows
    arrive (a late event can fuse two open sessions), so this is the
    canonical stateful-session deployment shape: watermark bounds how long
    a session can stay open to merging, and once the watermark passes
    session_end + gap the session is final and its state evicted (in
    update/append mode; ``complete`` retains all state — test plumbing,
    same caveat as ``run_tumbling_stream``).
    """
    raw = spark.readStream.schema(schema).parquet(source_dir)
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = session_counts(raw.withWatermark("ts", WATERMARK))
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_streaming_dedup(
    spark,
    source_dir: str,
    schema,
    checkpoint_dir: str,
    query_name: str = "stream_dedup",
):
    """Streaming exact dedup for document ingestion: md5(content) is the
    identity key, ``dropDuplicatesWithinWatermark`` keeps the first arrival
    per key and — unlike plain dropDuplicates — EVICTS key state once the
    watermark passes, so state is bounded by the dedup horizon instead of
    corpus cardinality. This is the ingest-time half of the dedup story;
    the batch operators (dedup_exact / dedup_exact_keep_first) are the
    backfill half over data already at rest.

    Event time is derived from doc_id (the synthetic corpus has no
    timestamp column); a real feed uses its ingest timestamp. At 100 TB
    the state store is RocksDB-backed and keyed by the md5 — a few dozen
    bytes per in-horizon document.
    """
    raw = spark.readStream.schema(schema).parquet(source_dir)
    docs = raw.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("h"),
        # +1 day: the initial watermark is the epoch, and a row whose event
        # time equals the watermark is discarded as late — doc_id 0 must
        # not land exactly on it
        F.timestamp_micros((F.col("doc_id") + 86_400) * 1_000_000)
        .cast("timestamp")
        .alias("ts"),
    )
    deduped = docs.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["h"])
    return (
        deduped.select("doc_id", "h")
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_range_join_stream(
    spark,
    source_dir: str,
    schema,
    checkpoint_dir: str,
    query_name: str = "stream_range_join",
):
    """Stream-stream interval join: error events joined to signup events
    within +/-60 s — the streaming twin of the batch
    ``pipeline.temporal.range_join_events`` (same output columns; a test
    proves the drained stream equals the batch result).

    Both sides carry a watermark and the join predicate bounds event-time
    distance in BOTH directions, which is what lets Spark evict join state:
    an error older than (watermark - 60 s) can never match a future signup
    and its buffered row is dropped. Spark additionally REQUIRES an
    equality predicate on stream-stream joins — supplied by the same
    window-width time-bin trick as the batch plan (the error side fans out
    to its 3 adjacent bins, the signup side keeps its own bin), so the
    streaming plan is literally the batch plan running incrementally.
    This is the §2.9 completion piece next to the windowed agg and the
    streaming dedup.
    """
    from ..pipeline.temporal import RANGE_WINDOW_US

    def _side(event_type, alias_prefix):
        raw = spark.readStream.schema(schema).parquet(source_dir)
        if dict(raw.dtypes).get("ts") == "bigint":
            raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return (
            raw.withColumn("ts", F.col("ts").cast("timestamp"))
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{alias_prefix}_id"),
                F.col("ts").alias(f"{alias_prefix}_ts"),
            )
            .withWatermark(f"{alias_prefix}_ts", "1 minute")
        )

    def _bin(ts_col):
        epoch_us = F.timestamp_diff(
            "MICROSECOND", F.lit("1970-01-01 00:00:00").cast("timestamp"), ts_col
        )
        return F.floor(epoch_us / RANGE_WINDOW_US)

    errors = _side("error", "error").withColumn(
        "bin",
        F.explode(
            F.array(
                _bin(F.col("error_ts")) - 1,
                _bin(F.col("error_ts")),
                _bin(F.col("error_ts")) + 1,
            )
        ),
    )
    signups = _side("signup", "signup").withColumn("bin", _bin(F.col("signup_ts")))
    joined = errors.join(
        signups,
        (errors["bin"] == signups["bin"])
        & (F.col("signup_ts") >= F.col("error_ts") - F.expr("INTERVAL 60 SECONDS"))
        & (F.col("signup_ts") <= F.col("error_ts") + F.expr("INTERVAL 60 SECONDS")),
        "inner",
    ).select(
        "error_id",
        "signup_id",
        F.timestamp_diff("MICROSECOND", F.col("error_ts"), F.col("signup_ts"))
        .cast("long")
        .alias("dt_us"),
    )
    return (
        joined.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


SLIDE = "30 minutes"


def sliding_counts(events: DataFrame) -> DataFrame:
    """Per (sliding 1 h window with 30 min hop, event_type): count + exact
    decimal value sum. Every event lands in exactly window/slide = 2
    windows; starts are epoch-aligned so `window.start` equals DuckDB's
    ``time_bucket(30 min, ts) - k*30 min`` construction."""
    return (
        events.groupBy(
            F.window(F.col("ts"), WINDOW, SLIDE).alias("w"), "event_type"
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_sliding_stream(
    spark,
    source_dir: str,
    schema,
    checkpoint_dir: str,
    query_name: str = "sliding_counts",
    output_mode: str = "complete",
):
    """Streaming twin of ``pipeline.temporal.sliding_event_counts`` — the
    same shape as ``run_tumbling_stream`` but with overlapping windows:
    state holds window/slide = 2 open windows per (grid slot, event_type)
    until the watermark passes the window END, so eviction lag is window
    length + watermark, not slide + watermark. Same output-mode caveats
    as the tumbling runner (complete retains all state; use update/append
    against a keyed sink in production)."""
    raw = spark.readStream.schema(schema).parquet(source_dir)
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = sliding_counts(raw.withWatermark("ts", WATERMARK))
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _run_sketch_stream(spark, source_dir, schema, out_dir, checkpoint_dir, build):
    """Shared bounded-state sketch-stream discipline: file source ->
    ``build(raw)`` (a streaming aggregation whose state is bounded by the
    sketch layout, no watermark — "ever" semantics) -> complete-mode
    foreachBatch that OVERWRITES the parquet sink with the full sketch
    each trigger. Overwrite makes at-least-once replay idempotent, and
    the checkpointed state store carries the sketch across restarts (the
    two-wave resume tests prove drained state ≡ the batch sketch).
    Estimates/probes are computed on read over the sink table —
    multi-level aggregation inside one streaming query is unsupported,
    and finalize-on-read is how a sketch store is consumed anyway."""
    raw = spark.readStream.schema(schema).parquet(source_dir)

    def write_sketch(batch_df, batch_id: int):
        batch_df.write.mode("overwrite").parquet(out_dir)

    return (
        build(raw)
        .writeStream.foreachBatch(write_sketch)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_hll_stream(
    spark,
    source_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
):
    """Streaming HyperLogLog: maintain the per-(event_type, bucket)
    register table as a live streaming aggregation — the sketch whose
    state CANNOT grow with cardinality. A streaming exact count-distinct
    keeps one state row per key forever; the HLL register agg keeps at
    most groups x 32 rows no matter how many distinct users flow past.
    Registers merge by max, so the streaming update path IS the batch
    fold — ``pipeline.sketches.hll_registers`` provides the identical
    bucket/rho columns for both; finalize with ``hll_estimate`` on
    read."""
    from ..pipeline.sketches import hll_registers

    return _run_sketch_stream(
        spark,
        source_dir,
        schema,
        out_dir,
        checkpoint_dir,
        lambda raw: hll_registers(
            raw, ["event_type"], "CAST(CAST(user_id AS STRING) AS BINARY)"
        ),
    )


def run_cms_stream(
    spark,
    source_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
):
    """Streaming count-min sketch: maintain the 4 x 512 cell grid as a
    live aggregation over arriving documents — the ADDITIVE merge class
    (``run_hll_stream`` is the max class). State is bounded at
    depth x width rows whatever the token cardinality; heavy-hitter
    queries are answered on read by probing the sink grid, exactly like
    the batch ``cms_heavy_hitters`` probe stage."""
    from ..pipeline.sketches import cms_cells

    return _run_sketch_stream(
        spark,
        source_dir,
        schema,
        out_dir,
        checkpoint_dir,
        lambda raw: cms_cells(
            raw.select(
                F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
            )
        ),
    )


def run_hourly_hll_stream(
    spark,
    source_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
):
    """Windowed streaming HLL: per-(hour, bucket) registers as a live
    aggregation — the continuous form of the dashboard distinct-per-hour
    query (``pipeline.sketches.hourly_hll_distinct`` is the batch/
    backfill twin). State is 32 registers per hour seen: bounded per
    window by construction; over an unbounded horizon a production
    deployment groups on ``F.window`` with a watermark + update-mode
    keyed sink so closed hours evict (same trade documented on
    ``run_tumbling_stream``) — the availableNow drain here retains all
    hours, which is what the drain-equals-batch test compares."""
    from ..pipeline.sketches import hll_registers

    return _run_sketch_stream(
        spark,
        source_dir,
        schema,
        out_dir,
        checkpoint_dir,
        lambda raw: hll_registers(
            raw.withColumn("hour", F.date_trunc("hour", F.col("ts"))),
            ["hour"],
            "CAST(CAST(user_id AS STRING) AS BINARY)",
        ),
    )


def run_sample_store_stream(
    spark,
    source_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
):
    """Streaming maintainer for the quantile sample store: the hash
    threshold is a STATELESS filter, so sample maintenance needs no
    aggregation state at all — each micro-batch's surviving rows land in
    their day partitions. Hash sampling commutes with union, so the
    incrementally-built store is identical to a batch rebuild
    (drain-equals-batch test), and range reads keep pruning partitions.

    Replay-safety: foreachBatch is at-least-once, and an append sink
    would duplicate sample rows on replay; writing each batch's days via
    dynamic partition overwrite is idempotent only per-batch-boundary,
    so each batch writes to batch-scoped subdirectories of each day
    (day=<d>/batch_id=<n>) — a replay rewrites the same subdirectory
    with the same deterministic rows. Readers glob the day level and
    see exactly-once data."""
    from ..pipeline.sketches import quantile_sample_predicate

    raw = spark.readStream.schema(schema).parquet(source_dir)
    sample = raw.filter(quantile_sample_predicate()).select(
        "event_type",
        "event_id",
        "value",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        ),
    )

    def write_batch(batch_df, batch_id: int):
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("day", "batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out_dir)
        )

    return (
        sample.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_kmv_stream(
    spark,
    source_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    k: int,
):
    """Streaming KMV bottom-k (min-merge class): engine-side md5 hashing
    feeds the ``applyInPandasWithState`` fold
    (``stateful.kmv_sketch_stream``); each micro-batch emits the updated
    keys' sketch summaries. Update mode means a batch carries only the
    keys it touched, so the sink is per-key DYNAMIC partition overwrite
    (event_type = the partition): touched keys rewrite deterministically
    (replay-safe), untouched keys keep their last summary — a keyed
    upsert built from parquet primitives."""
    from ..pipeline.sketches import _hv
    from .stateful import kmv_sketch_stream

    raw = spark.readStream.schema(schema).parquet(source_dir)
    hashed = raw.select(
        "event_type",
        _hv("CAST(CAST(user_id AS STRING) AS BINARY)").alias("hv"),
    )
    sketch = kmv_sketch_stream(hashed, k)

    def write_batch(batch_df, batch_id: int):
        (
            batch_df.write.mode("overwrite")
            .partitionBy("event_type")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out_dir)
        )

    return (
        sketch.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
