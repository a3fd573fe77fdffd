"""External-source adapters (SURVEY.md §2.1 S9/S10).

The reference enriches from live RPC endpoints: paged token-holder scans
(reference: server/app.py:356-377 — ``tokenApi.get_holder(1000, offset)``
loop) and on-demand post/follow fetches. These adapters make the rest of
the engine treat external data as ordinary DataFrames; the live JSON-RPC
transports live in ``rpc.py`` (``rpc_holder_pager``,
``rpc_find_one_fetcher``) and ``serving.build_state_server`` wires them
into the /get_staked_accounts and /info endpoints when supplied.

``paged_source`` pulls pages on the driver (the pagination protocol is
inherently sequential) but parses/distributes rows to executors per page,
so driver memory holds one page at a time — the same discipline the
reference's 1000-row pages enforce.
"""

from __future__ import annotations

from typing import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession


def paged_source(
    spark: SparkSession,
    fetch_page: Callable[[int, int], list[dict]],
    schema,
    page_size: int = 1000,
    max_pages: int = 10_000,
) -> DataFrame:
    """Materialize a paged external API as a DataFrame.

    ``fetch_page(limit, offset) -> rows`` mirrors the reference's holder
    scan; iteration stops at the first short page. Each page becomes its own
    partition-sized createDataFrame + union, keeping peak driver memory at
    one page."""
    frames: list[DataFrame] = []
    offset = 0
    for _ in range(max_pages):
        rows = fetch_page(page_size, offset)
        if not rows:
            break
        frames.append(spark.createDataFrame(rows, schema))
        if len(rows) < page_size:
            break
        offset += page_size
    if not frames:
        return spark.createDataFrame([], schema)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def staked_accounts(
    spark: SparkSession,
    fetch_page: Callable[[int, int], list[dict]],
    min_stake: float = 0.0,
) -> DataFrame:
    """Staked-accounts list (reference: server/app.py:356-377): paged holder
    scan -> filter positive stake. The reference caches this for 24 h; the
    caller owns TTL caching of the returned DataFrame (df.persist() + clock)."""
    from pyspark.sql import functions as F

    df = paged_source(
        spark, fetch_page, "account string, symbol string, stake double"
    )
    return df.filter(F.col("stake") > min_stake).select("account", "symbol", "stake")


DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_documents_jsonl(
    spark: SparkSession, path: str, source: str | None = None
) -> DataFrame:
    """Ingest documents from JSON-Lines — the interchange format crawl
    dumps and dataset releases actually ship. Schema-enforced read (no
    sampling-based inference pass: at 100 TB an inference scan doubles
    the ingest IO), tolerant of extra fields (dropped) and missing ones
    (NULL); ``n_chars`` is derived when absent so downstream quality/
    length operators never branch on provenance. ``source`` stamps a
    provenance label over whatever the file carries (a crawl batch
    usually IS the source). PERMISSIVE mode: a malformed line becomes a
    NULL row rather than failing the 1000-executor job; the caller's
    quality gate drops it."""
    from pyspark.sql import functions as F

    df = spark.read.schema(DOCUMENTS_SCHEMA).json(path)
    if source is not None:
        df = df.withColumn("source", F.lit(source))
    return df.withColumn(
        "n_chars",
        F.coalesce(F.col("n_chars"), F.length("text").cast("long")),
    )


def read_documents_text(
    spark: SparkSession, path: str, source: str = "files"
) -> DataFrame:
    """Ingest one-document-per-file corpora (the other common shape:
    scraped pages, transcripts, book dumps) into the documents schema.
    ``wholetext`` keeps each file one row; doc_id is a deterministic
    function of the file path (crc32 of the name — stable across
    re-ingests, unlike monotonically_increasing_id whose values depend
    on partition layout), lang left NULL for the lang-ID operator to
    fill. File-granular parallelism: at scale the read distributes by
    file, no driver-side listing loop."""
    from pyspark.sql import functions as F

    raw = (
        spark.read.format("text")
        .option("wholetext", "true")
        .load(path)
        .select(
            F.input_file_name().alias("fname"),
            F.col("value").alias("text"),
        )
    )
    return raw.select(
        F.crc32(F.col("fname")).cast("long").alias("doc_id"),
        "text",
        F.lit(None).cast("string").alias("lang"),
        F.lit(source).alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )


def write_documents_jsonl(
    df: DataFrame, path: str, partition_by: str | None = "source"
) -> None:
    """Export a documents frame as JSON-Lines — the sink half of the
    ingest pair (``read_documents_jsonl`` reads what this writes, field
    for field). Partitioned by provenance by default so per-source
    re-exports and downstream per-source reads stay directory-pruned;
    pass ``partition_by=None`` for a flat dump. Executor-parallel: one
    JSONL part file per task, no driver-side serialization loop."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.json(path)


def refresh_token_config(
    spark: SparkSession,
    token_config: DataFrame,
    fetch_configs: Callable[[], list],
) -> DataFrame:
    """Bulk token-config refresh from the engine config API (reference:
    update_token_config.py:17-23 — GET /config, then one
    ``table.upsert(config, ["token"])`` per row). Spark-first shape: the
    whole payload becomes ONE delta frame and ONE set-based
    ``merge_upsert`` keyed on ``token`` — the per-row loop collapses to a
    single keyed merge, which is the only formulation that survives a
    state table too big for a driver loop.

    ``dataset``-faithful partial-update semantics: only the fields the API
    payload actually carries overwrite existing columns (``update_cols``);
    columns the payload omits keep their stored value (a dict lacking a
    key leaves that column untouched in ``dataset.upsert``). Unknown
    payload fields are dropped; rows without a ``token`` key are invalid
    upserts and skipped. The live transport is
    ``rpc.rpc_config_fetcher(url)``; tests inject a local HTTP fixture."""
    from .operators.merge import merge_upsert
    from .schemas import TOKEN_CONFIG

    from decimal import Decimal

    from pyspark.sql.types import DecimalType, IntegerType, LongType, StructType

    rows = [r for r in fetch_configs() if isinstance(r, dict) and r.get("token")]
    if not rows:
        return token_config
    cols = [f.name for f in TOKEN_CONFIG.fields]
    present = [c for c in cols if any(c in r for r in rows)]
    sub = StructType([f for f in TOKEN_CONFIG.fields if f.name in present])

    def coerce(v, dtype):
        if v is None:
            return None
        if isinstance(dtype, DecimalType):
            return Decimal(str(v))
        if isinstance(dtype, (IntegerType, LongType)):
            return int(v)
        return v

    delta = spark.createDataFrame(
        [tuple(coerce(r.get(f.name), f.dataType) for f in sub.fields) for r in rows],
        sub,
    )
    return merge_upsert(
        token_config, delta, ["token"],
        update_cols=[c for c in present if c != "token"],
    )


def fetched_follows(
    spark: SparkSession,
    fetch_following: Callable[[str], Iterable[str]],
    accounts: Iterable[str],
) -> DataFrame:
    """S9 follow-refresh adapter: build the authoritative (follower,
    following) snapshot that ``processors.l1.refresh_follows`` reconciles
    against, from any per-account fetch callable (the reference calls the
    chain's ``get_following`` RPC per account on refresh —
    processors/comment_processor_for_engine.py:109-126, server/app.py
    follow-refresh path; the live transport stays out of engine scope).

    The fetch loop is driver-side like ``paged_source`` (one account's list
    at a time); accounts due for refresh per batch are few — the reference
    gates refresh on a per-account cooldown timestamp."""
    rows = [
        (acct, followed)
        for acct in accounts
        for followed in fetch_following(acct)
    ]
    schema = "follower string, following string"
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(rows, schema)
