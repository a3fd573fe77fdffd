"""Benchmark decontamination and repetition-quality signals over the
``documents`` table.

Decontamination is the step every LLM training pipeline runs before
training: drop (or flag) any training document that shares a long n-gram
with the evaluation/benchmark set, so eval scores measure generalization
rather than memorization. The standard recipe (used by GPT-3/PaLM/Llama
data work) is exact n-gram overlap at n in [8, 13]; we use word-8-grams
here because the synthetic corpus's near-dup pairs overlap at that length.

Repetition signals are the Gopher-style quality heuristics: the fraction
of duplicated tokens and the fraction of characters inside word-2-grams
that occur more than once. Highly repetitive documents are boilerplate /
spam and get down-weighted or dropped.

Both have exact DuckDB oracle twins (md5 is the portable hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..driver_queries import _t, memoize_df, register
from ..session import tracked_persist

NGRAM_N = 8          # decontamination n-gram length (words)
BENCH_MOD = 5        # doc_id % BENCH_MOD == 0 plays the held-out eval set


def word_ngrams(text: Column, n: int) -> Column:
    """Distinct word-n-grams as strings. slice+array_join stays inside
    whole-stage codegen (see dedup.shingles); a short tail slice yields a
    partial gram exactly like DuckDB's NULL-skipping concat_ws."""
    toks = F.split(F.trim(text), " ")
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), cnt),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.array_distinct(grams)


def _ngram_sql(n: int) -> str:
    parts = ", ".join(f"toks[i+{j}]" for j in range(n))
    return f"""
      SELECT DISTINCT doc_id, md5(concat_ws(' ', {parts})) AS h
      FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents) s,
           unnest(generate_series(1, greatest(len(toks) - {n - 1}, 1))) t(i)
    """


# ---------------------------------------------------------------------------
# decontaminate: flag training docs sharing an 8-gram with the benchmark set
# ---------------------------------------------------------------------------
@register(
    "decontaminate",
    f"""
    WITH g AS ({_ngram_sql(NGRAM_N)}),
    bench AS (SELECT DISTINCT h FROM g WHERE doc_id % {BENCH_MOD} = 0),
    cand AS (SELECT doc_id, h FROM g WHERE doc_id % {BENCH_MOD} <> 0),
    hits AS (
      SELECT c.doc_id, count(*) AS n_shared
      FROM cand c JOIN bench b USING (h)
      GROUP BY c.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared,
           coalesce(n_shared, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % {BENCH_MOD} <> 0) d
    LEFT JOIN hits USING (doc_id)
    ORDER BY doc_id ASC
    """,
)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 8-gram overlap against a held-out benchmark slice.

    Scale plan: the benchmark n-gram set is TINY relative to the corpus
    (eval suites are a few MB even when the corpus is 100 TB), so it is
    aggregated once and BROADCAST into the training-corpus scan — the
    corpus-side pass is map-side (explode + broadcast semi-match + local
    partial count), with one small shuffle to sum per-doc hit counts.
    Hashing grams to md5 keeps the broadcast compact and the comparison
    fixed-width. The final left-join back onto the doc list is keyed by
    doc_id (same key as the count shuffle — no extra exchange under AQE).
    """
    docs = _t(spark, sf_dir)["documents"]
    grams = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                word_ngrams(F.col("text"), NGRAM_N),
                lambda g: F.md5(g.cast("binary")),
            )
        ).alias("h"),
    )
    bench = (
        grams.filter(F.col("doc_id") % BENCH_MOD == 0).select("h").distinct()
    )
    cand = grams.filter(F.col("doc_id") % BENCH_MOD != 0)
    hits = (
        cand.join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        docs.filter(F.col("doc_id") % BENCH_MOD != 0)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("long").alias("n_shared"),
            (F.coalesce(F.col("n_shared"), F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy(F.col("doc_id").asc())
    )


# ---------------------------------------------------------------------------
# repetition signals: duplicate-token ratio + duplicated-2-gram char fraction
# ---------------------------------------------------------------------------
@register(
    "text_repetition",
    """
    WITH s AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
    ),
    base AS (
      SELECT doc_id,
             round(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
               AS dup_token_ratio,
             toks
      FROM s
    ),
    g AS (
      SELECT doc_id, concat_ws(' ', toks[i], toks[i+1]) AS gram
      FROM base, unnest(generate_series(1, greatest(len(toks) - 1, 1))) t(i)
    ),
    cnt AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2)
    SELECT cnt.doc_id,
           max(base.dup_token_ratio) AS dup_token_ratio,
           round(coalesce(CAST(sum(c * length(gram)) FILTER (WHERE c > 1) AS DOUBLE)
                          / sum(c * length(gram)), 0.0), 6) AS dup_2gram_char_ratio
    FROM cnt JOIN base ON cnt.doc_id = base.doc_id
    GROUP BY cnt.doc_id
    ORDER BY cnt.doc_id ASC
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition heuristics per document — entirely MAP-SIDE.

    Both metrics are per-document, so no cross-document aggregation exists
    and no shuffle is needed (the round-3 version exploded every 2-gram
    through groupBy(doc_id, gram) -> groupBy(doc_id): two full shuffles of
    the gram set; this rewrite is ~13x faster at sf0.1 and shuffle-free at
    any scale). A gram INSTANCE is duplicated iff, in the doc's SORTED gram
    array, it equals its left or right neighbor — sum the lengths of
    duplicated instances over the total gram characters. dup_token_ratio is
    1 - distinct/total over whitespace tokens.
    """
    docs = _t(spark, sf_dir)["documents"]
    toks = F.split(F.trim(F.col("text")), " ")
    dup_token_ratio = F.round(
        F.lit(1.0)
        - F.size(F.array_distinct(toks)).cast("double") / F.size(toks),
        6,
    )
    n = F.greatest(F.size(toks) - 1, F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n), lambda i: F.array_join(F.slice(toks, i, 2), " ")
    )
    s = F.array_sort(grams)

    def _dup_len(x, i):  # i is transform's 0-based index
        prev = F.when(i >= F.lit(1), F.try_element_at(s, i))  # 1-based i-1
        nxt = F.try_element_at(s, i + F.lit(2))               # 1-based i+1
        return F.when((x == prev) | (x == nxt), F.length(x)).otherwise(F.lit(0))

    dup_chars = F.aggregate(
        F.transform(s, _dup_len), F.lit(0).cast("long"), lambda a, x: a + x
    )
    tot_chars = F.aggregate(
        F.transform(s, lambda x: F.length(x)), F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return docs.select(
        "doc_id",
        dup_token_ratio.alias("dup_token_ratio"),
        F.round(
            F.coalesce(dup_chars.cast("double") / tot_chars, F.lit(0.0)), 6
        ).alias("dup_2gram_char_ratio"),
    ).orderBy(F.col("doc_id").asc())


# ---------------------------------------------------------------------------
# fuzzy decontamination: MinHash signature agreement vs the benchmark set
# ---------------------------------------------------------------------------
MINHASH_DECON_AGREE = 4  # flag at >= 4 of 8 agreeing components (est J >= .5)


def _minhash_decon_sql() -> str:
    from .dedup import N_HASHES, _SHINGLE_SQL, _SIG_COLS_SQL

    agree = " + ".join(
        f"(CASE WHEN t.m{h} = b.m{h} THEN 1 ELSE 0 END)" for h in range(N_HASHES)
    )
    return f"""
    WITH sh AS ({_SHINGLE_SQL}),
    sig AS (SELECT doc_id, {_SIG_COLS_SQL} FROM sh GROUP BY doc_id),
    bench AS (SELECT * FROM sig WHERE doc_id % {BENCH_MOD} = 0),
    train AS (SELECT * FROM sig WHERE doc_id % {BENCH_MOD} <> 0),
    pairs AS (
      SELECT t.doc_id, b.doc_id AS bench_id, {agree} AS n_agree
      FROM train t CROSS JOIN bench b
    ),
    best AS (SELECT doc_id, max(n_agree) AS n_agree FROM pairs GROUP BY doc_id),
    hit AS (
      SELECT p.doc_id, p.n_agree, min(p.bench_id) AS best_match
      FROM pairs p JOIN best ON p.doc_id = best.doc_id AND p.n_agree = best.n_agree
      WHERE p.n_agree >= 1
      GROUP BY p.doc_id, p.n_agree
    )
    SELECT t.doc_id,
           CAST(coalesce(h.n_agree, 0) AS BIGINT) AS n_agree,
           h.best_match,
           coalesce(h.n_agree, 0) >= {MINHASH_DECON_AGREE} AS flagged
    FROM train t LEFT JOIN hit h USING (doc_id)
    ORDER BY doc_id ASC
    """


@register("minhash_decontaminate", _minhash_decon_sql())
@memoize_df
def minhash_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy decontamination via MinHash signature agreement — catches
    paraphrased/partially-edited benchmark leakage the exact-8-gram pass
    misses. Per training doc: the max number of agreeing signature
    components against any benchmark doc (n_agree/8 estimates Jaccard),
    the lowest-id benchmark doc achieving it, and a flag at est J >= 0.5.

    Scale: signatures are one groupBy pass (shared machinery with
    dedup_minhash_lsh). Agreement is a POSTING-LIST join, not a
    train x bench scan (r12 — the broadcast nested loop was the cold_top
    entry at sf0.1 and is O(train x bench) at any scale): both sides
    explode to (component position, value) rows, the tiny benchmark side
    broadcasts, and one equi-join on (h, val) yields exactly the pairs
    sharing >= 1 signature component — a MinHash component can only
    agree by colliding, so the join IS the agreement test and pair work
    is O(matching components), the LSH banding discipline. Pairs with
    zero agreement (the overwhelming majority) never materialize; the
    left join at the end restores their n_agree = 0 rows. The argmax is
    decomposed as max + min-id-at-max (both order-independent
    aggregates), never an engine-specific max_by."""
    from .dedup import minhash_signature

    sig = minhash_signature(spark, sf_dir)
    bench = sig.filter(F.col("doc_id") % BENCH_MOD == 0)
    train = sig.filter(F.col("doc_id") % BENCH_MOD != 0)
    hit = _best_agreement(train, bench)
    return (
        train.select("doc_id")
        .join(hit, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_agree"), F.lit(0)).cast("long").alias("n_agree"),
            "best_match",
            (F.coalesce(F.col("n_agree"), F.lit(0)) >= MINHASH_DECON_AGREE).alias(
                "flagged"
            ),
        )
        .orderBy(F.col("doc_id").asc())
    )


def _sig_long(sig: DataFrame, id_alias: str) -> DataFrame:
    """(id, h, val) posting rows of a signature frame — one row per
    signature component, the join-side shape of the agreement test."""
    from .dedup import N_HASHES

    return sig.select(
        F.col("doc_id").alias(id_alias),
        F.posexplode(
            F.array(*[F.col(f"m{h}") for h in range(N_HASHES)])
        ).alias("h", "val"),
    )


def _best_agreement(train_sig: DataFrame, bench_sig: DataFrame) -> DataFrame:
    """(doc_id, n_agree, best_match) for every TRAIN doc sharing >= 1
    signature component with some BENCH doc — the posting-join agreement
    core shared by the batch query and the streaming flag maintenance.
    n_agree = max agreeing components over the given bench docs;
    best_match = lowest bench id achieving it. Both aggregates are
    order-independent AND the (max, min-at-max) pair is ASSOCIATIVE
    across bench subsets — merging per-batch results reproduces the
    all-at-once answer, which is what makes the streaming twin's
    drain-equals-batch proof possible."""
    pairs = tracked_persist(
        _sig_long(train_sig, "doc_id")
        .join(F.broadcast(_sig_long(bench_sig, "bench_id")), ["h", "val"])
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").cast("int").alias("n_agree"))
    )  # tracked: feeds both the max and the min-id-at-max passes
    best = pairs.groupBy("doc_id").agg(F.max("n_agree").alias("n_agree"))
    return (
        pairs.join(best, ["doc_id", "n_agree"])
        .groupBy("doc_id", "n_agree")
        .agg(F.min("bench_id").alias("best_match"))
    )


# ---------------------------------------------------------------------------
# novelty: fraction of a doc's distinct 8-grams that occur in NO other doc
# ---------------------------------------------------------------------------
@register(
    "doc_novelty",
    f"""
    WITH g AS ({_ngram_sql(NGRAM_N)}),
    u AS (
      SELECT min(doc_id) AS doc_id, count(*) AS n_unique
      FROM (SELECT h, count(*) AS df, min(doc_id) AS doc_id FROM g GROUP BY h)
      WHERE df = 1
      GROUP BY doc_id
    ),
    tot AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(t.n_grams AS BIGINT) AS n_grams,
           CAST(coalesce(u.n_unique, 0) AS BIGINT) AS n_unique,
           round(coalesce(u.n_unique, 0)::DOUBLE / t.n_grams, 6) AS novelty
    FROM tot t LEFT JOIN u USING (doc_id)
    ORDER BY t.doc_id ASC
    """,
)
def doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-novelty score: the fraction of a document's distinct word
    8-grams whose corpus document-frequency is exactly 1. Low novelty =
    the document is assembled from text other documents already carry
    (boilerplate, mirrors, template spam) even when no single pair
    crosses a dedup threshold — the complement of the pairwise dedup
    family.

    Scale: a df=1 gram belongs to exactly ONE document, so min(doc_id)
    inside the df aggregation attributes it for free and the full
    inverted index never joins back against itself (measured 3x on the
    naive grams-join-df shape at sf0.1): one h-shuffle with partial
    aggregation, one doc_id fold per side, one tiny left join. Integer
    counts divide to identical doubles in both engines."""
    docs = _t(spark, sf_dir)["documents"]
    grams = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                word_ngrams(F.col("text"), NGRAM_N),
                lambda g: F.md5(g.cast("binary")),
            )
        ).alias("h"),
    )
    per_h = grams.groupBy("h").agg(
        F.count("*").alias("df"), F.min("doc_id").alias("doc_id")
    )
    uniq = (
        per_h.filter(F.col("df") == 1)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_unique"))
    )
    # per-doc gram totals straight off the scan: count(*) of the exploded
    # frame per doc == the ngram array's size (word_ngrams is never empty —
    # its gram count is greatest(len - 7, 1) >= 1 for any text including
    # null — so explode emits exactly size rows per doc), and the second
    # corpus-wide explode + doc_id shuffle the r11 plan paid for ``tot``
    # disappears; only the fundamental h-shuffle remains. No filter here:
    # a size guard would be pushed below the projection and evaluate the
    # ngram transform twice per row.
    tot = docs.select(
        "doc_id", F.size(word_ngrams(F.col("text"), NGRAM_N)).alias("n_grams")
    )
    return (
        tot.join(uniq, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.coalesce(F.col("n_unique"), F.lit(0)).cast("long").alias("n_unique"),
            F.round(
                F.coalesce(F.col("n_unique"), F.lit(0)).cast("double")
                / F.col("n_grams"),
                6,
            ).alias("novelty"),
        )
        .orderBy(F.col("doc_id").asc())
    )


# ---------------------------------------------------------------------------
# STREAMING decontamination: eval suites grow over releases, and
# re-flagging a 100 TB corpus per bench drop is a full posting join the
# pipeline should never re-pay. The flag table is maintained
# incrementally: each arriving wave of benchmark doc ids (1) leaves the
# train universe (delete_by_keys — a doc can't be both train and bench),
# (2) posting-joins ITS signatures against the remaining train
# signatures only, and (3) max-merges the per-batch (n_agree,
# best_match) into the table. The (max, min-id-at-max) pair is
# associative across bench subsets (see _best_agreement), so any split
# of the bench set into batches — including at-least-once replays, the
# merge is idempotent — drains to exactly the all-at-once batch answer
# (pinned by test_decontam_flag_stream_drain_equals_batch).
#
# Publication is a versioned-directory pointer (v-<uuid>/ + _current,
# os.replace — atomic): a crash anywhere leaves the previous version
# live and at worst an orphaned build directory, swept on the next
# publish. Single writer (foreachBatch-serialized), like every
# maintenance job here.
# ---------------------------------------------------------------------------


def _flags_current_path(flag_dir: str) -> str:
    import os

    return os.path.join(flag_dir, "_current")


def read_decontam_flags(spark: SparkSession, flag_dir: str) -> DataFrame:
    """The live flag table (doc_id, n_agree, best_match, flagged)."""
    import os

    with open(_flags_current_path(flag_dir)) as f:
        v = f.read().strip()
    return spark.read.parquet(os.path.join(flag_dir, v))


def _publish_decontam_flags(df: DataFrame, flag_dir: str) -> None:
    import os
    import shutil
    import uuid as _uuid

    os.makedirs(flag_dir, exist_ok=True)
    v = f"v-{_uuid.uuid4().hex[:8]}"
    # default partitioning: the flag table is corpus-sized. (At 100 TB
    # the version dir is partitioned by a doc_id range bucket and only
    # buckets containing changed rows are rewritten per wave — dynamic
    # partition overwrite, the adaptive-store batch discipline; the
    # versioned pointer stays the publication mechanism either way.)
    df.write.parquet(os.path.join(flag_dir, v))
    ptr = _flags_current_path(flag_dir)
    tmp = f"{ptr}.{_uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        f.write(v)
    os.replace(tmp, ptr)
    for entry in os.listdir(flag_dir):  # sweep superseded versions
        if entry.startswith("v-") and entry != v:
            shutil.rmtree(os.path.join(flag_dir, entry), ignore_errors=True)


def init_decontam_flags(spark: SparkSession, sf_dir: str, flag_dir: str) -> str:
    """Bootstrap the flag table: EVERY corpus doc is train (no benchmark
    has arrived yet), n_agree = 0, unflagged."""
    docs = _t(spark, sf_dir)["documents"].select(
        "doc_id",
        F.lit(0).cast("long").alias("n_agree"),
        F.lit(None).cast("long").alias("best_match"),
        F.lit(False).alias("flagged"),
    )
    _publish_decontam_flags(docs, flag_dir)
    return flag_dir


def update_decontam_flags(
    spark: SparkSession, sf_dir: str, new_bench_ids: DataFrame, flag_dir: str
) -> dict:
    """One incremental maintenance step for a wave of newly-arrived
    benchmark doc ids. Returns {"n_bench": ..., "n_changed": ...}."""
    from ..operators.merge import delete_by_keys
    from .dedup import minhash_signature
    from ..session import tracked_persist as _tp

    ids = _tp(new_bench_ids.select("doc_id").distinct())
    n_bench = ids.count()  # materializes ids once; bench waves are tiny
    cur = read_decontam_flags(spark, flag_dir)
    remaining = _tp(delete_by_keys(cur, ids, ["doc_id"]))
    sig = minhash_signature(spark, sf_dir)
    bench_sig = sig.join(F.broadcast(ids), "doc_id", "left_semi")
    train_sig = sig.join(
        F.broadcast(remaining.select("doc_id")), "doc_id", "left_semi"
    )
    delta = _tp(  # referenced twice: the merge below + the count
        _best_agreement(train_sig, bench_sig).select(
            "doc_id",
            F.col("n_agree").cast("long").alias("n_new"),
            F.col("best_match").alias("best_new"),
        )
    )
    merged = remaining.join(F.broadcast(delta), "doc_id", "left").select(
        "doc_id",
        F.greatest(
            F.col("n_agree"), F.coalesce(F.col("n_new"), F.lit(0))
        ).alias("n_agree"),
        F.when(F.col("n_new") > F.col("n_agree"), F.col("best_new"))
        .when(
            F.col("n_new") == F.col("n_agree"),
            F.least(F.col("best_match"), F.col("best_new")),
        )
        .otherwise(F.col("best_match"))
        .alias("best_match"),
        F.lit(False).alias("flagged"),
    )
    merged = merged.withColumn(
        "flagged", F.col("n_agree") >= MINHASH_DECON_AGREE
    )
    n_changed = delta.count()
    _publish_decontam_flags(merged, flag_dir)
    return {"n_bench": n_bench, "n_changed": n_changed}


def run_decontam_flag_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    sf_dir: str,
    flag_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Streaming twin: benchmark-doc-id arrivals -> incremental flag
    maintenance, the foreachBatch batch-first shell every store stream
    here uses (AvailableNow trigger; at-least-once replay is idempotent
    because the max-merge is)."""

    def ingest(batch_df, batch_id: int):
        update_decontam_flags(
            spark, sf_dir, batch_df.select("doc_id"), flag_dir
        )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(source_dir)
    return (
        raw.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
