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

from ..driver_queries import _t, register

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
