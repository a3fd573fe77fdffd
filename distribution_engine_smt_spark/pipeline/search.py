"""Corpus search / vocabulary mining over ``documents``: n-gram frequency
mining and BM25 relevance ranking.

Both are the standard shapes a training-data pipeline runs to understand
and query a corpus:

* ``top_ngrams`` — corpus-wide bigram counts: explode per-doc bigrams,
  one hash-shuffle groupBy with map-side partial aggregation, top-k via
  ``TakeOrderedAndProject``. At 100 TB this is the canonical
  explode → partial-agg → final-agg plan; the reduce side only ever sees
  (vocab² cap) pre-aggregated rows per partition, not token instances.
* ``bm25_search`` — Okapi BM25 over a fixed term set: per-document term
  frequencies are map-only Column expressions; the corpus statistics
  (N, Σdl, per-term document frequencies) reduce to ONE single-row
  aggregate that is broadcast back over the scan — two passes over the
  data, zero wide shuffles. Float parity with the DuckDB oracle: avgdl is
  computed as exact-long Σdl / N (not ``avg``, whose internal accumulation
  order is engine-specific), the score expression uses the identical
  association order in both engines, and the final score is rounded to 6
  decimals, which also makes the (score DESC, doc_id ASC) top-k ordering
  engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..driver_queries import _t, register
from .textstats import tokens

# ---------------------------------------------------------------------------
# corpus-wide bigram mining
# ---------------------------------------------------------------------------


@register(
    "top_ngrams",
    r"""
    WITH toks AS (
      SELECT string_split_regex(trim(text), '\s+') AS t
      FROM documents
      WHERE len(string_split_regex(trim(text), '\s+')) >= 2
    ),
    grams AS (
      SELECT unnest(list_transform(range(2, len(t) + 1),
                                   i -> t[i - 1] || ' ' || t[i])) AS gram
      FROM toks
    )
    SELECT gram, count(*) AS n
    FROM grams
    GROUP BY gram
    ORDER BY n DESC, gram ASC
    LIMIT 20
    """,
)
def top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    toked = t["documents"].select(tokens(F.col("text")).alias("t"))
    # Guard size>=2 BEFORE sequence(): Spark's sequence(1, 0) yields the
    # descending [1, 0], not an empty array.
    grams = (
        toked.where(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, size(t) - 1), i -> concat(t[i - 1], ' ', t[i]))")
            ).alias("gram")
        )
    )
    return (
        grams.groupBy("gram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("gram").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# BM25 ranking for a fixed query term set
# ---------------------------------------------------------------------------

BM25_TERMS = ["customer", "query", "window"]
BM25_K1 = 1.2
BM25_B = 0.75


def _bm25_term_score(tf, dl_norm, n, df):
    """One term's BM25 contribution; identical association order to the SQL.

    idf = ln(1 + (N - df + 0.5) / (df + 0.5))
    w   = idf * (tf * (k1 + 1)) / (tf + k1 * dl_norm)
    """
    idf = F.log(
        F.lit(1.0) + (n - df + F.lit(0.5)) / (df + F.lit(0.5))
    )
    return idf * (tf * F.lit(BM25_K1 + 1.0)) / (tf + F.lit(BM25_K1) * dl_norm)


@register(
    "bm25_search",
    f"""
    WITH m AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS dl,
             len(list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> x = '{BM25_TERMS[0]}')) AS tf0,
             len(list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> x = '{BM25_TERMS[1]}')) AS tf1,
             len(list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> x = '{BM25_TERMS[2]}')) AS tf2
      FROM documents
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
             CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
             CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
      FROM m
    )
    SELECT doc_id,
           round(
             ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5))
               * (CAST(tf0 AS DOUBLE) * {BM25_K1 + 1.0})
               / (CAST(tf0 AS DOUBLE)
                  + {BM25_K1} * (1.0 - {BM25_B}
                                 + {BM25_B} * (CAST(dl AS DOUBLE) / avgdl)))
           + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5))
               * (CAST(tf1 AS DOUBLE) * {BM25_K1 + 1.0})
               / (CAST(tf1 AS DOUBLE)
                  + {BM25_K1} * (1.0 - {BM25_B}
                                 + {BM25_B} * (CAST(dl AS DOUBLE) / avgdl)))
           + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5))
               * (CAST(tf2 AS DOUBLE) * {BM25_K1 + 1.0})
               / (CAST(tf2 AS DOUBLE)
                  + {BM25_K1} * (1.0 - {BM25_B}
                                 + {BM25_B} * (CAST(dl AS DOUBLE) / avgdl))),
           6) AS bm25
    FROM m, s
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT 20
    """,
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    toks = tokens(F.col("text"))
    m = t["documents"].select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        *[
            # closure factory, not a default arg: F.filter dispatches on the
            # lambda's arity, so a 2-parameter lambda would be called as
            # (value, index) and the term would silently become the index
            F.size(F.filter(toks, (lambda t: lambda x: x == F.lit(t))(term)))
            .cast("long")
            .alias(f"tf{i}")
            for i, term in enumerate(BM25_TERMS)
        ],
    )
    # ONE single-row corpus-stats aggregate, broadcast back over the scan.
    stats = m.agg(
        F.count("*").cast("double").alias("n"),
        (F.sum("dl").cast("double") / F.count("*").cast("double")).alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("int")).cast("double").alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    scored = m.crossJoin(F.broadcast(stats))
    dl_norm = (
        F.lit(1.0 - BM25_B)
        + F.lit(BM25_B) * (F.col("dl").cast("double") / F.col("avgdl"))
    )
    score = _bm25_term_score(
        F.col("tf0").cast("double"), dl_norm, F.col("n"), F.col("df0")
    )
    for i in range(1, len(BM25_TERMS)):
        score = score + _bm25_term_score(
            F.col(f"tf{i}").cast("double"), dl_norm, F.col("n"), F.col(f"df{i}")
        )
    return (
        scored.select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# unigram language-model perplexity (quality signal)
# ---------------------------------------------------------------------------


@register(
    "unigram_perplexity",
    r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents
    ),
    dtf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS ct
      FROM tok GROUP BY doc_id, tok
    ),
    freq AS (
      SELECT tok, CAST(count(*) AS DOUBLE) AS n_tok FROM tok GROUP BY tok
    ),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM tok),
    folded AS (
      SELECT d.doc_id,
             list(d.ct ORDER BY d.tok ASC) AS cts,
             list(f.n_tok / t.n_total ORDER BY d.tok ASC) AS ps,
             CAST(sum(d.ct) AS DOUBLE) AS dl
      FROM dtf d JOIN freq f ON d.tok = f.tok CROSS JOIN tot t
      GROUP BY d.doc_id
    )
    SELECT doc_id,
           round(exp(
             list_reduce(
               list_transform(range(1, len(cts) + 1),
                              i -> CAST(cts[i] AS DOUBLE) * -ln(ps[i])),
               (x, y) -> x + y) / dl), 6) AS ppl
    FROM folded
    ORDER BY doc_id ASC
    """,
)
def unigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity per document: exp(mean token negative
    log-probability), the classic cheap quality/outlier signal (documents
    whose vocabulary is unlike the corpus score high).

    Float parity across engines requires a DETERMINISTIC summation order
    for the per-document fold, and groupBy-SUM of doubles has none. So
    per-doc (token, count) pairs — exact integers — are collected, sorted
    by token, and folded left-to-right; the DuckDB twin uses ordered
    ``list(... ORDER BY tok)`` aggregates over the same pairs. (Same
    pattern as the z-score lag frame: move the float arithmetic into a
    fixed-order fold, keep the shuffled aggregation integer-only.)

    Scale: two corpus-keyed shuffles — (doc_id, tok) term counts, then the
    per-doc collect — plus the vocabulary frequency aggregate, which is
    vocabulary-sized and broadcast back into the join. Per-doc state is
    the distinct-terms-per-doc list, bounded by document length.
    """
    t = _t(spark, sf_dir)
    tok = t["documents"].select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    dtf = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("ct"))
    freq = tok.groupBy("tok").agg(F.count("*").cast("double").alias("n_tok"))
    tot = tok.agg(F.count("*").cast("double").alias("n_total"))
    joined = dtf.join(F.broadcast(freq), "tok").crossJoin(F.broadcast(tot))
    folded = joined.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("tok"),
                    F.col("ct"),
                    (F.col("n_tok") / F.col("n_total")).alias("p"),
                )
            )
        ).alias("terms"),
        F.sum("ct").cast("double").alias("dl"),
    )
    nll = F.aggregate(
        F.col("terms"),
        F.lit(0.0),
        lambda acc, s: acc + s["ct"].cast("double") * -F.log(s["p"]),
    )
    return (
        folded.select(
            "doc_id", F.round(F.exp(nll / F.col("dl")), 6).alias("ppl")
        )
        .orderBy(F.col("doc_id").asc())
    )
