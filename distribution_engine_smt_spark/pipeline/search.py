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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..driver_queries import ORACLE_SQL, _t, memoize_df, register
from ..session import tracked_persist
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


# The scoring SELECT (no ORDER/LIMIT tail) is the shared constant: the
# bm25_search oracle appends its top-k tail, and the RRF hybrid oracle
# embeds the same text as a CTE — identical lexical scores by construction,
# with no string surgery on registered SQL.
_BM25_SCORED_SQL = f"""
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
    """


@register(
    "bm25_search",
    _BM25_SCORED_SQL
    + """
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT 20
    """,
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bm25) for every document — unordered, unlimited; shared by
    bm25_search and the RRF hybrid ranker. Built as Spark-SQL text (one
    parse per projection; same Catalyst tree as the old Column-DSL form —
    see similarity.dot_fold_sql for the construction-cost rationale)."""
    from .textstats import tokens_sql

    t = _t(spark, sf_dir)
    toks = tokens_sql("text")
    m = t["documents"].selectExpr(
        "doc_id",
        f"CAST(size({toks}) AS BIGINT) AS dl",
        *[
            f"CAST(size(filter({toks}, x -> x = '{term}')) AS BIGINT) AS tf{i}"
            for i, term in enumerate(BM25_TERMS)
        ],
    )
    # ONE single-row corpus-stats aggregate, broadcast back over the scan.
    stats = m.agg(
        F.expr("CAST(count(*) AS DOUBLE) AS n"),
        F.expr("CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl"),
        *[
            F.expr(f"CAST(sum(CAST(tf{i} > 0 AS INT)) AS DOUBLE) AS df{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    scored = m.crossJoin(F.broadcast(stats))
    dl_norm = (
        f"({repr(1.0 - BM25_B)}D + {repr(BM25_B)}D"
        " * (CAST(dl AS DOUBLE) / avgdl))"
    )

    def term_score(i: int) -> str:
        # idf = ln(1 + (N - df + 0.5) / (df + 0.5));
        # w = idf * (tf * (k1 + 1)) / (tf + k1 * dl_norm) — identical
        # association order to the SQL oracle
        tf = f"CAST(tf{i} AS DOUBLE)"
        idf = f"ln(1.0D + (n - df{i} + 0.5D) / (df{i} + 0.5D))"
        return (
            f"{idf} * ({tf} * {repr(BM25_K1 + 1.0)}D)"
            f" / ({tf} + {repr(BM25_K1)}D * {dl_norm})"
        )

    score = " + ".join(term_score(i) for i in range(len(BM25_TERMS)))
    return scored.selectExpr("doc_id", f"round({score}, 6) AS bm25")


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction: top-k terms per document
# ---------------------------------------------------------------------------

TFIDF_TOP_K = 3


@register(
    "tfidf_keywords",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    dtf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS ct
      FROM tok GROUP BY doc_id, tok
    ),
    df AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS df FROM dtf GROUP BY tok
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT d.doc_id, d.tok,
             round(CAST(d.ct AS DOUBLE)
                   * ln(CAST(n.n_docs AS DOUBLE) / CAST(f.df AS DOUBLE)),
                   6) AS tfidf
      FROM dtf d JOIN df f ON d.tok = f.tok CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, tok, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, tok ASC) AS rk
      FROM scored
    )
    SELECT doc_id, tok, tfidf, rk
    FROM ranked
    WHERE rk <= {TFIDF_TOP_K}
    ORDER BY doc_id ASC, rk ASC
    """,
)
@memoize_df
def tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k keywords per document by TF-IDF — the standard per-document
    topical signature a curation pipeline materializes for tagging,
    clustering, and search-index building.

    Float parity: the score is computed PER ROW (one ln, one multiply —
    no order-dependent aggregation anywhere; the shuffled aggregates carry
    exact integers only), rounded to 6 decimals, and the per-doc ranking
    orders by the ROUNDED score with the token string as tie-breaker, so
    both engines rank identically even if a raw score sat on a rounding
    boundary.

    Scale: two corpus-keyed shuffles — the (doc_id, tok) term-frequency
    groupBy and the per-doc ranking window (both partition on doc_id after
    the first; Spark reuses the hash partitioning). The document-frequency
    table is vocabulary-sized and broadcast back into the join; the n_docs
    scalar is a 1-row broadcast. Per-doc window state is bounded by the
    distinct-terms count of one document.
    """
    t = _t(spark, sf_dir)
    tok = t["documents"].select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    # persist: dtf feeds BOTH the document-frequency aggregate and the scored
    # join — without it the corpus is exploded and shuffled twice (the same
    # fix dedup_ngram_jaccard needed for its shingle frame)
    dtf = tracked_persist(tok.groupBy("doc_id", "tok").agg(F.count("*").alias("ct")))
    df = dtf.groupBy("tok").agg(F.count("*").alias("df"))
    n = t["documents"].agg(F.count("*").alias("n_docs"))
    scored = (
        dtf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("ct").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TFIDF_TOP_K)
        .orderBy(F.col("doc_id").asc(), F.col("rk").asc())
    )


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion of BM25 and embedding cosine
# ---------------------------------------------------------------------------

RRF_K = 60  # standard RRF dampening constant
RRF_DEPTH = 50  # how deep each ranker's list goes
RRF_OUT = 20


def _bm25_scored_sql() -> str:
    """The shared scoring SELECT (see _BM25_SCORED_SQL) — both the bm25
    oracle and the hybrid oracle compose from this constant."""
    return _BM25_SCORED_SQL


@register(
    "rrf_hybrid_search",
    None,  # assigned below — needs the bm25 oracle text registered first
)
@memoize_df
def rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+dense retrieval via reciprocal-rank fusion: the BM25
    ranking (terms {terms}) and the embedding-cosine ranking (query vector
    vec_id=0, joined on doc_id = vec_id) each contribute 1/(K + rank);
    documents appearing in only one list keep that single term.

    Float parity: ranks are exact integers; each RRF term is a single
    correctly-rounded double division, and the fusion is a fixed TWO-term
    sum (lexical + dense, in that order) — no order-dependent aggregation.
    Rounded to 6 decimals for the output and the final ordering.

    Scale: each ranker ends in TakeOrdered({depth}) — corpus-sized scans,
    k-sized results. The fusion full-outer join runs on two {depth}-row
    frames on the driver-adjacent single partition; cost is O(k), not
    O(corpus). The rankers themselves reuse the audited bm25_search /
    ann_topk_bruteforce plans (one scan each, no wide shuffle).
    """
    t = _t(spark, sf_dir)
    # lexical side: bm25 top-RRF_DEPTH with rank. TakeOrdered(k) first, then
    # the rank window runs on the k-row frame — never a corpus-wide
    # single-partition window.
    lex = (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(RRF_DEPTH)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()))
            .alias("r_lex"),
        )
    )
    # dense side: cosine vs query vec 0, top-RRF_DEPTH with rank
    from .similarity import dot_fold_sql

    emb = t["embeddings"]
    q = emb.filter(F.col("vec_id") == 0).selectExpr(
        "embedding AS q_emb",
        f"sqrt({dot_fold_sql('embedding', 'embedding')}) AS q_norm",
    )
    dense_scored = (
        emb.filter(F.col("vec_id") != 0)
        .selectExpr(
            "*", f"sqrt({dot_fold_sql('embedding', 'embedding')}) AS norm"
        )
        .crossJoin(F.broadcast(q))
        .selectExpr(
            "vec_id AS doc_id",
            f"({dot_fold_sql('embedding', 'q_emb')} / (norm * q_norm)) AS cos",
        )
        .orderBy(F.col("cos").desc(), F.col("doc_id").asc())
        .limit(RRF_DEPTH)
    )
    dense = dense_scored.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("cos").desc(), F.col("doc_id").asc()))
        .alias("r_dense"),
    )
    fused = (
        lex.join(dense, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(
                    F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("r_lex").cast("double")),
                    F.lit(0.0),
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("r_dense").cast("double")),
                    F.lit(0.0),
                ),
                6,
            ).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
        .limit(RRF_OUT)
    )
    return fused


rrf_hybrid_search.__doc__ = rrf_hybrid_search.__doc__.format(
    terms=BM25_TERMS, depth=RRF_DEPTH
)

# The oracle reuses the bm25_search scoring text verbatim (stripped of its
# ORDER/LIMIT tail) so lexical scores are identical by construction, and the
# similarity module's fixed-order fold for the dense side.
from .similarity import _cos_sql  # noqa: E402  (registered module, no cycle)

ORACLE_SQL["rrf_hybrid_search"] = f"""
    WITH lexs AS (
      {_bm25_scored_sql()}
    ),
    lex AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS r_lex
      FROM lexs
    ),
    denses AS (
      SELECT e.vec_id AS doc_id,
             {_cos_sql('e.embedding', 'q.embedding')} AS cos
      FROM embeddings e
      CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      WHERE e.vec_id <> 0
    ),
    dense AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS r_dense
      FROM denses
    )
    SELECT doc_id,
           round(COALESCE(1.0 / ({RRF_K} + CAST(l.r_lex AS DOUBLE)), 0.0)
               + COALESCE(1.0 / ({RRF_K} + CAST(d.r_dense AS DOUBLE)), 0.0),
                 6) AS rrf
    FROM (SELECT * FROM lex WHERE r_lex <= {RRF_DEPTH}) l
    FULL OUTER JOIN (SELECT * FROM dense WHERE r_dense <= {RRF_DEPTH}) d
      USING (doc_id)
    ORDER BY rrf DESC, doc_id ASC
    LIMIT {RRF_OUT}
    """


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
    # ONE explode + one (doc_id, tok) shuffle; the corpus token frequency
    # and total derive from the persisted per-doc counts (sum(ct) ==
    # count(*) of the exploded frame — exact integer sums, so the doubles
    # are identical) instead of re-exploding and re-shuffling the corpus
    # two more times as the r11 plan did.
    dtf = tracked_persist(
        tok.groupBy("doc_id", "tok").agg(F.count("*").alias("ct"))
    )
    freq = dtf.groupBy("tok").agg(F.sum("ct").cast("double").alias("n_tok"))
    tot = dtf.agg(F.sum("ct").cast("double").alias("n_total"))
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


# ---------------------------------------------------------------------------
# bigram language-model perplexity (the sharper quality signal)
# ---------------------------------------------------------------------------


@register(
    "bigram_perplexity",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents
    ),
    bg AS (
      SELECT doc_id, ts[i] || ' ' || ts[i+1] AS bg, ts[i] AS ctx
      FROM toks, unnest(generate_series(1, len(ts) - 1)) t(i)
      WHERE len(ts) >= 2
    ),
    dbf AS (
      SELECT doc_id, bg, ctx, CAST(count(*) AS BIGINT) AS ct
      FROM bg GROUP BY doc_id, bg, ctx
    ),
    bfreq AS (SELECT bg, CAST(count(*) AS DOUBLE) AS n_bg FROM bg GROUP BY bg),
    cfreq AS (SELECT ctx, CAST(count(*) AS DOUBLE) AS n_ctx FROM bg GROUP BY ctx),
    folded AS (
      SELECT d.doc_id,
             list(d.ct ORDER BY d.bg ASC) AS cts,
             list(b.n_bg / c.n_ctx ORDER BY d.bg ASC) AS ps,
             CAST(sum(d.ct) AS DOUBLE) AS dl
      FROM dbf d JOIN bfreq b USING (bg) JOIN cfreq c USING (ctx)
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
def bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity per document: exp(mean negative log of the
    CONDITIONAL bigram probability p(w2 | w1) = n(w1 w2) / n(w1-as-
    context)), estimated from the corpus itself. Sharper than the
    unigram signal: repeated boilerplate drives p(w2|w1) toward 1 and
    perplexity toward 1, while scrambled/unnatural word order scores
    high even when the vocabulary looks normal. Docs with fewer than two
    tokens have no bigrams and drop out (same in both engines).

    Float parity uses the unigram_perplexity pattern: shuffled
    aggregation stays integer-exact (bigram counts), and the per-doc
    float fold runs over bigrams SORTED lexicographically — a
    deterministic left-to-right -ln() accumulation both engines replay
    in the same order. Context counts derive from the bigram table (one
    per bigram token), the standard conditional-LM denominator.

    Scale: the per-(doc, bigram) aggregate and the per-doc collect are
    corpus-keyed shuffles; the bigram and context frequency tables are
    vocabulary-sized and broadcast. Per-doc state is bounded by distinct
    bigrams per document."""
    t = _t(spark, sf_dir)
    toks = tokens(F.col("text"))
    base = t["documents"].select("doc_id", toks.alias("ts")).filter(
        F.size("ts") >= 2
    )
    idx = F.sequence(F.lit(1), F.size("ts") - 1)
    bg = base.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.concat_ws(
                        " ",
                        F.try_element_at(F.col("ts"), i),
                        F.try_element_at(F.col("ts"), i + 1),
                    ).alias("bg"),
                    F.try_element_at(F.col("ts"), i).alias("ctx"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.bg").alias("bg"), F.col("p.ctx").alias("ctx"))
    # ONE bigram explode + one (doc_id, bg, ctx) shuffle; both frequency
    # tables fold the persisted per-doc counts (sum(ct) == count(*) of the
    # exploded frame — exact integer sums) instead of re-running the
    # tokenize + explode two more times as the r11 plan did.
    dbf = tracked_persist(
        bg.groupBy("doc_id", "bg", "ctx").agg(F.count("*").alias("ct"))
    )
    bfreq = dbf.groupBy("bg").agg(F.sum("ct").cast("double").alias("n_bg"))
    cfreq = dbf.groupBy("ctx").agg(F.sum("ct").cast("double").alias("n_ctx"))
    joined = dbf.join(F.broadcast(bfreq), "bg").join(F.broadcast(cfreq), "ctx")
    folded = joined.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("bg"),
                    F.col("ct"),
                    (F.col("n_bg") / F.col("n_ctx")).alias("p"),
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
