"""Text analysis over the ``documents`` table: token counting, language-ID
heuristic, quality scoring, document fingerprinting.

All pure Column expressions (JVM-side, codegen) — at 100 TB these run as a
single scan with map-side-only work, no shuffle except the final aggregate
where one exists. Each query has a DuckDB oracle twin computing the same
deterministic math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..driver_queries import _t, register

# Small demonstration stopword set (English function words) for the n-gram /
# stopword-ratio language heuristic. At production scale this is a broadcast
# map of per-language sets; the operator shape is identical.
STOPWORDS = ["the", "a", "of", "and", "is", "to", "in", "it", "on", "for"]
_STOP_SQL = "('" + "', '".join(STOPWORDS) + "')"


def tokens(col):
    """Whitespace tokenization shared by every text operator."""
    return F.split(F.trim(col), r"\s+")


def tokens_sql(col: str) -> str:
    """Spark-SQL text twin of ``tokens`` (same tree, one parse — see
    similarity.dot_fold_sql for the construction-cost rationale).

    The regex rides in a SQL string literal, so its meaning depends on
    ``spark.sql.parser.escapedStringLiterals`` staying at its default
    (false): '\\\\s+' parses to the two characters ``\\s+``. With the
    conf flipped the same text means a literal-backslash pattern and
    silently diverges from the Column twin. Pinned (together with the
    interpolated BM25 term literals in search.py, which share the
    sensitivity) by tests/test_sql_expr_parity.py::
    test_escaped_string_literals_conf_and_tokens_parity (ADVICE r12 #2)."""
    return f"split(trim({col}), '\\\\s+')"


# ---------------------------------------------------------------------------
# token counting: whitespace tokens + a BPE-ish subword estimate
# ---------------------------------------------------------------------------
@register(
    "text_token_counts",
    """
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
           n_chars,
           CAST(ceil(n_chars / 4.0) AS BIGINT) AS n_subwords_est
    FROM documents
    ORDER BY doc_id ASC
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return (
        t["documents"]
        .select(
            "doc_id",
            F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
            "n_chars",
            F.ceil(F.col("n_chars") / F.lit(4.0)).cast("long").alias("n_subwords_est"),
        )
        .orderBy(F.col("doc_id").asc())
    )


# ---------------------------------------------------------------------------
# language-ID heuristic: stopword ratio over tokens (n-gram heuristic family)
# ---------------------------------------------------------------------------
@register(
    "text_lang_id",
    f"""
    SELECT doc_id,
           round(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                 x -> x IN {_STOP_SQL}))::DOUBLE
                 / len(string_split_regex(trim(text), '\\s+')), 6) AS stop_ratio,
           CASE WHEN len(list_filter(string_split_regex(trim(text), '\\s+'),
                                     x -> x IN {_STOP_SQL}))::DOUBLE
                     / len(string_split_regex(trim(text), '\\s+')) >= 0.05
                THEN 'en' ELSE 'unknown' END AS lang_pred
    FROM documents
    ORDER BY doc_id ASC
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    toks = tokens(F.col("text"))
    stop_arr = F.expr(
        "array(" + ", ".join("'" + w.replace("'", "''") + "'" for w in STOPWORDS) + ")"
    )
    ratio = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast(
        "double"
    ) / F.size(toks)
    return (
        t["documents"]
        .select(
            "doc_id",
            F.round(ratio, 6).alias("stop_ratio"),
            F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("unknown")).alias("lang_pred"),
        )
        .orderBy(F.col("doc_id").asc())
    )


# ---------------------------------------------------------------------------
# quality scoring: length / punctuation / stopword-ratio linear blend
# ---------------------------------------------------------------------------
def quality_sql_expr() -> str:
    """THE quality-blend SQL fragment (rounded to 6), in terms of a
    `documents` row's ``text``/``n_chars``. Single source shared by
    text_quality_score, audit.corpus_datasheet, and
    curation.dedup_best_representative — three literal copies of the
    0.4/0.3/0.3 formula cannot stay in lockstep by hand, and any drift
    silently breaks cross-operator quality agreement."""
    return (
        "round(0.4 * least(n_chars / 500.0, 1.0)"
        " + 0.3 * (len(list_filter(string_split_regex(trim(text), '\\s+'),"
        f" x -> x IN {_STOP_SQL}))::DOUBLE"
        " / len(string_split_regex(trim(text), '\\s+')))"
        " + 0.3 * (1.0 - (length(text) -"
        " length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE"
        " / greatest(length(text), 1)), 6)"
    )


def quality_col() -> "F.Column":
    """Spark twin of :func:`quality_sql_expr` (same blend, same rounding),
    in terms of the documents columns ``text``/``n_chars``."""
    toks = tokens(F.col("text"))
    stop_arr = F.expr(
        "array(" + ", ".join("'" + w.replace("'", "''") + "'" for w in STOPWORDS) + ")"
    )
    stop_ratio = F.size(
        F.filter(toks, lambda x: F.array_contains(stop_arr, x))
    ).cast("double") / F.size(toks)
    punct_ratio = (
        F.length(F.col("text"))
        - F.length(F.regexp_replace(F.col("text"), r"[.,!?;:]", ""))
    ).cast("double") / F.greatest(F.length(F.col("text")), F.lit(1))
    len_component = F.least(F.col("n_chars") / F.lit(500.0), F.lit(1.0))
    return F.round(
        F.lit(0.4) * len_component
        + F.lit(0.3) * stop_ratio
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio),
        6,
    )


@register(
    "text_quality_score",
    "SELECT doc_id, "
    + quality_sql_expr()
    + " AS quality FROM documents ORDER BY doc_id ASC",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    return (
        t["documents"]
        .select("doc_id", quality_col().alias("quality"))
        .orderBy(F.col("doc_id").asc())
    )


# ---------------------------------------------------------------------------
# document fingerprinting: min-hash over word-3-gram shingles (winnowing-style
# single-function fingerprint; md5 is the portable hash in both engines)
# ---------------------------------------------------------------------------
@register(
    "text_fingerprint",
    """
    WITH s AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
    SELECT doc_id,
           min(md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS fingerprint
    FROM s, unnest(generate_series(1, greatest(len(toks) - 2, 1))) t(i)
    GROUP BY doc_id
    ORDER BY doc_id ASC
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint as a single map-only pass."""
    t = _t(spark, sf_dir)
    from .dedup import shingles

    # array_min over transformed shingles: no explode, no shuffle — the
    # whole fingerprint pass is map-only (SQL twin groups after unnest;
    # identical result)
    return (
        t["documents"]
        .select(
            "doc_id",
            F.array_min(
                F.transform(
                    shingles(F.col("text")), lambda g: F.md5(g.cast("binary"))
                )
            ).alias("fingerprint"),
        )
        .orderBy(F.col("doc_id").asc())
    )


# ---------------------------------------------------------------------------
# corpus shape: per-source token-count quantiles (curation dashboards /
# mixture rebalancing decisions run off exactly this table)
# ---------------------------------------------------------------------------
@register(
    "token_count_quantiles",
    """
    SELECT source,
           count(*) AS n_docs,
           round(quantile_cont(len(string_split_regex(trim(text), '\\s+')), 0.5), 6) AS p50_tokens,
           round(quantile_cont(len(string_split_regex(trim(text), '\\s+')), 0.9), 6) AS p90_tokens,
           round(quantile_cont(len(string_split_regex(trim(text), '\\s+')), 0.99), 6) AS p99_tokens
    FROM documents
    GROUP BY source
    ORDER BY source ASC
    """,
)
def token_count_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-count distribution (p50/p90/p99, exact linear
    interpolation — Spark ``percentile`` and DuckDB ``quantile_cont`` share
    the (n-1)*p rank definition, so the oracle matches bit-for-bit).

    Scale note: exact percentile shuffles every value to its source's
    reducer; sources are few (single-digit) so the reduce side is wide but
    bounded. At 100 TB swap in ``percentile_approx`` (t-digest sketch,
    mergeable map-side, bounded memory) — same query shape, documented
    accuracy trade."""
    t = _t(spark, sf_dir)
    n_tok = F.size(tokens(F.col("text"))).cast("double")
    pct = F.percentile(n_tok, F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        t["documents"]
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), pct.alias("__p"))
        .select(
            "source",
            "n_docs",
            F.round(F.col("__p")[0], 6).alias("p50_tokens"),
            F.round(F.col("__p")[1], 6).alias("p90_tokens"),
            F.round(F.col("__p")[2], 6).alias("p99_tokens"),
        )
        .orderBy(F.col("source").asc())
    )


# ---------------------------------------------------------------------------
# Zipf slope per source: least-squares fit in fixed-order fold space
# ---------------------------------------------------------------------------

ZIPF_RANKS = 50  # fit over the top-50 token ranks


@register(
    "zipf_slope",
    f"""
    WITH tf AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS tok
            FROM documents)
      GROUP BY source, tok
    ),
    ranked AS (
      SELECT source, freq,
             row_number() OVER (PARTITION BY source
                                ORDER BY freq DESC, tok ASC) AS rk
      FROM tf
    ),
    pts AS (
      SELECT source,
             list(ln(CAST(rk AS DOUBLE)) ORDER BY rk ASC) AS xs,
             list(ln(CAST(freq AS DOUBLE)) ORDER BY rk ASC) AS ys,
             CAST(count(*) AS DOUBLE) AS n
      FROM ranked WHERE rk <= {ZIPF_RANKS}
      GROUP BY source
    )
    SELECT source,
           CAST(n AS BIGINT) AS n_ranks,
           round(
             (n * list_reduce(list_transform(range(1, len(xs) + 1),
                                             i -> xs[i] * ys[i]), (a, v) -> a + v)
              - list_reduce(xs, (a, v) -> a + v)
                * list_reduce(ys, (a, v) -> a + v))
             / (n * list_reduce(list_transform(range(1, len(xs) + 1),
                                               i -> xs[i] * xs[i]), (a, v) -> a + v)
                - list_reduce(xs, (a, v) -> a + v)
                  * list_reduce(xs, (a, v) -> a + v)),
             6) AS slope
    FROM pts
    ORDER BY source ASC
    """,
)
def zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law exponent per source: the least-squares slope of
    ln(freq) against ln(rank) over the top-{ranks} token ranks. Natural
    corpora sit near -1; a much flatter slope flags templated/synthetic
    text, a much steeper one flags degenerate repetition — a cheap
    distribution-shape audit to go with the confusion/quality screens.

    Determinism: rank assignment orders by (freq DESC, tok ASC) — exact
    integers plus a total order. The regression sums are FIXED-ORDER folds
    over rank-sorted arrays (the perplexity pattern): Σx, Σy, Σxy, Σx²
    all fold left-to-right in rank order in both engines, so the slope is
    bit-identical before its final rounding.

    Scale: one (source, tok) aggregation (map-side partial), a per-source
    rank window on the vocabulary relation (vocab-sized, not corpus-
    sized), and a {ranks}-row fold per source. Output rows = |sources|."""
    t = _t(spark, sf_dir)
    # one-parse SQL text (r13): same trees as the old Column-DSL chain.
    # Plan shape (plans/r13/zipf_slope_after.txt): ONE Generate for the
    # single tokenize+explode pass, map-side partial agg before the
    # (source, tok) exchange, and the rk <= ZIPF_RANKS filter compiles
    # to WindowGroupLimit (partial per-partition top-k BEFORE the source
    # exchange) — not the perplexity multi-explode disease (VERDICT r12
    # #7 checked; nothing to remove).
    tf = (
        t["documents"]
        .selectExpr("source", f"explode({tokens_sql('text')}) AS tok")
        .groupBy("source", "tok")
        .agg(F.expr("count(*) AS freq"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.col("freq").desc(), F.col("tok").asc()
    )
    ranked = tf.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= ZIPF_RANKS
    )
    pts = ranked.groupBy("source").agg(
        F.expr(
            "array_sort(collect_list(struct(rk, "
            "ln(CAST(rk AS DOUBLE)) AS x, "
            "ln(CAST(freq AS DOUBLE)) AS y))) AS p"
        ),
        F.expr("CAST(count(*) AS DOUBLE) AS n"),
    )

    def fold(term: str) -> str:
        return f"aggregate(p, 0.0D, (a, s) -> a + {term})"

    sx = fold("s.x")
    sy = fold("s.y")
    sxy = fold("s.x * s.y")
    sxx = fold("s.x * s.x")
    slope = f"((n * {sxy} - {sx} * {sy}) / (n * {sxx} - {sx} * {sx}))"
    return (
        pts.selectExpr(
            "source",
            "CAST(n AS BIGINT) AS n_ranks",
            f"round({slope}, 6) AS slope",
        )
        .orderBy(F.col("source").asc())
    )


zipf_slope.__doc__ = zipf_slope.__doc__.format(ranks=ZIPF_RANKS)


# ---------------------------------------------------------------------------
# canonical text normalization: the first stage of every dedup/tokenize path
# ---------------------------------------------------------------------------
@register(
    "normalize_text",
    r"""
    SELECT doc_id,
           lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS norm_text,
           CAST(length(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
                AS BIGINT) AS n_chars_norm
    FROM documents
    ORDER BY doc_id ASC
    """,
)
def normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical normalization (lowercase + whitespace collapse + trim) —
    the transform exact/MinHash dedup keys on so that case and spacing
    differences don't defeat content hashing. Map-only column expressions
    inside codegen; at scale this fuses into whatever scan consumes it
    (no materialization unless a downstream persists it)."""
    t = _t(spark, sf_dir)
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return (
        t["documents"]
        .select(
            "doc_id",
            norm.alias("norm_text"),
            F.length(norm).cast("long").alias("n_chars_norm"),
        )
        .orderBy(F.col("doc_id").asc())
    )


# ---------------------------------------------------------------------------
# vocabulary builder: top-k tokens with cumulative corpus coverage
# ---------------------------------------------------------------------------
VOCAB_TOP = 100


@register(
    "build_vocab",
    f"""
    WITH tok AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents
    ),
    cnt AS (SELECT tok, count(*) AS ct FROM tok GROUP BY tok),
    total AS (SELECT sum(ct) AS n FROM cnt),
    top AS (SELECT tok, ct FROM cnt ORDER BY ct DESC, tok ASC LIMIT {VOCAB_TOP}),
    r AS (
      SELECT tok, ct,
             row_number() OVER (ORDER BY ct DESC, tok ASC) AS rk,
             sum(ct) OVER (ORDER BY ct DESC, tok ASC
                           ROWS UNBOUNDED PRECEDING) AS cum
      FROM top
    )
    SELECT CAST(rk AS BIGINT) AS rk, tok, CAST(ct AS BIGINT) AS ct,
           round(cum::DOUBLE / total.n, 6) AS coverage
    FROM r, total
    ORDER BY rk ASC
    """,
)
def build_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary with cumulative corpus coverage — the
    table a tokenizer build or an OOV analysis starts from ("the top K
    tokens cover X% of the corpus").

    Scale: one token shuffle with map-side partial counts; the top-K cut
    is TakeOrdered (never a global sort of the vocabulary); the rank and
    cumulative-sum windows then run on the K-row frame only — a corpus-
    wide window never exists. The (ct DESC, tok ASC) ordering is total,
    so the integer cumulative sum is deterministic in both engines."""
    docs = _t(spark, sf_dir)["documents"]
    from pyspark.sql import Window

    cnt = (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("ct"))
    )
    total = cnt.agg(F.sum("ct").alias("n"))
    top = cnt.orderBy(F.col("ct").desc(), F.col("tok").asc()).limit(VOCAB_TOP)
    w = Window.orderBy(F.col("ct").desc(), F.col("tok").asc())
    cum = Window.orderBy(F.col("ct").desc(), F.col("tok").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.withColumn("rk", F.row_number().over(w))
        .withColumn("cum", F.sum("ct").over(cum))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("rk").cast("long").alias("rk"),
            "tok",
            F.col("ct").cast("long").alias("ct"),
            F.round(F.col("cum").cast("double") / F.col("n"), 6).alias("coverage"),
        )
        .orderBy(F.col("rk").asc())
    )
