"""Training-set assembly operators: deterministic global shuffle into
training shards, and a cross-source vocabulary-overlap matrix.

``deterministic_shuffle`` is the step between curation and the trainer:
every document gets a pseudo-random but *reproducible* position — shard =
32-bit md5 coin mod N_SHARDS, in-shard position = rank of the full md5 key.
Re-running the pipeline (or re-running it on a different engine) yields the
byte-identical training order, which is what makes data ablations
comparable. At 100 TB the same plan is ``repartition(N_SHARDS, shard)`` +
``sortWithinPartitions(shuffle_key)`` writing one shard per output
partition — a single hash shuffle, no global sort; the window formulation
here computes the identical (shard, pos) assignment declaratively so the
oracle can check it.

``source_vocab_overlap`` is the curation diagnostic for "how similar are
my sources": distinct vocabulary per source, pairwise shared-token counts
and Jaccard. The corpus-sized work is one DISTINCT over (source, token) —
map-side explode, one shuffle; the pairwise join then runs on the tiny
per-source vocabulary relation (|sources| x |vocab| rows, independent of
corpus row count), so the quadratic part never touches document data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..driver_queries import _t, register
from ..session import tracked_persist
from .textstats import tokens

N_SHARDS = 8
SHUFFLE_SEED = "shuf42:"

# DuckDB twin of Spark's conv(substr(md5, 1, 8), 16, 10): fold the first 8
# hex chars into a 32-bit integer (same trick as curation.balanced_sample).
_HV_SQL = """list_reduce(list_transform(generate_series(1, 8),
               i -> CAST(strpos('0123456789abcdef', substr(mk, i, 1)) - 1
                    AS BIGINT)),
               (a, x) -> a * 16 + x)"""


@register(
    "deterministic_shuffle",
    f"""
    WITH k AS (
      SELECT doc_id,
             md5('{SHUFFLE_SEED}' || CAST(doc_id AS VARCHAR)) AS mk
      FROM documents
    ),
    h AS (SELECT doc_id, mk, {_HV_SQL} AS hv FROM k)
    SELECT doc_id,
           hv % {N_SHARDS} AS shard,
           CAST(row_number() OVER (PARTITION BY hv % {N_SHARDS}
                                   ORDER BY mk ASC, doc_id ASC) AS BIGINT)
               AS pos
    FROM h
    ORDER BY shard ASC, pos ASC
    """,
)
def deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir)["documents"]
    mk = F.md5(
        F.concat(F.lit(SHUFFLE_SEED), F.col("doc_id").cast("string")).cast("binary")
    )
    hv = F.conv(F.substring(mk, 1, 8), 16, 10).cast("long")
    keyed = docs.select(
        "doc_id", mk.alias("mk"), (hv % N_SHARDS).alias("shard")
    )
    w = Window.partitionBy("shard").orderBy(F.col("mk").asc(), F.col("doc_id").asc())
    return (
        keyed.select(
            "doc_id", "shard", F.row_number().over(w).cast("long").alias("pos")
        )
        .orderBy(F.col("shard").asc(), F.col("pos").asc())
    )


@register(
    "source_vocab_overlap",
    r"""
    WITH v AS (
      SELECT DISTINCT source,
             unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents
    ),
    sizes AS (SELECT source, count(*) AS n_tok FROM v GROUP BY source)
    SELECT a.source AS source_a,
           b.source AS source_b,
           count(*) AS n_shared,
           round(CAST(count(*) AS DOUBLE)
                 / CAST(sa.n_tok + sb.n_tok - count(*) AS DOUBLE), 6)
               AS jaccard
    FROM v a
    JOIN v b ON a.tok = b.tok AND a.source < b.source
    JOIN sizes sa ON sa.source = a.source
    JOIN sizes sb ON sb.source = b.source
    GROUP BY a.source, b.source, sa.n_tok, sb.n_tok
    ORDER BY source_a ASC, source_b ASC
    """,
)
def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir)["documents"]
    # ONE corpus-keyed shuffle (the DISTINCT); everything after runs on the
    # per-source vocabulary relation (|sources| x |vocab| rows, independent
    # of corpus row count). Persist it so the self-join + sizes don't
    # rescan the corpus. The broadcast hint fits natural-language
    # vocabularies (1e5-1e6 tokens x tens of sources = a few hundred MB at
    # most, usually far less); for an open-ended token domain drop the hint
    # and the pair join becomes an ordinary equi-join shuffled on tok.
    vocab = tracked_persist(
        docs.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
        .distinct()
    )
    sizes = vocab.groupBy("source").agg(F.count("*").alias("n_tok"))
    a = vocab.alias("a")
    b = vocab.alias("b")
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n_tok").alias("na"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n_tok").alias("nb"))
    return (
        pairs.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_shared")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.col("source_a").asc(), F.col("source_b").asc())
    )
