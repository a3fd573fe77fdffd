"""Similarity search over the ``embeddings`` table (array<float>, 64-dim).

Two plans:
- brute-force cosine top-k — the exact baseline; one scan, TakeOrdered.
- IVF-style bucketed search — a coarse quantizer (sign pattern of the
  leading components) partitions the corpus; the query probes only its own
  cell. At 100 TB the cell assignment is the parquet partition key, so a
  probe reads ~1/2^B of the data.

Determinism: dot products are computed as a fixed-order left fold over the
index sequence (float->double widening is exact; sequential IEEE adds are
reproducible), so Spark and DuckDB produce bit-identical doubles — no
tolerance needed in the oracle comparison.

Also here: embedding-cosine near-duplicate pairs (dedup family, driver
north-star) for an incoming batch vs the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..driver_queries import _t, register

DIM = 64
NEARDUP_COSINE = 0.4  # synthetic corpus: max pair cosine ≈ 0.51
IVF_SIGN_BITS = 6


def dot_fold(a: Column, b: Column) -> Column:
    """Fixed-order dot product: left fold over zip_with products."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot_fold(a, b) / (F.sqrt(dot_fold(a, a)) * F.sqrt(dot_fold(b, b)))


def _dot_sql(a: str, b: str) -> str:
    """DuckDB twin of dot_fold: identical element order, identical widening,
    identical left-fold addition order."""
    return (
        f"list_reduce(list_transform(generate_series(1, {DIM}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )


def _cos_sql(a: str, b: str) -> str:
    return (
        f"({_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)})))"
    )


# ---------------------------------------------------------------------------
# brute-force cosine top-k
# ---------------------------------------------------------------------------
@register(
    "ann_topk_bruteforce",
    f"""
    SELECT e.vec_id, {_cos_sql('e.embedding', 'q.embedding')} AS cos
    FROM embeddings e
    CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE e.vec_id <> 0
    ORDER BY cos DESC, e.vec_id ASC
    LIMIT 10
    """,
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k: the 1-row query vector broadcasts; one scan computes
    cosines inside codegen; TakeOrdered keeps k rows per partition. This is
    the correctness baseline every ANN variant is measured against."""
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"),
        F.sqrt(dot_fold(F.col("embedding"), F.col("embedding"))).alias("q_norm"),
    )
    # norms precompute per side (1 fold/vector) instead of per pair (3x fewer)
    return (
        emb.filter(F.col("vec_id") != 0)
        .withColumn("norm", F.sqrt(dot_fold(F.col("embedding"), F.col("embedding"))))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            (dot_fold(F.col("embedding"), F.col("q_emb")) / (F.col("norm") * F.col("q_norm"))).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# IVF-style bucketed search: sign-pattern coarse quantizer
# ---------------------------------------------------------------------------
_BUCKET_SQL = (
    "list_reduce(list_transform(generate_series(1, "
    + str(IVF_SIGN_BITS)
    + "), i -> CASE WHEN {col}[i] >= 0 THEN CAST(2 AS BIGINT) ** (i - 1) "
    "ELSE 0 END), (x, y) -> x + y)"
)


def _bucket(col: Column) -> Column:
    return F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(IVF_SIGN_BITS)),
            lambda i: F.when(
                F.try_element_at(col, i) >= 0,
                F.pow(F.lit(2.0), (i - 1).cast("double")).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


@register(
    "ann_ivf_topk",
    f"""
    WITH cells AS (
      SELECT vec_id, embedding,
             {_BUCKET_SQL.format(col='embedding')} AS cell
      FROM embeddings
    )
    SELECT e.vec_id, {_cos_sql('e.embedding', 'q.embedding')} AS cos
    FROM cells e
    JOIN (SELECT embedding, cell FROM cells WHERE vec_id = 0) q ON e.cell = q.cell
    WHERE e.vec_id <> 0
    ORDER BY cos DESC, e.vec_id ASC
    LIMIT 5
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style probe: quantize every vector to a sign-pattern cell
    (2^6 cells), search only the query's cell. At scale ``cell`` is the
    partition column, so the probe is a partition-pruned scan of ~1.6% of
    the corpus; recall is tuned by probing neighboring cells (nprobe)."""
    t = _t(spark, sf_dir)
    emb = t["embeddings"].withColumn("cell", _bucket(F.col("embedding")))
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"),
        F.col("cell"),
        F.sqrt(dot_fold(F.col("embedding"), F.col("embedding"))).alias("q_norm"),
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .withColumn("norm", F.sqrt(dot_fold(F.col("embedding"), F.col("embedding"))))
        .join(F.broadcast(q), "cell")
        .select(
            "vec_id",
            (dot_fold(F.col("embedding"), F.col("q_emb")) / (F.col("norm") * F.col("q_norm"))).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(5)
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs: incoming batch vs corpus
# ---------------------------------------------------------------------------
@register(
    "dedup_embedding_cosine",
    f"""
    SELECT a.vec_id AS id_new, b.vec_id AS id_corpus,
           {_cos_sql('a.embedding', 'b.embedding')} AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id < 100
      AND {_cos_sql('a.embedding', 'b.embedding')} >= {NEARDUP_COSINE}
    ORDER BY id_new ASC, id_corpus ASC
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection for an incoming batch (vec_id < 100) against the
    corpus — the incremental-ingest dedup shape: the small batch broadcasts,
    the corpus streams through one scan. Blocking (LSH/IVF cells) bounds the
    candidate set at real scale; thresholds verify exactly."""
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    batch = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("id_new"),
        F.col("embedding").alias("e_new"),
        F.sqrt(dot_fold(F.col("embedding"), F.col("embedding"))).alias("n_new"),
    )
    cos = dot_fold(F.col("e_new"), F.col("embedding")) / (F.col("n_new") * F.col("norm"))
    return (
        emb.withColumn("norm", F.sqrt(dot_fold(F.col("embedding"), F.col("embedding"))))
        .crossJoin(F.broadcast(batch))
        .filter(F.col("id_new") < F.col("vec_id"))
        .select(
            "id_new",
            F.col("vec_id").alias("id_corpus"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= NEARDUP_COSINE)
        .orderBy(F.col("id_new").asc(), F.col("id_corpus").asc())
    )
