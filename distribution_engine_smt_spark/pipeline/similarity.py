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
from ..session import tracked_persist

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


@register(
    "ann_ivf_nprobe_topk",
    f"""
    WITH cells AS (
      SELECT vec_id, embedding,
             {_BUCKET_SQL.format(col='embedding')} AS cell
      FROM embeddings
    )
    SELECT e.vec_id, {_cos_sql('e.embedding', 'q.embedding')} AS cos
    FROM cells e
    JOIN (SELECT embedding, cell FROM cells WHERE vec_id = 0) q
      ON bit_count(xor(CAST(e.cell AS BIGINT), CAST(q.cell AS BIGINT))) <= 1
    WHERE e.vec_id <> 0
    ORDER BY cos DESC, e.vec_id ASC
    LIMIT 10
    """,
)
def ann_ivf_nprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe with nprobe = 1 + B neighbor cells: search the query's own
    sign-pattern cell plus every cell at Hamming distance 1 (one flipped
    sign bit — exactly the cells a vector near a hyperplane boundary could
    fall into). Recovers most of the recall the single-cell probe loses
    while still reading only 7/64 of the corpus; at production scale the
    cell list is 7 partition-pruned reads, the bit_count condition never
    touches the data files."""
    t = _t(spark, sf_dir)
    emb = t["embeddings"].withColumn("cell", _bucket(F.col("embedding")))
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"),
        F.col("cell").alias("q_cell"),
        F.sqrt(dot_fold(F.col("embedding"), F.col("embedding"))).alias("q_norm"),
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .withColumn("norm", F.sqrt(dot_fold(F.col("embedding"), F.col("embedding"))))
        .join(
            F.broadcast(q),
            F.bit_count(F.col("cell").bitwiseXOR(F.col("q_cell"))) <= 1,
        )
        .select(
            "vec_id",
            (dot_fold(F.col("embedding"), F.col("q_emb")) / (F.col("norm") * F.col("q_norm"))).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(10)
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


# ---------------------------------------------------------------------------
# random-hyperplane LSH near-dup: L tables x K sign-bits + exact verify
# ---------------------------------------------------------------------------
RHP_TABLES = 8   # L: independent hash tables (union of candidates)
RHP_BITS = 4     # K: hyperplanes per table (bucket = K-bit sign pattern)


def _hyperplane_signs() -> list[list[list[float]]]:
    """Deterministic pseudo-random ±1 hyperplane components, derived from
    md5 so both engines share the exact same planes as literals. Shape:
    [table][bit][dim]."""
    import hashlib

    return [
        [
            [
                1.0
                if int(hashlib.md5(f"{t}:{k}:{i}".encode()).hexdigest()[0], 16) >= 8
                else -1.0
                for i in range(DIM)
            ]
            for k in range(RHP_BITS)
        ]
        for t in range(RHP_TABLES)
    ]


_SIGNS = _hyperplane_signs()


def _rhp_bucket(col: Column, t: int) -> Column:
    """K-bit bucket id for hash table t: bit_k = sign(embedding . plane_k)."""
    acc = F.lit(0)
    for k in range(RHP_BITS):
        plane = F.array(*[F.lit(s) for s in _SIGNS[t][k]])
        dot = F.aggregate(
            F.zip_with(col, plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda a, b: a + b,
        )
        acc = acc + F.when(dot >= 0, F.lit(1 << k)).otherwise(F.lit(0))
    return acc


def _rhp_bucket_sql(col: str, t: int) -> str:
    bits = []
    for k in range(RHP_BITS):
        lit = "[" + ", ".join(str(s) for s in _SIGNS[t][k]) + "]"
        dot = (
            f"list_reduce(list_transform(generate_series(1, {DIM}), "
            f"i -> CAST({col}[i] AS DOUBLE) * ({lit})[i]), (x, y) -> x + y)"
        )
        bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << k} ELSE 0 END)")
    return " + ".join(bits)


_RHP_BANDS_SQL = " UNION ALL ".join(
    f"SELECT vec_id, {t} AS tbl, {_rhp_bucket_sql('embedding', t)} AS bucket "
    "FROM embeddings"
    for t in range(RHP_TABLES)
)

_RHP_SQL = f"""
    WITH bands AS ({_RHP_BANDS_SQL}),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_new, b.vec_id AS id_corpus
      FROM bands a JOIN bands b
        ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE a.vec_id < 100
    )
    SELECT c.id_new, c.id_corpus,
           {_cos_sql('a.embedding', 'b.embedding')} AS cos
    FROM cand c
    JOIN embeddings a ON a.vec_id = c.id_new
    JOIN embeddings b ON b.vec_id = c.id_corpus
    WHERE {_cos_sql('a.embedding', 'b.embedding')} >= {NEARDUP_COSINE}
    ORDER BY id_new ASC, id_corpus ASC
"""


@register("dedup_embedding_lsh", _RHP_SQL)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-scale version of dedup_embedding_cosine: candidates come
    from sign-pattern bucket collisions in L=8 independent K=4-bit
    hyperplane tables (recall ≈ 1-(1-p^K)^L with p = 1-θ/π), exact cosine
    verifies only candidates. At 100 TB the (tbl, bucket) pair is the
    shuffle key — all-pairs work is confined to bucket interiors, like the
    MinHash-LSH text path."""
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    # one scan computes all L bucket ids, posexplode emits (tbl, bucket) —
    # identical fold arithmetic to the per-table plan, minus L-1 re-scans
    bands = tracked_persist(
        emb.select(
            "vec_id",
            F.array(
                *[_rhp_bucket(F.col("embedding"), tb) for tb in range(RHP_TABLES)]
            ).alias("bks"),
        )
        .select("vec_id", F.posexplode("bks").alias("tbl", "bucket"))
    )
    a = bands.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("id_new"), "tbl", "bucket"
    )
    b = bands.select(F.col("vec_id").alias("id_corpus"), "tbl", "bucket")
    cand = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("id_new") < F.col("id_corpus"))
        .select("id_new", "id_corpus")
        .distinct()
    )
    e1 = emb.select(
        F.col("vec_id").alias("id_new"),
        F.col("embedding").alias("e1"),
        F.sqrt(dot_fold(F.col("embedding"), F.col("embedding"))).alias("n1"),
    )
    e2 = emb.select(
        F.col("vec_id").alias("id_corpus"),
        F.col("embedding").alias("e2"),
        F.sqrt(dot_fold(F.col("embedding"), F.col("embedding"))).alias("n2"),
    )
    cos = dot_fold(F.col("e1"), F.col("e2")) / (F.col("n1") * F.col("n2"))
    return (
        cand.join(e1, "id_new")
        .join(e2, "id_corpus")
        .select("id_new", "id_corpus", cos.alias("cos"))
        .filter(F.col("cos") >= NEARDUP_COSINE)
        .orderBy(F.col("id_new").asc(), F.col("id_corpus").asc())
    )


# ---------------------------------------------------------------------------
# SQ8 scalar-quantized search: int8 prefilter + exact rerank
# ---------------------------------------------------------------------------
SQ8_CANDIDATES = 50

# DuckDB twin of _sq8(): per-vector max-abs scale, elements truncated toward
# zero after x * 127.0 / m (identical association order to the Spark lambda;
# explicit trunc() because DuckDB's double->bigint CAST rounds while Spark's
# truncates).
_SQ8_SQL = (
    "list_transform(generate_series(1, {dim}), "
    "i -> CAST(trunc(CAST({col}[i] AS DOUBLE) * 127.0 / {m}) AS BIGINT))"
)
_QDOT_SQL = (
    "list_reduce(list_transform(generate_series(1, {dim}), "
    "i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
)
_MAXABS_SQL = "list_aggregate(list_transform({col}, x -> abs(CAST(x AS DOUBLE))), 'max')"


def _maxabs(col: Column) -> Column:
    return F.array_max(F.transform(col, lambda x: F.abs(x.cast("double"))))


def _sq8(col: Column, m: Column) -> Column:
    """int8-range quantization: trunc(x * 127 / max|x|) per element.

    Integer truncation (Spark's double->long cast) rather than rounding:
    truncation is identical across engines, while round() ties differ
    (HALF_UP vs HALF_EVEN). One code away from optimal precision, which
    the exact rerank recovers anyway.
    """
    return F.transform(
        col, lambda x: (x.cast("double") * F.lit(127.0) / m).cast("long")
    )


def _qdot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors (left fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


@register(
    "ann_sq8_topk",
    f"""
    WITH q0 AS (
      SELECT embedding, {_MAXABS_SQL.format(col='embedding')} AS m
      FROM embeddings WHERE vec_id = 0
    ),
    q AS (
      SELECT embedding AS qemb,
             {_SQ8_SQL.format(dim=DIM, col='embedding', m='m')} AS qv
      FROM q0
    ),
    c0 AS (
      SELECT vec_id, embedding,
             {_MAXABS_SQL.format(col='embedding')} AS m
      FROM embeddings WHERE vec_id <> 0
    ),
    c AS (
      SELECT vec_id, embedding,
             {_SQ8_SQL.format(dim=DIM, col='embedding', m='m')} AS cv
      FROM c0
    ),
    cand AS (
      SELECT c.vec_id, c.embedding, q.qemb,
             {_QDOT_SQL.format(dim=DIM, a='c.cv', b='q.qv')} AS qdot
      FROM c CROSS JOIN q
      ORDER BY qdot DESC, c.vec_id ASC
      LIMIT {SQ8_CANDIDATES}
    )
    SELECT vec_id, qdot, {{cos}} AS cos
    FROM cand
    ORDER BY cos DESC, vec_id ASC
    LIMIT 10
    """.format(cos=_cos_sql("embedding", "qemb")),
)
def ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (SQ8) top-k: the 100 TB memory-bandwidth play.

    The corpus is scanned as int8-range codes (one-quarter the bytes of
    float32, integer multiply-adds instead of float), producing a cheap
    quantized-dot-product ranking; only the top ``SQ8_CANDIDATES`` rows are
    re-ranked with the exact float cosine. Both stages are deterministic —
    the quantized scores are exact integers, the rerank is the same
    fixed-order fold as the brute-force baseline — so the oracle match is
    exact. At scale the codes live in their own narrow parquet column
    (written once at ingest); the prefilter scan reads ONLY that column
    (column pruning), touching ~6% of the bytes the float scan would, and
    the rerank gathers the 50 survivors' float vectors via a semi-join.
    Assumes no all-zero vectors (max|x| > 0), true of any normalized
    embedding corpus.
    """
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    q = (
        emb.filter(F.col("vec_id") == 0)
        .withColumn("m", _maxabs(F.col("embedding")))
        .select(
            F.col("embedding").alias("qemb"),
            _sq8(F.col("embedding"), F.col("m")).alias("qv"),
        )
    )
    cand = (
        emb.filter(F.col("vec_id") != 0)
        .withColumn("m", _maxabs(F.col("embedding")))
        .withColumn("cv", _sq8(F.col("embedding"), F.col("m")))
        .crossJoin(F.broadcast(q))
        .select("vec_id", "embedding", "qemb", _qdot(F.col("cv"), F.col("qv")).alias("qdot"))
        .orderBy(F.col("qdot").desc(), F.col("vec_id").asc())
        .limit(SQ8_CANDIDATES)
    )
    cos = dot_fold(F.col("embedding"), F.col("qemb")) / (
        F.sqrt(dot_fold(F.col("embedding"), F.col("embedding")))
        * F.sqrt(dot_fold(F.col("qemb"), F.col("qemb")))
    )
    return (
        cand.select("vec_id", "qdot", cos.alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# batched ANN: many queries against the corpus in one pass (serving shape)
# ---------------------------------------------------------------------------
BATCH_Q = 8     # query batch: vec_id < BATCH_Q
BATCH_TOP = 5   # top-k per query


def _batch_scored_sql(n_q: int) -> str:
    """Shared CTE pair: the broadcast query batch (vec_id < n_q) scored
    against the rest of the corpus in one scan. Single source for
    ann_query_batch and hard_negatives, so the scoring path cannot
    drift between the twins."""
    return f"""q AS (
      SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
      WHERE vec_id < {n_q}
    ),
    scored AS (
      SELECT q.q_id, e.vec_id,
             {_cos_sql('e.embedding', 'q.q_emb')} AS cos
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id >= {n_q}
    )"""


def _batch_scores(emb: DataFrame, n_q: int) -> DataFrame:
    """DataFrame twin of :func:`_batch_scored_sql`: (q_id, vec_id, cos)
    with per-side norm precompute; the query batch broadcasts, the
    corpus streams through one scan scoring all |Q| queries per row."""
    q = emb.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.sqrt(dot_fold(F.col("embedding"), F.col("embedding"))).alias("q_norm"),
    )
    return (
        emb.filter(F.col("vec_id") >= n_q)
        .withColumn(
            "norm", F.sqrt(dot_fold(F.col("embedding"), F.col("embedding")))
        )
        .crossJoin(F.broadcast(q))
        .select(
            "q_id",
            "vec_id",
            (
                dot_fold(F.col("embedding"), F.col("q_emb"))
                / (F.col("norm") * F.col("q_norm"))
            ).alias("cos"),
        )
    )


@register(
    "ann_query_batch",
    f"""
    WITH {_batch_scored_sql(BATCH_Q)},
    ranked AS (
      SELECT q_id, vec_id, cos,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cos DESC, vec_id ASC) AS rk
      FROM scored
    )
    SELECT q_id, vec_id, cos, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {BATCH_TOP}
    ORDER BY q_id ASC, rk ASC
    """,
)
def ann_query_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched ANN serving: a batch of query vectors scores against the
    corpus in ONE scan (the nightly-recommendations / embedding-join
    shape), per-query top-k via a rank window partitioned on the query id.

    Scale: the QUERY BATCH broadcasts (requests are small; the corpus is
    the 100 TB side), the corpus streams through one codegen pass
    scoring all |Q| queries per row, and the rk <= k filter lets Spark
    run WindowGroupLimit — a per-partition partial top-k before the
    single q_id exchange, so the shuffle carries |Q| x k x partitions
    rows, not |corpus| x |Q|. Compose with the IVF cell filters for
    sub-linear scans per query."""
    from pyspark.sql import Window

    scored = _batch_scores(_t(spark, sf_dir)["embeddings"], BATCH_Q)
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= BATCH_TOP)
        .select("q_id", "vec_id", "cos", F.col("rk").cast("long").alias("rk"))
        .orderBy(F.col("q_id").asc(), F.col("rk").asc())
    )


# ---------------------------------------------------------------------------
# product quantization: 4 subspaces x 4 codewords, ADC scan + exact rerank
# ---------------------------------------------------------------------------
PQ_S = 4                 # subspaces
PQ_DSUB = DIM // PQ_S    # dims per subspace
PQ_K = 4                 # codewords per subspace (seeded: vec_id 0..3)
PQ_CAND = 50             # ADC candidates kept for exact rerank
PQ_TOP = 10


def _pq_dist_sql(e: str, k: int, s: int) -> str:
    """Squared distance of e's subspace-s slice to seed k's same slice
    (fixed-order left fold, exact float->double widening both engines)."""
    o = s * PQ_DSUB
    d = f"(CAST({e}[{o} + i] AS DOUBLE) - CAST(k{k}.embedding[{o} + i] AS DOUBLE))"
    return (
        f"list_reduce(list_transform(generate_series(1, {PQ_DSUB}), "
        f"i -> {d} * {d}), (x, y) -> x + y)"
    )


def _pq_argmin_sql(ds: list[str]) -> str:
    branches = []
    for i in range(PQ_K - 1):
        cond = " AND ".join(f"{ds[i]} <= {ds[j]}" for j in range(i + 1, PQ_K))
        branches.append(f"WHEN {cond} THEN {i}")
    return "CASE " + " ".join(branches) + f" ELSE {PQ_K - 1} END"


def _pq_sql() -> str:
    seeds = ", ".join(
        f"(SELECT embedding FROM embeddings WHERE vec_id = {k}) k{k}"
        for k in range(PQ_K)
    )
    lut_cols = ", ".join(
        _pq_dist_sql("q.q_emb", k, s) + f" AS qd_{s}_{k}"
        for s in range(PQ_S)
        for k in range(PQ_K)
    )
    code_cols = ", ".join(
        _pq_argmin_sql([_pq_dist_sql("e.embedding", k, s) for k in range(PQ_K)])
        + f" AS c{s}"
        for s in range(PQ_S)
    )
    adc = " + ".join(
        "(CASE c{s} ".format(s=s)
        + " ".join(f"WHEN {k} THEN qd_{s}_{k}" for k in range(PQ_K))
        + " END)"
        for s in range(PQ_S)
    )
    return f"""
    WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    lut AS (SELECT {lut_cols} FROM q, {seeds}),
    codes AS (
      SELECT e.vec_id, e.embedding, {code_cols}
      FROM embeddings e, {seeds}
      WHERE e.vec_id <> 0
    ),
    cand AS (
      SELECT vec_id, embedding, {adc} AS approx
      FROM codes, lut
      ORDER BY approx ASC, vec_id ASC
      LIMIT {PQ_CAND}
    )
    SELECT c.vec_id, {_cos_sql('c.embedding', 'q.q_emb')} AS cos
    FROM cand c, q
    ORDER BY cos DESC, c.vec_id ASC
    LIMIT {PQ_TOP}
    """


@register("ann_pq_topk", _pq_sql())
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: each vector is encoded as PQ_S=4 codes
    (nearest of PQ_K=4 codewords per 16-dim subspace; codebooks seeded
    from vec_id 0..3 — swap in per-subspace kmeans_fit output to train
    them), the query precomputes a 4x4 distance LUT, and the scan ranks
    by ADC (sum of 4 LUT lookups per row — no per-row fold at all); the
    top PQ_CAND candidates get an exact cosine rerank.

    Scale: this is the memory-bound regime's answer — at 100 TB the
    encoded table is 4 BYTES per vector + the 16-row codebook, the ADC
    scan reads codes only (no raw vectors), and only PQ_CAND rows fetch
    their full embedding for the rerank. Encoding is map-only; both the
    ADC top-candidates and the rerank end in TakeOrdered (no global
    sort). Determinism: fixed-order subspace folds, lowest-code-wins
    argmin, LUT addition in subspace order — bit-identical across
    engines, ties broken on vec_id."""
    emb = _t(spark, sf_dir)["embeddings"]
    seed_rows = (
        emb.filter(F.col("vec_id") < PQ_K).orderBy("vec_id").collect()
    )
    seeds = [[float(x) for x in r["embedding"]] for r in seed_rows]
    q_vec = seeds[0]  # vec_id 0 doubles as the query vector

    def sub_dist(col: Column, k: int, s: int) -> Column:
        o = s * PQ_DSUB
        arr = F.array(*[F.lit(c) for c in seeds[k][o : o + PQ_DSUB]])
        sub = F.slice(col, o + 1, PQ_DSUB)
        return F.aggregate(
            F.zip_with(
                sub, arr, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )

    def py_sub_dist(k: int, s: int) -> float:
        o = s * PQ_DSUB
        acc = 0.0
        for i in range(PQ_DSUB):
            d = q_vec[o + i] - seeds[k][o + i]
            acc = acc + d * d
        return acc

    lut = [[py_sub_dist(k, s) for k in range(PQ_K)] for s in range(PQ_S)]

    # the shared lowest-index-wins tie-break contract (one implementation
    # repo-wide so the rule cannot drift between quantizer consumers)
    from .clustering import _argmin_case as argmin_case

    codes = emb.filter(F.col("vec_id") != 0).select(
        "vec_id",
        "embedding",
        *[
            argmin_case(
                [sub_dist(F.col("embedding"), k, s) for k in range(PQ_K)]
            ).alias(f"c{s}")
            for s in range(PQ_S)
        ],
    )
    adc = None
    for s in range(PQ_S):
        term = None
        for k in range(PQ_K):
            w = F.when(F.col(f"c{s}") == k, F.lit(lut[s][k]))
            term = w if term is None else term.when(
                F.col(f"c{s}") == k, F.lit(lut[s][k])
            )
        adc = term if adc is None else adc + term
    cand = (
        codes.withColumn("approx", adc)
        .orderBy(F.col("approx").asc(), F.col("vec_id").asc())
        .limit(PQ_CAND)
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"),
        F.sqrt(dot_fold(F.col("embedding"), F.col("embedding"))).alias("q_norm"),
    )
    return (
        cand.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            (
                dot_fold(F.col("embedding"), F.col("q_emb"))
                / (
                    F.sqrt(dot_fold(F.col("embedding"), F.col("embedding")))
                    * F.col("q_norm")
                )
            ).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(PQ_TOP)
    )


# ---------------------------------------------------------------------------
# hard-negative mining: most-similar-below-threshold per query
# ---------------------------------------------------------------------------
HN_Q = 4      # query batch: vec_id < HN_Q
HN_TOP = 3    # hard negatives kept per query


@register(
    "hard_negatives",
    f"""
    WITH {_batch_scored_sql(HN_Q)},
    ranked AS (
      SELECT q_id, vec_id, cos,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cos DESC, vec_id ASC) AS rk
      FROM scored WHERE cos < {NEARDUP_COSINE}
    )
    SELECT q_id, vec_id, cos, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {HN_TOP}
    ORDER BY q_id ASC, rk ASC
    """,
)
def hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for retrieval/embedding training: per query,
    the MOST similar corpus vectors that are still BELOW the near-dup
    threshold — similar enough to be hard, dissimilar enough to be true
    negatives (a near-dup used as a negative poisons the contrastive
    loss). Same one-scan broadcast-batch plan as ann_query_batch with
    the dup band filtered out before ranking; WindowGroupLimit keeps the
    per-query top-k partial."""
    from pyspark.sql import Window

    scored = _batch_scores(_t(spark, sf_dir)["embeddings"], HN_Q).filter(
        F.col("cos") < NEARDUP_COSINE
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= HN_TOP)
        .select("q_id", "vec_id", "cos", F.col("rk").cast("long").alias("rk"))
        .orderBy(F.col("q_id").asc(), F.col("rk").asc())
    )
