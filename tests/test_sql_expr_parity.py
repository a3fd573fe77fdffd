"""r12 construction-cost collapse: hot DataFrame builders compose Spark-SQL
TEXT and parse it once (selectExpr / F.expr) instead of building Column
trees call-by-call. The construction profile showed DataFrame-construction
latency is almost entirely py4j round-trips (~0.4 ms each; dedup_simhash
14k, dedup_embedding_lsh 12k per cold call) — the text form is two orders
of magnitude fewer round-trips for the SAME Catalyst tree.

The optimization contract is PLAN IDENTITY, not just value equality: each
converted builder must produce a canonicalized analyzed plan EQUAL to the
original Column-DSL form (same expressions, same evaluation order, same
IEEE float sequence — so every oracle hash is unchanged by construction).
This suite pins that for the shared kernels and one end-to-end operator
per family, with the DSL form inlined here as the frozen reference."""

from __future__ import annotations

from pyspark.sql import functions as F

from distribution_engine_smt_spark.pipeline.similarity import (
    _SIGNS,
    _rhp_bucket_expr,
    cosine,
    cosine_sql,
    dlit_array,
    dot_fold,
    dot_fold_sql,
)


def _canon(df) -> str:
    return df._jdf.queryExecution().analyzed().canonicalized().toString()


def _vec_frame(spark):
    rows = [
        (i, [((i * 31 + j * 7) % 17 - 8) / 3.0 for j in range(64)])
        for i in range(6)
    ]
    return spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<FLOAT>")


def test_dot_fold_sql_plan_and_bits(spark):
    df = _vec_frame(spark)
    old = df.select(dot_fold(F.col("embedding"), F.col("embedding")).alias("d"))
    new = df.selectExpr(dot_fold_sql("embedding", "embedding") + " AS d")
    assert _canon(old) == _canon(new)
    assert [r["d"] for r in old.collect()] == [r["d"] for r in new.collect()]


def test_cosine_sql_plan_equal(spark):
    df = _vec_frame(spark)
    a = df.selectExpr("vec_id AS ia", "embedding AS ea")
    b = df.selectExpr("vec_id AS ib", "embedding AS eb")
    j = a.crossJoin(b)
    old = j.select(cosine(F.col("ea"), F.col("eb")).alias("c"))
    new = j.selectExpr(cosine_sql("ea", "eb") + " AS c")
    assert _canon(old) == _canon(new)
    ro = [r["c"] for r in old.collect()]
    rn = [r["c"] for r in new.collect()]
    assert ro == rn  # bit-exact doubles, no tolerance


def _rhp_bucket_dsl(col, t: int, bits: int, start: int = 0):
    """Frozen pre-r12 Column-DSL reference for _rhp_bucket_expr."""
    acc = F.lit(0)
    for k in range(start, bits):
        dot = F.aggregate(
            F.zip_with(
                col.cast("array<double>"),
                dlit_array(_SIGNS[t][k]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )
        acc = acc + F.when(dot >= 0, F.lit(1 << k)).otherwise(F.lit(0))
    return acc


def test_rhp_bucket_expr_plan_and_values(spark):
    df = _vec_frame(spark)
    old = df.select(
        "vec_id", _rhp_bucket_dsl(F.col("embedding"), 2, 5).alias("b")
    )
    new = df.select("vec_id", F.expr(_rhp_bucket_expr("embedding", 2, 5)).alias("b"))
    assert _canon(old) == _canon(new)
    assert old.collect() == new.collect()
    # the width-migration delta form (start > 0) too
    oldd = df.select(
        "vec_id", _rhp_bucket_dsl(F.col("embedding"), 1, 7, start=4).alias("b")
    )
    newd = df.select(
        "vec_id", F.expr(_rhp_bucket_expr("embedding", 1, 7, start=4)).alias("b")
    )
    assert _canon(oldd) == _canon(newd)
    assert oldd.collect() == newd.collect()


def _simhash_dsl(docs):
    """Frozen pre-r12 Column-DSL reference for pipeline.dedup.dedup_simhash
    (the layered projections, verbatim from the r11 tree)."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    )
    hashed = toks.select("doc_id", F.md5(F.col("tok").cast("binary")).alias("h"))

    def _hexval(p: int):
        a = F.ascii(F.substring(F.col("h"), p, 1))
        return F.when(a <= 57, a - 48).otherwise(a - 87)

    vals = hashed.select(
        "doc_id", *[_hexval(p).alias(f"v{p}") for p in range(1, 17)]
    )

    def _packed(p: int, lo_bit: int):
        v = F.col(f"v{p}")
        return (
            F.shiftright(v, lo_bit).bitwiseAND(F.lit(1)).cast("long")
            + F.shiftleft(
                F.shiftright(v, lo_bit + 1).bitwiseAND(F.lit(1)).cast("long"), 32
            )
        )

    per_tok = vals.select(
        "doc_id",
        *[_packed(p, 0).alias(f"pk{p}a") for p in range(1, 17)],
        *[_packed(p, 2).alias(f"pk{p}b") for p in range(1, 17)],
    )
    agg = per_tok.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        *[F.sum(f"pk{p}a").alias(f"pk{p}a") for p in range(1, 17)],
        *[F.sum(f"pk{p}b").alias(f"pk{p}b") for p in range(1, 17)],
    )

    def _digit(p: int):
        out = F.lit(0)
        for b in range(4):
            col = F.col(f"pk{p}a") if b < 2 else F.col(f"pk{p}b")
            s = F.shiftright(col, 32 * (b % 2)).bitwiseAND(F.lit(0xFFFFFFFF))
            out = out + F.when(
                F.lit(2) * s >= F.col("n"), F.lit(1 << b)
            ).otherwise(F.lit(0))
        return F.lower(F.conv(out.cast("string"), 10, 16))

    return agg.select(
        "doc_id",
        F.concat(*[_digit(p) for p in range(1, 17)]).alias("simhash"),
    ).orderBy(F.col("doc_id").asc())


def test_dedup_simhash_sql_form_matches_dsl_reference(spark, monkeypatch):
    import distribution_engine_smt_spark.pipeline.dedup as dd

    docs = spark.createDataFrame(
        [(i, f"tok{i % 3} alpha beta tok{i % 5} gamma") for i in range(40)],
        "doc_id INT, text STRING",
    )
    monkeypatch.setattr(dd, "_t", lambda s, d: {"documents": docs})
    new = dd.dedup_simhash.__wrapped__(spark, "ignored")
    old = _simhash_dsl(docs)
    assert _canon(old) == _canon(new)
    assert old.collect() == new.collect()
