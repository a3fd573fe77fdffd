"""The r12 literal-array collapse (similarity.dlit_array / dlit_array2 /
_plane_sql) replaced ``F.array(*[F.lit(float(x)) ...])`` trees with single
parsed array literals purely to cut DataFrame-construction cost. The
optimization contract is BIT-IDENTITY: the parsed doubles must equal the
per-element literals exactly (repr(float) is the shortest round-trip
representation, and the SQL parser reads it back as the same IEEE double),
or every LSH/PQ/kmeans consumer's oracle hash would drift."""

from __future__ import annotations

from pyspark.sql import functions as F

from distribution_engine_smt_spark.pipeline.similarity import (
    _SIGNS,
    _plane_sql,
    dlit_array,
    dlit_array2,
)

# adversarial doubles: subnormal, huge, shortest-repr-sensitive decimals,
# negative zero, exact halves — anything where a lossy decimal round-trip
# or parser type coercion would show
TRICKY = [
    0.1,
    -0.1,
    1.0 / 3.0,
    2.0 / 3.0,
    1e-308,
    5e-324,
    1.7976931348623157e308,
    -0.0,
    0.0,
    1.0,
    123456789.123456789,
    -2.2250738585072014e-308,
    3.141592653589793,
    1e16 + 2,
]


def test_dlit_array_bit_identical_to_per_element_lits(spark):
    old = F.array(*[F.lit(float(v)) for v in TRICKY])
    row = spark.range(1).select(
        old.alias("old"), dlit_array(TRICKY).alias("new")
    ).first()
    # compare via repr to catch -0.0 vs 0.0 sign flips bit-wise
    assert [repr(x) for x in row["old"]] == [repr(x) for x in row["new"]]


def test_dlit_array_type_is_array_double(spark):
    df = spark.range(1).select(dlit_array([1.0, 0.5]).alias("a"))
    assert df.schema["a"].dataType.simpleString() == "array<double>"


def test_dlit_array2_bit_identical(spark):
    rows = [TRICKY[:7], TRICKY[7:]]
    old = F.array(*[F.array(*[F.lit(float(v)) for v in r]) for r in rows])
    got = spark.range(1).select(
        old.alias("old"), dlit_array2(rows).alias("new")
    ).first()
    assert [[repr(x) for x in r] for r in got["old"]] == [
        [repr(x) for x in r] for r in got["new"]
    ]
    df = spark.range(1).select(dlit_array2(rows).alias("a"))
    assert df.schema["a"].dataType.simpleString() == "array<array<double>>"


def test_plane_sql_matches_signs_table(spark):
    # the cached plane literal text must reproduce the RHP sign table exactly
    vals = spark.range(1).select(
        F.expr(_plane_sql(0, 0)).alias("p0"), F.expr(_plane_sql(1, 3)).alias("p1")
    ).first()
    assert list(vals["p0"]) == [float(s) for s in _SIGNS[0][0]]
    assert list(vals["p1"]) == [float(s) for s in _SIGNS[1][3]]
    # and the lru_cache must hand back the same string object on re-call
    assert _plane_sql(0, 0) is _plane_sql(0, 0)
