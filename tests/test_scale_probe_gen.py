"""Validity of the scale-probe corpus generator (scale_probe.py): the
m-fold corpora must scale row counts exactly, preserve referential
integrity, and — critically — NOT inflate similarity structure (per-copy
token suffixes ⇒ zero cross-copy shingle overlap; per-copy embedding
rotation ⇒ copies are not near-identical vectors). If these break, every
BENCH_SCALE ratio silently measures the wrong thing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import scale_probe
from distribution_engine_smt_spark.pipeline.dedup import shingles
from distribution_engine_smt_spark.tables import load_tpch

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def x2_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("scale")
    orig_root, orig_base = scale_probe.ROOT, scale_probe.BASE
    scale_probe.ROOT = str(base)
    scale_probe.BASE = SF_DIR  # sf0.001: the generator logic, cheaply
    try:
        yield scale_probe.build_scale_dir(spark, 2)
    finally:
        scale_probe.ROOT, scale_probe.BASE = orig_root, orig_base


def test_row_counts_scale_exactly(spark, x2_dir):
    orig = load_tpch(spark, SF_DIR)
    gen = load_tpch(spark, x2_dir)
    for fact in ["documents", "embeddings", "events", "orders", "lineitem",
                 "customer"]:
        assert gen[fact].count() == 2 * orig[fact].count(), fact
    for dim in ["region", "nation", "supplier", "part"]:
        assert gen[dim].count() == orig[dim].count(), dim


def test_keys_disjoint_and_referentially_intact(spark, x2_dir):
    gen = load_tpch(spark, x2_dir)
    docs = gen["documents"]
    assert docs.select("doc_id").distinct().count() == docs.count()
    # copy-1 keys sit exactly one offset above copy-0
    lo = docs.filter(F.col("doc_id") < scale_probe.OFF)
    hi = docs.filter(F.col("doc_id") >= scale_probe.OFF)
    assert lo.count() == hi.count()
    # orders reference customers that exist (offset applied consistently)
    dangling = gen["orders"].join(
        gen["customer"],
        gen["orders"]["o_custkey"] == gen["customer"]["c_custkey"],
        "left_anti",
    )
    assert dangling.count() == 0
    # lineitem still joins its (unreplicated) part/supplier dims
    dangling_part = gen["lineitem"].join(
        gen["part"], gen["lineitem"]["l_partkey"] == gen["part"]["p_partkey"],
        "left_anti",
    )
    assert dangling_part.count() == 0


def test_copies_share_no_shingles(spark, x2_dir):
    """The load-bearing property: near-dup structure scales m-fold, it
    does not explode into cross-copy cliques."""
    docs = load_tpch(spark, x2_dir)["documents"]
    sh = docs.select(
        "doc_id", F.explode(shingles(F.col("text"))).alias("g")
    )
    lo = sh.filter(F.col("doc_id") < scale_probe.OFF).select("g")
    hi = sh.filter(F.col("doc_id") >= scale_probe.OFF).select("g")
    assert lo.join(hi, "g", "left_semi").count() == 0


def test_embeddings_rotated_not_cloned(spark, x2_dir):
    emb = load_tpch(spark, x2_dir)["embeddings"]
    v0 = emb.filter(F.col("vec_id") == 7).first()["embedding"]
    v1 = emb.filter(F.col("vec_id") == scale_probe.OFF + 7).first()["embedding"]
    assert [float(x) for x in v1] != [float(x) for x in v0]
    # cyclic rotation by 1: same multiset of components, shifted position
    assert sorted(map(float, v1)) == sorted(map(float, v0))
    assert [float(x) for x in v1] == [float(x) for x in v0[1:]] + [float(v0[0])]
