"""Property-based tests (hypothesis) for the sketch algebra: the Spark
HLL register fold must equal an independent pure-Python replay on
arbitrary key sets, register max-merge must be lossless under ANY
partitioning of the input, and the CMS estimate must dominate the true
count for every token in every corpus. The sf-data tests pin behavior on
the real corpus; these pin the ALGEBRA on adversarial inputs."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from distribution_engine_smt_spark.pipeline.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_M,
    HLL_RHO_MAX,
    cms_cells,
    hll_registers,
)

_keys = st.lists(st.integers(0, 99), min_size=1, max_size=40)
_tokens = st.lists(
    st.text(alphabet="abcxyz", min_size=1, max_size=4), min_size=1, max_size=30
)


def _py_hv(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_registers(keys) -> dict[int, int]:
    reg: dict[int, int] = defaultdict(int)
    for k in keys:
        hv = _py_hv(str(k))
        bucket, w = hv % HLL_M, hv // HLL_M
        rho = HLL_RHO_MAX if w == 0 else HLL_RHO_MAX - w.bit_length()
        reg[bucket] = max(reg[bucket], rho)
    return dict(reg)


def _spark_registers(spark, keys) -> dict[int, int]:
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    reg = hll_registers(df, [], "CAST(CAST(k AS STRING) AS BINARY)")
    return {r["bucket"]: r["m_j"] for r in reg.collect()}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(keys=_keys)
def test_hll_registers_match_python_model(spark, keys):
    """The distributed register fold equals the sequential model on any
    key multiset — the md5 layout (low bits bucket, bit_length rho) is
    pinned against an independent implementation, so a drift in the
    conv/bin/shift plumbing can't hide behind 'both engines changed'."""
    assert _spark_registers(spark, keys) == _py_registers(keys)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(keys=_keys, cut=st.integers(0, 100))
def test_hll_merge_lossless_under_any_partitioning(keys, cut):
    """max-merge of per-part registers == registers of the whole, for ANY
    split point — the algebra hll_daily_merge and the streaming restart
    rely on, checked in the Python model (== Spark by the test above)."""
    lo = [k for k in keys if k < cut]
    hi = [k for k in keys if k >= cut]
    merged: dict[int, int] = defaultdict(int)
    for part in (_py_registers(lo), _py_registers(hi)):
        for b, r in part.items():
            merged[b] = max(merged[b], r)
    assert dict(merged) == _py_registers(keys)


def _py_cms(counts: Counter) -> dict[tuple[int, int], int]:
    cells: dict[tuple[int, int], int] = defaultdict(int)
    for tok, n in counts.items():
        for j in range(CMS_DEPTH):
            cells[(j, _py_hv(f"cms{j}:{tok}") % CMS_WIDTH)] += n
    return dict(cells)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tokens=_tokens)
def test_cms_cells_match_python_model_and_dominate_truth(spark, tokens):
    counts = Counter(tokens)
    df = spark.createDataFrame([(t,) for t in tokens], "tok string")
    cells = {
        (r["j"], r["bucket"]): r["cell"] for r in cms_cells(df).collect()
    }
    assert cells == _py_cms(counts)
    # one-sided error: min over rows never underestimates any token
    for tok, n in counts.items():
        est = min(
            cells[(j, _py_hv(f"cms{j}:{tok}") % CMS_WIDTH)]
            for j in range(CMS_DEPTH)
        )
        assert est >= n
