"""Width-ladder contract: the Python width functions and their DuckDB SQL
twins must agree at EVERY corpus size, not just the fixture scales — a
single disagreement silently breaks the Spark-vs-oracle match for the
banded/blocked operators."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from distribution_engine_smt_spark.pipeline import params


def _sql_eval(expr_sql: str, n: int) -> int:
    return duckdb.sql(f"SELECT {expr_sql.format(n=n)}").fetchone()[0]


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=1, max_value=10**13))
def test_rhp_bits_ladder_matches(n):
    assert params.rhp_bits_for(n) == _sql_eval(params.rhp_bits_sql("{n}"), n)


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=1, max_value=10**13))
def test_minhash_ladders_match(n):
    assert params.minhash_rows_for(n) == _sql_eval(
        params.minhash_rows_sql("{n}"), n
    )
    h, b, r = params.minhash_widths_for(n)
    assert b == _sql_eval(params.minhash_bands_sql("{n}"), n)
    assert h == b * r and b == 1 << r  # threshold (1/b)^(1/r) stays 0.5


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=1, max_value=10**13))
def test_ivf_cells_ladder_matches(n):
    assert params.ivf_cells_for(n) == _sql_eval(params.ivf_cells_sql("{n}"), n)


@pytest.mark.parametrize(
    "n,bits", [(1, 4), (500, 4), (2000, 5), (5000, 7), (20000, 9),
               # the r7 cap (12) saturated here — now the ladder keeps
               # tracking occupancy through the 100 TB range
               (32 * (1 << 12), 12), (32 * (1 << 13), 13),
               (1 << 20, 15), (10**9, 24), (10**12, 24)]
)
def test_rhp_bits_values(n, bits):
    # occupancy target: n / 2^bits stays within [T, 2T) once off the clamps
    assert params.rhp_bits_for(n) == bits


@pytest.mark.parametrize(
    "n,k", [(1, 4), (500, 4), (1599, 4), (1600, 8), (2000, 8),
            (6400, 16), (20000, 16), (25600, 32),
            # rungs past the r7 cap of 32
            (102399, 32), (102400, 64), (409600, 128),
            (1638400, 256), (10**9, 256)]
)
def test_ivf_cells_values(n, k):
    assert params.ivf_cells_for(n) == k


@pytest.mark.parametrize(
    "n,widths", [(1, (8, 4, 2)), ((1 << 16) - 1, (8, 4, 2)),
                 (1 << 16, (24, 8, 3)), ((1 << 24) - 1, (24, 8, 3)),
                 # the 100 TB rung (r=4, b=16, H=64) — was documentation
                 # only in r7, now a real ladder step in both twins
                 (1 << 24, (64, 16, 4)), (10**12, (64, 16, 4))]
)
def test_minhash_width_values(n, widths):
    assert params.minhash_widths_for(n) == widths


def test_exact_power_boundaries():
    # the float-log2 trap this module exists to avoid: exact thresholds
    T = params.RHP_TARGET_BUCKET
    for b in range(params.RHP_MIN_BITS, params.RHP_MAX_BITS + 1):
        lo = T * (1 << b)
        assert params.rhp_bits_for(lo) >= b
        assert params.rhp_bits_for(lo - 1) <= max(b - 1, params.RHP_MIN_BITS)
