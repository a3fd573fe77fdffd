"""Cross-check every driver-facing query against its DuckDB oracle at
sf0.01 — a local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

import distribution_engine_smt_spark.pipeline  # noqa: F401  (registers extension queries)
from distribution_engine_smt_spark.driver_queries import ORACLE_SQL, QUERIES

from .conftest import SF_DIR_ORACLE
from .oracle_harness import compare, duck_con


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    df = QUERIES[name](spark, SF_DIR_ORACLE)
    assert df.count() > 0, f"{name}: query returned no rows"
    if name not in ORACLE_SQL:
        pytest.skip(f"{name}: no oracle (rows-only check)")
    problems = compare(df, ORACLE_SQL[name], con)
    assert not problems, f"{name}: {problems}"
