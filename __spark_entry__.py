"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the engine's operator surface
(SURVEY.md §2 shapes + pipeline extensions) for the sf0.01 DuckDB
correctness gate. Implementations live in
``distribution_engine_smt_spark.driver_queries`` (+ ``pipeline.*``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distribution_engine_smt_spark import driver_queries  # noqa: E402
from distribution_engine_smt_spark import pipeline  # noqa: E402,F401  (registers extension queries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (get_discussions_by_created shape: broadcast dimension
    left join + muted suppression + pushed-down range filter + top-k) on
    /root/testdata/sf0.001."""
    return driver_queries.discussions_by_created(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(driver_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(driver_queries.ORACLE_SQL)
