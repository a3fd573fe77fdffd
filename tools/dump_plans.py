#!/usr/bin/env python
"""Dump .explain("formatted") for named queries (construction only, no
execution) into plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/dump_plans.py --tag r13 --suffix before q1 q2 ...
"""

from __future__ import annotations

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from distribution_engine_smt_spark import driver_queries  # noqa: E402
import distribution_engine_smt_spark.pipeline  # noqa: E402,F401
from distribution_engine_smt_spark.session import get_spark, release_caches  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    spark = get_spark("desmt-dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    from distribution_engine_smt_spark.operators.storage import ensure_stores

    ensure_stores(spark, args.sf_dir)
    plan_dir = os.path.join(ROOT, "plans", args.tag)
    os.makedirs(plan_dir, exist_ok=True)
    for name in args.names:
        release_caches(spark)
        df = driver_queries.QUERIES[name](spark, args.sf_dir)
        out = os.path.join(plan_dir, f"{name}_{args.suffix}.txt")
        with open(out, "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted")))
        print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
