#!/usr/bin/env python
"""Per-query profiling harness for the optimization rounds (guide §1).

For each named query: dump ``.explain("formatted")`` to
``plans/<tag>/<name>_<suffix>.txt``, then time it like bench.py does
(4 runs of ``.count()``: run 1 = cold, median of 2-4 = warm) plus one
noop-sink run (guide §1.4 — computes every column, no count-only
column pruning) so the numbers separate "what the bench sees" from
"what the full materialization costs". ``release_caches`` between
queries mirrors the bench's cache discipline.

Usage:
  python tools/profile_queries.py --suffix before q1 q2 ...
  python tools/profile_queries.py --top 20          # slowest from BENCH_DETAIL.json
  python tools/profile_queries.py --all             # whole registry
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from distribution_engine_smt_spark import driver_queries  # noqa: E402
import distribution_engine_smt_spark.pipeline  # noqa: E402,F401
from distribution_engine_smt_spark.session import get_spark, release_caches  # noqa: E402


def profile(names: list[str], sf_dir: str, tag: str, suffix: str,
            runs: int = 4, noop: bool = True, plans: bool = True) -> dict:
    spark = get_spark("desmt-profile")
    spark.sparkContext.setLogLevel("ERROR")
    plan_dir = os.path.join(ROOT, "plans", tag)
    os.makedirs(plan_dir, exist_ok=True)

    # session warm-up (JVM, codegen, parquet footers) — not billed
    driver_queries.QUERIES["discussions_by_created"](spark, sf_dir).count()

    from distribution_engine_smt_spark.operators.storage import ensure_stores

    t0 = time.perf_counter()
    ensure_stores(spark, sf_dir)
    store_sec = time.perf_counter() - t0
    spark.catalog.clearCache()

    out: dict[str, dict] = {}
    for name in names:
        fn = driver_queries.QUERIES[name]
        sc = spark.sparkContext
        if plans:
            df = fn(spark, sf_dir)
            with open(os.path.join(plan_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        rec: dict[str, float] = {}
        ts = []
        for i in range(runs):
            sc.setJobDescription(f"{name} count run {i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            ts.append(time.perf_counter() - t0)
        rec["cold"] = round(ts[0], 4)
        rec["warm"] = round(statistics.median(ts[1:]), 4)
        if noop:
            sc.setJobDescription(f"{name} noop")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            rec["noop_warm"] = round(time.perf_counter() - t0, 4)
        sc.setJobDescription(None)
        release_caches(spark)
        out[name] = rec
        print(f"{name}: cold={rec['cold']} warm={rec['warm']}"
              + (f" noop={rec['noop_warm']}" if noop else ""), flush=True)
    print(json.dumps({"store_build_sec": round(store_sec, 2), "queries": out}))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default="r12")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--top", type=int, default=0,
                    help="profile the N slowest-warm queries per BENCH_DETAIL.json")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--no-noop", action="store_true")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()
    names = list(args.names)
    if args.top:
        with open(os.path.join(ROOT, "BENCH_DETAIL.json")) as f:
            qs = json.load(f)["queries"]
        names += [k for k, _ in sorted(qs.items(), key=lambda kv: -kv[1])[: args.top]
                  if k not in names]
    if args.all:
        names = sorted(driver_queries.QUERIES)
    profile(names, args.sf_dir, args.tag, args.suffix, runs=args.runs,
            noop=not args.no_noop, plans=not args.no_plans)


if __name__ == "__main__":
    main()
