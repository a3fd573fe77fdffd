#!/usr/bin/env python
"""Count py4j round-trips per query CONSTRUCTION (``fn(spark, sf_dir)``,
no action) across the registry — the deterministic, noise-free metric
behind the r12/r13 one-parse collapse (guide §7.3: driver-side planning
cost; in PySpark the py4j chatter is its dominant constant factor).

Usage:
  python tools/construction_calls.py                 # whole registry
  python tools/construction_calls.py q1 q2 ...       # named queries
  python tools/construction_calls.py --min 500       # only print >= 500
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from distribution_engine_smt_spark import driver_queries  # noqa: E402
import distribution_engine_smt_spark.pipeline  # noqa: E402,F401
from distribution_engine_smt_spark.session import get_spark, release_caches  # noqa: E402


def install_counter() -> list[int]:
    import py4j.clientserver as cs

    count = [0]
    orig = cs.ClientServerConnection.send_command

    def counted(self, *a, **k):
        count[0] += 1
        return orig(self, *a, **k)

    cs.ClientServerConnection.send_command = counted
    return count


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--min", type=int, default=0)
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    spark = get_spark("desmt-construction-calls")
    spark.sparkContext.setLogLevel("ERROR")
    counter = install_counter()

    # warm the table cache so footer reads aren't billed to the first query
    driver_queries.QUERIES["discussions_by_created"](spark, args.sf_dir)
    from distribution_engine_smt_spark.operators.storage import ensure_stores

    ensure_stores(spark, args.sf_dir)
    spark.catalog.clearCache()

    names = args.names or sorted(driver_queries.QUERIES)
    out: dict[str, int] = {}
    for name in names:
        release_caches(spark)
        counter[0] = 0
        driver_queries.QUERIES[name](spark, args.sf_dir)
        out[name] = counter[0]

    total = sum(out.values())
    for name, n in sorted(out.items(), key=lambda kv: -kv[1]):
        if n >= args.min:
            print(f"{n:7d}  {name}")
    print(f"{total:7d}  TOTAL ({len(out)} queries)")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"total": total, "queries": out}, f, indent=1)


if __name__ == "__main__":
    main()
