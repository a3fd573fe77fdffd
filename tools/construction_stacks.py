#!/usr/bin/env python
"""Attribute py4j round-trips during query construction to repo call
sites (the innermost distribution_engine_smt_spark / bench frame), so
the one-parse conversion targets the real senders instead of guesses.

Usage: python tools/construction_stacks.py <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys
import traceback
from collections import Counter

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from distribution_engine_smt_spark import driver_queries  # noqa: E402
import distribution_engine_smt_spark.pipeline  # noqa: E402,F401
from distribution_engine_smt_spark.session import get_spark, release_caches  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("desmt-construction-stacks")
    spark.sparkContext.setLogLevel("ERROR")

    import py4j.clientserver as cs

    hits: Counter[str] = Counter()
    enabled = [False]
    orig = cs.ClientServerConnection.send_command

    def counted(self, *a, **k):
        if enabled[0]:
            frames = traceback.extract_stack(limit=80)
            site = None
            pyspark_site = "<none>"
            for fr in reversed(frames):
                fn = fr.filename
                if "/py4j/" in fn:
                    continue
                if "/pyspark/" in fn:
                    if pyspark_site == "<none>":
                        pyspark_site = f"[pyspark] {os.path.basename(fn)}:{fr.lineno} {fr.name}"
                    continue
                if "distribution_engine_smt_spark" in fn or fn.endswith(("bench.py", "__spark_entry__.py")):
                    site = f"{os.path.relpath(fn, ROOT)}:{fr.lineno} {fr.name}"
                    break
            hits[site or pyspark_site] += 1
        return orig(self, *a, **k)

    cs.ClientServerConnection.send_command = counted

    driver_queries.QUERIES["discussions_by_created"](spark, sf_dir)
    from distribution_engine_smt_spark.operators.storage import ensure_stores

    ensure_stores(spark, sf_dir)
    spark.catalog.clearCache()

    for name in sys.argv[1:]:
        release_caches(spark)
        hits.clear()
        enabled[0] = True
        driver_queries.QUERIES[name](spark, sf_dir)
        enabled[0] = False
        total = sum(hits.values())
        print(f"\n=== {name}: {total} round-trips ===")
        for site, n in hits.most_common(25):
            print(f"{n:6d}  {site}")


if __name__ == "__main__":
    main()
