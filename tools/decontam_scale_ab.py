#!/usr/bin/env python
"""VERDICT r12 #4: measure the minhash_decontaminate posting-join
crossover against the r11 broadcast nested-loop cross-join shape at
scale multiples of sf0.1 (scale_probe corpora, noop-sink timing).

The r12 trade: at sf0.1 the bench side is tiny, so the cross-join's
warm number LOOKS fine (the posting join reads ~0.2 s slower there);
but the bench side grows with the corpus under BENCH_MOD sampling, so
the cross-join's pair count is O(train x bench) = O(0.8n x 0.2n) while
the posting join materializes only component-colliding pairs. This
probe records the measured ratio at 1x/3x/10x/30x.

Usage: python tools/decontam_scale_ab.py [--scales 1,3,10,30]
Writes BENCH_DECONTAM_AB.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from distribution_engine_smt_spark.pipeline.decontam import (  # noqa: E402
    BENCH_MOD,
    MINHASH_DECON_AGREE,
    minhash_decontaminate,
)
from distribution_engine_smt_spark.session import get_spark, release_caches  # noqa: E402


def crossjoin_decontaminate(spark, sf_dir):
    """The r11 shape, frozen verbatim (pre-99cd7cc): broadcast nested
    loop over train x bench signature rows, 8 fixed-width comparisons
    per pair — O(train x bench) work at any scale."""
    from distribution_engine_smt_spark.pipeline.dedup import (
        N_HASHES,
        minhash_signature,
    )
    from distribution_engine_smt_spark.session import tracked_persist

    sig = minhash_signature(spark, sf_dir)
    bench = sig.filter(F.col("doc_id") % BENCH_MOD == 0).select(
        F.col("doc_id").alias("bench_id"),
        *[F.col(f"m{h}").alias(f"b{h}") for h in range(N_HASHES)],
    )
    train = sig.filter(F.col("doc_id") % BENCH_MOD != 0)
    agree = None
    for h in range(N_HASHES):
        term = F.when(F.col(f"m{h}") == F.col(f"b{h}"), 1).otherwise(0)
        agree = term if agree is None else agree + term
    pairs = tracked_persist(
        train.crossJoin(F.broadcast(bench))
        .select("doc_id", "bench_id", agree.alias("n_agree"))
    )
    best = pairs.groupBy("doc_id").agg(F.max("n_agree").alias("n_agree"))
    hit = (
        pairs.join(best, ["doc_id", "n_agree"])
        .filter(F.col("n_agree") >= 1)
        .groupBy("doc_id", "n_agree")
        .agg(F.min("bench_id").alias("best_match"))
    )
    return (
        train.select("doc_id")
        .join(hit, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_agree"), F.lit(0)).cast("long").alias("n_agree"),
            "best_match",
            (F.coalesce(F.col("n_agree"), F.lit(0)) >= MINHASH_DECON_AGREE).alias(
                "flagged"
            ),
        )
        .orderBy(F.col("doc_id").asc())
    )


def timed_noop(spark, df, label: str) -> float:
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    return round(dt, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,3,10,30")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    import scale_probe

    spark = get_spark("desmt-decontam-ab")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for m in scales:
        sf_dir = (
            os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
            if m == 1
            else scale_probe.build_scale_dir(spark, m)
        )
        rec = {}
        for label, fn in (
            ("posting_join", minhash_decontaminate),
            ("crossjoin_r11", crossjoin_decontaminate),
        ):
            release_caches(spark)
            df = fn(spark, sf_dir)
            cold = timed_noop(spark, df, f"decontam-ab {label} {m}x cold")
            warm = min(
                timed_noop(spark, fn(spark, sf_dir), f"decontam-ab {label} {m}x w{i}")
                for i in range(2)
            )
            rec[label] = {"cold": cold, "warm": warm}
        # same-scale sanity: both shapes must agree row-for-row
        release_caches(spark)
        a = minhash_decontaminate(spark, sf_dir)
        b = crossjoin_decontaminate(spark, sf_dir)
        mismatch = a.exceptAll(b).count() + b.exceptAll(a).count()
        rec["rows_mismatch"] = mismatch
        rec["ratio_warm_cross_over_posting"] = round(
            rec["crossjoin_r11"]["warm"] / max(rec["posting_join"]["warm"], 1e-9), 2
        )
        out[f"{m}x"] = rec
        print(json.dumps({f"{m}x": rec}), flush=True)
        release_caches(spark)
    with open(os.path.join(ROOT, "BENCH_DECONTAM_AB.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "decontam_ab", "scales": out}))


if __name__ == "__main__":
    main()
