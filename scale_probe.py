"""Synthetic scale probe: measure sec-vs-scale for the slowest queries
(VERDICT r5 "next round" #3 — convert every "scales" claim from
plan-reading to measurement).

No sf1 exists in /root/testdata, so this generates scale-multiplied
corpora under ``<repo>/.scale/`` (gitignored) from sf0.1 and times the
probe queries at 1x / 3x / 10x. A query whose physical plan is linear in
the data should show time ratios ~= the scale ratios (modulo fixed
startup cost); super-linear growth at 10x is exactly the "quadratic
residue" a 100 TB deployment cannot tolerate.

Generation rules (copy i of m, key offset i*100M — referential integrity
preserved, similarity structure NOT inflated):

- ``documents``: every token of copy i>0 gets an ``_c{i}`` suffix, so
  copies share ZERO shingles with each other or the original — near-dup
  pair counts scale exactly m-fold instead of exploding into
  45-pairs-per-doc cliques of verbatim copies (which would measure an
  adversarial duplicate blowup, not engine scaling).
- ``embeddings``: copy i's vectors are cyclically rotated by i
  components — uncorrelated across copies, so cosine-threshold pair
  structure also scales ~m-fold.
- ``orders``/``lineitem``/``customer``/``events``: key-offset copies
  (o_orderkey, l_orderkey, c_custkey/o_custkey, event_id/user_id);
  small dims (region/nation/supplier/part) stay single-copy, exactly
  like a real 10x fact-table growth against stable dimensions.

Output: BENCH_SCALE.json at the repo root + one JSON summary line, with
per-query {scale: {cold, warm}} and the warm 10x/1x ratio. Queries
marked ``quadratic-baseline`` are the documented all-pairs references
(their banded/blocked scale twins are the production path); they probe
only up to 3x.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from distribution_engine_smt_spark import driver_queries
import distribution_engine_smt_spark.pipeline  # noqa: F401
from distribution_engine_smt_spark.session import get_spark
from distribution_engine_smt_spark.tables import load_tpch

BASE = os.environ.get("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.1")
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scale")
OFF = 100_000_000
SCALES = [1, 3, 10]
DIM = 64

# the 10 slowest r5 bench queries (BENCH_DETAIL.json), tagged with the
# scaling their plan claims; "linear" must hold at 10x
PROBE = {
    "cross_source_dup_matrix": "linear",
    "dedup_minhash_lsh": "linear",
    "dedup_embedding_lsh": "linear",
    "graph_pagerank": "linear",
    "minhash_decontaminate": "linear",
    "ann_pq_topk": "linear",
    "thread_tree": "linear",
    "trending_tags": "linear",
    "dedup_ngram_jaccard": "quadratic-baseline",
    "dedup_embedding_cosine": "quadratic-baseline",
}
MAX_SCALE_FOR_BASELINE = 3


def _copies(df, m: int, exprs):
    out = None
    for i in range(m):
        c = df.select(*exprs(i))
        out = c if out is None else out.unionByName(c)
    return out


def build_scale_dir(spark, m: int) -> str:
    """Materialize the m-fold corpus (idempotent, atomic per table via
    write-then-rename of the whole directory)."""
    path = os.path.join(ROOT, f"x{m}")
    if os.path.isdir(path):
        return path
    t = load_tpch(spark, BASE)
    tmp = path + ".build"
    os.makedirs(tmp, exist_ok=True)

    def off(col, i):
        return (F.col(col) + F.lit(i * OFF)).alias(col)

    gens = {
        "documents": lambda i: [
            off("doc_id", i),
            (
                F.col("text")
                if i == 0
                else F.regexp_replace("text", r"(\S+)", f"$1_c{i}")
            ).alias("text"),
            "lang",
            "source",
            (F.length(F.col("text")) if i == 0 else F.length(
                F.regexp_replace("text", r"(\S+)", f"$1_c{i}")
            )).cast("long").alias("n_chars"),
        ],
        "embeddings": lambda i: [
            off("vec_id", i),
            (
                F.col("embedding")
                if i == 0
                else F.concat(
                    F.slice("embedding", i + 1, DIM - i), F.slice("embedding", 1, i)
                )
            ).alias("embedding"),
            "label",
        ],
        "events": lambda i: [
            off("event_id", i), "ts", off("user_id", i),
            "event_type", "value", "props",
        ],
        "orders": lambda i: [
            off("o_orderkey", i), off("o_custkey", i), "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority",
        ],
        "lineitem": lambda i: [
            off("l_orderkey", i), "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ],
        "customer": lambda i: [
            off("c_custkey", i), "c_name", "c_nationkey", "c_acctbal",
            "c_mktsegment",
        ],
    }
    for name, df in t.items():
        if name in gens:
            out = _copies(df, m, gens[name])
        else:  # stable dimensions: region/nation/supplier/part
            out = df
        out.write.mode("overwrite").parquet(os.path.join(tmp, f"{name}.parquet"))
    os.rename(tmp, path)
    return path


def main() -> None:
    spark = get_spark("desmt-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # every scale must take the same code path for its ratio to mean
    # anything: point the store root at a never-populated directory so
    # scale-1 cannot silently read the repo's sf0.1 stores (bench builds
    # them) while 3x/10x derive from scratch
    os.environ["SPARK_GRAFT_STORE_DIR"] = os.path.join(ROOT, "no-stores")
    dirs = {1: BASE}
    for m in SCALES:
        if m != 1:
            dirs[m] = build_scale_dir(spark, m)
    # warm the JVM once so scale-1's first query doesn't bill startup
    driver_queries.QUERIES["trending_tags"](spark, BASE).count()
    spark.catalog.clearCache()

    results: dict[str, dict] = {}
    for name, kind in PROBE.items():
        fn = driver_queries.QUERIES[name]
        per_scale = {}
        for m in SCALES:
            if kind == "quadratic-baseline" and m > MAX_SCALE_FOR_BASELINE:
                continue
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                n = fn(spark, dirs[m]).count()
                runs.append(round(time.perf_counter() - t0, 4))
            per_scale[str(m)] = {"cold": runs[0], "warm": runs[1], "rows": n}
            spark.catalog.clearCache()
        top = str(max(int(s) for s in per_scale))
        ratio = round(per_scale[top]["warm"] / max(per_scale["1"]["warm"], 1e-9), 2)
        results[name] = {
            "expected": kind,
            "scales": per_scale,
            f"warm_ratio_{top}x_vs_1x": ratio,
        }
        print(json.dumps({"probe": name, **results[name]}))

    # ---- store-build scaling: the ingest-side half of the scale story.
    # Each scale gets its own scoped store root; the memoized plans are
    # dropped first so the builds compose store-aware exactly like a fresh
    # index-build session (signatures land first, the pair build reads
    # them). The k-means fit can legitimately fail on a perturbed corpus
    # (empty cluster -> reseed required); that is recorded, not fatal.
    from distribution_engine_smt_spark import driver_queries as _dq
    from distribution_engine_smt_spark.operators import storage as _st

    import shutil

    store_builds: dict[str, dict] = {}
    for m in SCALES:
        root = os.path.join(ROOT, f"stores-x{m}")
        shutil.rmtree(root, ignore_errors=True)  # re-runs measure real builds
        os.environ["SPARK_GRAFT_STORE_DIR"] = root
        _dq._DF_CACHE.clear()
        spark.catalog.clearCache()
        per = {}
        for label, builder in [
            ("signatures", _st.build_minhash_signature_store),
            ("postings", _st.build_shingle_postings_store),
            ("pairs", _st.build_dedup_pair_store),
            ("clusters", _st.build_dedup_cluster_store),
            ("kmeans", _st.build_kmeans_fit_store),
        ]:
            t0 = time.perf_counter()
            try:
                builder(spark, dirs[m])
                per[label] = round(time.perf_counter() - t0, 4)
            except Exception as ex:  # noqa: BLE001 — recorded, not fatal
                per[label] = f"error: {str(ex)[:80]}"
        store_builds[str(m)] = per
        log_total = sum(v for v in per.values() if isinstance(v, float))
        print(json.dumps({"store_build_scale": m, "sec": round(log_total, 2), **per}))
    os.environ.pop("SPARK_GRAFT_STORE_DIR", None)

    report = {
        "metric": "scale_probe",
        "base_sf_dir": BASE,
        "scales": SCALES,
        "key_offset": OFF,
        "queries": results,
        "store_builds": store_builds,
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SCALE.json"),
        "w",
    ) as f:
        json.dump(report, f, indent=1)
    worst = max(
        (
            (v[[k for k in v if k.startswith("warm_ratio")][0]] / int(
                [k for k in v if k.startswith("warm_ratio")][0].split("_")[2][:-1]
            ), n)
            for n, v in results.items()
            if v["expected"] == "linear"
        ),
        default=(0, None),
    )
    print(
        json.dumps(
            {
                "metric": "scale_probe_summary",
                "n_queries": len(results),
                "worst_linear_normalized_ratio": round(worst[0], 2),
                "worst_linear_query": worst[1],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
