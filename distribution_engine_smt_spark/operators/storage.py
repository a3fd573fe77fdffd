"""Physical-layout maintenance for parquet state tables: small-file
compaction and range-sorted writes with data-skipping.

At 100 TB the two silent killers of scan throughput are (a) the small-file
problem — every micro-batch merge writes a few files per partition, and a
year of batches turns a 10 GB partition into 50k x 200 KB files whose open
costs dwarf the reads — and (b) unsorted row groups, which force every
query to read every row group because min/max footers span the whole key
domain. The reference never hits either because it is a row-store behind
Postgres (reference: engine/db_storage.py — the LSM/heap layout is the
database's problem); a lakehouse engine must do its own maintenance.

``compact_table``: bin-pack an existing parquet directory into
``ceil(bytes / target_bytes)`` files via a shuffle-free ``coalesce`` —
compaction must not pay a shuffle, it is pure IO — then atomically swap
(write to sibling tmp dir, rename over). Partitioned directories compact
each leaf partition independently, so the operation parallelizes across a
cluster and a failed swap affects one partition.

``write_range_sorted`` / ``pruned_scan_stats``: global range layout —
``repartitionByRange`` + ``sortWithinPartitions`` — gives every output
file a disjoint key span, so any key-range predicate prunes to the few
row groups whose footer min/max intersects it. ``pruned_scan_stats``
proves the skipping from the parquet footers themselves (via pyarrow):
the fraction of row groups a range predicate must read, which is what a
1000-executor scan's IO bill is proportional to.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # cluster default; tests use ~KBs


def _leaf_dirs(path: str) -> list[str]:
    """Leaf directories of a (possibly hive-partitioned) parquet tree."""
    leaves: list[str] = []
    for dirpath, dirnames, filenames in os.walk(path):
        if any(f.endswith(".parquet") for f in filenames):
            leaves.append(dirpath)
    return leaves


def _dir_parquet_bytes(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )


def compact_table(
    spark: SparkSession, path: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> dict[str, tuple[int, int]]:
    """Compact every leaf partition of ``path`` to ~``target_bytes`` files.

    Returns {leaf_dir: (files_before, files_after)}. Shuffle-free: each
    leaf is read and ``coalesce(n)``-ed (narrow dependency — input splits
    are concatenated, never redistributed), written to a tmp sibling, then
    swapped in. Data-identical by construction; the swap is
    rename-per-leaf so a crash leaves each partition either old or new,
    never mixed (same staged-rename discipline as the checkpoint sink,
    streaming/runner.py).
    """
    report: dict[str, tuple[int, int]] = {}
    for leaf in _leaf_dirs(path):
        files_before = [f for f in os.listdir(leaf) if f.endswith(".parquet")]
        total = _dir_parquet_bytes(leaf)
        n_out = max(1, math.ceil(total / target_bytes))
        if len(files_before) <= n_out:
            report[leaf] = (len(files_before), len(files_before))
            continue
        tmp = f"{leaf}__compact_{uuid.uuid4().hex[:8]}"
        spark.read.parquet(leaf).coalesce(n_out).write.mode("overwrite").parquet(tmp)
        old = f"{leaf}__old_{uuid.uuid4().hex[:8]}"
        os.rename(leaf, old)
        os.rename(tmp, leaf)
        shutil.rmtree(old)
        files_after = [f for f in os.listdir(leaf) if f.endswith(".parquet")]
        report[leaf] = (len(files_before), len(files_after))
    return report


def write_range_sorted(
    df: DataFrame, path: str, sort_cols: list[str], n_files: int
) -> None:
    """Write ``df`` with a global range layout on ``sort_cols``: file i
    holds a contiguous, disjoint key span, sorted within. One range
    shuffle (sampled split points, the same mechanism as a global
    orderBy), after which every file's parquet footer min/max is narrow —
    the write-side half of data skipping."""
    cols = [F.col(c) for c in sort_cols]
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def pruned_scan_stats(path: str, column: str, lo, hi) -> dict[str, int]:
    """Row groups a ``column BETWEEN lo AND hi`` scan must read, from the
    parquet footers alone (pyarrow) — the engine-independent measure of
    data skipping that executor scan IO is proportional to."""
    import pyarrow.parquet as pq

    total = 0
    needed = 0
    for leaf in _leaf_dirs(path):
        for fname in os.listdir(leaf):
            if not fname.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(leaf, fname)).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[column]
            for rg in range(md.num_row_groups):
                stats = md.row_group(rg).column(idx).statistics
                total += 1
                if stats is None or not stats.has_min_max:
                    needed += 1  # no stats -> must read
                elif not (stats.max < lo or stats.min > hi):
                    needed += 1
    return {"row_groups_total": total, "row_groups_needed": needed}


# ---------------------------------------------------------------------------
# IVF index materialization: cluster cell as the physical partition key
# ---------------------------------------------------------------------------


def build_ivf_index(spark, sf_dir: str, out_dir: str):
    """Materialize the trained-IVF layout: embeddings written to parquet
    PARTITIONED BY their k-means cell, which is what turns
    ``ann_ivf_kmeans_topk``'s "a probe reads ~1/k of the corpus" from a
    plan note into an I/O fact — the cell filter becomes a partition
    filter, and Spark never opens the other cells' files.

    Returns the centroids (driver-side k x dim floats) — the only state a
    prober needs besides the index path. At 100 TB this is the index-build
    job: one k-means fit + one partitioned write; rebuilds are per-cell
    replaceable (overwrite a cell directory, not the index).
    """
    from ..pipeline.clustering import kmeans_fit
    from ..tables import load_tpch

    asg, cents = kmeans_fit(spark, sf_dir)
    emb = load_tpch(spark, sf_dir)["embeddings"]
    (
        emb.join(asg, "vec_id")
        # batch_id sub-partition: the SAME two-level layout update_ivf_index
        # appends into (mixed partition depths break discovery); the base
        # build is just batch "base"
        .withColumn("batch_id", F.lit("base"))
        .repartition("cid")  # one writer group per cell -> no file spray
        .write.mode("overwrite")
        .partitionBy("cid", "batch_id")
        .parquet(out_dir)
    )
    return cents


def probe_ivf_index(spark, index_dir: str, centroids, q_vec, top: int = 10):
    """Probe the materialized index: assign the query to its nearest
    centroid DRIVER-SIDE (k distance computations on one vector), then scan
    ONLY that cell via the partition filter and exact-cosine rerank.

    The returned DataFrame's plan carries ``PartitionFilters: [cid = q]``;
    tests assert via ``inputFiles()`` that untouched cells are never read."""
    from pyspark.sql import functions as F

    from ..pipeline.similarity import dot_fold

    # driver-side coarse assignment (exactly what a vector-DB router does)
    def d2(a, b):
        return sum((float(x) - float(y)) ** 2 for x, y in zip(a, b))

    q_cid = min(range(len(centroids)), key=lambda i: (d2(q_vec, centroids[i]), i))
    q_norm = sum(float(x) * float(x) for x in q_vec) ** 0.5
    q_arr = F.array(*[F.lit(float(x)) for x in q_vec])
    cell = spark.read.parquet(index_dir).where(F.col("cid") == q_cid)
    return (
        cell.select(
            "vec_id",
            (
                dot_fold(F.col("embedding"), q_arr)
                / (
                    F.sqrt(dot_fold(F.col("embedding"), F.col("embedding")))
                    * F.lit(q_norm)
                )
            ).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(top)
    )


def update_ivf_index(
    spark: SparkSession,
    index_dir: str,
    centroids,
    new_vectors: DataFrame,
    batch_id: str,
):
    """Incremental IVF maintenance: route a batch of NEW vectors through
    the STORED quantizer (the same assignment-time centroids the probe
    router uses — router and cells stay consistent by construction) and
    write them into the cell-partitioned layout.

    Idempotence: files land under (cid, batch_id) with dynamic partition
    overwrite, so replaying a batch after a failure overwrites its own
    partitions instead of appending duplicates — the same at-least-once
    discipline as the streaming partition writes. The probe's partition
    filter on cid is untouched (batch_id is a sub-directory of the cell);
    periodic ``compact_table`` folds small batch files back together.

    At 100 TB this is the ingest path of a vector index: no refit, no
    rewrite of existing cells — k distance literals per new vector,
    map-only, then a partitioned write of just the batch."""
    from ..pipeline.clustering import _argmin_case, _dist_to_literal

    d = [_dist_to_literal(F.col("embedding"), c) for c in centroids]
    assigned = new_vectors.select(
        "vec_id",
        "embedding",
        _argmin_case(d).alias("cid"),
        F.lit(batch_id).alias("batch_id"),
    )
    (
        assigned.repartition("cid")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cid", "batch_id")
        .parquet(index_dir)
    )


def compact_ivf_cell(
    spark: SparkSession,
    index_dir: str,
    cid: int,
    target_bytes: int = DEFAULT_TARGET_BYTES,
):
    """Fold ONE cell's accumulated per-batch directories into a single
    consolidated batch partition. ``compact_table`` bin-packs within a
    leaf directory, and each (cid, batch_id) pair is its own leaf — so
    continuous ``update_ivf_index`` ingest needs THIS cross-batch step
    or the cell accumulates one small directory per batch forever (the
    exact small-file problem the module docstring warns about).

    Swap discipline: consolidated files land in a hidden sibling under a
    fresh ``batch_id=compacted-...`` leaf; the live cell is then renamed
    to a DOT-PREFIXED retirement dir (hidden: Spark partition discovery
    skips dot/underscore paths, so a crash mid-swap never leaves a
    malformed ``cid=N.old-...`` value for discovery to choke on) and the
    new dir renamed into place. The two renames are not one atomic unit:
    a crash in the window between them leaves the cell ABSENT but both
    hidden dirs intact — recovery is ``os.rename('.cid=N.old-<stamp>',
    'cid=N')`` (or the .compact dir, either is complete); probes in that
    window miss one cell's rows rather than reading partial state. A
    failed swap affects one cell only. Replay caveat (standard
    log-compaction rule): only compact batches OUTSIDE the ingest replay
    window — a replayed pre-compaction batch_id would dynamic-overwrite
    into a fresh directory and duplicate its rows against the
    consolidated files."""
    cell = os.path.join(index_dir, f"cid={cid}")
    df = spark.read.parquet(cell).drop("batch_id")
    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(cell)
        for f in fs
        if f.endswith(".parquet")
    )
    n_out = max(1, math.ceil(total / target_bytes))
    stamp = uuid.uuid4().hex[:8]
    tmp = os.path.join(index_dir, f".cid={cid}.compact-{stamp}")
    df.coalesce(n_out).write.mode("overwrite").parquet(
        os.path.join(tmp, f"batch_id=compacted-{stamp}")
    )
    # dot-prefixed so partition discovery ignores it if a crash strands it
    old = os.path.join(index_dir, f".cid={cid}.old-{stamp}")
    os.rename(cell, old)
    os.rename(tmp, cell)
    shutil.rmtree(old)
