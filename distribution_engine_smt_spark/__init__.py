"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference blockchain-indexer engine
(hive-engine/distribution-engine-smt, surveyed in SURVEY.md).

Architecture (Spark-first, not a port):

- ``schemas``    — explicit StructType constants for the 8 state tables and
                   the two event-stream shapes (SURVEY.md §1).
- ``tables``     — parquet-backed table layer: read/write/register helpers.
- ``operators``  — engine-level primitives the reference gets from Postgres:
                   keyed upsert/merge, additive counter merge, delete-by-key,
                   bounded recursive tree expansion, keyset pagination.
- ``functions``  — the scalar library (SURVEY.md §2.8) as pure Column
                   expressions; no row-at-a-time Python in the hot path.
- ``queries``    — the read-query library backing the reference's 17 API
                   endpoints (SURVEY.md §2.11), each a function
                   ``(tables, params) -> DataFrame``.
- ``processors`` — batch ingestion: pure functions
                   ``(state_tables, ops_batch) -> delta frames`` mirroring the
                   reference's event processors.
- ``streaming``  — Structured Streaming wrapper: foreachBatch over the same
                   processor functions, checkpointing, stream-alignment gate.
- ``pipeline``   — large-scale training-data-pipeline extensions: dedup
                   (exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding
                   similarity search, text analysis, multimodal column
                   plumbing.

Everything is DataFrame/Spark-SQL declarative so Catalyst handles pushdown,
pruning, join selection, and AQE handles skew/coalescing at scale.
"""

__version__ = "0.1.0"
