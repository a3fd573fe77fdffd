"""Large-scale training-data-pipeline extensions (beyond the reference
surface, driver-mandated): deduplication, similarity search, text analysis,
multimodal column plumbing, classic OLAP reporting shapes, and the
portable mergeable-sketch family (HLL / count-min / KMV / Bloom /
hash-sampled quantiles). Importing this package registers the extension
queries into the central driver query registry."""

from . import (  # noqa: F401
    audit,
    clustered,
    clustering,
    curation,
    decontam,
    dedup,
    graph,
    multimodal,
    olap,
    pq,
    redaction,
    search,
    shards,
    similarity,
    sketches,
    temporal,
    textstats,
)
