"""Batch ingestion processors: pure functions
``(state_tables, ops_batch) -> state_tables'`` mirroring the reference's
seven event processors (reference: processors/*), re-expressed set-based.

The reference applies ops one row at a time inside a per-block transaction;
here each micro-batch derives per-entity delta frames and MERGEs them — the
same end state, one shuffle per table instead of one round-trip per row.
"""

from .l1 import apply_l1_batch
from .l2 import apply_l2_batch

__all__ = ["apply_l1_batch", "apply_l2_batch"]
