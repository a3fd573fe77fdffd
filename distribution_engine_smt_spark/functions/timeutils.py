"""Time/interval scalar functions (SURVEY.md §2.8 F11-F12, F18).

All timestamps are naive UTC (the reference normalizes with
``.replace(tzinfo=timezone.utc)`` — stream_blocks.py:255-257). Implemented
with ``timestamp_add``/``timestamp_diff`` so they work identically for
TIMESTAMP and TIMESTAMP_NTZ columns (the driver's parquet reads as NTZ) and
never depend on the session timezone.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH = datetime(1970, 1, 1)


def epoch_seconds(ts: Column) -> Column:
    """Seconds since the epoch, timezone-independent (NTZ-safe)."""
    return F.timestamp_diff("SECOND", F.lit(_EPOCH).cast("timestamp_ntz"), ts)


def add_days(ts: Column, days: Column) -> Column:
    """``cashout_time = created + cashout_window_days`` (reference:
    engine_comments_contract_processor.py:69-70)."""
    return F.timestamp_add("DAY", days.cast("int"), ts)


def within_last_days(ts: Column, days: int, now: Column) -> Column:
    """Rolling cutoff predicate: 30-day discussion bound, 2-week trending-tags
    bound (reference: engine/post_storage.py:171-173,404). A plain range
    predicate so it pushes down to the parquet scan. ``now`` must be a
    literal of the same timestamp family as ``ts``."""
    return ts >= F.timestamp_add("DAY", F.lit(-days), now)


def format_time(ts: Column) -> Column:
    """API wire format (reference: formatTimeString, server/app.py:76-80)."""
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")
