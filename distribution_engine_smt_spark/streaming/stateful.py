"""Custom stateful streaming operator via applyInPandasWithState.

The batch-first processors re-derive running aggregates per micro-batch
against the stored state (SURVEY.md ST7); this module is the
continuous-query alternative: per-key state lives INSIDE the streaming
engine (RocksDB/HDFS state store at scale), so totals update without
re-reading the posts table.

Demonstrated on the vote running-sum (reference semantics A6: per
(authorperm, token, voter) the LAST rshares replaces the previous one;
the post total is the sum over voters). The same shape handles session
windows, per-entity counters, and dedup-with-TTL.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DecimalType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("authorperm", StringType()),
        StructField("token", StringType()),
        StructField("vote_rshares", DecimalType(38, 10)),
    ]
)

# engine-managed per-key state: {voter: last_rshares_string}
STATE_SCHEMA = StructType(
    [StructField("voters", StringType())]  # JSON map voter -> rshares str
)


def _update_post_totals(
    key: Tuple[str, str],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fully self-contained (executors import nothing from this repo):
    fold the batch's votes into the per-voter map, emit the new total."""
    import json as _json
    from decimal import Decimal as _D

    import pandas as _pd

    voters: dict[str, str] = (
        _json.loads(state.get[0]) if state.exists else {}
    )
    rows = _pd.concat(list(batches), ignore_index=True)
    # reference semantics: later (block, seq) wins per voter
    rows = rows.sort_values(["seq"])
    for r in rows.itertuples():
        voters[r.voter] = str(r.rshares)
    state.update((_json.dumps(voters),))
    total = sum((_D(v) for v in voters.values()), _D(0))
    yield _pd.DataFrame(
        {
            "authorperm": [key[0]],
            "token": [key[1]],
            "vote_rshares": [total],
        }
    )


def running_vote_totals(votes_stream: DataFrame) -> DataFrame:
    """votes_stream(authorperm, token, voter, rshares, seq) ->
    continuously-updated per-post totals. State = per-voter last rshares,
    partitioned by (authorperm, token) across the cluster's state store."""
    return (
        votes_stream.groupBy("authorperm", "token")
        .applyInPandasWithState(
            _update_post_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
