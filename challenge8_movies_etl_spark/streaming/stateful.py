"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.J surface row: stateful dedup / custom state machines).

The example operator is a per-user running counter with a high-water
timestamp — the minimal shape of real stateful jobs (feature counters,
rate limits, session enrichment): group state persists across
micro-batches in the state store, each batch folds its rows in and
emits the updated snapshot.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, last_ts timestamp"
STATE_SCHEMA = "n bigint, last bigint"


def _update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    n, last_us = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            last_us = max(last_us,
                          int(pdf["ts"].astype("int64").max()) // 1000)
    state.update((n, last_us))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "last_ts": [pd.Timestamp(last_us, unit="us")],
    })


def running_user_counter(stream_df: DataFrame) -> DataFrame:
    """Per-user running (count, last-event-ts) maintained in the state
    store; emits one updated row per user per micro-batch."""
    return (stream_df
            .groupBy("user_id")
            .applyInPandasWithState(
                _update,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))
