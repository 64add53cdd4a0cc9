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
            # normalize to ns first: Arrow->pandas may yield
            # datetime64[us] (pandas 2.x), where a bare
            # .astype('int64')//1000 would be scaled 1000x wrong
            ts_ns = pdf["ts"].astype("datetime64[ns]").astype("int64")
            last_us = max(last_us, int(ts_ns.max()) // 1000)
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


def running_user_counter_tws(stream_df: DataFrame) -> DataFrame:
    """Spark 4 transformWithStateInPandas twin of
    :func:`running_user_counter` — the successor API: typed state
    variables (ValueState) on a StatefulProcessor handle instead of a
    single tuple, per-key timers, and state schema evolution. Same
    semantics: per-user running (count, last-event-ts) snapshot emitted
    each micro-batch; equivalence to the batch aggregate is asserted in
    tests/test_stateful_streaming.py (skipped in this container: the
    TWS driver worker requires the python protobuf package, which is
    not installed and cannot be — the operator surface is real and the
    test runs wherever protobuf exists).
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class Counter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("cnt", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, last_us = (self._state.get() if self._state.exists()
                          else (0, 0))
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    # normalize to ns first: Arrow->pandas may yield
                    # datetime64[us] (pandas 2.x), where a bare
                    # .astype('int64')//1000 would be scaled 1000x wrong
                    ts_ns = pdf["ts"].astype("datetime64[ns]").astype("int64")
                    last_us = max(last_us, int(ts_ns.max()) // 1000)
            self._state.update((n, last_us))
            yield pd.DataFrame({
                "user_id": [key[0]],
                "n_events": [n],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            })

        def close(self) -> None:
            pass

    return (stream_df
            .groupBy("user_id")
            .transformWithStateInPandas(
                Counter(),
                outputStructType=OUTPUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            ))
