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


CDC_OUTPUT_SCHEMA = ("user_id bigint, is_live boolean, "
                     "final_value double, n_ops bigint, n_deletes bigint")
CDC_STATE_SCHEMA = ("live int, v_c bigint, n bigint, d bigint, "
                    "last_us bigint, last_eid bigint")


def _cdc_update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    # Order-INDEPENDENT fold: the live row is last-writer-wins by the
    # changelog's logical order (ts, event_id), carried in state — not
    # by arrival order. Arrow hands a group's rows as multiple chunks
    # whose boundaries ignore event time (the sf1.0 fixture's file is
    # not ts-sorted, which broke the first arrival-order version of
    # this fold), and real CDC consumers face the same interleaving
    # across micro-batches; tracking (last_us, last_eid) makes the
    # materialized row identical under ANY delivery order.
    live, v_c, n, d, last_us, last_eid = (
        state.get if state.exists else (0, 0, 0, 0, -1, -1))
    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        d += int((pdf["op"] == "D").sum())
        ts_us = (pdf["ts"].astype("datetime64[ns]").astype("int64")
                 // 1000)
        eid = pdf["event_id"].astype("int64")
        i = ts_us.reset_index(drop=True)
        j = eid.reset_index(drop=True)
        top = max(range(len(pdf)), key=lambda r: (i[r], j[r]))
        if (int(i[top]), int(j[top])) > (last_us, last_eid):
            last_us, last_eid = int(i[top]), int(j[top])
            op = pdf["op"].reset_index(drop=True)[top]
            if op == "D":
                live, v_c = 0, 0
            else:
                live, v_c = 1, int(pdf["v_c"].reset_index(drop=True)[top])
    state.update((live, v_c, n, d, last_us, last_eid))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "is_live": [bool(live)],
        "final_value": [v_c / 100.0 if live else None],
        "n_ops": [n],
        "n_deletes": [d],
    })


def cdc_apply(stream_df: DataFrame) -> DataFrame:
    """CDC changelog materialization as a custom stateful operator:
    per key, fold insert/update/delete ops in event order; state holds
    the live row (integer cents — exact) plus op/delete counters, and
    each micro-batch emits the updated snapshot (a delete emits a
    tombstone row, which a sink compacts away). Expects columns
    (user_id, ts, event_id, op, v_c)."""
    return (stream_df
            .groupBy("user_id")
            .applyInPandasWithState(
                _cdc_update,
                outputStructType=CDC_OUTPUT_SCHEMA,
                stateStructType=CDC_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))
