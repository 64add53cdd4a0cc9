"""Streaming sinks & replay utilities — the reference's LOAD stage,
distributed.

The reference appended 26M rating rows to PostgreSQL in 1,000,000-row
chunks, printing rows_imported and elapsed seconds per chunk
(challenge.py≈L203-210 [R], SURVEY.md §3.1 — its only 'incremental'
processing). Structured Streaming's foreachBatch is the engine
equivalent: each micro-batch is a chunk, the sink write is
executor-parallel, and progress reporting comes per epoch.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def chunked_load(stream_df: DataFrame, write_batch: Callable[[DataFrame, int], None],
                 checkpoint_dir: str,
                 progress: Callable[[str], None] = print):
    """foreachBatch chunked ingest with the reference's progress
    contract (rows_imported + elapsed per chunk). ``write_batch``
    performs the actual sink write (parquet append, JDBC, ...) —
    exactly-once when the sink write is idempotent per epoch_id."""
    state = {"rows": 0, "t0": time.time()}

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        write_batch(batch_df, epoch_id)
        state["rows"] += batch_df.count()
        progress(f"epoch {epoch_id}: rows_imported={state['rows']} "
                 f"elapsed={time.time() - state['t0']:.1f}s")

    return (stream_df.writeStream
            .foreachBatch(handle)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def replay_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events fixture with the TIMESTAMP(NANOS)
    repair applied — the shared entry point for replay tests.

    Layout-aware: the driver fixtures store events.parquet as a single
    FILE inside sf_dir (stream sf_dir with a pathGlobFilter — the file
    source rejects a file as basePath), while Spark-written fixtures
    (tools/scalegen.py sf1.0) store it as a DIRECTORY of part files
    (stream the directory; the glob filter would match no part file
    and SILENTLY deliver zero rows — the sf1.0 sweep caught exactly
    that as a q_stream_backfill hash-fail)."""
    import os

    from ..session import apply_required_conf
    from ..sources.fixtures import repair_events_ts
    apply_required_conf(spark)
    path = f"{sf_dir}/events.parquet"
    raw_schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(raw_schema)
    if os.path.isdir(path):
        stream = reader.parquet(path)
    else:
        stream = reader.option("pathGlobFilter", "events.parquet") \
            .parquet(sf_dir)
    return repair_events_ts(stream)


def drain(query, timeout: int = 1800) -> None:
    """Wait for an availableNow replay to terminate, RAISING on
    timeout instead of returning control with a partially-filled sink.

    The previous idiom (`q.awaitTermination(180); if q.isActive:
    q.stop()`) silently truncated: at sf1.0 under load the backfill
    replay outlived 180 s, the memory table came back EMPTY, and the
    reconciliation query returned plausible-but-wrong counts (caught
    by the sf1.0 oracle sweep — q_stream_backfill hash-fail). An
    exactly-once contract must fail loudly when the stream did not
    drain, never report partial results as complete."""
    if not query.awaitTermination(timeout):
        query.stop()
        raise RuntimeError(
            f"stream replay {query.name!r} did not drain within "
            f"{timeout}s — refusing to read a partial sink")
