"""Stateful streaming surface (SURVEY.md §2.J rows-only items):
dropDuplicatesWithinWatermark and a custom applyInPandasWithState
operator, both driven by real micro-batch replays."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from challenge8_movies_etl_spark.sources.fixtures import load_table
from challenge8_movies_etl_spark.streaming.replay import replay_events_stream
from challenge8_movies_etl_spark.streaming.stateful import running_user_counter
from tests.conftest import SF_SMOKE


def test_stateful_running_counter(spark):
    stream = replay_events_stream(spark, SF_SMOKE)
    counted = running_user_counter(stream)
    name = f"state_{uuid.uuid4().hex[:8]}"
    q = (counted.writeStream.outputMode("update")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {r["user_id"]: (r["n_events"], r["last_ts"])
           for r in spark.table(name).collect()}
    e = load_table(spark, SF_SMOKE, "events")
    want = {r["user_id"]: (r["n"], r["last_ts"])
            for r in e.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.max("ts").alias("last_ts"))
            .collect()}
    assert got == want and len(got) > 0


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Duplicate event_ids arriving inside the watermark horizon are
    dropped by the streaming stateful dedup."""
    import datetime as dt
    base = dt.datetime(2024, 6, 1, 12, 0, 0)
    rows = [(1, base, 1, "click"), (2, base + dt.timedelta(minutes=1), 1, "view"),
            (1, base + dt.timedelta(minutes=2), 1, "click"),   # dup id=1
            (3, base + dt.timedelta(minutes=3), 2, "click"),
            (2, base + dt.timedelta(minutes=4), 1, "view")]    # dup id=2
    src = tmp_path / "dupsrc"
    src.mkdir()
    (spark.createDataFrame(rows, "event_id bigint, ts timestamp, "
                           "user_id bigint, event_type string")
     .coalesce(1).write.mode("overwrite").parquet(str(src / "b0.parquet")))
    stream = (spark.readStream
              .schema("event_id bigint, ts timestamp, user_id bigint, "
                      "event_type string")
              .parquet(str(src) + "/*"))
    deduped = (stream.withWatermark("ts", "30 minutes")
               .dropDuplicatesWithinWatermark(["event_id"]))
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (deduped.writeStream.outputMode("append")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.table(name).collect()
    assert sorted(r["event_id"] for r in out) == [1, 2, 3]


def _protobuf_available() -> bool:
    # transformWithStateInPandas' driver worker speaks protobuf to the
    # JVM state server; the container lacks the python protobuf package
    # (no pip installs allowed), so the run crashes with
    # "ImportError: cannot import name 'descriptor' from google.protobuf".
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


import pytest


@pytest.mark.skipif(not _protobuf_available(), reason=(
    "transformWithStateInPandas requires the python protobuf package, "
    "absent from this container; operator surface kept real in "
    "streaming/stateful.py, equivalence runs where protobuf exists"))
def test_transform_with_state_counter(spark):
    """transformWithStateInPandas (Spark 4 successor API) computes the
    same per-user running counter as the batch aggregate."""
    from challenge8_movies_etl_spark.streaming.stateful import (
        running_user_counter_tws,
    )

    stream = replay_events_stream(spark, SF_SMOKE)
    counted = running_user_counter_tws(stream)
    name = f"tws_{uuid.uuid4().hex[:8]}"
    q = (counted.writeStream.outputMode("update")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {r["user_id"]: (r["n_events"], r["last_ts"])
           for r in spark.table(name).collect()}
    e = load_table(spark, SF_SMOKE, "events")
    want = {r["user_id"]: (r["n"], r["last_ts"])
            for r in e.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.max("ts").alias("last_ts"))
            .collect()}
    assert got == want and len(got) > 0
