"""Streaming semantics only a replay can check (SURVEY.md §5.5):
late-data drop under a watermark, and batch≡stream equivalence for the
windowed aggregations (the oracle-checked q_stream_replay_tumbling
covers tumbling; session windows replayed here)."""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import functions as F

from challenge8_movies_etl_spark.registry import QUERIES, load_all
from tests.conftest import SF_SMOKE

load_all()


def _write_batch(spark, rows, path):
    (spark.createDataFrame(rows, "event_id bigint, ts timestamp, "
                           "user_id bigint, event_type string")
     .coalesce(1).write.mode("overwrite").parquet(path))


def test_watermark_drops_late_data(spark, tmp_path):
    """Three micro-batches: recent events, then events 2 h late (beyond
    the 10-minute watermark → dropped), then a far-future sentinel that
    advances the watermark so closed windows emit in append mode."""
    import datetime as dt
    base = dt.datetime(2024, 6, 1, 0, 0, 0)
    h2 = [(i, base + dt.timedelta(hours=2, minutes=5 + i), 1, "click")
          for i in range(4)]
    h0_late = [(10 + i, base + dt.timedelta(minutes=5 + i), 1, "click")
               for i in range(3)]
    sentinel = [(99, base + dt.timedelta(hours=5), 1, "click")]

    src = tmp_path / "stream_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string")

    out_dir = str(tmp_path / "sink_out")

    def run_once() -> None:
        """One availableNow run over the files currently in src; the
        shared checkpoint persists source offsets AND the watermark
        between runs, so each run is its own micro-batch epoch. The
        parquet sink (unlike the memory sink) supports checkpoint
        recovery."""
        stream = (spark.readStream.schema(schema).parquet(str(src) + "/*"))
        agg = (stream.withWatermark("ts", "10 minutes")
               .groupBy(F.window("ts", "1 hour"))
               .count()
               .select(F.col("window.start").alias("ws"),
                       F.col("count").alias("n")))
        q = (agg.writeStream.outputMode("append")
             .format("parquet").option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    _write_batch(spark, h2, str(src / "batch_0.parquet"))
    run_once()                    # watermark advances to ~01:58
    _write_batch(spark, h0_late, str(src / "batch_1.parquet"))
    run_once()                    # late rows fall behind the watermark
    _write_batch(spark, sentinel, str(src / "batch_2.parquet"))
    run_once()                    # sentinel closes the 02:00 window

    emitted = {r["ws"].hour: r["n"]
               for r in spark.read.parquet(out_dir).collect()}
    # the 02:00 window emits with ONLY the on-time events; the
    # 2-hours-late batch was dropped, so hour 0 never appears
    assert emitted.get(2) == 4, emitted
    assert 0 not in emitted, emitted


def test_session_window_stream_equals_batch(spark):
    batch = {(r["user_id"], r["session_start"], r["session_end"], r["n_events"])
             for r in QUERIES["q_session_window"](spark, SF_SMOKE).collect()}

    from challenge8_movies_etl_spark.sources.fixtures import repair_events_ts

    raw_schema = spark.read.parquet(f"{SF_SMOKE}/events.parquet").schema
    stream = repair_events_ts(
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF_SMOKE))
    agg = (stream.withWatermark("ts", "1 hour")
           .groupBy(F.session_window("ts", "5 minutes"), "user_id")
           .count()
           .select("user_id",
                   F.col("session_window.start").alias("session_start"),
                   F.col("session_window.end").alias("session_end"),
                   F.col("count").alias("n_events")))
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    streamed = {(r["user_id"], r["session_start"], r["session_end"], r["n_events"])
                for r in spark.table(name).collect()}
    assert streamed == batch
    assert len(batch) > 0


def test_backfill_dedup_is_exactly_once(spark):
    """The reconciled union equals a plain scan (no double counting in
    the overlap region), and the overlap split matches the cutoff."""
    from pyspark.sql import functions as F

    rows = {r["event_type"]: r for r in
            QUERIES["q_stream_backfill"](spark, SF_SMOKE).collect()}
    e = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    truth = {r["event_type"]: r for r in
             (e.groupBy("event_type")
              .agg(F.count("*").alias("n"),
                   F.sum(F.when(F.col("ts").cast("date") < "2024-01-15",
                                1).otherwise(0)).alias("pre"))
              .collect())}
    assert set(rows) == set(truth)
    for t, r in rows.items():
        assert r["n"] == truth[t]["n"]
        assert r["n_overlap"] == truth[t]["pre"]
        assert r["n_overlap"] + r["n_stream_only"] == r["n"]
        assert r["n_overlap"] > 0 and r["n_stream_only"] > 0


def test_late_data_drops_are_real(spark):
    """The three-batch replay must actually DROP batch-C stragglers
    for windows closed by wm1 = max(ts in A) - 1h: the emitted count
    for any pre-Jan-10 window equals the A-side count alone, while a
    window in the (wm1, wm2] band includes its admitted stragglers."""
    import datetime as dt

    from pyspark.sql import functions as F

    from challenge8_movies_etl_spark.queries_streaming import (
        q_stream_late_data,
    )
    from challenge8_movies_etl_spark.sources.fixtures import load_table

    out = {r.window_start: r.n
           for r in q_stream_late_data(spark, SF_SMOKE).collect()}
    e = load_table(spark, SF_SMOKE, "events")
    d = F.col("ts").cast("date")
    straggler = F.col("event_id") % 7 == 0
    a = e.filter((d < F.lit("2024-01-10").cast("date")) & ~straggler)
    wm1 = a.agg(F.max("ts")).collect()[0][0] - dt.timedelta(hours=1)

    hours = sorted(h for h in out
                   if h + dt.timedelta(hours=1) <= wm1)
    assert hours, "no fully-closed windows emitted"
    dropped_any = 0
    for h in hours[:20]:
        hi = h + dt.timedelta(hours=1)
        in_w = (F.col("ts") >= F.lit(h)) & (F.col("ts") < F.lit(hi))
        n_a = a.filter(in_w).count()
        n_all = e.filter(in_w).count()
        assert out[h] == n_a, (h, out[h], n_a, n_all)
        dropped_any += n_all - n_a
    assert dropped_any > 0, "fixture produced no stragglers to drop"


def test_update_mode_emits_multiple_updates_per_window(spark):
    """The parity split must actually produce >1 update row for most
    windows in the sink history — otherwise the max-per-key upsert is
    vacuously testing append."""
    import hashlib
    from pathlib import Path

    from challenge8_movies_etl_spark.queries_streaming import (
        q_stream_update_mode,
    )

    out = {r.event_type: r for r in
           q_stream_update_mode(spark, SF_SMOKE).collect()}
    # totals must re-sum to the corpus
    from challenge8_movies_etl_spark.sources.fixtures import load_table
    e = load_table(spark, SF_SMOKE, "events")
    truth = {r["event_type"]: r["count"]
             for r in e.groupBy("event_type").count().collect()}
    assert {t: r.n_events for t, r in out.items()} == truth


def test_checkpoint_recovery_is_exactly_once(spark):
    """Kill a file-source stream after its first micro-batch, restart
    from the SAME checkpoint into the same sink table: committed
    offsets must not replay (no duplicate event_ids) and the union of
    both runs must equal the full input — the recovery contract every
    production stream depends on."""
    import shutil
    import uuid
    from pathlib import Path

    from pyspark.sql import functions as F

    from challenge8_movies_etl_spark.session import apply_required_conf
    from challenge8_movies_etl_spark.sources.fixtures import load_table

    apply_required_conf(spark)
    root = Path("spark-warehouse") / f"ckpt_recovery_{uuid.uuid4().hex[:6]}"
    (root / "in").mkdir(parents=True)
    e = load_table(spark, SF_SMOKE, "events").select("event_id", "ts")
    # two files -> two micro-batches at maxFilesPerTrigger=1
    import os
    import time as _t
    t0 = _t.time() - 50
    for i, pred in enumerate((F.col("event_id") % 2 == 0,
                              F.col("event_id") % 2 == 1)):
        d = root / f"tmp{i}"
        e.filter(pred).coalesce(1).write.parquet(str(d))
        dst = root / "in" / f"{i:02d}.parquet"
        shutil.move(str(next(d.glob("part-*.parquet"))), dst)
        shutil.rmtree(d)
        os.utime(dst, (t0 + 10 * i, t0 + 10 * i))

    schema = spark.read.parquet(str(root / "in")).schema
    out = root / "out"

    def start():
        # parquet FILE sink: transactional via the sink's commit log,
        # and it supports checkpoint recovery (memory sink does not)
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(str(root / "in"))
                .writeStream.outputMode("append")
                .format("parquet").option("path", str(out))
                .option("checkpointLocation", str(root / "ckpt"))
                .trigger(availableNow=True).start())

    q = start()
    # stop as soon as the first batch has committed
    deadline = _t.time() + 60
    while _t.time() < deadline:
        if any(p["batchId"] >= 0 and p["numInputRows"] > 0
               for p in q.recentProgress):
            break
        _t.sleep(0.1)
    q.stop()
    q.awaitTermination(30)
    n_after_kill = (spark.read.parquet(str(out)).count()
                    if any(out.glob("*.parquet")) else 0)

    q2 = start()  # resume from checkpoint
    q2.awaitTermination(60)
    if q2.isActive:
        q2.stop()

    total = e.count()
    got = spark.read.parquet(str(out))
    # exactly-once on event_id across BOTH runs: committed batches
    # must not replay after the restart
    assert got.count() == total, (got.count(), total, n_after_kill)
    assert got.select("event_id").distinct().count() == total
    shutil.rmtree(root, ignore_errors=True)
