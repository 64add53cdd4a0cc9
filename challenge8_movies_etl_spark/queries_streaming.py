"""Category J — streaming operators over the ``events`` table.

The reference's closest analog is its chunked 1M-row ratings load with
progress printing (challenge.py≈L203-210 [R]) — incremental
micro-batches, which is exactly Structured Streaming's model.

Design (SURVEY.md §2.J): every windowed operator is built on the SAME
expressions in batch and streaming mode — batch mode is what the DuckDB
oracle checks; q_stream_replay_tumbling additionally runs the real
Structured Streaming machinery (readStream → watermark → windowed agg →
memory sink) inside the query and is held to the SAME oracle as the
batch tumbling query, proving batch/stream equivalence end-to-end.
Watermark late-data semantics are not batch-expressible and are covered
by replay tests (tests/test_streaming.py), per SURVEY.md §7.3.

Window alignment: Spark windows are epoch-aligned, start-inclusive /
end-exclusive; oracles reproduce that with integer-microsecond floor
arithmetic (no float timestamps anywhere).
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from .registry import query
from .sources.fixtures import load_table

_US_30MIN = 30 * 60 * 1_000_000
_US_5MIN = 5 * 60 * 1_000_000


@query(
    "q_stream_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark, sf_dir):
    """Tumbling 1-hour counts per event_type (batch mode of the
    streaming aggregation; same plan incrementalizes under readStream).
    """
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy(F.window("ts", "1 hour"), "event_type")
            .count()
            .select(F.col("window.start").alias("window_start"),
                    "event_type",
                    F.col("count").alias("n")))


@query(
    "q_stream_sliding",
    oracle=f"""
    WITH b AS (
      SELECT make_timestamp(
               (epoch_us(ts) // {_US_30MIN}) * {_US_30MIN}) AS window_start,
             event_type
      FROM events
      UNION ALL
      SELECT make_timestamp(
               (epoch_us(ts) // {_US_30MIN}) * {_US_30MIN} - {_US_30MIN}),
             event_type
      FROM events
    )
    SELECT window_start, event_type, count(*) AS n
    FROM b GROUP BY 1, 2
    """,
)
def q_stream_sliding(spark, sf_dir):
    """Sliding 1-hour / 30-minute counts — every event lands in exactly
    two windows; the oracle is the UNION ALL of the two 30-minute-aligned
    bucketings (SURVEY.md §7.3)."""
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
            .count()
            .select(F.col("window.start").alias("window_start"),
                    "event_type",
                    F.col("count").alias("n")))


@query(
    "q_session_window",
    oracle=f"""
    WITH g AS (
      SELECT user_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events
    ),
    m AS (
      SELECT user_id, us,
             sum(CASE WHEN prev_us IS NULL
                       OR us - prev_us >= {_US_5MIN} THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY us
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sess
      FROM g
    )
    SELECT user_id,
           make_timestamp(min(us)) AS session_start,
           make_timestamp(max(us) + {_US_5MIN}) AS session_end,
           count(*) AS n_events
    FROM m GROUP BY user_id, sess
    """,
)
def q_session_window(spark, sf_dir):
    """5-minute-gap sessions per user via F.session_window (99,233
    sessions at sf0.1, SURVEY.md §2.J). Oracle: gaps-and-islands (lag +
    cumulative new-session flag). Boundary semantics matched exactly: a
    gap of precisely 5 minutes starts a NEW session (Spark merges only
    strictly-overlapping [ts, ts+gap) windows); session_end is last
    event + gap."""
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy(F.session_window("ts", "5 minutes"), "user_id")
            .count()
            .select(
                "user_id",
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                F.col("count").alias("n_events"),
            ))


@query(
    "q_stream_replay_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def q_stream_replay_tumbling(spark, sf_dir):
    """REAL Structured Streaming run, oracle-checked: readStream over
    the events parquet → 10-minute watermark → tumbling window counts →
    in-memory sink in complete mode → final state returned as the
    result DataFrame. Hash-equal to the batch tumbling oracle, proving
    the incremental path computes the same answer as the batch path.

    At scale this exact pipeline runs unbounded with a real source
    (file/kafka) and RocksDB state store; complete-mode memory sink
    here is the bounded-replay harness form.
    """
    # shared layout-aware source (an inline copy of the old
    # pathGlobFilter read delivered ZERO rows on directory-layout
    # fixtures — the sf1.0 sweep caught it here after the shared
    # helper was already fixed)
    from .streaming.replay import replay_events_stream
    stream = replay_events_stream(spark, sf_dir)
    agg = (stream.withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "1 hour"), "event_type")
           .count()
           .select(F.col("window.start").alias("window_start"),
                   "event_type",
                   F.col("count").alias("n")))
    name = f"replay_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName(name)
         .trigger(availableNow=True)
         .start())
    from .streaming.replay import drain
    drain(q)
    return spark.table(name)


@query(
    "q_stream_join_static",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def q_stream_join_static(spark, sf_dir):
    """Stream-static enrichment join through the real machinery: the
    replayed events stream joined to the customer dimension (broadcast
    — the static side is re-read per micro-batch, so keeping it
    broadcast-small or cached is the operational rule), held to the
    batch-join oracle. The streaming planner needs no state for
    stream-static inner joins — each batch joins independently."""
    from .streaming.replay import drain, replay_events_stream
    stream = replay_events_stream(spark, sf_dir)
    dim = (load_table(spark, sf_dir, "customer")
           .select("c_custkey", "c_mktsegment"))
    name = f"sjoin_{uuid.uuid4().hex[:8]}"
    q = (stream.join(F.broadcast(dim),
                     stream.user_id == F.col("c_custkey"), "inner")
         .select("event_id", "user_id", "c_mktsegment")
         .writeStream.outputMode("append")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    drain(q)
    return spark.table(name)


@query(
    "q_stream_stream_join",
    oracle="""
    SELECT a.event_id, a.user_id, b.event_type AS matched_type
    FROM events a JOIN events b ON a.event_id = b.event_id
    """,
)
def q_stream_stream_join(spark, sf_dir):
    """Stream-stream inner join through the real machinery: two
    replays of the events stream joined on the key within a +/-1 hour
    event-time range, watermarks on BOTH sides (what lets the state
    store evict — the non-negotiable 100 TB requirement for
    stream-stream joins). Replayed rows are identical on both sides,
    so the oracle is the batch self-join."""
    from .streaming.replay import drain, replay_events_stream
    left = (replay_events_stream(spark, sf_dir)
            .withWatermark("ts", "1 hour"))
    right = (replay_events_stream(spark, sf_dir)
             .select(F.col("event_id").alias("r_event_id"),
                     F.col("ts").alias("r_ts"),
                     F.col("event_type").alias("matched_type"))
             .withWatermark("r_ts", "1 hour"))
    joined = (left.join(
        right,
        (F.col("event_id") == F.col("r_event_id"))
        & (F.col("r_ts") >= F.col("ts") - F.expr("interval 1 hour"))
        & (F.col("r_ts") <= F.col("ts") + F.expr("interval 1 hour")),
        "inner")
        .select("event_id", "user_id", "matched_type"))
    name = f"ssjoin_{uuid.uuid4().hex[:8]}"
    # the state store spawns one instance per shuffle partition and the
    # partition count is frozen at query start — 8 is right for the
    # fixture volume (a real deployment sizes it to keyspace/executors);
    # conf restored immediately after start
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (joined.writeStream.outputMode("append")
             .format("memory").queryName(name)
             .trigger(availableNow=True).start())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    drain(q)
    return spark.table(name)


@query(
    "q_stream_stateful_counter",
    oracle="""
    SELECT user_id, count(*) AS n_events, max(ts) AS last_ts
    FROM events GROUP BY user_id
    """,
)
def q_stream_stateful_counter(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState,
    streaming/stateful.py) run through the REAL streaming machinery and
    held to a SQL oracle: the per-user running (count, last-ts) state
    after replaying the fixture equals the batch aggregate. One
    availableNow batch → the update-mode memory sink holds exactly the
    final state snapshot."""
    from .streaming.replay import drain, replay_events_stream
    from .streaming.stateful import running_user_counter
    stream = replay_events_stream(spark, sf_dir)
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    q = (running_user_counter(stream)
         .writeStream.outputMode("update")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    drain(q)
    return spark.table(name)


@query(
    "q_stream_topk",
    oracle="""
    WITH wc AS (
      SELECT date_trunc('hour', ts) AS window_start, user_id,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT window_start, user_id, n,
             row_number() OVER (PARTITION BY window_start
                                ORDER BY n DESC, user_id) AS rk
      FROM wc
    )
    SELECT window_start, user_id, n, rk
    FROM ranked WHERE rk <= 3
    """,
)
def q_stream_topk(spark, sf_dir):
    """Windowed top-k: the 3 most active users per tumbling hour —
    the leaderboard/hot-key pattern of streaming analytics (batch mode
    here; under readStream the window counts incrementalize and the
    rank runs per closed window in foreachBatch, since raw window
    functions aren't incremental — the same split this query's plan
    shows: stateful agg, then a per-window-partition rank that only
    touches |users-per-window| rows).

    Scale: the count agg map-side-combines; the rank partitions by
    window (thousands of independent partitions), never globally."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W
    wc = (e.groupBy(F.window("ts", "1 hour"), "user_id")
          .agg(F.count("*").alias("n")))
    rk = F.row_number().over(
        W.partitionBy("window").orderBy(F.desc("n"), "user_id"))
    return (wc.withColumn("rk", rk)
            .filter(F.col("rk") <= 3)
            .select(F.col("window.start").alias("window_start"),
                    "user_id", "n", "rk"))


@query(
    "q_stream_backfill",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           cast(count(CASE WHEN cast(ts as date) < '2024-01-15'
                      THEN 1 END) as bigint) AS n_overlap,
           cast(count(CASE WHEN cast(ts as date) >= '2024-01-15'
                      THEN 1 END) as bigint) AS n_stream_only
    FROM events GROUP BY 1
    """,
)
def q_stream_backfill(spark, sf_dir):
    """Kappa-architecture backfill reconciliation: a BATCH history
    (events before 2024-01-15, the mid-range cutoff) and a FULL stream
    replay (all events — so the pre-cutoff region is delivered TWICE,
    once per path) are unioned and deduplicated by event_id with a
    deterministic origin preference. The per-type counts must equal a
    plain scan of the table — the exactly-once contract under
    overlapping delivery that every backfill-then-switch-to-stream
    migration depends on. Without the dedup the overlap region would
    double-count; n_overlap counts rows that arrived via both paths.

    Scale: the stream side is the real machinery (readStream →
    availableNow → memory sink); reconciliation is one union + one
    keyed row_number dedup — at 100 TB the same dedup runs as a
    MERGE INTO the serving table keyed on event_id."""
    from pyspark.sql import Window as W

    from .streaming.replay import drain, replay_events_stream

    cutoff = F.lit("2024-01-15").cast("date")
    batch_hist = (load_table(spark, sf_dir, "events")
                  .filter(F.col("ts").cast("date") < cutoff)
                  .select("event_id", "ts", "event_type",
                          F.lit("batch").alias("origin")))

    name = f"backfill_{uuid.uuid4().hex[:8]}"
    q = (replay_events_stream(spark, sf_dir)
         .select("event_id", "ts", "event_type",
                 F.lit("stream").alias("origin"))
         .writeStream.outputMode("append")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    drain(q)
    streamed = spark.table(name)

    merged = batch_hist.unionByName(streamed)
    rn = F.row_number().over(
        W.partitionBy("event_id").orderBy("origin"))  # 'batch' < 'stream'
    origins = (merged.groupBy("event_id")
               .agg(F.countDistinct("origin").alias("n_origins")))
    deduped = (merged.withColumn("_rn", rn).filter(F.col("_rn") == 1)
               .drop("_rn")
               .join(origins, "event_id"))
    return (deduped.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.when(F.col("n_origins") == 2, 1).otherwise(0))
                 .cast("bigint").alias("n_overlap"),
                 F.sum(F.when(F.col("n_origins") == 1, 1).otherwise(0))
                 .cast("bigint").alias("n_stream_only")))


@query(
    "q_stream_late_data",
    oracle="""
    WITH marked AS (
      SELECT ts,
             CASE WHEN cast(ts as date) < DATE '2024-01-10'
                       AND event_id % 7 <> 0 THEN 'a'
                  WHEN cast(ts as date) < DATE '2024-01-20'
                       AND event_id % 7 <> 0 THEN 'b'
                  ELSE 'c' END AS batch
      FROM events
    ),
    wm AS (
      SELECT max(CASE WHEN batch = 'a' THEN ts END)
               - INTERVAL 1 HOUR AS wm1,
             max(ts) - INTERVAL 1 HOUR AS wm_final
      FROM marked
    ),
    admitted AS (
      SELECT m.ts FROM marked m, wm
      WHERE m.batch IN ('a', 'b')
         OR date_trunc('hour', m.ts) + INTERVAL 1 HOUR > wm.wm1
    )
    SELECT date_trunc('hour', a.ts) AS window_start,
           count(*) AS n
    FROM admitted a, wm
    WHERE date_trunc('hour', a.ts) + INTERVAL 1 HOUR <= wm.wm_final
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_stream_late_data(spark, sf_dir):
    """Watermark LATE-DATA semantics, made exactly replayable: events
    split into three files — batch A (days 1-9, event_id % 7 != 0),
    batch B (days 10-19, % 7 != 0), batch C (the tail plus ALL the
    % 7 == 0 stragglers withheld from A/B) — written with pinned
    modification times so the file source (maxFilesPerTrigger=1,
    availableNow) replays them as three ordered micro-batches.

    Spark >= 3.4 runs SPLIT watermarks (SPARK-40925): the late-event
    filter of batch N uses the PREVIOUS batch's watermark, eviction
    uses the current one (verified empirically this round:
    numRowsDroppedByWatermark fires in batch C exactly for windows
    whose end <= wm_after_A). So: B is fully admitted (filter wm is
    -inf), C's stragglers are dropped iff their hour-window end <=
    wm1 = max(ts in A) - 1h, and append mode ultimately emits every
    window whose end <= wm_final = max(all ts) - 1h (availableNow
    appends a final empty batch that flushes with the last watermark).
    The oracle reproduces precisely this protocol in SQL; boundary
    ties are impossible because watermarks carry microsecond offsets
    while window ends are exact hours.

    Scale: watermark eviction is what bounds the window store at
    100 TB; the dropped-late accounting demonstrated here is the
    audit a real ingest alerts on (pair with q_observe_metrics)."""
    import hashlib
    import os
    import shutil
    import time as _time
    from pathlib import Path

    from .session import apply_required_conf
    apply_required_conf(spark)

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = Path("spark-warehouse") / f"late_stream_{tag}"
    if root.exists():
        shutil.rmtree(root)
    (root / "in").mkdir(parents=True)

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type")
    d = F.col("ts").cast("date")
    straggler = F.col("event_id") % 7 == 0
    splits = (
        ("00_a", (d < F.lit("2024-01-10").cast("date")) & ~straggler),
        ("01_b", (d >= F.lit("2024-01-10").cast("date"))
         & (d < F.lit("2024-01-20").cast("date")) & ~straggler),
        ("02_c", (d >= F.lit("2024-01-20").cast("date")) | straggler),
    )
    t0 = _time.time() - 100
    for i, (name_, pred) in enumerate(splits):
        part_dir = root / f"tmp_{name_}"
        e.filter(pred).coalesce(1).write.parquet(str(part_dir))
        src = next(part_dir.glob("part-*.parquet"))
        dst = root / "in" / f"{name_}.parquet"
        shutil.move(str(src), dst)
        shutil.rmtree(part_dir)
        # the file source orders batches by modification time — pin it
        os.utime(dst, (t0 + 10 * i, t0 + 10 * i))

    schema = spark.read.parquet(str(root / "in")).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(str(root / "in")))
    agg = (stream.withWatermark("ts", "1 hour")
           .groupBy(F.window("ts", "1 hour"))
           .count()
           .select(F.col("window.start").alias("window_start"),
                   F.col("count").alias("n")))
    qname = f"late_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.outputMode("append")
         .format("memory").queryName(qname)
         .option("checkpointLocation", str(root / "ckpt"))
         .trigger(availableNow=True)
         .start())
    from .streaming.replay import drain
    drain(q)
    return spark.table(qname).orderBy("window_start")


@query(
    "q_stream_update_mode",
    oracle="""
    WITH counts AS (
      SELECT date_trunc('hour', ts) AS window_start,
             event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           cast(count(*) as bigint) AS n_windows,
           cast(sum(n) as bigint) AS n_events,
           cast(max(n) as bigint) AS peak_window
    FROM counts GROUP BY event_type
    """,
)
def q_stream_update_mode(spark, sf_dir):
    """UPDATE output mode semantics: the windowed count stream emits a
    row per CHANGED window per micro-batch, so the memory sink holds a
    history of monotonically-growing counts per (window, type). The
    final state of every window is therefore max(count) over its
    update rows — recovered declaratively and hash-checked against
    the batch ground truth. Append mode (q_stream_late_data) emits
    each window once and suppresses the tail; update mode emits early
    and often and the SINK is responsible for upserting — this query
    IS that upsert, expressed as max-per-key.

    The replay is two modification-time-ordered batches (events split
    on event_id parity) so multiple updates per window genuinely
    occur — parity scatters both halves across the full time range,
    giving every window two update emissions.

    Scale: update mode is the low-latency dashboard path at 100 TB —
    the state store emits deltas, the serving store applies them
    keyed; watermark still bounds state exactly as in append."""
    import hashlib
    import os
    import shutil
    import time as _time
    from pathlib import Path

    from .session import apply_required_conf
    apply_required_conf(spark)

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = Path("spark-warehouse") / f"upd_stream_{tag}"
    if root.exists():
        shutil.rmtree(root)
    (root / "in").mkdir(parents=True)
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type")
    t0 = _time.time() - 100
    for i, pred in enumerate((F.col("event_id") % 2 == 0,
                              F.col("event_id") % 2 == 1)):
        part_dir = root / f"tmp_{i}"
        e.filter(pred).coalesce(1).write.parquet(str(part_dir))
        src = next(part_dir.glob("part-*.parquet"))
        dst = root / "in" / f"{i:02d}.parquet"
        shutil.move(str(src), dst)
        shutil.rmtree(part_dir)
        os.utime(dst, (t0 + 10 * i, t0 + 10 * i))

    schema = spark.read.parquet(str(root / "in")).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(str(root / "in")))
    agg = (stream.groupBy(
               F.window("ts", "1 hour").getField("start")
                .alias("window_start"), "event_type")
           .count())
    qname = f"upd_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.outputMode("update")
         .format("memory").queryName(qname)
         .trigger(availableNow=True)
         .start())
    from .streaming.replay import drain
    drain(q)
    # the sink-side upsert: last (= max, counts are monotone) update
    # per key is the window's final state
    final = (spark.table(qname)
             .groupBy("window_start", "event_type")
             .agg(F.max("count").alias("n")))
    return (final.groupBy("event_type")
            .agg(F.count("*").alias("n_windows"),
                 F.sum("n").alias("n_events"),
                 F.max("n").alias("peak_window")))


@query(
    "q_stream_outer_join",
    oracle="""
    WITH mx AS (SELECT max(ts) AS m FROM events)
    SELECT a.event_id, a.user_id, b.event_type AS matched_type
    FROM events a
    LEFT JOIN events b
      ON b.event_id = a.event_id AND b.event_id % 3 = 0
    CROSS JOIN mx
    WHERE b.event_id IS NOT NULL OR a.ts < mx.m - INTERVAL 2 HOUR
    """,
)
def q_stream_outer_join(spark, sf_dir):
    """LEFT OUTER stream-stream join — the semantics q_stream_stream_
    join's inner variant cannot show: an unmatched left row emits its
    null-extended result ONLY when the event-time watermark passes the
    last instant a match could still arrive (ts + the join window's
    +1h bound). Under an availableNow replay the final no-data
    micro-batch advances the watermark to max_ts - 1h and flushes
    expired state, so rows with ts < max_ts - 2h emit null-matches
    while unmatched rows inside the final two hours remain in state
    forever-unemitted — the oracle encodes exactly that visibility
    rule (empirically pinned at sf0.001: 664 of 666 unmatched emitted,
    the two held rows inside the horizon). The right stream keeps only
    event_id % 3 = 0, so two thirds of the left exercises the
    null-emission path; all inner matches emit regardless.

    Scale: outer stream-stream joins REQUIRE the watermark + time-
    range condition (this is what lets the state store evict — state
    is bounded by 2h of stream volume per key, not by stream length);
    at 100 TB the join keys shard across state-store instances frozen
    at the shuffle-partition count, which this query sizes explicitly
    like its inner sibling."""
    from .streaming.replay import drain, replay_events_stream
    left = (replay_events_stream(spark, sf_dir)
            .withWatermark("ts", "1 hour"))
    right = (replay_events_stream(spark, sf_dir)
             .filter(F.col("event_id") % 3 == 0)
             .select(F.col("event_id").alias("r_event_id"),
                     F.col("ts").alias("r_ts"),
                     F.col("event_type").alias("matched_type"))
             .withWatermark("r_ts", "1 hour"))
    joined = (left.join(
        right,
        (F.col("event_id") == F.col("r_event_id"))
        & (F.col("r_ts") >= F.col("ts") - F.expr("interval 1 hour"))
        & (F.col("r_ts") <= F.col("ts") + F.expr("interval 1 hour")),
        "left_outer")
        .select("event_id", "user_id", "matched_type"))
    name = f"sojoin_{uuid.uuid4().hex[:8]}"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (joined.writeStream.outputMode("append")
             .format("memory").queryName(name)
             .trigger(availableNow=True).start())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    drain(q)
    return spark.table(name)


@query(
    "q_stream_cdc_apply",
    oracle="""
    WITH ops AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_id % 10 = 9 THEN 'D'
                  WHEN event_id % 3 = 0 THEN 'U'
                  ELSE 'I' END AS op,
             cast(cast(value as decimal(12,2)) * 100 as bigint) AS v_c
      FROM events
    ),
    last AS (
      SELECT user_id, op, v_c,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rk
      FROM ops
    )
    SELECT o.user_id,
           l.op <> 'D' AS is_live,
           CASE WHEN l.op <> 'D' THEN cast(l.v_c as double) / 100
                END AS final_value,
           cast(count(*) as bigint) AS n_ops,
           cast(sum(CASE WHEN o.op = 'D' THEN 1 ELSE 0 END) as bigint)
             AS n_deletes
    FROM ops o
    JOIN last l ON l.user_id = o.user_id AND l.rk = 1
    GROUP BY o.user_id, l.op, l.v_c
    """,
)
def q_stream_cdc_apply(spark, sf_dir):
    """CDC changelog materialization through the REAL streaming
    machinery (streaming/stateful.py:cdc_apply): the event stream is
    reinterpreted as a per-user insert/update/delete changelog
    (op derived deterministically from event_id), a custom
    applyInPandasWithState operator folds each key's ops in event
    order — a delete clears the live row, a later insert re-creates
    it — and the update-mode memory sink holds the final materialized
    snapshot: liveness, the last value (exact integer cents), op and
    delete counts per key. The DuckDB oracle is the batch
    last-writer-wins equivalent, so the STATEFUL STREAMING operator's
    state machine is value-hash-checked against declarative SQL.

    Scale: state is one fixed-size tuple per live key (the same
    footprint a Delta/Hudi CDC apply keeps); ordering relies on the
    per-key ordered-changelog contract every CDC feed (Kafka
    key-partitioning, Debezium) provides, so no global sort exists
    anywhere. At 100 TB/day this is the standing ingest topology:
    key-partitioned changelog → stateful apply → compacting sink."""
    from .streaming.replay import drain, replay_events_stream
    from .streaming.stateful import cdc_apply
    stream = replay_events_stream(spark, sf_dir)
    ops = stream.select(
        "user_id", "ts", "event_id",
        F.when(F.col("event_id") % 10 == 9, "D")
        .when(F.col("event_id") % 3 == 0, "U")
        .otherwise("I").alias("op"),
        F.expr("cast(cast(value as decimal(12,2)) * 100 as bigint)")
        .alias("v_c"))
    name = f"cdc_{uuid.uuid4().hex[:8]}"
    q = (cdc_apply(ops)
         .writeStream.outputMode("update")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    drain(q)
    return spark.table(name)
