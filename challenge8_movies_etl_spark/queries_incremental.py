"""Incremental-maintenance + pipeline-utility queries: MERGE-style
upsert, SCD2 history, skew-salted aggregation, deterministic
stratified sampling, vocabulary building, and streaming dedup.

The reference's sink surface was to_sql(replace|append)
(challenge.py≈L197-210 [R]); real dataset-versioning pipelines need
the incremental forms, so they are first-class oracle-checked queries
here (operators/{scd,skew}.py hold the algebra). All synthesized
inputs follow the integer-only construction discipline
(functions/synth.py) so both engines build bit-identical frames.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .operators.scd import scd2_apply, upsert
from .operators.skew import salted_agg
from .registry import query
from .sources.fixtures import load_table

# ---------------------------------------------------------------------------
# upsert / SCD2
# ---------------------------------------------------------------------------


@query(
    "q_upsert",
    oracle="""
    WITH target AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ),
    updates AS (
      SELECT o_orderkey, 'U' AS o_orderstatus,
             o_totalprice * 2 AS o_totalprice
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey + 100000000, 'N', 1000.0
      FROM orders WHERE o_orderkey % 1000 = 0
    )
    SELECT t.* FROM target t
    WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM updates)
    UNION ALL
    SELECT * FROM updates
    """,
)
def q_upsert(spark, sf_dir):
    """Key-level MERGE (last-writer-wins upsert): existing keys
    replaced, new keys inserted — anti-join + union algebra
    (operators/scd.py). x2 on a double is exact in IEEE, so the
    updated prices hash identically across engines."""
    o = load_table(spark, sf_dir, "orders")
    target = o.select("o_orderkey", "o_orderstatus", "o_totalprice")
    updates = (o.filter(F.col("o_orderkey") % 10 == 0)
               .select("o_orderkey",
                       F.lit("U").alias("o_orderstatus"),
                       (F.col("o_totalprice") * 2).alias("o_totalprice"))
               .unionByName(
                   o.filter(F.col("o_orderkey") % 1000 == 0)
                   .select((F.col("o_orderkey") + 100000000)
                           .alias("o_orderkey"),
                           F.lit("N").alias("o_orderstatus"),
                           F.lit(1000.0).alias("o_totalprice"))))
    return upsert(target, updates, "o_orderkey")


@query(
    "q_scd2",
    oracle="""
    WITH hist AS (
      SELECT c_custkey, c_mktsegment AS seg,
             '2020-01-01' AS valid_from, '9999-12-31' AS valid_to
      FROM customer
    )
    SELECT c_custkey, seg, valid_from, '2024-06-01' AS valid_to
    FROM hist WHERE c_custkey % 5 = 0
    UNION ALL
    SELECT * FROM hist WHERE c_custkey % 5 <> 0
    UNION ALL
    SELECT c_custkey, 'CHANGED', '2024-06-01', '9999-12-31'
    FROM hist WHERE c_custkey % 5 = 0
    """,
)
def q_scd2(spark, sf_dir):
    """Type-2 slowly-changing dimension: one change batch against an
    all-open history — changed keys close at the change ts and re-open
    with the new payload; unchanged rows pass through
    (operators/scd.py scd2_apply)."""
    c = load_table(spark, sf_dir, "customer")
    hist = c.select("c_custkey",
                    F.col("c_mktsegment").alias("seg"),
                    F.lit("2020-01-01").alias("valid_from"),
                    F.lit("9999-12-31").alias("valid_to"))
    changes = (c.filter(F.col("c_custkey") % 5 == 0)
               .select("c_custkey",
                       F.lit("CHANGED").alias("seg"),
                       F.lit("2024-06-01").alias("ts")))
    return scd2_apply(hist, changes, "c_custkey", "ts")


# ---------------------------------------------------------------------------
# skew-salted aggregation
# ---------------------------------------------------------------------------


@query(
    "q_agg_salted",
    oracle="""
    SELECT event_type, count(*) AS n_events,
           cast(round(sum(cast(value as decimal(30,10))), 4) as double)
             AS sum_value
    FROM events GROUP BY event_type
    """,
)
def q_agg_salted(spark, sf_dir):
    """Two-phase salted aggregation for skewed group keys (5 hot
    event_types): phase 1 spreads each key over 16 salt reducers,
    phase 2 re-aggregates the partials — semantics identical to the
    plain GROUP BY the oracle runs, which is the point (salting is a
    plan change, not a result change). Decimal partials keep the
    double sum exact and order-independent across both phases."""
    e = load_table(spark, sf_dir, "events")
    return salted_agg(
        e, "event_type",
        aggs=[F.count("*").alias("_n"),
              F.sum(F.col("value").cast("decimal(30,10)")).alias("_s")],
        reaggs=[F.sum("_n").alias("n_events"),
                F.round(F.sum("_s"), 4).cast("double").alias("sum_value")],
        n_salts=16,
    )


# ---------------------------------------------------------------------------
# deterministic stratified sampling
# ---------------------------------------------------------------------------


@query(
    "q_sample_stratified",
    oracle="""
    SELECT event_id, event_type, user_id
    FROM events
    WHERE cast(('0x' || substring(md5(cast(event_id as string) || ':samp'),
                                  1, 4)) as integer) % 100
          < CASE WHEN event_type = 'click' THEN 5 ELSE 20 END
    """,
)
def q_sample_stratified(spark, sf_dir):
    """Per-stratum deterministic sampling (5% of clicks, 20% of
    everything else) by hashing the stable event key — reproducible
    across runs AND engines, unlike rand()/TABLESAMPLE; the md5-bucket
    construction is shared with q_split_train_test. Embarrassingly
    parallel: a codegen'd filter, no shuffle, at any scale."""
    e = load_table(spark, sf_dir, "events")
    bucket = (F.conv(F.substring(
        F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":samp"))),
        1, 4), 16, 10).cast("int") % 100)
    rate = F.when(F.col("event_type") == "click", 5).otherwise(20)
    return (e.filter(bucket < rate)
            .select("event_id", "event_type", "user_id"))


# ---------------------------------------------------------------------------
# vocabulary building
# ---------------------------------------------------------------------------


@query(
    "q_vocab_topk",
    oracle="""
    SELECT token, count(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY cnt DESC, token
    LIMIT 50
    """,
)
def q_vocab_topk(spark, sf_dir):
    """Corpus vocabulary: explode whitespace tokens, count, top-50 with
    the token as total-order tie-break — the tokenizer-training /
    vocab-pruning primitive. Map-side partial counts make the shuffle
    carry (token, partial) pairs, and the top-k compiles to
    TakeOrderedAndProject (no global sort) — the same shape at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    return (d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
            .groupBy("token").agg(F.count("*").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "token")
            .limit(50))


# ---------------------------------------------------------------------------
# streaming dedup
# ---------------------------------------------------------------------------


@query(
    "q_stream_dedup",
    oracle="""
    SELECT event_id, user_id, event_type FROM events
    """,
)
def q_stream_dedup(spark, sf_dir):
    """Streaming deduplication through the REAL machinery: the events
    stream unioned with itself (every event arrives twice) →
    dropDuplicates on the key inside a replayed availableNow run →
    exactly the distinct event set, held to a plain DISTINCT oracle.
    Duplicate rows are bit-identical, so keep-first arbitrariness
    cannot leak into the result. State is (key → seen) per event_id —
    at scale, bound it with dropDuplicatesWithinWatermark."""
    from .streaming.replay import replay_events_stream
    stream = replay_events_stream(spark, sf_dir)
    doubled = stream.unionByName(stream)
    name = f"sdedup_{uuid.uuid4().hex[:8]}"
    q = (doubled.dropDuplicates(["event_id"])
         .select("event_id", "user_id", "event_type")
         .writeStream.outputMode("append")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    if q.isActive:
        q.stop()
    return spark.table(name)


# ---------------------------------------------------------------------------
# z-order data layout
# ---------------------------------------------------------------------------

def _z16_terms(x: str, y: str, shl, shr) -> str:
    """Bit-interleave two 8-bit bucket ids into a 16-bit Morton (Z-order)
    value, as a pure integer expression: x occupies odd bit positions,
    y even ones. `shl`/`shr` render a shift for the target dialect."""
    terms = [shl(f"({shr(x, i)} & 1)", 2 * i + 1) for i in range(8)]
    terms += [shl(f"({shr(y, i)} & 1)", 2 * i) for i in range(8)]
    return " + ".join(terms)


_Z16_SPARK = _z16_terms(
    "xb", "yb",
    lambda e, k: f"shiftleft({e}, {k})",
    lambda e, k: f"shiftright({e}, {k})")
_Z16_DUCK = _z16_terms(
    "xb", "yb",
    lambda e, k: f"(({e}) << {k})",
    lambda e, k: f"(({e}) >> {k})")


@query(
    "q_zorder_layout",
    oracle=f"""
    WITH b AS (
      SELECT o_orderkey,
             o_custkey % 256 AS xb,
             (datediff('day', DATE '1992-01-01',
                       cast(o_orderdate as date)) // 16) % 256 AS yb
      FROM orders
    ),
    z AS (
      SELECT o_orderkey, xb, yb, ({_Z16_DUCK}) // 256 AS file_id FROM b
    )
    SELECT file_id, count(*) AS n_rows,
           min(xb) AS min_cb, max(xb) AS max_cb,
           min(yb) AS min_db, max(yb) AS max_db
    FROM z GROUP BY file_id
    """,
)
def q_zorder_layout(spark, sf_dir):
    """Z-order (Morton-curve) file layout with per-file skipping stats —
    the multi-dimensional clustering trick behind Delta/Iceberg OPTIMIZE
    ZORDER. Bucket two independent filter dimensions (customer hash
    bucket, 16-day order-date band) to 8 bits each, interleave the bits
    into a 16-bit Morton value, and range-partition rows into files of
    256 consecutive z-values. Because the curve preserves locality in
    BOTH dimensions, each file's (min,max) envelope is tight on both
    columns — a predicate on either dimension prunes most files, which
    a single-column sort can only give one dimension. The interleave is
    16 shift-and-mask terms, all codegen'd integer ops; the layout
    assignment itself needs no shuffle (the rollup here is one partial
    agg to report the envelopes a writer would put in file footers)."""
    o = load_table(spark, sf_dir, "orders")
    b = o.select(
        "o_orderkey",
        (F.col("o_custkey") % 256).alias("xb"),
        ((F.datediff(F.col("o_orderdate").cast("date"),
                     F.lit("1992-01-01").cast("date"))
          / F.lit(16)).cast("bigint") % 256).alias("yb"))
    z = b.select("o_orderkey", "xb", "yb",
                 F.expr(f"({_Z16_SPARK}) div 256").alias("file_id"))
    return (z.groupBy("file_id")
            .agg(F.count("*").alias("n_rows"),
                 F.min("xb").alias("min_cb"), F.max("xb").alias("max_cb"),
                 F.min("yb").alias("min_db"), F.max("yb").alias("max_db")))


@query(
    "q_partitioned_pruned_scan",
    oracle="""
    SELECT cast(cast(ts as date) as string) AS day,
           count(*) AS n_events,
           cast(round(sum(cast(value as decimal(30,10))), 4) as double)
             AS sum_value
    FROM events WHERE event_type = 'click'
    GROUP BY cast(cast(ts as date) as string)
    ORDER BY day
    """,
)
def q_partitioned_pruned_scan(spark, sf_dir):
    """Hive-style partitioned layout + partition pruning: events are
    written `partitionBy(event_type)` into the (gitignored) warehouse
    directory, then the filtered read touches ONLY the matching
    partition directory — the scan's PartitionFilters prune the other
    four event types before any file is opened (plan-asserted in
    tests/test_layout_ops.py). This is the standard 100 TB table
    layout: partition on the coarse always-filtered column
    (tenant/day/type), bucket or sort within partitions for the finer
    keys; a predicate on the partition column reads 1/N of the data
    with zero I/O on the rest.

    The write is part of the operator (idempotent overwrite, path
    keyed by sf dir); the aggregate is the proof the pruned read still
    computes exact results."""
    import hashlib
    from pathlib import Path

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = str(Path("spark-warehouse") / f"events_part_{tag}")
    e = load_table(spark, sf_dir, "events")
    (e.write.mode("overwrite").partitionBy("event_type").parquet(path))
    part = spark.read.parquet(path).filter(F.col("event_type") == "click")
    return (part.groupBy(F.col("ts").cast("date").cast("string")
                          .alias("day"))
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum(F.col("value").cast("decimal(30,10)")), 4)
                  .cast("double").alias("sum_value"))
            .orderBy("day"))


# ---------------------------------------------------------------------------
# q_deletion_vectors — merge-on-read positional deletes
# ---------------------------------------------------------------------------

@query(
    "q_deletion_vectors",
    oracle="""
    WITH base AS (
      SELECT o_orderkey // 1000 AS file_id,
             o_orderkey % 1000 AS pos,
             o_totalprice
      FROM orders
    ), dv AS (
      SELECT file_id, pos FROM base WHERE (file_id * 1000 + pos) % 7 = 3
      UNION
      SELECT file_id, pos FROM base WHERE (file_id * 1000 + pos) % 11 = 5
    ), live AS (
      SELECT base.* FROM base
      LEFT JOIN dv ON base.file_id = dv.file_id AND base.pos = dv.pos
      WHERE dv.pos IS NULL
    ), per_file AS (
      SELECT file_id, count(*) AS n_rows FROM base GROUP BY file_id
    ), del_file AS (
      SELECT file_id, count(*) AS n_deleted FROM dv GROUP BY file_id
    )
    SELECT per_file.file_id,
           cast(n_rows as bigint) AS n_rows,
           cast(coalesce(n_deleted, 0) as bigint) AS n_deleted,
           cast(n_rows - coalesce(n_deleted, 0) as bigint)
             AS surviving_rows,
           cast(round(sum(cast(live.o_totalprice as decimal(30,10))), 2)
                as double) AS surviving_total
    FROM per_file
    LEFT JOIN del_file ON per_file.file_id = del_file.file_id
    LEFT JOIN live ON per_file.file_id = live.file_id
    GROUP BY per_file.file_id, n_rows, n_deleted
    ORDER BY per_file.file_id
    """,
)
def q_deletion_vectors(spark, sf_dir):
    """Merge-on-read positional deletes (Iceberg v2 / Delta deletion
    vectors): base rows live in immutable files addressed by
    (file_id, position); delete commits write only (file_id, pos)
    tombstone sets; readers apply the UNION of all delete vectors as
    an anti-join at scan time — no base-file rewrite. Two commits are
    synthesized from orderkey predicates; the query reports per file
    the base count, the merged delete-vector cardinality (duplicates
    across commits collapse — a row deleted twice dies once), and the
    surviving row count and totalprice sum a merge-on-read scan
    returns.

    Scale: this is THE lakehouse delete mechanism at 100 TB — deleting
    0.1% of rows costs writing 0.1% positions, not rewriting files.
    The read-side anti-join is keyed (file_id, pos) and the delete
    side is tiny -> broadcast; per-file aggregation reuses the
    file_id key. In a real table the vectors are roaring bitmaps in
    file footers; relationally the semantics are exactly this UNION +
    anti-join, which is what Spark's Iceberg/Delta readers compile
    to."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        (F.col("o_orderkey") / 1000).cast("bigint").alias("file_id"),
        (F.col("o_orderkey") % 1000).alias("pos"),
        "o_totalprice", "o_orderkey")
    dv = (base.filter(F.col("o_orderkey") % 7 == 3)
          .select("file_id", "pos")
          .union(base.filter(F.col("o_orderkey") % 11 == 5)
                 .select("file_id", "pos"))
          .distinct())
    live = base.join(F.broadcast(dv), ["file_id", "pos"], "left_anti")
    per_file = base.groupBy("file_id").agg(F.count("*").alias("n_rows"))
    del_file = dv.groupBy("file_id").agg(F.count("*").alias("n_deleted"))
    surv = (live.groupBy("file_id")
            .agg(F.round(F.sum(F.col("o_totalprice")
                               .cast("decimal(30,10)")), 2)
                 .cast("double").alias("surviving_total")))
    return (per_file
            .join(del_file, "file_id", "left")
            .join(surv, "file_id", "left")
            .select("file_id",
                    F.col("n_rows").cast("long").alias("n_rows"),
                    F.coalesce("n_deleted", F.lit(0)).cast("long")
                    .alias("n_deleted"),
                    (F.col("n_rows") - F.coalesce("n_deleted", F.lit(0)))
                    .cast("long").alias("surviving_rows"),
                    "surviving_total")
            .orderBy("file_id"))


# ---------------------------------------------------------------------------
# q_hilbert_layout — Hilbert-curve file layout (Z-order's tighter sibling)
# ---------------------------------------------------------------------------

_HIL_N = 16  # 16x16 grid (4 curve levels)


def _hilbert_stage(s: int, n: int) -> list[str]:
    """One xy2d level as simultaneous dialect-portable SQL expressions
    over columns (x, y, d): quadrant id 3*rx + ry - 2*rx*ry is the
    arithmetic identity for (3*rx) XOR ry on bits (DuckDB has no infix
    XOR), and the rotation flips with n-1 then swaps, exactly the
    classic iterative formulation."""
    rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
    return [
        f"d + {s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry}) AS d",
        f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
        f" THEN {n - 1} - y ELSE y END) ELSE x END AS x",
        f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
        f" THEN {n - 1} - x ELSE x END) ELSE y END AS y",
    ]


def _hilbert_duck_ctes(n: int) -> str:
    ctes, prev = [], "b"
    s, lvl = n // 2, 0
    while s > 0:
        cur = f"h{lvl}"
        ctes.append(
            f"{cur} AS (SELECT o_orderkey, x0, y0, "
            + ", ".join(_hilbert_stage(s, n)) + f" FROM {prev})")
        prev, s, lvl = cur, s // 2, lvl + 1
    return ", ".join(ctes), prev


_HIL_CTES, _HIL_LAST = _hilbert_duck_ctes(_HIL_N)


@query(
    "q_hilbert_layout",
    oracle=f"""
    WITH b AS (
      SELECT o_orderkey,
             o_custkey % {_HIL_N} AS x0,
             (datediff('day', DATE '1992-01-01',
                       cast(o_orderdate as date)) // 256) % {_HIL_N} AS y0,
             o_custkey % {_HIL_N} AS x,
             (datediff('day', DATE '1992-01-01',
                       cast(o_orderdate as date)) // 256) % {_HIL_N} AS y,
             0 AS d
      FROM orders
    ), {_HIL_CTES}
    SELECT d // {_HIL_N} AS file_id, count(*) AS n_rows,
           min(x0) AS min_cb, max(x0) AS max_cb,
           min(y0) AS min_db, max(y0) AS max_db
    FROM {_HIL_LAST} GROUP BY d // {_HIL_N}
    ORDER BY file_id
    """,
)
def q_hilbert_layout(spark, sf_dir):
    """Hilbert-curve file layout — the clustering Delta OPTIMIZE and
    Iceberg use when Z-order's diagonal jumps cost too much: map each
    (customer bucket, 256-day order-date band) grid cell to its
    Hilbert index via the classic iterative xy2d (one rotate-and-
    accumulate stage per curve level, 4 levels for a 16x16 grid),
    range-partition rows into files of 16 consecutive curve positions,
    and report each file's (min,max) envelope on both dimensions.
    Unlike Morton order, consecutive Hilbert positions are always
    grid-adjacent (no diagonal discontinuities), so file envelopes are
    tighter on average — the property tests/test_layout_ops.py pins
    against a reference implementation. Both engines run the IDENTICAL
    unrolled stage expressions (a shared generator renders the SQL),
    all integer CASE/mask arithmetic inside whole-stage codegen.

    Scale: zero-shuffle per-row integer math plus one partial agg for
    the envelopes, the same shape as q_zorder_layout; at 100 TB the
    writer range-partitions on the curve index it just computed."""
    o = load_table(spark, sf_dir, "orders")
    day = ((F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit("1992-01-01").cast("date"))
            / F.lit(256)).cast("bigint") % _HIL_N)
    df = o.select(
        "o_orderkey",
        (F.col("o_custkey") % _HIL_N).alias("x0"), day.alias("y0"),
        (F.col("o_custkey") % _HIL_N).alias("x"), day.alias("y"),
        F.lit(0).alias("d"))
    s = _HIL_N // 2
    while s > 0:
        df = df.selectExpr("o_orderkey", "x0", "y0",
                           *_hilbert_stage(s, _HIL_N))
        s //= 2
    return (df.groupBy((F.col("d") / _HIL_N).cast("bigint")
                       .alias("file_id"))
            .agg(F.count("*").alias("n_rows"),
                 F.min("x0").alias("min_cb"), F.max("x0").alias("max_cb"),
                 F.min("y0").alias("min_db"), F.max("y0").alias("max_db"))
            .orderBy("file_id"))


# ---------------------------------------------------------------------------
# q_bitemporal_asof — valid-time x transaction-time point query
# ---------------------------------------------------------------------------

_BT_VALID = "DATE '1995-06-30'"   # as-of valid date (what was true)
_BT_TX = "DATE '1995-07-31'"      # as-of tx date (what we knew then)


@query(
    "q_bitemporal_asof",
    oracle=f"""
    WITH versions AS (
      SELECT o_orderkey, o_orderstatus,
             cast(o_totalprice as decimal(15,2)) AS price,
             cast(o_orderdate as date) AS valid_from,
             cast(o_orderdate as date)
               + to_days(cast(o_orderkey % 30 as int)) AS recorded_at,
             0 AS version
      FROM orders
      UNION ALL
      SELECT o_orderkey, o_orderstatus,
             cast(o_totalprice as decimal(15,2)) + 10,
             cast(o_orderdate as date),
             cast(o_orderdate as date)
               + to_days(cast(o_orderkey % 30 + 45 as int)),
             1
      FROM orders WHERE o_orderkey % 5 = 0
    ),
    visible AS (
      SELECT *,
             row_number() OVER (PARTITION BY o_orderkey
                                ORDER BY recorded_at DESC, version DESC)
               AS rk
      FROM versions
      WHERE valid_from <= {_BT_VALID} AND recorded_at <= {_BT_TX}
    )
    SELECT o_orderstatus,
           count(*) AS n_orders,
           cast(sum(CASE WHEN version = 1 THEN 1 ELSE 0 END) as bigint)
             AS n_corrected,
           cast(round(sum(cast(price as decimal(30,10))), 2) as double)
             AS total_price
    FROM visible WHERE rk = 1
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def q_bitemporal_asof(spark, sf_dir):
    """Bitemporal point query — the two-axis time travel a regulated
    warehouse needs and one-dimensional SCD2 cannot answer: "as of
    VALID date June 30 (what was true of the business), using only
    facts RECORDED by July 31 (what the system knew)". The version
    store carries (valid_from, recorded_at) per row — every order has
    its original booking and every fifth order a later price
    correction recorded ~45 days after booking. The reader filters
    both axes, then takes the LATEST-RECORDED visible version per key
    (one row_number with a deterministic (recorded_at, version)
    tiebreak). n_corrected counts keys whose correction had already
    become visible by the transaction cutoff — the column that
    separates bitemporal semantics from a plain snapshot.

    Scale: the version union is a scan-level expression (no join);
    visibility is a pushed-down double filter; the per-key argmax is
    one shuffle on o_orderkey and the rollup map-side combines. At
    100 TB the version store is partitioned by recorded_at month, so
    the tx-time filter prunes partitions before any read."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey", "o_orderstatus",
        F.col("o_totalprice").cast("decimal(15,2)").alias("price"),
        F.col("o_orderdate").cast("date").alias("valid_from"),
        F.date_add(F.col("o_orderdate").cast("date"),
                   (F.col("o_orderkey") % 30).cast("int"))
        .alias("recorded_at"),
        F.lit(0).alias("version"))
    corr = (o.filter(F.col("o_orderkey") % 5 == 0)
            .select("o_orderkey", "o_orderstatus",
                    (F.col("o_totalprice").cast("decimal(15,2)") + 10)
                    .alias("price"),
                    F.col("o_orderdate").cast("date").alias("valid_from"),
                    F.date_add(F.col("o_orderdate").cast("date"),
                               (F.col("o_orderkey") % 30 + 45).cast("int"))
                    .alias("recorded_at"),
                    F.lit(1).alias("version")))
    from pyspark.sql import Window as W
    visible = (base.unionByName(corr)
               .filter((F.col("valid_from") <= F.lit("1995-06-30")
                        .cast("date"))
                       & (F.col("recorded_at") <= F.lit("1995-07-31")
                          .cast("date")))
               .withColumn("rk", F.row_number().over(
                   W.partitionBy("o_orderkey")
                   .orderBy(F.desc("recorded_at"), F.desc("version")))))
    return (visible.filter(F.col("rk") == 1)
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n_orders"),
                 F.sum(F.when(F.col("version") == 1, 1).otherwise(0))
                 .cast("long").alias("n_corrected"),
                 F.round(F.sum(F.col("price").cast("decimal(30,10)")), 2)
                 .cast("double").alias("total_price"))
            .orderBy("o_orderstatus"))


# ---------------------------------------------------------------------------
# q_time_travel_read — snapshot-isolation reads over an append + DV log
# ---------------------------------------------------------------------------

@query(
    "q_time_travel_read",
    oracle="""
    WITH base AS (
      SELECT o_orderkey // 1000 AS file_id,
             o_orderkey % 1000 AS pos,
             o_orderkey, o_totalprice,
             0 AS added_at
      FROM orders
    ),
    appended AS (
      SELECT 100000 + o_orderkey // 1000 AS file_id,
             o_orderkey % 1000 AS pos,
             o_orderkey, o_totalprice * 2 AS o_totalprice,
             2 AS added_at
      FROM orders WHERE o_orderkey % 10 = 0
    ),
    rows_all AS (
      SELECT * FROM base UNION ALL SELECT * FROM appended
    ),
    dv AS (
      SELECT file_id, pos, 1 AS deleted_at FROM base
      WHERE o_orderkey % 7 = 3
      UNION ALL
      SELECT file_id, pos, 3 FROM rows_all WHERE o_orderkey % 11 = 5
    ),
    first_del AS (
      SELECT file_id, pos, min(deleted_at) AS deleted_at
      FROM dv GROUP BY 1, 2
    ),
    lifetimed AS (
      SELECT r.*, coalesce(d.deleted_at, 1000000) AS deleted_at
      FROM rows_all r
      LEFT JOIN first_del d
        ON r.file_id = d.file_id AND r.pos = d.pos
    ),
    snapshots AS (
      SELECT unnest(range(0, 4)) AS snapshot_id
    )
    SELECT s.snapshot_id,
           cast(count(*) as bigint) AS n_live_rows,
           cast(count(DISTINCT l.file_id) as bigint) AS n_live_files,
           cast(round(sum(cast(l.o_totalprice as decimal(30,10))), 2)
                as double) AS total_price
    FROM snapshots s
    JOIN lifetimed l
      ON l.added_at <= s.snapshot_id AND l.deleted_at > s.snapshot_id
    GROUP BY s.snapshot_id
    ORDER BY s.snapshot_id
    """,
)
def q_time_travel_read(spark, sf_dir):
    """Snapshot-isolation time-travel reads over a lakehouse commit
    log (VERDICT r8 item 8 — the composition of q_deletion_vectors'
    merge-on-read positional deletes with versioned visibility):
    commit 0 writes the base files, commit 1 a deletion vector,
    commit 2 appends new files (a price-doubled reprocess of every
    10th order), commit 3 a second DV that also reaches the appended
    files. A read AS OF snapshot s sees exactly the rows whose adding
    commit is <= s and whose earliest tombstone (if any) is > s —
    Iceberg/Delta time travel compiled to its relational core. The
    query audits all four snapshots at once: live row count, live
    file count, and the exact decimal total the reader would return.

    Scale: per-row visibility is an interval [added_at, deleted_at)
    computed ONCE via one keyed left join against the min-aggregated
    tombstone set (never one anti-join per snapshot); the snapshot
    axis is a 4-row broadcast range join, and the rollup map-side
    combines. The tombstone join carries NO broadcast hint: the DV set
    is row-count-proportional (not manifest-sized), so at 100 TB it
    can exceed the 8 GB broadcast hard limit — AQE picks broadcast at
    fixture scale and falls back to a shuffle join when the deletion
    set outgrows it (ADVICE r9 / VERDICT r9 item 6). At 100 TB the
    manifest prunes files by added_at before any data read — the same
    added_at <= s predicate this plan pushes into the scan."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        (F.col("o_orderkey") / 1000).cast("bigint").alias("file_id"),
        (F.col("o_orderkey") % 1000).alias("pos"),
        "o_orderkey", "o_totalprice",
        F.lit(0).alias("added_at"))
    appended = (o.filter(F.col("o_orderkey") % 10 == 0)
                .select((100000 + F.col("o_orderkey") / 1000)
                        .cast("bigint").alias("file_id"),
                        (F.col("o_orderkey") % 1000).alias("pos"),
                        "o_orderkey",
                        (F.col("o_totalprice") * 2).alias("o_totalprice"),
                        F.lit(2).alias("added_at")))
    rows_all = base.unionByName(appended)
    dv = (base.filter(F.col("o_orderkey") % 7 == 3)
          .select("file_id", "pos", F.lit(1).alias("deleted_at"))
          .unionByName(
              rows_all.filter(F.col("o_orderkey") % 11 == 5)
              .select("file_id", "pos", F.lit(3).alias("deleted_at"))))
    first_del = (dv.groupBy("file_id", "pos")
                 .agg(F.min("deleted_at").alias("deleted_at")))
    lifetimed = (rows_all
                 .join(first_del, ["file_id", "pos"], "left")
                 .withColumn("deleted_at",
                             F.coalesce("deleted_at", F.lit(1000000))))
    snapshots = spark.range(0, 4).select(
        F.col("id").cast("bigint").alias("snapshot_id"))
    return (F.broadcast(snapshots)
            .join(lifetimed,
                  (F.col("added_at") <= F.col("snapshot_id"))
                  & (F.col("deleted_at") > F.col("snapshot_id")))
            .groupBy("snapshot_id")
            .agg(F.count("*").cast("long").alias("n_live_rows"),
                 F.countDistinct("file_id").cast("long")
                 .alias("n_live_files"),
                 F.round(F.sum(F.col("o_totalprice")
                               .cast("decimal(30,10)")), 2)
                 .cast("double").alias("total_price"))
            .orderBy("snapshot_id"))


# ---------------------------------------------------------------------------
# q_hilbert_recluster — incremental re-clustering decisions (OPTIMIZE plan)
# ---------------------------------------------------------------------------

@query(
    "q_hilbert_recluster",
    oracle=f"""
    WITH b AS (
      SELECT o_orderkey,
             o_custkey % {_HIL_N} AS x0,
             (datediff('day', DATE '1992-01-01',
                       cast(o_orderdate as date)) // 256) % {_HIL_N} AS y0,
             o_custkey % {_HIL_N} AS x,
             (datediff('day', DATE '1992-01-01',
                       cast(o_orderdate as date)) // 256) % {_HIL_N} AS y,
             0 AS d
      FROM orders
    ), {_HIL_CTES},
    placed AS (
      SELECT o_orderkey, d,
             CASE WHEN o_orderkey % 10 = 0
                  THEN 1000 + (o_orderkey // 10) % 4
                  ELSE d // {_HIL_N} END AS file_id
      FROM {_HIL_LAST}
    ),
    env AS (
      SELECT file_id, count(*) AS n_rows,
             min(d) AS min_d, max(d) AS max_d
      FROM placed GROUP BY file_id
    ),
    ov AS (
      SELECT a.file_id,
             count(*) AS n_overlaps
      FROM env a JOIN env b
        ON a.file_id != b.file_id
       AND a.min_d <= b.max_d AND b.min_d <= a.max_d
      GROUP BY a.file_id
    )
    SELECT env.file_id,
           cast(n_rows as bigint) AS n_rows,
           cast(max_d - min_d as bigint) AS d_span,
           cast(coalesce(n_overlaps, 0) as bigint) AS n_overlaps,
           coalesce(n_overlaps, 0) >= 2
             OR max_d - min_d >= {2 * _HIL_N} AS rewrite,
           cast(CASE WHEN coalesce(n_overlaps, 0) >= 2
                       OR max_d - min_d >= {2 * _HIL_N}
                     THEN coalesce(n_overlaps, 0) * n_rows
                     ELSE 0 END as bigint) AS priority
    FROM env LEFT JOIN ov ON env.file_id = ov.file_id
    ORDER BY env.file_id
    """,
)
def q_hilbert_recluster(spark, sf_dir):
    """Incremental re-clustering decisions over the Hilbert layout
    (VERDICT r8 item 8 — q_hilbert_layout proves the curve bijection;
    THIS is its 100 TB use): after appends land, every 10th order
    sits in one of four arrival-ordered overflow files instead of its
    curve position, so file envelopes on the Hilbert index start to
    overlap — exactly the degradation Delta OPTIMIZE / Iceberg
    rewrite_data_files watches. The planner computes each file's
    curve envelope [min_d, max_d], counts envelope overlaps via the
    standard interval self-join, and flags for rewrite any file with
    >= 2 overlapping neighbors or a curve span >= 2 grid rows;
    priority = overlaps x rows ranks the rewrite queue so the
    maintenance budget goes where a rewrite buys the most scan
    pruning back.

    Scale: envelopes are one map-side-combined aggregate per file —
    the planner's input is FILE COUNT-sized, not row-count-sized, so
    the overlap self-join runs on metadata (thousands of rows at
    100 TB) exactly like a manifest-level planner; the curve index
    itself is the same zero-shuffle integer stage pipeline as
    q_hilbert_layout.

    Known plan property: Catalyst collapses the log2(N) unrolled
    Hilbert stages into ONE projection whose generated method exceeds
    the JVM's 64 KB limit — whole-stage codegen logs 'Code grows
    beyond 64 KB' and Spark falls back to the interpreted projection
    for that stage (spark.sql.codegen.fallback, default on; results
    identical, sweep-verified at four scales). At production scale the
    fix is a checkpoint barrier every few stages so each codegen
    region stays under the limit; at fixture scale the interpreted
    stage costs <1 s and the contortion isn't worth it."""
    o = load_table(spark, sf_dir, "orders")
    day = ((F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit("1992-01-01").cast("date"))
            / F.lit(256)).cast("bigint") % _HIL_N)
    df = o.select(
        "o_orderkey",
        (F.col("o_custkey") % _HIL_N).alias("x0"), day.alias("y0"),
        (F.col("o_custkey") % _HIL_N).alias("x"), day.alias("y"),
        F.lit(0).alias("d"))
    s = _HIL_N // 2
    while s > 0:
        df = df.selectExpr("o_orderkey", "x0", "y0",
                           *_hilbert_stage(s, _HIL_N))
        s //= 2
    placed = df.select(
        "o_orderkey", "d",
        F.when(F.col("o_orderkey") % 10 == 0,
               1000 + (F.col("o_orderkey") / 10).cast("bigint") % 4)
        .otherwise((F.col("d") / _HIL_N).cast("bigint"))
        .alias("file_id"))
    # no persist: env is a file-count-sized aggregate consumed three
    # times; its three subplans are identical, so Spark's exchange
    # reuse serves them from one shuffle, and a session-lifetime cache
    # entry would accumulate across sweep runs (ADVICE r9)
    env = (placed.groupBy("file_id")
           .agg(F.count("*").alias("n_rows"),
                F.min("d").alias("min_d"), F.max("d").alias("max_d")))
    ov = (env.alias("a").join(
            env.select(F.col("file_id").alias("_f"),
                       F.col("min_d").alias("_lo"),
                       F.col("max_d").alias("_hi")),
            (F.col("a.file_id") != F.col("_f"))
            & (F.col("a.min_d") <= F.col("_hi"))
            & (F.col("_lo") <= F.col("a.max_d")))
          .groupBy("a.file_id")
          .agg(F.count("*").alias("n_overlaps")))
    rewrite = (F.coalesce("n_overlaps", F.lit(0)) >= 2) | \
        (F.col("max_d") - F.col("min_d") >= 2 * _HIL_N)
    return (env.join(ov, "file_id", "left")
            .select("file_id",
                    F.col("n_rows").cast("long").alias("n_rows"),
                    (F.col("max_d") - F.col("min_d")).cast("long")
                    .alias("d_span"),
                    F.coalesce("n_overlaps", F.lit(0)).cast("long")
                    .alias("n_overlaps"),
                    rewrite.alias("rewrite"),
                    F.when(rewrite,
                           F.coalesce("n_overlaps", F.lit(0))
                           * F.col("n_rows"))
                    .otherwise(0).cast("long").alias("priority"))
            .orderBy("file_id"))


# ---------------------------------------------------------------------------
# q_vacuum_plan — snapshot-expire / physical-delete planning
# ---------------------------------------------------------------------------

_VAC_RETAIN = 2  # snapshots >= this id are still readable (time travel)


@query(
    "q_vacuum_plan",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey // 1000 AS file_id,
             o_orderkey % 1000 AS pos,
             o_orderkey, 0 AS added_at
      FROM orders
    ),
    appended AS (
      SELECT 100000 + o_orderkey // 1000 AS file_id,
             o_orderkey % 1000 AS pos,
             o_orderkey, 2 AS added_at
      FROM orders WHERE o_orderkey % 10 = 0
    ),
    rows_all AS (
      SELECT * FROM base UNION ALL SELECT * FROM appended
    ),
    dv AS (
      SELECT file_id, pos, 1 AS deleted_at FROM base
      WHERE o_orderkey % 7 = 3
      UNION ALL
      SELECT file_id, pos, 3 FROM rows_all WHERE o_orderkey % 11 = 5
    ),
    first_del AS (
      SELECT file_id, pos, min(deleted_at) AS deleted_at
      FROM dv GROUP BY 1, 2
    ),
    lifetimed AS (
      SELECT r.file_id, r.added_at,
             coalesce(d.deleted_at, 1000000) AS deleted_at
      FROM rows_all r
      LEFT JOIN first_del d
        ON r.file_id = d.file_id AND r.pos = d.pos
    ),
    per_file AS (
      SELECT file_id,
             min(added_at) AS added_at,
             count(*) AS n_rows,
             max(deleted_at) AS last_death,
             sum(CASE WHEN deleted_at <= {_VAC_RETAIN}
                      THEN 1 ELSE 0 END) AS n_dead_by_retain
      FROM lifetimed GROUP BY file_id
    )
    SELECT
      cast(count(*) as bigint) AS n_files,
      cast(sum(CASE WHEN last_death <= {_VAC_RETAIN} THEN 1 ELSE 0 END)
           as bigint) AS n_vacuumable,
      cast(sum(CASE WHEN last_death <= {_VAC_RETAIN} THEN n_rows
               ELSE 0 END) as bigint) AS rows_reclaimed,
      cast(sum(CASE WHEN last_death > {_VAC_RETAIN}
                     AND n_dead_by_retain * 2 > n_rows
               THEN 1 ELSE 0 END) as bigint) AS n_rewrite_candidates,
      cast(sum(CASE WHEN last_death > {_VAC_RETAIN}
               THEN n_dead_by_retain ELSE 0 END) as bigint)
        AS tombstones_carried
    FROM per_file
    """,
)
def q_vacuum_plan(spark, sf_dir):
    """VACUUM / snapshot-expire planning over the same commit log as
    q_time_travel_read — the third leg of the lakehouse maintenance
    triad (read: time travel; cluster: q_hilbert_recluster; reclaim:
    THIS). With snapshots >= 2 still readable, a data file is
    physically deletable only when EVERY row in it was tombstoned at
    or before the retention horizon (last_death <= 2 — no retained
    snapshot can see it); files that survive but carry a majority of
    retained-horizon tombstones are rewrite candidates (merge-on-read
    is paying an anti-join for more than half the file), and the
    plan also totals the tombstones the reader must keep carrying.
    One-row summary: files audited, files vacuumable, rows reclaimed,
    rewrite candidates, tombstones carried.

    Scale: the whole plan is manifest-sized — per-row lifetimes
    reduce to per-file (min added, max death, dead count) in one
    map-side-combined aggregate, then a one-row rollup; nothing
    downstream of the scan is row-count-sized. This is exactly the
    metadata pass Delta VACUUM DRY RUN / Iceberg expire_snapshots
    runs before touching storage."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        (F.col("o_orderkey") / 1000).cast("bigint").alias("file_id"),
        (F.col("o_orderkey") % 1000).alias("pos"),
        "o_orderkey", F.lit(0).alias("added_at"))
    appended = (o.filter(F.col("o_orderkey") % 10 == 0)
                .select((100000 + F.col("o_orderkey") / 1000)
                        .cast("bigint").alias("file_id"),
                        (F.col("o_orderkey") % 1000).alias("pos"),
                        "o_orderkey", F.lit(2).alias("added_at")))
    rows_all = base.unionByName(appended)
    dv = (base.filter(F.col("o_orderkey") % 7 == 3)
          .select("file_id", "pos", F.lit(1).alias("deleted_at"))
          .unionByName(
              rows_all.filter(F.col("o_orderkey") % 11 == 5)
              .select("file_id", "pos", F.lit(3).alias("deleted_at"))))
    first_del = (dv.groupBy("file_id", "pos")
                 .agg(F.min("deleted_at").alias("deleted_at")))
    lifetimed = (rows_all
                 .join(first_del, ["file_id", "pos"], "left")
                 .select("file_id", "added_at",
                         F.coalesce("deleted_at", F.lit(1000000))
                         .alias("deleted_at")))
    per_file = (lifetimed.groupBy("file_id")
                .agg(F.min("added_at").alias("added_at"),
                     F.count("*").alias("n_rows"),
                     F.max("deleted_at").alias("last_death"),
                     F.sum(F.when(F.col("deleted_at") <= _VAC_RETAIN, 1)
                           .otherwise(0)).alias("n_dead_by_retain")))
    vac = F.col("last_death") <= _VAC_RETAIN
    return per_file.agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum(F.when(vac, 1).otherwise(0)).cast("long")
        .alias("n_vacuumable"),
        F.sum(F.when(vac, F.col("n_rows")).otherwise(0)).cast("long")
        .alias("rows_reclaimed"),
        F.sum(F.when((~vac) & (F.col("n_dead_by_retain") * 2
                               > F.col("n_rows")), 1).otherwise(0))
        .cast("long").alias("n_rewrite_candidates"),
        F.sum(F.when(~vac, F.col("n_dead_by_retain")).otherwise(0))
        .cast("long").alias("tombstones_carried"))


# ---------------------------------------------------------------------------
# q_partition_evolution — planning across evolved partition specs
# ---------------------------------------------------------------------------

@query(
    "q_partition_evolution",
    oracle="""
    WITH placed AS (
      SELECT o_orderkey,
             CASE WHEN cast(o_orderdate as date) < DATE '1995-01-01'
                  THEN 0 ELSE 1 END AS spec_id,
             CASE WHEN cast(o_orderdate as date) < DATE '1995-01-01'
                  THEN cast(year(cast(o_orderdate as date)) as varchar)
                  ELSE strftime(cast(o_orderdate as date), '%Y-%m')
             END AS part,
             cast(o_orderdate as date) AS d
      FROM orders
    ),
    flagged AS (
      SELECT *,
             CASE WHEN spec_id = 0
                  THEN year(d) BETWEEN 1994 AND 1995
                  ELSE part BETWEEN '1995-01' AND '1995-03'
                   OR part BETWEEN '1994-06' AND '1994-12'
             END AS scanned,
             d BETWEEN DATE '1994-06-01' AND DATE '1995-03-31'
               AS matching
      FROM placed
    )
    SELECT spec_id,
           cast(count(DISTINCT part) as bigint) AS n_partitions,
           cast(count(DISTINCT CASE WHEN scanned THEN part END)
                as bigint) AS n_scanned_partitions,
           cast(sum(CASE WHEN scanned THEN 1 ELSE 0 END) as bigint)
             AS rows_scanned,
           cast(sum(CASE WHEN matching THEN 1 ELSE 0 END) as bigint)
             AS rows_matching,
           cast(sum(CASE WHEN scanned AND NOT matching THEN 1 ELSE 0 END)
                as bigint) AS rows_wasted
    FROM flagged GROUP BY spec_id ORDER BY spec_id
    """,
)
def q_partition_evolution(spark, sf_dir):
    """Partition-spec evolution (Iceberg v2 semantics): data written
    before 1995 sits under spec 0 (partitioned by YEAR), later data
    under spec 1 (by MONTH) — the table carries both layouts forever,
    and a planner must prune EACH file under the spec it was written
    with. For the predicate orderdate IN [1994-06-01, 1995-03-31],
    spec-0 files prune only to year granularity (all of 1994 scans —
    five months of it wasted), spec-1 files prune to the exact three
    months. The audit reports, per spec: partition count, partitions
    scanned, rows scanned vs rows actually matching, and the wasted
    rows — the read-amplification number that tells an operator when
    a legacy-spec rewrite pays for itself.

    Scale: pruning decisions are pure partition-value expressions
    (manifest-level, no data read in a real table); here they are
    scan-level codegen CASEs and one map-side-combined rollup per
    spec. The 100 TB lesson is the point: spec evolution means old
    files keep coarse pruning — this query quantifies exactly what
    that costs."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    spec = F.when(d < F.lit("1995-01-01").cast("date"), 0).otherwise(1)
    part = (F.when(spec == 0, F.year(d).cast("string"))
            .otherwise(F.date_format(d, "yyyy-MM")))
    placed = o.select("o_orderkey", spec.alias("spec_id"),
                      part.alias("part"), d.alias("d"))
    scanned = (F.when(F.col("spec_id") == 0,
                      F.year("d").between(1994, 1995))
               .otherwise(F.col("part").between("1995-01", "1995-03")
                          | F.col("part").between("1994-06", "1994-12")))
    matching = F.col("d").between(F.lit("1994-06-01").cast("date"),
                                  F.lit("1995-03-31").cast("date"))
    return (placed
            .withColumn("scanned", scanned)
            .withColumn("matching", matching)
            .groupBy("spec_id")
            .agg(F.countDistinct("part").cast("long")
                 .alias("n_partitions"),
                 F.countDistinct(F.when(F.col("scanned"), F.col("part")))
                 .cast("long").alias("n_scanned_partitions"),
                 F.sum(F.when(F.col("scanned"), 1).otherwise(0))
                 .cast("long").alias("rows_scanned"),
                 F.sum(F.when(F.col("matching"), 1).otherwise(0))
                 .cast("long").alias("rows_matching"),
                 F.sum(F.when(F.col("scanned") & ~F.col("matching"), 1)
                       .otherwise(0)).cast("long").alias("rows_wasted"))
            .orderBy("spec_id"))


# ---------------------------------------------------------------------------
# q_wap_branch — write-audit-publish branch isolation
# ---------------------------------------------------------------------------

@query(
    "q_wap_branch",
    oracle="""
    WITH commits AS (
      SELECT 0 AS commit_id, 'main' AS branch, TRUE AS published
      UNION ALL SELECT 1, 'audit', FALSE
      UNION ALL SELECT 2, 'audit', FALSE
      UNION ALL SELECT 3, 'main', TRUE
    ),
    data_rows AS (
      SELECT o_orderkey, o_totalprice, 0 AS commit_id FROM orders
      UNION ALL
      SELECT o_orderkey + 200000000, o_totalprice, 1
      FROM orders WHERE o_orderkey % 4 = 0
      UNION ALL
      SELECT o_orderkey + 400000000, o_totalprice, 2
      FROM orders WHERE o_orderkey % 4 = 1
      UNION ALL
      SELECT o_orderkey + 600000000, o_totalprice, 3
      FROM orders WHERE o_orderkey % 4 = 2
    ),
    readers AS (
      SELECT 'main' AS reader UNION ALL SELECT 'audit'
    )
    SELECT r.reader,
           cast(count(*) as bigint) AS n_rows,
           cast(count(DISTINCT d.commit_id) as bigint) AS n_commits,
           cast(round(sum(cast(d.o_totalprice as decimal(30,10))), 2)
                as double) AS total_price
    FROM readers r
    JOIN data_rows d ON TRUE
    JOIN commits c ON c.commit_id = d.commit_id
    WHERE c.published OR c.branch = r.reader
    GROUP BY r.reader ORDER BY r.reader
    """,
)
def q_wap_branch(spark, sf_dir):
    """Write-audit-publish (WAP) branch reads — the Iceberg/Delta
    pattern that lets a pipeline STAGE data invisibly, audit it, and
    publish atomically: commits 1-2 land on the 'audit' branch
    (unpublished), commit 3 is a published main write that raced past
    the audit. A branch reader sees published commits PLUS its own
    branch's staged commits; the main reader sees published only —
    so the audit reader's totals preview exactly what a fast-forward
    publish would make everyone see, while main remains unpolluted by
    unaudited data. Output: per reader, row count, commit count, and
    the exact decimal total each isolation level returns.

    Scale: branch visibility is a commit-metadata predicate — the
    commits relation is catalog-sized (4 rows here, thousands at
    100 TB) and broadcasts; data rows carry only their commit_id, so
    isolation costs one broadcast-hash semi-predicate at scan time,
    never a data rewrite. This is the audit gate a 100 TB ingest runs
    every batch through before its quality checks sign off."""
    o = load_table(spark, sf_dir, "orders")

    def slice_(mod, off, cid):
        return (o.filter(F.col("o_orderkey") % 4 == mod)
                .select((F.col("o_orderkey") + off).alias("o_orderkey"),
                        "o_totalprice", F.lit(cid).alias("commit_id")))

    data = (o.select("o_orderkey", "o_totalprice",
                     F.lit(0).alias("commit_id"))
            .unionByName(slice_(0, 200000000, 1))
            .unionByName(slice_(1, 400000000, 2))
            .unionByName(slice_(2, 600000000, 3)))
    commits = spark.createDataFrame(
        [(0, "main", True), (1, "audit", False),
         (2, "audit", False), (3, "main", True)],
        "commit_id int, branch string, published boolean")
    readers = spark.createDataFrame([("main",), ("audit",)],
                                    "reader string")
    return (data.join(F.broadcast(commits), "commit_id")
            .join(F.broadcast(readers),
                  F.col("published") | (F.col("branch")
                                        == F.col("reader")))
            .groupBy("reader")
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.countDistinct("commit_id").cast("long")
                 .alias("n_commits"),
                 F.round(F.sum(F.col("o_totalprice")
                               .cast("decimal(30,10)")), 2)
                 .cast("double").alias("total_price"))
            .orderBy("reader"))


# ---------------------------------------------------------------------------
# q_merge_upsert — MERGE INTO materialization over the DV machinery
# ---------------------------------------------------------------------------

@query(
    "q_merge_upsert",
    oracle="""
    WITH target AS (
      SELECT o_orderkey AS k,
             cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)
               AS price_c,
             o_orderkey // 1000 AS file_id
      FROM orders
    ),
    source AS (
      SELECT o_orderkey AS k,
             (cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)
              * 11) // 10 AS price_c,
             CASE WHEN o_orderkey % 21 = 0 THEN 'delete'
                  ELSE 'upsert' END AS op
      FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey + 300000000 AS k,
             cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)
               AS price_c,
             'upsert' AS op
      FROM orders WHERE o_orderkey % 13 = 0
    ),
    merged AS (
      SELECT coalesce(t.k, s.k) AS k,
             t.file_id,
             CASE WHEN t.k IS NULL THEN 'insert'
                  WHEN s.k IS NULL THEN 'unchanged'
                  WHEN s.op = 'delete' THEN 'delete'
                  ELSE 'update' END AS action,
             CASE WHEN t.k IS NULL THEN s.price_c
                  WHEN s.k IS NULL THEN t.price_c
                  WHEN s.op = 'delete' THEN NULL
                  ELSE s.price_c END AS out_c
      FROM target t FULL OUTER JOIN source s ON t.k = s.k
    )
    SELECT action,
           cast(count(*) as bigint) AS n_rows,
           cast(count(DISTINCT file_id) as bigint) AS n_files_touched,
           cast(cast(sum(out_c) as double) / 100 as double)
             AS total_price
    FROM merged GROUP BY action ORDER BY action
    """,
)
def q_merge_upsert(spark, sf_dir):
    """MERGE INTO materialization (Delta/Iceberg row-level semantics)
    over the same synthesized file layout as q_time_travel_read: the
    source batch UPDATEs every third order to an 11/10 price (exact
    integer cents — never a 1.1 double multiply), DELETEs the %21
    subset (WHEN MATCHED AND cond THEN DELETE), and INSERTs a new-key
    batch (%13, shifted key space). The audit reports, per merge
    action (insert/update/delete/unchanged): row count, distinct
    target files touched — the number that becomes deletion-vector +
    rewrite fan-out in a real commit — and the resulting exact price
    mass (NULL for deletes, whose rows leave the table).

    Scale: MERGE is ONE keyed full-outer shuffle join between target
    and source (never per-row lookups); at 100 TB the join key is the
    table's clustering key, so the shuffle co-partitions with the
    file layout and each task emits its file's deletion vector +
    rewritten rows locally. The action rollup map-side combines.
    Cites Delta Lake MERGE semantics (public docs); no reference
    analog — engine scope."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr(
        "cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)")
    target = o.select(F.col("o_orderkey").alias("k"),
                      cents.alias("price_c"),
                      (F.col("o_orderkey") / 1000).cast("bigint")
                      .alias("file_id"))
    upd = (o.filter(F.col("o_orderkey") % 3 == 0)
           .select(F.col("o_orderkey").alias("k"),
                   F.expr("(cast(cast(o_totalprice as decimal(12,2))"
                          " * 100 as bigint) * 11) DIV 10")
                   .alias("price_c"),
                   F.when(F.col("o_orderkey") % 21 == 0, "delete")
                   .otherwise("upsert").alias("op")))
    ins = (o.filter(F.col("o_orderkey") % 13 == 0)
           .select((F.col("o_orderkey") + 300000000).alias("k"),
                   cents.alias("price_c"),
                   F.lit("upsert").alias("op")))
    source = upd.unionByName(ins)
    t, s = target.alias("t"), source.alias("s")
    merged = (t.join(s, F.col("t.k") == F.col("s.k"), "full_outer")
              .select(
                  F.coalesce("t.k", "s.k").alias("k"),
                  "t.file_id",
                  F.when(F.col("t.k").isNull(), "insert")
                  .when(F.col("s.k").isNull(), "unchanged")
                  .when(F.col("s.op") == "delete", "delete")
                  .otherwise("update").alias("action"),
                  F.when(F.col("t.k").isNull(), F.col("s.price_c"))
                  .when(F.col("s.k").isNull(), F.col("t.price_c"))
                  .when(F.col("s.op") == "delete", F.lit(None))
                  .otherwise(F.col("s.price_c")).alias("out_c")))
    return (merged.groupBy("action")
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.countDistinct("file_id").cast("long")
                 .alias("n_files_touched"),
                 (F.sum("out_c").cast("double") / 100)
                 .cast("double").alias("total_price"))
            .orderBy("action"))


# ---------------------------------------------------------------------------
# q_optimize_binpack — small-file bin-packing over the commit log
# ---------------------------------------------------------------------------

_COMPACT_TARGET = 256_000  # target compacted size (synthetic bytes)
_COMPACT_SMALL = 64_000    # files under this are compaction candidates


@query(
    "q_optimize_binpack",
    oracle=f"""
    WITH files AS (
      SELECT o_orderkey // 1000 AS file_id,
             0 AS part_id,
             count(*) * 400 AS bytes
      FROM orders GROUP BY 1
      UNION ALL
      SELECT 100000 + o_orderkey // 50 AS file_id,
             1 AS part_id,
             count(*) * 400 AS bytes
      FROM orders WHERE o_orderkey % 10 = 0 GROUP BY 1
    ),
    small AS (
      SELECT *,
             sum(bytes) OVER (PARTITION BY part_id
                              ORDER BY bytes DESC, file_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM files WHERE bytes < {_COMPACT_SMALL}
    ),
    binned AS (
      SELECT part_id, file_id, bytes,
             cast((cum - 1) // {_COMPACT_TARGET} as bigint) AS bin_id
      FROM small
    )
    SELECT part_id, bin_id,
           cast(count(*) as bigint) AS n_files,
           cast(sum(bytes) as bigint) AS bin_bytes,
           cast(min(file_id) as bigint) AS first_file,
           cast(max(file_id) as bigint) AS last_file
    FROM binned GROUP BY part_id, bin_id
    ORDER BY part_id, bin_id
    """,
)
def q_optimize_binpack(spark, sf_dir):
    """Small-file compaction planning (OPTIMIZE bin-packing): the file
    inventory carries one healthy base layout plus a small-file spray
    (the %10 append stream split 20x finer), and the planner packs
    every under-threshold file into ~target-sized rewrite bins. The
    packing is the deterministic sorted-greedy form: within a
    partition, files order by (bytes DESC, file_id) and a running
    cumulative sum assigns bin_id = (cum-1) DIV target — reproducible
    on any engine, no first-fit iteration. Per bin: file count, byte
    mass, and the file-id envelope the rewrite task would claim.
    Composes the q_vacuum_plan / q_hilbert_recluster maintenance
    battery: vacuum deletes dead files, Hilbert reorders hot ones,
    this packs the fragments.

    Scale: the input is MANIFEST-sized (one row per file, never data
    rows); one window per table partition orders the small-file list.
    At 100 TB with millions of files this is still a few hundred MB of
    metadata — the same planner input every real lakehouse OPTIMIZE
    reads. The greedy-by-size packing wastes at most one target-size
    of slack per bin vs optimal (classic FFD bound), which is the
    accepted trade for a single-pass distributed plan."""
    o = load_table(spark, sf_dir, "orders")
    base = (o.groupBy((F.col("o_orderkey") / 1000).cast("bigint")
                      .alias("file_id"))
            .agg((F.count("*") * 400).alias("bytes"))
            .select("file_id", F.lit(0).alias("part_id"), "bytes"))
    spray = (o.filter(F.col("o_orderkey") % 10 == 0)
             .groupBy((100000 + F.col("o_orderkey") / 50).cast("bigint")
                      .alias("file_id"))
             .agg((F.count("*") * 400).alias("bytes"))
             .select("file_id", F.lit(1).alias("part_id"), "bytes"))
    files = base.unionByName(spray)
    w = (W.partitionBy("part_id").orderBy(F.desc("bytes"), "file_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    small = (files.filter(F.col("bytes") < _COMPACT_SMALL)
             .withColumn("cum", F.sum("bytes").over(w))
             .withColumn("bin_id",
                         F.expr(f"(cum - 1) DIV {_COMPACT_TARGET}")))
    return (small.groupBy("part_id", "bin_id")
            .agg(F.count("*").cast("long").alias("n_files"),
                 F.sum("bytes").cast("long").alias("bin_bytes"),
                 F.min("file_id").cast("long").alias("first_file"),
                 F.max("file_id").cast("long").alias("last_file"))
            .orderBy("part_id", "bin_id"))


# ---------------------------------------------------------------------------
# q_schema_evolution_read — field-id column mapping across snapshots
# ---------------------------------------------------------------------------

@query(
    "q_schema_evolution_read",
    oracle="""
    WITH rows_all AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 4 = 0 THEN 2 ELSE 1 END
               AS file_schema_v,
             cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)
               AS f5_c,
             o_orderkey % 10 AS f7_old,
             o_orderkey % 5 AS f9_new
      FROM orders
    ),
    resolved AS (
      SELECT file_schema_v,
             f5_c AS amount_c,
             CASE WHEN file_schema_v = 2 THEN f9_new END AS priority,
             CASE WHEN file_schema_v = 2 THEN f5_c END AS name_match_c
      FROM rows_all
    )
    SELECT file_schema_v,
           cast(count(*) as bigint) AS n_rows,
           cast(cast(sum(amount_c) as double) / 100 as double)
             AS amount_sum,
           cast(count(priority) as bigint) AS n_priority_readable,
           cast(cast(coalesce(sum(name_match_c), 0) as double) / 100
                as double) AS name_matched_sum
    FROM resolved GROUP BY file_schema_v ORDER BY file_schema_v
    """,
)
def q_schema_evolution_read(spark, sf_dir):
    """Schema-evolution reads by FIELD ID (Iceberg v2 column mapping):
    v1 files store the money column as `price` (field id 5) and an
    integer `priority` (field id 7); schema v2 RENAMES field 5 to
    `amount`, DROPS field 7, and re-adds a column NAMED `priority`
    under a NEW field id 9. A correct reader resolves columns by field
    id: `amount` maps onto v1's field 5 (every row readable), while
    the re-added `priority` matches NO v1 field — old files read NULL,
    never the dropped field-7 values. The audit reports, per file
    schema version: rows, the field-id-resolved amount sum, how many
    rows expose the new priority (only v2), and the NAME-matched sum a
    naive reader would get (0 for v1 files — the silent data loss this
    mapping exists to prevent). Composes q_partition_evolution: specs
    evolve pruning, schemas evolve projection.

    Scale: column mapping is a pure manifest/metadata rewrite of the
    read schema — zero data movement; here it compiles to codegen
    CASEs in the scan and one map-side-combined rollup. At 100 TB the
    point survives verbatim: renames and drops never rewrite data
    files."""
    o = load_table(spark, sf_dir, "orders")
    rows_all = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 4 == 0, 2).otherwise(1)
        .alias("file_schema_v"),
        F.expr("cast(cast(o_totalprice as decimal(12,2)) * 100"
               " as bigint)").alias("f5_c"),
        (F.col("o_orderkey") % 10).alias("f7_old"),
        (F.col("o_orderkey") % 5).alias("f9_new"))
    resolved = rows_all.select(
        "file_schema_v",
        F.col("f5_c").alias("amount_c"),
        F.when(F.col("file_schema_v") == 2, F.col("f9_new"))
        .alias("priority"),
        F.when(F.col("file_schema_v") == 2, F.col("f5_c"))
        .alias("name_match_c"))
    return (resolved.groupBy("file_schema_v")
            .agg(F.count("*").cast("long").alias("n_rows"),
                 (F.sum("amount_c").cast("double") / 100)
                 .cast("double").alias("amount_sum"),
                 F.count("priority").cast("long")
                 .alias("n_priority_readable"),
                 (F.coalesce(F.sum("name_match_c"), F.lit(0))
                  .cast("double") / 100)
                 .cast("double").alias("name_matched_sum"))
            .orderBy("file_schema_v"))


# ---------------------------------------------------------------------------
# q_late_arriving_dim — inferred members + reconciliation audit
# ---------------------------------------------------------------------------

@query(
    "q_late_arriving_dim",
    oracle="""
    WITH dim_batch1 AS (
      SELECT c_custkey, c_mktsegment FROM customer
      WHERE c_custkey % 7 <> 0
    ),
    dim_batch2 AS (
      SELECT c_custkey, c_mktsegment FROM customer
      WHERE c_custkey % 7 = 0 AND c_custkey % 3 = 0
    ),
    facts AS (
      SELECT o_custkey AS k,
             cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)
               AS price_c
      FROM orders
    ),
    resolved AS (
      SELECT f.k, f.price_c,
             CASE WHEN d1.c_custkey IS NOT NULL THEN 'matched'
                  WHEN d2.c_custkey IS NOT NULL THEN 'reconciled'
                  ELSE 'inferred' END AS status,
             coalesce(d1.c_mktsegment, d2.c_mktsegment, 'UNKNOWN')
               AS segment
      FROM facts f
      LEFT JOIN dim_batch1 d1 ON d1.c_custkey = f.k
      LEFT JOIN dim_batch2 d2 ON d2.c_custkey = f.k
    )
    SELECT status, segment,
           cast(count(*) as bigint) AS n_facts,
           cast(count(DISTINCT k) as bigint) AS n_keys,
           cast(cast(sum(price_c) as double) / 100 as double)
             AS price_mass
    FROM resolved GROUP BY status, segment
    ORDER BY status, segment
    """,
)
def q_late_arriving_dim(spark, sf_dir):
    """Late-arriving dimension handling (Kimball inferred members):
    fact rows can reference dimension keys the dim feed has not
    delivered yet. Batch 1 of the dim is missing every %7 key; batch 2
    later delivers the %3 subset of those. The loader keeps the facts
    (never drops or stalls them), attaches an inferred 'UNKNOWN'
    member for unresolved keys, and the audit reports the three
    states a warehouse operator tracks: matched (on first load),
    reconciled (inferred member later replaced by the real row), and
    still-inferred (the data-quality backlog), each with fact count,
    distinct keys, and exact price mass in integer cents.

    Scale: two keyed left joins against dimension tables (broadcast at
    any realistic dim/fact ratio — AQE decides, no hint) and one
    map-side-combined rollup; the fact table is scanned once. At
    100 TB the inferred-member pattern is exactly what keeps the fact
    pipeline non-blocking while dim feeds lag. Composes q_scd2 (the
    reconciliation becomes a type-2 version chain when history
    matters)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    d1 = (c.filter(F.col("c_custkey") % 7 != 0)
          .select(F.col("c_custkey").alias("k1"),
                  F.col("c_mktsegment").alias("seg1")))
    d2 = (c.filter((F.col("c_custkey") % 7 == 0)
                   & (F.col("c_custkey") % 3 == 0))
          .select(F.col("c_custkey").alias("k2"),
                  F.col("c_mktsegment").alias("seg2")))
    facts = o.select(
        F.col("o_custkey").alias("k"),
        F.expr("cast(cast(o_totalprice as decimal(12,2)) * 100"
               " as bigint)").alias("price_c"))
    resolved = (facts
                .join(d1, facts.k == d1.k1, "left")
                .join(d2, facts.k == d2.k2, "left")
                .select(
                    "k", "price_c",
                    F.when(F.col("k1").isNotNull(), "matched")
                    .when(F.col("k2").isNotNull(), "reconciled")
                    .otherwise("inferred").alias("status"),
                    F.coalesce("seg1", "seg2", F.lit("UNKNOWN"))
                    .alias("segment")))
    return (resolved.groupBy("status", "segment")
            .agg(F.count("*").cast("long").alias("n_facts"),
                 F.countDistinct("k").cast("long").alias("n_keys"),
                 (F.sum("price_c").cast("double") / 100)
                 .cast("double").alias("price_mass"))
            .orderBy("status", "segment"))


# ---------------------------------------------------------------------------
# q_view_maintenance — incremental maintenance of a materialized aggregate
# ---------------------------------------------------------------------------

@query(
    "q_view_maintenance",
    oracle="""
    /* ground truth: recompute the view over base + delta from scratch.
       The Spark side NEVER rescans base rows — it merges the two
       partial-aggregate states — so a hash match proves the
       maintenance algebra exact. */
    SELECT o_orderpriority AS priority,
           cast(count(*) as bigint) AS n_orders,
           cast(sum(cast(cast(o_totalprice as decimal(14,2)) * 100
                         as bigint)) as bigint) AS total_cents,
           min(o_orderdate) AS first_date,
           max(o_orderdate) AS last_date,
           cast((2 * sum(cast(cast(o_totalprice as decimal(14,2)) * 100
                              as bigint)) * 100 + count(*))
                // (2 * count(*)) as double) / 1e4 AS avg_price4
    FROM orders
    GROUP BY 1 ORDER BY 1
    """,
)
def q_view_maintenance(spark, sf_dir):
    """Incremental view maintenance — keep a materialized aggregate
    current under an insert batch WITHOUT rescanning the base, the
    capability behind every lakehouse materialized view / streaming
    rollup. The fixture splits orders into a 90% base (the standing
    view's input) and a 10% delta (the arriving batch); the view is a
    per-priority (count, sum-of-cents, min/max date) state. The
    maintained result is view(base) ⊕ view(delta) — a full-outer
    merge of the two partial states combining count-by-sum,
    sum-by-sum, min-by-least, max-by-greatest — and the derived
    average is computed FROM the maintained sums by exact integer
    division (avg is not itself mergeable; its sufficient statistics
    are — the same algebra that makes Spark's own partial aggregation
    correct, here surfaced as a user-level maintenance contract; cf.
    q_quantile_sketch_merge for the non-algebraic-aggregate route).
    The oracle recomputes from scratch over base ∪ delta, so the hash
    match proves the maintenance exact.

    Scale: the merge touches |view| rows (one per group), never the
    100 TB base — maintenance cost is O(delta + view), the entire
    point. Both arms are ordinary grouped aggregates with map-side
    combine."""
    o = load_table(spark, sf_dir, "orders")
    cents = ("cast(cast(o_totalprice as decimal(14,2)) * 100"
             " as bigint)")

    def view_state(df):
        return (df.groupBy(F.col("o_orderpriority").alias("priority"))
                .agg(F.count("*").alias("cnt"),
                     F.sum(F.expr(cents)).alias("cents"),
                     F.min("o_orderdate").alias("d_min"),
                     F.max("o_orderdate").alias("d_max")))

    base_view = view_state(o.filter(F.col("o_orderkey") % 10 != 0))
    delta_view = view_state(o.filter(F.col("o_orderkey") % 10 == 0))
    b, d_ = base_view.alias("b"), delta_view.alias("d")
    merged = (b.join(d_, F.col("b.priority") == F.col("d.priority"),
                     "full_outer")
              .select(
                  F.coalesce("b.priority", "d.priority").alias("priority"),
                  (F.coalesce("b.cnt", F.lit(0))
                   + F.coalesce("d.cnt", F.lit(0))).alias("cnt"),
                  (F.coalesce("b.cents", F.lit(0))
                   + F.coalesce("d.cents", F.lit(0))).alias("cents"),
                  F.least("b.d_min", "d.d_min").alias("d_min_raw"),
                  F.greatest("b.d_max", "d.d_max").alias("d_max_raw"),
                  F.coalesce("b.d_min", "d.d_min").alias("d_min_fb"),
                  F.coalesce("b.d_max", "d.d_max").alias("d_max_fb")))
    return (merged.selectExpr(
        "priority",
        "cast(cnt as bigint) AS n_orders",
        "cast(cents as bigint) AS total_cents",
        # least/greatest are null if EITHER side is null — fall back
        # to the surviving side for groups present in only one state
        "coalesce(d_min_raw, d_min_fb) AS first_date",
        "coalesce(d_max_raw, d_max_fb) AS last_date",
        "cast((2 * cents * 100 + cnt) DIV (2 * cnt) as double) / 1e4"
        " AS avg_price4")
        .orderBy("priority"))


# ---------------------------------------------------------------------------
# q_fifo_allocation — FIFO lot matching via cumulative-interval intersection
# ---------------------------------------------------------------------------

@query(
    "q_fifo_allocation",
    oracle="""
    WITH supply AS (
      /* three deterministic supply lots per part, FIFO order j */
      SELECT p_partkey AS pk, j.j AS lot_id,
             10 + (p_partkey * 7 + j.j) % 50 AS qty
      FROM part, (SELECT unnest([1, 2, 3]) AS j) j
    ),
    s_iv AS (
      SELECT pk, lot_id, qty,
             sum(qty) OVER (PARTITION BY pk ORDER BY lot_id)
               - qty AS lo,
             sum(qty) OVER (PARTITION BY pk ORDER BY lot_id) AS hi
      FROM supply
    ),
    demand AS (
      SELECT l_partkey AS pk, l_orderkey, l_linenumber,
             cast(l_quantity as bigint) AS qty,
             row_number() OVER (PARTITION BY l_partkey
                                ORDER BY l_orderkey, l_linenumber)
               AS seq
      FROM lineitem
    ),
    d_iv AS (
      SELECT pk, seq, qty,
             sum(qty) OVER (PARTITION BY pk ORDER BY seq) - qty AS lo,
             sum(qty) OVER (PARTITION BY pk ORDER BY seq) AS hi
      FROM demand
    ),
    alloc AS (
      SELECT d.pk, d.seq, s.lot_id,
             least(d.hi, s.hi) - greatest(d.lo, s.lo) AS qty
      FROM d_iv d JOIN s_iv s
        ON s.pk = d.pk AND s.lo < d.hi AND d.lo < s.hi
    ),
    per_part AS (
      SELECT pk,
             count(*) AS n_allocations,
             sum(qty) AS allocated,
             count(DISTINCT lot_id) AS lots_touched
      FROM alloc GROUP BY pk
    ),
    totals AS (
      SELECT pk, sum(qty) AS demanded FROM demand GROUP BY pk
    )
    SELECT t.pk AS partkey,
           cast(t.demanded as bigint) AS demanded_qty,
           cast(coalesce(p.allocated, 0) as bigint) AS allocated_qty,
           cast(t.demanded - coalesce(p.allocated, 0) as bigint)
             AS unfilled_qty,
           cast(coalesce(p.n_allocations, 0) as bigint)
             AS n_allocations,
           cast(coalesce(p.lots_touched, 0) as bigint) AS lots_touched
    FROM totals t LEFT JOIN per_part p ON p.pk = t.pk
    ORDER BY t.pk LIMIT 20
    """,
)
def q_fifo_allocation(spark, sf_dir):
    """FIFO inventory allocation — match each part's demand stream
    (lineitems in order arrival order) against its supply lots in
    first-in-first-out order, the canonical warehouse/ledger matching
    problem that naive SQL can only express as a per-row cursor. The
    set-based algebra: cumulative sums turn both streams into
    half-open INTERVALS on the part's consumption axis ([lo, hi) per
    lot, [lo, hi) per demand), and FIFO matching IS interval
    intersection — a per-part range join where each overlap allocates
    least(hi)-greatest(lo) units. Three deterministic supply lots per
    part are synthesized from the part key; the readout per part is
    demanded/allocated/unfilled quantity plus allocation-fragment and
    lots-touched counts (top 20 parts by key). All-integer output.

    The same cumulative-interval trick powers q_dedup_substring's
    span union and q_seq_packing's shard fitting; here it replaces an
    inherently sequential-looking business process with two keyed
    windows and one range join.

    Scale: both cumsums are PART-keyed windows (never global); the
    range join's equi-key is the part, so each part intersects only
    its own ~3 lots x its own demands — work is O(demand + output),
    and the per-part rollup map-side combines. At 100 TB the axis is
    unbounded but intervals stay per-key local; skewed parts shard by
    the same salting valve as every keyed join here."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    supply = (p.selectExpr("p_partkey AS pk")
              .withColumn("lot_id", F.explode(F.array(
                  F.lit(1), F.lit(2), F.lit(3))))
              .selectExpr("pk", "lot_id",
                          "10 + (pk * 7 + lot_id) % 50 AS qty"))
    ws = W.partitionBy("pk").orderBy("lot_id")
    s_iv = (supply
            .withColumn("hi", F.sum("qty").over(ws))
            .withColumn("lo", F.col("hi") - F.col("qty")))
    demand = (li.selectExpr("l_partkey AS pk", "l_orderkey",
                            "l_linenumber",
                            "cast(l_quantity as bigint) AS qty")
              .withColumn("seq", F.row_number().over(
                  W.partitionBy("pk").orderBy("l_orderkey",
                                              "l_linenumber"))))
    wd = W.partitionBy("pk").orderBy("seq")
    d_iv = (demand
            .withColumn("hi", F.sum("qty").over(wd))
            .withColumn("lo", F.col("hi") - F.col("qty")))
    a, s = d_iv.alias("d"), s_iv.alias("s")
    alloc = (a.join(s, (F.col("s.pk") == F.col("d.pk"))
                    & (F.col("s.lo") < F.col("d.hi"))
                    & (F.col("d.lo") < F.col("s.hi")))
             .select(F.col("d.pk").alias("pk"),
                     F.col("s.lot_id").alias("lot_id"),
                     (F.least("d.hi", "s.hi")
                      - F.greatest("d.lo", "s.lo")).alias("qty")))
    per_part = alloc.groupBy("pk").agg(
        F.count("*").alias("n_allocations"),
        F.sum("qty").alias("allocated"),
        F.countDistinct("lot_id").alias("lots_touched"))
    totals = demand.groupBy("pk").agg(F.sum("qty").alias("demanded"))
    return (totals.join(per_part, "pk", "left")
            .selectExpr(
                "pk AS partkey",
                "cast(demanded as bigint) AS demanded_qty",
                "cast(coalesce(allocated, 0) as bigint)"
                " AS allocated_qty",
                "cast(demanded - coalesce(allocated, 0) as bigint)"
                " AS unfilled_qty",
                "cast(coalesce(n_allocations, 0) as bigint)"
                " AS n_allocations",
                "cast(coalesce(lots_touched, 0) as bigint)"
                " AS lots_touched")
            .orderBy("partkey").limit(20))
