"""Time-series and data-quality compositions over the fixture tables:
gap-fill/resample, time-range rolling windows, histogram binning,
z-score anomaly flagging, snapshot diff (CDC classify), and
distribution-drift scoring (PSI).

These are the operational shapes a production data pipeline runs daily
(the reference's closest analog is its ratings-load monitoring loop,
challenge.py≈L203-210 [R]); each is expressed shuffle-minimal:
aggregate-then-join, never raw-row × raw-row.

Hash discipline: every float reduction goes through decimal(30,10)
(functions/hashsafe.py); derived statistics (mean, stddev) are computed
from exact decimal sums with the SAME IEEE expression tree on both
engines, so they are bit-identical without rounding tricks.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .functions.hashsafe import DEC, dsum
from .registry import query
from .sources.fixtures import load_table

_US_30MIN = 30 * 60 * 1_000_000


@query(
    "q_gapfill_locf",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', min(ts)) AS lo,
             date_trunc('hour', max(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    agg AS (
      SELECT date_trunc('hour', ts) AS h, event_type,
             count(*) AS n_events,
             round(cast(sum(cast(value as decimal(30,10))) as double), 4)
               AS sum_value
      FROM events GROUP BY 1, 2
    )
    SELECT spine.h AS h, types.event_type AS event_type,
           coalesce(agg.n_events, 0) AS n_events,
           last_value(agg.sum_value IGNORE NULLS)
             OVER (PARTITION BY types.event_type ORDER BY spine.h)
             AS sum_value_locf
    FROM spine CROSS JOIN types
    LEFT JOIN agg ON agg.h = spine.h AND agg.event_type = types.event_type
    """,
)
def q_gapfill_locf(spark, sf_dir):
    """Time-series resample + gap-fill: hourly per-type counts on a
    dense hour spine (empty hours appear as 0) with last-observation-
    carried-forward for the value column. The spine is generated from
    the aggregated min/max (sequence + explode — O(hours), never
    O(rows)); events are reduced to per-hour rows BEFORE any join, so
    the only full-data pass is the map-side partial agg. At 100 TB the
    grid is still |hours|x|types| — trivially broadcastable."""
    e = load_table(spark, sf_dir, "events")
    hourly = (e.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
              .agg(F.count("*").alias("n_events"),
                   dsum("value", "sum_value")))
    # bounds and the type dimension both derive from the AGGREGATED
    # relation (min/max hour, types with >=1 event are identical either
    # way) and that |hours|x|types| relation is persisted, so raw
    # events are scanned exactly once no matter how many consumers —
    # column pruning makes the three subplans non-identical, which
    # defeats ReuseExchange; an explicit persist of the tiny aggregate
    # is the production answer (same rationale as q_dedup_minhash's
    # shingle persist). Asserted in test_plans.py.
    hourly = hourly.persist()
    spine = (hourly.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
             .select(F.explode(
                 F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h")))
    types = hourly.select("event_type").distinct()
    grid = spine.crossJoin(types)  # dims-only: |hours| x |types|
    locf = W.partitionBy("event_type").orderBy("h")
    return (grid.join(hourly, ["h", "event_type"], "left")
            .select("h", "event_type",
                    F.coalesce("n_events", F.lit(0)).alias("n_events"),
                    F.last("sum_value", ignorenulls=True).over(locf)
                    .alias("sum_value_locf")))


@query(
    "q_window_time_range",
    oracle="""
    SELECT event_id,
           round(cast(sum(cast(value as decimal(30,10))) OVER w as double), 4)
             AS roll_sum_30m,
           count(*) OVER w AS n_win_30m
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING
                 AND CURRENT ROW)
    """,
)
def q_window_time_range(spark, sf_dir):
    """Time-RANGE window frame (vs the row-count frames of
    q_window_frames): per-user rolling 30-minute sum/count. Spark range
    frames need a numeric ordering key, so the frame is expressed over
    unix_micros(ts) with an exact microsecond radius — integer
    arithmetic, no float timestamps (the DuckDB twin orders by the
    timestamp itself with an INTERVAL frame; both bounds inclusive).
    Scales: one hash-partition by user, one sort per partition — the
    same shuffle a groupBy(user) would pay."""
    e = load_table(spark, sf_dir, "events")
    w = (W.partitionBy("user_id")
         .orderBy(F.unix_micros("ts"))
         .rangeBetween(-_US_30MIN, 0))
    return e.select(
        "event_id",
        F.round(F.sum(F.col("value").cast(DEC)).over(w).cast("double"), 4)
        .alias("roll_sum_30m"),
        F.count("*").over(w).alias("n_win_30m"),
    )


@query(
    "q_histogram",
    oracle="""
    SELECT least(9, cast(floor(o_totalprice / 50000.0) as bigint))
             AS bucket,
           count(*) AS n,
           min(o_totalprice) AS lo_price,
           max(o_totalprice) AS hi_price,
           round(cast(sum(cast(o_totalprice as decimal(30,10))) as double), 4)
             AS sum_price
    FROM orders GROUP BY 1
    """,
)
def q_histogram(spark, sf_dir):
    """Fixed-width histogram binning (width_bucket semantics, spelled
    as explicit floor arithmetic so both engines compute the identical
    IEEE division -> floor -> clamp; DuckDB lacks width_bucket).
    Single map-side-combinable aggregation — the scan emits (bucket,
    partial) pairs, the shuffle carries ~10 rows per partition."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.lit(9).cast("bigint"),
        F.floor(F.col("o_totalprice") / F.lit(50000.0)),
    )
    return (o.groupBy(bucket.alias("bucket"))
            .agg(F.count("*").alias("n"),
                 F.min("o_totalprice").alias("lo_price"),
                 F.max("o_totalprice").alias("hi_price"),
                 dsum("o_totalprice", "sum_price")))


@query(
    "q_anomaly_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type, count(*) AS n,
             cast(sum(cast(value as decimal(30,10))) as double) AS s1,
             cast(sum(cast(value * value as decimal(30,10))) as double) AS s2
      FROM events GROUP BY 1
    ),
    derived AS (
      SELECT event_type, n, s1 / n AS mean,
             sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sd
      FROM stats
    )
    SELECT d.event_type AS event_type, d.n AS n,
           round(d.mean, 4) AS mean_value,
           round(d.sd, 4) AS sd_value,
           count(CASE WHEN e.value > d.mean + 2 * d.sd
                        OR e.value < d.mean - 2 * d.sd
                      THEN 1 END) AS n_anomalies
    FROM events e JOIN derived d ON e.event_type = d.event_type
    GROUP BY 1, 2, 3, 4
    """,
)
def q_anomaly_zscore(spark, sf_dir):
    """Per-group z-score anomaly counting — the outlier-row-drop stage
    of the reference (challenge.py≈L152-154 [R]) generalized to a
    statistical rule. The group stats come from ONE pass of exact
    decimal sums (sum, sum-of-squares); mean/sd are then derived with
    the same IEEE expression tree on both engines, so the >2sd
    threshold compares bit-identically without rounding. The stats
    relation is |event_type| rows — broadcast back onto the fact scan
    (no second shuffle of raw events; the final count re-aggregates by
    the same key)."""
    e = load_table(spark, sf_dir, "events")
    stats = (e.groupBy("event_type")
             .agg(F.count("*").alias("n"),
                  F.sum(F.col("value").cast(DEC)).cast("double").alias("s1"),
                  F.sum((F.col("value") * F.col("value")).cast(DEC))
                  .cast("double").alias("s2")))
    derived = stats.select(
        "event_type", "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
               / (F.col("n") - 1)).alias("sd"))
    flagged = e.join(F.broadcast(derived), "event_type")
    anom = ((F.col("value") > F.col("mean") + 2 * F.col("sd"))
            | (F.col("value") < F.col("mean") - 2 * F.col("sd")))
    return (flagged.groupBy("event_type", "n",
                            F.round("mean", 4).alias("mean_value"),
                            F.round("sd", 4).alias("sd_value"))
            .agg(F.count(F.when(anom, 1)).alias("n_anomalies")))


@query(
    "q_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey AS key, o_totalprice AS price
      FROM orders WHERE o_orderkey % 10 != 0
    ),
    new AS (
      SELECT o_orderkey AS key,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1000.0
                  ELSE o_totalprice END AS price
      FROM orders WHERE o_orderkey % 7 != 0
    ),
    classified AS (
      SELECT coalesce(old.key, new.key) AS key,
             CASE WHEN old.key IS NULL THEN 'added'
                  WHEN new.key IS NULL THEN 'removed'
                  WHEN old.price != new.price THEN 'changed'
                  ELSE 'unchanged' END AS change
      FROM old FULL OUTER JOIN new ON old.key = new.key
    )
    SELECT change, count(*) AS n,
           min(key) AS min_key, max(key) AS max_key
    FROM classified GROUP BY 1
    """,
)
def q_snapshot_diff(spark, sf_dir):
    """Snapshot diff / CDC classify: full-outer join of two table
    versions on the primary key, each row labeled added / removed /
    changed / unchanged — the change-data-capture primitive behind
    incremental syncs (the reference re-runs its whole load;
    diff-then-apply is the at-scale replacement). Key-partitioned
    full-outer hash join: one co-partitioned shuffle of (key, price),
    never full payloads."""
    o = load_table(spark, sf_dir, "orders")
    old = (o.filter(F.col("o_orderkey") % 10 != 0)
           .select(F.col("o_orderkey").alias("key"),
                   F.col("o_totalprice").alias("price")))
    new = (o.filter(F.col("o_orderkey") % 7 != 0)
           .select(F.col("o_orderkey").alias("key"),
                   F.when(F.col("o_orderkey") % 3 == 0,
                          F.col("o_totalprice") + 1000.0)
                   .otherwise(F.col("o_totalprice")).alias("price")))
    j = old.alias("o").join(new.alias("n"),
                            F.col("o.key") == F.col("n.key"), "full_outer")
    change = (F.when(F.col("o.key").isNull(), "added")
              .when(F.col("n.key").isNull(), "removed")
              .when(F.col("o.price") != F.col("n.price"), "changed")
              .otherwise("unchanged"))
    return (j.select(F.coalesce("o.key", "n.key").alias("key"),
                     change.alias("change"))
            .groupBy("change")
            .agg(F.count("*").alias("n"),
                 F.min("key").alias("min_key"),
                 F.max("key").alias("max_key")))


@query(
    "q_drift_psi",
    oracle="""
    WITH binned AS (
      SELECT least(9, cast(floor(value / 50.0) as bigint)) AS bucket,
             count(CASE WHEN event_id % 2 = 0 THEN 1 END) AS n_ref,
             count(CASE WHEN event_id % 2 = 1 THEN 1 END) AS n_cur
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM binned
    ),
    terms AS (
      SELECT bucket, n_ref, n_cur,
             cast(round(
               ((n_cur + 0.5) / (t_cur + 5.0) - (n_ref + 0.5) / (t_ref + 5.0))
               * ln(((n_cur + 0.5) / (t_cur + 5.0))
                    / ((n_ref + 0.5) / (t_ref + 5.0))), 6)
               as decimal(18,6)) AS term
      FROM binned CROSS JOIN tot
    )
    SELECT bucket, n_ref, n_cur,
           round(cast(term as double), 6) AS psi_term,
           cast(round(sum(term) OVER (), 4) as double) AS psi_total
    FROM terms
    """,
)
def q_drift_psi(spark, sf_dir):
    """Population-stability-index drift between two cohorts of the same
    stream (reference split = even event ids, current = odd): fixed-
    width binning, Laplace-smoothed proportions, per-bucket PSI term
    and the exact total. One pass bins BOTH cohorts (conditional
    counts — no second scan), the totals ride a 1-row broadcast, and
    the cross-bucket sum is decimal-exact so partition order can't
    perturb the hash. The per-bucket ln() is computed on identical
    IEEE doubles on both engines and rounded to 6dp before the exact
    summation."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.least(F.lit(9).cast("bigint"),
                     F.floor(F.col("value") / F.lit(50.0)))
    binned = (e.groupBy(bucket.alias("bucket"))
              .agg(F.count(F.when(F.col("event_id") % 2 == 0, 1))
                   .alias("n_ref"),
                   F.count(F.when(F.col("event_id") % 2 == 1, 1))
                   .alias("n_cur")))
    tot = binned.agg(F.sum("n_ref").alias("t_ref"),
                     F.sum("n_cur").alias("t_cur"))
    p_ref = (F.col("n_ref") + 0.5) / (F.col("t_ref") + 5.0)
    p_cur = (F.col("n_cur") + 0.5) / (F.col("t_cur") + 5.0)
    terms = (binned.crossJoin(F.broadcast(tot))
             .select("bucket", "n_ref", "n_cur",
                     F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6)
                     .cast("decimal(18,6)").alias("term")))
    return terms.select(
        "bucket", "n_ref", "n_cur",
        F.round(F.col("term").cast("double"), 6).alias("psi_term"),
        # round the DECIMAL sum, then cast: both engines round decimals
        # half-away-from-zero identically, while rounding the double
        # cast flips exact .00005 ties differently (the q_entropy
        # sf0.1 lesson — 6dp terms make such ties real)
        F.round(F.sum("term").over(
            W.partitionBy(F.lit(1))), 4).cast("double").alias("psi_total"))


@query(
    "q_minmax_scale",
    oracle="""
    WITH stats AS (
      SELECT o_orderpriority,
             min(o_totalprice) AS lo, max(o_totalprice) AS hi
      FROM orders GROUP BY 1
    )
    SELECT o.o_orderkey AS o_orderkey,
           o.o_orderpriority AS o_orderpriority,
           round((o.o_totalprice - s.lo) / (s.hi - s.lo), 6) AS scaled
    FROM orders o JOIN stats s ON o.o_orderpriority = s.o_orderpriority
    """,
)
def q_minmax_scale(spark, sf_dir):
    """Per-group min-max feature scaling to [0,1] — the normalization
    pass of a feature pipeline. min/max are exact doubles (no
    summation, so no reduction-order hazard); the scale expression is
    a per-row IEEE op, identical on both engines. Group stats are
    |groups| rows — broadcast back onto the fact scan, which therefore
    stays shuffle-free."""
    o = load_table(spark, sf_dir, "orders")
    stats = (o.groupBy("o_orderpriority")
             .agg(F.min("o_totalprice").alias("lo"),
                  F.max("o_totalprice").alias("hi")))
    return (o.join(F.broadcast(stats), "o_orderpriority")
            .select("o_orderkey", "o_orderpriority",
                    F.round((F.col("o_totalprice") - F.col("lo"))
                            / (F.col("hi") - F.col("lo")), 6)
                    .alias("scaled")))


@query(
    "q_entropy",
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    totals AS (
      SELECT user_id, cast(sum(cnt) as bigint) AS total
      FROM counts GROUP BY 1
    ),
    terms AS (
      SELECT c.user_id, t.total,
             cast(round(-(cast(c.cnt as double) / cast(t.total as double))
                        * ln(cast(c.cnt as double) / cast(t.total as double)),
                        6) as decimal(18,6)) AS term
      FROM counts c JOIN totals t ON c.user_id = t.user_id
    )
    SELECT user_id, max(total) AS n_events,
           cast(round(sum(term), 4) as double) AS entropy
    FROM terms GROUP BY 1
    """,
)
def q_entropy(spark, sf_dir):
    """Per-user Shannon entropy of the event-type mix — the diversity
    score used to spot bots (near-zero entropy) and noise (max
    entropy). Raw events collapse to (user, type) counts in one
    map-side-combinable pass; everything after operates on that
    |users|x|types| relation. The -p*ln(p) terms are rounded to 6dp
    then summed as exact decimals: reduction order cannot move the
    hash. The final 4dp round happens ON THE DECIMAL sum (both engines
    round decimals half-away-from-zero identically) — rounding the
    double cast instead flips exact .00005 ties differently (Spark
    HALF_UP on the decimal string vs DuckDB on the double), which a
    6dp-term sum hits in practice: found by the sf0.1 oracle sweep,
    user 535's sum landed exactly on 1.562450."""
    e = load_table(spark, sf_dir, "events")
    counts = (e.groupBy("user_id", "event_type")
              .agg(F.count("*").alias("cnt")))
    totals = counts.groupBy("user_id").agg(F.sum("cnt").alias("total"))
    p = F.col("cnt").cast("double") / F.col("total").cast("double")
    terms = (counts.join(totals, "user_id")
             .select("user_id", "total",
                     F.round(-p * F.log(p), 6).cast("decimal(18,6)")
                     .alias("term")))
    return (terms.groupBy("user_id")
            .agg(F.max("total").alias("n_events"),
                 F.round(F.sum("term"), 4).cast("double").alias("entropy")))


@query(
    "q_spatial_join",
    oracle="""
    WITH pts AS (
      SELECT c_custkey AS id,
             cast(cast(c_custkey % 997 as decimal(10,4)) / 10 as decimal(10,4))
               AS x,
             cast(cast((c_custkey * 31) % 1009 as decimal(10,4)) / 10
                  as decimal(10,4)) AS y
      FROM customer
    ),
    cells AS (
      SELECT id, x, y,
             cast(floor(x / 5.0) as bigint) AS cx,
             cast(floor(y / 5.0) as bigint) AS cy
      FROM pts
    )
    SELECT a.id AS id_a, c.id AS id_b,
           round(cast((a.x - c.x) * (a.x - c.x)
                      + (a.y - c.y) * (a.y - c.y) as double), 4) AS dist2
    FROM cells a JOIN cells c
      ON a.id < c.id
     AND c.cx BETWEEN a.cx - 1 AND a.cx + 1
     AND c.cy BETWEEN a.cy - 1 AND a.cy + 1
    WHERE (a.x - c.x) * (a.x - c.x) + (a.y - c.y) * (a.y - c.y)
          <= cast(4.0 as decimal(12,8))
    """,
)
def q_spatial_join(spark, sf_dir):
    """Grid-bucketed spatial neighbor join: points (synthesized as
    exact-decimal coordinates from customer keys) paired when within
    euclidean distance 2, found via 5x5-unit grid cells with 3x3
    neighbor-cell probing — the 2D generalization of the banded range
    join. The left side explodes each point to its 9 probe cells, so
    candidate generation is a pure EQUI-join on (cx, cy) (shuffle on
    cell ids, never all-pairs); the radius is at most one cell width,
    so probing adjacent cells is lossless, and each qualifying pair
    matches exactly one probe cell (its partner's own cell — no dedup
    pass). Coordinates and the distance predicate are exact decimal
    arithmetic, so the boundary compare cannot drift between
    engines."""
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") % 997).cast("decimal(10,4)") / F.lit(10))
        .cast("decimal(10,4)").alias("x"),
        (((F.col("c_custkey") * 31) % 1009).cast("decimal(10,4)") / F.lit(10))
        .cast("decimal(10,4)").alias("y"))
    cells = pts.select(
        "id", "x", "y",
        F.floor(F.col("x") / 5.0).alias("cx"),
        F.floor(F.col("y") / 5.0).alias("cy"))
    probes = (cells.withColumn("px", F.explode(F.array(
                  F.col("cx") - 1, F.col("cx"), F.col("cx") + 1)))
              .withColumn("py", F.explode(F.array(
                  F.col("cy") - 1, F.col("cy"), F.col("cy") + 1)))
              .select(F.col("id").alias("a_id"), F.col("x").alias("ax"),
                      F.col("y").alias("ay"), "px", "py"))
    dx = F.col("ax") - F.col("x")
    dy = F.col("ay") - F.col("y")
    dist2 = dx * dx + dy * dy
    return (probes.join(cells, (F.col("px") == F.col("cx"))
                        & (F.col("py") == F.col("cy"))
                        & (F.col("a_id") < F.col("id")))
            .filter(dist2 <= F.lit(4.0).cast("decimal(12,8)"))
            .select(F.col("a_id").alias("id_a"),
                    F.col("id").alias("id_b"),
                    F.round(dist2.cast("double"), 4).alias("dist2")))


# ---------------------------------------------------------------------------
# EWMA smoothing
# ---------------------------------------------------------------------------

_EWMA_K = 8
_EWMA_W = [0.9 ** k for k in range(_EWMA_K)]  # literal weights: both
# engines parse the SAME repr, so every product/sum is the same IEEE op


def _ewma_oracle() -> str:
    num = " + ".join(
        f"({w!r} * coalesce(lag(value, {k}) OVER w, 0.0))"
        for k, w in enumerate(_EWMA_W))
    den = " + ".join(
        f"(CASE WHEN rn > {k} THEN {w!r} ELSE 0.0 END)"
        for k, w in enumerate(_EWMA_W))
    return f"""
    WITH t AS (
      SELECT event_id, user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             ts
      FROM events
    )
    SELECT event_id, user_id, value,
           round(({num}) / ({den}), 6) AS ewma
    FROM t
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


@query("q_ewma_smooth", oracle=_ewma_oracle())
def q_ewma_smooth(spark, sf_dir):
    """Exponentially-weighted moving average per user stream — the
    denoising / trend primitive (pandas ``ewm(adjust=True)`` over a
    truncated K=8 horizon). The recursive form doesn't distribute; the
    truncated convolution does: K lag() terms over ONE per-user window
    (a single exchange, same as any per-user op), weights are shared
    float literals and the sum tree is identical text on both engines,
    so the IEEE result matches bit-for-bit before the final round(6).
    State per row is K scalars — independent of history length, so a
    1000-executor run over years of events pays only the keyed
    shuffle."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    e = load_table(spark, sf_dir, "events")
    t = e.select("event_id", "user_id", "value", "ts",
                 F.row_number().over(w).alias("rn"))
    num = None
    den = None
    for k, wt in enumerate(_EWMA_W):
        nterm = F.lit(wt) * F.coalesce(F.lag("value", k).over(w), F.lit(0.0))
        dterm = F.when(F.col("rn") > k, F.lit(wt)).otherwise(F.lit(0.0))
        num = nterm if num is None else num + nterm
        den = dterm if den is None else den + dterm
    return t.select("event_id", "user_id", "value",
                    F.round(num / den, 6).alias("ewma"))


@query(
    "q_outlier_iqr",
    oracle="""
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.75) AS q3
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.event_type, e.value,
           round(q.q1 - 1.5 * (q.q3 - q.q1), 4) + 0.0 AS lo_fence,
           round(q.q3 + 1.5 * (q.q3 - q.q1), 4) AS hi_fence
    FROM events e JOIN q ON e.event_type = q.event_type
    WHERE e.value < round(q.q1 - 1.5 * (q.q3 - q.q1), 6)
       OR e.value > round(q.q3 + 1.5 * (q.q3 - q.q1), 6)
    """,
)
def q_outlier_iqr(spark, sf_dir):
    """Tukey-fence (IQR) outlier detection per event type — the robust
    companion to q_anomaly_zscore (z-scores chase the mean; quartile
    fences don\'t move with the outliers themselves). Exact interpolated
    quartiles (Spark `percentile` == DuckDB `quantile_cont`, same
    p*(n-1) rank) are ONE per-type aggregate (a |event_type|-row
    relation) broadcast back onto the fact scan. The engines' midpoint
    formulas differ ((1-f)*lo+f*hi vs lo+f*(hi-lo)) and can diverge by
    1 ulp, so the DECLARED fence is the quartile expression rounded to
    6 dp — both engines compare against the same 6-dp fence and
    boundary rows classify identically (round-2 ADVICE item).
    At 100 TB: one keyed agg + one broadcast — the exact-percentile agg
    is the only sort, and it sorts per-type partitions, not globally."""
    e = load_table(spark, sf_dir, "events")
    q = (e.groupBy("event_type")
         .agg(F.expr("percentile(value, 0.25)").alias("q1"),
              F.expr("percentile(value, 0.75)").alias("q3")))
    j = e.join(F.broadcast(q), "event_type")
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (j.where((F.col("value") < F.round(lo, 6))
                    | (F.col("value") > F.round(hi, 6)))
            .select("event_id", "event_type", "value",
                    F.round(lo, 4).alias("lo_fence"),
                    F.round(hi, 4).alias("hi_fence")))


@query(
    "q_time_weighted_avg",
    oracle=f"""
    WITH seg AS (
      SELECT user_id, value,
             lead(value) OVER w AS v_next,
             epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           count(*) AS n_segments,
           cast((100 * sum((cast(cast(value as decimal(12,2)) * 100
                                 as bigint)
                            + cast(cast(v_next as decimal(12,2)) * 100
                                   as bigint)) * gap_us)
                 + sum(gap_us))
                // (2 * sum(gap_us)) as double) / 1e4 AS twa_value
    FROM seg WHERE gap_us IS NOT NULL AND gap_us > 0
    GROUP BY 1
    """,
)
def q_time_weighted_avg(spark, sf_dir):
    """Time-weighted average of `value` per user (trapezoidal rule over
    irregular samples) — the correct mean for unevenly-spaced telemetry,
    where the arithmetic mean over-weights bursts. One per-user window
    (lead) computes segment durations in integer microseconds; the
    weighted sum goes through exact decimal so partition order can't
    perturb the hash; the duration denominator is a pure integer sum.
    Zero-length segments (duplicate timestamps) are excluded on both
    engines. Scale: one keyed exchange for the window, one keyed agg —
    the same cost envelope as q_window_lag."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seg = e.select(
        "user_id", "value",
        F.lead("value").over(w).alias("v_next"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts"))
        .alias("gap_us"))
    # exact integer trapezoid (VERDICT r9 item 3): values are 2dp, so
    # the true summand is (v1c + v2c) * gap_us / 200 in cents —
    # accumulated as exact integers (decimal(38,0), never a double
    # product whose 10dp cast can't recover the lattice for large
    # gaps), and the 4dp mean rounds by integer DIV: with S = sum of
    # (v1c+v2c)*gap_us and G = sum(gap_us), twa = S/(200 G) and
    # round4 = (100 S + G) DIV (2 G) — values are nonnegative, so no
    # sign branch.
    return (seg.where(F.col("gap_us").isNotNull() & (F.col("gap_us") > 0))
            .groupBy("user_id")
            .agg(F.count("*").alias("n_segments"),
                 F.expr(
                     # the cents sum is cast to decimal BEFORE the
                     # gap multiply so the product itself is decimal —
                     # an int64 product would silently wrap for gaps
                     # beyond ~2^63/(2*max_cents) (r10 ADVICE)
                     "cast((100 * sum(cast("
                     "(cast(cast(value as decimal(12,2)) * 100 as bigint)"
                     " + cast(cast(v_next as decimal(12,2)) * 100"
                     "        as bigint)) as decimal(30,0)) * gap_us)"
                     " + sum(gap_us)) DIV (2 * sum(gap_us))"
                     " as double) / 1e4").alias("twa_value")))


@query(
    "q_rolling_median",
    oracle="""
    SELECT event_id, user_id,
           round(median(value) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN 6 PRECEDING
                                     AND CURRENT ROW), 4) AS med7
    FROM events
    """,
)
def q_rolling_median(spark, sf_dir):
    """Exact rolling median over a trailing 7-row frame per user — the
    robust smoother (median filters kill spikes that EWMA only damps;
    see q_ewma_smooth for the linear twin). Spark's exact `percentile`
    aggregate runs as a window function over the same rows-frame DuckDB
    gives `median`; both engines define the 0.5 quantile by linear
    interpolation, and a <=7-element median is either one element or
    the midpoint of two. Residual ulp risk (round-2 ADVICE, documented
    by choice): the midpoint formulas differ ((1-f)*lo+f*hi vs
    lo+f*(hi-lo)) and could land a median exactly on a round(.,4)
    half-boundary 1 ulp apart; there is no comparison step to pin to a
    declared precision here, so the risk is accepted and monitored by
    the oracle gate. Cost: the ONE per-user
    sort every windowed op pays; frame state is bounded (7 rows), so
    executor memory is O(frame), not O(partition)."""
    e = load_table(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-6, 0))
    return e.select(
        "event_id", "user_id",
        F.round(F.expr("percentile(value, 0.5)").over(w), 4).alias("med7"))


@query(
    "q_outlier_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
      FROM events GROUP BY 1
    ),
    mad AS (
      SELECT e.event_type,
             round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
      FROM events e JOIN med m ON e.event_type = m.event_type
      GROUP BY 1
    )
    SELECT e.event_id, e.event_type, e.value,
           round(m.med, 4) AS med, round(d.mad, 4) AS mad
    FROM events e
    JOIN med m ON e.event_type = m.event_type
    JOIN mad d ON e.event_type = d.event_type
    WHERE abs(0.6745 * (e.value - m.med)) > 3.5 * d.mad
    """,
)
def q_outlier_mad(spark, sf_dir):
    """Modified-z-score outliers (Iglewicz-Hoaglin: 0.6745·(x−med)/MAD,
    flag |z| > 3.5) — the robust companion to q_outlier_iqr with a
    breakdown point of 50% (the MAD doesn't move until half the data
    are outliers; quartile fences give up at 25%). Median and MAD are
    pinned to a DECLARED 6-dp precision before the comparison (the
    q_outlier_iqr ulp discipline: Spark and DuckDB interpolate medians
    with different midpoint formulas).

    Scale: two per-type exact-percentile aggregates (|event_type|-row
    relations, broadcast back — the second pass computes |x−med| which
    needs the first's result, inherent to MAD); the comparison is one
    more fact scan. At 100 TB swap percentile→percentile_approx
    (q_percentile_approx pattern) and the plan is unchanged."""
    e = load_table(spark, sf_dir, "events")
    med = (e.groupBy("event_type")
           .agg(F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")))
    j1 = e.join(F.broadcast(med), "event_type")
    mad = (j1.groupBy("event_type")
           .agg(F.round(F.expr(
               "percentile(abs(value - med), 0.5)"), 6).alias("mad")))
    return (j1.join(F.broadcast(mad), "event_type")
            .where(F.abs(0.6745 * (F.col("value") - F.col("med")))
                   > 3.5 * F.col("mad"))
            .select("event_id", "event_type", "value",
                    F.round("med", 4).alias("med"),
                    F.round("mad", 4).alias("mad")))


@query(
    "q_ks_drift",
    oracle="""
    WITH pv AS (
      SELECT event_type, value,
             count(CASE WHEN event_id % 2 = 0 THEN 1 END) AS n_e,
             count(CASE WHEN event_id % 2 = 1 THEN 1 END) AS n_o
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, value,
             sum(n_e) OVER w AS c_e, sum(n_o) OVER w AS c_o,
             sum(n_e) OVER t AS t_e, sum(n_o) OVER t AS t_o
      FROM pv
      WINDOW w AS (PARTITION BY event_type ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             t AS (PARTITION BY event_type)
    ),
    d AS (
      SELECT event_type, value,
             round(abs(cast(c_e as double) / t_e
                       - cast(c_o as double) / t_o), 6) AS diff
      FROM cum
    )
    SELECT event_type,
           max(diff) AS ks_stat,
           min(CASE WHEN diff = md THEN value END) AS ks_at_value
    FROM (SELECT *, max(diff) OVER (PARTITION BY event_type) AS md FROM d)
    GROUP BY event_type
    """,
)
def q_ks_drift(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov drift per event type (reference =
    even event ids, current = odd, the q_drift_psi cohort split): the
    KS statistic is the max absolute ECDF gap, with the value where the
    max occurs (min such value — deterministic argmax). Complements PSI
    with the binning-free distribution test.

    Scale: both cohort ECDFs come from ONE pass — conditional counts
    per (type, value), then a single per-type ordered window for the
    cumulative sums (the sort every ECDF needs, partitioned by type,
    never global). Integer cumulative counts are exact; the ratio diff
    is identical IEEE math on both engines, rounded 6dp before the
    max/argmax."""
    e = load_table(spark, sf_dir, "events")
    pv = (e.groupBy("event_type", "value")
          .agg(F.count(F.when(F.col("event_id") % 2 == 0, 1)).alias("n_e"),
               F.count(F.when(F.col("event_id") % 2 == 1, 1)).alias("n_o")))
    w = (W.partitionBy("event_type").orderBy("value")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    t = W.partitionBy("event_type")
    cum = pv.select(
        "event_type", "value",
        F.sum("n_e").over(w).alias("c_e"), F.sum("n_o").over(w).alias("c_o"),
        F.sum("n_e").over(t).alias("t_e"), F.sum("n_o").over(t).alias("t_o"))
    d = cum.select(
        "event_type", "value",
        F.round(F.abs(F.col("c_e").cast("double") / F.col("t_e")
                      - F.col("c_o").cast("double") / F.col("t_o")), 6)
        .alias("diff"))
    d = d.withColumn("md", F.max("diff").over(t))
    return (d.groupBy("event_type")
            .agg(F.max("diff").alias("ks_stat"),
                 F.min(F.when(F.col("diff") == F.col("md"),
                              F.col("value"))).alias("ks_at_value")))


# ---------------------------------------------------------------------------
# q_seasonal_decompose — additive trend / day-of-week / residual split
# ---------------------------------------------------------------------------


@query(
    "q_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT event_type, cast(ts as date) AS day, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    tr AS (
      SELECT event_type, day, n,
             CASE WHEN count(*) OVER w = 7
                  THEN cast(sum(n) OVER w as double) / 7 END AS trend
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
      SELECT event_type, day, n, trend,
             dayofweek(day) AS dow,
             n - trend AS detrended
      FROM tr WHERE trend IS NOT NULL
    ),
    seas AS (
      SELECT event_type, dow,
             cast(sum(cast(detrended as decimal(30,10))) as double)
               / count(*) AS seasonal
      FROM det GROUP BY 1, 2
    )
    SELECT d.event_type, cast(d.day as string) AS day, d.n,
           round(d.trend, 6) + 0.0 AS trend,
           round(s.seasonal, 6) + 0.0 AS seasonal,
           round(d.detrended - s.seasonal, 6) + 0.0 AS residual
    FROM det d JOIN seas s
      ON d.event_type = s.event_type AND d.dow = s.dow
    ORDER BY d.event_type, day
    """,
)
def q_seasonal_decompose(spark, sf_dir):
    """Additive seasonal decomposition (the STL shape, moving-average
    flavor): per event_type, daily counts split into a centered 7-day
    moving-average TREND (full windows only — edge days drop rather
    than emit a biased partial mean), a day-of-week SEASONAL profile
    (decimal-exact mean of the detrended series per dow), and the
    RESIDUAL — the decomposition every capacity-planning / anomaly
    pipeline runs before alerting on the residual (pair with
    q_anomaly_zscore on the residual column).

    Float discipline: daily counts are integers, the MA is one IEEE
    division of an integer sum, detrended values are identical doubles
    on both engines, and the per-dow mean reduces through decimal —
    so all three emitted components are bit-identical pre-round.

    Scale: one corpus-sized aggregation to daily grain, then all
    windows run over |types| x |days| rows — at 100 TB the heavy
    lifting is the first groupBy (map-side combined); the
    decomposition itself is dashboard-sized. DuckDB dayofweek ==
    Spark dayofweek modulo the 1-vs-0 base, handled by matching
    dayofweek() to Spark's dayofweek() - 1... both engines here use
    the grouping VALUE only as a join key, so any consistent per-
    engine encoding works — no cross-engine dow constant is ever
    compared."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy("event_type",
                       F.col("ts").cast("date").alias("day"))
             .agg(F.count("*").alias("n")))
    w = (W.partitionBy("event_type").orderBy("day")
         .rowsBetween(-3, 3))
    tr = daily.select(
        "event_type", "day", "n",
        F.when(F.count("*").over(w) == 7,
               F.sum("n").over(w).cast("double") / 7).alias("trend"))
    det = (tr.filter(F.col("trend").isNotNull())
           .withColumn("dow", F.dayofweek("day"))
           .withColumn("detrended", F.col("n") - F.col("trend")))
    seas = (det.groupBy("event_type", "dow")
            .agg((F.sum(F.col("detrended").cast("decimal(30,10)"))
                  .cast("double") / F.count("*")).alias("seasonal")))
    return (det.join(seas, ["event_type", "dow"])
            .select("event_type",
                    F.col("day").cast("string").alias("day"), "n",
                    (F.round("trend", 6) + 0.0).alias("trend"),
                    (F.round("seasonal", 6) + 0.0).alias("seasonal"),
                    (F.round(F.col("detrended") - F.col("seasonal"), 6)
                     + 0.0).alias("residual"))
            .orderBy("event_type", "day"))


# ---------------------------------------------------------------------------
# Nonparametric trend & rank-correlation trio: Mann-Kendall, Theil-Sen,
# Kendall tau-b — all over the bounded daily relation, so every pair
# join is days², never corpus-sized.
# ---------------------------------------------------------------------------

_MK_ORACLE = """
WITH daily AS (
  SELECT event_type, cast(ts as date) AS d, cast(count(*) as bigint) AS x
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type,
         CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
),
s AS (
  SELECT event_type, cast(sum(sgn) as bigint) AS s_stat
  FROM pairs GROUP BY 1
),
ties AS (
  SELECT event_type,
         cast(sum(t * (t - 1) * (2 * t + 5)) as bigint) AS tie_term
  FROM (SELECT event_type, x, count(*) AS t FROM daily GROUP BY 1, 2)
  GROUP BY 1
),
nn AS (
  SELECT event_type, cast(count(*) as bigint) AS n FROM daily GROUP BY 1
)
SELECT s.event_type, nn.n, s.s_stat,
       cast(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term
            as bigint) AS var18,
       round(CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                  WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                  ELSE 0 END
             / sqrt((nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term)
                    / 18.0), 4) + 0.0 AS z_score,
       CASE WHEN s.s_stat > 0 THEN 'increasing'
            WHEN s.s_stat < 0 THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM s JOIN ties USING (event_type) JOIN nn USING (event_type)
ORDER BY event_type
"""


@query("q_mann_kendall", oracle=_MK_ORACLE)
def q_mann_kendall(spark, sf_dir):
    """Mann-Kendall trend test per event type's daily count series:
    S = sum of pairwise signs (exact integer), tie-corrected variance
    reported as the integer numerator var18 = 18*Var(S), and the
    continuity-corrected z — the standard monotone-trend detector for
    ingest monitoring, beside q_ks_drift (distributional) and
    q_anomaly_zscore (pointwise). Everything is integer until the one
    final sqrt (round 4, sign-of-zero guarded).

    Scale: the fact scan collapses to the (type, day) relation first;
    the sign join is days² per type — bounded by the calendar, not the
    corpus, the same license as q_acf's lag windows."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").cast("long").alias("x"))
             .persist())
    a, b = daily.alias("a"), daily.alias("b")
    sgn = (F.when(F.col("b.x") > F.col("a.x"), 1)
           .when(F.col("b.x") < F.col("a.x"), -1).otherwise(0))
    s = (a.join(b, (F.col("a.event_type") == F.col("b.event_type"))
                & (F.col("a.d") < F.col("b.d")))
         .groupBy(F.col("a.event_type").alias("event_type"))
         .agg(F.sum(sgn).cast("long").alias("s_stat")))
    t = F.col("t")
    ties = (daily.groupBy("event_type", "x").agg(F.count("*").alias("t"))
            .groupBy("event_type")
            .agg(F.sum(t * (t - 1) * (2 * t + 5)).cast("long")
                 .alias("tie_term")))
    nn = daily.groupBy("event_type").agg(F.count("*").cast("long")
                                         .alias("n"))
    j = s.join(ties, "event_type").join(nn, "event_type")
    var18 = (F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
             - F.col("tie_term"))
    corrected = (F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
                 .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
                 .otherwise(0))
    return (j.select(
        "event_type", "n", "s_stat",
        var18.cast("long").alias("var18"),
        (F.round(corrected / F.sqrt(var18 / 18.0), 4) + 0.0)
        .alias("z_score"),
        F.when(F.col("s_stat") > 0, "increasing")
        .when(F.col("s_stat") < 0, "decreasing")
        .otherwise("no_trend").alias("trend"))
        .orderBy("event_type"))


_KT_ORACLE = """
WITH daily AS (
  SELECT cast(ts as date) AS d,
         cast(count(*) FILTER (event_type = 'click') as bigint) AS x,
         cast(count(*) FILTER (event_type = 'purchase') as bigint) AS y
  FROM events GROUP BY 1
),
pairs AS (
  SELECT CASE WHEN (b.x - a.x) * (b.y - a.y) > 0 THEN 1 ELSE 0 END AS con,
         CASE WHEN (b.x - a.x) * (b.y - a.y) < 0 THEN 1 ELSE 0 END AS dis,
         CASE WHEN b.x = a.x AND b.y <> a.y THEN 1 ELSE 0 END AS tx,
         CASE WHEN b.y = a.y AND b.x <> a.x THEN 1 ELSE 0 END AS ty
  FROM daily a JOIN daily b ON a.d < b.d
)
SELECT (SELECT cast(count(*) as bigint) FROM daily) AS n_days,
       cast(sum(con) as bigint) AS concordant,
       cast(sum(dis) as bigint) AS discordant,
       cast(sum(tx) as bigint) AS ties_x,
       cast(sum(ty) as bigint) AS ties_y,
       round((sum(con) - sum(dis))
             / sqrt((sum(con) + sum(dis) + sum(tx)) * 1.0
                    * (sum(con) + sum(dis) + sum(ty))), 6) + 0.0 AS tau_b
FROM pairs
"""


@query("q_kendall_tau", oracle=_KT_ORACLE)
def q_kendall_tau(spark, sf_dir):
    """Kendall tau-b rank correlation between the daily click and
    purchase count series — the robust monotone-association measure
    (Pearson assumes linearity, q_mannwhitney_u compares two samples;
    tau asks "do the two SERIES move together"). Concordant /
    discordant / tie pair counts are exact integers; tau-b is one
    sqrt over integer products (round 6, sign-of-zero guarded).

    Scale: days² pair join over the calendar-bounded daily relation;
    the corpus is touched once by the pivot aggregate."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy(F.col("ts").cast("date").alias("d"))
             .agg(F.sum(F.when(F.col("event_type") == "click", 1)
                        .otherwise(0)).cast("long").alias("x"),
                  F.sum(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).cast("long").alias("y"))
             .persist())
    a, b = daily.alias("a"), daily.alias("b")
    dx = F.col("b.x") - F.col("a.x")
    dy = F.col("b.y") - F.col("a.y")
    pairs = (a.join(b, F.col("a.d") < F.col("b.d"))
             .select(F.when(dx * dy > 0, 1).otherwise(0).alias("con"),
                     F.when(dx * dy < 0, 1).otherwise(0).alias("dis"),
                     F.when((dx == 0) & (dy != 0), 1).otherwise(0)
                     .alias("tx"),
                     F.when((dy == 0) & (dx != 0), 1).otherwise(0)
                     .alias("ty")))
    n_days = daily.count()
    return pairs.agg(
        F.lit(n_days).cast("long").alias("n_days"),
        F.sum("con").cast("long").alias("concordant"),
        F.sum("dis").cast("long").alias("discordant"),
        F.sum("tx").cast("long").alias("ties_x"),
        F.sum("ty").cast("long").alias("ties_y"),
        (F.round((F.sum("con") - F.sum("dis"))
                 / F.sqrt((F.sum("con") + F.sum("dis") + F.sum("tx"))
                          * 1.0
                          * (F.sum("con") + F.sum("dis") + F.sum("ty"))),
                 6) + 0.0).alias("tau_b"))


_TS_ORACLE = """
WITH daily AS (
  SELECT event_type, cast(ts as date) AS d, cast(count(*) as bigint) AS x
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type ORDER BY d) AS i
  FROM daily
),
slopes AS (
  SELECT a.event_type,
         (b.x - a.x) / cast(b.i - a.i as double) AS m
  FROM idx a JOIN idx b
    ON a.event_type = b.event_type AND a.i < b.i
),
ranked AS (
  SELECT event_type, m,
         row_number() OVER (PARTITION BY event_type ORDER BY m) AS r,
         count(*) OVER (PARTITION BY event_type) AS np
  FROM slopes
)
SELECT event_type, cast(max(np) as bigint) AS n_pairs,
       round(cast(sum(CASE WHEN r * 2 IN (np, np + 1, np + 2)
                           THEN m END) as double)
             / count(CASE WHEN r * 2 IN (np, np + 1, np + 2)
                          THEN 1 END), 6) + 0.0 AS sen_slope
FROM ranked GROUP BY event_type ORDER BY event_type
"""


@query("q_theil_sen", oracle=_TS_ORACLE)
def q_theil_sen(spark, sf_dir):
    """Theil-Sen robust trend slope per event type: the median of all
    pairwise day-index slopes — the estimator that shrugs off the
    outlier days that wreck an OLS fit (q_ols_regression is the
    parametric sibling; q_mann_kendall tests the trend this
    estimates). Median = mean of the middle-rank slopes (r*2 in
    {np, np+1, np+2} covers both parities without branching); each
    slope is one IEEE division of exact integers, so ordering and the
    median are deterministic.

    Scale: slopes are days²-per-type over the calendar-bounded daily
    relation; the median is a window rank over that bounded set. At
    the fact level nothing beyond the initial aggregate ever scans."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").cast("long").alias("x")))
    idx = daily.select(
        "event_type", "x",
        F.row_number().over(
            W.partitionBy("event_type").orderBy("d")).alias("i"))
    a, b = idx.alias("a"), idx.alias("b")
    slopes = (a.join(b, (F.col("a.event_type") == F.col("b.event_type"))
                     & (F.col("a.i") < F.col("b.i")))
              .select(F.col("a.event_type").alias("event_type"),
                      ((F.col("b.x") - F.col("a.x"))
                       / (F.col("b.i") - F.col("a.i")).cast("double"))
                      .alias("m")))
    ranked = slopes.select(
        "event_type", "m",
        F.row_number().over(
            W.partitionBy("event_type").orderBy("m")).alias("r"),
        F.count("*").over(W.partitionBy("event_type")).alias("np"))
    mid = (F.col("r") * 2).isin(F.col("np"), F.col("np") + 1,
                                F.col("np") + 2)
    return (ranked.groupBy("event_type")
            .agg(F.max("np").cast("long").alias("n_pairs"),
                 (F.round(F.sum(F.when(mid, F.col("m"))).cast("double")
                          / F.count(F.when(mid, F.lit(1))), 6) + 0.0)
                 .alias("sen_slope"))
            .orderBy("event_type"))


_SPEARMAN_ORACLE = """
WITH daily AS (
  SELECT cast(ts as date) AS d,
         cast(count(*) FILTER (event_type = 'click') as bigint) AS x,
         cast(count(*) FILTER (event_type = 'purchase') as bigint) AS y
  FROM events GROUP BY 1
),
rk AS (
  SELECT d,
         2 * rank() OVER (ORDER BY x)
           + count(*) OVER (PARTITION BY x) - 1 AS rx2,
         2 * rank() OVER (ORDER BY y)
           + count(*) OVER (PARTITION BY y) - 1 AS ry2
  FROM daily
),
s AS (
  SELECT cast(count(*) as bigint) AS n,
         cast(sum(rx2) as bigint) AS sx,
         cast(sum(ry2) as bigint) AS sy,
         cast(sum(rx2 * ry2) as bigint) AS sxy,
         cast(sum(rx2 * rx2) as bigint) AS sxx,
         cast(sum(ry2 * ry2) as bigint) AS syy
  FROM rk
)
SELECT n,
       round((n * sxy - sx * sy)
             / sqrt(cast(n * sxx - sx * sx as double)
                    * cast(n * syy - sy * sy as double)), 6) + 0.0
         AS spearman_rho
FROM s
"""


@query("q_spearman_corr", oracle=_SPEARMAN_ORACLE)
def q_spearman_corr(spark, sf_dir):
    """Spearman rank correlation between the daily click and purchase
    series: Pearson over tie-averaged ranks, carried as DOUBLED ranks
    (2*min_rank + tie_count - 1, always integer — the q_mannwhitney_u
    device), so all five sufficient statistics are exact bigints and
    the only float ops are the final sqrt and division (round 6,
    sign-of-zero guarded). Completes the correlation ladder: Pearson
    (q_rolling_corr) for linear, Kendall (q_kendall_tau) for pair
    concordance, Spearman for monotone rank association.

    Scale: one fact-scan pivot to the calendar-bounded daily relation,
    two rank windows over it, one scalar reduce."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy(F.col("ts").cast("date").alias("d"))
             .agg(F.sum(F.when(F.col("event_type") == "click", 1)
                        .otherwise(0)).cast("long").alias("x"),
                  F.sum(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).cast("long").alias("y")))
    rx2 = (2 * F.rank().over(W.orderBy("x"))
           + F.count("*").over(W.partitionBy("x")) - 1)
    ry2 = (2 * F.rank().over(W.orderBy("y"))
           + F.count("*").over(W.partitionBy("y")) - 1)
    rk = daily.select(rx2.alias("rx2"), ry2.alias("ry2"))
    s = rk.agg(F.count("*").cast("long").alias("n"),
               F.sum("rx2").cast("long").alias("sx"),
               F.sum("ry2").cast("long").alias("sy"),
               F.sum(F.col("rx2") * F.col("ry2")).cast("long")
               .alias("sxy"),
               F.sum(F.col("rx2") * F.col("rx2")).cast("long")
               .alias("sxx"),
               F.sum(F.col("ry2") * F.col("ry2")).cast("long")
               .alias("syy"))
    rho = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
           / F.sqrt((F.col("n") * F.col("sxx")
                     - F.col("sx") * F.col("sx")).cast("double")
                    * (F.col("n") * F.col("syy")
                       - F.col("sy") * F.col("sy")).cast("double")))
    return s.select("n", (F.round(rho, 6) + 0.0).alias("spearman_rho"))


# ---------------------------------------------------------------------------
# q_dtw_distance — dynamic time warping between daily series (exact int DP)
# ---------------------------------------------------------------------------

_DTW_LEN = 12          # 12-day prefix of each series (exists at every sf)
_DTW_BIG = 1 << 60


def _dtw_oracle() -> str:
    """Unrolled anti-diagonal DP: diagonal k holds cells i+j=k, each
    needing (i-1,j) and (i,j-1) from diagonal k-1 and (i-1,j-1) from
    k-2 — so a chain of per-diagonal CTEs (the HITS/NMF unrolling
    discipline) replays the exact integer recursion SQL-side."""
    L, BIG = _DTW_LEN, _DTW_BIG
    steps = []
    for k in range(3, 2 * L + 1):
        # diagonal k-2 doesn't exist at k=3 (no valid (i-1,j-1) cells);
        # join g2 there instead — its only cell (1,1) can never match
        # (i-1,j-1) of a k=3 cell, so pc stays NULL -> coalesce(BIG)
        kk2 = max(k - 2, 2)
        steps.append(f""",
g{k} AS MATERIALIZED (
  SELECT sa.pair_id, sa.i, sb.j,
         abs(sa.x - sb.x) + least(
           coalesce(pa.c, {BIG}), coalesce(pb.c, {BIG}),
           coalesce(pc.c, {BIG})) AS c
  FROM sa JOIN sb ON sb.pair_id = sa.pair_id AND sa.i + sb.j = {k}
  LEFT JOIN g{k - 1} pa ON pa.pair_id = sa.pair_id
        AND pa.i = sa.i - 1 AND pa.j = sb.j
  LEFT JOIN g{k - 1} pb ON pb.pair_id = sa.pair_id
        AND pb.i = sa.i AND pb.j = sb.j - 1
  LEFT JOIN g{kk2} pc ON pc.pair_id = sa.pair_id
        AND pc.i = sa.i - 1 AND pc.j = sb.j - 1
)""")
    return f"""
WITH ranked AS (
  SELECT event_type,
         dense_rank() OVER (ORDER BY event_type) AS rk
  FROM (SELECT DISTINCT event_type FROM events)
),
t3 AS (SELECT event_type, rk FROM ranked WHERE rk <= 3),
pairs AS (
  SELECT a.rk * 10 + b.rk AS pair_id,
         a.event_type AS ta, b.event_type AS tb
  FROM t3 a JOIN t3 b ON a.rk < b.rk
),
daily AS (
  SELECT event_type, cast(ts as date) AS d,
         cast(count(*) as bigint) AS x
  FROM events GROUP BY 1, 2
),
ser AS (
  SELECT event_type, i, x FROM (
    SELECT event_type, x,
           row_number() OVER (PARTITION BY event_type ORDER BY d) AS i
    FROM daily
  ) WHERE i <= {L}
),
sa AS MATERIALIZED (
  SELECT p.pair_id, s.i, s.x FROM pairs p
  JOIN ser s ON s.event_type = p.ta
),
sb AS MATERIALIZED (
  SELECT p.pair_id, s.i AS j, s.x FROM pairs p
  JOIN ser s ON s.event_type = p.tb
),
g2 AS MATERIALIZED (
  SELECT sa.pair_id, sa.i, sb.j, abs(sa.x - sb.x) AS c
  FROM sa JOIN sb ON sb.pair_id = sa.pair_id
  WHERE sa.i = 1 AND sb.j = 1
){''.join(steps)}
SELECT p.ta AS type_a, p.tb AS type_b, g.c AS dtw
FROM g{2 * L} g JOIN pairs p ON p.pair_id = g.pair_id
WHERE g.i = {L} AND g.j = {L}
ORDER BY type_a, type_b
"""


@query("q_dtw_distance", oracle=_dtw_oracle())
def q_dtw_distance(spark, sf_dir):
    """Dynamic time warping distance between the 12-day daily-count
    series of the first three event types (all three pairs): the
    elastic alignment metric behind series clustering, template
    matching and near-duplicate sequence detection, where Euclidean
    distance fails on phase-shifted patterns. The DP runs per pair
    in applyInPandas (the declared python surface for sequential
    recursions, exactly q_burst_detect's shape) on all-integer |a-b|
    costs, so the distance is int64-exact; the oracle replays the
    recursion as 23 unrolled anti-diagonal CTEs and hash-matches.

    Scale: the fact scan collapses to |types| x |days| rows before
    anything quadratic; each pandas group sees one bounded (L=12)
    pair, and P pairs parallelize as P independent groups. For long
    series this operator takes a Sakoe-Chiba band parameter; the
    bounded-prefix contract here is the honest fixed-cost form."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events")
    types = (e.select("event_type").distinct()
             .select("event_type",
                     F.dense_rank().over(
                         W.orderBy("event_type")).alias("rk"))
             .filter(F.col("rk") <= 3))
    ta = types.select(F.col("event_type").alias("ta"),
                      F.col("rk").alias("ra"))
    tb = types.select(F.col("event_type").alias("tb"),
                      F.col("rk").alias("rb"))
    pairs = (ta.join(tb, F.col("ra") < F.col("rb"))
             .select((F.col("ra") * 10 + F.col("rb")).alias("pair_id"),
                     "ta", "tb"))
    daily = (e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").cast("long").alias("x")))
    ser = (daily.select(
        "event_type", "x",
        F.row_number().over(
            W.partitionBy("event_type").orderBy("d")).alias("i"))
        .filter(F.col("i") <= _DTW_LEN))
    sa = (pairs.join(ser, ser.event_type == pairs.ta)
          .select("pair_id", "ta", "tb", "i", F.col("x").alias("ax")))
    sb = (pairs.join(ser, ser.event_type == pairs.tb)
          .select(F.col("pair_id").alias("pb_id"), "i",
                  F.col("x").alias("bx")))
    aligned = sa.join(sb, (F.col("pb_id") == F.col("pair_id"))
                      & (sa.i == sb.i)).select(
        "pair_id", "ta", "tb", sa.i.alias("idx"), "ax", "bx")

    schema = "type_a string, type_b string, dtw long"

    def dp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("idx")
        a = pdf.ax.to_numpy()
        b = pdf.bx.to_numpy()
        n = len(a)
        big = _DTW_BIG
        prev = [big] * (n + 1)
        for i in range(1, n + 1):
            cur = [big] * (n + 1)
            for j in range(1, n + 1):
                c = abs(int(a[i - 1]) - int(b[j - 1]))
                if i == 1 and j == 1:
                    cur[j] = c
                else:
                    cur[j] = c + min(prev[j], cur[j - 1], prev[j - 1])
            prev = cur
        return pd.DataFrame(
            [(pdf.ta.iloc[0], pdf.tb.iloc[0], int(prev[n]))],
            columns=["type_a", "type_b", "dtw"])

    return (aligned.groupBy("pair_id").applyInPandas(dp, schema)
            .orderBy("type_a", "type_b"))


# ---------------------------------------------------------------------------
# q_holtwinters — additive Holt-Winters with weekly seasonality
# ---------------------------------------------------------------------------

# One recursive SQL text executed verbatim by BOTH engines (the
# q_holt_smoothing discipline): the 9-column state (level, trend,
# 7-slot seasonal queue) at t is a declared-6dp function of the state
# at t-1, so the recursion is bit-identical everywhere. newlvl must be
# inlined wherever it feeds trend/seasonal updates — recursive SELECTs
# cannot reference their own computed columns laterally.
_HW_NEWLVL = ("cast(round(cast('0.3' as decimal(2,1)) * (s.x - h.s1)"
              " + cast('0.7' as decimal(2,1)) * (h.lvl + h.trd), 6)"
              " as decimal(20,6))")
_HW_SQL = f"""
WITH RECURSIVE daily AS (
  SELECT cast(ts as date) AS d, count(*) AS x
  FROM events GROUP BY cast(ts as date)
),
idx AS (
  SELECT row_number() OVER (ORDER BY d) AS t,
         cast(d as string) AS day,
         cast(x as decimal(20,6)) AS x
  FROM daily
),
hw AS (
  SELECT t, day, x,
         x AS lvl,
         cast(0 as decimal(20,6)) AS trd,
         cast(0 as decimal(20,6)) AS s1, cast(0 as decimal(20,6)) AS s2,
         cast(0 as decimal(20,6)) AS s3, cast(0 as decimal(20,6)) AS s4,
         cast(0 as decimal(20,6)) AS s5, cast(0 as decimal(20,6)) AS s6,
         cast(0 as decimal(20,6)) AS s7
  FROM idx WHERE t = 1
  UNION ALL
  SELECT s.t, s.day, s.x,
         {_HW_NEWLVL} AS lvl,
         cast(round(cast('0.1' as decimal(2,1))
                    * ({_HW_NEWLVL} - h.lvl)
                    + cast('0.9' as decimal(2,1)) * h.trd, 6)
              as decimal(20,6)) AS trd,
         h.s2 AS s1, h.s3 AS s2, h.s4 AS s3, h.s5 AS s4,
         h.s6 AS s5, h.s7 AS s6,
         cast(round(cast('0.2' as decimal(2,1))
                    * (s.x - {_HW_NEWLVL})
                    + cast('0.8' as decimal(2,1)) * h.s1, 6)
              as decimal(20,6)) AS s7
  FROM hw h JOIN idx s ON s.t = h.t + 1
)
SELECT t, day, cast(x as double) + 0.0 AS x,
       cast(lvl as double) AS lvl,
       cast(trd as double) + 0.0 AS trd,
       cast(s7 as double) + 0.0 AS season_new,
       cast(cast(lvl + trd + s1 as decimal(20,6)) as double) + 0.0
         AS forecast_next
FROM hw
ORDER BY t DESC
LIMIT 10
"""
# EXACT DECIMAL recursion (round 8, the q_holt_smoothing fix applied
# to the triple smoother): round(double, 6) put one step in ten
# exactly on the 6dp half boundary where the engines' double rounding
# disagrees — decimal(2,1) literals and decimal(20,6) state make every
# step exact decimal HALF_UP on both engines. Outputs cast to double
# at the edge (trailing-zero decimal rendering differs between
# engines' canonicalizers).


@query("q_holtwinters", oracle=_HW_SQL)
def q_holtwinters(spark, sf_dir):
    """Additive Holt-Winters triple exponential smoothing (alpha=0.3,
    beta=0.1, gamma=0.2, season length 7) over the daily event-count
    series: level and trend as in q_holt_smoothing plus a rotating
    7-slot seasonal queue, so the one-step forecast lvl + trd + s_next
    carries the day-of-week shape — the full seasonal forecaster the
    capacity-planning ladder (ewma -> holt -> holt-winters) tops out
    at. Cold-start seasonals are zero (the recursion warms them over
    the first weeks), documented rather than hidden. Emits the last
    10 days' state and forecast; every rounded output carries + 0.0
    (DuckDB round() preserves -0.0, Spark's BigDecimal never emits
    it).

    Scale: identical to q_holt_smoothing — the recursion runs on the
    |days|-sized rollup after one map-side-combined aggregation;
    per-entity seasonality maps the same 9-column recursion over a
    keyed series."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_HW_SQL)


# ---------------------------------------------------------------------------
# q_spatial_knn — k-nearest-neighbor probe over synthesized points
# ---------------------------------------------------------------------------


@query(
    "q_spatial_knn",
    oracle="""
    WITH pts AS (
      SELECT c_custkey AS id,
             cast(cast(c_custkey % 997 as decimal(10,4)) / 10
                  as decimal(10,4)) AS x,
             cast(cast((c_custkey * 31) % 1009 as decimal(10,4)) / 10
                  as decimal(10,4)) AS y
      FROM customer
    ),
    probes AS (
      SELECT s_suppkey AS probe_id,
             cast(cast(s_suppkey * 13 % 997 as decimal(10,4)) / 10
                  as decimal(10,4)) AS px,
             cast(cast(s_suppkey * 41 % 1009 as decimal(10,4)) / 10
                  as decimal(10,4)) AS py
      FROM supplier WHERE s_suppkey < 8
    ),
    scored AS (
      SELECT p.probe_id, t.id,
             (t.x - p.px) * (t.x - p.px)
               + (t.y - p.py) * (t.y - p.py) AS d2
      FROM probes p CROSS JOIN pts t
    ),
    ranked AS (
      SELECT probe_id, id, d2,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY d2, id) AS rk
      FROM scored
    )
    SELECT probe_id, rk, id,
           round(cast(d2 as double), 4) AS dist2
    FROM ranked WHERE rk <= 3
    ORDER BY probe_id, rk
    """,
)
def q_spatial_knn(spark, sf_dir):
    """Spatial k-nearest-neighbor probe: for each of 8 query points
    (supplier-key-synthesized exact-decimal coordinates, the
    q_spatial_join family), the 3 closest customer points by squared
    euclidean distance with (d2, id) tie-break. Distances are exact
    decimal products, so the top-3 cut is engine-identical — the
    geo-retrieval twin of q_similarity_topk (embedding space ->
    coordinate space).

    Scale: probes broadcast over one corpus scan; per-probe top-k is
    TakeOrderedAndProject via the rank window (partitions = probes),
    never a global sort. For probe sets beyond broadcast size, the
    q_spatial_join grid (cell equi-join + expanding-ring probing)
    replaces the scan — this query is the exact-verification tier
    above it."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") % 997).cast("decimal(10,4)") / F.lit(10))
        .cast("decimal(10,4)").alias("x"),
        (((F.col("c_custkey") * 31) % 1009).cast("decimal(10,4)")
         / F.lit(10)).cast("decimal(10,4)").alias("y"))
    probes = (s.filter(F.col("s_suppkey") < 8)
              .select(F.col("s_suppkey").alias("probe_id"),
                      ((F.col("s_suppkey") * 13 % 997)
                       .cast("decimal(10,4)") / F.lit(10))
                      .cast("decimal(10,4)").alias("px"),
                      ((F.col("s_suppkey") * 41 % 1009)
                       .cast("decimal(10,4)") / F.lit(10))
                      .cast("decimal(10,4)").alias("py")))
    dx = F.col("x") - F.col("px")
    dy = F.col("y") - F.col("py")
    d2 = (dx * dx + dy * dy).alias("d2")
    scored = pts.crossJoin(F.broadcast(probes)).select(
        "probe_id", "id", d2)
    rk = F.row_number().over(
        W.partitionBy("probe_id").orderBy("d2", "id"))
    return (scored.withColumn("rk", rk).filter(F.col("rk") <= 3)
            .select("probe_id", "rk", "id",
                    F.round(F.col("d2").cast("double"), 4)
                    .alias("dist2"))
            .orderBy("probe_id", "rk"))


# ---------------------------------------------------------------------------
# q_haar_wavelet — unnormalized Haar decomposition of the daily series
# ---------------------------------------------------------------------------

_HAAR_LEVELS = 5          # 32 = 2^5 padded positions


def _haar_oracle() -> str:
    steps = []
    for lv in range(1, _HAAR_LEVELS + 1):
        steps.append(f""",
lvl{lv} AS MATERIALIZED (
  SELECT (i + 1) // 2 AS i,
         cast(sum(x) as bigint) AS x,
         cast(sum(CASE WHEN i % 2 = 1 THEN x ELSE -x END) as bigint)
           AS d
  FROM lvl{lv - 1} GROUP BY (i + 1) // 2
)""")
    union = "\n  UNION ALL\n  ".join(
        f"SELECT {lv} AS level, i AS idx, 'detail' AS kind, d AS coef "
        f"FROM lvl{lv}" for lv in range(1, _HAAR_LEVELS + 1))
    return f"""
WITH daily AS (
  SELECT cast(ts as date) AS d, cast(count(*) as bigint) AS x
  FROM events GROUP BY 1
),
idx AS (
  SELECT row_number() OVER (ORDER BY d) AS i, x FROM daily
),
lvl0 AS MATERIALIZED (
  SELECT g.i, coalesce(idx.x, 0) AS x
  FROM generate_series(1, 32) g(i)
  LEFT JOIN idx ON idx.i = g.i
){''.join(steps)}
SELECT level, idx, kind, coef FROM (
  {union}
  UNION ALL
  SELECT {_HAAR_LEVELS}, 1, 'approx', x FROM lvl{_HAAR_LEVELS}
) ORDER BY level, kind, idx
"""


@query("q_haar_wavelet", oracle=_haar_oracle())
def q_haar_wavelet(spark, sf_dir):
    """Full unnormalized Haar wavelet decomposition of the daily
    event-count series (zero-padded to 32 positions): 5 levels of
    pairwise sums (approximation) and differences (detail), emitting
    all 31 detail coefficients plus the coarsest approximation (= the
    series total). The multi-resolution feature extractor behind
    series compression, burst localization (large |detail| at level
    l ~ change at 2^l-day scale) and wavelet-domain similarity; the
    unnormalized integer form (no /sqrt(2)) keeps every coefficient
    int64-exact, so the whole transform hash-matches the oracle's
    chained per-level CTEs.

    Scale: the scan collapses to |days| rows first; each level is a
    group-by on i//2 over a halving relation (32 -> 16 -> ... -> 1
    rows). Per-entity wavelets at 100 TB map the same 5 group-bys
    partitioned by key — every level stays map-side combinable."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy(F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").cast("long").alias("x")))
    idx = daily.select(
        F.row_number().over(W.orderBy("d")).alias("i"), "x")
    pad = spark.range(1, 33).select(F.col("id").cast("int").alias("i"))
    lvl = (pad.join(idx, "i", "left")
           .select("i", F.coalesce(F.col("x"), F.lit(0)).alias("x")))
    out = None
    for lv in range(1, _HAAR_LEVELS + 1):
        nxt = (lvl.groupBy(((F.col("i") + 1) / 2).cast("long")
                           .alias("i"))
               .agg(F.sum("x").alias("x"),
                    F.sum(F.when(F.col("i") % 2 == 1, F.col("x"))
                          .otherwise(-F.col("x"))).alias("d")))
        det = nxt.select(F.lit(lv).alias("level"),
                         F.col("i").alias("idx"),
                         F.lit("detail").alias("kind"),
                         F.col("d").alias("coef"))
        out = det if out is None else out.unionByName(det)
        lvl = nxt.select("i", "x")
    approx = lvl.select(F.lit(_HAAR_LEVELS).alias("level"),
                        F.lit(1).cast("long").alias("idx"),
                        F.lit("approx").alias("kind"),
                        F.col("x").alias("coef"))
    return out.unionByName(approx).orderBy("level", "kind", "idx")


# ---------------------------------------------------------------------------
# q_ohlc_bars — open/high/low/close resampling (finance-style bars)
# ---------------------------------------------------------------------------


@query(
    "q_ohlc_bars",
    oracle="""
    WITH ranked AS (
      SELECT cast(date_part('day', ts) as integer) AS day,
             event_type, value,
             row_number() OVER (PARTITION BY date_part('day', ts),
                                  event_type
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY date_part('day', ts),
                                  event_type
                                ORDER BY ts DESC, event_id DESC) AS rn_z
      FROM events
    )
    SELECT day, event_type,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high, min(value) AS low,
           max(CASE WHEN rn_z = 1 THEN value END) AS close,
           cast(count(*) as bigint) AS volume,
           round(cast(sum(cast(value as decimal(30,10))) as double), 4)
             AS turnover
    FROM ranked GROUP BY day, event_type
    ORDER BY day, event_type
    """,
)
def q_ohlc_bars(spark, sf_dir):
    """Classic downsample-to-bars resample: per (day, event_type),
    open = first value in time order (event_id tie-break), close =
    last, high/low = extremes, volume = row count, turnover =
    exact-decimal value sum. The first/last selection is expressed as
    row_number-over-window + conditional agg — identical semantics on
    both engines (no reliance on engine-specific first()/arg_min
    ordering guarantees, which ARE the portability trap here: Spark's
    first() is nondeterministic under shuffle and DuckDB's arg_min has
    its own tie rule).

    Scale: two windows + one groupBy, all partitioned by the bar key —
    each is one shuffle on (day, event_type) and AQE coalesces them;
    open/close never collect, the conditional agg keeps it columnar.
    At 100 TB the bar key is (symbol, bucket) with thousands of
    symbols — the same partitioned shape, no global ordering."""
    e = load_table(spark, sf_dir, "events")
    base = e.select(F.dayofmonth("ts").cast("int").alias("day"),
                    "event_type", "value", "ts", "event_id")
    wa = W.partitionBy("day", "event_type").orderBy("ts", "event_id")
    wz = W.partitionBy("day", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id"))
    ranked = base.select(
        "day", "event_type", "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wz).alias("rn_z"))
    return (ranked.groupBy("day", "event_type")
            .agg(F.max(F.when(F.col("rn_a") == 1, F.col("value")))
                 .alias("open"),
                 F.max("value").alias("high"),
                 F.min("value").alias("low"),
                 F.max(F.when(F.col("rn_z") == 1, F.col("value")))
                 .alias("close"),
                 F.count("*").alias("volume"),
                 dsum("value", "turnover"))
            .orderBy("day", "event_type"))


# ---------------------------------------------------------------------------
# q_max_drawdown — running-peak drawdown over daily cumulative series
# ---------------------------------------------------------------------------


@query(
    "q_max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT event_type, cast(date_part('day', ts) as integer) AS day,
             sum(cast(value * CASE WHEN event_type = 'error'
                                   THEN -1 ELSE 1 END
                      as decimal(30,10))) AS net
      FROM events GROUP BY 1, 2
    ),
    curve AS (
      SELECT event_type, day,
             sum(net) OVER (PARTITION BY event_type ORDER BY day)
               AS equity
      FROM daily
    ),
    dd AS (
      SELECT event_type, day, equity,
             max(equity) OVER (PARTITION BY event_type ORDER BY day)
               - equity AS drawdown
      FROM curve
    ),
    ranked AS (
      SELECT event_type, day AS trough_day, equity, drawdown,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY drawdown DESC, day) AS rn
      FROM dd
    )
    SELECT event_type,
           round(cast(drawdown as double), 4) AS max_drawdown,
           trough_day,
           round(cast(equity as double), 4) AS trough_equity
    FROM ranked WHERE rn = 1
    ORDER BY event_type
    """,
)
def q_max_drawdown(spark, sf_dir):
    """Maximum drawdown of the per-type daily cumulative value series
    (errors signed negative so the curve actually dips): drawdown(t) =
    running-peak(equity) - equity(t); report the deepest trough per
    series with its day (earliest-day tie-break). The whole curve —
    daily net, cumulative equity, running peak, drawdown — stays in
    exact decimal(30,10); doubles appear only in the final rounded
    projection, so the hash is stable by construction.

    Scale: one groupBy to days, then two ordered windows partitioned
    per series over the |days| relation — window state is bounded by
    days-per-series, never raw rows; the argmax is row_number + filter
    with a pinned tie-break, not a collect."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.select("event_type",
                      F.dayofmonth("ts").cast("int").alias("day"),
                      (F.col("value")
                       * F.when(F.col("event_type") == "error", -1)
                       .otherwise(1)).cast(DEC).alias("signed"))
             .groupBy("event_type", "day")
             .agg(F.sum("signed").alias("net")))
    wc = W.partitionBy("event_type").orderBy("day")
    curve = daily.select("event_type", "day",
                         F.sum("net").over(wc).alias("equity"))
    dd = curve.select(
        "event_type", "day", "equity",
        (F.max("equity").over(wc) - F.col("equity")).alias("drawdown"))
    ranked = dd.select(
        "event_type", F.col("day").alias("trough_day"), "equity",
        "drawdown",
        F.row_number().over(
            W.partitionBy("event_type")
            .orderBy(F.desc("drawdown"), "day")).alias("rn"))
    return (ranked.filter(F.col("rn") == 1)
            .select("event_type",
                    F.round(F.col("drawdown").cast("double"), 4)
                    .alias("max_drawdown"),
                    "trough_day",
                    F.round(F.col("equity").cast("double"), 4)
                    .alias("trough_equity"))
            .orderBy("event_type"))


# ---------------------------------------------------------------------------
# q_point_in_polygon — crossing-number containment join (exact integers)
# ---------------------------------------------------------------------------

# Three fixture polygons in the deci-unit plane the spatial family
# synthesizes points into (x = custkey % 997, y = custkey*31 % 1009,
# both in [0, ~1008]): a convex pentagon, a concave arrow (exercises
# the even-odd rule where a ray crosses the hull twice), a triangle.
_PIP_POLYGONS = {
    1: [(100, 100), (500, 50), (900, 300), (600, 800), (150, 600)],
    2: [(200, 200), (800, 200), (800, 700), (500, 400), (200, 700)],
    3: [(50, 700), (450, 950), (50, 950)],
}


def _pip_edges():
    rows = []
    for pid, verts in _PIP_POLYGONS.items():
        for i, (x1, y1) in enumerate(verts):
            x2, y2 = verts[(i + 1) % len(verts)]
            rows.append((pid, x1, y1, x2, y2))
    return rows


_PIP_EDGE_VALUES = ", ".join(f"({p}, {a}, {b}, {c}, {d})"
                             for p, a, b, c, d in _pip_edges())

_PIP_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey AS id,
         cast(c_custkey % 997 as bigint) AS px,
         cast((c_custkey * 31) % 1009 as bigint) AS py
  FROM customer
),
ed(poly_id, x1, y1, x2, y2) AS (VALUES {_PIP_EDGE_VALUES}),
crossings AS (
  SELECT pts.id, ed.poly_id, count(*) AS c
  FROM pts CROSS JOIN ed
  WHERE ((y1 <= py AND py < y2) OR (y2 <= py AND py < y1))
    AND (CASE WHEN y2 > y1
              THEN (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1) > 0
              ELSE (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1) < 0
         END)
  GROUP BY pts.id, ed.poly_id
),
inside AS (
  SELECT id, poly_id FROM crossings WHERE c % 2 = 1
)
SELECT poly_id,
       cast(count(*) as bigint) AS n_inside,
       cast(sum(id) as bigint) AS id_sum,
       cast(min(id) as bigint) AS min_id,
       cast(max(id) as bigint) AS max_id
FROM inside GROUP BY poly_id ORDER BY poly_id
"""


@query("q_point_in_polygon", oracle=_PIP_ORACLE)
def q_point_in_polygon(spark, sf_dir):
    """Point-in-polygon containment join: customers (as deterministic
    integer deci-unit points, the q_spatial_join synthesis) against
    three literal polygons, by the even-odd crossing-number rule — the
    geofencing primitive beside the distance (q_spatial_join) and
    grid (q_spatial_geohash) rungs of the spatial family.

    Exactness: a horizontal ray from (px, py) crosses edge
    (x1,y1)-(x2,y2) iff the half-open rule y1 <= py < y2 (or reversed)
    holds AND the 2x2 cross product (x2-x1)(py-y1) - (px-x1)(y2-y1)
    has the sign of (y2-y1) — NO division, pure int64 arithmetic, so
    vertex-on-ray and boundary cases are engine-identical by
    construction. Output is per-polygon count plus id checksums.

    Scale: the edge list is a broadcast literal (any real polygon set
    is dim-sized); the probe is one codegen'd scan — at 100 TB add the
    polygon-bbox grid cell as a pre-join key so each point meets only
    its cell's polygons (the q_spatial_join probing device)."""
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (F.col("c_custkey") % 997).cast("long").alias("px"),
        ((F.col("c_custkey") * 31) % 1009).cast("long").alias("py"))
    ed = F.broadcast(pts.sparkSession.createDataFrame(
        _pip_edges(), "poly_id int, x1 long, y1 long, x2 long, y2 long"))
    py, px = F.col("py"), F.col("px")
    y1, y2, x1 = F.col("y1"), F.col("y2"), F.col("x1")
    spans = ((y1 <= py) & (py < y2)) | ((y2 <= py) & (py < y1))
    cross = (F.col("x2") - x1) * (py - y1) - (px - x1) * (y2 - y1)
    hits = F.when(y2 > y1, cross > 0).otherwise(cross < 0)
    crossings = (pts.crossJoin(ed)
                 .filter(spans & hits)
                 .groupBy("id", "poly_id").agg(F.count("*").alias("c")))
    inside = crossings.filter(F.col("c") % 2 == 1)
    return (inside.groupBy("poly_id")
            .agg(F.count("*").cast("long").alias("n_inside"),
                 F.sum("id").cast("long").alias("id_sum"),
                 F.min("id").cast("long").alias("min_id"),
                 F.max("id").cast("long").alias("max_id"))
            .orderBy("poly_id"))


# ---------------------------------------------------------------------------
# q_sax_encode — symbolic aggregate approximation of daily series
# ---------------------------------------------------------------------------

_SAX_ORACLE = """
WITH daily AS (
  SELECT event_type, cast(ts as date) AS d, cast(count(*) as bigint) AS c
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type ORDER BY d) - 1 AS i
  FROM daily
),
frames AS (
  SELECT event_type, i // 3 AS frame, cast(sum(c) as bigint) AS s,
         cast(count(*) as bigint) AS w
  FROM idx GROUP BY event_type, i // 3
),
full_frames AS (SELECT * FROM frames WHERE w = 3),
stats AS (
  SELECT event_type,
         cast(count(*) as bigint) AS nf,
         cast(sum(s) as bigint) AS s1,
         cast(sum(s * s) as bigint) AS s2
  FROM full_frames GROUP BY event_type
),
thresh AS (
  SELECT event_type,
         cast(s1 as double) / nf AS mu,
         sqrt((cast(s2 as double) - cast(s1 as double) * s1 / nf)
              / (nf - 1)) AS sd
  FROM stats
)
SELECT f.event_type, f.frame, f.s,
       CASE WHEN cast(f.s as double) < mu - 0.6745 * sd THEN 'a'
            WHEN cast(f.s as double) < mu THEN 'b'
            WHEN cast(f.s as double) < mu + 0.6745 * sd THEN 'c'
            ELSE 'd' END AS symbol
FROM full_frames f JOIN thresh USING (event_type)
ORDER BY f.event_type, f.frame
"""


@query("q_sax_encode", oracle=_SAX_ORACLE)
def q_sax_encode(spark, sf_dir):
    """SAX (symbolic aggregate approximation): each event type's daily
    count series is piecewise-aggregated into 3-day frames, and each
    frame is mapped to one of four symbols by the standard Gaussian
    quartile breakpoints (-0.6745, 0, +0.6745) around the per-series
    frame distribution — the discretization that turns similarity
    search over raw series into string algorithms (q_text_winnowing /
    q_dedup_ngram apply downstream).

    Exactness: frame sums are exact bigints; the breakpoint compare is
    `int < mu + b*sd` with mu/sd derived scalar-side from exact integer
    sums — an integer never equals the irrational threshold, and both
    engines compute the identical double, so the symbolization cannot
    drift. Trailing partial frames (w < 3) are excluded to keep frame
    statistics commensurate.

    Scale: one map-side daily rollup (calendar-bounded), one frame
    group-by over it, one broadcast per-series threshold join."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").cast("long").alias("c")))
    idx = daily.select(
        "event_type", "c",
        (F.row_number().over(
            W.partitionBy("event_type").orderBy("d")) - 1).alias("i"))
    frames = (idx.groupBy("event_type",
                          (F.col("i") / 3).cast("long").alias("frame"))
              .agg(F.sum("c").cast("long").alias("s"),
                   F.count("*").cast("long").alias("w"))
              .filter(F.col("w") == 3))
    stats = (frames.groupBy("event_type")
             .agg(F.count("*").cast("long").alias("nf"),
                  F.sum("s").cast("long").alias("s1"),
                  F.sum(F.col("s") * F.col("s")).cast("long").alias("s2")))
    mu = F.col("s1").cast("double") / F.col("nf")
    sd = F.sqrt((F.col("s2").cast("double")
                 - F.col("s1").cast("double") * F.col("s1") / F.col("nf"))
                / (F.col("nf") - 1))
    thresh = stats.select("event_type", mu.alias("mu"), sd.alias("sd"))
    sdub = F.col("s").cast("double")
    symbol = (F.when(sdub < F.col("mu") - 0.6745 * F.col("sd"), "a")
              .when(sdub < F.col("mu"), "b")
              .when(sdub < F.col("mu") + 0.6745 * F.col("sd"), "c")
              .otherwise("d"))
    return (frames.join(F.broadcast(thresh), "event_type")
            .select("event_type", "frame", "s", symbol.alias("symbol"))
            .orderBy("event_type", "frame"))


# ---------------------------------------------------------------------------
# q_granger_causality — lag-1 Granger F-test, both directions
# ---------------------------------------------------------------------------

_GRANGER_ORACLE = """
WITH daily AS (
  SELECT cast(ts as date) AS d,
         cast(count(*) FILTER (event_type = 'click') as bigint) AS x,
         cast(count(*) FILTER (event_type = 'purchase') as bigint) AS y
  FROM events GROUP BY 1
),
lagged AS (
  SELECT x, y,
         lag(x) OVER (ORDER BY d) AS xl,
         lag(y) OVER (ORDER BY d) AS yl
  FROM daily
),
pairs AS (
  SELECT 'x->y' AS direction, y AS t, yl AS a, xl AS b
  FROM lagged WHERE xl IS NOT NULL
  UNION ALL
  SELECT 'y->x', x, xl, yl FROM lagged WHERE xl IS NOT NULL
),
s AS (
  SELECT direction,
         cast(count(*) as bigint) AS n,
         cast(sum(t) as bigint) AS st, cast(sum(a) as bigint) AS sa,
         cast(sum(b) as bigint) AS sb,
         cast(sum(t * t) as bigint) AS stt,
         cast(sum(a * a) as bigint) AS saa,
         cast(sum(b * b) as bigint) AS sbb,
         cast(sum(a * t) as bigint) AS sat,
         cast(sum(b * t) as bigint) AS sbt,
         cast(sum(a * b) as bigint) AS sab
  FROM pairs GROUP BY direction
),
c AS (
  SELECT direction, n,
         cast(stt as double) - cast(st as double) * st / n AS cyy,
         cast(saa as double) - cast(sa as double) * sa / n AS caa,
         cast(sbb as double) - cast(sb as double) * sb / n AS cbb,
         cast(sat as double) - cast(sa as double) * st / n AS cay,
         cast(sbt as double) - cast(sb as double) * st / n AS cby,
         cast(sab as double) - cast(sa as double) * sb / n AS cab
  FROM s
),
f AS (
  SELECT direction, n,
         cyy - cay * cay / caa AS rss_r,
         cyy - ((cay * cbb - cby * cab) * cay
                + (cby * caa - cay * cab) * cby)
               / (caa * cbb - cab * cab) AS rss_u
  FROM c
)
SELECT direction, n,
       round((rss_r - rss_u) * (n - 3) / rss_u, 6) + 0.0 AS f_stat,
       round(1.0 - rss_u / rss_r, 6) + 0.0 AS r2_gain
FROM f ORDER BY direction
"""


@query("q_granger_causality", oracle=_GRANGER_ORACLE)
def q_granger_causality(spark, sf_dir):
    """Lag-1 Granger causality between the daily click and purchase
    series, both directions: does adding yesterday's clicks to an
    AR(1) model of purchases cut the residual sum of squares (and
    vice versa)? F = (RSS_r - RSS_u)*(n-3)/RSS_u with the closed-form
    two-regressor OLS — the lead-lag screen beside q_lagged_crosscorr
    (which measures association, not incremental predictivity).

    Exactness: all ten sufficient statistics are exact bigints over
    integer daily counts; centered second moments, the 2x2 normal
    equations, and both RSS values are scalar double combinations —
    identical operand order on both engines — rounded 6dp with the
    sign-of-zero guard.

    Scale: one calendar-bounded daily pivot, one lag window over it,
    one 10-sum reduce per direction."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy(F.col("ts").cast("date").alias("d"))
             .agg(F.sum(F.when(F.col("event_type") == "click", 1)
                        .otherwise(0)).cast("long").alias("x"),
                  F.sum(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).cast("long").alias("y")))
    w = W.orderBy("d")
    lagged = (daily.select("x", "y",
                           F.lag("x").over(w).alias("xl"),
                           F.lag("y").over(w).alias("yl"))
              .filter(F.col("xl").isNotNull()))
    fwd = lagged.select(F.lit("x->y").alias("direction"),
                        F.col("y").alias("t"), F.col("yl").alias("a"),
                        F.col("xl").alias("b"))
    rev = lagged.select(F.lit("y->x").alias("direction"),
                        F.col("x").alias("t"), F.col("xl").alias("a"),
                        F.col("yl").alias("b"))
    pairs = fwd.unionByName(rev)
    s = (pairs.groupBy("direction")
         .agg(F.count("*").cast("long").alias("n"),
              F.sum("t").cast("long").alias("st"),
              F.sum("a").cast("long").alias("sa"),
              F.sum("b").cast("long").alias("sb"),
              F.sum(F.col("t") * F.col("t")).cast("long").alias("stt"),
              F.sum(F.col("a") * F.col("a")).cast("long").alias("saa"),
              F.sum(F.col("b") * F.col("b")).cast("long").alias("sbb"),
              F.sum(F.col("a") * F.col("t")).cast("long").alias("sat"),
              F.sum(F.col("b") * F.col("t")).cast("long").alias("sbt"),
              F.sum(F.col("a") * F.col("b")).cast("long").alias("sab")))
    nd = F.col("n").cast("double")
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    cyy = dd("stt") - dd("st") * F.col("st") / nd
    caa = dd("saa") - dd("sa") * F.col("sa") / nd
    cbb = dd("sbb") - dd("sb") * F.col("sb") / nd
    cay = dd("sat") - dd("sa") * F.col("st") / nd
    cby = dd("sbt") - dd("sb") * F.col("st") / nd
    cab = dd("sab") - dd("sa") * F.col("sb") / nd
    rss_r = cyy - cay * cay / caa
    det = caa * cbb - cab * cab
    rss_u = cyy - ((cay * cbb - cby * cab) * cay
                   + (cby * caa - cay * cab) * cby) / det
    f = (rss_r - rss_u) * (F.col("n") - 3) / rss_u
    return s.select(
        "direction", "n",
        (F.round(f, 6) + 0.0).alias("f_stat"),
        (F.round(1.0 - rss_u / rss_r, 6) + 0.0).alias("r2_gain")
    ).orderBy("direction")


# ---------------------------------------------------------------------------
# q_cusum — CUSUM mean-shift detector via the prefix-sum identity
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH daily AS (
  SELECT event_type, cast(ts as date) AS d, count(*) AS x
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type,
         cast(count(*) as bigint) AS n,
         cast(sum(x) as bigint) AS s,
         cast(sum(x * x) as bigint) AS s2
  FROM daily GROUP BY 1
),
pref AS (
  SELECT d.event_type, d.d, st.n, st.s, st.s2,
         sum(st.n * d.x - st.s)
           OVER (PARTITION BY d.event_type ORDER BY d.d) AS p
  FROM daily d JOIN st ON d.event_type = st.event_type
),
cus AS (
  SELECT event_type, d, n, s, s2, p,
         p - least(min(p) OVER (PARTITION BY event_type ORDER BY d), 0)
           AS s_plus,
         greatest(max(p) OVER (PARTITION BY event_type ORDER BY d), 0)
           - p AS s_minus
  FROM pref
)
SELECT event_type, cast(d as string) AS day,
       cast(s_plus as bigint) AS s_plus,
       cast(s_minus as bigint) AS s_minus,
       CASE WHEN greatest(s_plus, s_minus)
                 > 4.0 * n * sqrt((cast(s2 as double)
                                   - cast(s as double) * s / n)
                                  / (n - 1))
            THEN 1 ELSE 0 END AS alarm
FROM cus ORDER BY event_type, day
"""


@query("q_cusum", oracle=_CUSUM_ORACLE)
def q_cusum(spark, sf_dir):
    """Two-sided CUSUM mean-shift detector per event type, computed
    WITHOUT the textbook recursion: S+_t = max(0, S+_{t-1} + dev_t)
    equals P_t - min_{i<=t} P_i where P is the prefix sum of
    deviations — so the sequential detector becomes two plain running
    windows (the q_max_drawdown identity, pointed at change
    detection). Deviations are n-scaled integers (n*x - S, the q_acf
    device), making every S+/S- an exact bigint; the only float is
    the 4-sigma alarm threshold, one deterministic double compared
    against an exact integer.

    Scale: one daily rollup shuffle, two cumulative windows over the
    calendar-bounded series — the 100 TB cost is the rollup, not the
    detector."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").alias("x")))
    st = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"))
    w = (W.partitionBy("event_type").orderBy("d")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    pref = (daily.join(st, "event_type")
            .select("event_type", "d", "n", "s", "s2",
                    F.sum(F.col("n") * F.col("x") - F.col("s")).over(w)
                    .alias("p")))
    # the running extremum must include the EMPTY prefix (P_0 = 0),
    # otherwise S_1 would be forced to 0 even when dev_1 > 0
    cus = pref.select(
        "event_type", "d", "n", "s", "s2",
        (F.col("p") - F.least(F.min("p").over(w), F.lit(0)))
        .alias("s_plus"),
        (F.greatest(F.max("p").over(w), F.lit(0)) - F.col("p"))
        .alias("s_minus"))
    sd = F.sqrt((F.col("s2").cast("double")
                 - F.col("s").cast("double") * F.col("s") / F.col("n"))
                / (F.col("n") - 1))
    alarm = F.when(
        F.greatest(F.col("s_plus"), F.col("s_minus")).cast("double")
        > 4.0 * F.col("n") * sd, 1).otherwise(0)
    return (cus.select("event_type",
                       F.col("d").cast("string").alias("day"),
                       F.col("s_plus").cast("long").alias("s_plus"),
                       F.col("s_minus").cast("long").alias("s_minus"),
                       alarm.alias("alarm"))
            .orderBy("event_type", "day"))


# ---------------------------------------------------------------------------
# q_runs_test — Wald-Wolfowitz runs test on daily up/down moves
# ---------------------------------------------------------------------------

_RUNS_ORACLE = """
WITH daily AS (
  SELECT cast(ts as date) AS d, cast(count(*) as bigint) AS x
  FROM events GROUP BY 1
),
moves AS (
  SELECT d, x - lag(x) OVER (ORDER BY d) AS dx
  FROM daily
),
signs AS (
  SELECT d, CASE WHEN dx > 0 THEN 1 ELSE 0 END AS s
  FROM moves WHERE dx IS NOT NULL AND dx <> 0
),
runs AS (
  SELECT s, CASE WHEN lag(s) OVER (ORDER BY d) IS NULL
                   OR lag(s) OVER (ORDER BY d) <> s
            THEN 1 ELSE 0 END AS new_run
  FROM signs
),
agg AS (
  SELECT cast(sum(new_run) as bigint) AS r,
         cast(sum(s) as bigint) AS n1,
         cast(count(*) - sum(s) as bigint) AS n2
  FROM runs
)
SELECT r, n1, n2,
       round((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
             / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                    / ((cast(n1 + n2 as double)) * (n1 + n2)
                       * (n1 + n2 - 1))), 4) + 0.0 AS z_score
FROM agg
"""


@query("q_runs_test", oracle=_RUNS_ORACLE)
def q_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test on the signs of day-over-day total
    event count changes (zero moves dropped): too FEW runs = trending
    / sticky regime, too MANY = oscillation — the randomness screen
    that complements q_acf (linear memory) and q_mann_kendall
    (monotone trend) with a distribution-free readout.

    Exactness: run count and sign totals are exact integers from one
    lag + one change-flag window; the normal approximation z is one
    scalar double expression, rounded 4dp, sign-of-zero guarded.

    Scale: calendar-bounded series relation; the fact scan rollup is
    the only corpus-sized stage."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy(F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").cast("long").alias("x")))
    moves = daily.select(
        "d", (F.col("x") - F.lag("x").over(W.orderBy("d"))).alias("dx"))
    signs = (moves.filter(F.col("dx").isNotNull() & (F.col("dx") != 0))
             .select("d", F.when(F.col("dx") > 0, 1).otherwise(0)
                     .alias("s")))
    prev = F.lag("s").over(W.orderBy("d"))
    runs = signs.select(
        "s", F.when(prev.isNull() | (prev != F.col("s")), 1)
        .otherwise(0).alias("new_run"))
    agg = runs.agg(F.sum("new_run").cast("long").alias("r"),
                   F.sum("s").cast("long").alias("n1"),
                   (F.count("*") - F.sum("s")).cast("long").alias("n2"))
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    n = n1 + n2
    mu = 2.0 * n1 * n2 / n + 1
    sig = F.sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                 / (n.cast("double") * n * (n - 1)))
    return agg.select("r", "n1", "n2",
                      (F.round((r - mu) / sig, 4) + 0.0)
                      .alias("z_score"))


# ---------------------------------------------------------------------------
# q_poisson_dispersion — overdispersion index of daily counts
# ---------------------------------------------------------------------------

_DISPERSION_ORACLE = """
WITH daily AS (
  SELECT event_type, cast(ts as date) AS d,
         cast(count(*) as bigint) AS x
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type,
         cast(count(*) as bigint) AS n,
         cast(sum(x) as bigint) AS s1,
         cast(sum(x * x) as bigint) AS s2
  FROM daily GROUP BY event_type
)
SELECT event_type, n,
       round(cast(s1 as double) / n, 4) + 0.0 AS mean_daily,
       round((cast(s2 as double) - cast(s1 as double) * s1 / n)
             / (n - 1) / (cast(s1 as double) / n), 6) + 0.0
         AS dispersion,
       round(cast(n * s2 - s1 * s1 as double) / s1, 4) + 0.0
         AS chi2_poisson
FROM s ORDER BY event_type
"""


@query("q_poisson_dispersion", oracle=_DISPERSION_ORACLE)
def q_poisson_dispersion(spark, sf_dir):
    """Poisson overdispersion screen per event type: the variance/mean
    ratio of daily counts (1 under a pure Poisson arrival process;
    >> 1 = bursty/clumped traffic, << 1 = rate-limited) plus the
    dispersion chi2 = sum((x-mean)^2)/mean = (n*s2 - s1^2)/s1 — the
    arrival-model check that decides whether q_anomaly_zscore's
    Gaussian thresholds or a negative-binomial model fit the feed
    (q_burst_detect finds the bursts; this says whether bursts are
    even anomalous).

    Exactness: chi2's numerator n*s2 - s1^2 is an exact bigint; the
    ratio and dispersion are scalar doubles of exact integers.

    Scale: one daily rollup, one per-type reduce."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").cast("long").alias("x")))
    s = (daily.groupBy("event_type")
         .agg(F.count("*").cast("long").alias("n"),
              F.sum("x").cast("long").alias("s1"),
              F.sum(F.col("x") * F.col("x")).cast("long").alias("s2")))
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    var = ((F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1") / nd)
           / (F.col("n") - 1))
    chi2 = (F.col("n") * F.col("s2")
            - F.col("s1") * F.col("s1")).cast("double") / F.col("s1")
    return (s.select("event_type", "n",
                     (F.round(mean, 4) + 0.0).alias("mean_daily"),
                     (F.round(var / mean, 6) + 0.0).alias("dispersion"),
                     (F.round(chi2, 4) + 0.0).alias("chi2_poisson"))
            .orderBy("event_type"))
