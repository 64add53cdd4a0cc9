"""Event-analytics compositions over the ``events`` stream table:
ordered funnel, cohort retention, batch sessionization, time-hierarchy
rollup, cumulative distinct reach, and A/B-test readout — the canonical
product-analytics shapes, expressed as shuffle-minimal DataFrame
pipelines.

Each is a per-user (or per-bucket) aggregation FIRST (the cardinality
reducer), then tiny joins/windows — the order that survives 100 TB:
shuffles carry one row per user/day/bucket, never raw events.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .functions.hashsafe import dsum
from .registry import query
from .sources.fixtures import load_table


@query(
    "q_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_view_click,
           (SELECT count(*) FROM p) AS n_full_funnel
    """,
)
def q_funnel(spark, sf_dir):
    """Ordered 3-step funnel (view -> click -> purchase): users counted
    at each step only if the step's FIRST event strictly follows the
    previous step's first event. Each step is a per-user min-timestamp
    aggregate followed by a user-keyed join of the (small) survivor
    set — never an event-x-event join."""
    e = load_table(spark, sf_dir, "events")

    def first_after(etype, prev):
        step = (e.filter(F.col("event_type") == etype)
                if prev is None else
                e.filter(F.col("event_type") == etype)
                .join(prev, "user_id")
                .filter(F.col("ts") > F.col("t_prev")))
        return (step.groupBy("user_id")
                .agg(F.min("ts").alias("t_prev")))

    v = first_after("view", None)
    c = first_after("click", v)
    p = first_after("purchase", c)
    return (v.agg(F.count("*").alias("n_view"))
            .crossJoin(c.agg(F.count("*").alias("n_view_click")))
            .crossJoin(p.agg(F.count("*").alias("n_full_funnel"))))


@query(
    "q_retention_cohort",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(cast(ts as date)) AS cohort_day
      FROM events GROUP BY user_id
    )
    SELECT cast(f.cohort_day as string) AS cohort_day,
           date_diff('day', f.cohort_day, cast(e.ts as date)) AS day_offset,
           count(distinct e.user_id) AS n_users
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def q_retention_cohort(spark, sf_dir):
    """Cohort retention triangle: users grouped by first-seen day,
    activity counted per (cohort_day, day offset). The first-seen
    aggregate is one row per user; the event join is user-keyed; the
    final distinct-count shuffles (cohort, offset, user) triples."""
    e = load_table(spark, sf_dir, "events")
    first_seen = (e.groupBy("user_id")
                  .agg(F.min(F.to_date("ts")).alias("cohort_day")))
    return (e.join(first_seen, "user_id")
            .select(F.col("cohort_day").cast("string").alias("cohort_day"),
                    F.datediff(F.to_date("ts"),
                               F.col("cohort_day")).alias("day_offset"),
                    "user_id")
            .groupBy("cohort_day", "day_offset")
            .agg(F.countDistinct("user_id").alias("n_users")))


@query(
    "q_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTES
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts, value,
             cast(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) as bigint)
               AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           min(ts) AS session_start,
           epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us,
           round(cast(sum(cast(value as decimal(30,10))) as double), 4)
             AS sum_value
    FROM numbered GROUP BY 1, 2
    """,
)
def q_sessionize(spark, sf_dir):
    """Batch sessionization by inactivity gap (30 min): the lag ->
    boundary-flag -> running-sum pattern that assigns contiguous
    session ids, then per-session rollup. This is the BATCH twin of
    q_session_window's session_window() operator — same semantics,
    expressed with ordinary windows so it runs on any engine (the
    oracle proves it). One shuffle: everything is partitioned by
    user_id throughout (the two windows and the final groupBy reuse
    the same partitioning — Catalyst plans a single Exchange)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    new_s = (F.when(F.lag("ts").over(w).isNull()
                    | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                       > gap_us), 1)
             .otherwise(0))
    numbered = (e.withColumn("new_s", new_s)
                .withColumn("session_id",
                            F.sum("new_s").over(
                                w.rowsBetween(W.unboundedPreceding, 0))))
    return (numbered.groupBy("user_id", "session_id")
            .agg(F.count("*").alias("n_events"),
                 F.min("ts").alias("session_start"),
                 (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
                 .alias("duration_us"),
                 dsum("value", "sum_value")))


@query(
    "q_rollup_time",
    oracle="""
    SELECT cast(cast(ts as date) as string) AS day,
           cast(date_trunc('hour', ts) as string) AS hour,
           count(*) AS n,
           round(cast(sum(cast(value as decimal(30,10))) as double), 4)
             AS sum_value
    FROM events
    GROUP BY ROLLUP (cast(cast(ts as date) as string),
                     cast(date_trunc('hour', ts) as string))
    """,
)
def q_rollup_time(spark, sf_dir):
    """Time-hierarchy rollup (hour -> day -> grand total in ONE pass):
    the OLAP cube maintenance shape for time series — partial
    aggregates combine map-side, and the rollup lattice means the
    day and total levels are derived from the hour level inside the
    same shuffle, not by re-scanning. Levels are ISO strings so the
    NULL-marked super-aggregate rows hash identically on both
    engines."""
    e = load_table(spark, sf_dir, "events")
    day = F.to_date("ts").cast("string").alias("day")
    hour = F.date_trunc("hour", "ts").cast("string").alias("hour")
    return (e.rollup(day, hour)
            .agg(F.count("*").alias("n"), dsum("value", "sum_value")))


@query(
    "q_running_distinct",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(cast(cast(ts as date) as string)) AS day
      FROM events GROUP BY user_id
    ),
    per_day AS (
      SELECT day, count(*) AS new_users FROM first_seen GROUP BY day
    ),
    days AS (
      SELECT DISTINCT cast(cast(ts as date) as string) AS day
      FROM events
    )
    SELECT d.day AS day,
           coalesce(p.new_users, 0) AS new_users,
           cast(sum(coalesce(p.new_users, 0))
                OVER (ORDER BY d.day ROWS UNBOUNDED PRECEDING) as bigint)
             AS cum_distinct_users
    FROM days d LEFT JOIN per_day p ON d.day = p.day
    """,
)
def q_running_distinct(spark, sf_dir):
    """Cumulative distinct users per day WITHOUT a distinct-over-window
    (which would re-scan every prefix — O(days x events)): each user
    collapses to their FIRST-seen day (one groupBy), daily new-user
    counts follow (second tiny agg), and the running sum of new users
    IS the cumulative distinct count — exact, one pass over raw data,
    |days|-sized window state. The standard trick that makes 'DAU
    cumulative reach' computable at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    day_of = F.to_date("ts").cast("string")
    first_seen = (e.groupBy("user_id")
                  .agg(F.min(day_of).alias("day")))
    per_day = first_seen.groupBy("day").agg(F.count("*").alias("new_users"))
    days = e.select(day_of.alias("day")).distinct()
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return (days.join(per_day, "day", "left")
            .select("day",
                    F.coalesce("new_users", F.lit(0)).alias("new_users"))
            .withColumn("cum_distinct_users",
                        F.sum("new_users").over(w).cast("bigint")))


@query(
    "q_ab_test",
    oracle="""
    WITH assign AS (
      SELECT user_id, user_id % 2 AS variant,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT count(CASE WHEN variant = 0 THEN 1 END) AS n_a,
             count(CASE WHEN variant = 0 AND converted = 1 THEN 1 END)
               AS conv_a,
             count(CASE WHEN variant = 1 THEN 1 END) AS n_b,
             count(CASE WHEN variant = 1 AND converted = 1 THEN 1 END)
               AS conv_b
      FROM assign
    )
    SELECT n_a, conv_a, n_b, conv_b,
           round(cast(conv_a as double) / n_a, 6) AS p_a,
           round(cast(conv_b as double) / n_b, 6) AS p_b,
           round((cast(conv_a as double) / n_a - cast(conv_b as double) / n_b)
                 / sqrt((cast(conv_a + conv_b as double) / (n_a + n_b))
                        * (1 - cast(conv_a + conv_b as double) / (n_a + n_b))
                        * (cast(1 as double) / n_a
                           + cast(1 as double) / n_b)), 6) AS z
    FROM arms
    """,
)
def q_ab_test(spark, sf_dir):
    """Two-proportion z-test (A/B experiment readout): deterministic
    variant assignment by user key, per-user conversion collapse (ONE
    pass, map-side combinable), then the pooled-proportion z statistic
    from the four integer counts — every division/sqrt is scalar IEEE
    math over exact integers, so the statistic matches bit-for-bit on
    any engine and partitioning. The pattern that replaces 'export to
    a notebook' for experiment analysis at warehouse scale."""
    e = load_table(spark, sf_dir, "events")
    assign = (e.groupBy("user_id")
              .agg(F.max(F.when(F.col("event_type") == "purchase", 1)
                         .otherwise(0)).alias("converted"))
              .select((F.col("user_id") % 2).alias("variant"), "converted"))
    arms = assign.agg(
        F.count(F.when(F.col("variant") == 0, 1)).alias("n_a"),
        F.count(F.when((F.col("variant") == 0)
                       & (F.col("converted") == 1), 1)).alias("conv_a"),
        F.count(F.when(F.col("variant") == 1, 1)).alias("n_b"),
        F.count(F.when((F.col("variant") == 1)
                       & (F.col("converted") == 1), 1)).alias("conv_b"))
    pa = F.col("conv_a").cast("double") / F.col("n_a")
    pb = F.col("conv_b").cast("double") / F.col("n_b")
    pool = ((F.col("conv_a") + F.col("conv_b")).cast("double")
            / (F.col("n_a") + F.col("n_b")))
    z = (pa - pb) / F.sqrt(pool * (1 - pool)
                           * (F.lit(1).cast("double") / F.col("n_a")
                              + F.lit(1).cast("double") / F.col("n_b")))
    return arms.select("n_a", "conv_a", "n_b", "conv_b",
                       F.round(pa, 6).alias("p_a"),
                       F.round(pb, 6).alias("p_b"),
                       F.round(z, 6).alias("z"))
