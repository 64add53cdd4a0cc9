"""Event-analytics compositions over the ``events`` stream table:
ordered funnel and cohort retention — the two canonical product-
analytics shapes, expressed as shuffle-minimal DataFrame pipelines.

Both are per-user aggregations first (the cardinality reducer), then
tiny joins — the order that survives 100 TB: the shuffle carries one
row per user, never raw events.
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
