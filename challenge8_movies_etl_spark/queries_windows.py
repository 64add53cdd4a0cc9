"""Category F — window functions.

No reference analog (the pandas equivalents went unused); declared as
core Spark query capability (SURVEY.md §2.F) and needed by
sessionization / as-of semantics.

Hash discipline for windows: every ORDER BY inside a window carries a
unique tie-break column, and running sums of doubles accumulate in
decimal — DuckDB evaluates window aggregates with a segment tree
(pairwise combines), Spark accumulates sequentially, so double prefix
sums would differ in the low bits even over identical orderings.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .functions.hashsafe import DEC
from .registry import query
from .sources.fixtures import load_table


@query(
    "q_window_rank",
    oracle="""
    SELECT * FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn,
             rank()       OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC) AS rnk,
             dense_rank() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC) AS drnk
      FROM customer
    ) WHERE rn <= 3
    """,
)
def q_window_rank(spark, sf_dir):
    """row_number / rank / dense_rank; top-3 per market segment.

    row_number's ordering carries the unique c_custkey tie-break (so the
    kept rows are deterministic); rank/dense_rank order by value only
    (their outputs are functions of the value, so ties are safe).
    Physical plan: one shuffle on c_mktsegment, sort within partitions,
    single Window operator computing all three functions.
    """
    c = load_table(spark, sf_dir, "customer")
    w_total = (W.partitionBy("c_mktsegment")
               .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey")))
    w_value = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    return (c.select(
                "c_mktsegment", "c_custkey", "c_acctbal",
                F.row_number().over(w_total).alias("rn"),
                F.rank().over(w_value).alias("rnk"),
                F.dense_rank().over(w_value).alias("drnk"))
            .filter(F.col("rn") <= 3))


@query(
    "q_window_running",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           round(cast(sum(cast(o_totalprice as {DEC})) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) as double), 4) AS running_spend,
           round(cast(sum(cast(o_totalprice as {DEC})) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) as double) / count(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 4) AS moving_avg3
    FROM orders
    """,
)
def q_window_running(spark, sf_dir):
    """Running sum + 3-row moving average per customer over order time.

    Frames: unboundedPreceding..current and -2..current. Decimal
    accumulation inside both frames (see module docstring).

    Quotient-rounding adjudication (VERDICT r9 item 3, SCALE.md
    table): moving_avg3 divides a cents-lattice frame sum by C in
    {1,2,3}; a 4dp half boundary requires 200*S_cents = (2m+1)*C,
    impossible for every frame size (C=1,3: even = odd; C=2: reduces
    to 100*S_cents odd, again even = odd). Boundary-unreachable by
    parity; no rewrite needed.
    """
    o = load_table(spark, sf_dir, "orders")
    w = (W.partitionBy("o_custkey")
         .orderBy("o_orderdate", "o_orderkey"))
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    mov = w.rowsBetween(-2, W.currentRow)
    dec_price = F.col("o_totalprice").cast(DEC)
    return o.select(
        "o_custkey", "o_orderkey",
        F.round(F.sum(dec_price).over(run).cast("double"), 4)
        .alias("running_spend"),
        F.round(
            F.sum(dec_price).over(mov).cast("double")
            / F.count(F.lit(1)).over(mov), 4
        ).alias("moving_avg3"),
    )


@query(
    "q_window_lag",
    oracle="""
    SELECT user_id, event_id, ts,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
           lead(event_id) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_event_id
    FROM events
    """,
)
def q_window_lag(spark, sf_dir):
    """lag/lead: inter-event gap per user in microseconds.

    The gap is computed in integer microseconds (unix_micros /
    epoch_us) — exact on both engines, no float seconds.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return e.select(
        "user_id", "event_id", "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lead("event_id").over(w).alias("next_event_id"),
    )


@query(
    "q_window_frames",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ntile(4) OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice, o_orderkey) AS quartile,
           round(percent_rank() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice, o_orderkey), 4) AS pct_rank,
           first_value(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS first_order,
           last_value(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_order
    FROM orders
    """,
)
def q_window_frames(spark, sf_dir):
    """ntile / percent_rank / first_value / last_value with explicit
    full-partition frames (the §2.F 'surface' row, declared so the
    driver checks it rather than trusting the API exists)."""
    o = load_table(spark, sf_dir, "orders")
    w = (W.partitionBy("o_custkey")
         .orderBy("o_totalprice", "o_orderkey"))
    w_date = (W.partitionBy("o_custkey")
              .orderBy("o_orderdate", "o_orderkey")
              .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    return o.select(
        "o_custkey", "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.first("o_orderkey").over(w_date).alias("first_order"),
        F.last("o_orderkey").over(w_date).alias("last_order"),
    )


@query(
    "q_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey)
               AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q_topk_per_group(spark, sf_dir):
    """Top-3 orders per priority — the per-GROUP twin of q_topk's
    global TakeOrderedAndProject. The rank filter compiles to Spark's
    WindowGroupLimit: each partition keeps a 3-row heap per group
    BEFORE the exchange, so the shuffle carries ≤ k·|groups| rows per
    map task instead of the whole fact table — the optimization that
    makes per-key top-k viable at 100 TB (plan-gated in
    tests/test_plans.py). Total order (price desc, key) keeps both
    engines' row_number deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = (W.partitionBy("o_orderpriority")
         .orderBy(F.desc("o_totalprice"), "o_orderkey"))
    return (o.select("o_orderpriority", "o_orderkey", "o_totalprice",
                     F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") <= 3)
            .drop("rn"))
