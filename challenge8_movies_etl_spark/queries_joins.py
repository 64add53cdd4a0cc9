"""Category D — joins.

The reference implements exactly two joins: inner wiki⋈kaggle on
imdb_id (challenge.py≈L146-150 [R]) and left movies⋈pivoted-ratings on
kaggle_id (≈L192-194 [R]); the full Spark join surface is declared per
SURVEY.md §2.D. Scale notes per query: which side broadcasts, where the
shuffle lands, and what AQE is expected to do at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.hashsafe import dsum, sql_dsum
from .registry import query
from .sources.fixtures import load_table


@query(
    "q_join_inner",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def q_join_inner(spark, sf_dir):
    """Equi inner join (the wiki⋈kaggle-on-imdb_id analog,
    challenge.py≈L146-150 [R]).

    Left to Catalyst: at fixture scale AQE turns this into a broadcast
    hash join (customer is tiny); at 100 TB with both sides large it
    becomes a shuffled sort-merge join on the key — same code. Skewed
    custkeys are split by AQE skew-join handling.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "inner")
            .select("c_custkey", "c_name", "o_orderkey", "o_totalprice"))


@query(
    "q_join_broadcast",
    oracle="""
    SELECT c.c_custkey, n.n_name, r.r_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def q_join_broadcast(spark, sf_dir):
    """Broadcast hash join on dimension tables, hinted explicitly.

    nation (25 rows) and region (5 rows) are the canonical broadcast
    dims: F.broadcast() pins the plan so the fact side never shuffles —
    at 100 TB this is a map-side join over every customer partition
    with zero exchange.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .select("c_custkey", "n_name", "r_name"))


@query(
    "q_join_left",
    oracle=f"""
    SELECT c.c_custkey,
           coalesce(oc.n_orders, 0) AS n_orders,
           coalesce(oc.sum_price, 0.0) AS sum_price
    FROM customer c
    LEFT JOIN (
      SELECT o_custkey, count(*) AS n_orders,
             {sql_dsum('o_totalprice', 'sum_price')}
      FROM orders GROUP BY o_custkey
    ) oc ON c.c_custkey = oc.o_custkey
    """,
)
def q_join_left(spark, sf_dir):
    """Left outer join + fillna(0) on the right-side columns — the
    reference's ratings-merge (challenge.py≈L192-195 [R]: left merge
    then fillna(0) for movies with no ratings).

    Aggregating BEFORE the join keeps the join input at |customers| x
    |distinct custkeys| instead of |customers| x |orders| — the
    classic pre-aggregation that matters at 100 TB.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    oc = o.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice", "sum_price"),
    )
    return (c.join(oc, c.c_custkey == oc.o_custkey, "left")
            .select(
                "c_custkey",
                F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
                F.coalesce("sum_price", F.lit(0.0)).alias("sum_price"),
            ))


@query(
    "q_join_right",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           o.o_orderkey, o.o_orderpriority
    FROM (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_right(spark, sf_dir):
    """Right outer join (closes the join matrix: inner/left/right/full/
    semi/anti/cross all have dedicated qids). Semantically the mirror
    of q_join_left; Spark plans it as the same shuffled hash/SMJ with
    build side flipped, so it carries the same 100 TB posture."""
    c = load_table(spark, sf_dir, "customer")
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderpriority") == "1-URGENT"))
    return (o.join(c, o.o_custkey == c.c_custkey, "right")
            .select("c_custkey", "c_mktsegment",
                    "o_orderkey", "o_orderpriority"))


@query(
    "q_join_multi_5way",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           count(*) AS n_lineitems,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q_join_multi_5way(spark, sf_dir):
    """5-way join lineitem⋈orders⋈customer⋈nation⋈region + aggregation
    (TPC-H Q5 shape).

    Join order follows fact-to-dim cardinality; nation/region are
    explicitly broadcast, orders⋈customer is left to AQE (broadcast at
    fixture scale, shuffle at 100 TB). The final agg reduces to 25
    groups, so the last shuffle is negligible regardless of scale.
    """
    t = {n: load_table(spark, sf_dir, n)
         for n in ("lineitem", "orders", "customer", "nation", "region")}
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_lineitems"), dsum(revenue, "revenue"))
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_semi(spark, sf_dir):
    """Left semi join: customers WITH orders (EXISTS). The probe side
    streams; only the key set of orders is built — no row multiplication,
    no payload shuffle from the right side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
            .select("c_custkey", "c_name"))


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def q_join_anti(spark, sf_dir):
    """Left anti join: customers WITHOUT any urgent order (NOT EXISTS;
    restricted to urgent so the result is non-empty at every sf)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    return (c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
            .select("c_custkey", "c_name"))


@query(
    "q_join_range",
    oracle="""
    SELECT e1.event_id AS eid_a, e2.event_id AS eid_b, e1.user_id
    FROM events e1
    JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts >= e1.ts
     AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
     AND e1.event_id < e2.event_id
    """,
)
def q_join_range(spark, sf_dir):
    """Theta/interval self-join: event pairs per user within 5 minutes.

    Spark has no native interval join; the Spark-first expression is an
    equi-join on user_id with the range as a residual predicate —
    nested-loop only WITHIN each user's join partition, never globally
    quadratic. At 100 TB the additional trick is bucketing ts into
    5-minute bands and equi-joining on (user_id, band) ∪ (user_id,
    band+1) so each row meets only ~2 bands of candidates (implemented
    in operators/rangejoin.py; semantics identical, used when per-key
    cardinality is large).
    """
    e = load_table(spark, sf_dir, "events")
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    return (
        e1.join(
            e2,
            (F.col("e1.user_id") == F.col("e2.user_id"))
            & (F.col("e2.ts") >= F.col("e1.ts"))
            & (F.col("e2.ts") <= F.col("e1.ts") + F.expr("INTERVAL 5 MINUTES"))
            & (F.col("e1.event_id") < F.col("e2.event_id")),
        )
        .select(
            F.col("e1.event_id").alias("eid_a"),
            F.col("e2.event_id").alias("eid_b"),
            F.col("e1.user_id").alias("user_id"),
        )
    )


@query(
    "q_join_asof",
    oracle="""
    WITH pairs AS (
      SELECT e.event_id AS err_id, e.ts AS err_ts, e.user_id,
             c.ts AS click_ts, c.event_id AS click_id
      FROM events e
      JOIN events c
        ON c.user_id = e.user_id AND c.event_type = 'click' AND c.ts <= e.ts
      WHERE e.event_type = 'error'
    ),
    latest AS (
      SELECT err_id, max(err_ts) AS err_ts, max(user_id) AS user_id,
             max(click_ts) AS asof_click_ts
      FROM pairs GROUP BY err_id
    )
    SELECT l.err_id, l.err_ts, l.user_id, l.asof_click_ts,
           max(p.click_id) AS asof_click_id
    FROM latest l
    JOIN pairs p ON p.err_id = l.err_id AND p.click_ts = l.asof_click_ts
    GROUP BY l.err_id, l.err_ts, l.user_id, l.asof_click_ts
    """,
)
def q_join_asof(spark, sf_dir):
    """As-of join: for each 'error' event, the latest prior 'click' by
    the same user (deterministic: ties on ts broken by max event_id).

    Spark-first expression: equi-join on user_id + ts<= predicate, then
    argmax via max(struct(ts, event_id)) — lexicographic struct max
    gives (latest ts, then highest id) in one hash aggregation, no
    window sort. operators/asof.py carries the applyInPandas
    merge_asof variant for wide payloads at scale.
    """
    e = load_table(spark, sf_dir, "events")
    errors = (e.filter(F.col("event_type") == "error")
              .select(F.col("event_id").alias("err_id"),
                      F.col("ts").alias("err_ts"),
                      "user_id"))
    clicks = (e.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user_id"),
                      F.col("ts").alias("click_ts"),
                      F.col("event_id").alias("click_id")))
    joined = errors.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") <= F.col("err_ts")),
        "inner",
    )
    best = F.max(F.struct("click_ts", "click_id")).alias("best")
    return (joined.groupBy("err_id", "err_ts", "user_id").agg(best)
            .select(
                "err_id", "err_ts", "user_id",
                F.col("best.click_ts").alias("asof_click_ts"),
                F.col("best.click_id").alias("asof_click_id"),
            ))


@query(
    "q_join_full",
    oracle="""
    SELECT coalesce(a.o_custkey, b.o_custkey) AS custkey,
           coalesce(a.n_urgent, 0) AS n_urgent,
           coalesce(b.n_big, 0) AS n_big
    FROM (SELECT o_custkey, count(*) AS n_urgent FROM orders
          WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) a
    FULL JOIN (SELECT o_custkey, count(*) AS n_big FROM orders
               WHERE o_totalprice > 150000 GROUP BY o_custkey) b
      ON a.o_custkey = b.o_custkey
    """,
)
def q_join_full(spark, sf_dir):
    """Full outer join between two aggregates whose key sets only
    partially overlap (urgent-order customers vs big-order customers) +
    coalesced key and zero fills."""
    o = load_table(spark, sf_dir, "orders")
    a = (o.filter(F.col("o_orderpriority") == "1-URGENT")
         .groupBy("o_custkey").agg(F.count("*").alias("n_urgent")))
    b = (o.filter(F.col("o_totalprice") > 150000)
         .groupBy(F.col("o_custkey").alias("b_custkey"))
         .agg(F.count("*").alias("n_big")))
    return (a.join(b, a.o_custkey == b.b_custkey, "full")
            .select(
                F.coalesce("o_custkey", "b_custkey").alias("custkey"),
                F.coalesce("n_urgent", F.lit(0)).alias("n_urgent"),
                F.coalesce("n_big", F.lit(0)).alias("n_big"),
            ))


@query(
    "q_cross_join",
    oracle="""
    SELECT r.r_name, n.n_name, r.r_name || '/' || n.n_name AS pair
    FROM region r CROSS JOIN nation n
    """,
)
def q_cross_join(spark, sf_dir):
    """Cross join (O(n*m) guarded: both sides are bounded dimension
    tables — the only safe shape for a cross join at any scale)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (r.crossJoin(n)
            .select("r_name", "n_name",
                    F.concat_ws("/", "r_name", "n_name").alias("pair")))


@query(
    "q_join_nullsafe",
    oracle="""
    WITH l AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_orderkey % 50 END AS grp
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    r AS (
      SELECT CASE WHEN s_suppkey % 11 = 0 THEN NULL
                  ELSE s_suppkey % 50 END AS grp,
             count(*) AS n_sup
      FROM supplier GROUP BY 1
    )
    SELECT l.o_orderkey, l.grp, r.n_sup
    FROM l JOIN r ON l.grp IS NOT DISTINCT FROM r.grp
    """,
)
def q_join_nullsafe(spark, sf_dir):
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics ETL key
    reconciliation needs when 'unknown' is a legitimate key value.
    Spark plans <=> as a hash-join key (EqualNullSafe is still an
    equi-condition), so this stays a shuffled/broadcast hash join, not
    a nested loop."""
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderkey") % 3 == 0)
         .select("o_orderkey",
                 F.when(F.col("o_orderkey") % 7 == 0, None)
                 .otherwise(F.col("o_orderkey") % 50).alias("grp")))
    s = (load_table(spark, sf_dir, "supplier")
         .select(F.when(F.col("s_suppkey") % 11 == 0, None)
                 .otherwise(F.col("s_suppkey") % 50).alias("grp"))
         .groupBy("grp").agg(F.count("*").alias("n_sup")))
    return (o.join(s, o.grp.eqNullSafe(s.grp))
            .select("o_orderkey", o.grp.alias("grp"), "n_sup"))


@query(
    "q_join_salted",
    oracle="""
    SELECT s.s_nationkey AS s_nationkey,
           count(*) AS n_items,
           round(cast(sum(cast(l.l_extendedprice as decimal(30,10)))
                      as double), 4) AS sum_price
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1
    """,
)
def q_join_salted(spark, sf_dir):
    """Skew-mitigated (salted) fact-dim join: the dim side is
    replicated k=8 times with an explicit salt column and the fact side
    deterministically picks a salt per row, so a hot supplier key fans
    out over 8 reducers instead of melting one. The salt is dropped
    before the aggregate, so the result is EXACTLY the plain join the
    oracle runs — salting changes distribution, never semantics. (AQE
    skew-join handles this adaptively when partition-size stats trip;
    explicit salting is the belt-and-suspenders form for known-skewed
    keys at 100 TB, and composes with the map-side-combinable agg
    here.) Companion to q_agg_salted's aggregation-side salting."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    k = 8
    dim = (s.select("s_suppkey", "s_nationkey")
           .withColumn("salt", F.explode(F.array(
               *[F.lit(i) for i in range(k)]))))
    fact = li.select("l_suppkey", "l_extendedprice",
                     (F.col("l_orderkey") % k).cast("int").alias("salt"))
    joined = fact.join(dim, (fact.l_suppkey == dim.s_suppkey)
                       & (fact.salt == dim.salt))
    return (joined.groupBy("s_nationkey")
            .agg(F.count("*").alias("n_items"),
                 dsum("l_extendedprice", "sum_price")))


@query(
    "q_join_asof_nearest",
    oracle="""
    WITH pairs AS (
      SELECT e.event_id AS err_id, e.ts AS err_ts, e.user_id,
             abs(epoch_us(e.ts) - epoch_us(c.ts)) AS diff_us,
             c.ts AS click_ts, c.event_id AS click_id
      FROM events e
      JOIN events c ON c.user_id = e.user_id AND c.event_type = 'click'
      WHERE e.event_type = 'error'
    )
    SELECT err_id, max(err_ts) AS err_ts, max(user_id) AS user_id,
           (min(struct_pack(d := diff_us, t := click_ts,
                            id := click_id))).id AS nearest_click_id,
           min(diff_us) AS nearest_diff_us
    FROM pairs GROUP BY err_id
    """,
)
def q_join_asof_nearest(spark, sf_dir):
    """Nearest-direction as-of join (the merge_asof direction='nearest'
    twin of q_join_asof's backward default): for each 'error' event the
    same-user 'click' minimizing |Δts|, ties to the EARLIER click then
    lower id — argmin via one lexicographic struct-min aggregation
    (|Δ| in exact integer microseconds), no window sort, exactly the
    q_join_asof shape. Same scale posture too: user-equi join feeds the
    argmin; operators/asof.py's cogrouped merge_asof is the declared
    path when per-user event counts make the pair relation too wide."""
    e = load_table(spark, sf_dir, "events")
    errors = (e.filter(F.col("event_type") == "error")
              .select(F.col("event_id").alias("err_id"),
                      F.col("ts").alias("err_ts"), "user_id"))
    clicks = (e.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user_id"),
                      F.col("ts").alias("click_ts"),
                      F.col("event_id").alias("click_id")))
    diff = F.abs(F.unix_micros("err_ts") - F.unix_micros("click_ts"))
    best = F.min(F.struct(diff.alias("d"), F.col("click_ts").alias("t"),
                          F.col("click_id").alias("id"))).alias("best")
    return (errors.join(clicks, F.col("user_id") == F.col("c_user_id"))
            .groupBy("err_id", "err_ts", "user_id").agg(best)
            .select("err_id", "err_ts", "user_id",
                    F.col("best.id").alias("nearest_click_id"),
                    F.col("best.d").alias("nearest_diff_us")))


@query(
    "q_join_bucketed",
    oracle=f"""
    SELECT c.c_mktsegment, count(*) AS n_orders,
           {sql_dsum('o.o_totalprice', 'sum_price')}
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_join_bucketed(spark, sf_dir):
    """Shuffle-free co-located join via bucketing: both sides are
    written `bucketBy(8, key).sortBy(key)` into managed tables, then
    joined with a sort-merge hint — Spark recognizes the matching
    bucket specs and elides BOTH exchanges (asserted plan-level in
    tests/test_bucketing.py).

    This is the 100 TB pattern for repeated fact-fact joins on one
    key: pay the partitioned write once, then every downstream join on
    that key is a zero-shuffle merge of co-located buckets. The write
    here is part of the measured operator (idempotent overwrite into
    the gitignored warehouse, table names keyed by the sf dir so
    scales don't collide); the only remaining shuffle is the final
    8-partition rollup on c_mktsegment."""
    import hashlib
    import shutil
    from pathlib import Path
    from urllib.parse import urlparse

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    ot, ct = f"orders_bkt_{tag}", f"customer_bkt_{tag}"
    # a table dropped from a FRESH session's in-memory catalog can
    # leave an orphaned warehouse directory behind, which
    # saveAsTable(overwrite) refuses (LOCATION_ALREADY_EXISTS) — clear
    # both catalog entry and location (on a cluster: a filesystem rm
    # against the shared warehouse)
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in (ot, ct):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = Path(wh) / t
        if loc.exists():
            shutil.rmtree(loc)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    (o.select("o_orderkey", "o_custkey", "o_totalprice")
     .write.mode("overwrite").bucketBy(8, "o_custkey")
     .sortBy("o_custkey").saveAsTable(ot))
    (c.select("c_custkey", "c_mktsegment")
     .write.mode("overwrite").bucketBy(8, "c_custkey")
     .sortBy("c_custkey").saveAsTable(ct))
    ob, cb = spark.table(ot), spark.table(ct)
    return (ob.hint("merge")
            .join(cb.hint("merge"), ob.o_custkey == cb.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_orders"),
                 dsum("o_totalprice", "sum_price")))
