"""Category E — aggregations.

Reference parity: the reference's only aggregation is
ratings.groupby(['movieId','rating']).count() → pivot → fillna
(challenge.py≈L187-195 [R]); the full Spark agg surface is declared per
SURVEY.md §2.E. All double reductions use the decimal-exact helpers
(functions/hashsafe.py) so results are order-independent at any
partitioning.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.hashsafe import DEC, davg, dsum, sql_davg, sql_dsum
from .registry import query
from .sources.fixtures import load_table

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@query(
    "q_agg_hash",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {sql_davg('l_quantity', 'avg_qty', gdp=0)},
           {sql_davg('l_extendedprice', 'avg_price', gdp=2)},
           {sql_davg('l_discount', 'avg_disc', gdp=2)},
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_hash(spark, sf_dir):
    """Multi-key hash aggregation, TPC-H Q1 shape (8 aggregates).

    Reference: ratings.groupby(['movieId','rating']).count()
    (challenge.py≈L187-189 [R]). Physical plan: partial HashAggregate
    (map-side combine) -> shuffle on (returnflag, linestatus) -> final
    HashAggregate, all inside whole-stage codegen. Shuffle volume is
    O(#groups x #partitions), independent of row count — the canonical
    100 TB-safe aggregation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.expr("TIMESTAMP_NTZ '1998-09-02'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty", gdp=0),
            davg("l_extendedprice", "avg_price", gdp=2),
            davg("l_discount", "avg_disc", gdp=2),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q_agg_distinct",
    oracle=f"""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_custs,
           round(cast(sum(DISTINCT cast(o_totalprice as {DEC})) as double), 4)
             AS sum_distinct_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_distinct(spark, sf_dir):
    """count(DISTINCT) + sum(DISTINCT) per group.

    Reference: the drop_duplicates(subset='imdb_id') spirit
    (challenge.py≈L85 [R]). Spark plans distinct aggs as an Expand +
    two-phase aggregation; sum(DISTINCT) goes through decimal so the
    reduction over the distinct set is order-independent.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.round(
            F.sum_distinct(F.col("o_totalprice").cast(DEC)).cast("double"), 4
        ).alias("sum_distinct_price"),
    )


@query(
    "q_agg_stats",
    oracle=f"""
    SELECT c_mktsegment,
           round(min(c_acctbal), 4) + 0.0 AS min_bal,
           round(max(c_acctbal), 4) AS max_bal,
           {sql_davg('c_acctbal', 'avg_bal', gdp=2)},
           round(sqrt(greatest(
             (cast(sum(cast(c_acctbal * c_acctbal as {DEC})) as double)
              - cast(sum(cast(c_acctbal as {DEC})) as double) ^ 2 / count(c_acctbal))
             / nullif(count(c_acctbal) - 1, 0), 0)), 4) AS stddev_bal,
           round(greatest(
             (cast(sum(cast(c_acctbal * c_acctbal as {DEC})) as double)
              - cast(sum(cast(c_acctbal as {DEC})) as double) ^ 2 / count(c_acctbal))
             / nullif(count(c_acctbal) - 1, 0), 0), 4) AS var_bal,
           count(c_acctbal) AS n
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q_agg_stats(spark, sf_dir):
    """min/max/avg/stddev_samp/var_samp, rounded to 4 dp.

    Reference: notebook .describe() exploration [R]. Hash-stability: the
    engines' native single-pass stddev accumulates doubles in
    partition order, so low bits differ run-to-run; instead both sides
    compute the two-pass moment formula over *exact decimal sums*
    (sum(x), sum(x^2) exact -> identical doubles -> identical variance).
    At scale this is still one map-side-combined pass — two decimal
    accumulators per group.
    """
    c = load_table(spark, sf_dir, "customer")
    x = F.col("c_acctbal")
    sum_x = F.sum(x.cast(DEC)).cast("double")
    sum_x2 = F.sum((x * x).cast(DEC)).cast("double")
    n = F.count(x)
    var = F.greatest(
        (sum_x2 - F.pow(sum_x, 2) / n) / F.nullif(n - F.lit(1), F.lit(0)),
        F.lit(0.0),
    )
    return c.groupBy("c_mktsegment").agg(
        F.round(F.min(x), 4).alias("min_bal"),
        F.round(F.max(x), 4).alias("max_bal"),
        davg("c_acctbal", "avg_bal", gdp=2),
        F.round(F.sqrt(var), 4).alias("stddev_bal"),
        F.round(var, 4).alias("var_bal"),
        n.alias("n"),
    )


@query("q_agg_approx")  # rows-only: HLL++ sketch differs from DuckDB's
def q_agg_approx(spark, sf_dir):
    """Approximate count-distinct (HyperLogLog++) with an exact twin.

    No reference analog. Declared rows-only: the sketch estimate is
    engine-specific. The exact countDistinct column rides along so the
    row content is still sanity-checkable. At 100 TB the approx column
    is the one you can afford: fixed-size sketch per group, no Expand.
    """
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


@query(
    "q_rollup",
    oracle=f"""
    SELECT r_name, n_name,
           count(*) AS n_suppliers,
           {sql_dsum('s_acctbal', 'sum_bal')},
           cast(grouping(r_name) + 2 * grouping(n_name) as bigint) AS gid
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_rollup(spark, sf_dir):
    """Hierarchical subtotals region -> nation -> grand total.

    No reference analog (SURVEY.md §2.E). grouping() flags are encoded
    explicitly (r + 2*n) so the subtotal rows hash identically across
    engines regardless of native grouping_id bit conventions.
    """
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
         .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    return j.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_suppliers"),
        dsum("s_acctbal", "sum_bal"),
        (F.grouping("r_name") + 2 * F.grouping("n_name")).cast("bigint").alias("gid"),
    )


@query(
    "q_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           {sql_dsum('o_totalprice', 'sum_price')},
           cast(grouping(o_orderstatus) + 2 * grouping(o_orderpriority) as bigint)
             AS gid
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark, sf_dir):
    """All grouping combinations (CUBE)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice", "sum_price"),
        (F.grouping("o_orderstatus") + 2 * F.grouping("o_orderpriority"))
        .cast("bigint").alias("gid"),
    )


@query(
    "q_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           {sql_dsum('o_totalprice', 'sum_price')},
           cast(grouping(o_orderstatus) + 2 * grouping(o_orderpriority) as bigint)
             AS gid
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS with grouping flags (SQL API path — Catalyst
    parses the SQL string; same plan as the DataFrame cube/rollup)."""
    import uuid as _uuid
    o = load_table(spark, sf_dir, "orders")
    view = f"orders_gs_{_uuid.uuid4().hex[:8]}"
    o.createOrReplaceTempView(view)
    return spark.sql(f"""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(cast(sum(cast(o_totalprice as {DEC})) as double), 4)
                 AS sum_price,
               cast(grouping(o_orderstatus) + 2 * grouping(o_orderpriority) as bigint)
                 AS gid
        FROM {view}
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


def _pivot_oracle() -> str:
    cases = ", ".join(
        f"count(CASE WHEN event_type = '{v}' THEN 1 END) AS evt_{v}"
        for v in EVENT_TYPES
    )
    return f"SELECT user_id, {cases} FROM events GROUP BY user_id"


@query("q_pivot", oracle=_pivot_oracle())
def q_pivot(spark, sf_dir):
    """Pivot: per-user wide table of event_type counts, fillna 0.

    Reference: the rating-counts pivot —
    .pivot(index='movieId', columns='rating', values='count') + 'rating_'
    prefix + fillna(0) (challenge.py≈L189-195 [R]). The pivot value list
    is EXPLICIT (the 5 verified event types): without it Spark runs a
    driver-side distinct scan to discover columns — a non-starter at
    100 TB and a schema-stability hazard anywhere.
    """
    e = load_table(spark, sf_dir, "events")
    wide = (e.groupBy("user_id")
            .pivot("event_type", EVENT_TYPES)
            .count()
            .na.fill(0, [*EVENT_TYPES]))
    renamed = wide.select(
        "user_id",
        *[F.col(v).cast("bigint").alias(f"evt_{v}") for v in EVENT_TYPES],
    )
    return renamed


def _unpivot_oracle() -> str:
    selects = " UNION ALL ".join(
        f"SELECT user_id, '{v}' AS event_type, evt_{v} AS n FROM wide"
        for v in EVENT_TYPES
    )
    return f"WITH wide AS ({_pivot_oracle()}) {selects}"


@query("q_unpivot", oracle=_unpivot_oracle())
def q_unpivot(spark, sf_dir):
    """Unpivot (stack) — the inverse of q_pivot: the wide per-user
    event-count table back to (user_id, event_type, n) long form. Uses
    the stack() table generator; zero-count cells are retained so
    pivot->unpivot is lossless."""
    wide = q_pivot(spark, sf_dir)
    stack_args = ", ".join(f"'{v}', evt_{v}" for v in EVENT_TYPES)
    return wide.selectExpr(
        "user_id",
        f"stack({len(EVENT_TYPES)}, {stack_args}) AS (event_type, n)",
    )


@query(
    "q_agg_collect",
    oracle="""
    SELECT o_orderpriority,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
             AS statuses,
           count(DISTINCT o_orderstatus) AS n_statuses
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_collect(spark, sf_dir):
    """collect_set aggregation, made deterministic: the collected set is
    sorted and joined to a string (collection order is partition-
    dependent on any engine; sort-at-the-edge is the hash-stable form).
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("o_orderstatus")))
        .alias("statuses"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


@query(
    "q_agg_bool",
    oracle="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           count(CASE WHEN o_totalprice > 200000 THEN 1 END) AS n_over_200k
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_agg_bool(spark, sf_dir):
    """Boolean aggregates: every/any (bool_and/bool_or) + conditional
    count."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias("n_over_200k"),
    )


@query(
    "q_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_percentiles(spark, sf_dir):
    """Exact continuous percentiles (linear interpolation between order
    statistics — the same definition in Spark's percentile() and
    DuckDB's quantile_cont). The approximate sibling for 100 TB is
    percentile_approx (bounded-memory sketch), exercised rows-only in
    q_agg_approx's family."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


@query(
    "q_agg_argmax",
    oracle="""
    SELECT o_orderpriority,
           (max(struct_pack(p := o_totalprice, k := o_orderkey))).k
             AS max_key,
           max(o_totalprice) AS max_price,
           (min(struct_pack(p := o_totalprice, k := o_orderkey))).k
             AS min_key,
           min(o_totalprice) AS min_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_argmax(spark, sf_dir):
    """argmax/argmin aggregation (max_by/min_by): the key of the
    extreme row per group — one pass, no window, no self-join. The
    ordering value is the (price, key) struct on both engines
    (lexicographic comparison; DuckDB expresses argmax as
    max-of-struct + field access), so ties on price resolve to the
    same key deterministically."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey",
                 F.struct("o_totalprice", "o_orderkey")).alias("max_key"),
        F.max("o_totalprice").alias("max_price"),
        F.min_by("o_orderkey",
                 F.struct("o_totalprice", "o_orderkey")).alias("min_key"),
        F.min("o_totalprice").alias("min_price"),
    )


@query(
    "q_agg_corr",
    oracle="""
    WITH sums AS (
      SELECT l_returnflag, count(*) AS n,
             cast(sum(cast(l_quantity as decimal(30,10))) as double) AS sx,
             cast(sum(cast(l_extendedprice as decimal(30,10))) as double)
               AS sy,
             cast(sum(cast(l_quantity * l_quantity as decimal(30,10)))
                  as double) AS sxx,
             cast(sum(cast(l_extendedprice * l_extendedprice
                           as decimal(30,10))) as double) AS syy,
             cast(sum(cast(l_quantity * l_extendedprice as decimal(30,10)))
                  as double) AS sxy
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag, n,
           round((sxy - sx * sy / n) / (n - 1), 4) + 0.0 AS covar,
           round(((sxy - sx * sy / n) / (n - 1))
                 / (sqrt((sxx - sx * sx / n) / (n - 1))
                    * sqrt((syy - sy * sy / n) / (n - 1))), 6) + 0.0 AS corr
    FROM sums
    """,
)
def q_agg_corr(spark, sf_dir):
    """Per-group covariance and Pearson correlation, computed from ONE
    pass of exact decimal moment sums (n, Sx, Sy, Sxx, Syy, Sxy) —
    not the engines' covar_samp/corr built-ins, whose internal float
    accumulation differs between Spark's partial-merge tree and
    DuckDB's scan order. Deriving both statistics from order-
    independent sums with an identical IEEE expression tree makes the
    result bit-stable on any partitioning — the same one-pass moments
    trick every distributed stats library uses at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    dec = "decimal(30,10)"
    sums = (li.groupBy("l_returnflag")
            .agg(F.count("*").alias("n"),
                 F.sum(x.cast(dec)).cast("double").alias("sx"),
                 F.sum(y.cast(dec)).cast("double").alias("sy"),
                 F.sum((x * x).cast(dec)).cast("double").alias("sxx"),
                 F.sum((y * y).cast(dec)).cast("double").alias("syy"),
                 F.sum((x * y).cast(dec)).cast("double").alias("sxy")))
    n = F.col("n")
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)
    sdx = F.sqrt((F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1))
    sdy = F.sqrt((F.col("syy") - F.col("sy") * F.col("sy") / n) / (n - 1))
    return sums.select("l_returnflag", "n",
                       F.round(cov, 4).alias("covar"),
                       F.round(cov / (sdx * sdy), 6).alias("corr"))


@query("q_agg_sketch_reagg")  # rows-only: datasketches HLL binary sketches
def q_agg_sketch_reagg(spark, sf_dir):
    """Re-aggregatable distinct-count sketches — the pattern that makes
    100 TB rollup maintenance cheap: build an HLL sketch of customers
    per nation ONCE (one pass over the fact table), then roll nation
    sketches up to regions by MERGING sketches (hll_union_agg) — no
    second scan of raw data, ever. The exact countDistinct twin rides
    alongside for the error-bound test (tests/test_timeseries.py
    asserts <5% relative error). Rows-only: the sketch binary is
    engine-specific (Apache DataSketches HLL_4).

    At scale the nation-level sketch relation is what you persist;
    every re-slice (region, continent, global) is a merge over that
    tiny relation instead of a distinct over the fact table."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    per_nation = (c.groupBy("c_nationkey")
                  .agg(F.expr("hll_sketch_agg(c_custkey)").alias("sk"),
                       F.countDistinct("c_custkey").alias("exact_nation")))
    with_region = per_nation.join(
        F.broadcast(n.select("n_nationkey", "n_regionkey")),
        per_nation.c_nationkey == F.col("n_nationkey"))
    return (with_region.groupBy("n_regionkey")
            .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))")
                 .alias("approx_customers"),
                 F.sum("exact_nation").alias("exact_customers"))
            .orderBy("n_regionkey"))


@query("q_percentile_approx")  # rows-only: sketch is engine-specific
def q_percentile_approx(spark, sf_dir):
    """Mergeable approximate percentiles — the percentile path that
    actually runs at 100 TB: percentile_approx's partition summaries
    merge associatively (one map-side-combinable agg, no per-group
    sort), unlike the exact percentile() twin (q_percentiles) whose
    within-group sort this query exists to replace at scale. accuracy
    =10000 bounds rank error at n/10000. Rows-only by design: the
    sketch layout is engine-specific; the error bound vs the exact
    twin is pinned in tests/test_operators.py."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = F.expr("percentile_approx(l_extendedprice, "
                "array(0.5, 0.9, 0.99), 10000)")
    return (li.groupBy("l_returnflag")
            .agg(F.round(pa[0], 2).alias("p50_approx"),
                 F.round(pa[1], 2).alias("p90_approx"),
                 F.round(pa[2], 2).alias("p99_approx"),
                 F.count("*").alias("n")))


@query("q_hll_intersection")  # rows-only: sketch estimates are engine-specific
def q_hll_intersection(spark, sf_dir):
    """Cross-cohort audience overlap from sketches alone: one HLL
    sketch of user_id per event_type (map-side-combinable agg), then
    every cohort pair's |A∩B| estimated by inclusion-exclusion
    (est(A)+est(B)−est(A∪B)) where A∪B is an hll_union of the two
    sketches — no rescan of the fact table for any of the
    |types|²/2 pairs. The sketch-rollup family's intersection member
    (cf. q_agg_sketch_reagg's union rollup, q_minhash_reagg's Jaccard).
    Rows-only by design (sketch layouts are engine-specific); relative
    error vs the exact distinct-intersection twin is pinned in
    tests/test_operators.py.

    Scale: the pair join runs on the |types|-row persisted sketch
    relation; sketches are ~KB each regardless of cohort size."""
    e = load_table(spark, sf_dir, "events")
    sk = (e.groupBy("event_type")
          .agg(F.expr("hll_sketch_agg(user_id, 14)").alias("sk"))
          .persist())
    a = sk.select(F.col("event_type").alias("type_a"),
                  F.col("sk").alias("sk_a"))
    b = sk.select(F.col("event_type").alias("type_b"),
                  F.col("sk").alias("sk_b"))
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    est = ("cast(round(hll_sketch_estimate(sk_a) "
           "+ hll_sketch_estimate(sk_b) "
           "- hll_sketch_estimate(hll_union(sk_a, sk_b))) as bigint)")
    return (pairs.select(
        "type_a", "type_b",
        F.expr("cast(round(hll_sketch_estimate(sk_a)) as bigint)")
        .alias("est_a"),
        F.expr("cast(round(hll_sketch_estimate(sk_b)) as bigint)")
        .alias("est_b"),
        F.expr(est).alias("est_overlap"))
        .orderBy("type_a", "type_b"))


# ---------------------------------------------------------------------------
# Round 7: hash-checked companions for the rows-only sketch family
# (the q_embed_pca_check / q_isotonic_check pattern, VERDICT r6 item 4):
# each pins an engine-independent derived invariant — the exact twin's
# values (hash-checked outright) plus the sketch's documented error
# bound as a boolean the oracle states as literal true. A sketch
# regression flips the boolean and breaks the value hash.
# ---------------------------------------------------------------------------

@query(
    "q_percentile_check",
    oracle="""
    SELECT l_returnflag,
           cast(count(*) as bigint) AS n,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_exact,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_exact,
           true AS p50_ok, true AS p90_ok, true AS p99_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_percentile_check(spark, sf_dir):
    """Hash-checked companion of q_percentile_approx (rows-only by
    design: the KLL-style sketch layout is engine-specific). The
    engine-independent invariant: percentile_approx(accuracy=10000)
    bounds rank error at n/10000, which on these smooth fixture
    distributions translates to well under 2% relative value error vs
    the exact interpolated percentile (the bound
    tests/test_operators.py has pinned since round 4). This query
    emits the exact percentiles themselves (hash-checked — Spark
    percentile() and DuckDB quantile_cont share the interpolation
    definition, proven by q_percentiles) plus the within-bound
    booleans, whose oracle value is literal true: a sketch regression
    flips a boolean and fails the hash.

    Scale: the approx arm is the one that runs at 100 TB (mergeable,
    map-side-combinable); the exact arm is the eval harness and runs
    on a sampled slice there — the check's pattern stays."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = F.expr("percentile_approx(l_extendedprice, "
                "array(0.5, 0.9, 0.99), 10000)")
    pe = F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))")
    g = (li.groupBy("l_returnflag")
         .agg(F.count("*").alias("n"), pa.alias("pa"), pe.alias("pe")))

    def ok(i: int):
        return (F.abs(F.col("pa")[i] - F.col("pe")[i])
                / F.col("pe")[i] < 0.02)

    return g.select(
        "l_returnflag", "n",
        F.round(F.col("pe")[0], 4).alias("p50_exact"),
        F.round(F.col("pe")[1], 4).alias("p90_exact"),
        F.round(F.col("pe")[2], 4).alias("p99_exact"),
        ok(0).alias("p50_ok"), ok(1).alias("p90_ok"),
        ok(2).alias("p99_ok"))


@query(
    "q_sketch_reagg_check",
    oracle="""
    SELECT n_regionkey,
           cast(count(DISTINCT c_custkey) as bigint) AS exact_customers,
           true AS within_5pct
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_regionkey
    """,
)
def q_sketch_reagg_check(spark, sf_dir):
    """Hash-checked companion of q_agg_sketch_reagg (rows-only by
    design: DataSketches HLL_4 binaries are engine-specific). The
    invariant: the region estimate obtained by MERGING nation sketches
    (hll_union_agg — one pass over the fact table, ever) stays within
    5% of the exact region distinct (HLL default lgK=12 → ~1.6% RSE;
    5% is the bound tests/test_timeseries.py pins). Emits the exact
    per-region count (hash-checked against DuckDB's exact DISTINCT)
    and the bound boolean (oracle: literal true).

    Scale: the exact arm here is per-nation countDistinct rolled up by
    sum (customers belong to exactly one nation), so even the check
    query never runs a region-wide distinct over raw rows."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    per_nation = (c.groupBy("c_nationkey")
                  .agg(F.expr("hll_sketch_agg(c_custkey)").alias("sk"),
                       F.countDistinct("c_custkey").alias("exact_nation")))
    with_region = per_nation.join(
        F.broadcast(n.select("n_nationkey", "n_regionkey")),
        per_nation.c_nationkey == F.col("n_nationkey"))
    agg = (with_region.groupBy("n_regionkey")
           .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))")
                .alias("approx"),
                F.sum("exact_nation").cast("long")
                .alias("exact_customers")))
    return agg.select(
        "n_regionkey", "exact_customers",
        (F.abs(F.col("approx") - F.col("exact_customers"))
         / F.col("exact_customers") <= 0.05).alias("within_5pct"))


@query(
    "q_hll_intersection_check",
    oracle="""
    WITH users AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), sizes AS (
      SELECT event_type, cast(count(*) as bigint) AS n
      FROM users GROUP BY event_type
    ), overlap AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             cast(count(*) as bigint) AS exact_overlap
      FROM users a JOIN users b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT sa.event_type AS type_a, sb.event_type AS type_b,
           sa.n AS exact_a, sb.n AS exact_b,
           cast(coalesce(o.exact_overlap, 0) as bigint) AS exact_overlap,
           true AS within_bound
    FROM sizes sa
    JOIN sizes sb ON sa.event_type < sb.event_type
    LEFT JOIN overlap o
      ON o.type_a = sa.event_type AND o.type_b = sb.event_type
    """,
)
def q_hll_intersection_check(spark, sf_dir):
    """Hash-checked companion of q_hll_intersection (rows-only by
    design: sketch estimates are engine-specific). The invariant: the
    inclusion-exclusion overlap estimate (est(A)+est(B)−est(A∪B) from
    HLL(14) sketches, ~0.4% RSE compounded across three estimates)
    stays within max(5% of (|A|+|B|), 10) of the exact distinct
    intersection — the tests/test_operators.py bound. Emits the exact
    cohort sizes and exact overlap (hash-checked — plain DISTINCT
    arithmetic on both engines) plus the bound boolean (oracle:
    literal true) for every cohort pair including zero-overlap ones.

    Scale: the exact arm is a distinct-user self-join — the thing the
    sketch path exists to avoid; at 100 TB it runs on a sampled slice
    as the eval harness while the sketch path serves."""
    e = load_table(spark, sf_dir, "events")
    users = e.select("event_type", "user_id").distinct()
    sizes = users.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"))
    ua = users.select(F.col("event_type").alias("type_a"), "user_id")
    ub = users.select(F.col("event_type").alias("type_b"), "user_id")
    overlap = (ua.join(ub, "user_id")
               .filter(F.col("type_a") < F.col("type_b"))
               .groupBy("type_a", "type_b")
               .agg(F.count("*").cast("long").alias("exact_overlap")))
    sa = sizes.select(F.col("event_type").alias("type_a"),
                      F.col("n").alias("exact_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"),
                      F.col("n").alias("exact_b"))
    grid = sa.join(sb, F.col("type_a") < F.col("type_b"))
    est = q_hll_intersection(spark, sf_dir).select(
        "type_a", "type_b", "est_overlap")
    return (grid
            .join(overlap, ["type_a", "type_b"], "left")
            .join(est, ["type_a", "type_b"])
            .select(
                "type_a", "type_b", "exact_a", "exact_b",
                F.coalesce("exact_overlap", F.lit(0)).cast("long")
                .alias("exact_overlap"),
                (F.abs(F.col("est_overlap")
                       - F.coalesce("exact_overlap", F.lit(0)))
                 <= F.greatest(0.05 * (F.col("exact_a")
                                       + F.col("exact_b")),
                               F.lit(10.0))).alias("within_bound")))
