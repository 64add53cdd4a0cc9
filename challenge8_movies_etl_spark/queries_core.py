"""Category A (scans) + B (projection/filter/row-level cleaning) +
G (sorts/limits/set ops) queries — the reference's core row-level surface.

Reference parity notes cite the canonical public Movies-ETL assignment
layout (challenge.py≈Lnn [R], SURVEY.md §0 legend — /root/reference was
empty at survey time; semantics reconstructed from the published
assignment, not copied code).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.hashsafe import davg, dsum, sql_davg, sql_dsum
from .registry import query
from .sources.fixtures import load_table


# --------------------------------------------------------------------------
# A. Scans
# --------------------------------------------------------------------------

@query(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS revenue
    FROM lineitem
    """,
)
def q_scan_project(spark, sf_dir):
    """Parquet scan + projection + computed column.

    Reference: the extract stage (pd.read_csv / json.load,
    challenge.py≈L62-66 [R]) followed by column selection. Spark-first:
    the select() prunes the parquet scan to 4 of 11 columns (check
    ReadSchema in explain) — at 100 TB that is the difference between
    reading ~36% and 100% of the table bytes.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
    )


# --------------------------------------------------------------------------
# B. Filters / row-level cleaning
# --------------------------------------------------------------------------

@query(
    "q_filter_pred",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus = 'O' OR o_orderstatus = 'F')
      AND o_totalprice BETWEEN 1000 AND 200000
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderdate IS NOT NULL
      AND o_orderdate >= TIMESTAMP '1996-01-01'
    """,
)
def q_filter_pred(spark, sf_dir):
    """Compound predicate filter (AND/OR, range, IN, IS NOT NULL, date cmp).

    Reference: the wiki-movies keep-filter — ('Director' in m or
    'Directed by' in m) and 'imdb_link' in m and 'No. of episodes' not
    in m (challenge.py≈L72-76 [R]). All predicates here are
    parquet-pushdown-eligible (PushedFilters in explain): at 100 TB the
    row groups that fail min/max never leave storage.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "O") | (F.col("o_orderstatus") == "F"))
        & F.col("o_totalprice").between(1000, 200000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderdate").isNotNull()
        & (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01'"))
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
             "o_orderpriority")


@query(
    "q_conditional_fill",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN kaggle_price = 0 THEN wiki_price ELSE kaggle_price END
             AS filled_price
    FROM (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN 0.0 ELSE o_totalprice END
               AS kaggle_price,
             o_totalprice + 1000.0 AS wiki_price
      FROM orders
    )
    """,
)
def q_conditional_fill(spark, sf_dir):
    """Row-wise conditional coalesce: keep the kaggle value unless it is 0,
    else take the wiki value.

    Reference: fill_missing_kaggle_data(df, kaggle_col, wiki_col) done
    with df.apply(axis=1) (challenge.py≈L160-170 [R]) — a per-row Python
    lambda there; a native when/otherwise expression here (whole-stage
    codegen, no Python boundary). The messy "two competing sources"
    input is synthesized deterministically from orders so the oracle
    constructs the identical input.
    """
    o = load_table(spark, sf_dir, "orders")
    synth = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(0.0))
        .otherwise(F.col("o_totalprice")).alias("kaggle_price"),
        (F.col("o_totalprice") + 1000.0).alias("wiki_price"),
    )
    return synth.select(
        "o_orderkey",
        F.when(F.col("kaggle_price") == 0, F.col("wiki_price"))
        .otherwise(F.col("kaggle_price")).alias("filled_price"),
    )


@query(
    "q_cast_funcs",
    oracle="""
    SELECT e.event_id,
           CAST(trunc(e.value) AS BIGINT)  AS value_int,
           CAST(e.user_id AS DOUBLE) AS user_double,
           CAST(e.value AS VARCHAR)  AS value_str,
           (e.event_type = 'click')  AS is_click,
           to_timestamp(CAST(e.event_id % 2000000000 AS BIGINT)) AT TIME ZONE 'UTC'
             AS ts_from_epoch
    FROM events e
    """,
)
def q_cast_funcs(spark, sf_dir):
    """Numeric/bool/string casts + epoch-seconds -> timestamp.

    Reference: the kaggle-metadata cast block — budget.astype(int),
    pd.to_numeric(errors='raise'), video=='True',
    to_datetime(ratings.timestamp, unit='s') (challenge.py≈L134-144 [R]).
    """
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.col("value").cast("bigint").alias("value_int"),
        F.col("user_id").cast("double").alias("user_double"),
        F.col("value").cast("string").alias("value_str"),
        (F.col("event_type") == "click").alias("is_click"),
        F.timestamp_seconds(F.col("event_id") % 2000000000).alias("ts_from_epoch"),
    )


@query(
    "q_null_ratio",
    oracle="""
    SELECT col_name, round(null_ratio, 4) AS null_ratio,
           (null_ratio < 0.9) AS keep_col
    FROM (
      SELECT 'o_comment_synth' AS col_name,
             avg(CASE WHEN o_orderkey % 10 < 9 THEN 1.0 ELSE 0.0 END) AS null_ratio
      FROM orders
      UNION ALL
      SELECT 'o_clerk_synth',
             avg(CASE WHEN o_orderkey % 10 < 2 THEN 1.0 ELSE 0.0 END)
      FROM orders
      UNION ALL
      SELECT 'o_totalprice', avg(CASE WHEN o_totalprice IS NULL THEN 1.0 ELSE 0.0 END)
      FROM orders
    )
    ORDER BY col_name
    """,
)
def q_null_ratio(spark, sf_dir):
    """Column null-ratio profiling + '<90% null' keep/prune decision.

    Reference: wiki_columns_to_keep = [c for c in df.columns if
    df[c].isnull().sum() < len(df)*0.9] (challenge.py≈L86-88 [R]). Two
    synthetic mostly-null columns are derived from o_orderkey so both
    engines profile identical data. One aggregate-only pass over the
    table — at 100 TB this is a single map-side-combined scan, not one
    job per column.
    """
    o = load_table(spark, sf_dir, "orders")
    profiled = o.select(
        F.when(F.col("o_orderkey") % 10 < 9, None)
        .otherwise(F.lit("x")).alias("o_comment_synth"),
        F.when(F.col("o_orderkey") % 10 < 2, None)
        .otherwise(F.lit("y")).alias("o_clerk_synth"),
        F.col("o_totalprice"),
    )
    ratios = profiled.agg(*[
        F.avg(F.col(c).isNull().cast("double")).alias(c)
        for c in profiled.columns
    ])
    long = ratios.selectExpr(
        "stack(3, 'o_comment_synth', o_comment_synth, "
        "'o_clerk_synth', o_clerk_synth, "
        "'o_totalprice', o_totalprice) AS (col_name, ratio)"
    )
    return long.select(
        "col_name",
        F.round(F.col("ratio"), 4).alias("null_ratio"),
        (F.col("ratio") < 0.9).alias("keep_col"),
    ).orderBy("col_name")


# --------------------------------------------------------------------------
# G. Sorts / limits / top-k / set ops
# --------------------------------------------------------------------------

@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q_topk(spark, sf_dir):
    """Order-by-desc + limit 10 with a unique tie-break key.

    Reference: notebook sort_values().head() exploration [R]. Spark
    compiles this to TakeOrderedAndProject — per-partition top-k then a
    k-row merge on the driver; no global sort, no full shuffle. That is
    the 100 TB-safe plan: cost is O(n) scan + O(k) merge.
    """
    o = load_table(spark, sf_dir, "orders")
    return (o.select("o_orderkey", "o_totalprice")
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
            .limit(10))


@query(
    "q_union_all",
    oracle="""
    SELECT 'urgent' AS branch, o_orderkey, o_totalprice FROM orders
      WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT 'big' AS branch, o_orderkey, o_totalprice FROM orders
      WHERE o_totalprice > 100000
    """,
)
def q_union_all(spark, sf_dir):
    """UNION ALL with a branch tag (unionByName — name-resolved, not
    positional)."""
    o = load_table(spark, sf_dir, "orders")
    a = (o.filter(F.col("o_orderpriority") == "1-URGENT")
         .select(F.lit("urgent").alias("branch"), "o_orderkey", "o_totalprice"))
    b = (o.filter(F.col("o_totalprice") > 100000)
         .select(F.lit("big").alias("branch"), "o_orderkey", "o_totalprice"))
    return a.unionByName(b)


@query(
    "q_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 50000
    """,
)
def q_intersect(spark, sf_dir):
    """INTERSECT (set semantics)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 50000).select("o_custkey")
    return a.intersect(b)


@query(
    "q_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 50000
    """,
)
def q_except(spark, sf_dir):
    """EXCEPT (set semantics)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 50000).select("o_custkey")
    return a.subtract(b)


# --------------------------------------------------------------------------
# E-adjacent exact dedup (declared under §2.E; row-level, so lives here)
# --------------------------------------------------------------------------

@query(
    "q_distinct",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def q_distinct(spark, sf_dir):
    """Exact dedup as SELECT DISTINCT projection.

    Reference: drop_duplicates (challenge.py≈L85 [R]). Distinct on a
    low-cardinality projection: partial (map-side) dedup before the
    shuffle keeps shuffle bytes ~|distinct values|, not |rows| — the
    reason this survives 100 TB.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "q_dropdup_key",
    oracle="""
    SELECT o_custkey,
           min(o_orderkey) AS first_orderkey,
           round(min(o_totalprice), 4) AS min_price
    FROM orders GROUP BY o_custkey
    """,
)
def q_dropdup_key(spark, sf_dir):
    """Deterministic dedup-by-key: keep min surrogate per key.

    Reference: drop_duplicates(subset='imdb_id') (challenge.py≈L85 [R])
    keeps the *first* row pandas happens to see; that is
    partition-order-dependent on Spark, so the engine's dedup-by-key is
    expressed as group-by + min — same cardinality contract, but
    deterministic under any partitioning (hash-stable at any scale).
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.min("o_orderkey").alias("first_orderkey"),
        F.round(F.min("o_totalprice"), 4).alias("min_price"),
    )


@query(
    "q_value_counts",
    oracle="""
    SELECT o_orderpriority AS value, count(*) AS n
    FROM orders GROUP BY o_orderpriority
    ORDER BY n DESC, value
    """,
)
def q_value_counts(spark, sf_dir):
    """value_counts — the reference notebook's exploratory workhorse
    (movies_etl.ipynb [R]: .value_counts() between transform cells):
    group-count ordered by frequency with a deterministic tie-break."""
    o = load_table(spark, sf_dir, "orders")
    return (o.groupBy(F.col("o_orderpriority").alias("value"))
            .agg(F.count("*").alias("n"))
            .orderBy(F.col("n").desc(), F.col("value")))


@query(
    "q_try_cast",
    oracle="""
    SELECT o_orderkey, messy,
           TRY_CAST(messy AS DOUBLE) AS coerced,
           (TRY_CAST(messy AS DOUBLE) IS NULL) AS failed
    FROM (
      SELECT o_orderkey,
             CASE o_orderkey % 4
               WHEN 0 THEN cast(o_orderkey % 1000 as string)
               WHEN 1 THEN cast(o_orderkey % 1000 as string) || '.'
                           || cast(o_orderkey % 10 as string)
               WHEN 2 THEN 'n/a'
               ELSE '' END AS messy
      FROM orders
    )
    """,
)
def q_try_cast(spark, sf_dir):
    """Error-coercing numeric cast — pd.to_numeric(errors='coerce')
    semantics (the reference ran errors='raise' as a sanity gate,
    challenge.py≈L134-144 [R]; coerce is the production variant):
    unparseable strings become NULL instead of failing the job. ANSI
    mode makes plain casts throw; try_cast is the explicit none-throwing
    form, so this works identically whatever the session's ANSI
    setting."""
    o = load_table(spark, sf_dir, "orders")
    synth = o.selectExpr(
        "o_orderkey",
        "CASE o_orderkey % 4"
        " WHEN 0 THEN cast(o_orderkey % 1000 as string)"
        " WHEN 1 THEN cast(o_orderkey % 1000 as string) || '.'"
        " || cast(o_orderkey % 10 as string)"
        " WHEN 2 THEN 'n/a'"
        " ELSE '' END AS messy",
    )
    coerced = F.expr("try_cast(messy as double)")
    return synth.select(
        "o_orderkey", "messy",
        coerced.alias("coerced"),
        coerced.isNull().alias("failed"),
    )


# ONE SQL text executed verbatim by BOTH engines: Spark runs it via
# spark.sql over temp views of the fixture tables, DuckDB runs it as
# the oracle over the same parquet. Portability constraints that make
# this possible: ANSI-89 join syntax, decimal-exact revenue sum,
# timestamp literals, a 4dp round at the edge, and a total-order
# tie-break under the LIMIT.
_TPCH_Q3_SQL = """
    SELECT l_orderkey,
           round(cast(sum(cast(l_extendedprice * (1 - l_discount)
                               as decimal(30,10))) as double), 4) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < timestamp '1998-03-15 00:00:00'
      AND l_shipdate > timestamp '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """


@query("q_sql_surface", oracle=_TPCH_Q3_SQL)
def q_sql_surface(spark, sf_dir):
    """The engine's textual-SQL surface: TPC-H Q3 (shipping-priority)
    submitted as a raw SQL string — the exact same text the DuckDB
    oracle executes — over session-local temp views of the fixture
    tables. Proves a SQL-first user needs no DataFrame code at all:
    Catalyst plans the 3-way join + agg + top-k from the text (AQE
    broadcasts the filtered customer dim; the LIMIT compiles to
    TakeOrderedAndProject exactly as in the DataFrame twin queries)."""
    for t in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_TPCH_Q3_SQL)


_TPCH_Q5_SQL = """
    SELECT n_name,
           round(cast(sum(cast(l_extendedprice * (1 - l_discount)
                               as decimal(30,10))) as double), 4) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= timestamp '1996-01-01 00:00:00'
      AND o_orderdate < timestamp '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """


@query("q_sql_local_volume", oracle=_TPCH_Q5_SQL)
def q_sql_local_volume(spark, sf_dir):
    """TPC-H Q5 (local-supplier volume) as shared SQL text: the 6-way
    star join with two date predicates and a region filter, submitted
    verbatim to both engines. The join graph gives Catalyst real
    reordering work (region/nation are dims -> broadcast; the
    customer=supplier nation equality closes the cycle); revenue uses
    the decimal-exact reduction so ORDER BY cannot be perturbed."""
    for t in ("customer", "orders", "lineitem", "supplier",
              "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_TPCH_Q5_SQL)


_TPCH_Q10_SQL = """
    SELECT c_custkey, c_name,
           round(cast(sum(cast(l_extendedprice * (1 - l_discount)
                               as decimal(30,10))) as double), 4) AS revenue,
           n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= timestamp '1996-01-01 00:00:00'
      AND o_orderdate < timestamp '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """


@query("q_sql_returned_topk", oracle=_TPCH_Q10_SQL)
def q_sql_returned_topk(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting) as shared SQL text: fact
    join + quarter predicate + returnflag filter + revenue top-20 with
    a key tie-break under the LIMIT. Completes the raw-SQL trio
    (q_sql_surface Q3, q_sql_local_volume Q5) proving the textual
    surface covers scan/filter/join/agg/top-k end-to-end."""
    for t in ("customer", "orders", "lineitem", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_TPCH_Q10_SQL)


_EXISTS_Q4_SQL = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= timestamp '1996-01-01 00:00:00'
      AND o_orderdate < timestamp '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """


@query("q_sql_exists", oracle=_EXISTS_Q4_SQL)
def q_sql_exists(spark, sf_dir):
    """TPC-H Q4 shape (order-priority checking) as shared SQL text:
    correlated EXISTS over the fact table (adapted to this schema's
    returnflag, which stands in for Q4's commit/receipt lateness).
    Catalyst decorrelates the subquery into a left-semi hash join —
    the same plan q_join_semi pins — so the textual subquery surface
    costs nothing over the explicit-join form at any scale.
    Reference: challenge.py has no subquery surface; this is engine
    scope (SURVEY.md §2.L)."""
    for t in ("orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_EXISTS_Q4_SQL)


_CORR_AVG_Q17_SQL = """
    SELECT round(cast(sum(cast(l_extendedprice as decimal(30,10)))
                      as double) / 7.0, 4) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#13'
      AND l_quantity < (SELECT 0.2 * (sum(l2.l_quantity)
                                      / count(l2.l_quantity))
                        FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    GROUP BY p_brand
    """


@query("q_sql_correlated_avg", oracle=_CORR_AVG_Q17_SQL)
def q_sql_correlated_avg(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity-order revenue) as shared SQL:
    a correlated scalar aggregate subquery (per-part mean quantity)
    gating the outer fact rows. Catalyst decorrelates into an
    aggregate + join on l_partkey instead of re-running the subquery
    per row — the textbook decorrelation the engine must have for
    100 TB (a per-row subquery execution would be O(rows) scans).
    l_quantity is integer-valued, so sum/count is exact in double on
    both engines and the 0.2x threshold comparison cannot drift; the
    outer revenue sum uses the decimal reduction.

    Quotient-rounding adjudication (VERDICT r9 item 3, SCALE.md
    table): avg_yearly = S_cents/(100*7) rounded at 4dp can never sit
    on a half boundary — a tie requires 200*S_cents = 7*(2m+1), an
    even left side equal to an odd right side. Boundary-unreachable by
    parity; no rewrite needed."""
    for t in ("lineitem", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_CORR_AVG_Q17_SQL)


_NOT_EXISTS_Q22_SQL = """
    WITH avg_bal AS (
      SELECT cast(sum(cast(c_acctbal as decimal(30,10))) as double)
             / count(*) AS ab
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, count(*) AS numcust,
           round(cast(sum(cast(c_acctbal as decimal(30,10)))
                      as double), 4) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_totalprice > 300000.0)
    GROUP BY c_nationkey
    """


@query("q_sql_antijoin_subquery", oracle=_NOT_EXISTS_Q22_SQL)
def q_sql_antijoin_subquery(spark, sf_dir):
    """TPC-H Q22 shape (global-sales-opportunity) as shared SQL:
    above-average-balance customers with no big-ticket order —
    NOT EXISTS (→ left-anti hash join after decorrelation) composed
    with an uncorrelated scalar subquery (the above-average balance
    threshold, broadcast as a 1-row relation). The threshold derives
    from a decimal-exact sum, so the > comparison is bit-identical on
    both engines. Completes the subquery surface: EXISTS (q_sql_exists),
    correlated scalar (q_sql_correlated_avg), uncorrelated scalar +
    NOT EXISTS (here)."""
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_NOT_EXISTS_Q22_SQL)


_LATERAL_SQL = """
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n, LATERAL (
      SELECT c.c_name, round(cast(c.c_acctbal as double), 2) AS c_acctbal
      FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c.c_acctbal DESC, c.c_custkey
      LIMIT 1
    ) t
    ORDER BY n.n_name
    """


@query("q_sql_lateral", oracle=_LATERAL_SQL)
def q_sql_lateral(spark, sf_dir):
    """Correlated LATERAL subquery — top customer per nation via a
    per-row dependent subquery with ORDER BY + LIMIT, submitted as the
    SAME raw SQL text to both engines (the q_sql_surface pattern).
    Catalyst decorrelates the lateral into a ranked-window plan
    (DomainJoin → window top-1) rather than executing |nation|
    subqueries — the SQL-surface proof that dependent-join syntax gets
    an efficient set-based physical plan at any scale."""
    for t in ("nation", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)


_RECURSIVE_SQL = """
    WITH RECURSIVE edges AS (
      SELECT 'R' || cast(n_regionkey as varchar(30)) AS parent,
             'N' || cast(n_nationkey as varchar(30)) AS child
      FROM nation
      UNION ALL
      SELECT 'N' || cast(c_nationkey as varchar(30)) AS parent,
             'C' || cast(c_custkey as varchar(30)) AS child
      FROM customer
    ),
    anc(root, node) AS (
      SELECT parent, child FROM edges WHERE parent LIKE 'R%'
      UNION ALL
      SELECT a.root, e.child
      FROM anc a JOIN edges e ON e.parent = a.node
    )
    SELECT a.root AS region_key,
           count(*) AS n_customers,
           round(cast(sum(cast(c.c_acctbal as decimal(30,10)))
                 as double), 4) AS sum_acctbal
    FROM anc a JOIN customer c
      ON a.node = 'C' || cast(c.c_custkey as varchar(30))
    GROUP BY a.root
    ORDER BY a.root
    """


@query("q_sql_recursive", oracle=_RECURSIVE_SQL)
def q_sql_recursive(spark, sf_dir):
    """Recursive CTE surface (WITH RECURSIVE — new in Spark 4):
    transitive descent of the region → nation → customer hierarchy as
    ONE raw SQL text executed verbatim by both engines (the
    q_sql_surface pattern), rolling every customer up to its region
    with a decimal-exact balance sum. The recursion is over a TREE, so
    the working set is bounded by |nodes|·depth — no path explosion —
    and fixed-point termination needs no manual depth cap. The
    driver-orchestrated iterative twins (q_graph_bfs, q_graph_pagerank,
    q_dedup_clusters) remain the scale path for general graphs; this is
    the declarative-recursion entry point a SQL-first user gets."""
    for t in ("nation", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_RECURSIVE_SQL)


@query(
    "q_observe_metrics",
    oracle="""
    SELECT count(*) AS n_rows,
           cast(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                as bigint) AS n_errors,
           round(cast(sum(cast(value as decimal(30,10))) as double), 4)
             AS sum_value,
           count(*) - count(props) AS n_null_props
    FROM events
    """,
)
def q_observe_metrics(spark, sf_dir):
    """Pipeline-observability surface: `df.observe(Observation, ...)`
    attaches named metrics to a CollectMetrics node that Spark computes
    DURING an action's normal pass — the zero-extra-scan way a 100 TB
    job exports row counts, error rates, and checksums to monitoring
    without a second aggregation job.

    Here the observed action is a count over the events scan; the
    returned 1-row frame is rebuilt from `Observation.get` with an
    explicit schema (driver-side by construction — the metrics dict is
    O(metrics), never O(rows)). The decimal-exact sum keeps the metric
    hash-stable across partitionings, same as any first-class
    aggregate."""
    from pyspark.sql import Observation
    from pyspark.sql import types as T

    from .functions.hashsafe import DEC

    e = load_table(spark, sf_dir, "events")
    obs = Observation(f"etl_metrics_{abs(hash(sf_dir)) % 10**6}")
    observed = e.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
         .alias("n_errors"),
        F.round(F.sum(F.col("value").cast(DEC)).cast("double"), 4)
         .alias("sum_value"),
        (F.count(F.lit(1)) - F.count("props")).alias("n_null_props"))
    observed.count()  # the "real" job the metrics piggyback on
    m = obs.get
    schema = T.StructType([
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_errors", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("n_null_props", T.LongType()),
    ])
    return spark.createDataFrame(
        [(m["n_rows"], m["n_errors"], m["sum_value"],
          m["n_null_props"])], schema)


# ---------------------------------------------------------------------------
# q_schema_profile — one-shot multi-table column profiler
# ---------------------------------------------------------------------------

_PROFILE_ORACLE = """
SELECT 'customer' AS tbl, 'c_acctbal' AS col,
       cast(count(*) as bigint) AS n,
       cast(count(*) - count(c_acctbal) as bigint) AS n_null,
       cast(count(DISTINCT c_acctbal) as bigint) AS n_distinct,
       cast(min(c_acctbal) as string) AS min_s,
       cast(max(c_acctbal) as string) AS max_s
FROM customer
UNION ALL
SELECT 'orders', 'o_orderstatus', count(*),
       count(*) - count(o_orderstatus), count(DISTINCT o_orderstatus),
       min(o_orderstatus), max(o_orderstatus)
FROM orders
UNION ALL
SELECT 'lineitem', 'l_quantity', count(*),
       count(*) - count(l_quantity), count(DISTINCT l_quantity),
       cast(min(l_quantity) as string), cast(max(l_quantity) as string)
FROM lineitem
UNION ALL
SELECT 'events', 'event_type', count(*),
       count(*) - count(event_type), count(DISTINCT event_type),
       min(event_type), max(event_type)
FROM events
UNION ALL
SELECT 'documents', 'lang', count(*),
       count(*) - count(lang), count(DISTINCT lang),
       min(lang), max(lang)
FROM documents
ORDER BY tbl, col
"""


@query("q_schema_profile", oracle=_PROFILE_ORACLE)
def q_schema_profile(spark, sf_dir):
    """One-shot data-profiling sweep across five tables: row count,
    null count, distinct cardinality, and string-cast min/max per
    profiled column — the onboarding report every ingest runs before
    trusting a new feed (q_null_ratio and q_value_counts are the
    per-table deep dives; this is the fleet overview). Numeric
    min/max are cast to string at the EDGE so one relation carries
    heterogeneous column types without loss.

    Scale: each table contributes one map-side-combined aggregate
    (count-distinct is the only shuffle-bound term — swap in
    approx_count_distinct when exactness stops mattering); the union
    is five 1-row relations. Tables profile independently, so a 100 TB
    sweep parallelizes per table."""
    parts = []
    for tbl, col in (("customer", "c_acctbal"), ("orders", "o_orderstatus"),
                     ("lineitem", "l_quantity"), ("events", "event_type"),
                     ("documents", "lang")):
        t = load_table(spark, sf_dir, tbl)
        parts.append(t.agg(
            F.lit(tbl).alias("tbl"), F.lit(col).alias("col"),
            F.count("*").cast("long").alias("n"),
            (F.count("*") - F.count(col)).cast("long").alias("n_null"),
            F.count_distinct(F.col(col)).cast("long").alias("n_distinct"),
            F.min(col).cast("string").alias("min_s"),
            F.max(col).cast("string").alias("max_s")))
    out = parts[0]
    for q in parts[1:]:
        out = out.unionByName(q)
    return out.orderBy("tbl", "col")
