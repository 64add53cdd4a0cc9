"""Category C — string / regex / date / math / JSON / array scalar functions.

This is the reference's heart: ``parse_dollars`` + the date/runtime
regex parsers (challenge.py≈L90-132 [R], SURVEY.md §0 legend). The
parsers live in functions/parsing.py as reusable Column builders (plus
their DuckDB-SQL twins); these queries wire them to deterministically
synthesized messy inputs (functions/synth.py — integer-only string
building so both engines construct identical data).

All parsing is NATIVE column expressions — no Python UDF on the hot
path, so the whole parse stays inside whole-stage codegen. The same
semantics are additionally proven through the UDF path in
queries_udf.py (q_udf_scalar), mirroring how the reference actually ran
them (row-wise Python).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.parsing import (
    parse_date_multiformat_col,
    parse_date_multiformat_sql,
    parse_dollars_col,
    parse_dollars_sql,
    parse_runtime_col,
    parse_runtime_sql,
)
from .functions.synth import (
    DATE_SYNTH_DUCK,
    DATE_SYNTH_SPARK,
    IMDB_URL_SYNTH,
    MONEY_SYNTH,
    RUNTIME_SYNTH,
)
from .registry import query
from .sources.fixtures import load_table


@query(
    "q_dollar_parse",
    oracle=f"""
    SELECT o_orderkey, raw_money,
           {parse_dollars_sql('raw_money')} AS parsed_dollars
    FROM (SELECT o_orderkey, {MONEY_SYNTH} AS raw_money FROM orders)
    """,
)
def q_dollar_parse(spark, sf_dir):
    """parse_dollars — the reference's flagship scalar op.

    Matches '$d.d million' / '$d.d billion' / '$ddd,ddd,ddd' (scaling
    x1e6 / x1e9 / comma-strip), after collapsing '$lo-hi' ranges to the
    upper bound and stripping '[n]' citations
    (challenge.py≈L(module)+L90-115 [R]; forms form_one/form_two).
    The reference ran this as a row-wise Python function over a pandas
    Series; here it is one codegen'd expression tree — no Python
    boundary, trivially distributed.
    """
    o = load_table(spark, sf_dir, "orders")
    synth = o.selectExpr("o_orderkey", f"{MONEY_SYNTH} AS raw_money")
    return synth.select(
        "o_orderkey", "raw_money",
        parse_dollars_col("raw_money").alias("parsed_dollars"),
    )


@query(
    "q_date_multiformat",
    oracle=f"""
    SELECT o_orderkey, date_str,
           cast(cast({parse_date_multiformat_sql('date_str')} as date)
                as string) AS parsed_date
    FROM (SELECT o_orderkey, {DATE_SYNTH_DUCK} AS date_str FROM orders)
    """,
)
def q_date_multiformat(spark, sf_dir):
    """Multi-format date parse, first match wins.

    Reference: the four date_form_* regexes +
    pd.to_datetime(infer_datetime_format=True)
    (challenge.py≈L117-123 [R]). Forms: 'Month D, YYYY' | 'YYYY-MM-DD' |
    'Month YYYY' (→ first of month) | 'YYYY' (→ Jan 1). Output is the
    ISO date *string* so both engines' type systems agree exactly.
    """
    o = load_table(spark, sf_dir, "orders")
    synth = o.selectExpr("o_orderkey", f"{DATE_SYNTH_SPARK} AS date_str")
    return synth.select(
        "o_orderkey", "date_str",
        parse_date_multiformat_col("date_str")
        .cast("date").cast("string").alias("parsed_date"),
    )


@query(
    "q_runtime_parse",
    oracle=f"""
    SELECT o_orderkey, raw_runtime,
           {parse_runtime_sql('raw_runtime')} AS runtime_minutes
    FROM (SELECT o_orderkey, {RUNTIME_SYNTH} AS raw_runtime FROM orders)
    """,
)
def q_runtime_parse(spark, sf_dir):
    """Running-time parse: '(d+)h (d*)m' → h*60+m, else '(d+) m' → m,
    unparseable → 0 (the reference's NaN→0, challenge.py≈L125-132 [R])."""
    o = load_table(spark, sf_dir, "orders")
    synth = o.selectExpr("o_orderkey", f"{RUNTIME_SYNTH} AS raw_runtime")
    return synth.select(
        "o_orderkey", "raw_runtime",
        parse_runtime_col("raw_runtime").alias("runtime_minutes"),
    )


@query(
    "q_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS uname,
           lower(c_mktsegment) AS lseg,
           trim('  ' || c_name || '  ') AS trimmed,
           substring(c_name, 1, 8) AS sub8,
           concat_ws('-', c_mktsegment, c_name) AS joined,
           lpad(cast(c_custkey as string), 12, '0') AS padded,
           split_part(c_name, '#', 2) AS name_num,
           regexp_replace(c_name, 'Customer#0*', 'cust-') AS renamed,
           reverse(c_mktsegment) AS rseg,
           length(c_name) AS name_len,
           replace(c_name, 'Customer', 'Cust') AS replaced
    FROM customer
    """,
)
def q_string_funcs(spark, sf_dir):
    """String function battery (scattered .str.* usage,
    challenge.py≈L90-132 [R]): upper/lower/trim/substring/concat_ws/
    lpad/split_part/regexp_replace/reverse/length/replace."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.substring("c_name", 1, 8).alias("sub8"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("joined"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.regexp_replace("c_name", "Customer#0*", "cust-").alias("renamed"),
        F.reverse(F.col("c_mktsegment")).alias("rseg"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("replaced"),
    )


@query(
    "q_regex_extract",
    oracle=rf"""
    SELECT o_orderkey, url, regexp_extract(url, '(tt\d{{7}})', 1) AS imdb_id
    FROM (SELECT o_orderkey, {IMDB_URL_SYNTH} AS url FROM orders)
    """,
)
def q_regex_extract(spark, sf_dir):
    """imdb_id extraction from URL: str.extract(r'(tt\\d{7})')
    (challenge.py≈L82-85 [R])."""
    o = load_table(spark, sf_dir, "orders")
    return (o.selectExpr("o_orderkey", f"{IMDB_URL_SYNTH} AS url")
            .withColumn("imdb_id", F.regexp_extract("url", r"(tt\d{7})", 1)))


@query(
    "q_math_funcs",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice, 0) AS rounded0,
           abs(o_totalprice - 100000.0) AS abs_diff,
           cast(ceil(o_totalprice) as bigint) AS ceiled,
           cast(floor(o_totalprice) as bigint) AS floored,
           o_totalprice * o_totalprice AS squared,
           sqrt(o_totalprice) AS rooted,
           round(ln(o_totalprice), 4) AS logged,
           o_orderkey % 97 AS modded,
           greatest(o_totalprice, 100000.0) AS hi,
           least(o_totalprice, 100000.0) AS lo,
           cast(sign(o_totalprice - 100000.0) as bigint) AS sgn
    FROM orders
    """,
)
def q_math_funcs(spark, sf_dir):
    """Math battery (implicit in the reference's x1e6/x1e9 dollar
    scaling [R]). Hash discipline: squares use plain multiplication
    (single IEEE op, bit-identical across engines) rather than pow()
    (libm, may differ in the last ulp); sqrt is IEEE-correctly-rounded
    everywhere; ln is rounded to 4 dp.
    """
    o = load_table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(tp, 0).alias("rounded0"),
        F.abs(tp - 100000.0).alias("abs_diff"),
        F.ceil(tp).alias("ceiled"),
        F.floor(tp).alias("floored"),
        (tp * tp).alias("squared"),
        F.sqrt(tp).alias("rooted"),
        F.round(F.log(tp), 4).alias("logged"),
        (F.col("o_orderkey") % 97).alias("modded"),
        F.greatest(tp, F.lit(100000.0)).alias("hi"),
        F.least(tp, F.lit(100000.0)).alias("lo"),
        F.signum(tp - 100000.0).cast("bigint").alias("sgn"),
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           cast(json_extract_string(props, '$.k') as bigint) AS k_val,
           (cast(json_extract_string(props, '$.k') as bigint) >= 50) AS k_high
    FROM events
    """,
)
def q_json_extract(spark, sf_dir):
    """JSON field extraction from a string column (events.props =
    '{"k": int}'). Reference analog: dict-key access on raw wiki
    records (challenge.py≈L72-80 [R])."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.select(
        "event_id",
        k.alias("k_val"),
        (k >= 50).alias("k_high"),
    )


@query(
    "q_array_explode",
    oracle="""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    """,
)
def q_array_explode(spark, sf_dir):
    """split → explode → per-token aggregation (the reference's
    list-cell handling generalized, challenge.py≈L92 [R]). At scale the
    explode multiplies rows before the shuffle, but partial aggregation
    combines map-side, so shuffle bytes stay O(|vocab|) per partition.
    """
    d = load_table(spark, sf_dir, "documents")
    return (d.select(F.explode(F.split("text", " ")).alias("token"))
            .groupBy("token").count().withColumnRenamed("count", "n"))


@query(
    "q_map_funcs",
    oracle="""
    SELECT o_orderkey,
           array_to_string(map_keys(
             map(['status', 'priority'], [o_orderstatus, o_orderpriority])
           ), ',') AS keys_joined,
           map(['status', 'priority'],
               [o_orderstatus, o_orderpriority])['status'][1] AS status_val,
           cardinality(map(['status', 'priority'],
                           [o_orderstatus, o_orderpriority])) AS n_entries
    FROM orders
    """,
)
def q_map_funcs(spark, sf_dir):
    """MapType surface (the alt_titles dict shape, clean_movie
    ≈L12-22 [R]): construction, key listing, element access,
    cardinality — projected to scalars for the oracle (map cell
    encodings differ across engines; scalar projections do not)."""
    o = load_table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return o.select(
        "o_orderkey",
        F.concat_ws(",", F.map_keys(m)).alias("keys_joined"),
        F.element_at(m, "status").alias("status_val"),
        F.size(m).cast("bigint").alias("n_entries"),
    )


@query(
    "q_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           cast(year(o_orderdate) as bigint) AS y,
           cast(month(o_orderdate) as bigint) AS m,
           cast(day(o_orderdate) as bigint) AS d,
           cast(quarter(o_orderdate) as bigint) AS q,
           cast(dayofweek(o_orderdate) + 1 as bigint) AS dow,
           cast(weekofyear(o_orderdate) as bigint) AS woy,
           date_trunc('month', o_orderdate) AS month_start,
           cast(cast(o_orderdate as date) + 30 as string) AS plus30,
           cast(last_day(cast(o_orderdate as date)) as string) AS month_end,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since
    FROM orders
    """,
)
def q_datetime_funcs(spark, sf_dir):
    """Datetime battery: year/month/day/quarter/dayofweek/weekofyear,
    date_trunc, date arithmetic, last_day, datediff. Convention traps
    handled explicitly: Spark dayofweek is Sunday=1, DuckDB Sunday=0
    (oracle adds 1); date outputs go through ISO strings."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("y"),
        F.month(d).cast("bigint").alias("m"),
        F.dayofmonth(d).cast("bigint").alias("d"),
        F.quarter(d).cast("bigint").alias("q"),
        F.dayofweek(d).cast("bigint").alias("dow"),
        F.weekofyear(d).cast("bigint").alias("woy"),
        F.date_trunc("month", d).alias("month_start"),
        F.date_add(d.cast("date"), 30).cast("string").alias("plus30"),
        F.last_day(d.cast("date")).cast("string").alias("month_end"),
        F.datediff(d.cast("date"),
                   F.lit("1995-01-01").cast("date")).cast("bigint")
        .alias("days_since"),
    )


@query(
    "q_array_hof",
    oracle="""
    SELECT doc_id,
           array_to_string(
             list_transform(string_split(text, ' '), t -> length(t)), ',')
             AS token_lens,
           len(list_filter(string_split(text, ' '),
                           t -> length(t) >= 5)) AS n_long,
           list_reduce(list_prepend(
             0, list_transform(string_split(text, ' '),
                               t -> length(t))), (a, b) -> a + b)
             AS total_chars
    FROM documents
    """,
)
def q_array_hof(spark, sf_dir):
    """Higher-order array functions — transform / filter / aggregate
    lambdas (the engine's array-processing surface; these stay inside
    codegen as Catalyst lambda expressions, never Python). Oracle:
    DuckDB's list_transform / list_filter / list_reduce twins.

    Output contract: every registry query must emit scalar-only
    columns (the driver's pandas canonicalizer cannot hash list
    cells — r5 driver err "unhashable type: 'list'"), so the
    transform() result is serialized via concat_ws(',') on both
    engines. The HOF itself still runs as a Catalyst lambda."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.concat_ws(
            ",", F.transform(toks, lambda t: F.length(t).cast("string"))
        ).alias("token_lens"),
        F.size(F.filter(toks, lambda t: F.length(t) >= 5)).alias("n_long"),
        F.aggregate(toks, F.lit(0),
                    lambda acc, t: acc + F.length(t)).alias("total_chars"),
    )


@query(
    "q_struct_funcs",
    oracle="""
    SELECT o_orderkey,
           {'status': o_orderstatus, 'price': o_totalprice}.status
             AS s_status,
           {'status': o_orderstatus, 'price': o_totalprice}.price
             AS s_price,
           o_orderstatus || ':' || cast(o_orderkey % 5 as string) AS packed
    FROM orders
    """,
)
def q_struct_funcs(spark, sf_dir):
    """StructType surface: named_struct construction + field access +
    scalar projection (nested records are how multimodal metadata and
    parsed JSON travel through the engine)."""
    o = load_table(spark, sf_dir, "orders")
    st = F.struct(F.col("o_orderstatus").alias("status"),
                  F.col("o_totalprice").alias("price"))
    return o.select(
        "o_orderkey",
        st.getField("status").alias("s_status"),
        st.getField("price").alias("s_price"),
        F.concat_ws(":", "o_orderstatus",
                    (F.col("o_orderkey") % 5).cast("string")).alias("packed"),
    )


@query(
    "q_posexplode",
    oracle="""
    SELECT doc_id, i - 1 AS pos, toks[i] AS token
    FROM (
      SELECT doc_id, string_split(text, ' ') AS toks,
             unnest(range(1, len(string_split(text, ' ')) + 1)) AS i
      FROM documents WHERE doc_id % 20 = 0
    )
    """,
)
def q_posexplode(spark, sf_dir):
    """Positional explode — (pos, value) pairs per array element (the
    ordinal-preserving fan-out used for n-gram windows and frame
    indices)."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 20 == 0)
    return (d.select("doc_id",
                     F.posexplode(F.split("text", " "))
                     .alias("pos", "token")))


@query(
    "q_schema_evolution",
    oracle="""
    SELECT o_orderkey AS k, o_totalprice AS price,
           NULL AS segment FROM orders WHERE o_orderkey % 100 = 0
    UNION ALL BY NAME
    SELECT c_custkey AS k, NULL AS price, c_mktsegment AS segment
    FROM customer WHERE c_custkey % 100 = 0
    """,
)
def q_schema_evolution(spark, sf_dir):
    """Schema-evolution union: two relations with partially-overlapping
    columns merged by NAME with missing columns null-filled
    (unionByName(allowMissingColumns=True)) — the batch form of
    reading a dataset whose schema grew over time."""
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderkey") % 100 == 0)
         .select(F.col("o_orderkey").alias("k"),
                 F.col("o_totalprice").alias("price")))
    c = (load_table(spark, sf_dir, "customer")
         .filter(F.col("c_custkey") % 100 == 0)
         .select(F.col("c_custkey").alias("k"),
                 F.col("c_mktsegment").alias("segment")))
    return o.unionByName(c, allowMissingColumns=True)


@query(
    "q_variant_json",
    oracle="""
    SELECT cast(json_extract_string(props, '$.k') as bigint) // 10
             AS k_decade,
           count(*) AS n,
           cast(sum(cast(json_extract_string(props, '$.k') as bigint))
             as bigint) AS k_sum
    FROM events GROUP BY 1
    """,
)
def q_variant_json(spark, sf_dir):
    """Semi-structured fast path via Spark 4 VARIANT: props parsed ONCE
    into the binary variant encoding (parse_json), then path access
    with variant_get — repeated field reads skip re-tokenizing the JSON
    text, which is the point of the type at 100 TB (parse once at
    ingest, access many times downstream). Aggregates k into decades so
    the oracle (DuckDB json_extract) checks values, not encodings."""
    e = load_table(spark, sf_dir, "events")
    v = e.select(F.parse_json("props").alias("v"))
    k = F.expr("variant_get(v, '$.k', 'bigint')")
    return (v.select(F.floor(k / 10).cast("bigint").alias("k_decade"),
                     k.alias("k"))
            .groupBy("k_decade")
            .agg(F.count("*").alias("n"),
                 F.sum("k").alias("k_sum")))


@query(
    "q_array_setops",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_distinct(string_split(text, ' ')) AS a
      FROM documents WHERE doc_id % 10 = 0
    ), pair AS (
      SELECT x.doc_id,
             x.a AS a,
             (SELECT y.a FROM t y WHERE y.doc_id = x.doc_id + 10) AS b
      FROM t x
      WHERE EXISTS (SELECT 1 FROM t y WHERE y.doc_id = x.doc_id + 10)
    )
    SELECT doc_id,
           cast(len(list_intersect(a, b)) as bigint) AS n_common,
           coalesce(
             array_to_string(list_sort(list_intersect(a, b)), ','), '')
             AS common_sorted,
           cast(len(list_distinct(list_concat(a, b))) as bigint)
             AS n_union,
           cast(len(list_filter(a, w -> NOT list_contains(b, w)))
             as bigint) AS n_only_a,
           list_position(list_sort(a), 'the') > 0 AS has_the,
           cast(list_position(list_sort(a), 'the') as bigint) AS the_pos
    FROM pair
    """,
)
def q_array_setops(spark, sf_dir):
    """Array set-operation battery — union/intersect/except/sort/
    position as Catalyst expressions over vocabularies of ADJACENT
    documents (self-join on doc_id+10, broadcast-sized after the %10
    filter): the set-algebra surface the dedup/decontamination
    operators build on, declared so the driver checks the primitives
    themselves. Intersections are emitted both as counts and as a
    sorted serialized list (scalar-only output contract); positions
    are over the SORTED array because engine-native vocabulary order
    differs. The serialized empty intersection is '' on BOTH sides —
    Spark concat_ws returns '' for an empty array but DuckDB
    array_to_string returns NULL, so the oracle coalesces (caught by
    the round-8 sf1.0 hash sweep: the Heaps-vocab fixture is the
    first scale where adjacent documents can be fully disjoint).

    Scale: one self-equi-join on a filtered slice, then pure codegen
    array expressions — no explode, no token shuffle."""
    d = (load_table(spark, sf_dir, "documents")
         .filter(F.col("doc_id") % 10 == 0))
    t = d.select("doc_id",
                 F.array_distinct(F.split("text", " ")).alias("a"))
    other = t.select((F.col("doc_id") - 10).alias("doc_id"),
                     F.col("a").alias("b"))
    pair = t.join(other, "doc_id")
    inter = F.array_intersect("a", "b")
    return pair.select(
        "doc_id",
        F.size(inter).cast("long").alias("n_common"),
        F.concat_ws(",", F.array_sort(inter)).alias("common_sorted"),
        F.size(F.array_distinct(F.array_union("a", "b"))).cast("long")
        .alias("n_union"),
        F.size(F.array_except("a", "b")).cast("long").alias("n_only_a"),
        (F.array_position(F.array_sort("a"), "the") > 0)
        .alias("has_the"),
        F.array_position(F.array_sort("a"), "the").cast("long")
        .alias("the_pos"))
