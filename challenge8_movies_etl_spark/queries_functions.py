"""Category C — string / regex / date / math / JSON / array scalar functions.

This is the reference's heart: ``parse_dollars`` + the date/runtime
regex parsers (challenge.py≈L90-132 [R], SURVEY.md §0 legend). All are
implemented as NATIVE column expressions (regexp_replace /
regexp_extract / when-otherwise arithmetic) — no Python UDF on the hot
path, so the whole parse stays inside whole-stage codegen. The same
semantics are additionally proven through the UDF path in
queries_udf.py (q_udf_scalar), mirroring how the reference actually ran
them (row-wise Python).

Messy inputs are synthesized deterministically from ``orders`` using
INTEGER-only string building (lpad/concat of ints): float→string
formatting differs between engines, integer formatting does not, so
both Spark and the DuckDB oracle construct bit-identical inputs.

Regex dialect: Spark is java.util.regex, DuckDB is RE2 — patterns here
stay in the shared subset (no lookarounds, no backrefs; SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import query
from .sources.fixtures import load_table

# --- shared synthesis SQL (DuckDB dialect == Spark SQL for these) -------

_MONEY_SYNTH = """
    CASE o_orderkey % 6
      WHEN 0 THEN '$' || cast(o_orderkey % 900 + 100 as string)
                  || '.' || cast(o_orderkey % 10 as string) || ' million'
      WHEN 1 THEN '$' || cast(o_orderkey % 9 + 1 as string)
                  || '.' || cast(o_orderkey % 10 as string) || ' billion'
      WHEN 2 THEN '$' || cast(o_orderkey % 900 + 100 as string)
                  || ',' || lpad(cast((o_orderkey * 7) % 1000 as string), 3, '0')
                  || ',' || lpad(cast((o_orderkey * 13) % 1000 as string), 3, '0')
      WHEN 3 THEN '$' || cast(o_orderkey % 8 + 1 as string)
                  || '.' || cast(o_orderkey % 10 as string)
                  || '-' || cast(o_orderkey % 8 + 2 as string)
                  || '.' || cast(o_orderkey % 10 as string) || ' million'
      WHEN 4 THEN '$' || cast(o_orderkey % 900 + 100 as string)
                  || '.' || cast(o_orderkey % 10 as string) || ' million['
                  || cast(o_orderkey % 25 + 1 as string) || ']'
      ELSE 'N/A'
    END
"""

# parse_dollars pipeline, expressible identically in both SQL dialects:
# 1. strip wiki citations [n]; 2. collapse "$lo-hi" ranges to "$hi";
# 3. first-match-wins across the three money forms.
_MONEY_PARSE = r"""
    CASE
      WHEN m_mill <> '' THEN cast(m_mill as double) * 1e6
      WHEN m_bill <> '' THEN cast(m_bill as double) * 1e9
      WHEN m_comma <> '' THEN cast(replace(m_comma, ',', '') as double)
      ELSE NULL
    END
"""


def _money_extract_sql(src: str) -> str:
    return rf"""
      SELECT o_orderkey, raw_money,
             regexp_extract(cleaned, '\$\s*(\d+\.?\d*)\s*million', 1) AS m_mill,
             regexp_extract(cleaned, '\$\s*(\d+\.?\d*)\s*billion', 1) AS m_bill,
             regexp_extract(cleaned, '\$\s*(\d{{1,3}}(?:,\d{{3}})+)', 1) AS m_comma
      FROM (
        SELECT o_orderkey, raw_money,
               regexp_replace(
                 regexp_replace(raw_money, '\[\d+\]', ''),
                 '\$\s*\d+\.?\d*\s*[-–—]\s*', '$') AS cleaned
        FROM (SELECT o_orderkey, {_MONEY_SYNTH} AS raw_money FROM {src})
      )
    """


@query(
    "q_dollar_parse",
    oracle=f"""
    SELECT o_orderkey, raw_money, {_MONEY_PARSE} AS parsed_dollars
    FROM ({_money_extract_sql('orders')})
    """,
)
def q_dollar_parse(spark, sf_dir):
    """parse_dollars — the reference's flagship scalar op.

    Matches '$d.d million' / '$d.d billion' / '$ddd,ddd,ddd' (scaling
    x1e6 / x1e9 / comma-strip), after collapsing '$lo-hi' ranges to the
    upper bound and stripping '[n]' citations
    (challenge.py≈L(module)+L90-115 [R]; forms form_one/form_two).
    Reference ran this as a row-wise Python function over a pandas
    Series; here it is one codegen'd expression tree — ~100x less
    per-row overhead and trivially distributed.
    """
    o = load_table(spark, sf_dir, "orders")
    # Synthesis SQL is backslash-free, so it is safe in selectExpr; the
    # regex steps use the DataFrame API because Spark SQL string literals
    # eat backslashes ('\d' -> 'd') while DuckDB's do not.
    synth = o.selectExpr("o_orderkey", f"{_MONEY_SYNTH} AS raw_money")
    cleaned = F.regexp_replace(
        F.regexp_replace("raw_money", r"\[\d+\]", ""),
        # Java replacement strings treat '$' as a group ref -> escape it
        # (DuckDB's RE2 replacement takes '$' literally, so the oracle
        # SQL keeps a bare '$').
        r"\$\s*\d+\.?\d*\s*[-–—]\s*", r"\$")
    ext = synth.select(
        "o_orderkey", "raw_money",
        F.regexp_extract(cleaned, r"\$\s*(\d+\.?\d*)\s*million", 1).alias("m_mill"),
        F.regexp_extract(cleaned, r"\$\s*(\d+\.?\d*)\s*billion", 1).alias("m_bill"),
        F.regexp_extract(cleaned, r"\$\s*(\d{1,3}(?:,\d{3})+)", 1).alias("m_comma"),
    )
    parsed = (
        F.when(F.col("m_mill") != "", F.col("m_mill").cast("double") * 1e6)
        .when(F.col("m_bill") != "", F.col("m_bill").cast("double") * 1e9)
        .when(F.col("m_comma") != "",
              F.replace(F.col("m_comma"), F.lit(","), F.lit("")).cast("double"))
    )
    return ext.select("o_orderkey", "raw_money", parsed.alias("parsed_dollars"))


_DATE_SYNTH_SPARK = """
    CASE o_orderkey % 4
      WHEN 0 THEN date_format(o_orderdate, 'MMMM d, yyyy')
      WHEN 1 THEN date_format(o_orderdate, 'yyyy-MM-dd')
      WHEN 2 THEN date_format(o_orderdate, 'MMMM yyyy')
      ELSE date_format(o_orderdate, 'yyyy')
    END
"""

_DATE_SYNTH_DUCK = """
    CASE o_orderkey % 4
      WHEN 0 THEN strftime(o_orderdate, '%B %-d, %Y')
      WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d')
      WHEN 2 THEN strftime(o_orderdate, '%B %Y')
      ELSE strftime(o_orderdate, '%Y')
    END
"""


@query(
    "q_date_multiformat",
    oracle=f"""
    SELECT o_orderkey, date_str,
           cast(cast(coalesce(
             try_strptime(date_str, '%B %d, %Y'),
             try_strptime(date_str, '%Y-%m-%d'),
             try_strptime(date_str, '%B %Y'),
             try_strptime(date_str, '%Y')
           ) as date) as string) AS parsed_date
    FROM (SELECT o_orderkey, {_DATE_SYNTH_DUCK} AS date_str FROM orders)
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
    synth = o.selectExpr("o_orderkey", f"{_DATE_SYNTH_SPARK} AS date_str")
    parsed = F.coalesce(
        F.try_to_timestamp(F.col("date_str"), F.lit("MMMM d, yyyy")),
        F.try_to_timestamp(F.col("date_str"), F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(F.col("date_str"), F.lit("MMMM yyyy")),
        F.try_to_timestamp(F.col("date_str"), F.lit("yyyy")),
    )
    return synth.select(
        "o_orderkey", "date_str",
        parsed.cast("date").cast("string").alias("parsed_date"),
    )


_RUNTIME_SYNTH = """
    CASE o_orderkey % 3
      WHEN 0 THEN cast(o_orderkey % 4 + 1 as string) || 'h '
                  || cast(o_orderkey % 60 as string) || 'm'
      WHEN 1 THEN cast(o_orderkey % 240 as string) || ' m'
      ELSE 'unknown'
    END
"""

_RUNTIME_PARSE = r"""
    CASE
      WHEN h_part <> '' THEN
        cast(h_part as bigint) * 60
        + CASE WHEN hm_part <> '' THEN cast(hm_part as bigint) ELSE 0 END
      WHEN lone_m <> '' THEN cast(lone_m as bigint)
      ELSE 0
    END
"""


def _runtime_extract_sql(src: str) -> str:
    return rf"""
      SELECT o_orderkey, raw_runtime,
             regexp_extract(raw_runtime, '(\d+)\s*h', 1) AS h_part,
             regexp_extract(raw_runtime, 'h\s*(\d+)\s*m', 1) AS hm_part,
             regexp_extract(raw_runtime, '^(\d+)\s*m$', 1) AS lone_m
      FROM (SELECT o_orderkey, {_RUNTIME_SYNTH} AS raw_runtime FROM {src})
    """


@query(
    "q_runtime_parse",
    oracle=f"""
    SELECT o_orderkey, raw_runtime, {_RUNTIME_PARSE} AS runtime_minutes
    FROM ({_runtime_extract_sql('orders')})
    """,
)
def q_runtime_parse(spark, sf_dir):
    """Running-time parse: '(d+)h (d*)m' → h*60+m, else '(d+) m' → m,
    unparseable → 0 (the reference's NaN→0, challenge.py≈L125-132 [R])."""
    o = load_table(spark, sf_dir, "orders")
    synth = o.selectExpr("o_orderkey", f"{_RUNTIME_SYNTH} AS raw_runtime")
    ext = synth.select(
        "o_orderkey", "raw_runtime",
        F.regexp_extract("raw_runtime", r"(\d+)\s*h", 1).alias("h_part"),
        F.regexp_extract("raw_runtime", r"h\s*(\d+)\s*m", 1).alias("hm_part"),
        F.regexp_extract("raw_runtime", r"^(\d+)\s*m$", 1).alias("lone_m"),
    )
    minutes = (
        F.when(F.col("h_part") != "",
               F.col("h_part").cast("bigint") * 60
               + F.when(F.col("hm_part") != "",
                        F.col("hm_part").cast("bigint")).otherwise(0))
        .when(F.col("lone_m") != "", F.col("lone_m").cast("bigint"))
        .otherwise(0)
    )
    return ext.select("o_orderkey", "raw_runtime", minutes.alias("runtime_minutes"))


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
    oracle=r"""
    SELECT o_orderkey, url, regexp_extract(url, '(tt\d{7})', 1) AS imdb_id
    FROM (
      SELECT o_orderkey,
             'https://www.imdb.com/title/tt'
               || lpad(cast(o_orderkey % 10000000 as string), 7, '0')
               || '/' AS url
      FROM orders
    )
    """,
)
def q_regex_extract(spark, sf_dir):
    """imdb_id extraction from URL: str.extract(r'(tt\\d{7})')
    (challenge.py≈L82-85 [R])."""
    o = load_table(spark, sf_dir, "orders")
    url = F.concat(
        F.lit("https://www.imdb.com/title/tt"),
        F.lpad((F.col("o_orderkey") % 10000000).cast("string"), 7, "0"),
        F.lit("/"),
    )
    return (o.select("o_orderkey", url.alias("url"))
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
           sign(o_totalprice - 100000.0) AS sgn
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
        F.signum(tp - 100000.0).alias("sgn"),
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
