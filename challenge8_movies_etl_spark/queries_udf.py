"""Category I — UDF / UDAF / UDTF surface.

The reference's analog: ``parse_dollars`` and the row-wise
``df.apply(..., axis=1)`` lambdas (challenge.py≈L160-170 [R]) —
arbitrary-Python scalar functions are a required capability even though
the engine implements the hot paths natively (queries_functions.py).

Cost model made explicit here: the row-at-a-time UDF crosses the
Python↔JVM boundary per batch with pickled rows; the pandas_udf ships
Arrow record batches (~10-100x faster). Both produce identical values —
q_udf_scalar emits the two side by side and the oracle checks both
against the native parse_dollars SQL.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions.parsing import parse_dollars_sql
from .functions.synth import MONEY_SYNTH
from .registry import query
from .sources.fixtures import load_table

# Python twin of functions/parsing.py::parse_dollars_col — same regexes,
# same first-match-wins order, same float arithmetic (IEEE identical).
_CITE = re.compile(r"\[\d+\]")
_RANGE = re.compile(r"\$\s*\d+\.?\d*\s*[-–—]\s*")
_MILL = re.compile(r"\$\s*(\d+\.?\d*)\s*million")
_BILL = re.compile(r"\$\s*(\d+\.?\d*)\s*billion")
_COMMA = re.compile(r"\$\s*(\d{1,3}(?:,\d{3})+)")


def parse_dollars_py(s: str | None) -> float | None:
    if s is None:
        return None
    c = _RANGE.sub("$", _CITE.sub("", s))
    m = _MILL.search(c)
    if m:
        return float(m.group(1)) * 1e6
    b = _BILL.search(c)
    if b:
        return float(b.group(1)) * 1e9
    k = _COMMA.search(c)
    if k:
        return float(k.group(1).replace(",", ""))
    return None


@query(
    "q_udf_scalar",
    oracle=f"""
    SELECT o_orderkey, raw_money,
           {parse_dollars_sql('raw_money')} AS parsed_udf,
           {parse_dollars_sql('raw_money')} AS parsed_arrow
    FROM (SELECT o_orderkey, {MONEY_SYNTH} AS raw_money FROM orders)
    """,
)
def q_udf_scalar(spark, sf_dir):
    """parse_dollars through BOTH Python UDF paths (row-at-a-time and
    Arrow-vectorized pandas_udf), proving the UDF surface produces the
    exact values of the native expression (same oracle as
    q_dollar_parse). The native form remains the hot-path default."""
    plain_udf = F.udf(parse_dollars_py, T.DoubleType())

    @F.pandas_udf(T.DoubleType())
    def arrow_udf(s: pd.Series) -> pd.Series:
        return s.map(parse_dollars_py)

    o = load_table(spark, sf_dir, "orders")
    synth = o.selectExpr("o_orderkey", f"{MONEY_SYNTH} AS raw_money")
    return synth.select(
        "o_orderkey", "raw_money",
        plain_udf("raw_money").alias("parsed_udf"),
        arrow_udf("raw_money").alias("parsed_arrow"),
    )


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT o_orderpriority,
           median(o_totalprice) AS median_price,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_udaf_grouped(spark, sf_dir):
    """Grouped EXACT median via a pandas grouped-aggregate UDF.

    Spark's native exact median requires a full sort per group
    (percentile) — the pandas_udf grouped-agg form demonstrates the
    custom-UDAF path the reference's df.apply aggregations would need.
    Exactness matters: percentile_approx would not hash-match DuckDB's
    median. Even-count groups average the two middle values — identical
    float op in pandas and DuckDB.
    """
    @F.pandas_udf(T.DoubleType())
    def exact_median(s: pd.Series) -> float:
        return float(s.median())

    # Spark disallows mixing grouped-agg pandas UDFs with native
    # aggregates in one agg(), so the count rides the same UDF path.
    @F.pandas_udf(T.LongType())
    def exact_count(s: pd.Series) -> int:
        return len(s)

    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        exact_median("o_totalprice").alias("median_price"),
        exact_count("o_totalprice").alias("n"),
    )


@query(
    "q_udtf",
    oracle="""
    SELECT d.doc_id, d.toks[gs.i] AS token, gs.i AS pos
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d
    JOIN range(1, 100000) gs(i) ON gs.i <= len(d.toks)
    """,
)
def q_udtf(spark, sf_dir):
    """Python UDTF (Spark 4 arrow-optimized): text -> (token, position)
    rows via LATERAL join — the table-function generalization of the
    reference's clean_movie record-to-rows reshaping."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, pos: bigint")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield tok, i + 1

    import uuid as _uuid
    sfx = _uuid.uuid4().hex[:8]
    spark.udtf.register(f"tokenize_udtf_{sfx}", Tokenize)
    d = load_table(spark, sf_dir, "documents")
    view = f"documents_udtf_{sfx}"
    d.createOrReplaceTempView(view)
    return spark.sql(f"""
        SELECT d.doc_id, t.token, t.pos
        FROM {view} d, LATERAL tokenize_udtf_{sfx}(d.text) t
    """)


@query(
    "q_cogroup_asof",
    oracle="""
    WITH thr AS (
      SELECT t.event_type, k.k AS thr_k,
             TIMESTAMP '2024-01-01' + INTERVAL (k.k * 7) DAY AS thr_ts,
             (k.k + 1) * 10 AS thr
      FROM (SELECT DISTINCT event_type FROM events) t,
           (SELECT unnest(generate_series(0, 4)) AS k) k
    )
    SELECT e.event_type, t.thr_k, t.thr,
           count(*) AS n_events,
           cast(coalesce(sum(CASE WHEN e.value > t.thr THEN 1 END), 0)
                as bigint) AS n_above
    FROM events e ASOF JOIN thr t
      ON e.event_type = t.event_type AND e.ts >= t.thr_ts
    GROUP BY e.event_type, t.thr_k, t.thr
    ORDER BY e.event_type, t.thr_k
    """,
)
def q_cogroup_asof(spark, sf_dir):
    """Cogrouped applyInPandas — the per-key two-sided pandas surface
    (`df.groupBy(k).cogroup(other.groupBy(k)).applyInPandas`): each
    event_type's events and its 5-row threshold schedule meet in ONE
    pandas callback that runs merge_asof (latest threshold at or
    before each event) and returns the per-(type, threshold-epoch)
    aggregate — the canonical Spark-docs shape for per-key as-of
    enrichment when the right-side logic is genuinely frame-wise.
    The declarative twins (q_join_asof / q_join_asof_nearest) remain
    the scale path for plain as-of joins; THIS surface is for when
    the per-key merge needs imperative pandas logic.

    Hash discipline: thresholds and counts are all integers; the only
    float op is the value>thr comparison of a parquet double against
    an int — deterministic on both engines. The oracle runs DuckDB's
    native ASOF JOIN against the identical generated schedule.

    Scale: cogroup shuffles both sides once on the key; each pandas
    call sees one key's rows. Skewed keys bound the batch — for a
    100 TB skewed key, pre-aggregate or salt before the cogroup
    (q_agg_salted pattern); output here is O(keys × epochs)."""
    import datetime as dt

    e = load_table(spark, sf_dir, "events")
    # the schedule side derives from the same cached events frame —
    # project its key under a NEW name (fresh exprId) so the cogroup
    # doesn't trip the ambiguous-self-join check; cogroup matches
    # grouping keys positionally, names may differ
    types = (e.select(F.col("event_type").alias("et")).distinct())
    thr = (types.crossJoin(F.broadcast(
              spark.range(5).select(F.col("id").alias("thr_k"))))
           .select("et", "thr_k",
                   (F.lit(dt.datetime(2024, 1, 1))
                    + F.make_interval(days=F.col("thr_k") * 7))
                    .alias("thr_ts"),
                   ((F.col("thr_k") + 1) * 10).alias("thr")))

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame(columns=["event_type", "thr_k", "thr",
                                         "n_events", "n_above"])
        left = left.sort_values("ts")
        right = right.sort_values("thr_ts")
        m = pd.merge_asof(left, right, left_on="ts", right_on="thr_ts",
                          direction="backward")
        g = (m.groupby(["thr_k", "thr"], as_index=False)
             .agg(n_events=("value", "size"),
                  n_above=("value", lambda v: int(
                      (v > m.loc[v.index, "thr"]).sum()))))
        g.insert(0, "event_type", left["event_type"].iloc[0])
        return g

    out = (e.select("event_type", "ts", "value").groupBy("event_type")
           .cogroup(thr.groupBy("et"))
           .applyInPandas(merge, "event_type string, thr_k bigint, "
                                 "thr bigint, n_events bigint, "
                                 "n_above bigint"))
    return out.orderBy("event_type", "thr_k")
