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
