"""Edge-case goldens for the messy-string parsers (SURVEY.md §5.3) —
the reference's documented assumption cases: range strings, citations,
comma forms, billions, hour/minute runtimes, 4 date formats, and the
zero-vs-null distinction in conditional fill."""

from __future__ import annotations

from pyspark.sql import functions as F

from challenge8_movies_etl_spark.functions.parsing import (
    parse_date_multiformat_col,
    parse_dollars_col,
    parse_runtime_col,
)
from challenge8_movies_etl_spark.queries_udf import parse_dollars_py

DOLLAR_GOLDENS = [
    ("$14.3 million", 14_300_000.0),
    ("$ 1.1 billion", 1_100_000_000.0),
    ("$123,456,789", 123_456_789.0),
    ("$1.2-1.5 million", 1_500_000.0),      # range collapses to upper
    ("$1.2–1.5 million", 1_500_000.0),      # en-dash variant
    ("$826.2 million[1]", 826_200_000.0),   # citation stripped
    ("N/A", None),
    ("about twelve dollars", None),
]

RUNTIME_GOLDENS = [
    ("2h 15m", 135),
    ("1h 0m", 60),
    ("90 m", 90),
    ("104 m", 104),
    ("unknown", 0),
]

DATE_GOLDENS = [
    ("March 5, 1997", "1997-03-05"),
    ("1997-03-05", "1997-03-05"),
    ("March 1997", "1997-03-01"),
    ("1997", "1997-01-01"),
    ("not a date", None),
]


def _run(spark, values, col_builder, out_cast=None):
    df = spark.createDataFrame([(v,) for v, _ in values], ["raw"])
    col = col_builder(F.col("raw"))
    if out_cast:
        col = col.cast(out_cast)
    rows = df.select("raw", col.alias("out")).collect()
    got = {r["raw"]: r["out"] for r in rows}
    return got


def test_parse_dollars_goldens(spark):
    got = _run(spark, DOLLAR_GOLDENS, parse_dollars_col)
    for raw, want in DOLLAR_GOLDENS:
        assert got[raw] == want, (raw, got[raw], want)


def test_parse_dollars_python_twin_matches():
    for raw, want in DOLLAR_GOLDENS:
        assert parse_dollars_py(raw) == want, raw


def test_parse_runtime_goldens(spark):
    got = _run(spark, RUNTIME_GOLDENS, parse_runtime_col)
    for raw, want in RUNTIME_GOLDENS:
        assert got[raw] == want, (raw, got[raw], want)


def test_parse_dates_goldens(spark):
    got = _run(spark, DATE_GOLDENS,
               lambda c: parse_date_multiformat_col(c).cast("date")
               .cast("string"))
    for raw, want in DATE_GOLDENS:
        assert got[raw] == want, (raw, got[raw], want)


def test_conditional_fill_zero_vs_null(spark):
    """The reference fills kaggle ZEROS from wiki, but keeps kaggle
    nulls as nulls only when wiki is also null — when/otherwise mirrors
    that: null kaggle -> otherwise branch keeps null."""
    df = spark.createDataFrame(
        [(0.0, 5.0), (3.0, 9.0), (None, 7.0), (0.0, None)],
        "kaggle double, wiki double")
    out = df.select(
        F.when(F.col("kaggle") == 0, F.col("wiki"))
        .otherwise(F.col("kaggle")).alias("filled")).collect()
    assert [r["filled"] for r in out] == [5.0, 3.0, None, None]


def test_spark_sql_twins_match_goldens(spark):
    """The round-5 Spark-dialect SQL twins (used by the single-text
    flagship) hit the same goldens as the Column builders — dollars,
    runtimes, and all four date shapes, including the regex-escaping
    (backslash doubling) the SQL literals require."""
    from challenge8_movies_etl_spark.functions.parsing import (
        parse_date_multiformat_spark_sql,
        parse_dollars_spark_sql,
        parse_runtime_spark_sql,
    )

    df = spark.createDataFrame(
        [(v,) for v, _ in DOLLAR_GOLDENS + RUNTIME_GOLDENS + DATE_GOLDENS],
        ["raw"])
    df.createOrReplaceTempView("goldens")
    got = {r["raw"]: r for r in spark.sql(f"""
        SELECT raw,
               {parse_dollars_spark_sql('raw')} AS dollars,
               {parse_runtime_spark_sql('raw')} AS runtime,
               cast({parse_date_multiformat_spark_sql('raw')} as date)
                 AS dt
        FROM goldens""").collect()}
    for raw, want in DOLLAR_GOLDENS:
        assert got[raw]["dollars"] == want, (raw, got[raw]["dollars"])
    for raw, want in RUNTIME_GOLDENS:
        assert got[raw]["runtime"] == want, (raw, got[raw]["runtime"])
    for raw, want in DATE_GOLDENS:
        d = got[raw]["dt"]
        assert (str(d) if d is not None else None) == want, (raw, d)
