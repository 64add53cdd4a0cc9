"""Reusable messy-string parsers — the engine's library form of the
reference's cleaning functions (parse_dollars, date forms, running
time; challenge.py≈L90-132 [R], SURVEY.md §0 legend).

Each parser exists twice, by design:

- ``*_col(col) -> Column``: the Spark expression (native functions only
  — regexp_replace / regexp_extract / when — so the parse stays inside
  whole-stage codegen; no Python boundary at any scale);
- ``*_sql(expr) -> str``: the same semantics as a self-contained ANSI
  SQL expression for the DuckDB oracle.

Regexes stay in the Java∩RE2 shared subset (no lookarounds/backrefs).
Java quirk handled here: '$' in a Java regex *replacement* is a group
reference and must be escaped; DuckDB takes it literally.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# parse_dollars
# ---------------------------------------------------------------------------

# One alternation does the whole job in a single compiled-regex pass
# (previously: 2 cleaning regexp_replace + 3 regexp_extract = 5 passes,
# the flagship's hottest expression at 0.41 s/150k rows; now ~1 pass +
# literal replace/trim, which are plain byte ops). The optional
# '$lo-' prefix subsumes the old range-collapse replace (keep the hi
# value); '[n]' citations never block the match because the pattern is
# unanchored, so the citation-strip pass is unnecessary.
_MONEY_ONE = (r"\$\s*(?:\d+\.?\d*\s*[-–—]\s*)?"
              r"((\d+\.?\d*)\s*(?:million|billion)|\d{1,3}(?:,\d{3})+)")


def parse_dollars_col(col: Column | str) -> Column:
    """'$d.d million' x1e6 | '$d.d billion' x1e9 | '$d,ddd,ddd' -> double,
    else NULL; '$lo-hi <unit>' ranges take hi, '[n]' citations are
    ignored (reference parse_dollars semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    tok = F.regexp_extract(c, _MONEY_ONE, 1)
    num = F.trim(F.replace(F.replace(tok, F.lit("million"), F.lit("")),
                           F.lit("billion"), F.lit("")))
    return (
        F.when(tok.contains("million"), num.cast("double") * 1e6)
        .when(tok.contains("billion"), num.cast("double") * 1e9)
        .when(tok != "",
              F.replace(tok, F.lit(","), F.lit("")).cast("double"))
    )


def parse_dollars_sql(expr: str) -> str:
    """DuckDB twin of :func:`parse_dollars_col` (self-contained)."""
    tok = (rf"regexp_extract({expr}, '\$\s*(?:\d+\.?\d*\s*[-–—]\s*)?"
           rf"((\d+\.?\d*)\s*(?:million|billion)|\d{{1,3}}(?:,\d{{3}})+)', 1)")
    num = (f"trim(replace(replace({tok}, 'million', ''),"
           f" 'billion', ''))")
    return f"""CASE
      WHEN contains({tok}, 'million') THEN cast({num} as double) * 1e6
      WHEN contains({tok}, 'billion') THEN cast({num} as double) * 1e9
      WHEN {tok} <> '' THEN cast(replace({tok}, ',', '') as double)
      ELSE NULL END"""


# ---------------------------------------------------------------------------
# multi-format dates
# ---------------------------------------------------------------------------

_DUCK_DATE_FMTS = ("%B %d, %Y", "%Y-%m-%d", "%B %Y", "%Y")
# Dispatch on cheap structural probes (length / contains-comma) instead
# of regexes: the four shapes are disjoint on these probes ('YYYY' is
# the only length-4, 'YYYY-MM-DD' the only length-10-with-dash-at-5
# ('April 1995' is also length 10), 'Month D, YYYY' the only
# comma-bearing form), so each row still hits exactly ONE
# try_to_timestamp and zero regex passes. (Round-1 design used four
# rlike guards to avoid exception-driven failed JVM parses — the
# structural probes keep that property at byte-op cost. Measured: the
# date parse dropped 0.29 s -> ~0.1 s per 150k rows at sf0.1.)


def parse_date_multiformat_col(col: Column | str) -> Column:
    """'Month D, YYYY' | 'YYYY-MM-DD' | 'Month YYYY' | 'YYYY' -> timestamp,
    first match wins (reference's four date_form_* regexes +
    to_datetime, challenge.py≈L117-123 [R])."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(F.length(c) == 4, F.try_to_timestamp(c, F.lit("yyyy")))
        .when((F.length(c) == 10) & (F.substring(c, 5, 1) == "-"),
              F.try_to_timestamp(c, F.lit("yyyy-MM-dd")))
        .when(c.contains(","), F.try_to_timestamp(c, F.lit("MMMM d, yyyy")))
        .when(c.isNotNull() & (c != ""),
              F.try_to_timestamp(c, F.lit("MMMM yyyy")))
    )


def parse_date_multiformat_sql(expr: str) -> str:
    tries = ", ".join(f"try_strptime({expr}, '{f}')" for f in _DUCK_DATE_FMTS)
    return f"coalesce({tries})"


# ---------------------------------------------------------------------------
# running time
# ---------------------------------------------------------------------------

# Two regex passes (was three): the trailing-minutes pattern serves
# both the 'XhYm' tail and the lone 'Z m' form — when an hours match is
# present the end-anchored minutes necessarily follow it.
_H = r"(\d+)\s*h"
_TAIL_M = r"(\d+)\s*m$"


def parse_runtime_col(col: Column | str) -> Column:
    """'XhYm' -> X*60+Y | 'Z m' -> Z | else 0 (reference NaN->0,
    challenge.py≈L125-132 [R])."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.regexp_extract(c, _H, 1)
    m = F.regexp_extract(c, _TAIL_M, 1)
    return (
        F.when(h != "",
               h.cast("bigint") * 60
               + F.when(m != "", m.cast("bigint")).otherwise(0))
        .when(m != "", m.cast("bigint"))
        .otherwise(0)
    )


def parse_runtime_sql(expr: str) -> str:
    h = rf"regexp_extract({expr}, '(\d+)\s*h', 1)"
    m = rf"regexp_extract({expr}, '(\d+)\s*m$', 1)"
    return f"""CASE
      WHEN {h} <> '' THEN cast({h} as bigint) * 60
        + CASE WHEN {m} <> '' THEN cast({m} as bigint) ELSE 0 END
      WHEN {m} <> '' THEN cast({m} as bigint)
      ELSE 0 END"""


# ---------------------------------------------------------------------------
# Spark-dialect SQL twins (round 5)
#
# The flagship pipeline is executed as ONE spark.sql() text: building
# the same expressions through the Column API costs ~0.34 s of py4j
# round-trips per fresh build at sf0.1 (profiled round 5) — pure
# driver-side constant, the single biggest term in the flagship's
# bench median. A single SQL string is one py4j call; the JVM parser
# handles the whole tree in ~10 ms. Spark's default (non-ANSI) string
# literals treat backslash as an escape, so regex backslashes are
# doubled relative to the DuckDB twins.
# ---------------------------------------------------------------------------

def _spark_regex_literal(pat: str) -> str:
    """Double backslashes for a Spark SQL single-quoted literal."""
    return pat.replace("\\", "\\\\")


def parse_dollars_spark_sql(expr: str) -> str:
    """Spark SQL twin of :func:`parse_dollars_col` (same single regex
    pass; Catalyst CSE dedups the repeated extract in codegen)."""
    tok = f"regexp_extract({expr}, '{_spark_regex_literal(_MONEY_ONE)}', 1)"
    num = f"trim(replace(replace({tok}, 'million', ''), 'billion', ''))"
    return f"""CASE
      WHEN contains({tok}, 'million') THEN cast({num} as double) * 1e6
      WHEN contains({tok}, 'billion') THEN cast({num} as double) * 1e9
      WHEN {tok} <> '' THEN cast(replace({tok}, ',', '') as double)
      ELSE NULL END"""


def parse_date_multiformat_spark_sql(expr: str) -> str:
    """Spark SQL twin of :func:`parse_date_multiformat_col` — the same
    structural-probe dispatch onto try_to_timestamp."""
    return f"""CASE
      WHEN length({expr}) = 4 THEN try_to_timestamp({expr}, 'yyyy')
      WHEN length({expr}) = 10 AND substring({expr}, 5, 1) = '-'
        THEN try_to_timestamp({expr}, 'yyyy-MM-dd')
      WHEN contains({expr}, ',')
        THEN try_to_timestamp({expr}, 'MMMM d, yyyy')
      WHEN {expr} IS NOT NULL AND {expr} <> ''
        THEN try_to_timestamp({expr}, 'MMMM yyyy')
      ELSE NULL END"""


def parse_runtime_spark_sql(expr: str) -> str:
    """Spark SQL twin of :func:`parse_runtime_col`."""
    h = f"regexp_extract({expr}, '(\\\\d+)\\\\s*h', 1)"
    m = f"regexp_extract({expr}, '(\\\\d+)\\\\s*m$', 1)"
    return f"""CASE
      WHEN {h} <> '' THEN cast({h} as bigint) * 60
        + CASE WHEN {m} <> '' THEN cast({m} as bigint) ELSE 0 END
      WHEN {m} <> '' THEN cast({m} as bigint)
      ELSE 0 END"""
