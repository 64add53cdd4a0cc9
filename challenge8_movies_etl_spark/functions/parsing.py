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

_CITE = r"\[\d+\]"
_RANGE = r"\$\s*\d+\.?\d*\s*[-–—]\s*"
_MILL = r"\$\s*(\d+\.?\d*)\s*million"
_BILL = r"\$\s*(\d+\.?\d*)\s*billion"
_COMMA = r"\$\s*(\d{1,3}(?:,\d{3})+)"


def _clean_money(col: Column) -> Column:
    # strip '[n]' citations, then collapse '$lo-hi' ranges to '$hi'
    return F.regexp_replace(F.regexp_replace(col, _CITE, ""), _RANGE, r"\$")


def parse_dollars_col(col: Column | str) -> Column:
    """'$d.d million' x1e6 | '$d.d billion' x1e9 | '$d,ddd,ddd' -> double,
    else NULL. First match wins (reference form_one before form_two)."""
    c = _clean_money(F.col(col) if isinstance(col, str) else col)
    mill = F.regexp_extract(c, _MILL, 1)
    bill = F.regexp_extract(c, _BILL, 1)
    comma = F.regexp_extract(c, _COMMA, 1)
    return (
        F.when(mill != "", mill.cast("double") * 1e6)
        .when(bill != "", bill.cast("double") * 1e9)
        .when(comma != "",
              F.replace(comma, F.lit(","), F.lit("")).cast("double"))
    )


def parse_dollars_sql(expr: str) -> str:
    """DuckDB twin of :func:`parse_dollars_col` (self-contained)."""
    clean = (rf"regexp_replace(regexp_replace({expr}, '\[\d+\]', ''),"
             rf" '\$\s*\d+\.?\d*\s*[-–—]\s*', '$')")
    mill = rf"regexp_extract({clean}, '\$\s*(\d+\.?\d*)\s*million', 1)"
    bill = rf"regexp_extract({clean}, '\$\s*(\d+\.?\d*)\s*billion', 1)"
    comma = rf"regexp_extract({clean}, '\$\s*(\d{{1,3}}(?:,\d{{3}})+)', 1)"
    return f"""CASE
      WHEN {mill} <> '' THEN cast({mill} as double) * 1e6
      WHEN {bill} <> '' THEN cast({bill} as double) * 1e9
      WHEN {comma} <> '' THEN cast(replace({comma}, ',', '') as double)
      ELSE NULL END"""


# ---------------------------------------------------------------------------
# multi-format dates
# ---------------------------------------------------------------------------

_SPARK_DATE_FMTS = ("MMMM d, yyyy", "yyyy-MM-dd", "MMMM yyyy", "yyyy")
_DUCK_DATE_FMTS = ("%B %d, %Y", "%Y-%m-%d", "%B %Y", "%Y")
# shape guards, one per format (the reference's literal approach: four
# date_form_* regexes). Performance is the other reason they exist
# here: a bare coalesce(try_to_timestamp x4) costs ~1.5 FAILED parse
# attempts per row, and failed JVM datetime parses are exception-driven
# — the rlike dispatch parses each row exactly once (measured ~0.5 s
# off the flagship at sf0.1).
_DATE_SHAPES = (r"^[A-Za-z]+ \d{1,2}, \d{4}$", r"^\d{4}-\d{2}-\d{2}$",
                r"^[A-Za-z]+ \d{4}$", r"^\d{4}$")


def parse_date_multiformat_col(col: Column | str) -> Column:
    """'Month D, YYYY' | 'YYYY-MM-DD' | 'Month YYYY' | 'YYYY' -> timestamp,
    first match wins (reference's four date_form_* regexes +
    to_datetime, challenge.py≈L117-123 [R])."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for shape, fmt in zip(_DATE_SHAPES, _SPARK_DATE_FMTS):
        branch = F.when(c.rlike(shape), F.try_to_timestamp(c, F.lit(fmt)))
        expr = branch if expr is None else expr.when(
            c.rlike(shape), F.try_to_timestamp(c, F.lit(fmt)))
    return expr


def parse_date_multiformat_sql(expr: str) -> str:
    tries = ", ".join(f"try_strptime({expr}, '{f}')" for f in _DUCK_DATE_FMTS)
    return f"coalesce({tries})"


# ---------------------------------------------------------------------------
# running time
# ---------------------------------------------------------------------------

_H = r"(\d+)\s*h"
_HM = r"h\s*(\d+)\s*m"
_LONE_M = r"^(\d+)\s*m$"


def parse_runtime_col(col: Column | str) -> Column:
    """'XhYm' -> X*60+Y | 'Z m' -> Z | else 0 (reference NaN->0,
    challenge.py≈L125-132 [R])."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.regexp_extract(c, _H, 1)
    hm = F.regexp_extract(c, _HM, 1)
    lone = F.regexp_extract(c, _LONE_M, 1)
    return (
        F.when(h != "",
               h.cast("bigint") * 60
               + F.when(hm != "", hm.cast("bigint")).otherwise(0))
        .when(lone != "", lone.cast("bigint"))
        .otherwise(0)
    )


def parse_runtime_sql(expr: str) -> str:
    h = rf"regexp_extract({expr}, '(\d+)\s*h', 1)"
    hm = rf"regexp_extract({expr}, 'h\s*(\d+)\s*m', 1)"
    lone = rf"regexp_extract({expr}, '^(\d+)\s*m$', 1)"
    return f"""CASE
      WHEN {h} <> '' THEN cast({h} as bigint) * 60
        + CASE WHEN {hm} <> '' THEN cast({hm} as bigint) ELSE 0 END
      WHEN {lone} <> '' THEN cast({lone} as bigint)
      ELSE 0 END"""
