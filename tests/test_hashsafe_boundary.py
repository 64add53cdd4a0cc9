"""Constructed half-boundary ties for the exact-division helpers
(VERDICT r9 item 3).

The classic failure: a mean whose TRUE rational value sits exactly on
a round(·, nd) half boundary, where Spark's BigDecimal HALF_UP over
the double's binary expansion and DuckDB's double multiply+nearbyint
can legally disagree (q_lm_score / q_ngram_lm, caught by the r9 sf1.0
sweep). davg(gdp=)/sql_davg(gdp=) must resolve the tie identically on
both engines by integer half-away-from-zero division.
"""

import duckdb
import pytest

from challenge8_movies_etl_spark.functions.hashsafe import davg, sql_davg


@pytest.fixture(scope="module")
def tie_frame(spark):
    # 200 values of 0.00 plus one 0.01 → mean = 0.01/200 = 0.00005,
    # EXACTLY on the 4dp half boundary; half-away-from-zero → 0.0001.
    rows = [(0.01,)] + [(0.0,)] * 199
    return spark.createDataFrame(rows, "v double")


def test_davg_exact_tie_rounds_half_away(tie_frame):
    out = tie_frame.agg(davg("v", "m", nd=4, gdp=2)).collect()[0]["m"]
    assert out == 0.0001, out


def test_davg_exact_negative_tie(tie_frame, spark):
    neg = spark.createDataFrame([(-0.01,)] + [(0.0,)] * 199, "v double")
    out = neg.agg(davg("v", "m", nd=4, gdp=2)).collect()[0]["m"]
    assert out == -0.0001, out


def test_sql_davg_matches_spark_on_tie(tie_frame):
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT 0.01::double AS v "
                "UNION ALL SELECT 0.0 FROM range(199)")
    sql = f"SELECT {sql_davg('v', 'm', nd=4, gdp=2)} FROM t"
    out = con.execute(sql).fetchone()[0]
    assert out == 0.0001, out
    spark_out = tie_frame.agg(davg("v", "m", nd=4, gdp=2)) \
        .collect()[0]["m"]
    assert out == spark_out


def test_old_double_path_is_the_motivating_hazard():
    """Documents WHY the exact path exists: the double nearest to
    0.00005 is below the true rational, so double-rounding gives
    0.0000 while the exact tie rule gives 0.0001 — the 1-ulp wrong
    answer class the gdp= path eliminates."""
    assert repr(0.01 / 200) == "5e-05"
    assert round(0.01 / 200, 4) in (0.0, 0.0001)  # impl-defined — the point
