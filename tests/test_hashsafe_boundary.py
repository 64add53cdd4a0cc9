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


def test_reduced_tie_formula_equals_fraction_rounding():
    """Property: the davg/sql_davg reduced integer formula equals
    exact round-half-away-from-zero of the true rational S/(10^gdp·C)
    at nd decimal places, for random sums, counts and (gdp, nd)
    combinations — the arithmetic core of the round-10 quotient
    adjudication, checked against Fraction ground truth."""
    from fractions import Fraction

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def formula(s: int, c: int, gdp: int, nd: int) -> int:
        d = nd - gdp
        if d >= 0:
            num_p = 2 * s * 10 ** d + c
            num_n = 2 * -s * 10 ** d + c
            den = 2 * c
        else:
            num_p = 2 * s + c * 10 ** -d
            num_n = 2 * -s + c * 10 ** -d
            den = 2 * c * 10 ** -d
        return num_p // den if s >= 0 else -(num_n // den)

    def ground_truth(s: int, c: int, gdp: int, nd: int) -> int:
        v = Fraction(s, 10 ** gdp * c) * 10 ** nd
        # round half away from zero
        q, r = divmod(abs(v.numerator), v.denominator)
        up = q + (1 if 2 * r >= v.denominator else 0)
        return up if v >= 0 else -up

    @settings(max_examples=500, deadline=None)
    @given(st.integers(-10 ** 15, 10 ** 15),
           st.integers(1, 10 ** 7),
           st.sampled_from([0, 2, 4, 6, 8, 10]),
           st.sampled_from([2, 4, 6, 8, 10]))
    def check(s, c, gdp, nd):
        assert formula(s, c, gdp, nd) == ground_truth(s, c, gdp, nd)

    check()


def test_tie_formula_on_exact_boundaries():
    """Deterministic boundary battery: constructed exact ties at every
    (gdp, nd) pairing round away from zero."""
    from fractions import Fraction

    for gdp in (0, 2, 6, 10):
        for nd in (2, 4, 8):
            c = 7
            # choose S so S/(10^gdp·c) == (2m+1)/(2·10^nd) exactly:
            # S = (2m+1)·10^(gdp-nd)·c/2 — pick m so S is integral
            num = Fraction(3, 2 * 10 ** nd) * 10 ** gdp * c
            if num.denominator != 1:
                continue  # not constructible at this pairing
            s = int(num)
            d = nd - gdp
            if d >= 0:
                got = (2 * s * 10 ** d + c) // (2 * c)
            else:
                got = (2 * s + c * 10 ** -d) // (2 * c * 10 ** -d)
            assert got == 2, (gdp, nd, s, got)  # round(1.5-like) -> 2
