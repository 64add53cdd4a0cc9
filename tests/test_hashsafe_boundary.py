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


def test_negative_sampling_w6_quantize_cross_engine(spark):
    """r10 ADVICE item 1: w6 = round(sqrt(c*sqrt(c)),6)*1e6 cast
    straight from double to bigint diverges cross-engine — Spark
    TRUNCATES double→bigint while DuckDB ROUNDS, and for cnt=41 the
    double product is 16202718.999999998 (j−ε). The fix routes the 6dp
    quantization through decimal(18,6), whose cast rounds HALF_UP
    identically on both engines and whose ×1e6 multiply is exact.
    This test pins the divergent class: the OLD form must disagree on
    cnt=41 (documenting the hazard) and the NEW form must agree on
    every count in the battery, including 41."""
    import duckdb

    counts = [1, 2, 7, 13, 29, 41, 97, 100, 1000, 4096, 65537]
    old = ("cast(round(sqrt(c * sqrt(c)), 6) * 1000000 as bigint)")
    new = ("cast(cast(round(sqrt(c * sqrt(c)), 6) as decimal(18,6))"
           " * 1000000 as bigint)")
    sdf = spark.createDataFrame([(c,) for c in counts], "c long")
    s_old = {r["c"]: r["w"] for r in
             sdf.selectExpr("c", f"{old} AS w").collect()}
    s_new = {r["c"]: r["w"] for r in
             sdf.selectExpr("c", f"{new} AS w").collect()}
    con = duckdb.connect()
    d_old, d_new = {}, {}
    for c in counts:
        d_old[c] = con.execute(
            f"SELECT {old} FROM (SELECT {c}::bigint AS c)").fetchone()[0]
        d_new[c] = con.execute(
            f"SELECT {new} FROM (SELECT {c}::bigint AS c)").fetchone()[0]
    # the motivating hazard: old form disagrees at cnt=41
    assert s_old[41] != d_old[41], (
        "cnt=41 no longer diverges on this host: "
        f"spark={s_old[41]} duck={d_old[41]} — if libm changed, "
        "re-verify the whole class")
    # the fix: decimal-quantized form agrees everywhere
    for c in counts:
        assert s_new[c] == d_new[c], (c, s_new[c], d_new[c])
