"""Calibration operators (queries_calibration.py): ECE identity,
conformal coverage guarantee, and the PAV twin that pins
q_isotonic_pav (which ships without a SQL oracle)."""

from __future__ import annotations

import math

from challenge8_movies_etl_spark.queries_calibration import (
    pav_fit,
    q_calibration_ece,
    q_conformal_threshold,
    q_isotonic_pav,
)
from tests.conftest import SF_SMOKE


def test_ece_is_weighted_gap_sum(spark):
    rows = q_calibration_ece(spark, SF_SMOKE).collect()
    assert len(rows) == 10
    n_total = sum(r.n_events for r in rows)
    expect = sum(r.n_events * abs(r.accuracy - r.confidence)
                 for r in rows) / n_total
    # every row carries the same whole-frame ECE, equal to the
    # n-weighted mean gap (up to the 6dp rounding of gap itself)
    assert len({r.ece for r in rows}) == 1
    assert math.isclose(rows[0].ece, expect, abs_tol=2e-6)
    # the synthetic labels are calibrated-ish: per-bin accuracy tracks
    # confidence within the binomial noise of an sf0.001 bin
    assert all(r.gap < 0.2 for r in rows)


def test_conformal_coverage_near_nominal(spark):
    rows = q_conformal_threshold(spark, SF_SMOKE).collect()
    assert {r.event_type for r in rows} >= {"click", "view"}
    for r in rows:
        # split-conformal guarantees P(score <= threshold) >= 0.9 in
        # expectation; with exchangeable integer scores the empirical
        # test coverage should sit near 0.9, never far below
        assert r.coverage >= 0.8, r
        assert r.coverage <= 1.0
        assert 0 <= r.threshold <= 100
        assert r.n_cal > r.n_test  # 80/20 split


def test_pav_twin_exact_small_case():
    # classic pooling example: means [1.0, 0.0, 0.5] -> first two pool
    # to 0.5, already <= 0.5, so fit = [0.5, 0.5, 0.5]
    assert pav_fit([0, 1, 2], [2, 0, 1], [2, 2, 2]) == [0.5, 0.5, 0.5]
    # already isotone input is untouched
    assert pav_fit([0, 1, 2], [0, 1, 2], [2, 2, 2]) == [0.0, 0.5, 1.0]
    # single violator pools with exact weighted mean
    out = pav_fit([0, 1], [3, 1], [4, 4])  # means 0.75, 0.25 -> 0.5
    assert out == [0.5, 0.5]


def test_isotonic_query_monotone_and_mass_preserving(spark):
    rows = q_isotonic_pav(spark, SF_SMOKE).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert len(by_type) == 5
    for rs in by_type.values():
        rs.sort(key=lambda r: r.bucket)
        iso = [r.iso_rate for r in rs]
        # monotone nondecreasing (6dp rounding can flip by 1 ulp)
        assert all(b >= a - 1e-6 for a, b in zip(iso, iso[1:]))
        # PAV preserves the weighted mean of the raw rates
        n = sum(r.n for r in rs)
        raw_mass = sum(r.raw_rate * r.n for r in rs)
        iso_mass = sum(r.iso_rate * r.n for r in rs)
        assert math.isclose(raw_mass, iso_mass, rel_tol=1e-4), (
            raw_mass, iso_mass)
        assert all(0.0 <= v <= 1.0 for v in iso)


def test_brier_murphy_identity(spark):
    from challenge8_movies_etl_spark.registry import QUERIES
    from tests.conftest import SF_SMOKE
    r = QUERIES["q_brier_murphy"](spark, SF_SMOKE).collect()[0]
    # generalized Murphy identity (exact for binned continuous p)
    assert abs(r["brier"] - (r["reliability"] - r["resolution"]
                             + r["uncertainty"] + r["wb_var"]
                             - 2 * r["wb_cov"])) < 5e-6
    assert 0.0 <= r["brier"] <= 1.0
    assert r["reliability"] >= 0.0 and r["resolution"] >= 0.0
    assert 0.0 <= r["uncertainty"] <= 0.25 + 1e-12


def test_brier_matches_python_twin(spark):
    from challenge8_movies_etl_spark.registry import QUERIES
    from tests.conftest import SF_SMOKE
    rows = (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .select("event_id").collect())
    sq = n = 0
    for row in rows:
        pm = row.event_id % 1000
        label = 1 if (row.event_id * 7919) % 1000 < pm else 0
        sq += (pm - 1000 * label) ** 2
        n += 1
    r = QUERIES["q_brier_murphy"](spark, SF_SMOKE).collect()[0]
    assert r["n"] == n
    # Spark rounds HALF_UP; Python round() is half-to-even — emulate
    from decimal import ROUND_HALF_UP, Decimal
    expect = float((Decimal(sq) / (Decimal(n) * 1_000_000))
                   .quantize(Decimal("0.000001"),
                             rounding=ROUND_HALF_UP))
    assert abs(r["brier"] - expect) < 1e-12


def test_label_noise_confident_joint_partition(spark):
    from challenge8_movies_etl_spark.registry import QUERIES
    from tests.conftest import SF_SMOKE
    r = QUERIES["q_label_noise"](spark, SF_SMOKE).collect()[0]
    n = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    total = r["c00"] + r["c01"] + r["c10"] + r["c11"]
    # every example clears at least one class threshold only if its
    # probability is extreme; the joint counts each (label, cleared
    # class) pair, so total <= 2n and >= the confident subset
    assert 0 < total <= 2 * n
    assert 0.0 <= r["noise_rate"] < 0.5  # fixture labels track p


def test_pav_blocks_boundary_identities():
    """The SQL identities q_isotonic_check relies on: with STRICT
    merging the first block is the shortest argmin-prefix and the last
    block the shortest argmax-suffix — including when adjacent blocks
    tie on mean (equal means must NOT pool)."""
    from challenge8_movies_etl_spark.queries_calibration import pav_blocks

    # equal-mean adjacent blocks stay separate: [0],[0] then [1],[1]
    blocks, sizes = pav_blocks([0, 0, 1, 1], [1, 1, 1, 1])
    assert [list(map(int, b)) for b in blocks] == [[0, 1], [0, 1],
                                                   [1, 1], [1, 1]]
    assert sizes == [1, 1, 1, 1]
    # shortest argmin prefix (0,1), NOT the pooled (0,2)
    assert (int(blocks[0][0]), blocks[0][1]) == (0, 1)
    assert (int(blocks[-1][0]), blocks[-1][1]) == (1, 1)

    # a violating sequence pools left-heavy: y=[1,1,0] all pools
    blocks, sizes = pav_blocks([1, 1, 0], [1, 1, 1])
    assert len(blocks) == 1 and sizes == [3]
    assert (int(blocks[0][0]), blocks[0][1]) == (2, 3)

    # brute-force the identities on every 0/1 sequence of length <= 8
    from itertools import product
    for m in range(1, 9):
        for ys in product((0, 1), repeat=m):
            blocks, _ = pav_blocks(list(ys), [1] * m)
            pre = [(sum(ys[:k]), k) for k in range(1, m + 1)]
            want_first = min(pre, key=lambda p: (p[0] / p[1], p[1]))
            suf = [(sum(ys[k:]), m - k) for k in range(m)]
            want_last = min(suf, key=lambda p: (-p[0] / p[1], p[1]))
            assert (int(blocks[0][0]), blocks[0][1]) == want_first, ys
            assert (int(blocks[-1][0]), blocks[-1][1]) == want_last, ys


def test_isotonic_check_agrees_with_pav_query(spark):
    """The boundary pairs in q_isotonic_check must be the first/last
    fitted rates of the actual q_isotonic_pav output."""
    from challenge8_movies_etl_spark.registry import QUERIES
    from tests.conftest import SF_SMOKE
    iso = {}
    for r in QUERIES["q_isotonic_pav"](spark, SF_SMOKE).collect():
        iso.setdefault(r["event_type"], []).append(
            (r["bucket"], r["iso_rate"]))
    for r in QUERIES["q_isotonic_check"](spark, SF_SMOKE).collect():
        rates = [v for _, v in sorted(iso[r["event_type"]])]
        assert abs(r["iso_first_num"] / r["iso_first_den"]
                   - rates[0]) < 1e-6
        assert abs(r["iso_last_num"] / r["iso_last_den"]
                   - rates[-1]) < 1e-6
        assert r["y_total"] <= r["n_total"]
