"""Semantic checks for the time-series / data-quality family
(queries_timeseries.py) and the text-scoring additions — properties the
DuckDB oracle can't express as a plain hash compare (density of the
gap-filled spine, salted-join == plain-join equivalence, PSI
non-negativity)."""

from __future__ import annotations

import math

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from challenge8_movies_etl_spark.queries_joins import q_join_salted
from challenge8_movies_etl_spark.queries_llm import q_lm_score, q_tfidf
from challenge8_movies_etl_spark.queries_timeseries import (
    q_anomaly_zscore,
    q_drift_psi,
    q_gapfill_locf,
    q_histogram,
    q_snapshot_diff,
    q_window_time_range,
)
from challenge8_movies_etl_spark.sources.fixtures import load_table
from tests.conftest import SF_SMOKE


def test_gapfill_spine_is_dense_and_zero_filled(spark):
    out = q_gapfill_locf(spark, SF_SMOKE).cache()
    hours = out.select("h").distinct().count()
    types = out.select("event_type").distinct().count()
    # dense grid: every (hour, type) cell exists exactly once
    assert out.count() == hours * types
    # sf0.001 is sparse over 30 days -> real gaps must exist and be 0
    assert out.filter(F.col("n_events") == 0).count() > 0
    # LOCF: a null carried value can only occur before the first
    # observation of its partition (leading nulls), never after one
    first_obs = (out.filter(F.col("n_events") > 0)
                 .groupBy("event_type").agg(F.min("h").alias("h0")))
    late_nulls = (out.join(first_obs, "event_type")
                  .filter((F.col("h") >= F.col("h0"))
                          & F.col("sum_value_locf").isNull()))
    assert late_nulls.count() == 0
    out.unpersist()


def test_time_range_window_includes_self(spark):
    out = q_window_time_range(spark, SF_SMOKE)
    assert out.filter(F.col("n_win_30m") < 1).count() == 0
    assert out.filter(F.col("roll_sum_30m").isNull()).count() == 0


def test_histogram_partitions_all_rows(spark):
    out = q_histogram(spark, SF_SMOKE).collect()
    orders_n = load_table(spark, SF_SMOKE, "orders").count()
    assert sum(r["n"] for r in out) == orders_n
    for r in out:
        assert 0 <= r["bucket"] <= 9
        assert r["lo_price"] <= r["hi_price"]


def test_anomaly_zscore_bounds(spark):
    for r in q_anomaly_zscore(spark, SF_SMOKE).collect():
        assert 0 <= r["n_anomalies"] < r["n"]
        assert r["sd_value"] > 0


def test_snapshot_diff_classifies_every_key(spark):
    rows = {r["change"]: r["n"]
            for r in q_snapshot_diff(spark, SF_SMOKE).collect()}
    assert set(rows) <= {"added", "removed", "changed", "unchanged"}
    o = load_table(spark, SF_SMOKE, "orders")
    n_keys = (o.filter((F.col("o_orderkey") % 10 != 0)
                       | (F.col("o_orderkey") % 7 != 0)).count())
    assert sum(rows.values()) == n_keys
    assert rows.get("added", 0) > 0 and rows.get("removed", 0) > 0


def test_psi_is_nonnegative_and_constant(spark):
    rows = q_drift_psi(spark, SF_SMOKE).collect()
    totals = {r["psi_total"] for r in rows}
    assert len(totals) == 1  # window total repeated per bucket
    assert totals.pop() >= 0.0  # PSI terms are individually >= 0


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    s = load_table(spark, SF_SMOKE, "supplier")
    plain = (li.join(s, li.l_suppkey == s.s_suppkey)
             .groupBy("s_nationkey").agg(F.count("*").alias("n_items")))
    got = {(r["s_nationkey"], r["n_items"])
           for r in q_join_salted(spark, SF_SMOKE).collect()}
    want = {(r["s_nationkey"], r["n_items"]) for r in plain.collect()}
    assert got == want


def test_tfidf_topk_shape(spark):
    out = q_tfidf(spark, SF_SMOKE).cache()
    assert out.filter(F.col("rnk") > 3).count() == 0
    # within a doc, rank order must follow score order
    bad = (out.alias("a").join(out.alias("b"), "doc_id")
           .filter((F.col("a.rnk") < F.col("b.rnk"))
                   & (F.col("a.tfidf") < F.col("b.tfidf"))))
    assert bad.count() == 0
    out.unpersist()


def test_lm_score_is_negative_log_space(spark):
    out = q_lm_score(spark, SF_SMOKE)
    assert out.filter(F.col("avg_logp") >= 0).count() == 0
    assert out.filter(F.col("n_tokens") <= 0).count() == 0


def test_sessionize_ids_contiguous(spark):
    from challenge8_movies_etl_spark.queries_analytics import q_sessionize
    out = q_sessionize(spark, SF_SMOKE).cache()
    per_user = (out.groupBy("user_id")
                .agg(F.max("session_id").alias("mx"),
                     F.count("*").alias("n"),
                     F.min("session_id").alias("mn")))
    # ids are 1..n_sessions per user with no holes
    assert per_user.filter((F.col("mn") != 1)
                           | (F.col("mx") != F.col("n"))).count() == 0
    assert out.filter(F.col("duration_us") < 0).count() == 0
    out.unpersist()


def test_corr_is_bounded(spark):
    from challenge8_movies_etl_spark.queries_aggs import q_agg_corr
    for r in q_agg_corr(spark, SF_SMOKE).collect():
        assert -1.0 <= r["corr"] <= 1.0


def test_minmax_scale_in_unit_interval(spark):
    from challenge8_movies_etl_spark.queries_timeseries import q_minmax_scale
    out = q_minmax_scale(spark, SF_SMOKE)
    assert out.filter((F.col("scaled") < 0) | (F.col("scaled") > 1)).count() == 0


def test_entropy_bounds(spark):
    import math
    from challenge8_movies_etl_spark.queries_timeseries import q_entropy
    hi = math.log(5) + 1e-4  # 5 event types
    for r in q_entropy(spark, SF_SMOKE).collect():
        assert -1e-9 <= r["entropy"] <= hi


def test_sketch_reagg_error_bound(spark):
    from challenge8_movies_etl_spark.queries_aggs import q_agg_sketch_reagg
    for r in q_agg_sketch_reagg(spark, SF_SMOKE).collect():
        # nations partition customers, so summed exacts == region exact;
        # HLL_4 at default lgk=12 is well under 5% at these cardinalities
        assert abs(r["approx_customers"] - r["exact_customers"]) \
            <= max(1, 0.05 * r["exact_customers"])


def test_sessionize_agrees_with_session_window_operator(spark):
    """Two independent implementations of gap sessions — lag+cumsum
    (q_sessionize) vs Spark's native session_window operator — must
    produce the same per-user session multiset at the same 30-min gap.
    They differ only on gaps of EXACTLY the gap width (> vs >=), so
    first prove the fixture has none (making the comparison exact)."""
    e = load_table(spark, SF_SMOKE, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    exact_boundary = (e.withColumn(
        "gap", F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
        .filter(F.col("gap") == 30 * 60 * 1_000_000).count())
    assert exact_boundary == 0
    from challenge8_movies_etl_spark.queries_analytics import q_sessionize
    ours = (q_sessionize(spark, SF_SMOKE)
            .groupBy("user_id").agg(F.count("*").alias("n_sessions"),
                                    F.sum("n_events").alias("n_ev")))
    native = (e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
              .count()
              .groupBy("user_id").agg(F.count("*").alias("n_sessions"),
                                      F.sum("count").alias("n_ev")))
    assert sorted(map(tuple, ours.collect())) == \
        sorted(map(tuple, native.collect()))


def test_spatial_join_matches_brute_force(spark):
    """Grid blocking + 3x3 probing must find EXACTLY the pairs a naive
    all-pairs quadratic scan finds (radius <= cell width makes the
    probing lossless). sf0.01: sf0.001's 150 points are too sparse to
    yield any radius-2 pair, which would make the test vacuous."""
    from challenge8_movies_etl_spark.queries_timeseries import q_spatial_join
    sf = "/root/testdata/sf0.01"
    got = {(r["id_a"], r["id_b"]) for r in
           q_spatial_join(spark, sf).collect()}
    c = load_table(spark, sf, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") % 997).cast("decimal(10,4)") / F.lit(10))
        .cast("decimal(10,4)").alias("x"),
        (((F.col("c_custkey") * 31) % 1009).cast("decimal(10,4)") / F.lit(10))
        .cast("decimal(10,4)").alias("y"))
    a, b = pts.alias("a"), pts.alias("b")
    dx = F.col("a.x") - F.col("b.x")
    dy = F.col("a.y") - F.col("b.y")
    naive = (a.crossJoin(b)
             .filter((F.col("a.id") < F.col("b.id"))
                     & (dx * dx + dy * dy <= F.lit(4.0).cast("decimal(12,8)")))
             .select(F.col("a.id"), F.col("b.id")))
    want = {(r[0], r[1]) for r in naive.collect()}
    assert got == want and len(want) > 0


def test_ewma_first_row_and_recursion(spark):
    """Row 1 of each stream equals its raw value (single-term window);
    later rows equal the truncated adjusted-EWM recomputed in Python
    from the ordered stream."""
    from challenge8_movies_etl_spark.queries_timeseries import (
        _EWMA_W,
        q_ewma_smooth,
    )
    rows = q_ewma_smooth(spark, SF_SMOKE).collect()
    e = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "value", "ts").collect()
    streams: dict[int, list] = {}
    for r in sorted(e, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        streams.setdefault(r["user_id"], []).append(r)
    expect = {}
    for uid, rs in streams.items():
        for i, r in enumerate(rs):
            num = sum(w * rs[i - k]["value"]
                      for k, w in enumerate(_EWMA_W) if k <= i)
            den = sum(w for k, w in enumerate(_EWMA_W) if k <= i)
            expect[r["event_id"]] = num / den
    assert len(rows) == len(expect)
    for r in rows:
        assert abs(r["ewma"] - expect[r["event_id"]]) < 1e-5
        if r["event_id"] == streams[r["user_id"]][0]["event_id"]:
            assert abs(r["ewma"] - r["value"]) < 1e-5


def test_seasonal_decompose_identity_and_coverage(spark):
    """n == trend + seasonal + residual (up to 6dp rounding) on every
    emitted day; edge days without a full 7-day window are dropped;
    per-type seasonal components sum to ~0 across the window."""
    from challenge8_movies_etl_spark.queries_timeseries import (
        q_seasonal_decompose,
    )

    rows = q_seasonal_decompose(spark, SF_SMOKE).collect()
    by_type = {}
    for r in rows:
        assert abs(r.n - (r.trend + r.seasonal + r.residual)) < 5e-6, r
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        # 30 days of data, 3 dropped per edge
        assert len(rs) == 24, (t, len(rs))
        mean_resid = sum(r.residual for r in rs) / len(rs)
        assert abs(mean_resid) < 2.0, (t, mean_resid)


def test_trend_trio_matches_python_twins(spark):
    """Mann-Kendall S/var/z, Kendall tau-b, and the Theil-Sen median
    slope recomputed with brute-force python pair loops on the smoke
    fixture must match the distributed queries."""
    import math
    from collections import Counter

    import pandas as pd

    from challenge8_movies_etl_spark.queries_timeseries import (
        q_kendall_tau, q_mann_kendall, q_theil_sen)
    from tests.conftest import SF_SMOKE

    e = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    e["d"] = e.ts.dt.date
    daily = (e.groupby(["event_type", "d"]).size()
             .rename("x").reset_index())

    mk = {r.event_type: r for r in q_mann_kendall(spark, SF_SMOKE).collect()}
    ts_rows = {r.event_type: r for r in q_theil_sen(spark, SF_SMOKE).collect()}
    for et, sub in daily.groupby("event_type"):
        xs = [int(x) for _, x in
              sorted(zip(sub.d, sub.x), key=lambda p: p[0])]
        n = len(xs)
        s = sum((xs[j] > xs[i]) - (xs[j] < xs[i])
                for i in range(n) for j in range(i + 1, n))
        tie = sum(t * (t - 1) * (2 * t + 5)
                  for t in Counter(xs).values())
        var18 = n * (n - 1) * (2 * n + 5) - tie
        corr = s - 1 if s > 0 else (s + 1 if s < 0 else 0)
        z = round(corr / math.sqrt(var18 / 18.0), 4) + 0.0
        r = mk[et]
        assert (r.n, r.s_stat, r.var18) == (n, s, var18)
        assert abs(r.z_score - z) < 5e-5
        slopes = sorted((xs[j] - xs[i]) / (j - i)
                        for i in range(n) for j in range(i + 1, n))
        np_ = len(slopes)
        mid = [m for k, m in enumerate(slopes, 1)
               if 2 * k in (np_, np_ + 1, np_ + 2)]
        assert ts_rows[et].n_pairs == np_
        assert abs(ts_rows[et].sen_slope
                   - (round(sum(mid) / len(mid), 6) + 0.0)) < 2e-6

    piv = daily.pivot_table(index="d", columns="event_type", values="x",
                            fill_value=0)
    x, y = list(piv["click"]), list(piv["purchase"])
    n = len(x)
    con = dis = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            p = (x[j] - x[i]) * (y[j] - y[i])
            con += p > 0
            dis += p < 0
            tx += x[j] == x[i] and y[j] != y[i]
            ty += y[j] == y[i] and x[j] != x[i]
    tau = round((con - dis)
                / math.sqrt((con + dis + tx) * 1.0 * (con + dis + ty)),
                6) + 0.0
    r = q_kendall_tau(spark, SF_SMOKE).collect()[0]
    assert (r.n_days, r.concordant, r.discordant, r.ties_x, r.ties_y) \
        == (n, con, dis, tx, ty)
    assert abs(r.tau_b - tau) < 2e-6


def test_spearman_matches_python_twin(spark):
    """rho recomputed with python average-rank Pearson must match."""
    import math

    import pandas as pd

    from challenge8_movies_etl_spark.queries_timeseries import (
        q_spearman_corr)
    from tests.conftest import SF_SMOKE

    e = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    e["d"] = e.ts.dt.date
    piv = (e.assign(c=(e.event_type == "click").astype(int),
                    p=(e.event_type == "purchase").astype(int))
           .groupby("d")[["c", "p"]].sum())

    def avg_ranks(vals):
        out = []
        for v in vals:
            less = sum(1 for u in vals if u < v)
            eq = sum(1 for u in vals if u == v)
            out.append(less + (eq + 1) / 2)
        return out

    rx = avg_ranks(list(piv.c))
    ry = avg_ranks(list(piv.p))
    n = len(rx)
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    rho = ((n * sxy - sx * sy)
           / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
    row = q_spearman_corr(spark, SF_SMOKE).collect()[0]
    assert row.n == n
    assert abs(row.spearman_rho - (round(rho, 6) + 0.0)) < 2e-6


def test_pacf_matches_durbin_levinson_twin(spark):
    """PACF lags must equal a numpy Durbin-Levinson recomputation
    from the same daily series, and lag-1 PACF must equal lag-1 ACF
    (the recursion's base-case identity, cross-query against q_acf)."""
    from challenge8_movies_etl_spark.queries_ml import q_acf, q_pacf
    from tests.conftest import SF_SMOKE

    acf = {(r["event_type"], r["lag"]): r["acf"]
           for r in q_acf(spark, SF_SMOKE).collect()}
    got = {(r["event_type"], r["lag"]): r["pacf"]
           for r in q_pacf(spark, SF_SMOKE).collect()}
    types = {t for t, _ in got}
    assert types == {t for t, _ in acf}
    for t in types:
        r1, r2, r3 = (round(acf[(t, k)], 6) for k in (1, 2, 3))
        p22 = (r2 - r1 * r1) / (1 - r1 * r1)
        p21 = r1 * (1 - p22)
        p33 = ((r3 - p21 * r2 - p22 * r1)
               / (1 - p21 * r1 - p22 * r2))
        assert got[(t, 1)] == round(r1, 6)
        assert abs(got[(t, 2)] - p22) < 1e-6
        assert abs(got[(t, 3)] - p33) < 1e-6
        # partials are correlations: bounded
        for k in (1, 2, 3):
            assert -1.0 <= got[(t, k)] <= 1.0


def test_dtw_matches_bruteforce_and_bounds(spark):
    """DTW must equal a full-matrix python recomputation on the same
    12-day prefixes, be symmetric in its inputs by construction, and
    never exceed the L1 distance of the aligned (unwarped) series."""
    from challenge8_movies_etl_spark.queries_timeseries import (
        _DTW_LEN, q_dtw_distance)
    from challenge8_movies_etl_spark.sources.fixtures import load_table
    from tests.conftest import SF_SMOKE

    e = load_table(spark, SF_SMOKE, "events")
    daily = {}
    for r in (e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
              .agg(F.count("*").alias("x")).collect()):
        daily.setdefault(r["event_type"], []).append((r["d"], r["x"]))
    series = {t: [x for _, x in sorted(v)][:_DTW_LEN]
              for t, v in daily.items()}
    t3 = sorted(series)[:3]

    def dtw(a, b):
        big = 1 << 60
        prev = [big] * (len(b) + 1)
        for i in range(1, len(a) + 1):
            cur = [big] * (len(b) + 1)
            for j in range(1, len(b) + 1):
                c = abs(a[i - 1] - b[j - 1])
                cur[j] = c if (i == 1 and j == 1) else \
                    c + min(prev[j], cur[j - 1], prev[j - 1])
            prev = cur
        return prev[len(b)]

    got = {(r["type_a"], r["type_b"]): r["dtw"]
           for r in q_dtw_distance(spark, SF_SMOKE).collect()}
    assert len(got) == 3
    for (a, b), v in got.items():
        assert a in t3 and b in t3 and a < b
        assert v == dtw(series[a], series[b])
        assert v <= sum(abs(x - y)
                        for x, y in zip(series[a], series[b]))


def test_holtwinters_python_twin_and_seasonal_learning(spark):
    """State recursion must equal a python twin with per-step 6dp
    rounding; after 4 weeks the seasonal queue must be non-trivial
    (the recursion actually learns day-of-week shape)."""
    from challenge8_movies_etl_spark.queries_timeseries import (
        q_holtwinters)
    from challenge8_movies_etl_spark.sources.fixtures import load_table
    from tests.conftest import SF_SMOKE

    e = load_table(spark, SF_SMOKE, "events")
    daily = sorted(
        (r["d"], r["x"]) for r in
        e.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.count("*").alias("x")).collect())
    # mirror the query's EXACT DECIMAL recursion (round 8): per-step
    # 6dp HALF_UP quantization of exact decimal state — python's
    # float round() (binary + half-even) diverges on half boundaries
    from decimal import ROUND_HALF_UP, Decimal

    def q6(v):
        return v.quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)

    A, B, C = Decimal("0.3"), Decimal("0.1"), Decimal("0.2")
    xs = [Decimal(int(x)) for _, x in daily]
    lvl, trd = q6(xs[0]), Decimal(0)
    seas = [Decimal(0)] * 7
    states = [(1, float(lvl), float(trd), [float(v) for v in seas])]
    for t, x in enumerate(xs[1:], start=2):
        nl = q6(A * (x - seas[0]) + (1 - A) * (lvl + trd))
        trd = q6(B * (nl - lvl) + (1 - B) * trd)
        snew = q6(C * (x - nl) + (1 - C) * seas[0])
        seas = seas[1:] + [snew]
        lvl = nl
        states.append((t, float(lvl), float(trd),
                       [float(v) for v in seas]))
    rows = q_holtwinters(spark, SF_SMOKE).collect()
    assert len(rows) == 10
    by_t = {s[0]: s for s in states}
    for r in rows:
        t, lvl_e, trd_e, seas_e = by_t[r["t"]]
        assert r["lvl"] == lvl_e
        assert r["trd"] == trd_e + 0.0
        assert r["season_new"] == seas_e[-1] + 0.0
        assert r["forecast_next"] == float(
            q6(Decimal(str(lvl_e)) + Decimal(str(trd_e))
               + Decimal(str(seas_e[0])))) + 0.0
    # 30 days = 4+ weeks: the learned seasonal queue isn't all-zero
    final = by_t[len(xs)][3]
    assert any(abs(s) > 1e-9 for s in final)


def test_spatial_knn_matches_bruteforce(spark):
    """Top-3 per probe must equal an exact python brute force with
    the same (d2, id) tie-break."""
    from fractions import Fraction

    from challenge8_movies_etl_spark.queries_timeseries import (
        q_spatial_knn)
    from challenge8_movies_etl_spark.sources.fixtures import load_table
    from tests.conftest import SF_SMOKE

    c = [r["c_custkey"]
         for r in load_table(spark, SF_SMOKE, "customer")
         .select("c_custkey").collect()]
    s = [r["s_suppkey"]
         for r in load_table(spark, SF_SMOKE, "supplier")
         .filter(F.col("s_suppkey") < 8).select("s_suppkey").collect()]

    def pt(k, mx, my):
        return (Fraction(k * mx % 997, 10), Fraction(k * my % 1009, 10))

    expect = {}
    for p in s:
        px, py = pt(p, 13, 41)
        scored = []
        for cid in c:
            x, y = pt(cid, 1, 31)
            scored.append(((x - px) ** 2 + (y - py) ** 2, cid))
        for rk, (d2, cid) in enumerate(sorted(scored)[:3], start=1):
            expect[(p, rk)] = (cid, round(float(d2), 4))
    got = {(r["probe_id"], r["rk"]): (r["id"], r["dist2"])
           for r in q_spatial_knn(spark, SF_SMOKE).collect()}
    assert got == expect


def test_haar_invertibility_and_total(spark):
    """Reconstructing from (approx, details) must recover the exact
    padded daily series — the transform loses nothing — and the
    coarsest approximation must equal the total event count."""
    from challenge8_movies_etl_spark.queries_timeseries import (
        q_haar_wavelet)
    from challenge8_movies_etl_spark.sources.fixtures import load_table
    from tests.conftest import SF_SMOKE

    rows = q_haar_wavelet(spark, SF_SMOKE).collect()
    det = {(r["level"], r["idx"]): r["coef"]
           for r in rows if r["kind"] == "detail"}
    approx = [r["coef"] for r in rows if r["kind"] == "approx"]
    assert len(approx) == 1 and len(det) == 31
    e = load_table(spark, SF_SMOKE, "events")
    assert approx[0] == e.count()
    # invert: walk levels downward (a_{2i-1} = (a+d)/2, a_{2i} = (a-d)/2)
    a = {1: approx[0]}
    for lv in range(5, 0, -1):
        nxt = {}
        for i, av in a.items():
            d = det[(lv, i)]
            assert (av + d) % 2 == 0
            nxt[2 * i - 1] = (av + d) // 2
            nxt[2 * i] = (av - d) // 2
        a = nxt
    daily = sorted(
        (r["d"], r["x"]) for r in
        e.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.count("*").alias("x")).collect())
    series = [x for _, x in daily] + [0] * (32 - len(daily))
    assert [a[i] for i in range(1, 33)] == series


def test_ohlc_bars_invariants_and_twin(spark):
    from challenge8_movies_etl_spark.registry import QUERIES
    from tests.conftest import SF_SMOKE
    rows = QUERIES["q_ohlc_bars"](spark, SF_SMOKE).collect()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    assert sum(r["volume"] for r in rows) == len(ev)
    by_bar = {}
    for r in ev:
        by_bar.setdefault((r["ts"].day, r["event_type"]), []).append(
            (r["ts"], r["event_id"], r["value"]))
    for r in rows:
        pts = sorted(by_bar[(r["day"], r["event_type"])])
        vals = [v for _, _, v in pts]
        assert r["open"] == pts[0][2] and r["close"] == pts[-1][2]
        assert r["high"] == max(vals) and r["low"] == min(vals)
        assert r["low"] <= min(r["open"], r["close"])
        assert r["high"] >= max(r["open"], r["close"])


def test_max_drawdown_twin(spark):
    from decimal import Decimal

    from challenge8_movies_etl_spark.registry import QUERIES
    from tests.conftest import SF_SMOKE
    rows = {r["event_type"]: r
            for r in QUERIES["q_max_drawdown"](spark, SF_SMOKE).collect()}
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    daily = {}
    for r in ev:
        sign = -1 if r["event_type"] == "error" else 1
        key = (r["event_type"], r["ts"].day)
        daily[key] = daily.get(key, Decimal(0)) \
            + Decimal(repr(r["value"])).quantize(Decimal("0.0000000001")) \
            * sign
    for et in rows:
        days = sorted(d for t, d in daily if t == et)
        eq, peak, best = Decimal(0), Decimal("-Infinity"), None
        for d in days:
            eq += daily[(et, d)]
            peak = max(peak, eq)
            dd = peak - eq
            if best is None or dd > best[0]:
                best = (dd, d, eq)
        assert rows[et]["trough_day"] == best[1]
        assert abs(rows[et]["max_drawdown"] - float(best[0])) < 1e-4
        assert rows[et]["max_drawdown"] >= 0


def test_point_in_polygon_matches_python_twin(spark):
    from challenge8_movies_etl_spark.queries_timeseries import (
        _PIP_POLYGONS)
    from challenge8_movies_etl_spark.registry import QUERIES

    def inside(px, py, verts):
        c = 0
        n = len(verts)
        for i in range(n):
            x1, y1 = verts[i]
            x2, y2 = verts[(i + 1) % n]
            if (y1 <= py < y2) or (y2 <= py < y1):
                cross = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
                if (cross > 0) if y2 > y1 else (cross < 0):
                    c += 1
        return c % 2 == 1

    keys = [r.c_custkey for r in
            spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
            .select("c_custkey").collect()]
    expect = {}
    for pid, verts in _PIP_POLYGONS.items():
        ids = [k for k in keys
               if inside(k % 997, (k * 31) % 1009, verts)]
        if ids:
            expect[pid] = (len(ids), sum(ids), min(ids), max(ids))
    out = {r["poly_id"]: (r["n_inside"], r["id_sum"], r["min_id"],
                          r["max_id"])
           for r in QUERIES["q_point_in_polygon"](spark, SF_SMOKE)
           .collect()}
    assert out == expect
    assert expect, "fixture polygons must contain points at smoke scale"


def test_sax_symbols_match_python_twin(spark):
    import math
    from collections import defaultdict
    from challenge8_movies_etl_spark.registry import QUERIES
    rows = (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .selectExpr("event_type", "cast(ts as date) AS d").collect())
    daily = defaultdict(int)
    for r in rows:
        daily[(r.event_type, str(r.d))] += 1
    series = defaultdict(list)
    for (et, d), c in sorted(daily.items()):
        series[et].append(c)
    expect = {}
    for et, cs in series.items():
        frames = [sum(cs[i:i + 3]) for i in range(0, len(cs) - 2, 3)
                  if len(cs[i:i + 3]) == 3]
        nf = len(frames)
        mu = sum(frames) / nf
        sd = math.sqrt((sum(s * s for s in frames)
                        - sum(frames) ** 2 / nf) / (nf - 1))
        for fi, s in enumerate(frames):
            sym = ("a" if s < mu - 0.6745 * sd else
                   "b" if s < mu else
                   "c" if s < mu + 0.6745 * sd else "d")
            expect[(et, fi)] = (s, sym)
    out = {(r["event_type"], r["frame"]): (r["s"], r["symbol"])
           for r in QUERIES["q_sax_encode"](spark, SF_SMOKE).collect()}
    assert out == expect
    # all four symbols are reachable given enough frames; at minimum
    # the alphabet is a subset of {a,b,c,d}
    assert {s for _, s in out.values()} <= set("abcd")


def test_granger_matches_numpy_twin(spark):
    import numpy as np
    from collections import defaultdict
    from challenge8_movies_etl_spark.registry import QUERIES
    rows = (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .selectExpr("cast(ts as date) AS d", "event_type").collect())
    daily = defaultdict(lambda: [0, 0])
    for r in rows:
        if r.event_type == "click":
            daily[str(r.d)][0] += 1
        elif r.event_type == "purchase":
            daily[str(r.d)][1] += 1
    days = sorted(daily)
    x = np.array([daily[d][0] for d in days], dtype=float)
    y = np.array([daily[d][1] for d in days], dtype=float)

    def f_stat(t, a, b):
        n = len(t)
        X_r = np.column_stack([np.ones(n), a])
        X_u = np.column_stack([np.ones(n), a, b])
        rss = lambda X: float(  # noqa: E731
            ((t - X @ np.linalg.lstsq(X, t, rcond=None)[0]) ** 2).sum())
        rss_r, rss_u = rss(X_r), rss(X_u)
        return (rss_r - rss_u) * (n - 3) / rss_u, 1.0 - rss_u / rss_r

    exp_fwd = f_stat(y[1:], y[:-1], x[:-1])
    exp_rev = f_stat(x[1:], x[:-1], y[:-1])
    out = {r["direction"]: r for r in
           QUERIES["q_granger_causality"](spark, SF_SMOKE).collect()}
    assert out["x->y"]["n"] == len(x) - 1
    assert abs(out["x->y"]["f_stat"] - exp_fwd[0]) < 1e-3
    assert abs(out["x->y"]["r2_gain"] - exp_fwd[1]) < 1e-4
    assert abs(out["y->x"]["f_stat"] - exp_rev[0]) < 1e-3
    assert out["x->y"]["f_stat"] >= 0 and out["y->x"]["f_stat"] >= 0


def test_cusum_prefix_identity_equals_recursion(spark):
    """S+ via prefix-min must equal the textbook max(0, S+prev+dev)."""
    from collections import defaultdict
    from challenge8_movies_etl_spark.registry import QUERIES
    rows = (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .selectExpr("event_type", "cast(ts as date) AS d").collect())
    daily = defaultdict(int)
    for r in rows:
        daily[(r.event_type, str(r.d))] += 1
    series = defaultdict(list)
    for (et, d), c in sorted(daily.items()):
        series[et].append(c)
    expect = {}
    for et, xs in series.items():
        n, s = len(xs), sum(xs)
        sp = sm = 0
        for t, x in enumerate(xs):
            dev = n * x - s
            sp = max(0, sp + dev)
            sm = max(0, sm - dev)
            expect[(et, t)] = (sp, sm)
    out = (QUERIES["q_cusum"](spark, SF_SMOKE)
           .orderBy("event_type", "day").collect())
    seen = defaultdict(int)
    for r in out:
        t = seen[r["event_type"]]
        seen[r["event_type"]] += 1
        assert (r["s_plus"], r["s_minus"]) == expect[(r["event_type"], t)]
        assert r["alarm"] in (0, 1)


def test_ljung_box_from_acf(spark):
    from challenge8_movies_etl_spark.registry import QUERIES
    acf = {}
    for r in QUERIES["q_acf"](spark, SF_SMOKE).collect():
        acf[(r["event_type"], r["lag"])] = r["acf"]
    for r in QUERIES["q_ljung_box"](spark, SF_SMOKE).collect():
        n = r["n"]
        q = n * (n + 2) * sum(
            round(acf[(r["event_type"], h)] ** 2 / (n - h), 8)
            for h in (1, 2, 3))
        # q_acf rounds r_h to 6dp; the Ljung-Box path keeps full
        # precision, so agreement is to the propagated tolerance
        assert abs(r["q_stat"] - q) < n * (n + 2) * 3 * 1e-5
        assert r["q_stat"] >= 0


def test_runs_test_matches_python_twin(spark):
    from collections import defaultdict
    from challenge8_movies_etl_spark.registry import QUERIES
    rows = (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .selectExpr("cast(ts as date) AS d").collect())
    daily = defaultdict(int)
    for r in rows:
        daily[str(r.d)] += 1
    xs = [daily[d] for d in sorted(daily)]
    signs = [1 if b > a else 0 for a, b in zip(xs, xs[1:]) if b != a]
    runs = sum(1 for i, s in enumerate(signs)
               if i == 0 or signs[i - 1] != s)
    n1 = sum(signs)
    n2 = len(signs) - n1
    r = QUERIES["q_runs_test"](spark, SF_SMOKE).collect()[0]
    assert (r["r"], r["n1"], r["n2"]) == (runs, n1, n2)
    n = n1 + n2
    mu = 2 * n1 * n2 / n + 1
    sig = math.sqrt(2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1)))
    assert abs(r["z_score"] - round((runs - mu) / sig, 4)) < 1e-9


def test_poisson_dispersion_identities(spark):
    from challenge8_movies_etl_spark.registry import QUERIES
    for r in QUERIES["q_poisson_dispersion"](spark, SF_SMOKE).collect():
        assert r["mean_daily"] > 0
        assert r["dispersion"] > 0
        # chi2 = (n-1) * dispersion (same numerator, def. of each)
        assert abs(r["chi2_poisson"]
                   - (r["n"] - 1) * r["dispersion"]) < 0.05
