"""Round-4 wave B (queries_stats.py): semantic invariants beyond the
oracle agreement."""

from __future__ import annotations

import math

from challenge8_movies_etl_spark.registry import QUERIES, load_all
from tests.conftest import SF_SMOKE

load_all()


def test_chisq_terms_sum_to_total(spark):
    rows = QUERIES["q_chisq_independence"](spark, SF_SMOKE).collect()
    assert rows
    totals = {r["chi2_total"] for r in rows}
    assert len(totals) == 1, "window total must be identical on every row"
    s = sum(r["chi2_term"] for r in rows)
    assert abs(s - totals.pop()) < 1e-3
    for r in rows:
        assert r["observed"] >= 0 and r["expected"] > 0


def test_moments_match_numpy(spark):
    """Skewness/kurtosis from power sums agree with a direct two-pass
    computation over the same (3dp-pinned) values."""
    import numpy as np

    rows = QUERIES["q_agg_moments"](spark, SF_SMOKE).collect()
    vals = (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .select("event_type", "value").collect())
    by_type: dict[str, list[float]] = {}
    for r in vals:
        by_type.setdefault(r["event_type"], []).append(round(r["value"], 3))
    for r in rows:
        x = np.array(by_type[r["event_type"]])
        m = x.mean()
        v = ((x - m) ** 2).mean()
        skew = ((x - m) ** 3).mean() / v ** 1.5
        kurt = ((x - m) ** 4).mean() / v ** 2 - 3
        assert abs(r["mean"] - m) < 1e-3
        assert abs(r["variance"] - v) < 1e-2
        assert abs(r["skewness"] - skew) < 1e-3
        assert abs(r["excess_kurt"] - kurt) < 1e-3


def test_expectations_pass_on_clean_fixture(spark):
    """The generated fixture satisfies every contract rule; a failing
    rule here means either the fixture broke or a rule miscounts."""
    rows = QUERIES["q_expectations"](spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_violations"] == 0 and r["passed"], r["rule"]
        assert r["n_checked"] > 0


def test_expectations_detect_injected_violations(spark):
    """Contract rules actually fire: corrupt copies of the inputs must
    produce nonzero violation counts (not-null, unique, accepted
    values, range, referential integrity)."""
    from pyspark.sql import functions as F

    from challenge8_movies_etl_spark.queries_stats import q_expectations

    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    bad_rows = o.limit(4).select(
        F.lit(None).cast("bigint").alias("o_orderkey_new")).count()
    assert bad_rows == 4  # fixture sanity
    bad = o.limit(4).select(
        o.o_orderkey,  # duplicate keys -> uniqueness violations
        F.lit(None).cast("bigint").alias("o_custkey"),  # not-null
        F.lit("X").alias("o_orderstatus"),  # accepted_values
        F.lit(-5.0).alias("o_totalprice"),  # range
        o.o_orderdate, o.o_orderpriority)
    corrupt_o = o.unionByName(bad)
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    orphan = li.limit(3).withColumn("l_orderkey", F.lit(-999).cast("bigint"))
    corrupt_l = li.unionByName(orphan)
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        corrupt_o.write.parquet(f"{tmp}/orders.parquet")
        corrupt_l.write.parquet(f"{tmp}/lineitem.parquet")
        rows = {r["rule"]: r for r in q_expectations(spark, tmp).collect()}
    assert rows["orders.o_custkey not_null"]["n_violations"] == 4
    assert rows["orders.o_orderkey unique"]["n_violations"] == 4
    assert rows["orders.o_orderstatus accepted_values"]["n_violations"] == 4
    assert rows["orders.o_totalprice positive_range"]["n_violations"] == 4
    assert rows["lineitem.l_orderkey ref_integrity"]["n_violations"] == 3
    assert not any(r["passed"] for r in rows.values())


def test_wordpiece_matches_pure_python(spark):
    """The pandas-UDF greedy fold equals an independent pure-python
    greedy encoder on every doc."""
    from challenge8_movies_etl_spark.queries_stats import _WP_VOCAB

    by_len = sorted(_WP_VOCAB, key=len, reverse=True)

    def encode(text: str) -> int:
        total = 0
        for w in text.split(" "):
            while w:
                for p in by_len:
                    if w.startswith(p):
                        w = w[len(p):]
                        break
                else:
                    w = w[1:]  # OOV: consume one char, one piece
                total += 1
        return total

    got = {r["doc_id"]: (r["n_words"], r["n_pieces"])
           for r in QUERIES["q_wordpiece_encode"](spark, SF_SMOKE).collect()}
    docs = (spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
            .select("doc_id", "text").collect())
    for r in docs:
        words = [w for w in r["text"].split(" ") if w]
        if not words:
            continue
        assert got[r["doc_id"]] == (len(words), encode(r["text"]))
        # pieces never fewer than words (every word >= 1 piece)
        assert got[r["doc_id"]][1] >= got[r["doc_id"]][0]


def test_wordpiece_oov_terminates_and_matches_oracle(spark, tmp_path):
    """Regression (round-5 advice): a word containing characters outside
    the vocab alphabet (digits, uppercase, punctuation) must terminate —
    the OOV branch consumes one char per piece — and the recursive-CTE
    oracle must agree on the same input."""
    import duckdb

    from challenge8_movies_etl_spark.registry import ORACLE

    texts = ["abc x9z HELLO a1b2c3", "only lower words here",
             "punct!?; mid-word d@sh", "42", "mix3d CASE and plain"]
    pdf = __import__("pandas").DataFrame(
        {"doc_id": [f"oov{i}" for i in range(len(texts))], "text": texts,
         "lang": ["en"] * len(texts), "url": [""] * len(texts)})
    path = str(tmp_path / "documents.parquet")
    pdf.to_parquet(path)

    got = {r["doc_id"]: (r["n_words"], r["n_pieces"])
           for r in QUERIES["q_wordpiece_encode"](spark, str(tmp_path))
           .collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    want = {r[0]: (r[1], r[2])
            for r in con.execute(ORACLE["q_wordpiece_encode"]).fetchall()}
    assert got == want
    # every OOV char in "abc x9z ..." costs exactly one piece: "x9z" =
    # greedy("x") + oov("9") + greedy("z") = 3 pieces minimum
    assert got["oov3"] == (1, 2)  # "42" -> two OOV pieces, one word


def test_bpe_census_consistency(spark):
    """Class counts are nonnegative and n_pieces is their sum; alpha
    runs can never exceed whitespace words + 1 per word boundary."""
    rows = QUERIES["q_token_count_bpe"](spark, SF_SMOKE).collect()
    for r in rows:
        assert r["n_pieces"] == r["n_alpha"] + r["n_num"] + r["n_other"]
        assert min(r["n_alpha"], r["n_num"], r["n_other"]) >= 0


def test_bootstrap_ci_brackets_estimate(spark):
    rows = QUERIES["q_bootstrap_ci"](spark, SF_SMOKE).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_replicas"] == 20
    assert r["ci_lo"] <= r["ci_hi"]
    # half-sample replica means straddle the full-sample mean on any
    # non-degenerate fixture
    assert r["ci_lo"] <= r["est"] <= r["ci_hi"]


def test_event_trigrams_wellformed(spark):
    rows = QUERIES["q_event_ngrams"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        assert len(r["trigram"].split(">")) == 3
        assert 1 <= r["n_users"] <= r["n"]


def test_threshold_curve_monotone(spark):
    rows = (QUERIES["q_dedup_threshold_curve"](spark, SF_SMOKE)
            .orderBy("tau").collect())
    assert rows
    # lower tau admits at least as many pairs and drops
    prev_pairs = prev_drop = None
    for r in rows:  # ascending tau
        assert 0.0 <= r["drop_rate"] <= 1.0
        assert r["n_dropped"] <= r["n_pairs"]
        if prev_pairs is not None:
            assert r["n_pairs"] <= prev_pairs
            assert r["n_dropped"] <= prev_drop
        prev_pairs, prev_drop = r["n_pairs"], r["n_dropped"]


def test_quantile_normalize_aligns_distributions(spark):
    """After QN every group maps to the SAME normalized value per
    percentile — the defining property — and the reference preserves
    the cross-group grand mean of bin means."""
    from challenge8_movies_etl_spark.queries_stats import (
        q_quantile_normalize,
    )

    rows = q_quantile_normalize(spark, SF_SMOKE).collect()
    by_pct = {}
    for r in rows:
        by_pct.setdefault(r.pctile, []).append(r)
    assert len(by_pct) == 100
    for pct, rs in by_pct.items():
        assert len({r.normalized for r in rs}) == 1, pct
        vals = [r.grp_mean for r in rs]
        lo, hi = min(vals), max(vals)
        assert lo - 1e-4 <= rs[0].normalized <= hi + 1e-4
    # monotone in percentile within each group
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for rs in by_type.values():
        rs.sort(key=lambda r: r.pctile)
        means = [r.grp_mean for r in rs]
        assert all(b >= a for a, b in zip(means, means[1:]))


def test_mannwhitney_matches_python_twin(spark):
    """U, rank-biserial, and tie-corrected z recomputed from scratch
    with python rank arithmetic (average ranks, tie correction) on the
    smoke fixture must match the distributed query."""
    import math

    import pandas as pd

    from challenge8_movies_etl_spark.queries_stats import q_mannwhitney_u
    from tests.conftest import SF_SMOKE

    pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    pdf = pdf[pdf.event_type.isin(["click", "purchase"])]
    # same milli-unit keying as the query (decimal(7,0) HALF_UP)
    vals = [(t, int(round(round(v, 3) * 1000)))
            for t, v in zip(pdf.event_type, pdf.value)]
    ordered = sorted(v for _, v in vals)
    rank_of, i = {}, 0
    while i < len(ordered):
        j = i
        while j < len(ordered) and ordered[j] == ordered[i]:
            j += 1
        rank_of[ordered[i]] = (i + 1 + j) / 2  # average rank, 1-based
        i = j
    ra = sum(rank_of[v] for t, v in vals if t == "click")
    n_a = sum(1 for t, _ in vals if t == "click")
    n_b = len(vals) - n_a
    u = ra - n_a * (n_a + 1) / 2
    n = n_a + n_b
    from collections import Counter
    ties = sum(c ** 3 - c for c in Counter(v for _, v in vals).values())
    sigma = math.sqrt(n_a * n_b / 12 * ((n + 1) - ties / (n * (n - 1))))
    z = (u - n_a * n_b / 2) / sigma
    r = (2 * u - n_a * n_b) / (n_a * n_b)

    row = q_mannwhitney_u(spark, SF_SMOKE).collect()[0]
    assert (row.n_a, row.n_b) == (n_a, n_b)
    assert row.u_stat == u
    assert abs(row.rank_biserial - r) < 1e-12
    assert abs(row.z_score - round(z, 4)) < 5e-5


def test_burst_detect_recovers_injected_window(spark):
    """At sf0.01 (daily rate ~67, noise ~±8) the injected +3*r0 burst
    on days 10-14 must be recovered EXACTLY for every event type: 5
    burst days, one contiguous 5-run, starting at day 10. At smoke
    scale (rate ~6) Poisson-scale noise legitimately flags a few extra
    days, so only the structural invariants are pinned there."""
    from challenge8_movies_etl_spark.queries_udf import (
        _BURST_HI, _BURST_LO, q_burst_detect)
    from tests.conftest import SF_SMOKE

    want = _BURST_HI - _BURST_LO + 1
    for r in q_burst_detect(spark, "/root/testdata/sf0.01").collect():
        assert r.n_burst_days == want, r
        assert r.longest_burst == want, r
        assert r.first_burst_day == _BURST_LO, r
        assert r.final_cost > 0

    rows = q_burst_detect(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        # the injected run is always the longest, and nothing shorter
        # than the injection can beat it
        assert r.longest_burst == want, r
        assert want <= r.n_burst_days <= r.n_days // 2, r
        assert r.first_burst_day <= _BURST_LO, r


def _event_values_by_type(spark):
    rows = (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .select("event_type", "value").collect())
    by = {}
    for r in rows:
        by.setdefault(r.event_type, []).append(
            int(round(round(r.value, 3) * 1000)))
    return by


def test_anova_oneway_matches_python_twin(spark):
    from challenge8_movies_etl_spark.registry import QUERIES
    by = _event_values_by_type(spark)
    k = len(by)
    n = sum(len(v) for v in by.values())
    t_all = sum(round(float(sum(v)) * float(sum(v)) / len(v), 6)
                for v in by.values())
    s1 = sum(sum(v) for v in by.values())
    s2 = sum(sum(x * x for x in v) for v in by.values())
    ssb = t_all - float(s1) * float(s1) / n
    ssw = float(s2) - t_all
    f = (ssb / (k - 1)) / (ssw / (n - k))
    r = QUERIES["q_anova_oneway"](spark, SF_SMOKE).collect()[0]
    assert (r["k"], r["n"]) == (k, n)
    assert abs(r["f_stat"] - round(f, 6)) < 1e-6
    assert abs(r["eta_sq"] - round(ssb / (ssb + ssw), 6)) < 1e-6
    assert r["ssb"] >= 0 and r["ssw"] > 0


def test_kruskal_wallis_matches_python_twin(spark):
    from collections import Counter
    from challenge8_movies_etl_spark.registry import QUERIES
    by = _event_values_by_type(spark)
    allv = sorted(v for vs in by.values() for v in vs)
    n = len(allv)
    # doubled tie-averaged rank per distinct value
    cnt = Counter(allv)
    r2 = {}
    cum = 0
    for v in sorted(cnt):
        cum += cnt[v]
        r2[v] = 2 * cum - cnt[v] + 1
    t_all = sum(round((float(sum(r2[x] for x in vs)) ** 2)
                      / (4 * len(vs)), 6) for vs in by.values())
    tie3 = sum(c ** 3 - c for c in cnt.values())
    h = ((12.0 * t_all / (float(n) * (n + 1)) - 3.0 * (n + 1))
         / (1.0 - tie3 / (float(n) ** 3 - n)))
    r = QUERIES["q_kruskal_wallis"](spark, SF_SMOKE).collect()[0]
    assert (r["k"], r["n"]) == (len(by), n)
    assert abs(r["h_stat"] - round(h, 6)) < 1e-6


def test_levene_bf_matches_python_twin(spark):
    from challenge8_movies_etl_spark.registry import QUERIES
    by = _event_values_by_type(spark)
    zs = {}
    for g, vs in by.items():
        sv = sorted(vs)
        m = len(sv)
        m2 = sv[(m - 1) // 2] + sv[m // 2]  # doubled median
        zs[g] = [abs(2 * x - m2) for x in vs]
    k = len(zs)
    n = sum(len(v) for v in zs.values())
    t_all = sum(round(float(sum(v)) * float(sum(v)) / len(v), 6)
                for v in zs.values())
    s1 = sum(sum(v) for v in zs.values())
    s2 = sum(sum(x * x for x in v) for v in zs.values())
    ssb = t_all - float(s1) * float(s1) / n
    ssw = float(s2) - t_all
    w = (ssb / (k - 1)) / (ssw / (n - k))
    r = QUERIES["q_levene_bf"](spark, SF_SMOKE).collect()[0]
    assert (r["k"], r["n"]) == (k, n)
    assert abs(r["w_stat"] - round(w, 6)) < 1e-6


def test_fdr_bh_matches_python_twin(spark):
    from challenge8_movies_etl_spark.registry import QUERIES
    rows = (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .selectExpr("event_type", "cast(ts as date) AS d", "value")
            .collect())
    xs = [(r.event_type, str(r.d), int(round(round(r.value, 3) * 1000)))
          for r in rows]
    n = len(xs)
    s1 = sum(x for _, _, x in xs)
    s2 = sum(x * x for _, _, x in xs)
    mean_g = s1 / n
    var_g = (s2 - s1 * s1 / n) / (n - 1)
    cells = {}
    for et, d, x in xs:
        c = cells.setdefault((et, d), [0, 0])
        c[0] += 1
        c[1] += x
    pv = []
    for (et, d), (n_c, s1_c) in cells.items():
        z = (s1_c / n_c - mean_g) / math.sqrt(var_g / n_c)
        pv.append((round(2.0 / (1.0 + math.exp(abs(z))), 6), et, d))
    pv.sort()
    m = len(pv)
    kstar = 0
    for i, (p, _, _) in enumerate(pv, start=1):
        # decimal-exact comparison: p has 6dp, p*20*m vs i
        if round(p * 1_000_000) * 20 * m <= i * 1_000_000:
            kstar = i
    r = QUERIES["q_fdr_bh"](spark, SF_SMOKE).collect()[0]
    assert r["m"] == m
    assert r["n_rejected"] == kstar
    if kstar:
        assert abs(float(r["p_cutoff"]) - pv[kstar - 1][0]) < 1e-9
    else:
        assert r["p_cutoff"] is None
    # BH rejects at least as much as Bonferroni, at most everything
    bonf = sum(1 for p, _, _ in pv
               if round(p * 1_000_000) * 20 * m <= 1_000_000)
    assert bonf <= r["n_rejected"] <= m


def test_zipf_slope_matches_python_twin(spark):
    from collections import Counter
    from challenge8_movies_etl_spark.registry import QUERIES
    docs = (spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
            .select("text").collect())
    cnt = Counter(t for r in docs for t in r.text.split(" "))
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:500]
    n = len(ranked)
    sx = sy = sxx = sxy = syy = 0.0
    for i, (_, f) in enumerate(ranked, start=1):
        lx, ly = math.log(i), math.log(f)
        sx += round(lx, 8)
        sy += round(ly, 8)
        sxx += round(lx * lx, 8)
        sxy += round(lx * ly, 8)
        syy += round(ly * ly, 8)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r = QUERIES["q_zipf_slope"](spark, SF_SMOKE).collect()[0]
    assert r["n"] == n
    assert abs(r["slope"] - round(slope, 4)) < 1e-6
    assert r["slope"] < 0  # frequency falls with rank
    assert 0.0 <= r["r_sq"] <= 1.0
    assert abs(r["intercept"] - round((sy - slope * sx) / n, 4)) < 1e-6


def test_friedman_matches_python_twin(spark):
    from collections import defaultdict
    from challenge8_movies_etl_spark.registry import QUERIES
    rows = (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .selectExpr("cast(ts as date) AS d", "event_type").collect())
    daily = defaultdict(int)
    for r in rows:
        daily[(str(r.d), r.event_type)] += 1
    blocks = defaultdict(dict)
    for (d, et), c in daily.items():
        blocks[d][et] = c
    r2 = {}
    for d, row in blocks.items():
        vals = sorted(row.values())
        for et, c in row.items():
            lo = sum(1 for v in vals if v < c)
            t = sum(1 for v in vals if v == c)
            r2[(d, et)] = 2 * (lo + 1) + t - 1
    ets = sorted({et for _, et in r2})
    k = len(ets)
    n = len(blocks)
    r2_j = {et: sum(v for (d, e), v in r2.items() if e == et)
            for et in ets}
    dev2 = sum((r2_j[et] - n * (k + 1)) ** 2 for et in ets)
    sr22 = sum(v * v for v in r2.values())
    q = (k - 1) * dev2 / (sr22 - n * k * (k + 1) ** 2)
    r = QUERIES["q_friedman"](spark, SF_SMOKE).collect()[0]
    assert (r["n"], r["k"]) == (n, k)
    assert abs(r["q_stat"] - round(q, 6)) < 1e-6


def test_hodges_lehmann_matches_python_twin(spark):
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
    xs = [v[0] for v in daily.values()]
    ys = [v[1] for v in daily.values()]
    diffs = sorted(x - y for x in xs for y in ys)
    m = len(diffs)
    hl = (diffs[(m - 1) // 2] + diffs[m // 2]) / 2
    r = QUERIES["q_hodges_lehmann"](spark, SF_SMOKE).collect()[0]
    assert r["n_pairs"] == m
    assert r["hl_shift"] == hl


def test_signflip_p_value_bounds_and_twin(spark):
    import hashlib
    from collections import defaultdict
    from challenge8_movies_etl_spark.registry import QUERIES
    rows = (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .selectExpr("cast(ts as date) AS d", "event_type").collect())
    daily = defaultdict(int)
    for r in rows:
        if r.event_type == "click":
            daily[str(r.d)] += 1
        elif r.event_type == "purchase":
            daily[str(r.d)] -= 1
    t_obs = abs(sum(daily.values()))
    n_ge = 0
    for b in range(1, 201):
        tb = 0
        for d, delta in daily.items():
            h = hashlib.md5(f"{d}:{b}".encode()).hexdigest()
            tb += delta if int(h[0], 16) % 2 == 0 else -delta
        if abs(tb) >= t_obs:
            n_ge += 1
    r = QUERIES["q_signflip_test"](spark, SF_SMOKE).collect()[0]
    assert r["n_days"] == len(daily)
    assert (r["t_obs"], r["n_ge"]) == (t_obs, n_ge)
    assert abs(r["p_value"] - round((1 + n_ge) / 201, 6)) < 1e-9
    assert 1 / 201 <= r["p_value"] <= 1.0


def test_welch_matches_python_twin(spark):
    from challenge8_movies_etl_spark.registry import QUERIES
    by = _event_values_by_type(spark)
    a, b = by["click"], by["purchase"]
    n1, n2 = len(a), len(b)
    m1, m2 = sum(a) / n1, sum(b) / n2
    va = (sum(x * x for x in a) - sum(a) ** 2 / n1) / (n1 - 1) / n1
    vb = (sum(x * x for x in b) - sum(b) ** 2 / n2) / (n2 - 1) / n2
    # t is dimensionless (milli-keying cancels between mean diff and
    # SE) — no unit rescale (the r5-advice /1000 bug reported t 1000x
    # too small vs t critical values)
    t = (m1 - m2) / math.sqrt(va + vb)
    df = (va + vb) ** 2 / (va ** 2 / (n1 - 1) + vb ** 2 / (n2 - 1))
    r = QUERIES["q_welch_ttest"](spark, SF_SMOKE).collect()[0]
    assert (r["n1"], r["n2"]) == (n1, n2)
    assert abs(r["t_stat"] - round(t, 4)) < 1e-6
    assert abs(r["df_welch"] - round(df, 2)) < 0.05
    assert min(n1, n2) - 1 <= r["df_welch"] <= n1 + n2 - 2


def test_xi_correlation_matches_python_twin(spark):
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
    seq = sorted(daily.items(), key=lambda kv: (kv[1][0], kv[0]))
    ys = [y for _, (_, y) in seq]
    ally = sorted(ys)
    n = len(ys)
    r_ = [sum(1 for v in ally if v <= y) for y in ys]
    l_ = [sum(1 for v in ally if v >= y) for y in ys]
    s = sum(abs(r_[i + 1] - r_[i]) for i in range(n - 1))
    den2 = sum(li * (n - li) for li in l_)
    xi = 1.0 - n * s / (2.0 * den2)
    r = QUERIES["q_xi_correlation"](spark, SF_SMOKE).collect()[0]
    assert r["n"] == n
    assert abs(r["xi_xy"] - round(xi, 6)) < 1e-9
    # ties-corrected xi is bounded (asymmetric lower bound is fine)
    assert -1.0 <= r["xi_xy"] <= 1.0


def test_cronbach_alpha_matches_python_twin(spark):
    from collections import defaultdict
    from challenge8_movies_etl_spark.registry import QUERIES
    rows = (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .selectExpr("cast(ts as date) AS d", "event_type").collect())
    daily = defaultdict(int)
    for r in rows:
        daily[(r.event_type, str(r.d))] += 1
    items = defaultdict(list)
    for (et, d), c in sorted(daily.items()):
        items[et].append((d, c))
    k = len(items)
    # n-scaled variances: n*sum(x^2) - (sum x)^2 (common n cancels)
    def nv(xs):
        return len(xs) * sum(x * x for x in xs) - sum(xs) ** 2
    var_items = sum(nv([c for _, c in v]) for v in items.values())
    by_day = defaultdict(int)
    for (et, d), c in daily.items():
        by_day[d] += c
    var_total = nv(list(by_day.values()))
    alpha = (k / (k - 1)) * (1.0 - var_items / var_total)
    r = QUERIES["q_cronbach_alpha"](spark, SF_SMOKE).collect()[0]
    assert r["k"] == k
    assert abs(r["alpha"] - round(alpha, 6)) < 1e-9


def test_chisq_residuals_consistency(spark):
    from challenge8_movies_etl_spark.registry import QUERIES
    rows = QUERIES["q_chisq_residuals"](spark, SF_SMOKE).collect()
    chi = QUERIES["q_chisq_independence"](spark, SF_SMOKE).collect()
    assert len(rows) == len(chi)
    vs = {r["cramers_v"] for r in rows}
    assert len(vs) == 1  # V is a global constant column
    v = vs.pop()
    chi2 = chi[0]["chi2_total"]
    n = sum(r["observed"] for r in rows)
    k = min(len({r["event_type"] for r in rows}) - 1,
            len({r["dow"] for r in rows}) - 1)
    assert abs(v - round(math.sqrt(chi2 / (n * k)), 6)) < 1e-4
    # adjusted residuals: sum over a row of raw e-weighted residuals
    # is 0; sanity-check magnitudes instead (N(0,1)-ish)
    assert all(abs(r["adj_residual"]) < 50 for r in rows)


def test_effect_size_matches_welch_inputs(spark):
    from challenge8_movies_etl_spark.registry import QUERIES
    by = _event_values_by_type(spark)
    a, b = by["click"], by["purchase"]
    n1, n2 = len(a), len(b)
    md = sum(a) / n1 - sum(b) / n2
    sp = math.sqrt(((sum(x * x for x in a) - sum(a) ** 2 / n1)
                    + (sum(x * x for x in b) - sum(b) ** 2 / n2))
                   / (n1 + n2 - 2))
    d = md / sp
    r = QUERIES["q_effect_size"](spark, SF_SMOKE).collect()[0]
    assert (r["n1"], r["n2"]) == (n1, n2)
    assert abs(r["cohens_d"] - round(d, 6)) < 1e-9
    # Hedges' g shrinks d toward zero
    assert abs(r["hedges_g"]) <= abs(r["cohens_d"]) + 1e-12


def test_inequality_indices_bounds(spark):
    from challenge8_movies_etl_spark.registry import QUERIES
    r = QUERIES["q_inequality_indices"](spark, SF_SMOKE).collect()[0]
    k = r["k"]
    assert 0.0 <= r["theil"] <= math.log(k) + 1e-9
    assert 1.0 / k - 1e-9 <= r["hhi"] <= 1.0
    assert 1.0 / k - 1e-9 <= r["top_share"] <= 1.0


def test_friedman_cronbach_unbalanced_panel_uses_complete_blocks(
        spark, tmp_path):
    """Regression (round-5 advice): with a (day, event_type) cell
    missing, both statistics silently broke their n-cancellation
    identities. The fix restricts to complete blocks (days carrying
    every event type); this pins that semantics on an UNBALANCED
    synthetic panel, on both engines, against a python twin computed
    over the complete blocks only."""
    import datetime as dt

    import duckdb
    import pandas as pd

    from challenge8_movies_etl_spark.registry import ORACLE

    # 4 days x 3 types, with (day4, 'c') absent -> day4 is incomplete
    counts = {("2024-01-01", "a"): 3, ("2024-01-01", "b"): 5,
              ("2024-01-01", "c"): 2,
              ("2024-01-02", "a"): 7, ("2024-01-02", "b"): 1,
              ("2024-01-02", "c"): 4,
              ("2024-01-03", "a"): 2, ("2024-01-03", "b"): 6,
              ("2024-01-03", "c"): 6,
              ("2024-01-04", "a"): 9, ("2024-01-04", "b"): 2}
    rows = [(dt.datetime.fromisoformat(d + "T00:00:00"), et)
            for (d, et), c in counts.items() for _ in range(c)]
    pdf = pd.DataFrame(rows, columns=["ts", "event_type"])
    path = str(tmp_path / "events.parquet")
    pdf.to_parquet(path)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')")

    # ---- python twin over the 3 COMPLETE days ----
    complete = {d for d in {"2024-01-01", "2024-01-02", "2024-01-03",
                            "2024-01-04"}
                if all((d, et) in counts for et in "abc")}
    assert complete == {"2024-01-01", "2024-01-02", "2024-01-03"}
    ets, n, k = ["a", "b", "c"], len(complete), 3
    # friedman doubled tie-averaged ranks
    r2 = {}
    for d in complete:
        vals = sorted(counts[(d, et)] for et in ets)
        for et in ets:
            c = counts[(d, et)]
            lo = sum(1 for v in vals if v < c)
            t = sum(1 for v in vals if v == c)
            r2[(d, et)] = 2 * (lo + 1) + t - 1
    r2_j = {et: sum(v for (d, e), v in r2.items() if e == et) for et in ets}
    dev2 = sum((r2_j[et] - n * (k + 1)) ** 2 for et in ets)
    sr22 = sum(v * v for v in r2.values())
    q_want = (k - 1) * dev2 / (sr22 - n * k * (k + 1) ** 2)

    got = QUERIES["q_friedman"](spark, str(tmp_path)).collect()[0]
    assert (got["n"], got["k"]) == (n, k)
    assert abs(got["q_stat"] - round(q_want, 6)) < 1e-9
    o = con.execute(ORACLE["q_friedman"]).fetchone()
    assert (o[0], o[1]) == (n, k) and abs(o[2] - got["q_stat"]) < 1e-12

    # cronbach over complete days: n-scaled integer variances
    def nv(xs):
        return len(xs) * sum(x * x for x in xs) - sum(xs) ** 2
    var_items = sum(nv([counts[(d, et)] for d in sorted(complete)])
                    for et in ets)
    var_total = nv([sum(counts[(d, et)] for et in ets)
                    for d in sorted(complete)])
    a_want = (k / (k - 1)) * (1.0 - var_items / var_total)
    got = QUERIES["q_cronbach_alpha"](spark, str(tmp_path)).collect()[0]
    assert got["k"] == k
    assert abs(got["alpha"] - round(a_want, 6)) < 1e-9
    o = con.execute(ORACLE["q_cronbach_alpha"]).fetchone()
    assert o[0] == k and abs(o[1] - got["alpha"]) < 1e-12


def test_adaboost_matches_reference_exp_weight_implementation(spark):
    """The integer-weight reweight must pick the SAME stump sequence
    and errors as a textbook exp-weight AdaBoost run in pure Python on
    the same points (the integer trick is a global-rescale equivalence
    — this pins it)."""
    import math

    from challenge8_movies_etl_spark.queries_ml import q_adaboost_stumps
    from challenge8_movies_etl_spark.sources.fixtures import load_table
    from tests.conftest import SF_SMOKE

    rows = q_adaboost_stumps(spark, SF_SMOKE).collect()
    assert [r["round"] for r in rows] == [1, 2, 3]

    pts = [(float(r["embedding"][0]), float(r["embedding"][1]))
           for r in load_table(spark, SF_SMOKE, "embeddings")
           .select("embedding").collect()]
    ys = [1 if e0 + e1 > 0 else -1 for e0, e1 in pts]
    grid = [(f, t, p) for f in (0, 1)
            for t in (-0.15, -0.05, 0.0, 0.05, 0.15) for p in (1, -1)]
    w = [1.0] * len(pts)
    for r in rows:
        best = None
        for f, t, p in grid:
            e = sum(wi for wi, xy, y in zip(w, pts, ys)
                    if (p if xy[f] > t else -p) != y)
            key = (e / sum(w), f, t, p)
            if best is None or key < best:
                best = key
        err, f, t, p = best
        assert (r["feature"], r["threshold"], r["polarity"]) == \
            (f"e{f}", t, p), r["round"]
        assert abs(r["err"] - err) < 1e-6, r["round"]
        assert r["err"] < 0.5  # weak learnability on this label
        alpha = 0.5 * math.log((1 - err) / err)
        assert abs(r["alpha"] - alpha) < 1e-4
        w = [wi * math.exp(-alpha * y * (p if xy[f] > t else -p))
             for wi, xy, y in zip(w, pts, ys)]
    assert rows[0]["ensemble_correct"] > 0.8 * rows[0]["n_points"]
