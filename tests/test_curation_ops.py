"""Round-4 curation/governance wave (queries_curation.py): semantic
invariants beyond the DuckDB oracle agreement — the oracle proves both
engines compute the same thing; these prove the thing computed has the
properties the operator's contract claims."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from challenge8_movies_etl_spark.registry import QUERIES, load_all
from tests.conftest import SF_SMOKE

load_all()


def test_gini_bounded_and_ordering(spark):
    """Gini is in [0, 1); a nation's gini of 0 would mean perfectly
    equal spend (impossible with TPC-H-ish prices but >= 0 always)."""
    rows = QUERIES["q_gini_concentration"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["gini"] < 1.0
        assert r["total_spend"] > 0


def test_km_survival_monotone_nonincreasing(spark):
    """Kaplan-Meier survival curves never increase in t."""
    rows = (QUERIES["q_survival_km"](spark, SF_SMOKE)
            .orderBy("t").collect())
    assert rows
    prev = 1.0 + 1e-9
    for r in rows:
        assert r["survival"] <= prev + 1e-9
        assert 0.0 <= r["survival"] <= 1.0
        assert r["d_events"] <= r["n_risk"]
        prev = r["survival"]


def test_benford_fractions_complete(spark):
    """Observed fractions over digits 1-9 sum to 1; expected fractions
    are the closed-form Benford distribution."""
    rows = QUERIES["q_benford"](spark, SF_SMOKE).collect()
    digits = {r["digit"] for r in rows}
    assert digits <= set(range(1, 10))
    assert abs(sum(r["obs_frac"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert abs(r["exp_frac"] - math.log10(1 + 1 / r["digit"])) < 1e-5


def test_zonemap_layouts_agree_on_matches(spark):
    """Zone-map pruning is lossless: both layouts see the same total
    rows and the same total matching rows — pruning changes I/O, never
    the answer. The clustered layout must prune at least as well
    (fewer partial chunks) as natural."""
    rows = QUERIES["q_zonemap_prune"](spark, SF_SMOKE).collect()
    by_layout = {}
    for r in rows:
        d = by_layout.setdefault(r["layout"], {"rows": 0, "match": 0,
                                               "partial": 0})
        d["rows"] += r["n_rows"]
        d["match"] += r["n_matching"]
        if r["status"] == "partial":
            d["partial"] += r["n_chunks"]
    assert by_layout["natural"]["rows"] == by_layout["clustered"]["rows"]
    assert by_layout["natural"]["match"] == by_layout["clustered"]["match"]
    assert (by_layout["clustered"]["partial"]
            <= by_layout["natural"]["partial"])


def test_image_dedup_exact_covers_corpus(spark):
    """Every doc lands in exactly one md5 group: group sizes sum to the
    corpus size, keepers are distinct, and each group's format is one
    of the three real containers."""
    docs_n = (spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count())
    rows = QUERIES["q_image_dedup_exact"](spark, SF_SMOKE).collect()
    assert sum(r["n_copies"] for r in rows) == docs_n
    keepers = [r["keeper"] for r in rows]
    assert len(keepers) == len(set(keepers))
    assert {r["fmt"] for r in rows} <= {"bmp", "ppm", "jpeg"}


def test_rfm_tiles_partition_customers(spark):
    """RFM segment counts sum to the number of customers with orders;
    segment codes are valid 3-digit quartile combinations."""
    seg = QUERIES["q_rfm_segment"](spark, SF_SMOKE).collect()
    n_cust = (spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
              .select("o_custkey").distinct().count())
    assert sum(r["n_customers"] for r in seg) == n_cust
    for r in seg:
        code = r["segment"]
        rt, ft, mt = code // 100, code // 10 % 10, code % 10
        assert all(1 <= t <= 4 for t in (rt, ft, mt))


def test_target_encode_shrinks_toward_global(spark):
    """Smoothed encodings lie between the category rate and the global
    rate (the defining property of additive smoothing)."""
    rows = QUERIES["q_target_encode"](spark, SF_SMOKE).collect()
    big_n = sum(r["n"] for r in rows)
    big_pos = sum(r["pos"] for r in rows)
    g = big_pos / big_n
    for r in rows:
        raw = r["pos"] / r["n"]
        lo, hi = sorted((raw, g))
        assert lo - 1e-6 <= r["encoded"] <= hi + 1e-6


def test_dp_noise_bounded_and_seeded(spark):
    """Laplace(1) noise by inverse CDF from u in (-0.5, 0.5): |noise|
    <= ln(1e6) ≈ 13.8; re-running yields identical noise (seeded)."""
    a = {r["event_type"]: r["noisy_count"]
         for r in QUERIES["q_dp_noisy_counts"](spark, SF_SMOKE).collect()}
    b = {r["event_type"]: r["noisy_count"]
         for r in QUERIES["q_dp_noisy_counts"](spark, SF_SMOKE).collect()}
    assert a == b
    truth = {r["event_type"]: r["n"]
             for r in (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
                       .groupBy("event_type").agg(F.count("*").alias("n"))
                       .collect())}
    for t, noisy in a.items():
        assert abs(noisy - truth[t]) <= math.log(1e6) + 1e-6


def test_quality_classifier_probabilities(spark):
    """Bucket sums of p are consistent with bucket sizes (p in [0,1])
    and every doc is bucketed exactly once."""
    rows = QUERIES["q_quality_classifier"](spark, SF_SMOKE).collect()
    docs_n = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == docs_n
    for r in rows:
        assert 0.0 <= r["sum_p"] <= r["n_docs"]


def test_t_closeness_matches_python_twin(spark):
    """TVD per nation recomputed with python Counters (exact rational
    via integers) must equal the query's output bit-for-bit."""
    from collections import Counter

    import pandas as pd

    from challenge8_movies_etl_spark.queries_curation import q_t_closeness
    from tests.conftest import SF_SMOKE

    c = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    seg_tot = Counter(c.c_mktsegment)
    n_tot = len(c)
    got = {r.nation: (r.n_rows, r.tvd, r.meets_t02)
           for r in q_t_closeness(spark, SF_SMOKE).collect()}
    for nation, sub in c.groupby("c_nationkey"):
        cnt = Counter(sub.c_mktsegment)
        n_g = len(sub)
        num = sum(abs(cnt.get(s, 0) * n_tot - seg_tot[s] * n_g)
                  for s in seg_tot)
        tvd = num / float(2 * n_g * n_tot)
        assert got[nation] == (n_g, tvd, tvd <= 0.2)
    assert len(got) == c.c_nationkey.nunique()


def test_coverage_select_matches_python_greedy(spark):
    """The 5 greedy picks, marginal gains, and running coverage must
    match an independent python set-cover greedy on the smoke fixture,
    and gains must be non-increasing (submodularity of coverage)."""
    import pandas as pd

    from challenge8_movies_etl_spark.queries_curation import (
        _COVER_ROUNDS, q_coverage_select)
    from tests.conftest import SF_SMOKE

    pdf = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    sets = {}
    for r in pdf.itertuples():
        t = r.text.split(" ")
        sets[int(r.doc_id)] = {f"{a} {b}" for a, b in zip(t, t[1:])}
    covered, expect, total = set(), [], 0
    for rnd in range(1, _COVER_ROUNDS + 1):
        best = min(((d, len(s - covered)) for d, s in sets.items()),
                   key=lambda kv: (-kv[1], kv[0]))
        total += best[1]
        expect.append((rnd, best[0], best[1], total))
        covered |= sets.pop(best[0])
    got = [(r.round, r.doc_id, r.gain, r.covered_total)
           for r in q_coverage_select(spark, SF_SMOKE).collect()]
    assert got == expect
    gains = [g for _, _, g, _ in got]
    assert gains == sorted(gains, reverse=True)


def test_erasure_purge_is_complete_and_exact(spark):
    """Purged + remaining must reconcile to the original counts, and
    no erased user may survive the purge anti-join."""
    import pandas as pd

    from challenge8_movies_etl_spark.queries_curation import (
        q_erasure_purge)
    from tests.conftest import SF_SMOKE

    e = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    erased_users = {u for u in e.user_id.unique() if u % 97 == 0}
    rows = q_erasure_purge(spark, SF_SMOKE).collect()
    by_type = e.groupby("event_type").size()
    purged_by_type = (e[e.user_id.isin(erased_users)]
                      .groupby("event_type").size())
    for r in rows:
        assert r.n_before == by_type[r.event_type]
        assert r.n_purged == purged_by_type.get(r.event_type, 0)
        assert r.n_after == r.n_before - r.n_purged
        assert r.n_users_erased == len(erased_users)


def test_rake_matches_python_twin(spark):
    """Top-15 RAKE phrases must equal a full python recomputation
    (stopword-run split, 3-word cap, integer degree scoring)."""
    from collections import Counter, defaultdict

    from challenge8_movies_etl_spark.queries_curation import (
        q_rake_keywords)
    from challenge8_movies_etl_spark.sources.fixtures import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents") \
        .select("doc_id", "text").collect()
    stop = {"the", "a"}
    chunks = []
    for r in docs:
        run = []
        for w in r["text"].split(" ") + ["the"]:
            if w in stop:
                for c in range(0, len(run), 3):
                    chunks.append(run[c:c + 3])
                run = []
            else:
                run.append(w)
    deg = Counter()
    for ch in chunks:
        for w in ch:
            deg[w] += len(ch)
    scored = defaultdict(lambda: [0, 0])
    for ch in chunks:
        p = " ".join(ch)
        scored[p][0] = sum(deg[w] for w in ch)
        scored[p][1] += 1
    expect = sorted(((p, s, n) for p, (s, n) in scored.items()),
                    key=lambda t: (-t[1], t[0]))[:15]
    got = [(r["phrase"], r["score"], r["n_occur"])
           for r in q_rake_keywords(spark, SF_SMOKE).collect()]
    assert got == expect


def test_nelson_aalen_crosschecks_km(spark):
    """H(t) must be nondecreasing, its variance positive and smaller,
    and -ln(KM survival) must approximate H (the classical identity,
    tight while d_i << n_i)."""
    import math

    from challenge8_movies_etl_spark.queries_curation import (
        q_survival_km, q_survival_nelson_aalen)
    from tests.conftest import SF_SMOKE

    na = q_survival_nelson_aalen(spark, SF_SMOKE).collect()
    km = {r["t"]: r["survival"]
          for r in q_survival_km(spark, SF_SMOKE).collect()}
    hz = [r["cum_hazard"] for r in na]
    assert hz == sorted(hz) and hz[0] > 0
    for r in na:
        assert 0 < r["hazard_var"] < r["cum_hazard"]
        if r["t"] in km and km[r["t"]] > 0:
            assert abs(-math.log(km[r["t"]]) - r["cum_hazard"]) \
                < 0.05 * r["cum_hazard"] + 0.01


def test_phash_invariance_properties():
    """pHash collapses resolution/contrast but separates structure."""
    from challenge8_movies_etl_spark.operators.multimodal import (
        encode_bmp_hsplit, encode_bmp_vsplit, phash64)
    # same structure, different resolution and tone pair -> same hash
    assert (phash64(encode_bmp_vsplit(8, 8, 10, 200))
            == phash64(encode_bmp_vsplit(24, 16, 50, 90)))
    assert (phash64(encode_bmp_hsplit(16, 24, 3, 250))
            == phash64(encode_bmp_hsplit(8, 8, 30, 40)))
    # orientation, tone order, and uniformity all separate
    hs = {phash64(encode_bmp_vsplit(16, 16, 10, 200)),
          phash64(encode_bmp_vsplit(16, 16, 200, 10)),
          phash64(encode_bmp_hsplit(16, 16, 10, 200)),
          phash64(encode_bmp_hsplit(16, 16, 200, 10)),
          phash64(encode_bmp_vsplit(16, 16, 99, 99))}
    assert len(hs) == 5


def test_image_phash_groups_partition_corpus(spark):
    from challenge8_movies_etl_spark.registry import QUERIES
    rows = QUERIES["q_image_phash"](spark, SF_SMOKE).collect()
    docs_n = (spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
              .count())
    assert sum(r["n_members"] for r in rows) == docs_n
    reps = [r["rep"] for r in rows]
    assert reps == sorted(reps) and len(set(reps)) == len(reps)


def test_logrank_matches_python_twin(spark):
    from collections import defaultdict
    from challenge8_movies_etl_spark.registry import QUERIES
    li = (spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
          .selectExpr("l_orderkey", "l_shipdate", "l_returnflag",
                      "l_quantity"))
    od = (spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
          .selectExpr("o_orderkey", "o_orderdate"))
    rows = (li.join(od, li.l_orderkey == od.o_orderkey)
            .selectExpr(
                "datediff(cast(l_shipdate as date), "
                "cast(o_orderdate as date)) AS t",
                "case when l_returnflag = 'R' then 1 else 0 end AS ev",
                "case when l_quantity > 25 then 1 else 0 end AS grp")
            .collect())
    per_t = defaultdict(lambda: [0, 0, 0, 0])  # a1 a0 d1 d0
    for r in rows:
        c = per_t[r.t]
        c[0 if r.grp else 1] += 1
        if r.ev:
            c[2 if r.grp else 3] += 1
    o1 = e1 = v = 0.0
    n1 = sum(c[0] for c in per_t.values())
    n0 = sum(c[1] for c in per_t.values())
    r1, r0 = n1, n0
    for t in sorted(per_t):
        a1, a0, d1, d0 = per_t[t]
        nt, dt = r1 + r0, d1 + d0
        if dt > 0:
            o1 += d1
            e1 += round(dt * r1 / nt, 8)
            if nt > 1:
                v += round(dt * r1 * r0 * (nt - dt) / (nt * nt * (nt - 1)),
                           8)
        r1 -= a1
        r0 -= a0
    out = QUERIES["q_survival_logrank"](spark, SF_SMOKE).collect()[0]
    assert (out["n1"], out["n0"], out["o1"]) == (n1, n0, int(o1))
    assert abs(out["e1"] - round(e1, 4)) < 1e-9
    assert abs(out["v"] - round(v, 4)) < 1e-9
    assert abs(out["chi2"] - round((o1 - e1) ** 2 / v, 6)) < 1e-5


def test_span_corruption_spans_never_overlap(spark):
    """The slot-grid + in-slot-offset placement must make mask spans
    disjoint for every document (the property the masked-token count
    relies on — an overlap would double-count)."""
    from challenge8_movies_etl_spark.registry import QUERIES, load_all
    from challenge8_movies_etl_spark.sources.fixtures import load_table
    from pyspark.sql import functions as F

    load_all()
    d = load_table(spark, SF_SMOKE, "documents")
    planned = d.select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    ).selectExpr("doc_id", "n", "greatest(1, n DIV 20) AS n_spans"
                 ).selectExpr("doc_id", "n", "n_spans",
                              "n DIV n_spans AS sw")
    spans = planned.select(
        "doc_id", "n", "sw",
        F.explode(F.expr("sequence(0, n_spans - 1)")).alias("si"),
    ).withColumn(
        "start",
        F.expr("si * sw + ((doc_id * 2654435761 + (si + 1) * 40503)"
               " % 1000003) % greatest(1, sw - 3 + 1)"),
    ).withColumn("fin", F.expr("start + least(3, sw, n - start)"))
    # each span lives inside its own slot: start >= si*sw and
    # end <= (si+1)*sw (except possibly the last slot's tail clamp)
    bad = spans.filter(
        (F.col("start") < F.col("si") * F.col("sw"))
        | (F.col("fin") > (F.col("si") + 1) * F.col("sw"))).count()
    assert bad == 0
