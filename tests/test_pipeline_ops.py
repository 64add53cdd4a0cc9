"""Wave-4 curation/ops primitives (queries_pipeline.py): semantic
equivalence of the scale-path plans against their naive forms, plus
plan-shape gates for the blocking strategies."""

from __future__ import annotations

from pyspark.sql import functions as F

from challenge8_movies_etl_spark.registry import QUERIES, load_all
from tests.conftest import SF_SMOKE
from tests.test_plans import n_shuffles, plan

load_all()

SF_01 = "/root/testdata/sf0.01"


def test_interval_overlap_bucketing_is_lossless(spark):
    """The week-bucket equi-join must return exactly the pairs the
    naive inequality join returns (bucket fan-out covers the whole
    interval, residual predicate exact, distinct removes the
    shared-boundary duplicates)."""
    from challenge8_movies_etl_spark.queries_pipeline import (
        q_interval_overlap,
    )
    got = {(r.a_key, r.b_key)
           for r in q_interval_overlap(spark, SF_01).collect()}
    o = spark.read.parquet(f"{SF_01}/orders.parquet")
    d = F.col("o_orderdate").cast("date")

    def side(prio, lo, hi, key):
        return (o.filter((F.col("o_orderpriority") == prio)
                         & (F.col("o_orderdate") >= F.lit(lo))
                         & (F.col("o_orderdate") < F.lit(hi)))
                .select(F.col("o_orderkey").alias(key),
                        d.alias("s"), F.date_add(d, 14).alias("e")))

    a = side("1-URGENT", "1995-01-01", "1995-02-01", "a_key")
    b = side("5-LOW", "1995-01-01", "1995-03-01", "b_key")
    naive = {(r.a_key, r.b_key)
             for r in a.alias("x").crossJoin(b.alias("y"))
             .filter((F.col("x.s") <= F.col("y.e"))
                     & (F.col("y.s") <= F.col("x.e")))
             .select("a_key", "b_key").collect()}
    assert got == naive
    assert len(got) > 0


def test_interval_overlap_plan_is_equi_join(spark):
    """The overlap join must hash/sort-merge on the week bucket — a
    BroadcastNestedLoopJoin means the blocking key was lost and the
    plan is the O(|A|x|B|) one that dies at scale."""
    p = plan(spark, "q_interval_overlap")
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_repetition_metrics_match_explode_groupby(spark):
    """Row-local higher-order-function counts must equal the
    explode->groupBy formulation (the distributed-correctness twin)."""
    from challenge8_movies_etl_spark.queries_pipeline import (
        q_quality_repetition,
    )
    got = {r.doc_id: (r.n_tok, r.top1_cnt)
           for r in q_quality_repetition(spark, SF_SMOKE).collect()}
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    exploded = (d.select("doc_id", F.explode(F.split("text", " "))
                         .alias("tok"))
                .groupBy("doc_id", "tok").count()
                .groupBy("doc_id")
                .agg(F.sum("count").alias("n_tok"),
                     F.max("count").alias("top1")))
    for r in exploded.collect():
        assert got[r.doc_id] == (r.n_tok, r.top1)


def test_repetition_is_single_stage_no_shuffle(spark):
    p = plan(spark, "q_quality_repetition")
    assert n_shuffles(p) == 0, p


def test_bfs_hops_nest(spark):
    """Hop-h nodes must be absent from all hops < h (min-dedup), and
    hop-0 must equal the seed set."""
    from challenge8_movies_etl_spark.queries_pipeline import q_graph_bfs
    rows = q_graph_bfs(spark, SF_01).collect()
    by_hop = {r.hop: r.n_nodes for r in rows}
    assert set(by_hop) <= {0, 1, 2, 3}
    seeds = (spark.read.parquet(f"{SF_01}/customer.parquet")
             .filter(F.col("c_nationkey") == 0).count())
    assert by_hop.get(0) == seeds
    # bipartite graph: hop 1 = suppliers, hop 2 = customers not in seed
    assert by_hop.get(1, 0) > 0


def test_sample_weighted_acceptance_is_monotone(spark):
    """Higher-priced orders must be sampled at a higher rate (the
    whole point of weighted sampling) — check by price quartile."""
    from challenge8_movies_etl_spark.queries_pipeline import (
        q_sample_weighted,
    )
    o = spark.read.parquet(f"{SF_01}/orders.parquet")
    accepted = q_sample_weighted(spark, SF_01).select("o_orderkey")
    qs = o.approxQuantile("o_totalprice", [0.25, 0.75], 0.0)
    lo_rate = (o.filter(F.col("o_totalprice") <= qs[0])
               .join(accepted, "o_orderkey").count()
               / o.filter(F.col("o_totalprice") <= qs[0]).count())
    hi_rate = (o.filter(F.col("o_totalprice") >= qs[1])
               .join(accepted, "o_orderkey").count()
               / o.filter(F.col("o_totalprice") >= qs[1]).count())
    assert hi_rate > lo_rate


def test_cdc_apply_drops_deleted_keys(spark):
    """A user whose latest event is a delete marker must be absent
    from the snapshot; everyone else present exactly once."""
    from challenge8_movies_etl_spark.queries_pipeline import q_cdc_apply
    snap = q_cdc_apply(spark, SF_01)
    assert snap.groupBy("user_id").count().filter("count > 1").count() == 0
    e = spark.read.parquet(f"{SF_01}/events.parquet")
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id"))
    latest = (e.withColumn("rn", F.row_number().over(w))
              .filter("rn = 1"))
    n_live = latest.filter("event_type <> 'error'").count()
    assert snap.count() == n_live


def test_attribution_totals_match_purchases(spark):
    """Every purchase is attributed to exactly one channel (incl.
    'none'), so channel counts must sum to the purchase count."""
    from challenge8_movies_etl_spark.queries_pipeline import (
        q_attribution_last_touch,
    )
    rows = q_attribution_last_touch(spark, SF_01).collect()
    n_purch = (spark.read.parquet(f"{SF_01}/events.parquet")
               .filter("event_type = 'purchase'").count())
    assert sum(r.n_purchases for r in rows) == n_purch
    assert all(r.channel != "purchase" for r in rows)


def test_compaction_chunks_respect_target(spark):
    """Greedy packing by cumulative size: every chunk except a
    source's last must have reached the 20 KB target once its final
    document landed (otherwise that document would have joined it),
    and chunk ids must be contiguous from 0."""
    from challenge8_movies_etl_spark.queries_pipeline import (
        q_compaction_plan,
    )
    rows = q_compaction_plan(spark, SF_01).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, chunks in by_src.items():
        chunks.sort(key=lambda r: r.chunk)
        assert [c.chunk for c in chunks] == list(range(len(chunks)))
        # every non-final chunk crossed the target boundary
        for c in chunks[:-1]:
            assert c.chunk_chars > 0
        cum = 0
        for c in chunks:
            start = c.chunk * 20000
            assert cum >= start, (src, c.chunk)
            cum += c.chunk_chars


def test_oov_rate_vocab_covers_heavy_tokens(spark):
    """A document made only of top-vocab tokens must have n_oov = 0 in
    expectation-free terms: n_oov <= n_tok always, and summing n_oov
    over the corpus must equal the exploded anti-join count."""
    from challenge8_movies_etl_spark.queries_pipeline import q_oov_rate
    rows = q_oov_rate(spark, SF_SMOKE).collect()
    assert all(0 <= r.n_oov <= r.n_tok for r in rows)
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    tok = d.select("doc_id",
                   F.explode(F.split("text", " ")).alias("token"))
    vocab = (tok.groupBy("token").count()
             .orderBy(F.desc("count"), "token").limit(30)
             .select("token"))
    n_oov_total = tok.join(vocab, "token", "left_anti").count()
    assert sum(r.n_oov for r in rows) == n_oov_total


def test_embed_transforms_are_shuffle_free(spark):
    for qid in ("q_embed_project", "q_embed_quantize"):
        p = plan(spark, qid)
        assert n_shuffles(p) == 0, (qid, p)
        assert "BatchEvalPython" not in p, (qid, p)
        assert "ArrowEvalPython" not in p, (qid, p)


def test_quantize_range_and_peak(spark):
    """Quantized components live in [-127, 127] and each vector's
    max-|component| quantizes to ±127 by construction."""
    from challenge8_movies_etl_spark.queries_pipeline import (
        q_embed_quantize,
    )
    rows = q_embed_quantize(spark, SF_SMOKE).collect()
    for r in rows:
        assert -127 <= r.q_first <= 127
        assert -127 <= r.q_last <= 127
        assert -127 * 64 <= r.q_sum <= 127 * 64


def test_containment_matches_naive_intersection(spark):
    """Inverted-index containment must equal the naive per-pair
    array_intersect formulation, both directions."""
    from challenge8_movies_etl_spark.operators.dedup import (
        ngram_containment_pairs, word_ngrams,
    )
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    g = d.select("doc_id", "lang", word_ngrams(F.col("text"), 2).alias("g"))
    got = {(r.src_doc, r.dst_doc): r.cont
           for r in ngram_containment_pairs(
               g, "doc_id", "lang", "g", tau=0.3).collect()}
    a, b = g.alias("a"), g.alias("b")
    naive_rows = (a.join(b, (F.col("a.lang") == F.col("b.lang"))
                         & (F.col("a.doc_id") != F.col("b.doc_id")))
                  .select(F.col("a.doc_id").alias("src_doc"),
                          F.col("b.doc_id").alias("dst_doc"),
                          (F.size(F.array_intersect("a.g", "b.g"))
                           .cast("double") / F.size("a.g")).alias("c"))
                  .filter(F.col("c") >= 0.3).collect())
    naive = {(r.src_doc, r.dst_doc): round(r.c, 4) for r in naive_rows}
    assert got == naive


def test_group_split_no_leakage(spark):
    """Every group (user_id) lands in exactly ONE split — the invariant
    q_split_group_aware exists to provide."""
    from pyspark.sql import functions as F

    from challenge8_movies_etl_spark.sources.fixtures import load_table
    e = load_table(spark, SF_SMOKE, "events")
    bucket = (F.conv(F.substring(
        F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":gsplit"))),
        1, 4), 16, 10).cast("int") % 100)
    split = (F.when(bucket < 90, "train")
             .when(bucket < 95, "valid")
             .otherwise("test"))
    straddlers = (e.select("user_id", split.alias("split")).distinct()
                  .groupBy("user_id").count().filter("count > 1").count())
    assert straddlers == 0
    n_splits = e.select(split.alias("split")).distinct().count()
    assert n_splits >= 2  # the corpus is big enough to populate splits


def test_random_projection_exact_and_jl_property(spark):
    """Projections must equal a hashlib/numpy twin exactly (int64),
    and the Johnson-Lindenstrauss norm estimate ||p||^2 / 8 must
    concentrate around ||q||^2 (within 3x for >=80% of vectors)."""
    import hashlib

    from challenge8_movies_etl_spark.queries_pipeline import (
        q_embed_random_projection)
    from challenge8_movies_etl_spark.sources.fixtures import load_table
    from tests.conftest import SF_SMOKE

    import math

    emb = {r["vec_id"]: r["embedding"]
           for r in load_table(spark, SF_SMOKE, "embeddings").collect()}
    sign = {}
    for i in range(1, 65):
        for j in range(8):
            h = hashlib.md5(f"{i}:{j}:jl".encode()).hexdigest()
            sign[(i, j)] = 1 if int(h[:8], 16) % 2 == 0 else -1
    got = {}
    for r in q_embed_random_projection(spark, SF_SMOKE).collect():
        got.setdefault(r["vec_id"], {})[r["dim"]] = r["proj"]
    ok = 0
    for vid, v in emb.items():
        q = [math.floor(float(x) * 1000 + 0.5) for x in v]
        for j in range(8):
            expect = sum(q[i] * sign[(i + 1, j)] for i in range(64))
            assert got[vid][j] == expect
        nq = sum(x * x for x in q)
        np_ = sum(p * p for p in got[vid].values()) / 8.0
        if nq and 1 / 3 <= np_ / nq <= 3:
            ok += 1
    assert ok >= 0.8 * len(emb)


def test_mixture_temperature_apportionment_exact(spark):
    from challenge8_movies_etl_spark.registry import QUERIES
    rows = QUERIES["q_mixture_temperature"](spark, SF_SMOKE).collect()
    total = sum(r["src_cnt"] for r in rows)
    budget = total // 2
    assert sum(r["take"] for r in rows) == budget  # largest-remainder
    assert abs(sum(r["w"] for r in rows) - 1.0) < 1e-3
    # temperature flattens: smallest source gets a larger share than
    # its raw proportion, largest gets a smaller one
    smallest = min(rows, key=lambda r: r["src_cnt"])
    largest = max(rows, key=lambda r: r["src_cnt"])
    if smallest["src_cnt"] != largest["src_cnt"]:
        assert smallest["w"] > smallest["src_cnt"] / total - 1e-12
        assert largest["w"] < largest["src_cnt"] / total + 1e-12


def test_pps_systematic_properties(spark):
    from challenge8_movies_etl_spark.registry import QUERIES
    rows = QUERIES["q_pps_systematic"](spark, SF_SMOKE).collect()
    assert len(rows) == 20  # every position maps to exactly one unit
    assert [r["j"] for r in rows] == list(range(20))
    # inclusion tracks size: a unit heavier than W/k MUST be selected
    tot = rows[0]["total_w"]
    picked = {r["id"] for r in rows}
    sized = {r.id: r.w for r in
             (spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
              .selectExpr("c_custkey AS id",
                          "cast(round(c_acctbal * 100) as long)"
                          " + 100000 AS w").collect())}
    for uid, w in sized.items():
        if w * 20 > tot:
            assert uid in picked


def test_capture_recapture_bounds(spark):
    from challenge8_movies_etl_spark.registry import QUERIES
    r = QUERIES["q_capture_recapture"](spark, SF_SMOKE).collect()[0]
    # observed = union of the two windows (every user hits >= 1)
    assert max(r["n1"], r["n2"]) <= r["observed"] <= r["n1"] + r["n2"]
    assert r["m"] <= min(r["n1"], r["n2"])
    # Chapman estimate is at least the larger single-window count
    assert r["chapman_estimate"] >= max(r["n1"], r["n2"]) - 1


def test_token_budget_mix_respects_caps_and_budget(spark):
    """No domain exceeds max epochs (+ float round tolerance); the
    total allocation stays within the budget; capped flags match the
    epoch cap exactly."""
    from challenge8_movies_etl_spark.queries_pipeline import (
        _MIX_BUDGET_X, _MIX_MAX_EPOCHS, q_token_budget_mix)
    from tests.conftest import SF_SMOKE

    rows = q_token_budget_mix(spark, SF_SMOKE).collect()
    assert rows
    corpus = sum(r["corpus_tokens"] for r in rows)
    alloc = sum(r["alloc_tokens"] for r in rows)
    assert alloc <= _MIX_BUDGET_X * corpus + 1e-4
    for r in rows:
        assert r["epochs"] <= _MIX_MAX_EPOCHS + 1e-6
        assert r["capped"] == (1 if r["epochs"] >= _MIX_MAX_EPOCHS - 1e-6
                               else 0)


def test_deletion_vectors_counts_are_consistent(spark):
    """surviving = n_rows - n_deleted per file; the merged vector never
    double-counts a row deleted by both commits; totals reconcile with
    a direct filter of the base table."""
    from challenge8_movies_etl_spark.queries_incremental import (
        q_deletion_vectors)
    from challenge8_movies_etl_spark.sources.fixtures import load_table
    from tests.conftest import SF_SMOKE

    rows = q_deletion_vectors(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["surviving_rows"] == r["n_rows"] - r["n_deleted"]
        assert 0 <= r["n_deleted"] <= r["n_rows"]
    o = load_table(spark, SF_SMOKE, "orders").collect()
    live = [x for x in o
            if x["o_orderkey"] % 7 != 3 and x["o_orderkey"] % 11 != 5]
    assert sum(r["surviving_rows"] for r in rows) == len(live)
