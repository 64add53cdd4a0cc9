"""Invariant tests for the search/retrieval wave (queries_search.py,
q_outlier_iqr/q_time_weighted_avg/q_rolling_median): algebraic
properties that must hold regardless of fixture content."""

from __future__ import annotations

from pyspark.sql import functions as F

from challenge8_movies_etl_spark.queries_search import (
    _STRIDE,
    q_bm25,
    q_chunk_sliding,
    q_market_basket,
)
from challenge8_movies_etl_spark.queries_timeseries import (
    q_rolling_median,
    q_time_weighted_avg,
)
from challenge8_movies_etl_spark.sources.fixtures import load_table
from tests.conftest import SF_SMOKE


def test_chunks_reconstruct_documents(spark):
    """Concatenating the even-stride chunks (chunk_idx 0,2,4,... are
    exactly the non-overlapping 32-token windows) must reproduce every
    document's text verbatim — chunking loses nothing."""
    chunks = q_chunk_sliding(spark, SF_SMOKE)
    # collect_list has no order guarantee — rebuild via sort of structs
    rebuilt = (chunks.where(F.col("chunk_idx") % 2 == 0)
               .groupBy("doc_id")
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("chunk_idx", "chunk_text"))),
                       lambda s: s["chunk_text"]), " ").alias("rebuilt")))
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    bad = (docs.join(rebuilt, "doc_id")
           .where(F.col("text") != F.col("rebuilt")).count())
    assert bad == 0


def test_chunk_count_matches_formula(spark):
    """Per doc: n_chunks == floor((n_tokens - 1) / stride) + 1."""
    chunks = q_chunk_sliding(spark, SF_SMOKE)
    per_doc = chunks.groupBy("doc_id").agg(F.count("*").alias("n_chunks"))
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.expr("size(split(text, ' '))").alias("n_tokens"))
    bad = (docs.join(per_doc, "doc_id")
           .where(F.col("n_chunks") !=
                  F.floor((F.col("n_tokens") - 1) / _STRIDE) + 1).count())
    assert bad == 0


def test_bm25_scores_positive_and_ranked(spark):
    rows = q_bm25(spark, SF_SMOKE).collect()
    assert rows, "lexicon terms exist in fixtures, result can't be empty"
    scores = [r.bm25 for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_market_basket_confidence_and_lift_bounds(spark):
    rows = q_market_basket(spark, SF_SMOKE).collect()
    for r in rows:
        assert r.part_a < r.part_b          # canonical pair ordering
        assert 0 < r.confidence <= 1.0      # pair <= item_a by definition
        assert r.lift > 0


def test_twa_bounded_by_value_range(spark):
    """A time-weighted average is a convex combination of observed
    values, so it must lie within each user's [min, max]."""
    twa = q_time_weighted_avg(spark, SF_SMOKE)
    bounds = (load_table(spark, SF_SMOKE, "events")
              .groupBy("user_id")
              .agg(F.min("value").alias("lo"), F.max("value").alias("hi")))
    bad = (twa.join(bounds, "user_id")
           .where((F.col("twa_value") < F.col("lo") - 1e-4)
                  | (F.col("twa_value") > F.col("hi") + 1e-4)).count())
    assert bad == 0


def test_rolling_median_first_row_is_value(spark):
    """Frame of one row (each user's first event) → median == value."""
    e = load_table(spark, SF_SMOKE, "events")
    first = (e.withColumn(
        "rn", F.expr("row_number() OVER (PARTITION BY user_id "
                     "ORDER BY ts, event_id)"))
        .where(F.col("rn") == 1).select("event_id", F.round("value", 4)
                                        .alias("expect")))
    med = q_rolling_median(spark, SF_SMOKE)
    bad = (first.join(med, "event_id")
           .where(F.col("expect") != F.col("med7")).count())
    assert bad == 0


def test_mmr_rerank_diversifies(spark):
    """MMR properties at smoke scale: rank-1 equals the relevance
    argmax, the three picks are distinct, and the selected set is
    never LESS diverse (higher avg pairwise cosine) than the plain
    relevance top-3."""
    from pyspark.sql import functions as F

    from challenge8_movies_etl_spark.operators.similarity import dot_col
    from challenge8_movies_etl_spark.queries_llm import _norm
    from challenge8_movies_etl_spark.queries_search import q_mmr_rerank
    from challenge8_movies_etl_spark.sources.fixtures import load_table

    out = q_mmr_rerank(spark, SF_SMOKE).collect()
    assert len(out) == 12  # 4 probes x 3 ranks
    by_probe = {}
    for r in out:
        by_probe.setdefault(r.probe_id, []).append(r)

    e = load_table(spark, SF_SMOKE, "embeddings")
    n = e.select("vec_id", "embedding",
                 _norm(F.col("embedding")).alias("nrm"))
    emb = {r.vec_id: (r.embedding, r.nrm) for r in n.collect()}

    def cos(i, j):
        (ea, na), (eb, nb) = emb[i], emb[j]
        d = sum(float(x) * float(y) for x, y in zip(ea, eb))
        return d / (na * nb) ** 0.5

    for pid, rs in by_probe.items():
        rs.sort(key=lambda r: r.rk)
        ids = [r.vec_id for r in rs]
        assert len(set(ids)) == 3
        rels = sorted(((cos(pid, v), -v) for v in emb if v != pid),
                      reverse=True)
        top3 = [-v for _, v in rels[:3]]
        # rank 1 is the pure-relevance argmax
        assert ids[0] == top3[0]

        def avg_pairwise(s):
            ps = [cos(a, b) for i, a in enumerate(s) for b in s[i + 1:]]
            return sum(ps) / len(ps)

        assert avg_pairwise(ids) <= avg_pairwise(top3) + 1e-9


def test_inverted_index_matches_python_twin(spark):
    """df/cf and the doc-ordered postings head must equal a python
    recount; postings are capped at 10 and strictly doc-ordered."""
    from collections import Counter

    from challenge8_movies_etl_spark.queries_search import (
        q_inverted_index)
    from challenge8_movies_etl_spark.sources.fixtures import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents") \
        .select("doc_id", "text").collect()
    tf = Counter()
    for r in docs:
        for w in r["text"].split(" "):
            if w not in ("the", "a"):
                tf[(w, r["doc_id"])] += 1
    terms = {}
    for (w, d), c in tf.items():
        terms.setdefault(w, []).append((d, c))
    rows = q_inverted_index(spark, SF_SMOKE).collect()
    assert [r["term"] for r in rows] == sorted(terms)
    for r in rows:
        post = sorted(terms[r["term"]])
        assert r["df"] == len(post)
        assert r["cf"] == sum(c for _, c in post)
        head = ",".join(f"{d}:{c}" for d, c in post[:10])
        assert r["postings_head"] == head


def test_snippet_window_picks_densest_earliest(spark):
    """The snippet must be the earliest max-hit window and contain a
    query term; win_hits <= total_hits; snippet length <= window."""
    from challenge8_movies_etl_spark.queries_search import (
        _SNIP_W, q_snippet_extract)
    from tests.conftest import SF_SMOKE

    rows = q_snippet_extract(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        toks = r["snippet"].split(" ")
        assert len(toks) <= _SNIP_W
        assert r["win_hits"] <= r["total_hits"]
        assert r["win_hits"] >= 1
        assert sum(t in ("fast", "slow", "spark") for t in toks) \
            == r["win_hits"]
