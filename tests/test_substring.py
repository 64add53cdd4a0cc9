"""Exact-substring dedup (queries_substring.py): the Spark pipeline is
pinned against an independent pure-python recompute of the Lee-et-al
semantics (cross-doc duplicated K-gram -> interval-union coverage) on
the smoke fixture, plus a synthetic injection that checks overlap
merging is exact (no double counting)."""

from __future__ import annotations

from collections import defaultdict

import pandas as pd

from challenge8_movies_etl_spark.queries_substring import (
    K, _MAX_DF, q_dedup_substring, q_dedup_substring_pairs)
from tests.conftest import SF_SMOKE


def _python_twin(texts: dict[int, list[str]]):
    """Per-doc (n_tokens, dup_spans, dup_tokens) + pair shared-gram
    counts, computed with sets — no SQL, no Spark."""
    where = defaultdict(list)          # gram -> [(doc, pos)]
    for doc, toks in texts.items():
        for p in range(len(toks) - K + 1):
            where[" ".join(toks[p:p + K])].append((doc, p))
    stats, pair_counts = {}, defaultdict(int)
    dup_pos = defaultdict(list)
    for g, occ in where.items():
        docs = sorted({d for d, _ in occ})
        if len(docs) >= 2:
            for d, p in occ:
                dup_pos[d].append(p)
        if 2 <= len(docs) <= _MAX_DF:
            for i in range(len(docs)):
                for j in range(i + 1, len(docs)):
                    pair_counts[(docs[i], docs[j])] += 1
    for d, ps in dup_pos.items():
        covered = set()
        for p in ps:
            covered.update(range(p, p + K))
        spans, prev = 0, None
        for t in sorted(covered):
            if prev is None or t != prev + 1:
                spans += 1
            prev = t
        stats[d] = (len(texts[d]), spans, len(covered))
    return stats, pair_counts


def _fixture_texts():
    pdf = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    return {int(r.doc_id): r.text.split(" ") for r in pdf.itertuples()
            if len(r.text.split(" ")) >= K}


def test_substring_coverage_matches_python_twin(spark):
    texts = _fixture_texts()
    stats, _ = _python_twin(texts)
    expect = sorted(((d, *v) for d, v in stats.items()),
                    key=lambda r: (-r[3], r[0]))[:20]
    got = [(r.doc_id, r.n_tokens, r.dup_spans, r.dup_tokens)
           for r in q_dedup_substring(spark, SF_SMOKE).collect()]
    assert got == expect
    assert len(got) > 0, "smoke fixture should contain some duplication"


def test_substring_pairs_match_python_twin(spark):
    texts = _fixture_texts()
    _, pair_counts = _python_twin(texts)
    expect = sorted(((a, b, c) for (a, b), c in pair_counts.items()),
                    key=lambda r: (-r[2], r[0], r[1]))[:20]
    got = [(r.doc_a, r.doc_b, r.shared_grams)
           for r in q_dedup_substring_pairs(spark, SF_SMOKE).collect()]
    assert got == expect


def test_interval_union_is_exact_on_overlap():
    """Two docs sharing a 12-token run => duplicated K-grams at 5
    consecutive positions, which must merge to ONE span of exactly 12
    tokens (a naive per-gram sum would report 5*K=40)."""
    run = [f"r{i}" for i in range(12)]
    a = [f"a{i}" for i in range(10)] + run + [f"z{i}" for i in range(10)]
    b = run + [f"b{i}" for i in range(20)]
    stats, pairs = _python_twin({1: a, 2: b})
    assert stats[1] == (32, 1, 12)
    assert stats[2] == (32, 1, 12)
    assert pairs[(1, 2)] == 12 - K + 1
