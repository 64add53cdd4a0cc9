"""Distributed NMF (queries_nmf.py) vs an independent numpy
implementation of the same quantized multiplicative updates, plus the
monotone-objective property of Lee-Seung updates."""

from __future__ import annotations

import numpy as np
import pandas as pd

from challenge8_movies_etl_spark.queries_nmf import (
    _NMF_ITERS, _NMF_K, q_topic_nmf)
from tests.conftest import SF_SMOKE


def _load_v():
    pdf = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    docs = sorted(pdf.doc_id)
    counts = {}
    vocab = set()
    for r in pdf.itertuples():
        c = {}
        for t in r.text.split(" "):
            c[t] = c.get(t, 0) + 1
        counts[int(r.doc_id)] = c
        vocab |= set(c)
    terms = sorted(vocab)
    V = np.zeros((len(docs), len(terms)))
    for i, d in enumerate(docs):
        for j, t in enumerate(terms):
            V[i, j] = counts[d].get(t, 0)
    return np.array(docs), terms, V


def _numpy_nmf(docs, terms, V):
    k = _NMF_K
    W = np.array([[1 + ((d * 31 + c * 17) % 7) / 10.0
                   for c in range(k)] for d in docs])
    H = np.array([[1 + ((ord(t[0]) * 13 + c * 29) % 5) / 10.0
                   for t in terms] for c in range(k)])
    for _ in range(_NMF_ITERS):
        wtw = np.round(W.T @ W, 8)
        H = np.round(H * (W.T @ V) / (wtw @ H), 8)
        hht = np.round(H @ H.T, 8)
        W = np.round(W * (V @ H.T) / (W @ hht), 8)
    return W, H


def test_nmf_matches_numpy_twin(spark):
    docs, terms, V = _load_v()
    W, H = _numpy_nmf(docs, terms, V)
    rows = q_topic_nmf(spark, SF_SMOKE).collect()
    assert len(rows) == 2 * 8
    for c in range(_NMF_K):
        order = sorted(range(len(terms)),
                       key=lambda j: (-H[c, j], terms[j]))[:8]
        got = [(r.term, r.weight) for r in rows if r.component == c]
        assert [t for t, _ in got] == [terms[j] for j in order]
        for (_, gw), j in zip(got, order):
            assert abs(gw - round(H[c, j], 6)) < 2e-6
        mass = {r.doc_mass for r in rows if r.component == c}
        assert len(mass) == 1
        assert abs(mass.pop() - round(float(W[:, c].sum()), 6)) < 2e-5
    # the two components must extract different top terms overall
    tops = [tuple(r.term for r in rows if r.component == c)
            for c in range(_NMF_K)]
    assert tops[0] != tops[1]


def test_nmf_updates_decrease_frobenius_objective():
    """Lee-Seung multiplicative updates are non-increasing in
    ||V - WH||_F — the 8dp quantization must not break monotonicity
    on the fixture (guards against sign/transpose slips)."""
    docs, terms, V = _load_v()
    k = _NMF_K
    W = np.array([[1 + ((d * 31 + c * 17) % 7) / 10.0
                   for c in range(k)] for d in docs])
    H = np.array([[1 + ((ord(t[0]) * 13 + c * 29) % 5) / 10.0
                   for t in terms] for c in range(k)])
    errs = [np.linalg.norm(V - W @ H)]
    for _ in range(4):
        H = np.round(H * (W.T @ V) / (np.round(W.T @ W, 8) @ H), 8)
        W = np.round(W * (V @ H.T) / (W @ np.round(H @ H.T, 8)), 8)
        errs.append(np.linalg.norm(V - W @ H))
    assert all(b <= a + 1e-6 for a, b in zip(errs, errs[1:])), errs
