"""Distributed covariance / PCA: the partition-partial 100 TB path must
agree with the decimal-exact oracle-checked path, and the
eigendecomposition must satisfy the spectral identities."""

from __future__ import annotations

import numpy as np

from challenge8_movies_etl_spark.operators.linalg import (
    covariance_exact,
    covariance_partials,
    pca_eig,
)
from challenge8_movies_etl_spark.sources.fixtures import load_table
from tests.conftest import SF_SMOKE


def _full_cov(spark):
    X = np.asarray(
        [r["embedding"] for r in
         load_table(spark, SF_SMOKE, "embeddings").collect()],
        dtype=np.float64)
    return X, np.cov(X, rowvar=False, bias=True)


def test_partials_match_exact_and_numpy(spark):
    e = load_table(spark, SF_SMOKE, "embeddings")
    X, ref = _full_cov(spark)

    part = covariance_partials(e)
    assert np.allclose(part, ref, atol=1e-9)

    exact = {(r["i"], r["j"]): r["cov"]
             for r in covariance_exact(e).collect()}
    assert len(exact) == 64 * 65 // 2
    for (i, j), c in list(exact.items())[:500]:
        assert abs(c - ref[i - 1, j - 1]) < 5e-7, (i, j)


def test_partials_partitioning_invariance(spark):
    e = load_table(spark, SF_SMOKE, "embeddings")
    c1 = covariance_partials(e.repartition(1))
    c2 = covariance_partials(e.repartition(13))
    assert np.allclose(c1, c2, atol=1e-9)


def test_pca_spectral_identities(spark):
    e = load_table(spark, SF_SMOKE, "embeddings")
    cov = covariance_partials(e)
    w, v = pca_eig(cov, k=64)
    # PSD spectrum, descending order
    assert (w > -1e-9).all()
    assert (np.diff(w) <= 1e-12).all()
    # trace identity and orthonormal eigenvectors
    assert abs(w.sum() - np.trace(cov)) < 1e-8
    assert np.allclose(v.T @ v, np.eye(64), atol=1e-9)
    # reconstruction: V diag(w) V^T == cov
    assert np.allclose((v * w) @ v.T, cov, atol=1e-8)
    # agrees with numpy PCA of the raw corpus
    _, ref = _full_cov(spark)
    w_ref = np.sort(np.linalg.eigvalsh(ref))[::-1]
    assert np.allclose(w[:8], w_ref[:8], atol=1e-8)
