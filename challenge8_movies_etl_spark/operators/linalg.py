"""Distributed linear algebra over embedding columns: exact covariance
(the hash-checkable path) and partition-partial covariance (the 100 TB
path), plus the dim-bounded PCA eigendecomposition on top.

Two covariance strategies, one semantics:

- ``covariance_exact``: posexplode to (vec_id, i, v), per-vector
  self-join on vec_id (64×64 fan-out per row), decimal-exact sums per
  (i, j) — order-independent, so the DuckDB oracle value-hash matches
  bit-for-bit (functions/hashsafe.py discipline). Shuffle volume is
  N·d(d+1)/2 product rows: right at fixture scale, the wrong plan at
  100 TB.
- ``covariance_partials``: Arrow-batched mapInPandas computes one
  (n, Σx, ΣxxT) partial per PARTITION with numpy, the final combine
  sums #partitions·d² floats — the treeAggregate shape every
  distributed PCA uses (shuffle volume independent of N). float64
  reduction order varies with partitioning, so this path is verified
  by closeness-to-exact tests, not value hashes.

PCA: the d×d covariance is dim-bounded (64×64 here), so the
eigendecomposition is a driver-side scalar step — same license as the
n_nodes count in operators/graph.py — while everything N-sized stays
distributed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC_COV = "decimal(30,12)"


def coordinates(embs: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """(id, i, v) rows with 1-based coordinate index, v as double."""
    return embs.select(
        F.col(id_col),
        (F.posexplode(vec_col)).alias("i0", "v32"),
    ).select(F.col(id_col), (F.col("i0") + 1).alias("i"),
             F.col("v32").cast("double").alias("v"))


def covariance_exact(embs: DataFrame, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Upper-triangle population covariance (i <= j) with decimal-exact
    reductions: cov = (Σ v_i·v_j − Σv_i·Σv_j/n)/n, every Σ an
    order-independent decimal sum, the final arithmetic scalar double
    ops on exact inputs, rounded 6dp. The trailing `+ 0.0` normalizes
    IEEE -0.0 to +0.0 (a covariance cell that rounds to zero carries
    an engine-dependent sign bit; DuckDB emitted -0.0 where Spark
    emitted 0.0 at sf0.01 cell (6,10) — driver r4 hash-fail).
    Returns (i, j, cov)."""
    x = coordinates(embs, id_col, vec_col).persist()
    n_rel = embs.select(F.count("*").alias("_n"))
    s = (x.groupBy("i")
         .agg(F.sum(F.col("v").cast(DEC_COV)).alias("si")))
    a, b = x.alias("xa"), x.alias("xb")
    p = (a.join(b, (F.col(f"xa.{id_col}") == F.col(f"xb.{id_col}"))
                & (F.col("xa.i") <= F.col("xb.i")))
         .groupBy(F.col("xa.i").alias("i"), F.col("xb.i").alias("j"))
         .agg(F.sum((F.col("xa.v") * F.col("xb.v")).cast(DEC_COV))
              .alias("sij")))
    sa = s.select(F.col("i").alias("_ia"), F.col("si").alias("_sa"))
    sb = s.select(F.col("i").alias("_ib"), F.col("si").alias("_sb"))
    return (p.join(F.broadcast(sa), p.i == sa._ia)
            .join(F.broadcast(sb), p.j == sb._ib)
            .crossJoin(F.broadcast(n_rel))
            .select(
                "i", "j",
                (F.round((F.col("sij").cast("double")
                          - F.col("_sa").cast("double")
                          * F.col("_sb").cast("double") / F.col("_n"))
                         / F.col("_n"), 6)
                 + F.lit(0.0)).alias("cov")))


def covariance_partials(embs: DataFrame, vec_col: str = "embedding",
                        dim: int = 64) -> np.ndarray:
    """100 TB covariance: one (n, Σx, ΣxxT) float64 partial per Arrow
    batch, combined with a single d²-wide sum — shuffle volume is
    O(partitions·d²), independent of row count. Returns the d×d
    population covariance as a numpy array (dim-bounded driver object,
    like the PCA eigendecomposition it feeds)."""
    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if len(X) == 0:
                continue
            yield pd.DataFrame({
                "n": [len(X)],
                "sx": [X.sum(axis=0).tolist()],
                "sxx": [(X.T @ X).ravel().tolist()],
            })

    rows = embs.select(vec_col).mapInPandas(
        partials,
        schema="n bigint, sx array<double>, sxx array<double>").collect()
    n = sum(r["n"] for r in rows)
    sx = np.sum([r["sx"] for r in rows], axis=0)
    sxx = np.sum([np.asarray(r["sxx"]).reshape(dim, dim) for r in rows],
                 axis=0)
    return (sxx - np.outer(sx, sx) / n) / n


def pca_eig(cov: np.ndarray, k: int = 8) -> tuple[np.ndarray, np.ndarray]:
    """Top-k eigenpairs of a symmetric covariance (descending).
    Driver-side: the input is d×d, never N-sized."""
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    return w[order], v[:, order]
