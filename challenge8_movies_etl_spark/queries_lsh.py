"""Random-hyperplane (SimHash-for-embeddings) LSH — the missing rung
of the vector-similarity ladder: q_similarity_topk/filtered/batch are
exact single/multi-probe; q_similarity_ann is IVF (data-dependent
coarse cells); THIS is data-independent signed-projection LSH, the
standard cosine-LSH of Charikar'02 — 24 signed-hyperplane bits in 4
bands of 6, band-equality bucket join for candidates, exact cosine
re-verification. Unlike IVF it needs no training pass and its
collision probability has the closed form P(bit agrees) = 1 - θ/π.

Hyperplane components are ±1 derived from md5("lsh:j:i") parity, so
the SAME hyperplanes exist on both engines (Spark bakes them as
literals computed with hashlib; the DuckDB oracle derives them in SQL
from the same strings) and the whole pipeline — signatures, bands,
candidate set, verified pairs — is value-hash-checked, not just
rows-counted.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from .operators.similarity import DEC_SIM as DEC
from .operators.similarity import dot_col
from .registry import query
from .sources.fixtures import load_table

_N_BITS, _BAND_BITS = 24, 6
_N_BANDS = _N_BITS // _BAND_BITS
_TAU = 0.35


def _sign(j: int, i: int) -> int:
    """±1 from md5 parity — MUST match the oracle's SQL derivation."""
    h = hashlib.md5(f"lsh:{j}:{i}".encode()).hexdigest()
    return 2 * (int(h[:4], 16) % 2) - 1


_SIGNS = [[_sign(j, i) for i in range(1, 65)] for j in range(_N_BITS)]

_POW = "CASE j % 6 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 " \
       "WHEN 3 THEN 8 WHEN 4 THEN 16 ELSE 32 END"

_LSH_ORACLE = f"""
WITH params AS (
  SELECT pj.j, pi.i,
         2 * (cast(('0x' || substr(md5('lsh:' || pj.j || ':' || pi.i),
                                   1, 4)) as bigint) % 2) - 1 AS s
  FROM range(0, {_N_BITS}) pj(j) CROSS JOIN range(1, 65) pi(i)
),
bits AS (
  SELECT e.vec_id, p.j,
         CASE WHEN sum(cast(cast(e.embedding[p.i] as double) * p.s
                            as {DEC})) >= 0 THEN 1 ELSE 0 END AS bit
  FROM embeddings e CROSS JOIN params p
  GROUP BY e.vec_id, p.j
),
bands AS (
  SELECT vec_id, j // {_BAND_BITS} AS band,
         cast(sum(bit * ({_POW})) as bigint) AS bval
  FROM bits GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id
),
norms2 AS (
  SELECT vec_id, embedding,
         cast(sum(cast(cast(embedding[gs.i] as double)
                       * cast(embedding[gs.i] as double)
                       as {DEC})) as double) AS nrm
  FROM embeddings, range(1, 65) gs(i)
  GROUP BY vec_id, embedding
),
ver AS (
  SELECT c.va, c.vb,
         cast(sum(cast(cast(na.embedding[g.i] as double)
                       * cast(nb.embedding[g.i] as double)
                       as {DEC})) as double)
           / sqrt(max(na.nrm) * max(nb.nrm)) AS cos
  FROM cand c
  JOIN norms2 na ON na.vec_id = c.va
  JOIN norms2 nb ON nb.vec_id = c.vb,
       range(1, 65) g(i)
  GROUP BY c.va, c.vb
)
SELECT va, vb, round(cos, 4) AS cos
FROM ver WHERE round(cos, 4) >= {_TAU}
ORDER BY cos DESC, va, vb
LIMIT 20
"""


@query("q_embed_lsh", oracle=_LSH_ORACLE)
def q_embed_lsh(spark, sf_dir):
    """Cosine-LSH near-dup candidates over the WHOLE corpus (no label
    blocking): 24 random-hyperplane sign bits → 4 bands of 6 → bucket
    equi-join → exact cosine verification → top-20 verified pairs at
    tau=0.35. Every stage is deterministic and oracle-checked — the
    signatures because the hyperplanes are md5-derived on both
    engines, the candidate set because band values are exact decimal
    sign sums, the verification because cosine follows the DEC_SIM
    discipline.

    Scale: signatures are per-row codegen (24 fused array folds, no
    shuffle); candidates shuffle on (band, bval) — at 100 TB a hot
    bucket means the bits are too few for the corpus density: raise
    _N_BITS/_BAND_BITS (collision rate halves per extra band bit),
    the same tuning dial as MinHash-LSH's (b, r) in
    operators/dedup.py; verification touches only candidates. The
    recall trade-off is closed-form (1-(1-p^r)^b) and the miss
    property is tested in tests/test_eval_ops.py."""
    e = load_table(spark, sf_dir, "embeddings")

    def bit(j: int):
        signs = F.array(*[F.lit(s) for s in _SIGNS[j]])
        proj = F.aggregate(
            F.zip_with("embedding", signs,
                       lambda x, s: x.cast("double") * s.cast("double")),
            F.lit(0).cast(DEC),
            lambda acc, v: (acc + v.cast(DEC)).cast(DEC))
        return (proj >= 0).cast("bigint")

    bands = e.select(
        "vec_id", "embedding",
        *[sum((bit(k * _BAND_BITS + b) * (1 << b))
              for b in range(_BAND_BITS)).alias(f"band{k}")
          for k in range(_N_BANDS)])
    n = bands.withColumn("nrm", dot_col(F.col("embedding"),
                                        F.col("embedding")))
    cand = None
    for k in range(_N_BANDS):
        a = n.select(F.col("vec_id").alias("va"),
                     F.col(f"band{k}").alias("bv"))
        b = n.select(F.col("vec_id").alias("vb"),
                     F.col(f"band{k}").alias("bv"))
        c = (a.join(b, "bv").filter(F.col("va") < F.col("vb"))
             .select("va", "vb"))
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.distinct()
    na = n.select(F.col("vec_id").alias("va"),
                  F.col("embedding").alias("ea"), F.col("nrm").alias("nna"))
    nb = n.select(F.col("vec_id").alias("vb"),
                  F.col("embedding").alias("eb"), F.col("nrm").alias("nnb"))
    ver = (cand.join(na, "va").join(nb, "vb")
           .select("va", "vb",
                   F.round(dot_col(F.col("ea"), F.col("eb"))
                           / F.sqrt(F.col("nna") * F.col("nnb")), 4)
                   .alias("cos")))
    return (ver.filter(F.col("cos") >= _TAU)
            .orderBy(F.desc("cos"), "va", "vb").limit(20))
