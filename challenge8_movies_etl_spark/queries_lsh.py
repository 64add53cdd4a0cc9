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


# ---------------------------------------------------------------------------
# q_minhash_band_tuning — choose (bands, rows) for a MinHash-LSH deploy
# ---------------------------------------------------------------------------

_BT_CONFIGS = [(8, 16), (16, 8), (32, 4), (64, 2)]  # b x r = 128


def _p_candidate(b: int, r: int, s: float) -> float:
    """S-curve P(candidate) = 1 - (1 - s^r)^b, rounded to 6dp. Both
    engines consume these PYTHON-precomputed constants as literals —
    the grid is 4 configs x 10 similarity deciles, so no pow() ever
    runs inside either engine and there is zero cross-engine float
    risk."""
    return round(1.0 - (1.0 - s ** r) ** b, 6)


_BT_GRID = [(b, r, bk, _p_candidate(b, r, (bk + 0.5) / 10))
            for b, r in _BT_CONFIGS for bk in range(10)]

_BT_GRID_SQL = "VALUES " + ", ".join(
    f"({b}, {r}, {bk}, {p!r})" for b, r, bk, p in _BT_GRID)


@query(
    "q_minhash_band_tuning",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents WHERE text != ''
    ),
    sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS da, count(*) AS i
      FROM tok a JOIN tok b
        ON a.term = b.term AND b.doc_id = a.doc_id + 1
      GROUP BY 1
    ),
    pairs AS (
      SELECT sa.doc_id AS da,
             coalesce(i.i, 0) AS i,
             sa.n + sb.n - coalesce(i.i, 0) AS u
      FROM sz sa JOIN sz sb ON sb.doc_id = sa.doc_id + 1
      LEFT JOIN inter i ON i.da = sa.doc_id
    ),
    hist AS (
      SELECT least(9, (10 * i) // u) AS bk, count(*) AS cnt
      FROM pairs GROUP BY 1
    ),
    grid(b, r, bk, p) AS ({_BT_GRID_SQL})
    SELECT g.b AS bands, g.r AS rows_per_band,
           cast(round(sum(cast(h.cnt as decimal(28,6))
                          * cast(g.p as decimal(10,6))), 4) as double)
             + 0.0 AS exp_candidates,
           cast(round(sum(CASE WHEN g.bk < 8
                     THEN cast(h.cnt as decimal(28,6))
                          * cast(g.p as decimal(10,6))
                     ELSE 0 END), 4) as double) + 0.0 AS exp_fp,
           cast(round(sum(CASE WHEN g.bk >= 8
                     THEN cast(h.cnt as decimal(28,6))
                          * (1 - cast(g.p as decimal(10,6)))
                     ELSE 0 END), 4) as double) + 0.0 AS exp_fn,
           cast(sum(CASE WHEN g.bk >= 8 THEN h.cnt ELSE 0 END)
                as bigint) AS n_true_pairs
    FROM grid g JOIN hist h ON g.bk = h.bk
    GROUP BY g.b, g.r ORDER BY g.b
    """,
)
def q_minhash_band_tuning(spark, sf_dir):
    """MinHash-LSH banding tuner — the decision an operator makes
    BEFORE spending a 100 TB dedup pass: with a 128-row signature,
    which (bands x rows) factorization best matches the 0.8 Jaccard
    target? The corpus supplies the evidence: exact token-set
    Jaccards of adjacent-id document pairs (a deterministic linear
    probe that includes the injected duplicate pairs), bucketed into
    similarity deciles by INTEGER arithmetic (10·|∩| // |∪|); the
    S-curve P(candidate) = 1-(1-s^r)^b is evaluated in Python on the
    decile midpoints and shipped to BOTH engines as the same 40
    rounded literals, so no engine ever runs pow(). Per config the
    report gives expected candidate volume, expected false positives
    (candidates below the 0.8 decile), expected false negatives
    (missed true pairs), and the true-pair mass — read it as: small b
    = cheap but leaky, large b = tight recall but candidate-heavy.

    Scale: the probe is one self-join on (term, id+1) — linear in
    corpus size, never all-pairs; the histogram is 10 rows and the
    tuning join is 40 x 10 literals. The decision this emits is what
    bounds the REAL minhash pass (q_dedup_minhash) at scale."""
    d = load_table(spark, sf_dir, "documents")
    tok = (d.filter(F.col("text") != "")
           .select("doc_id", F.explode(F.split("text", " "))
                   .alias("term"))
           .distinct())
    sz = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (tok.alias("a")
             .join(tok.alias("b"),
                   (F.col("a.term") == F.col("b.term"))
                   & (F.col("b.doc_id") == F.col("a.doc_id") + 1))
             .groupBy(F.col("a.doc_id").alias("da"))
             .agg(F.count("*").alias("i")))
    pairs = (sz.alias("sa")
             .join(sz.alias("sb"),
                   F.col("sb.doc_id") == F.col("sa.doc_id") + 1)
             .join(inter, F.col("da") == F.col("sa.doc_id"), "left")
             .select(F.coalesce("i", F.lit(0)).alias("i"),
                     (F.col("sa.n") + F.col("sb.n")
                      - F.coalesce("i", F.lit(0))).alias("u")))
    hist = (pairs.groupBy(F.least(F.lit(9), (10 * F.col("i"))
                                  .cast("bigint") / F.col("u"))
                          .cast("bigint").alias("bk"))
            .agg(F.count("*").alias("cnt")))
    grid = spark.createDataFrame(
        _BT_GRID, "b int, r int, bk bigint, p double")
    pd = F.col("p").cast("decimal(10,6)")
    cnt = F.col("cnt").cast("decimal(28,6)")
    return (F.broadcast(grid).join(hist, "bk")
            .groupBy(F.col("b").alias("bands"),
                     F.col("r").alias("rows_per_band"))
            .agg((F.round(F.sum(cnt * pd), 4).cast("double") + 0.0)
                 .alias("exp_candidates"),
                 (F.round(F.sum(F.when(F.col("bk") < 8, cnt * pd)
                                .otherwise(F.lit(0)
                                           .cast("decimal(28,6)"))), 4)
                  .cast("double") + 0.0).alias("exp_fp"),
                 (F.round(F.sum(F.when(F.col("bk") >= 8,
                                       cnt * (1 - pd))
                                .otherwise(F.lit(0)
                                           .cast("decimal(28,6)"))), 4)
                  .cast("double") + 0.0).alias("exp_fn"),
                 F.sum(F.when(F.col("bk") >= 8, F.col("cnt"))
                       .otherwise(0)).cast("long").alias("n_true_pairs"))
            .orderBy("bands"))
