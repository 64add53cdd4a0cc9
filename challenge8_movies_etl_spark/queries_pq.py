"""Product-quantization queries (round 5) — the vector-index
compression rung of the similarity ladder: q_similarity_topk (exact)
→ q_embed_lsh (data-independent buckets) → q_similarity_ann (IVF
cells) → HERE (PQ codes + asymmetric distance). See operators/pq.py
for the engine-portability design.

Execution note: encode runs as a vectorized Arrow mapInPandas kernel
(a declared python surface). A pure-expression form was tried first
and is what the ORACLE still runs — but its 1024-term tree exceeds
janino's 64 KB method limit, so Spark silently fell back to
interpreted (non-codegen) evaluation: correct, but the slow path the
anti-pattern audit exists to catch. The numpy kernel accumulates in
the exact order of the oracle's left-associated sums, so the two
paths stay value-hash-identical.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators import pq
from .registry import query
from .sources.fixtures import load_table


def _encoded(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", "embedding").mapInPandas(
        pq.encode_batches, schema=pq.ENCODE_SCHEMA)


@query("q_pq_encode", oracle=pq.encode_sql(pq.DUCK))
def q_pq_encode(spark, sf_dir):
    """PQ encode: 64-d float32 → 8 nibble codes (4 bytes, a 64×
    storage cut) + total quantization error. Spark side: Arrow-batched
    numpy kernel (order-pinned accumulation); oracle side: the same
    arithmetic as one generated DuckDB expression — codes, argmin
    ties, and qerr are value-hash-checked across the two paradigms.

    Scale: zero shuffle, one pass; at 100 TB the codes are written
    once as 8 tiny int columns and every later ADC scan prunes the
    raw vector column away."""
    return _encoded(spark, sf_dir).select(
        "vec_id", "c0", "c1", "c2", "c3", "c4", "c5", "c6", "c7",
        F.round("qerr", 6).alias("qerr"))


@query("q_pq_ann", oracle=pq.adc_topk_sql(pq.DUCK))
def q_pq_ann(spark, sf_dir):
    """PQ asymmetric-distance top-10 for a fixed probe: one 8×16 LUT
    (python-float literals, identical on both engines), distance =
    Σ_m LUT[m][code_m], deterministic (adc, vec_id) ranking.

    Scale: after encode the ranking reads ONLY the code columns; the
    LUT lookup is an element_at on a 16-literal array (small codegen
    tree) and the top-10 is TakeOrderedAndProject (per-partition
    top-k, k-row driver merge) — the PQ serving path. Composes with
    IVF (q_similarity_ann) as IVF-PQ: probe the nearest cells, ADC
    within."""
    enc = _encoded(spark, sf_dir)
    adc = None
    for m in range(pq.M_SUBSPACES):
        lut = F.array(*[F.lit(v) for v in pq.LUT[m]])
        term = F.element_at(lut, F.col(f"c{m}") + 1)
        adc = term if adc is None else adc + term
    return (enc.select("vec_id", "c0", "c1", "c2", "c3", "c4", "c5",
                       "c6", "c7", F.round(adc, 6).alias("adc"))
            .orderBy("adc", "vec_id").limit(10))


@query("q_pq_recall", oracle=pq.recall_sql(pq.DUCK))
def q_pq_recall(spark, sf_dir):
    """In-engine ANN-quality eval: recall@10 of the PQ-ADC ranking
    against the exact squared-L2 top-10 for the same probe — the
    quality/compression trade measured where the index lives, not in
    an offline notebook. Both rankings are deterministic (tie-break
    vec_id), so the recall itself is value-hash-checked.

    Scale: the exact arm is one 64-term codegen projection +
    TakeOrderedAndProject; the PQ arm reads code columns only; the
    overlap join is 10x10. At 100 TB the exact arm runs on a sampled
    slice — the pattern stays."""
    load_table(spark, sf_dir, "embeddings") \
        .createOrReplaceTempView("embeddings")
    exact = spark.sql(f"""
        SELECT vec_id FROM (
          SELECT vec_id, {pq.exact_dist_expr(pq.SPARK)} AS dist
          FROM embeddings
        ) ORDER BY dist, vec_id LIMIT 10""")
    pq_top = q_pq_ann(spark, sf_dir).select("vec_id")
    return (exact.join(pq_top, "vec_id")
            .agg(F.lit(10).cast("int").alias("k"),
                 F.count("*").alias("n_overlap"),
                 F.round(F.count("*") / 10.0, 4).alias("recall")))


@query("q_ivfpq_ann", oracle=pq.ivfpq_topk_sql(pq.DUCK))
def q_ivfpq_ann(spark, sf_dir):
    """IVF-PQ — the composition the serving stack actually deploys
    (Jégou'11 §IV): nearest-of-8 md5-derived coarse cells bound the
    candidate set (the probe visits its 2 nearest cells only), and PQ
    codes of the RESIDUAL v − C_cell rank candidates by per-cell
    asymmetric distance. Everything — cell argmin, residual codes,
    LUTs — is deterministic and value-hash-checked against a
    generated-SQL oracle that recomputes the identical arithmetic.

    Scale: the scan prunes to (cell, code) columns; the cell filter is
    partition-prunable when the index is written partitioned by cell
    (the layout a 100 TB deployment uses); candidates ≈ N·(n_probe /
    n_cells), never all vectors; ranking is TakeOrderedAndProject."""
    e = load_table(spark, sf_dir, "embeddings")
    enc = e.select("vec_id", "embedding").mapInPandas(
        pq.ivfpq_encode_batches, schema=pq.IVFPQ_SCHEMA)
    cand = enc.filter(F.col("cell").isin(*pq.PROBE_CELLS))
    adc = None
    for j in pq.PROBE_CELLS:
        per_m = None
        for m in range(pq.M_SUBSPACES):
            lut = F.array(*[F.lit(v) for v in pq.RESIDUAL_LUT[j][m]])
            term = F.element_at(lut, F.col(f"c{m}") + 1)
            per_m = term if per_m is None else per_m + term
        branch = F.when(F.col("cell") == j, per_m)
        adc = branch if adc is None else adc.otherwise(
            F.when(F.col("cell") == j, per_m))
    return (cand.select("vec_id", "cell", F.round(adc, 6).alias("adc"))
            .orderBy("adc", "vec_id").limit(10))
