"""Similarity-search operators over embedding columns (array<float>).

No reference analog — mandated by the north star (BASELINE.json:6) as
LLM-data-pipeline capability; design informed by top-k similarity work
(PAPERS.md: EDBT'20 incremental top-k; ICDE'21 REPOSE distributed
top-k with local reference points).

Hash discipline: cosine is computed with exact decimal accumulation of
per-element double products (element-order reductions of floats differ
between engines otherwise), then one double division + sqrt — identical
bits on Spark and DuckDB, rounded to 4 dp at the edge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DIMS = 64  # fixture embedding dimensionality (FIXTURES.md)

# decimal(18,10): still exact and order-independent, but precision <= 18
# keeps both Spark and DuckDB on long-backed decimals (no BigDecimal
# allocation per element) — measured ~4x on pairwise-cosine queries.
# Headroom: 8 integer digits; 64-dim dots of unit-ish embeddings stay
# below 1e3. The wide money aggregates keep hashsafe.DEC (30,10).
DEC_SIM = "decimal(18,10)"


def _dec_sum(arr: Column) -> Column:
    """Exact, order-independent sum of an array<double> via decimal."""
    # re-cast after the add: Spark widens the decimal on addition, but
    # aggregate() requires the merge lambda to return the accumulator's
    # exact type
    return F.aggregate(
        arr, F.lit(0).cast(DEC_SIM),
        lambda acc, x: (acc + x.cast(DEC_SIM)).cast(DEC_SIM),
    ).cast("double")


def dot_col(a: Column, b: Column) -> Column:
    return _dec_sum(F.zip_with(a, b,
                               lambda x, y: x.cast("double") * y.cast("double")))


def cosine_col(a: Column, b: Column) -> Column:
    """cos(a, b) as an exact-reduction double (un-rounded)."""
    return dot_col(a, b) / F.sqrt(dot_col(a, a) * dot_col(b, b))


def cosine_sql(ea: str, eb: str, pair_src: str, pair_keys: str,
               dims: int = DIMS) -> str:
    """DuckDB twin: exact-decimal cosine for every row of ``pair_src``
    (a relation with embedding columns ``ea``/``eb``), keyed by
    ``pair_keys``. Expands dims via a static range join."""
    def dsum(x: str, y: str) -> str:
        return (f"cast(sum(cast(cast({x}[gs.i] as double) * "
                f"cast({y}[gs.i] as double) as {DEC_SIM})) as double)")
    return f"""
      SELECT {pair_keys},
             {dsum(ea, eb)} / sqrt({dsum(ea, ea)} * {dsum(eb, eb)}) AS cos_raw
      FROM {pair_src}, range(1, {dims + 1}) gs(i)
      GROUP BY {pair_keys}
    """


def brute_force_topk(embeddings: DataFrame, probe_id: int, k: int = 10) -> DataFrame:
    """Baseline exact top-k: broadcast the probe row against every
    vector. One scan, no shuffle except the final TakeOrderedAndProject
    — the right plan when there is ONE probe, at any corpus size.
    Returns (vec_id, cos) with deterministic (cos desc, vec_id) order.
    """
    # probe norm computed once in the 1-row broadcast side, not per
    # corpus row (halves the per-row decimal aggregation work)
    probe = (embeddings.filter(F.col("vec_id") == probe_id)
             .select(F.col("embedding").alias("probe_emb")))
    probe = probe.select("probe_emb",
                         dot_col(F.col("probe_emb"),
                                 F.col("probe_emb")).alias("probe_nrm"))
    scored = (embeddings.filter(F.col("vec_id") != probe_id)
              .join(F.broadcast(probe))
              .select(
                  "vec_id",
                  F.round(
                      dot_col(F.col("embedding"), F.col("probe_emb"))
                      / F.sqrt(dot_col(F.col("embedding"), F.col("embedding"))
                               * F.col("probe_nrm")), 4).alias("cos"),
              ))
    return scored.orderBy(F.col("cos").desc(), F.col("vec_id")).limit(k)


def ivf_knn_join(embeddings: DataFrame, k: int = 3, n_cells: int = 8,
                 n_assign: int = 2, label_col: str = "label") -> DataFrame:
    """IVF-cell-blocked kNN join — the 100 TB scale path for the
    pairwise-cosine family (q_knn_join / q_similarity_pairs /
    q_embed_neardup compute exact per-label all-pairs, which is
    O((N/|labels|)^2) and quadratic at corpus scale).

    Every vector is assigned to its ``n_assign`` nearest of ``n_cells``
    deterministic centroids (redundant assignment = multi-probe: two
    vectors are candidates iff they share ANY cell, which bounds recall
    loss at cell boundaries). Candidate pairs come from an equi-join on
    (cell, label) — per-cell quadratic only, never global. A real
    deployment sizes n_cells ~ sqrt(N) so each cell holds ~sqrt(N)
    vectors and total candidate work is ~N^1.5, and k-means the
    centroids; deterministic lowest-id centroids keep tests stable.

    Returns (vec_id, neighbor, cos) — top-k per vector among
    candidates; approximate, so registered rows-only with recall
    asserted against the exact join in tests.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import Window as W

    # Centroid assignment as a vectorized Arrow kernel (round 8): the
    # SQL formulations all lost — zip_with/aggregate lambdas run
    # interpreted (37 s at sf1.0), the codegen-unrolled dot_fast_col
    # projection still paid ~92 ns/term over N·n_cells pairs (34 s),
    # and ranking through a window shuffled n_cells× the corpus bytes
    # (35 s). Dense argmax-over-centroids is exactly the PQ
    # assignment shape (operators/pq.py), so: collect the ≤600
    # deterministic lowest-id centroids to the driver (metadata, the
    # planner's job), broadcast them into a mapInPandas, and
    # accumulate scores dimension-at-a-time in numpy — elementwise
    # ops in a FIXED dim order, no BLAS matmul, so results are
    # bit-reproducible across runs and partitionings. 180 M flops at
    # sf1.0 ≈ 0.3 s per pass. Tie-break on equal scores = lowest
    # cent_id (stable argsort over cent_id-ascending columns).
    import numpy as np
    cent_rows = (embeddings.orderBy("vec_id").limit(n_cells)
                 .select("vec_id", "embedding").collect())
    cent_ids = np.array([r["vec_id"] for r in cent_rows],
                        dtype=np.int64)
    cmat = np.array([r["embedding"] for r in cent_rows],
                    dtype=np.float64)            # (cells, D)
    cinv = np.empty(len(cmat))
    for ci in range(len(cmat)):                  # fixed-order norms
        acc = 0.0
        for d in range(cmat.shape[1]):
            acc += cmat[ci, d] * cmat[ci, d]
        cinv[ci] = 1.0 / acc ** 0.5

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
            n = len(x)
            scores = np.zeros((n, len(cmat)))
            for d in range(cmat.shape[1]):       # fixed dim order
                scores += x[:, d, None] * cmat[None, :, d]
            scores *= cinv[None, :]
            top = np.argsort(-scores, axis=1, kind="stable")[:, :n_assign]
            yield pd.DataFrame({
                "vec_id": np.repeat(pdf["vec_id"].to_numpy(), n_assign),
                "cell": cent_ids[top].ravel()})

    cells_of = embeddings.select("vec_id", "embedding").mapInPandas(
        assign, schema="vec_id bigint, cell bigint")
    assigned = cells_of.join(
        F.broadcast(embeddings.select("vec_id", label_col,
                                      "embedding")), "vec_id")
    # Two-phase candidate scoring (round 8 — the r7 q_knn_join fix
    # applied to the blocked form too): dot_col's zip_with lambda is
    # CodegenFallback and was running INTERPRETED on every candidate
    # pair (~1.3 M at sf1.0, measured as the dominant cost of the
    # whole blocked join). Phase 1 ranks candidates with the
    # whole-stage-codegen double cosine and keeps a top-(k+10)
    # superset per vector; phase 2 re-scores only the survivors with
    # the exact decimal reduction — values identical to the
    # all-decimal form short of sub-3e-9 rank ties at the superset
    # boundary (see dot_fast_col), which the continuous fixture
    # cannot produce; recall vs the exact join stays pinned in tests.
    n = assigned.withColumn("fnrm", dot_fast_col(F.col("embedding"),
                                                 F.col("embedding")))
    a, b = n.alias("a"), n.alias("b")
    fast = (dot_fast_col(F.col("a.embedding"), F.col("b.embedding"))
            / F.sqrt(F.col("a.fnrm") * F.col("b.fnrm")))
    # a pair sharing both assigned cells would appear twice -> max-dedup
    pairs = (a.join(b, (F.col("a.cell") == F.col("b.cell"))
                    & (F.col(f"a.{label_col}") == F.col(f"b.{label_col}"))
                    & (F.col("a.vec_id") < F.col("b.vec_id")))
             .select(F.col("a.vec_id").alias("va"),
                     F.col("b.vec_id").alias("vb"),
                     fast.alias("fast_cos"))
             .groupBy("va", "vb").agg(F.max("fast_cos").alias("fast_cos")))
    both = (pairs.select(F.col("va").alias("vec_id"),
                         F.col("vb").alias("neighbor"), "fast_cos")
            .unionByName(
                pairs.select(F.col("vb").alias("vec_id"),
                             F.col("va").alias("neighbor"), "fast_cos")))
    wf = W.partitionBy("vec_id").orderBy(F.col("fast_cos").desc(),
                                         "neighbor")
    cand = (both.withColumn("_rn", F.row_number().over(wf))
            .filter(F.col("_rn") <= k + 10)
            .select("vec_id", "neighbor"))
    # exact decimal norms once per VECTOR (N evals), not per survivor
    ex = embeddings.select(
        "vec_id", "embedding",
        dot_col(F.col("embedding"), F.col("embedding")).alias("_n"))
    va = ex.select("vec_id", F.col("embedding").alias("_ea"),
                   F.col("_n").alias("_na"))
    vb = ex.select(F.col("vec_id").alias("neighbor"),
                   F.col("embedding").alias("_eb"),
                   F.col("_n").alias("_nb"))
    exact = (cand.join(F.broadcast(va), "vec_id")
             .join(F.broadcast(vb), "neighbor")
             .select("vec_id", "neighbor",
                     (dot_col(F.col("_ea"), F.col("_eb"))
                      / F.sqrt(F.col("_na") * F.col("_nb")))
                     .alias("cos_raw")))
    wk = W.partitionBy("vec_id").orderBy(F.col("cos_raw").desc(), "neighbor")
    return (exact.withColumn("_rn", F.row_number().over(wk))
            .filter(F.col("_rn") <= k)
            .select("vec_id", "neighbor",
                    F.round("cos_raw", 4).alias("cos")))


def ivf_topk(embeddings: DataFrame, probe_id: int, k: int = 10,
             n_cells: int = 8, n_probe_cells: int = 2) -> DataFrame:
    """IVF-style approximate top-k — the 100 TB scale path.

    Coarse quantizer: the ``n_cells`` lowest-vec_id vectors act as
    deterministic centroids (a real deployment k-means them; determinism
    matters more here). Every vector is assigned to its nearest centroid
    (one broadcast join — embarrassingly parallel); the probe searches
    only its ``n_probe_cells`` nearest cells, cutting the scanned
    fraction to ~n_probe_cells/n_cells of the corpus. Same contract as
    brute_force_topk but approximate → registered rows-only.
    """
    # Per-vector self-norm ONCE (optimization round r11): cosine_col
    # per (vector, centroid) re-reduced BOTH self-norms for every pair
    # — 3 exact-decimal 64-dim folds x N x n_cells where one fold per
    # vector + one per centroid suffices. The division below keeps the
    # exact operand order of cosine_col (dot(a,b) / sqrt(n_a * n_b)),
    # so every double — and therefore every assignment, tie-break and
    # top-k cut — is bit-identical to the previous form (the
    # q_similarity_ann_check oracle replicates these values in SQL).
    ex = embeddings.select(
        "vec_id", "embedding",
        dot_col(F.col("embedding"), F.col("embedding")).alias("_n"))
    cents = (ex.orderBy("vec_id").limit(n_cells)
             .select(F.col("vec_id").alias("cent_id"),
                     F.col("embedding").alias("cent_emb"),
                     F.col("_n").alias("_cn")))
    # assign every vector to its nearest centroid
    assigned = (ex.join(F.broadcast(cents))
                .select("vec_id", "embedding", "_n", "cent_id",
                        (dot_col(F.col("embedding"), F.col("cent_emb"))
                         / F.sqrt(F.col("_n") * F.col("_cn"))).alias("cc")))
    # _n rides BEHIND (cc, cent_id) in the struct: cent_id is unique
    # within each vec_id group, so the max never compares past it and
    # the added field cannot change the argmax
    best = (assigned.groupBy("vec_id")
            .agg(F.max(F.struct("cc", "cent_id", "embedding", "_n"))
                 .alias("b"))
            .select("vec_id", F.col("b.cent_id").alias("cell"),
                    F.col("b.embedding").alias("embedding"),
                    F.col("b._n").alias("_n")))
    # probe its own cell plus the centroid-nearest cells
    probe_emb = (ex.filter(F.col("vec_id") == probe_id)
                 .select(F.col("embedding").alias("probe_emb"),
                         F.col("_n").alias("_pn")))
    cell_rank = (cents.join(F.broadcast(probe_emb))
                 .select("cent_id",
                         (dot_col(F.col("cent_emb"), F.col("probe_emb"))
                          / F.sqrt(F.col("_cn") * F.col("_pn")))
                         .alias("pc"))
                 .orderBy(F.col("pc").desc(), F.col("cent_id"))
                 .limit(n_probe_cells)
                 .select(F.col("cent_id").alias("cell")))
    cand = best.join(F.broadcast(cell_rank), "cell").filter(
        F.col("vec_id") != probe_id)
    scored = (cand.join(F.broadcast(probe_emb))
              .select("vec_id",
                      F.round(dot_col(F.col("embedding"),
                                      F.col("probe_emb"))
                              / F.sqrt(F.col("_n") * F.col("_pn")), 4)
                      .alias("cos")))
    return scored.orderBy(F.col("cos").desc(), F.col("vec_id")).limit(k)


def cosine_topk_fast_sql(elem_e: str, elem_p: str, elem_p_self: str,
                         dims: int = DIMS,
                         probe_id: int = 0, k: int = 10) -> str:
    """Generated fixed-order double-arithmetic cosine top-k (round 5).

    The decimal-exact reduction in cosine_col exists to make SUMS
    order-independent across shuffle partitionings — but a per-row
    array fold has no ordering freedom at all, so generating the
    64-term sums as explicit left-associated double expressions is
    equally hash-stable (both engines execute the identical IEEE op
    sequence) and several times faster than 128 decimal(38,_)
    additions per row. `elem_e`/`elem_p` are dialect indexing formats
    for the corpus row and the probe ('{i}' is the 1-based dim).
    The trailing `+ 0.0` normalizes sign-of-zero (a cos rounding to
    zero differs between DuckDB round(), which keeps -0.0, and
    Spark's, which does not)."""
    def dsum(ea: str, eb: str) -> str:
        return " + ".join(
            f"{ea.format(i=i)} * {eb.format(i=i)}"
            for i in range(1, dims + 1))

    return f"""
    WITH probe AS (
      SELECT embedding AS p,
             {dsum(elem_p_self, elem_p_self)} AS pn
      FROM embeddings WHERE vec_id = {probe_id}
    )
    SELECT e.vec_id,
           round(({dsum(elem_e, elem_p)})
                 / sqrt(({dsum(elem_e, elem_e)}) * probe.pn), 4)
             + 0.0 AS cos
    FROM embeddings e CROSS JOIN probe
    WHERE e.vec_id <> {probe_id}
    ORDER BY cos DESC, vec_id
    LIMIT {k}
    """


ELEM_SPARK_E = "cast(element_at(e.embedding, {i}) as double)"
ELEM_SPARK_P = "cast(element_at(probe.p, {i}) as double)"
ELEM_SPARK_P_SELF = "cast(element_at(embedding, {i}) as double)"
ELEM_DUCK_E = "cast(e.embedding[{i}] as double)"
ELEM_DUCK_P = "cast(probe.p[{i}] as double)"
ELEM_DUCK_P_SELF = "cast(embedding[{i}] as double)"


def ivf_check_sql(probe_id: int = 0, k: int = 10, n_cells: int = 8,
                  n_probe_cells: int = 3, dims: int = DIMS) -> str:
    """DuckDB replication of the ENTIRE ivf_topk pipeline (round 7 —
    the companion that converts q_similarity_ann from rows-only to
    hash-checked): centroid selection (lowest-vec_id), decimal-exact
    vector→centroid assignment with ivf_topk's exact tie-breaks
    (max cc, then max cent_id — the struct-max order), probe-cell
    ranking (pc desc, cent_id asc), candidate filtering, and the
    final rounded-cosine top-k — plus the exact brute-force top-k for
    the per-row `hit` flag. Every cosine uses the same
    decimal(18,10)-exact reduction as cosine_col, so both engines see
    identical doubles and make identical comparisons."""
    def dsum(x: str, y: str) -> str:
        return (f"cast(sum(cast(cast({x}[gs.i] as double) * "
                f"cast({y}[gs.i] as double) as {DEC_SIM})) as double)")

    rng = f"range(1, {dims + 1}) gs(i)"
    return f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cent_emb
      FROM embeddings ORDER BY vec_id LIMIT {n_cells}
    ), probe AS (
      SELECT embedding AS p FROM embeddings WHERE vec_id = {probe_id}
    ), cc AS (
      SELECT e.vec_id, c.cent_id,
             {dsum('e.embedding', 'c.cent_emb')}
               / sqrt({dsum('e.embedding', 'e.embedding')}
                      * {dsum('c.cent_emb', 'c.cent_emb')}) AS cc
      FROM embeddings e, cents c, {rng}
      GROUP BY e.vec_id, c.cent_id
    ), best AS (
      SELECT vec_id, cent_id AS cell FROM cc
      QUALIFY row_number() OVER (PARTITION BY vec_id
                ORDER BY cc DESC, cent_id DESC) = 1
    ), pc AS (
      SELECT c.cent_id,
             {dsum('c.cent_emb', 'probe.p')}
               / sqrt({dsum('c.cent_emb', 'c.cent_emb')}
                      * {dsum('probe.p', 'probe.p')}) AS pc
      FROM cents c, probe, {rng}
      GROUP BY c.cent_id
    ), cells AS (
      SELECT cent_id AS cell FROM pc
      ORDER BY pc DESC, cent_id LIMIT {n_probe_cells}
    ), allcos AS (
      SELECT e.vec_id,
             round({dsum('e.embedding', 'probe.p')}
               / sqrt({dsum('e.embedding', 'e.embedding')}
                      * {dsum('probe.p', 'probe.p')}), 4) AS cos
      FROM embeddings e, probe, {rng}
      WHERE e.vec_id <> {probe_id}
      GROUP BY e.vec_id
    ), ann AS (
      SELECT a.vec_id, a.cos
      FROM allcos a
      JOIN best USING (vec_id)
      JOIN cells USING (cell)
      ORDER BY a.cos DESC, a.vec_id LIMIT {k}
    ), exact AS (
      SELECT vec_id FROM allcos ORDER BY cos DESC, vec_id LIMIT {k}
    )
    SELECT ann.vec_id, ann.cos,
           (exact.vec_id IS NOT NULL) AS hit
    FROM ann LEFT JOIN exact USING (vec_id)
    """


def dot_fast_col(a: Column, b: Column, dims: int = DIMS) -> Column:
    """Whole-stage-codegen fixed-order double dot product — the
    PREFILTER arm of the two-phase pattern (SCALE.md round 7).

    zip_with/aggregate lambdas are CodegenFallback expressions:
    evaluated per candidate PAIR inside a join they run interpreted,
    which is what made q_dbscan's sf1.0 eps-graph serialize onto a few
    cores for minutes. This unrolled 64-term sum stays inside
    whole-stage codegen (same trick as cosine_topk_fast_sql / PQ's
    exact_dist_expr). Fixed left-assoc order ⇒ deterministic. The
    deviation vs the exact arm is NOT double-summation error alone:
    dot_col quantizes each per-term product to decimal(18,10), so
    |double − exact| can reach ~dims·5e-11 ≈ 3e-9 for dims=64
    (decimal per-term rounding dominates; pure double summation would
    be ~1e-13). Any prefilter/tie margin built on this function must
    cover the ~1e-8-per-64-terms decimal-quantization bound — the
    shipped margins (1e-6 prefilter slack, 1e-5 eps guard) dominate
    it comfortably, so filtering at (tau − 1e-6) with dot_col/cosine
    exact re-verification at the boundary yields BIT-IDENTICAL
    results to the pure-decimal filter while doing the decimal work
    only on survivors."""
    from functools import reduce

    def term(i: int) -> Column:
        return (F.element_at(a, i).cast("double")
                * F.element_at(b, i).cast("double"))

    return reduce(lambda acc, i: acc + term(i), range(2, dims + 1),
                  term(1))
