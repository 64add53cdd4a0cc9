"""Product quantization (PQ) for embedding columns — the vector-index
compression standard (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011): split the 64-d vector into M=8
subvectors, quantize each against its own K=16-entry codebook, store 8
nibble codes (4 bytes/vector vs 256 for float32 — a 64× cut), and
answer queries with asymmetric distance (ADC): one 8×16 lookup table
per probe, distance = Σ_m LUT[m][code_m].

At 100 TB this is THE serving-index layout: encode is a zero-shuffle
per-row projection; the ADC scan reads only the code columns (column
pruning drops the raw vectors); candidate ranking is a
TakeOrderedAndProject. Composes with IVF (q_similarity_ann) as
IVF-PQ: coarse cell first, PQ codes within the cell.

Codebooks here are md5-derived constants (deterministic, engine-
portable — a trained k-means codebook would be neither, and training
is offline anyway): component (m, k, d) = (md5int("pq:m:k:d") % 1001
− 500)/1000 ∈ [−0.5, 0.5], matching the fixture embedding range. Both
engines receive the IDENTICAL decimal literals inlined in generated
SQL, every arithmetic term is written in the same order, and squares
use explicit multiplication (never pow(), whose libm may differ) — so
distances, argmins, codes, and ADC ranks are bit-identical and the
whole PQ path is value-hash-checked against DuckDB.
"""

from __future__ import annotations

import hashlib

M_SUBSPACES = 8
K_CODES = 16
D_SUB = 8
DIM = M_SUBSPACES * D_SUB


def _cb(m: int, k: int, d: int) -> float:
    h = hashlib.md5(f"pq:{m}:{k}:{d}".encode()).hexdigest()
    return (int(h[:8], 16) % 1001 - 500) / 1000.0


CODEBOOK: list[list[list[float]]] = [
    [[_cb(m, k, d) for d in range(D_SUB)] for k in range(K_CODES)]
    for m in range(M_SUBSPACES)]

# deterministic probe vector for the ADC query (same closed form both
# engines; only its LUT — plain python floats — reaches the SQL)
PROBE: list[float] = [((d * 37) % 41 - 20) / 20.0 for d in range(DIM)]

# LUT[m][k] = ||probe_m − c_mk||²  (python floats; repr() round-trips
# exactly, so both engines parse the identical double)
LUT: list[list[float]] = [
    [sum((PROBE[m * D_SUB + d] - CODEBOOK[m][k][d]) ** 2
         for d in range(D_SUB)) for k in range(K_CODES)]
    for m in range(M_SUBSPACES)]


def encode_batches(batches):
    """Vectorized PQ encode kernel for one Arrow batch stream.

    Accumulation order is EXPLICIT (sequential over d within a
    subspace, sequential over m for qerr) so every double matches the
    left-associated sums of the generated oracle SQL bit-for-bit —
    np.sum's pairwise summation would not. np.argmin returns the
    first minimum, matching list_position-of-min's lowest-k
    tie-break."""
    import numpy as np
    import pandas as pd

    cb = np.array(CODEBOOK)  # (M, K, D_SUB)
    for pdf in batches:
        X = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
        n = len(X)
        if n == 0:
            continue
        out = {"vec_id": pdf["vec_id"].to_numpy()}
        qerr = np.zeros(n)
        for m in range(M_SUBSPACES):
            dmat = np.empty((n, K_CODES))
            for k in range(K_CODES):
                acc = np.zeros(n)
                for d in range(D_SUB):
                    diff = X[:, m * D_SUB + d] - cb[m, k, d]
                    acc = acc + diff * diff
                dmat[:, k] = acc
            code = np.argmin(dmat, axis=1)
            out[f"c{m}"] = code.astype(np.int32)
            qerr = qerr + dmat[np.arange(n), code]
        out["qerr"] = qerr
        yield pd.DataFrame(out)


ENCODE_SCHEMA = ("vec_id bigint, c0 int, c1 int, c2 int, c3 int, "
                 "c4 int, c5 int, c6 int, c7 int, qerr double")


class _Dialect:
    def __init__(self, elem: str, arr: str, amin: str, apos: str):
        self.elem, self.arr, self.amin, self.apos = elem, arr, amin, apos


SPARK = _Dialect(elem="cast(element_at(embedding, {i}) as double)",
                 arr="array({xs})", amin="array_min({a})",
                 apos="array_position({a}, {x})")
DUCK = _Dialect(elem="cast(embedding[{i}] as double)",
                arr="list_value({xs})", amin="list_min({a})",
                apos="list_position({a}, {x})")


def _dist_expr(dia: _Dialect, m: int, k: int) -> str:
    """||subvector_m − codebook[m][k]||² with fixed term order and
    explicit squaring."""
    terms = []
    for d in range(D_SUB):
        e = dia.elem.format(i=m * D_SUB + d + 1)
        c = f"({CODEBOOK[m][k][d]:+.3f})"
        terms.append(f"({e} - {c}) * ({e} - {c})")
    return " + ".join(terms)


def encode_sql(dia: _Dialect) -> str:
    """SELECT vec_id, c0..c7 (int codes), qerr — PQ encode + total
    quantization error, as one generated single-pass projection."""
    arrs = []
    for m in range(M_SUBSPACES):
        xs = ", ".join(_dist_expr(dia, m, k) for k in range(K_CODES))
        arrs.append(dia.arr.format(xs=xs) + f" AS a{m}")
    codes = []
    for m in range(M_SUBSPACES):
        amin = dia.amin.format(a=f"a{m}")
        pos = dia.apos.format(a=f"a{m}", x=amin)
        codes.append(f"cast({pos} - 1 as int) AS c{m}")
    qerr = " + ".join(dia.amin.format(a=f"a{m}")
                      for m in range(M_SUBSPACES))
    return f"""
    WITH dists AS (
      SELECT vec_id, {", ".join(arrs)}
      FROM embeddings
    )
    SELECT vec_id, {", ".join(codes)},
           round({qerr}, 6) AS qerr
    FROM dists
    """


def adc_topk_sql(dia: _Dialect, k_top: int = 10) -> str:
    """Top-k ADC scan for the fixed PROBE: per-subspace 16-way LUT
    CASE over the stored code, summed in subspace order."""
    luts = []
    for m in range(M_SUBSPACES):
        whens = " ".join(f"WHEN {k} THEN {LUT[m][k]!r}"
                         for k in range(K_CODES))
        luts.append(f"CASE c{m} {whens} END")
    adc = " + ".join(f"({x})" for x in luts)
    return f"""
    WITH enc AS ({encode_sql(dia)})
    SELECT vec_id, c0, c1, c2, c3, c4, c5, c6, c7,
           round({adc}, 6) AS adc
    FROM enc
    ORDER BY adc, vec_id
    LIMIT {k_top}
    """


def encode_reference(vec: "list[float]") -> tuple[list[int], float]:
    """Pure-python reference encoder for tests (argmin with lowest-k
    tie-break, like array_position-of-min)."""
    codes, err = [], 0.0
    for m in range(M_SUBSPACES):
        dists = [sum((float(vec[m * D_SUB + d]) - CODEBOOK[m][k][d]) ** 2
                     for d in range(D_SUB)) for k in range(K_CODES)]
        best = min(range(K_CODES), key=lambda k: (dists[k], k))
        codes.append(best)
        err += dists[best]
    return codes, err


def exact_dist_expr(dia: _Dialect) -> str:
    """True squared L2 distance to PROBE as a generated 64-term
    left-associated sum (fits codegen comfortably, unlike the 1024-term
    encode tree)."""
    terms = []
    for i in range(DIM):
        e = dia.elem.format(i=i + 1)
        p = repr(PROBE[i])
        terms.append(f"({e} - ({p})) * ({e} - ({p}))")
    return " + ".join(terms)


def recall_sql(dia: _Dialect, k_top: int = 10) -> str:
    """recall@k of the PQ-ADC candidate ranking against the exact
    scan, computed wholly in SQL."""
    return f"""
    WITH exact_top AS (
      SELECT vec_id FROM (
        SELECT vec_id, {exact_dist_expr(dia)} AS dist FROM embeddings
      ) ORDER BY dist, vec_id LIMIT {k_top}
    ),
    pq_top AS (
      SELECT vec_id FROM ({adc_topk_sql(dia, k_top)})
    )
    SELECT {k_top} AS k,
           cast(count(*) as bigint) AS n_overlap,
           round(count(*) / {float(k_top)!r}, 4) AS recall
    FROM exact_top JOIN pq_top USING (vec_id)
    """


# ---------------------------------------------------------------------------
# IVF-PQ composition (round 5): coarse cells + residual PQ
# ---------------------------------------------------------------------------

N_CELLS = 8
N_PROBE = 2


def _cc_(j: int, d: int) -> float:
    h = hashlib.md5(f"ivf:{j}:{d}".encode()).hexdigest()
    return (int(h[:8], 16) % 1001 - 500) / 1000.0


COARSE: list[list[float]] = [[_cc_(j, d) for d in range(DIM)]
                             for j in range(N_CELLS)]

# cells the fixed PROBE visits (nearest N_PROBE coarse centroids),
# and one residual-ADC LUT per probed cell — all plain python floats,
# identical literals on both engines
_pdists = []
for _j in range(N_CELLS):
    _acc = 0.0
    for _d in range(DIM):
        _df = PROBE[_d] - COARSE[_j][_d]
        _acc = _acc + _df * _df
    _pdists.append(_acc)
PROBE_CELLS: list[int] = sorted(range(N_CELLS),
                                key=lambda j: (_pdists[j], j))[:N_PROBE]
RESIDUAL_LUT: dict[int, list[list[float]]] = {}
for _j in PROBE_CELLS:
    _rp = [PROBE[_d] - COARSE[_j][_d] for _d in range(DIM)]
    RESIDUAL_LUT[_j] = [
        [sum((_rp[_m * D_SUB + _dd] - CODEBOOK[_m][_k][_dd]) ** 2
             for _dd in range(D_SUB)) for _k in range(K_CODES)]
        for _m in range(M_SUBSPACES)]


def ivfpq_encode_batches(batches):
    """IVF-PQ encode kernel: nearest coarse cell (ordered-accumulation
    argmin over N_CELLS), then PQ codes of the RESIDUAL v − C_cell —
    the classic inverted-file layout (Jégou'11 §IV): cells bound the
    candidate set, residual quantization keeps the codebook error
    centered. Accumulation order matches the oracle's left-assoc sums
    exactly (see encode_batches)."""
    import numpy as np
    import pandas as pd

    cb = np.array(CODEBOOK)
    cc = np.array(COARSE)  # (N_CELLS, DIM)
    for pdf in batches:
        X = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
        n = len(X)
        if n == 0:
            continue
        cd = np.empty((n, N_CELLS))
        for j in range(N_CELLS):
            acc = np.zeros(n)
            for d in range(DIM):
                diff = X[:, d] - cc[j, d]
                acc = acc + diff * diff
            cd[:, j] = acc
        cell = np.argmin(cd, axis=1)
        R = X - cc[cell]  # residuals
        out = {"vec_id": pdf["vec_id"].to_numpy(),
               "cell": cell.astype(np.int32)}
        for m in range(M_SUBSPACES):
            dmat = np.empty((n, K_CODES))
            for k in range(K_CODES):
                acc = np.zeros(n)
                for d in range(D_SUB):
                    diff = R[:, m * D_SUB + d] - cb[m, k, d]
                    acc = acc + diff * diff
                dmat[:, k] = acc
            out[f"c{m}"] = np.argmin(dmat, axis=1).astype(np.int32)
        yield pd.DataFrame(out)


IVFPQ_SCHEMA = ("vec_id bigint, cell int, c0 int, c1 int, c2 int, "
                "c3 int, c4 int, c5 int, c6 int, c7 int")


def _cell_dist_expr(dia: _Dialect, j: int) -> str:
    terms = []
    for d in range(DIM):
        e = dia.elem.format(i=d + 1)
        c = f"({COARSE[j][d]:+.3f})"
        terms.append(f"({e} - {c}) * ({e} - {c})")
    return " + ".join(terms)


def _residual_dist_expr(dia: _Dialect, j: int, m: int, k: int) -> str:
    """||(v − C_j)_m − codebook[m][k]||² with the residual folded into
    the literal: (e − C_jd) − cb = e − (C_jd + cb)... NOT folded —
    the kernel computes (e − C) first then subtracts cb, and IEEE
    subtraction is not associative, so the SQL must subtract in the
    same two steps to stay bit-identical."""
    terms = []
    for d in range(D_SUB):
        e = dia.elem.format(i=m * D_SUB + d + 1)
        cj = f"({COARSE[j][m * D_SUB + d]:+.3f})"
        cb = f"({CODEBOOK[m][k][d]:+.3f})"
        terms.append(f"(({e} - {cj}) - {cb}) * (({e} - {cj}) - {cb})")
    return " + ".join(terms)


def ivfpq_topk_sql(dia: _Dialect, k_top: int = 10) -> str:
    """Full IVF-PQ query as generated SQL (the oracle form): cell
    argmin, residual PQ codes, probe-cell filter, per-cell residual
    ADC, top-k."""
    cell_arr = dia.arr.format(
        xs=", ".join(_cell_dist_expr(dia, j) for j in range(N_CELLS)))
    cell_pos = dia.apos.format(a="ca", x=dia.amin.format(a="ca"))
    code_cols = []
    for j in PROBE_CELLS:
        for m in range(M_SUBSPACES):
            xs = ", ".join(_residual_dist_expr(dia, j, m, k)
                           for k in range(K_CODES))
            code_cols.append(
                f"CASE WHEN cell = {j} THEN "
                + dia.apos.format(
                    a=dia.arr.format(xs=xs),
                    x=dia.amin.format(a=dia.arr.format(xs=xs)))
                + f" - 1 END AS rc{j}_{m}")
    luts = []
    for j in PROBE_CELLS:
        per_m = " + ".join(
            "(CASE rc{j}_{m} {whens} END)".format(
                j=j, m=m, whens=" ".join(
                    f"WHEN {k} THEN {RESIDUAL_LUT[j][m][k]!r}"
                    for k in range(K_CODES)))
            for m in range(M_SUBSPACES))
        luts.append(f"WHEN cell = {j} THEN {per_m}")
    adc = "CASE " + " ".join(luts) + " END"
    cells_in = ", ".join(str(j) for j in PROBE_CELLS)
    return f"""
    WITH assigned AS (
      SELECT vec_id, embedding,
             cast({cell_pos} - 1 as int) AS cell
      FROM (SELECT vec_id, embedding, {cell_arr} AS ca FROM embeddings)
    ),
    coded AS (
      SELECT vec_id, cell, {", ".join(code_cols)}
      FROM assigned WHERE cell IN ({cells_in})
    )
    SELECT vec_id, cell, round({adc}, 6) AS adc
    FROM coded
    ORDER BY adc, vec_id
    LIMIT {k_top}
    """
