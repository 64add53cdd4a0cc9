"""Product-quantization (operators/pq.py) — semantic invariants
beyond the DuckDB oracle agreement."""

from __future__ import annotations

from challenge8_movies_etl_spark.registry import QUERIES, load_all
from tests.conftest import SF_SMOKE

load_all()


def test_pq_encode_matches_reference(spark):
    """The Arrow kernel equals the pure-python reference encoder
    (argmin + lowest-k tie-break) on every fixture vector."""
    from challenge8_movies_etl_spark.operators.pq import encode_reference

    got = {r["vec_id"]: r for r in
           QUERIES["q_pq_encode"](spark, SF_SMOKE).collect()}
    vecs = (spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
            .select("vec_id", "embedding").collect())
    assert len(got) == len(vecs) > 0
    for r in vecs:
        codes, err = encode_reference(list(r["embedding"]))
        row = got[r["vec_id"]]
        assert [row[f"c{m}"] for m in range(8)] == codes
        assert abs(row["qerr"] - err) < 1e-6
        assert row["qerr"] >= 0
        assert all(0 <= row[f"c{m}"] <= 15 for m in range(8))


def test_pq_adc_consistent_with_lut(spark):
    """Every returned ADC distance equals the LUT sum of that row's
    own codes, and the ranking is ascending."""
    from challenge8_movies_etl_spark.operators.pq import LUT

    rows = QUERIES["q_pq_ann"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 10
    prev = None
    for r in rows:
        expect = sum(LUT[m][r[f"c{m}"]] for m in range(8))
        assert abs(r["adc"] - expect) < 1e-6
        assert prev is None or r["adc"] >= prev
        prev = r["adc"]


def test_pq_recall_bounds(spark):
    r = QUERIES["q_pq_recall"](spark, SF_SMOKE).collect()[0]
    assert r["k"] == 10
    assert 0 <= r["n_overlap"] <= 10
    assert abs(r["recall"] - r["n_overlap"] / 10.0) < 1e-9
    # PQ with 16 codes over 8 dims is coarse but must beat random on
    # a 500-vector corpus (random recall@10 ≈ 10/500)
    assert r["n_overlap"] >= 1


def test_ivfpq_candidates_only_from_probed_cells(spark):
    """Every returned candidate sits in one of the probe's 2 nearest
    cells, distances ascend, and the ADC equals the per-cell LUT sum
    of the row's own residual codes (recomputed independently)."""
    from challenge8_movies_etl_spark.operators.pq import (
        PROBE_CELLS,
        RESIDUAL_LUT,
        ivfpq_encode_batches,
    )

    rows = QUERIES["q_ivfpq_ann"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 10
    prev = None
    for r in rows:
        assert r["cell"] in PROBE_CELLS
        assert prev is None or r["adc"] >= prev
        prev = r["adc"]

    import pandas as pd
    pdf = (spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
           .select("vec_id", "embedding").toPandas())
    enc = pd.concat(list(ivfpq_encode_batches(iter([pdf]))))
    enc = enc.set_index("vec_id")
    for r in rows:
        e = enc.loc[r["vec_id"]]
        assert e["cell"] == r["cell"]
        expect = sum(RESIDUAL_LUT[r["cell"]][m][e[f"c{m}"]]
                     for m in range(8))
        assert abs(r["adc"] - expect) < 1e-6


def test_ivfpq_cells_cover_corpus(spark):
    """Cell assignment is total and uses several cells (a degenerate
    all-one-cell assignment would make IVF pointless)."""
    from challenge8_movies_etl_spark.operators.pq import (
        N_CELLS,
        ivfpq_encode_batches,
    )

    import pandas as pd
    pdf = (spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
           .select("vec_id", "embedding").toPandas())
    enc = pd.concat(list(ivfpq_encode_batches(iter([pdf]))))
    assert len(enc) == len(pdf)
    assert enc["cell"].between(0, N_CELLS - 1).all()
    assert enc["cell"].nunique() >= 3
