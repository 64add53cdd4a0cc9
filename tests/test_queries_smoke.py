"""Every registered query must run at sf0.001 with a stable schema and
every oracle-checked query must have matching column names declared on
both sides (the driver sorts columns by name before hashing — a name
mismatch fails even with identical values)."""

from __future__ import annotations

import re

import pytest

from challenge8_movies_etl_spark.registry import ORACLE, QUERIES, load_all
from tests.conftest import SF_SMOKE

load_all()


@pytest.mark.parametrize("qid", sorted(QUERIES))
def test_query_runs_at_smoke_sf(spark, qid):
    df = QUERIES[qid](spark, SF_SMOKE)
    n = df.count()
    assert n >= 0
    assert len(df.columns) == len(set(df.columns)), "duplicate column names"
    # Driver contract: output columns must be scalar. The driver's
    # pandas canonicalizer hashes cells via factorize, which raises
    # "unhashable type: 'list'" on array/map/struct cells
    # (q_array_hof, driver r5 err). Serialize containers with
    # concat_ws / to_json before returning.
    from pyspark.sql.types import ArrayType, MapType, StructType
    for f in df.schema.fields:
        assert not isinstance(f.dataType, (ArrayType, MapType, StructType)), (
            f"{qid}.{f.name} is non-scalar ({f.dataType.simpleString()}); "
            "the driver harness cannot hash container cells")


def test_every_query_has_oracle_or_is_documented():
    rows_only = set(QUERIES) - set(ORACLE)
    # sketch/approx/streaming-machinery queries are legitimately
    # rows-only; everything else must carry an oracle
    allowed = {"q_agg_approx", "q_dedup_minhash", "q_dedup_simhash",
               "q_similarity_ann", "q_knn_join_blocked",
               "q_agg_sketch_reagg",
               # eigensolver not SQL-expressible; spectral identities +
               # numpy agreement pinned in tests/test_linalg.py
               "q_embed_pca",
               # engine-specific sketch; error bound vs exact twin
               # pinned in tests/test_operators.py
               "q_percentile_approx", "q_hll_intersection",
               # PAV pooling is data-dependent iteration, not SQL;
               # monotonicity/mass-preservation/exact-fit pinned in
               # tests/test_calibration.py against a pure-python twin
               "q_isotonic_pav"}
    assert rows_only <= allowed, rows_only


def test_schema_profile_consistency(spark):
    from tests.conftest import SF_SMOKE
    from challenge8_movies_etl_spark.registry import QUERIES
    rows = QUERIES["q_schema_profile"](spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["n_null"] <= r["n"]
        assert 1 <= r["n_distinct"] <= r["n"]
        assert r["min_s"] <= r["max_s"] or r["n_distinct"] == 1
