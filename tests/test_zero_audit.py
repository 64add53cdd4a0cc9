"""Sign-of-zero regression gate (round 5).

DuckDB's round() preserves IEEE -0.0 (round(-1e-9, 6) = -0.0); Spark's
round() goes through BigDecimal and always emits +0.0.  The driver's
value-hash distinguishes the two — this mismatch was round 4's only
driver red (q_embed_covariance cell (6,10)).  House rule: every oracle
column whose rounded argument can be negative carries a trailing
`+ 0.0` (IEEE -0.0 + 0.0 = +0.0; identity for every other double).

These tests pin (a) the engine semantics the rule is built on and
(b) that no registered oracle materializes a -0.0 at the smoke SF.
tools/zero_audit.py is the wider sweep (latent negatives too).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from challenge8_movies_etl_spark.registry import ORACLE, load_all
from tests.conftest import SF_SMOKE

load_all()

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def test_duckdb_round_preserves_negative_zero():
    """The premise: if this ever starts failing (DuckDB normalizing),
    the + 0.0 convention becomes redundant but stays harmless."""
    a, b = duckdb.sql(
        "SELECT round(-1e-9, 6), round(-1e-9, 6) + 0.0").fetchone()
    assert a == 0.0 and math.copysign(1.0, a) < 0, "-0.0 expected"
    assert b == 0.0 and math.copysign(1.0, b) > 0, "+0.0 expected"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF_SMOKE}/{t}.parquet')")
    return c


def test_no_oracle_materializes_negative_zero(con):
    """No oracle output cell may be -0.0: Spark can never produce one
    through round(), so any DuckDB -0.0 is a guaranteed driver
    hash-mismatch waiting for its fixture."""
    offenders = []
    for qid, sql in sorted(ORACLE.items()):
        pdf = con.execute(sql).df()
        for c in pdf.columns:
            if str(pdf[c].dtype) not in ("float64", "float32"):
                continue
            for v in pdf[c].dropna():
                if v == 0.0 and math.copysign(1.0, v) < 0:
                    offenders.append(f"{qid}.{c}")
                    break
    assert not offenders, f"-0.0 in oracle output: {offenders}"
