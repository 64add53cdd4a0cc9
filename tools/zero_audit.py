"""Sign-of-zero hazard audit (round-5, after the q_embed_covariance red).

DuckDB's round() preserves IEEE sign of zero (round(-1e-9, 6) = -0.0)
while Spark's round() goes through BigDecimal and always emits +0.0 —
so ANY oracle whose output contains a rounded double column whose
argument can be a tiny negative will hash-mismatch against Spark the
moment a fixture materializes such a value.

This tool runs every registered oracle in DuckDB over a given sf dir
and reports, per query:

- MATERIALIZED: a double column already containing a -0.0 cell
  (an actual driver red at this SF); and
- LATENT: a double column containing any strictly-negative value
  (a regenerated fixture could move one of those into (-5e-{d+1}, 0),
  where round() emits -0.0 and the hash diverges).

Fix policy: append `+ 0.0` to the column on BOTH engines (IEEE
-0.0 + 0.0 = +0.0; x + 0.0 = x bitwise for every other double).

Usage: python tools/zero_audit.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import math
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from challenge8_movies_etl_spark.registry import ORACLE, load_all
    load_all()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf}/{t}.parquet')")

    materialized, latent = [], []
    for qid, sql in sorted(ORACLE.items()):
        try:
            pdf = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {qid}: {type(e).__name__}: {e}")
            continue
        for c in pdf.columns:
            if str(pdf[c].dtype) not in ("float64", "float32"):
                continue
            vals = pdf[c].dropna()
            has_negzero = any(v == 0.0 and math.copysign(1.0, v) < 0
                              for v in vals)
            has_neg = (vals < 0).any()
            if has_negzero:
                materialized.append((qid, c))
                print(f"NEGZERO  {qid}.{c}  <- -0.0 present (driver red)")
            elif has_neg:
                latent.append((qid, c))
    print(f"\nmaterialized -0.0: {len(materialized)}")
    for q, c in materialized:
        print(f"  {q}.{c}")
    print(f"latent (rounded double col with negatives): {len(latent)}")
    for q, c in latent:
        print(f"  {q}.{c}")
    return 1 if materialized else 0


if __name__ == "__main__":
    raise SystemExit(main())
