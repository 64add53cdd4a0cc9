"""Banded interval (range) join — the scale path for q_join_range.

The declared form (queries_joins.q_join_range) equi-joins on the key
and leaves the time-range as a residual predicate: correct, but each
key's whole history meets itself (per-key quadratic). Banding fixes
the asymptotics: bucket timestamps into bands of the window width; a
pair within ``window`` can only span adjacent bands, so joining on
(key, band) ∪ (key, band+1) bounds candidates to ~2 bands per row.
Semantics are identical; tests assert equality with the naive form.

At 100 TB the band join shuffles on (key, band) — hot keys spread
across bands, which also de-skews the classic hot-user problem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_range_join(events: DataFrame, key: str, ts: str, id_col: str,
                      window_seconds: int = 300) -> DataFrame:
    """All pairs (a, b) with same key, ts_b in [ts_a, ts_a + window],
    id_a < id_b. Returns (eid_a, eid_b, key)."""
    us = window_seconds * 1_000_000
    banded = events.select(
        F.col(key), F.col(id_col), F.col(ts),
        (F.unix_micros(F.col(ts)) / us).cast("bigint").alias("band"),
    )
    a = banded.alias("a")
    # b joins its own band and the next one; union of two equi-joins
    pairs = None
    for shift in (0, 1):
        b = banded.select(
            F.col(key).alias("bk"), F.col(id_col).alias("bid"),
            F.col(ts).alias("bts"),
            (F.col("band") - shift).alias("bband"),
        ).alias(f"b{shift}")
        p = (a.join(b, (F.col(f"a.{key}") == F.col("bk"))
                    & (F.col("a.band") == F.col("bband")))
             .filter((F.col("bts") >= F.col(f"a.{ts}"))
                     & (F.col("bts") <= F.col(f"a.{ts}")
                        + F.expr(f"INTERVAL {window_seconds} SECONDS"))
                     & (F.col(f"a.{id_col}") < F.col("bid")))
             .select(F.col(f"a.{id_col}").alias("eid_a"),
                     F.col("bid").alias("eid_b"),
                     F.col(f"a.{key}").alias(key)))
        pairs = p if pairs is None else pairs.unionByName(p)
    # a pair can appear in both the same-band and next-band join only if
    # band boundaries align exactly; distinct guards the edge
    return pairs.distinct()
