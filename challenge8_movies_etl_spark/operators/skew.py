"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; salting is the explicit fallback for the two cases AQE does
not cover: skewed AGGREGATION keys, and skewed BROADCAST-ineligible
joins where one key dominates a partition. Both forms preserve exact
semantics (two-phase re-aggregation / key-explosion join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, key: str, aggs: list[Column],
               reaggs: list[Column], n_salts: int = 16) -> DataFrame:
    """Two-phase aggregation for a skewed group key.

    Phase 1 groups by (key, salt) — the hot key's rows spread over
    ``n_salts`` reducers; phase 2 re-aggregates the per-salt partials
    by key alone (tiny input: n_salts rows per key).

    ``aggs`` aggregate the raw rows; ``reaggs`` combine the partials
    (e.g. aggs=[count(*) as n] -> reaggs=[sum(n) as n]). The caller
    pairs them correctly — the same contract as writing a partial/final
    aggregate.
    """
    salted = df.withColumn(
        "_salt", (F.spark_partition_id() + F.monotonically_increasing_id())
        % n_salts)
    phase1 = salted.groupBy(key, "_salt").agg(*aggs)
    return phase1.groupBy(key).agg(*reaggs)


def salted_join_skewed_left(left: DataFrame, right: DataFrame, key: str,
                            n_salts: int = 16) -> DataFrame:
    """Equi-join where LEFT has skewed keys: salt the left key into
    n_salts variants; EXPLODE the right side once per salt so every
    (key, salt) bucket finds its match. Right-side duplication factor is
    n_salts — only worth it when right is small-ish but above the
    broadcast threshold and left skew is severe."""
    lsalted = left.withColumn(
        "_salt", (F.spark_partition_id() + F.monotonically_increasing_id())
        % n_salts)
    rsalted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = lsalted.join(rsalted, [key, "_salt"], "inner").drop("_salt")
    return out
