"""Incremental upsert / slowly-changing-dimension operators.

The reference's sink modes were to_sql(if_exists='replace'|'append')
(challenge.py≈L197-210 [R]) — full replace or blind append. Real
pipelines (and dataset versioning for training corpora) need MERGE
semantics; without a Delta/Iceberg jar in this image, MERGE is
emulated with pure DataFrame algebra:

- upsert:        target ⟕ updates — replaced rows dropped via anti-join,
                 updates unioned in (last-writer-wins by key).
- scd2_apply:    type-2 history — close the current version of changed
                 keys (valid_to = change ts), append new open versions;
                 unchanged history passes through untouched.

Both are shuffle-on-key joins — at 100 TB they pair with bucketed
storage on the key (tests/test_bucketing.py) so repeated merges skip
the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Key-level last-writer-wins merge: rows of ``target`` whose key
    appears in ``updates`` are replaced; new keys are inserted."""
    kept = target.join(updates.select(key), key, "left_anti")
    return kept.unionByName(updates.select(target.columns))


def scd2_apply(history: DataFrame, changes: DataFrame, key: str,
               ts_col: str, open_end: str = "9999-12-31") -> DataFrame:
    """Apply a batch of changes to an SCD2 history table.

    ``history`` schema: key, payload..., valid_from, valid_to (open
    rows carry ``open_end``). ``changes`` schema: key, payload...,
    ts_col (the change timestamp). For each changed key: the open row
    closes at the change ts; a new open row is appended. One change
    per key per batch (pre-deduplicate upstream with dedup-by-key).
    """
    open_rows = history.filter(F.col("valid_to") == open_end)
    closed_rows = history.filter(F.col("valid_to") != open_end)

    chg = changes.select(
        F.col(key), F.col(ts_col).alias("_chg_ts"),
        *[c for c in changes.columns if c not in (key, ts_col)],
    )
    # close the current version of changed keys
    closing = (open_rows.join(chg.select(key, "_chg_ts"), key, "inner")
               .withColumn("valid_to", F.col("_chg_ts"))
               .drop("_chg_ts"))
    untouched_open = open_rows.join(chg.select(key), key, "left_anti")
    # new open versions from the changes
    payload = [c for c in changes.columns if c not in (key, ts_col)]
    opening = chg.select(
        key, *payload,
        F.col("_chg_ts").alias("valid_from"),
        F.lit(open_end).alias("valid_to"),
    ).select(history.columns)
    return (closed_rows
            .unionByName(closing.select(history.columns))
            .unionByName(untouched_open.select(history.columns))
            .unionByName(opening))
