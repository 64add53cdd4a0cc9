"""Upsert / SCD2 merge emulation (operators/scd.py) — the MERGE
semantics the reference's to_sql(replace|append) sink lacked."""

from __future__ import annotations


def test_upsert_last_writer_wins(spark):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string")
    updates = spark.createDataFrame(
        [(2, "B"), (4, "D")], "k bigint, v string")
    from challenge8_movies_etl_spark.operators.scd import upsert
    got = {(r["k"], r["v"]) for r in upsert(target, updates, "k").collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "D")}


def test_scd2_close_and_open(spark):
    from challenge8_movies_etl_spark.operators.scd import scd2_apply
    history = spark.createDataFrame(
        [(1, "x", "2024-01-01", "9999-12-31"),
         (2, "y", "2024-01-01", "9999-12-31"),
         (1, "w", "2023-01-01", "2024-01-01")],
        "k bigint, v string, valid_from string, valid_to string")
    changes = spark.createDataFrame(
        [(1, "X", "2024-06-01"), (3, "Z", "2024-06-01")],
        "k bigint, v string, chg string")
    out = scd2_apply(history, changes, "k", "chg")
    rows = {(r["k"], r["v"], r["valid_from"], r["valid_to"])
            for r in out.collect()}
    assert rows == {
        (1, "w", "2023-01-01", "2024-01-01"),     # old closed row kept
        (1, "x", "2024-01-01", "2024-06-01"),     # current closed at chg
        (1, "X", "2024-06-01", "9999-12-31"),     # new open version
        (2, "y", "2024-01-01", "9999-12-31"),     # untouched open row
        (3, "Z", "2024-06-01", "9999-12-31"),     # brand-new key
    }
