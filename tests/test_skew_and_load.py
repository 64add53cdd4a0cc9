"""Skew-salting equivalence and the foreachBatch chunked-load sink
(the reference's LOAD-loop parity, SURVEY.md §2.A chunked-ingest row).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from challenge8_movies_etl_spark.operators.skew import (
    salted_agg,
    salted_join_skewed_left,
)
from challenge8_movies_etl_spark.sources.fixtures import load_table
from challenge8_movies_etl_spark.streaming.replay import (
    chunked_load,
    replay_events_stream,
)
from tests.conftest import SF_SMOKE


def test_salted_agg_equals_plain(spark):
    e = load_table(spark, SF_SMOKE, "events")
    plain = {(r["event_type"], r["n"], round(r["v"], 4))
             for r in e.groupBy("event_type")
             .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
             .select("event_type", "n", F.round("v", 4).alias("v"))
             .collect()}
    salted = {(r["event_type"], r["n"], round(r["v"], 4))
              for r in salted_agg(
                  e, "event_type",
                  aggs=[F.count("*").alias("pn"), F.sum("value").alias("pv")],
                  reaggs=[F.sum("pn").alias("n"), F.sum("pv").alias("v")])
              .select("event_type", "n", F.round("v", 4).alias("v"))
              .collect()}
    assert salted == plain


def test_salted_join_equals_plain(spark):
    e = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id")
    u = (load_table(spark, SF_SMOKE, "events")
         .groupBy("user_id").agg(F.count("*").alias("n_events")))
    plain = {(r["event_id"], r["n_events"])
             for r in e.join(u, "user_id").collect()}
    salted = {(r["event_id"], r["n_events"])
              for r in salted_join_skewed_left(e, u, "user_id", 8).collect()}
    assert salted == plain and len(salted) > 0


def test_chunked_load_sink(spark, tmp_path):
    out = str(tmp_path / "loaded")
    logs: list[str] = []
    stream = replay_events_stream(spark, SF_SMOKE)
    q = chunked_load(
        stream,
        write_batch=lambda df, epoch: df.write.mode("append").parquet(out),
        checkpoint_dir=str(tmp_path / "ckpt"),
        progress=logs.append,
    )
    q.awaitTermination(120)
    n_src = load_table(spark, SF_SMOKE, "events").count()
    assert spark.read.parquet(out).count() == n_src
    assert logs and "rows_imported" in logs[-1]
