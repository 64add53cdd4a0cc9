"""Raw source/sink surface (SURVEY.md §2.A): ragged JSON, CSV with
explicit schema, partitioned parquet sink round-trip."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from challenge8_movies_etl_spark.sources.raw import (
    read_csv,
    read_json_ragged,
    write_partitioned_parquet,
)
from tests.conftest import SF_SMOKE


def test_json_ragged_keys(spark, tmp_path):
    """Ragged records (each a different key subset — the
    wikipedia.movies.json shape) become nullable columns."""
    p = tmp_path / "ragged.json"
    rows = [
        {"title": "A", "Director": "X", "imdb_link": "tt1"},
        {"title": "B", "Directed by": "Y"},
        {"title": "C", "Box office": ["$1m", "$2m"]},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    df = read_json_ragged(spark, str(p))
    assert set(df.columns) >= {"title", "Director", "Directed by",
                               "imdb_link", "Box office"}
    got = {r["title"]: r for r in df.collect()}
    assert got["B"]["Director"] is None
    assert got["C"]["Box office"] == ["$1m", "$2m"]


def test_csv_explicit_schema(spark, tmp_path):
    p = tmp_path / "movies.csv"
    p.write_text("id,budget,video\n1,1000,True\n2,,False\n")
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("budget", T.DoubleType()),
        T.StructField("video", T.BooleanType()),
    ])
    df = read_csv(spark, str(p), schema)
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["budget"] == 1000.0 and rows[1]["video"] is True
    assert rows[2]["budget"] is None


def test_partitioned_sink_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "ab"[i % 2], float(i)) for i in range(20)],
        "id bigint, part string, v double")
    out = str(tmp_path / "sink")
    write_partitioned_parquet(df, out, partition_by=["part"])
    back = spark.read.parquet(out)
    assert back.count() == 20
    assert {r["part"] for r in back.select("part").distinct().collect()} \
        == {"a", "b"}


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from challenge8_movies_etl_spark.sources.raw import read_orc, write_orc
    from challenge8_movies_etl_spark.sources.fixtures import load_table
    src = load_table(spark, SF_SMOKE, "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.count() == src.count()
    assert set(back.columns) == set(src.columns)
    # predicate pushdown reaches the ORC scan like the parquet one
    plan = back.filter("n_nationkey > 10")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PushedFilters" in plan and "n_nationkey" in plan


def test_text_jsonl_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F
    from challenge8_movies_etl_spark.sources.raw import read_text, write_text
    from challenge8_movies_etl_spark.sources.fixtures import load_table
    src = load_table(spark, SF_SMOKE, "region")
    path = str(tmp_path / "region_jsonl")
    write_text(src.select(F.to_json(F.struct(*src.columns)).alias("value")),
               path)
    back = read_text(spark, path)
    assert back.columns == ["value"]
    parsed = back.select(
        F.from_json("value", src.schema).alias("r")).select("r.*")
    assert sorted(map(tuple, parsed.collect())) == \
        sorted(map(tuple, src.collect()))
