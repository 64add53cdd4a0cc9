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


def test_xml_roundtrip_value_exact(spark, tmp_path):
    from challenge8_movies_etl_spark.sources.raw import read_xml, write_xml
    from challenge8_movies_etl_spark.sources.fixtures import load_table
    src = load_table(spark, SF_SMOKE, "nation") \
        .select("n_nationkey", "n_name", "n_regionkey")
    path = str(tmp_path / "nation_xml")
    write_xml(src, path, row_tag="nation")
    back = read_xml(spark, path, row_tag="nation", schema=src.schema)
    assert sorted(back.collect()) == sorted(src.collect())


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


def test_partitioned_write_enables_partition_pruning(spark, tmp_path):
    """Hive-style partitionBy + a filter on the partition column must
    prune at PLANNING time (PartitionFilters on the scan, only the
    matching directory's files read) — the mechanism that turns a
    100 TB scan into a 1-partition scan."""
    from pyspark.sql import functions as F
    from challenge8_movies_etl_spark.sources.fixtures import load_table
    from challenge8_movies_etl_spark.sources.raw import (
        write_partitioned_parquet,
    )
    src = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned_parquet(src, path, partition_by=["event_type"])
    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "event_type" in plan.split("PartitionFilters")[1][:200]
    # only the click partition's files are touched
    files = back.select(F.input_file_name()).distinct().collect()
    assert files and all("event_type=click" in r[0] for r in files)
    want = src.filter(F.col("event_type") == "click").count()
    assert back.count() == want


def test_json_corrupt_records_quarantined(spark, tmp_path):
    """PERMISSIVE JSON ingest with an explicit _corrupt_record column:
    malformed lines land in the quarantine column instead of failing
    the job — the at-scale posture for messy feeds (a FAILFAST full
    abort on one bad record in 100 TB is not an option; the quarantine
    column makes bad rows auditable and re-processable)."""
    p = tmp_path / "messy.jsonl"
    p.write_text('{"id": 1, "name": "ok"}\n'
                 'this is not json\n'
                 '{"id": 2, "name": "also ok"}\n'
                 '{"id": "NaN-ish", "name": 3}\n')
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ])
    df = read_json_ragged(spark, str(p), schema=schema).cache()
    assert df.count() == 4
    bad = df.filter(df._corrupt_record.isNotNull())
    # the plain-text line is quarantined whole; the type-mismatch row
    # keeps its parseable fields and is quarantined too
    assert bad.count() == 2
    good = df.filter(df._corrupt_record.isNull())
    assert sorted(r["id"] for r in good.collect()) == [1, 2]
    df.unpersist()


def test_jsonl_sharded_export_roundtrip(spark, tmp_path):
    """JSONL shard export: manifest counts match, shards are balanced,
    and a JSON read reconstructs every row."""
    import glob
    import json

    from challenge8_movies_etl_spark.sources.fixtures import load_table
    from challenge8_movies_etl_spark.sources.raw import write_jsonl_sharded

    d = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", "n_chars")
    out = str(tmp_path / "export")
    manifest = write_jsonl_sharded(d, out, shard_rows=100)
    assert manifest["n_rows"] == d.count()
    assert manifest["n_shards"] == (manifest["n_rows"] + 99) // 100
    files = glob.glob(out + "/part-*.txt.gz")
    assert len(files) == manifest["n_shards"]
    with open(out + "/_manifest.json") as fh:
        assert json.load(fh)["columns"] == ["doc_id", "lang", "n_chars"]

    back = spark.read.json(out + "/part-*.txt.gz")
    assert back.count() == manifest["n_rows"]
    src = {(r["doc_id"], r["lang"], r["n_chars"]) for r in d.collect()}
    dst = {(r["doc_id"], r["lang"], r["n_chars"]) for r in back.collect()}
    assert src == dst


def test_binary_file_source_reads_real_payloads(spark, tmp_path):
    """binaryFile ingest: encoded BMP/PPM files written to disk come
    back byte-identical with correct lengths, and the glob filter
    prunes at the listing (non-matching files are never surfaced)."""
    from challenge8_movies_etl_spark.operators.multimodal import (
        encode_bmp, encode_ppm)
    from challenge8_movies_etl_spark.sources.raw import read_binary_files

    payloads = {}
    for i in range(4):
        body = (encode_bmp if i % 2 == 0 else encode_ppm)(
            i + 1, i + 2, i * 10, i * 20 % 256, i * 30 % 256)
        ext = "bmp" if i % 2 == 0 else "ppm"
        p = tmp_path / f"img_{i}.{ext}"
        p.write_bytes(body)
        payloads[p.name] = body
    (tmp_path / "notes.txt").write_text("not an image")

    df = read_binary_files(spark, str(tmp_path))
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == set(payloads) | {"notes.txt"}
    for name, body in payloads.items():
        assert bytes(rows[name]["content"]) == body
        assert rows[name]["length"] == len(body)

    only_bmp = read_binary_files(spark, str(tmp_path), glob="*.bmp")
    names = {r["path"].rsplit("/", 1)[-1] for r in only_bmp.collect()}
    assert names == {n for n in payloads if n.endswith(".bmp")}


def test_json_quarantine_splits_clean_from_corrupt(spark, tmp_path):
    """Malformed JSON lines land whole in _corrupt_record; clean rows
    parse; neither kills the job. The quarantine fraction is exact."""
    from challenge8_movies_etl_spark.sources.raw import (
        read_json_with_quarantine,
    )
    from pyspark.sql import types as T

    p = tmp_path / "mixed.jsonl"
    p.write_text('\n'.join([
        '{"id": 1, "name": "ok"}',
        '{"id": 2, "name": "also ok"}',
        '{"id": 3, "name": broken',          # malformed
        'not json at all',                   # malformed
        '{"id": 5, "name": "fine"}',
    ]))
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("name", T.StringType())])
    df = read_json_with_quarantine(spark, str(p), schema).cache()
    clean = df.filter("_corrupt_record IS NULL")
    quarantined = df.filter("_corrupt_record IS NOT NULL")
    assert clean.count() == 3
    assert quarantined.count() == 2
    assert {r["id"] for r in clean.collect()} == {1, 2, 5}
    # the corrupt payload is preserved verbatim for re-driving
    bad = {r["_corrupt_record"] for r in quarantined.collect()}
    assert "not json at all" in bad
    df.unpersist()
