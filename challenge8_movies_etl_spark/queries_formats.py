"""Interchange-format queries (round 8): ZIP archives, Avro object
container files, and EXIF/TIFF image metadata — the three remaining
byte-level formats a data-lake ingest actually meets (dataset dumps
ship as .zip, log interchange as .avro, camera JPEGs carry APP1 EXIF).

Same contract as the round-6/7 crawl front door (queries_crawl.py):
each query synthesizes the container deterministically from fixture
columns inside one Arrow pass, decodes it with the from-scratch codec
(operators/containers.py encode_zip/decode_zip, operators/avro.py,
operators/exif.py), and the DuckDB oracle re-derives the expected
output in closed form — so a hash match proves the full encode→decode
loop is lossless with no decoder on the oracle side.

Scale: all three are zero-shuffle fused mapInPandas chains (encode and
decode in the SAME task, one Arrow batch resident); at 100 TB each
shard decodes independently — parallelism == partition count, no
driver involvement, no skew coupling.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F

from .registry import query
from .sources.fixtures import load_table


# ---------------------------------------------------------------------------
# q_zip_extract — ZIP archive walk via the central directory
# ---------------------------------------------------------------------------

@query(
    "q_zip_extract",
    oracle="""
    WITH params AS (
      SELECT doc_id, text, 1 + doc_id % 3 AS m FROM documents
    )
    SELECT doc_id,
           m AS n_members,
           (m + doc_id % 2) // 2 AS n_deflate,
           cast(strlen(text) as bigint) AS total_bytes,
           'doc' || cast(doc_id as varchar) || '/part'
             || cast(m - 1 as varchar) || '.txt' AS last_name,
           md5(text) AS digest
    FROM params
    """,
)
def q_zip_extract(spark, sf_dir):
    """ZIP archive extraction: per document a .zip with m = 1+doc_id%3
    members (the text split into m contiguous chunks, methods
    alternating stored/deflate by (doc_id+i) parity) is written and
    then decoded THROUGH THE CENTRAL DIRECTORY — EOCD scan-back, CD
    walk, per-member local-header random access, CRC-32 verification —
    the way unzip and every archive reader actually work
    (operators/containers.py encode_zip/decode_zip). Spark re-hashes
    the concatenated member payloads; the oracle hashes the original
    text — equality proves chunking + deflate + CRC round-trip
    losslessly. n_deflate's closed form (m + parity) // 2 counts the
    alternating methods."""
    d = load_table(spark, sf_dir, "documents")

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .operators.containers import decode_zip, encode_zip
        for pdf in batches:
            out = {"doc_id": [], "n_members": [], "n_deflate": [],
                   "total_bytes": [], "last_name": [], "joined": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                raw = text.encode()
                m = 1 + doc_id % 3
                bounds = [len(raw) * i // m for i in range(m + 1)]
                members = [
                    (f"doc{doc_id}/part{i}.txt",
                     raw[bounds[i]:bounds[i + 1]],
                     "deflate" if (doc_id + i) % 2 else "stored")
                    for i in range(m)]
                got = decode_zip(encode_zip(members))
                out["doc_id"].append(doc_id)
                out["n_members"].append(len(got))
                out["n_deflate"].append(
                    sum(meth == "deflate" for _, meth, _ in got))
                out["total_bytes"].append(
                    sum(len(c) for _, _, c in got))
                out["last_name"].append(got[-1][0])
                out["joined"].append(
                    b"".join(c for _, _, c in got).decode())
            yield pd.DataFrame(out)

    dec = d.select("doc_id", "text").mapInPandas(
        roundtrip,
        schema="doc_id bigint, n_members bigint, n_deflate bigint, "
               "total_bytes bigint, last_name string, joined string")
    return dec.select(
        "doc_id", "n_members", "n_deflate", "total_bytes", "last_name",
        F.md5(F.encode("joined", "utf-8")).alias("digest"))


# ---------------------------------------------------------------------------
# q_avro_extract — Avro object container file decode
# ---------------------------------------------------------------------------

_AVRO_SCHEMA = {
    "type": "record", "name": "row", "fields": [
        {"name": "rid", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "value", "type": "double"}]}


@query(
    "q_avro_extract",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 1 THEN 'deflate' ELSE 'null' END
             AS codec,
           cast(u.i as bigint) AS rec_idx,
           doc_id * 10 + u.i AS rid,
           lang || '-' || cast(u.i as varchar) AS name,
           cast(n_chars + u.i as double) + 0.25 AS value
    FROM documents, unnest(range(0, 1 + doc_id % 4)) AS u(i)
    """,
)
def q_avro_extract(spark, sf_dir):
    """Avro object-container-file ingestion: per document an OCF with
    k = 1+doc_id%4 records (schema {rid long, name string, value
    double}) is serialized — zigzag-varint longs, length-prefixed
    strings, IEEE-754 LE doubles, metadata map, per-block sync markers,
    'deflate' block codec on odd docs — then decoded by the
    spec-driven reader (operators/avro.py, Avro 1.11 binary encoding +
    OCF framing, no avro library) and exploded back to rows. block_size
    =2 forces multi-block files so the sync-marker path is exercised on
    every doc with k>2. The oracle regenerates the records relationally
    — a hash match pins varint/zigzag/double encoding end to end."""
    d = load_table(spark, sf_dir, "documents")

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .operators.avro import decode_ocf, encode_ocf
        for pdf in batches:
            out = {"doc_id": [], "codec": [], "rec_idx": [],
                   "rid": [], "name": [], "value": []}
            for doc_id, lang, n_chars in zip(
                    pdf["doc_id"], pdf["lang"], pdf["n_chars"]):
                doc_id, n_chars = int(doc_id), int(n_chars)
                k = 1 + doc_id % 4
                codec = "deflate" if doc_id % 2 else "null"
                recs = [{"rid": doc_id * 10 + i,
                         "name": f"{lang}-{i}",
                         "value": float(n_chars + i) + 0.25}
                        for i in range(k)]
                _, got_codec, got = decode_ocf(
                    encode_ocf(_AVRO_SCHEMA, recs, codec, block_size=2))
                for i, rec in enumerate(got):
                    out["doc_id"].append(doc_id)
                    out["codec"].append(got_codec)
                    out["rec_idx"].append(i)
                    out["rid"].append(rec["rid"])
                    out["name"].append(rec["name"])
                    out["value"].append(rec["value"])
            yield pd.DataFrame(out)

    return d.select("doc_id", "lang", "n_chars").mapInPandas(
        roundtrip,
        schema="doc_id bigint, codec string, rec_idx bigint, "
               "rid bigint, name string, value double")


# ---------------------------------------------------------------------------
# q_image_exif — EXIF/TIFF metadata extraction (both byte orders)
# ---------------------------------------------------------------------------

@query(
    "q_image_exif",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 1 THEN 'MM' ELSE 'II' END
             AS byte_order,
           320 + (doc_id % 8) * 16 AS width,
           240 + (doc_id % 6) * 20 AS height,
           'cam-' || source AS make,
           '2024:01:' || lpad(cast(1 + doc_id % 28 as varchar), 2, '0')
             || ' 12:30:45' AS taken_at,
           cast(1 + doc_id % 8 as bigint) AS orientation,
           cast(30 + doc_id % 200 as bigint) AS exposure_den,
           cast(100 * (1 + doc_id % 8) as bigint) AS iso
    FROM documents
    """,
)
def q_image_exif(spark, sf_dir):
    """EXIF metadata extraction — the step an image-ingest pipeline
    runs on every camera JPEG's APP1 segment before any pixel work:
    per document an ``Exif\\x00\\x00`` + TIFF blob is built (byte order
    alternating II/MM by doc parity, so BOTH endianness paths decode on
    every batch) and parsed by the TIFF 6.0 IFD walker
    (operators/exif.py): inline vs offset values, ASCII / SHORT / LONG
    / RATIONAL field types, and the Exif sub-IFD behind tag 0x8769.
    The oracle recomputes each field's closed form; a hash match pins
    offset arithmetic and byte-order handling across the whole fleet
    of tags."""
    d = load_table(spark, sf_dir, "documents")

    def roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .operators.exif import (
            TAG_DATETIME, TAG_EXPOSURE, TAG_HEIGHT, TAG_ISO, TAG_MAKE,
            TAG_ORIENTATION, TAG_WIDTH, build_exif, parse_exif)
        for pdf in batches:
            out = {"doc_id": [], "byte_order": [], "width": [],
                   "height": [], "make": [], "taken_at": [],
                   "orientation": [], "exposure_den": [], "iso": []}
            for doc_id, source in zip(pdf["doc_id"], pdf["source"]):
                doc_id = int(doc_id)
                be = doc_id % 2 == 1
                blob = build_exif(
                    big_endian=be,
                    width=320 + (doc_id % 8) * 16,
                    height=240 + (doc_id % 6) * 20,
                    make=f"cam-{source}",
                    datetime=f"2024:01:{1 + doc_id % 28:02d} 12:30:45",
                    orientation=1 + doc_id % 8,
                    exposure=(1, 30 + doc_id % 200),
                    iso=100 * (1 + doc_id % 8))
                tags = parse_exif(blob)
                out["doc_id"].append(doc_id)
                out["byte_order"].append("MM" if be else "II")
                out["width"].append(tags[TAG_WIDTH])
                out["height"].append(tags[TAG_HEIGHT])
                out["make"].append(tags[TAG_MAKE])
                out["taken_at"].append(tags[TAG_DATETIME])
                out["orientation"].append(tags[TAG_ORIENTATION])
                out["exposure_den"].append(tags[TAG_EXPOSURE][1])
                out["iso"].append(tags[TAG_ISO])
            yield pd.DataFrame(out)

    return d.select("doc_id", "source").mapInPandas(
        roundtrip,
        schema="doc_id bigint, byte_order string, width bigint, "
               "height bigint, make string, taken_at string, "
               "orientation bigint, exposure_den bigint, iso bigint")
