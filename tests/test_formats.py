"""Round-8 interchange-format codecs: ZIP (stdlib-interop both
directions), Avro OCF (spec vectors + framing), EXIF/TIFF (both byte
orders). Per SURVEY.md §5: corruption raises ValueError, valid-but-
unsupported raises NotImplementedError, and every writer round-trips
through an independent reader where one exists in the stdlib."""

from __future__ import annotations

import io
import struct
import zipfile

import pytest

from challenge8_movies_etl_spark.operators.avro import (
    decode_ocf,
    encode_ocf,
    zigzag_decode,
    zigzag_encode,
)
from challenge8_movies_etl_spark.operators.containers import (
    decode_zip,
    encode_zip,
)
from challenge8_movies_etl_spark.operators.exif import (
    TAG_EXPOSURE,
    TAG_MAKE,
    TAG_WIDTH,
    build_exif,
    parse_exif,
)

# ---------------------------------------------------------------------------
# ZIP
# ---------------------------------------------------------------------------

_MEMBERS = [("a/x.txt", b"hello world" * 20, "deflate"),
            ("b.bin", bytes(range(256)), "stored"),
            ("empty", b"", "deflate")]


def test_zip_readable_by_stdlib_zipfile():
    buf = encode_zip(_MEMBERS)
    zf = zipfile.ZipFile(io.BytesIO(buf))
    assert zf.testzip() is None  # stdlib CRC pass over every member
    for name, content, _ in _MEMBERS:
        assert zf.read(name) == content


def test_zip_decodes_stdlib_zipfile_output():
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("q.txt", b"abc" * 100)
        z.writestr("r.txt", b"xyz")
    got = decode_zip(bio.getvalue())
    assert [(n, c) for n, _, c in got] == [("q.txt", b"abc" * 100),
                                           ("r.txt", b"xyz")]


def test_zip_crc_corruption_raises():
    buf = bytearray(encode_zip(_MEMBERS))
    # flip a payload byte of the stored member (content of b.bin)
    at = buf.find(bytes(range(256)))
    buf[at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC-32"):
        decode_zip(bytes(buf))


def test_zip_encrypted_member_raises_not_implemented():
    buf = bytearray(encode_zip([("s.txt", b"data", "stored")]))
    # set general-purpose bit 0 in the central directory entry
    cd = buf.find(b"PK\x01\x02")
    buf[cd + 8] |= 0x1
    with pytest.raises(NotImplementedError, match="encrypted"):
        decode_zip(bytes(buf))


def test_zip_missing_eocd_raises():
    with pytest.raises(ValueError, match="end-of-central-directory"):
        decode_zip(b"PK\x03\x04" + b"\x00" * 40)


# ---------------------------------------------------------------------------
# Avro
# ---------------------------------------------------------------------------

_SCHEMA = {"type": "record", "name": "r", "fields": [
    {"name": "rid", "type": "long"},
    {"name": "name", "type": "string"},
    {"name": "value", "type": "double"}]}

_RECS = [{"rid": i * 7 - 3, "name": f"n{i}", "value": i + 0.25}
         for i in range(9)]


def test_zigzag_spec_vectors():
    """The exact example table from the Avro specification."""
    vectors = {0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03",
               2: b"\x04", -64: b"\x7f", 64: b"\x80\x01"}
    for n, b in vectors.items():
        assert zigzag_encode(n) == b, n
        assert zigzag_decode(b, 0) == (n, len(b)), n


def test_avro_roundtrip_null_and_deflate_multiblock():
    for codec in ("null", "deflate"):
        buf = encode_ocf(_SCHEMA, _RECS, codec, block_size=2)
        schema, got_codec, recs = decode_ocf(buf)
        assert got_codec == codec
        assert recs == _RECS
        assert schema["fields"][0]["name"] == "rid"


def test_avro_sync_marker_corruption_raises():
    buf = bytearray(encode_ocf(_SCHEMA, _RECS, "null", block_size=4))
    buf[-1] ^= 0xFF  # last sync marker byte
    with pytest.raises(ValueError, match="sync"):
        decode_ocf(bytes(buf))


def test_avro_bad_magic_and_union_schema():
    with pytest.raises(ValueError, match="magic"):
        decode_ocf(b"Obj\x02" + b"\x00" * 32)
    union = {"type": "record", "name": "u", "fields": [
        {"name": "x", "type": ["null", "long"]}]}
    with pytest.raises(NotImplementedError, match="field type"):
        encode_ocf(union, [])


# ---------------------------------------------------------------------------
# EXIF
# ---------------------------------------------------------------------------

def _blob(big_endian: bool) -> bytes:
    return build_exif(big_endian=big_endian, width=640, height=480,
                      make="ACME", datetime="2024:01:02 03:04:05",
                      orientation=6, exposure=(1, 125), iso=200)


def test_exif_roundtrip_both_byte_orders():
    for be in (False, True):
        tags = parse_exif(_blob(be))
        assert tags[TAG_WIDTH] == 640
        assert tags[TAG_MAKE] == "ACME"
        assert tags[TAG_EXPOSURE] == (1, 125)


def test_exif_ii_and_mm_blobs_differ_but_parse_identically():
    assert _blob(False) != _blob(True)
    assert parse_exif(_blob(False)) == parse_exif(_blob(True))


def test_exif_corruption_classes():
    with pytest.raises(ValueError, match="byte-order"):
        parse_exif(b"XX" + b"\x00" * 10)
    blob = bytearray(_blob(False))
    # TIFF magic 42 -> 43
    blob[6 + 2] = 43
    with pytest.raises(ValueError, match="magic"):
        parse_exif(bytes(blob))
    # out-of-range IFD offset
    blob = bytearray(_blob(False))
    struct.pack_into("<I", blob, 6 + 4, 2 ** 24)
    with pytest.raises(ValueError, match="offset"):
        parse_exif(bytes(blob))


def test_exif_unsupported_field_type_raises_not_implemented():
    blob = bytearray(_blob(False))
    # first IFD0 entry starts at tiff+8+2; its type field is at +2
    at = 6 + 8 + 2 + 2
    struct.pack_into("<H", blob, at, 13)  # type 13: not a TIFF 6.0 type
    with pytest.raises(NotImplementedError, match="field type"):
        parse_exif(bytes(blob))
