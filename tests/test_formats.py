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


# ---------------------------------------------------------------------------
# Protobuf wire format
# ---------------------------------------------------------------------------

def test_protobuf_spec_vectors():
    """The canonical examples from the protobuf encoding docs:
    field 1 = varint 150 -> 08 96 01; field 2 = string "testing" ->
    12 07 74 65 73 74 69 6e 67."""
    from challenge8_movies_etl_spark.operators.proto import (
        encode_fields, encode_varint, parse_message)

    assert encode_fields([(1, 0, 150)]) == bytes.fromhex("089601")
    assert encode_fields([(2, 2, b"testing")]) == \
        bytes.fromhex("120774657374696e67")
    assert encode_varint(300) == bytes.fromhex("ac02")
    m = parse_message(bytes.fromhex("089601"))
    assert m == {1: [(0, 150)]}


def test_protobuf_zigzag_and_unknown_field_skip():
    from challenge8_movies_etl_spark.operators.proto import (
        decode_docmeta, encode_docmeta, unzigzag, zigzag)

    for n in (0, -1, 1, -2, 2, 2147483647, -2147483648, 2**62, -2**62):
        assert unzigzag(zigzag(n)) == n, n
    blob = encode_docmeta(id=1, delta=-5, lang="en", score=1.5,
                          tags=[1, 2], hash64=2**63 + 17, sub_a=3,
                          sub_b="s", unknown7=b"future-field")
    rec = decode_docmeta(blob)
    assert rec["delta"] == -5 and rec["n_unknown"] == 1
    assert rec["hash64"] == 2**63 + 17  # unsigned fixed64 top bit


def test_protobuf_corruption_and_groups():
    from challenge8_movies_etl_spark.operators.proto import parse_message

    with pytest.raises(ValueError, match="truncated"):
        parse_message(bytes.fromhex("0896"))  # varint cut short
    with pytest.raises(ValueError, match="truncated"):
        parse_message(bytes.fromhex("120774657374"))  # LEN cut short
    with pytest.raises(NotImplementedError, match="group"):
        parse_message(bytes.fromhex("0b"))  # field 1, SGROUP


# ---------------------------------------------------------------------------
# CBOR
# ---------------------------------------------------------------------------

def test_cbor_rfc8949_appendix_a_vectors():
    from challenge8_movies_etl_spark.operators.cbor import decode, encode

    vectors = [
        (0, "00"), (24, "1818"), (1000000, "1a000f4240"),
        (-1, "20"), (-1000, "3903e7"),
        (1.1, "fb3ff199999999999a"), (1.5, "f93e00"),
        (65504.0, "f97bff"), (100000.0, "fa47c35000"),
        (5.960464477539063e-08, "f90001"),
        (False, "f4"), (True, "f5"), (None, "f6"),
        ("IETF", "6449455446"), ("ü", "62c3bc"),
    ]
    for v, hexs in vectors:
        assert encode(v).hex() == hexs, v
        back = decode(bytes.fromhex(hexs))
        assert back == v and type(back) is type(v), v
    assert encode([1, [2, 3], [4, 5]]).hex() == "8301820203820405"
    assert encode({"a": 1, "b": [2, 3]}).hex() == "a26161016162820203"
    assert encode(float("inf")).hex() == "f97c00"
    assert encode(float("nan")).hex() == "f97e00"


def test_cbor_rejects_what_it_does_not_support():
    from challenge8_movies_etl_spark.operators.cbor import decode

    with pytest.raises(NotImplementedError, match="indefinite"):
        decode(bytes.fromhex("5f42010243030405ff"))
    with pytest.raises(NotImplementedError, match="tag"):
        decode(bytes.fromhex("c074323031332d30332d32315432303a30343a30305a"))
    with pytest.raises(ValueError, match="trailing"):
        decode(bytes.fromhex("0000"))
    with pytest.raises(ValueError, match="truncated"):
        decode(bytes.fromhex("19"))


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------

_PAL = [(10, 20, 5), (50, 50, 30), (90, 80, 55), (130, 110, 80)]


def test_gif_roundtrip_plain_and_interlaced():
    from challenge8_movies_etl_spark.operators.gif import (
        decode_gif, encode_gif)

    for w, h, inter in [(8, 8, False), (13, 9, True), (64, 33, True)]:
        idx = bytes((x * 7 + y * 3) % 4
                    for y in range(h) for x in range(w))
        rec = decode_gif(encode_gif(w, h, _PAL, idx, interlace=inter,
                                    comment="c" if inter else None))
        assert rec["indices"] == idx
        assert rec["interlaced"] == inter
        assert rec["palette"][:4] == _PAL


def test_gif_lzw_dictionary_reset_path():
    """An image large and varied enough to hit 4096 table entries
    forces the CLEAR-code reset mid-stream."""
    import hashlib

    from challenge8_movies_etl_spark.operators.gif import (
        decode_gif, encode_gif)

    big = bytes(hashlib.md5(bytes([i % 251, i % 17])).digest()[0] % 4
                for i in range(400 * 300))
    rec = decode_gif(encode_gif(400, 300, _PAL, big))
    assert rec["indices"] == big


def test_gif_corruption_classes():
    from challenge8_movies_etl_spark.operators.gif import (
        decode_gif, encode_gif)

    idx = bytes((x) % 4 for x in range(64))
    buf = bytearray(encode_gif(8, 8, _PAL, idx))
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"JIF87a" + bytes(buf[6:]))
    with pytest.raises(ValueError, match="truncated|EOI"):
        decode_gif(bytes(buf[:-10]))
    # local-color-table flag on the image descriptor -> unsupported
    at = buf.find(b"\x2c")
    buf[at + 9] |= 0x80
    with pytest.raises(NotImplementedError, match="local color"):
        decode_gif(bytes(buf))


# ---------------------------------------------------------------------------
# Property tests: random-input roundtrips for every round-8 codec
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 10 ** 6), st.binary(max_size=80)),
                min_size=0, max_size=6))
def test_zip_roundtrip_property(members):
    named = [(f"m{i}_{n}", c, "deflate" if (i + n) % 2 else "stored")
             for i, (n, c) in enumerate(members)]
    got = decode_zip(encode_zip(named))
    assert [(n, c) for n, _, c in got] == [(n, c) for n, c, _ in named]


@settings(max_examples=150, deadline=None)
@given(st.lists(st.fixed_dictionaries({
    "rid": st.integers(-2 ** 62, 2 ** 62),
    "name": st.text(max_size=20),
    "value": st.floats(allow_nan=False, width=64)}),
    max_size=12),
    st.sampled_from(["null", "deflate"]),
    st.integers(1, 4))
def test_avro_roundtrip_property(recs, codec, bs):
    _, got_codec, got = decode_ocf(encode_ocf(_SCHEMA, recs, codec,
                                              block_size=bs))
    assert got == recs and got_codec == codec


_CBOR_SCALAR = st.one_of(
    st.integers(-2 ** 63, 2 ** 64 - 1), st.text(max_size=12),
    st.binary(max_size=12), st.booleans(), st.none(),
    st.floats(width=64))

_CBOR_VALUE = st.recursive(
    _CBOR_SCALAR,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=6), children, max_size=4)),
    max_leaves=12)


@settings(max_examples=300, deadline=None)
@given(_CBOR_VALUE)
def test_cbor_roundtrip_property(v):
    import math

    from challenge8_movies_etl_spark.operators.cbor import decode, encode

    got = decode(encode(v))

    def eq(a, b):
        if isinstance(a, float) or isinstance(b, float):
            return (math.isnan(a) and math.isnan(b)) or a == b
        if isinstance(a, list):
            return len(a) == len(b) and all(map(eq, a, b))
        if isinstance(a, dict):
            return a.keys() == b.keys() and \
                all(eq(a[k], b[k]) for k in a)
        return a == b and type(a) is type(b)

    assert eq(got, v)


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 40), st.integers(1, 30), st.booleans(),
       st.integers(0, 2 ** 31))
def test_gif_roundtrip_property(w, h, inter, seed):
    import hashlib

    from challenge8_movies_etl_spark.operators.gif import (
        decode_gif, encode_gif)

    idx = bytes(hashlib.md5(f"{seed}-{i}".encode()).digest()[0] % 4
                for i in range(w * h))
    rec = decode_gif(encode_gif(w, h, _PAL, idx, interlace=inter))
    assert rec["indices"] == idx and rec["interlaced"] == inter


def test_gif_lzw_eoi_boundary_regression():
    """Pinned falsifying example (hypothesis w=1,h=13,seed=0, round-8
    verdict): the decoder's phantom table append after the FINAL data
    code lands exactly on len(table) == 1<<width, so it widens before
    reading EOI; the encoder must apply the same phantom-entry width
    check before emitting EOI or the decoder reads EOI at width+1 and
    raises 'LZW stream truncated before EOI'."""
    from challenge8_movies_etl_spark.operators.gif import (
        lzw_compress, lzw_decompress)

    px = bytes([3, 2, 3, 0, 3, 1, 1, 1, 2, 1, 2, 1, 2])
    assert lzw_decompress(lzw_compress(px, 2), 2, len(px)) == px


def test_gif_lzw_reset_tail_boundary():
    """Tail-boundary audit mirrored onto the 4096-reset path: long
    low-entropy streams that cross multiple CLEAR resets and end at
    assorted offsets past the reset must roundtrip (the phantom-entry
    check is guarded to codes that are not the first since a CLEAR)."""
    from challenge8_movies_etl_spark.operators.gif import (
        lzw_compress, lzw_decompress)

    import hashlib
    base = bytes(hashlib.md5(f"t-{i}".encode()).digest()[0] % 4
                 for i in range(30000))
    for tail in (0, 1, 2, 3, 7, 29, 311):
        px = base[:20000 + tail]
        assert lzw_decompress(lzw_compress(px, 2), 2, len(px)) == px


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 2 ** 62), st.integers(-2 ** 62, 2 ** 62),
       st.text(max_size=10), st.floats(allow_nan=False, width=64),
       st.lists(st.integers(0, 2 ** 31), max_size=5),
       st.integers(0, 2 ** 64 - 1))
def test_protobuf_roundtrip_property(pid, delta, lang, score, tags, h64):
    from challenge8_movies_etl_spark.operators.proto import (
        decode_docmeta, encode_docmeta)

    rec = decode_docmeta(encode_docmeta(
        id=pid, delta=delta, lang=lang, score=score, tags=tags,
        hash64=h64, sub_a=7, sub_b="s"))
    assert rec["id"] == pid and rec["delta"] == delta
    assert rec["lang"] == lang and rec["score"] == score
    assert rec["tags"] == tags and rec["hash64"] == h64


@settings(max_examples=200, deadline=None)
@given(st.booleans(), st.integers(1, 2 ** 31), st.integers(1, 2 ** 31),
       st.text(st.characters(min_codepoint=32, max_codepoint=126),
               max_size=16),
       st.integers(1, 8), st.integers(1, 2 ** 31), st.integers(1, 65535))
def test_exif_roundtrip_property(be, w, h, make, orient, den, iso):
    tags = parse_exif(build_exif(
        big_endian=be, width=w, height=h, make=make,
        datetime="2024:01:02 03:04:05", orientation=orient,
        exposure=(1, den), iso=iso))
    assert tags[TAG_WIDTH] == w and tags[TAG_MAKE] == make
    assert tags[TAG_EXPOSURE] == (1, den)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(0, 7), max_size=400), st.integers(0, 2 ** 31))
def test_rle_bitpack_roundtrip_property(vals, seed):
    """Arbitrary 3-bit sequences roundtrip through the hybrid codec —
    including run boundaries straddling the >=8 RLE switch and
    zero-padding in the final bit-packed group."""
    from challenge8_movies_etl_spark.operators.rle import (
        rle_bp_decode, rle_bp_encode)

    import hashlib
    extra = [hashlib.md5(f"{seed}-{i}".encode()).digest()[0] % 8
             for i in range(seed % 17)]
    v = vals + extra
    assert rle_bp_decode(rle_bp_encode(v, 3), 3, len(v)) == v


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 2 ** 20 - 1), max_size=100))
def test_rle_bitpack_wide_width(vals):
    from challenge8_movies_etl_spark.operators.rle import (
        rle_bp_decode, rle_bp_encode)

    assert rle_bp_decode(rle_bp_encode(vals, 20), 20, len(vals)) == vals


def test_rle_bitpack_framing_and_errors():
    from challenge8_movies_etl_spark.operators.rle import (
        rle_bp_decode, rle_bp_encode)

    import pytest

    # pure RLE regime: runs of 10 -> 2 bytes per run at width 3
    v = [1] * 10 + [2] * 10
    blob = rle_bp_encode(v, 3)
    assert len(blob) == 4 and rle_bp_decode(blob, 3, 20) == v
    # pure bit-packed regime: 12 values -> header + 2 groups x 3 bytes
    v = [i % 8 for i in range(12)]
    blob = rle_bp_encode(v, 3)
    assert len(blob) == 7 and rle_bp_decode(blob, 3, 12) == v
    # corruption taxonomy: every truncation raises ValueError
    for cut in range(len(blob)):
        with pytest.raises(ValueError):
            rle_bp_decode(blob[:cut], 3, 12)
    with pytest.raises(ValueError):
        rle_bp_decode(blob + b"\x00", 3, 12)  # trailing bytes
    with pytest.raises(ValueError):
        rle_bp_encode([8], 3)  # value exceeds bit_width


@settings(max_examples=120, deadline=None)
@given(st.lists(st.integers(-2 ** 40, 2 ** 40), max_size=300),
       st.integers(0, 2 ** 31))
def test_delta_bp_roundtrip_property(vals, seed):
    """Arbitrary int64 sequences roundtrip — negative deltas, block
    boundaries at 128, partial miniblocks, empty input."""
    from challenge8_movies_etl_spark.operators.delta_bp import (
        delta_bp_decode, delta_bp_encode)

    import hashlib
    extra = [int.from_bytes(hashlib.md5(f"{seed}-{i}".encode())
                            .digest()[:4], "big") - 2 ** 31
             for i in range(seed % 9)]
    v = vals + extra
    assert delta_bp_decode(delta_bp_encode(v)) == v


def test_delta_bp_framing_and_errors():
    from challenge8_movies_etl_spark.operators.delta_bp import (
        delta_bp_decode, delta_bp_encode)

    import pytest

    # constant deltas -> all widths 0, no miniblock payload at all
    v = list(range(0, 500, 5))
    blob = delta_bp_encode(v)
    assert delta_bp_decode(blob) == v
    # header(2+1+1+1) + ceil(99/128)=1 block x (1 zigzag + 4 widths)
    assert len(blob) == 5 + 5
    for cut in range(1, len(blob)):
        with pytest.raises(ValueError):
            delta_bp_decode(blob[:cut])
    with pytest.raises(ValueError):
        delta_bp_decode(blob + b"\x00")
    assert delta_bp_decode(delta_bp_encode([])) == []
    assert delta_bp_decode(delta_bp_encode([-7])) == [-7]
