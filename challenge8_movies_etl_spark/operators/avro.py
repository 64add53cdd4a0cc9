"""Avro Object Container File codec — writer + reader implemented from
the public Avro 1.11 specification (binary encoding + OCF framing), no
avro library: zigzag-varint longs, length-prefixed strings, file
metadata as an Avro map, 16-byte sync markers between blocks, and the
``null`` / ``deflate`` block codecs (deflate is the raw RFC 1951
stream, per spec).

The reader is schema-driven for primitive-typed record schemas (the
flat shape analytics interchange actually uses); nested/union schemas
raise NotImplementedError — an honest refusal, not a stub. Corruption
(bad magic, sync mismatch, trailing garbage) raises ValueError,
matching the repo-wide convention: ValueError = corrupt input,
NotImplementedError = valid-but-unsupported feature.
"""

from __future__ import annotations

import hashlib
import json
import struct
import zlib

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# Primitive binary encoding
# ---------------------------------------------------------------------------

def zigzag_encode(n: int) -> bytes:
    """Avro long: zigzag then base-128 varint, little-endian groups."""
    z = (n << 1) ^ (n >> 63) if n >= 0 else ((-n - 1) << 1 | 1)
    # equivalently ((n << 1) ^ (n >> 63)) on 64-bit ints; python ints
    # are unbounded so branch instead of masking
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    """Decode one varint-zigzag long at ``pos`` → (value, new_pos)."""
    shift = z = 0
    while True:
        if pos >= len(buf):
            raise ValueError("avro: truncated varint")
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("avro: varint too long")
    return (z >> 1) ^ -(z & 1), pos


def _enc_string(s: str) -> bytes:
    b = s.encode()
    return zigzag_encode(len(b)) + b


def _enc_bytes(b: bytes) -> bytes:
    return zigzag_encode(len(b)) + b


def _dec_sized(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = zigzag_decode(buf, pos)
    if n < 0 or pos + n > len(buf):
        raise ValueError("avro: bad length prefix")
    return buf[pos:pos + n], pos + n


# ---------------------------------------------------------------------------
# Record encoding for flat primitive schemas
# ---------------------------------------------------------------------------

_ENCODERS = {
    "long": zigzag_encode,
    "int": zigzag_encode,
    "string": _enc_string,
    "bytes": _enc_bytes,
    "boolean": lambda v: b"\x01" if v else b"\x00",
    "double": lambda v: struct.pack("<d", v),
    "float": lambda v: struct.pack("<f", v),
}


def _field_types(schema: dict) -> list[tuple[str, str]]:
    if schema.get("type") != "record":
        raise NotImplementedError(
            f"avro: top-level {schema.get('type')!r} schema")
    out = []
    for f in schema["fields"]:
        t = f["type"]
        if not isinstance(t, str) or t not in _ENCODERS:
            raise NotImplementedError(f"avro: field type {t!r}")
        out.append((f["name"], t))
    return out


def encode_record(schema: dict, rec: dict) -> bytes:
    return b"".join(_ENCODERS[t](rec[n]) for n, t in _field_types(schema))


def decode_record(buf: bytes, pos: int,
                  fields: list[tuple[str, str]]) -> tuple[dict, int]:
    rec = {}
    for name, t in fields:
        if t in ("long", "int"):
            rec[name], pos = zigzag_decode(buf, pos)
        elif t == "string":
            raw, pos = _dec_sized(buf, pos)
            rec[name] = raw.decode()
        elif t == "bytes":
            rec[name], pos = _dec_sized(buf, pos)
        elif t == "boolean":
            if pos + 1 > len(buf):
                raise ValueError("avro: truncated record")
            rec[name] = buf[pos] != 0
            pos += 1
        elif t == "double":
            if pos + 8 > len(buf):
                raise ValueError("avro: truncated record")
            rec[name] = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif t == "float":
            if pos + 4 > len(buf):
                raise ValueError("avro: truncated record")
            rec[name] = struct.unpack_from("<f", buf, pos)[0]
            pos += 4
    return rec, pos


# ---------------------------------------------------------------------------
# Object Container File
# ---------------------------------------------------------------------------

def encode_ocf(schema: dict, records: list[dict], codec: str = "null",
               block_size: int = 16) -> bytes:
    """Write an OCF: magic, metadata map {avro.schema, avro.codec},
    sync marker (md5 of the schema text — deterministic so identical
    inputs produce identical files), then blocks of ``block_size``
    records, each framed (count, byte-size, payload, sync)."""
    _field_types(schema)  # validate eagerly, even for an empty file
    schema_json = json.dumps(schema, sort_keys=True,
                             separators=(",", ":"))
    sync = hashlib.md5(schema_json.encode()).digest()
    meta = {"avro.schema": schema_json, "avro.codec": codec}
    out = bytearray(_MAGIC)
    out += zigzag_encode(len(meta))
    for k in sorted(meta):
        out += _enc_string(k) + _enc_bytes(meta[k].encode())
    out += zigzag_encode(0)  # end of map
    out += sync
    for i in range(0, len(records), block_size):
        chunk = records[i:i + block_size]
        payload = b"".join(encode_record(schema, r) for r in chunk)
        if codec == "deflate":
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = co.compress(payload) + co.flush()
        elif codec != "null":
            raise NotImplementedError(f"avro: codec {codec!r}")
        out += zigzag_encode(len(chunk))
        out += zigzag_encode(len(payload))
        out += payload + sync
    return bytes(out)


def decode_ocf(buf: bytes) -> tuple[dict, str, list[dict]]:
    """Read an OCF → (schema, codec, records). Handles multi-block
    metadata maps including the negative-count form the spec allows
    (count < 0 means |count| entries preceded by a byte size)."""
    if buf[:4] != _MAGIC:
        raise ValueError("avro: bad magic")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = zigzag_decode(buf, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _, pos = zigzag_decode(buf, pos)  # byte size, unused
        for _ in range(n):
            k, pos = _dec_sized(buf, pos)
            v, pos = _dec_sized(buf, pos)
            meta[k.decode()] = v
    if "avro.schema" not in meta:
        raise ValueError("avro: missing avro.schema metadata")
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro: codec {codec!r}")
    fields = _field_types(schema)
    sync = buf[pos:pos + 16]
    if len(sync) != 16:
        raise ValueError("avro: truncated sync marker")
    pos += 16
    records: list[dict] = []
    while pos < len(buf):
        count, pos = zigzag_decode(buf, pos)
        size, pos = zigzag_decode(buf, pos)
        if count < 0 or size < 0 or pos + size + 16 > len(buf):
            raise ValueError("avro: bad block frame")
        payload = buf[pos:pos + size]
        pos += size
        if buf[pos:pos + 16] != sync:
            raise ValueError("avro: sync marker mismatch")
        pos += 16
        if codec == "deflate":
            payload = zlib.decompressobj(-15).decompress(payload)
        p = 0
        for _ in range(count):
            rec, p = decode_record(payload, p, fields)
            records.append(rec)
        if p != len(payload):
            raise ValueError("avro: trailing bytes in block")
    return schema, codec, records
