"""Protocol Buffers wire-format codec — implemented from the public
protobuf encoding specification (developers.google.com/protocol-buffers
/docs/encoding), no protobuf library: base-128 varints, ZigZag sint64,
fixed32/fixed64, length-delimited fields, packed repeated scalars,
nested messages, and the forward-compatibility rule that unknown
fields are skipped by wire type (the property that lets old readers
consume new writers' logs).

This is the third varint dialect in the repo and they are NOT the
same: protobuf varints are unsigned with a separate ZigZag transform
for sint fields (Avro fuses ZigZag into every long; WARC/HTTP have no
varints at all).

ValueError = corrupt wire data; NotImplementedError = the deprecated
group wire types (3/4), which are valid protobuf this reader does not
support.
"""

from __future__ import annotations

import struct

_WT_VARINT, _WT_I64, _WT_LEN, _WT_SGROUP, _WT_EGROUP, _WT_I32 = range(6)


def encode_varint(n: int) -> bytes:
    if n < 0:
        n &= (1 << 64) - 1  # two's-complement 64-bit, per spec
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("protobuf: truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("protobuf: varint too long")


def zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else ((-n - 1) << 1) | 1


def unzigzag(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


def _tag(field_no: int, wire_type: int) -> bytes:
    return encode_varint(field_no << 3 | wire_type)


def encode_fields(fields: list[tuple[int, int, object]]) -> bytes:
    """Serialize (field_no, wire_type, value) triples in order; LEN
    fields take bytes, I64/I32 take pre-packed ints, VARINT raw ints."""
    out = bytearray()
    for no, wt, v in fields:
        out += _tag(no, wt)
        if wt == _WT_VARINT:
            out += encode_varint(v)
        elif wt == _WT_I64:
            out += struct.pack("<Q", v & (1 << 64) - 1)
        elif wt == _WT_I32:
            out += struct.pack("<I", v & (1 << 32) - 1)
        elif wt == _WT_LEN:
            out += encode_varint(len(v)) + bytes(v)
        else:
            raise NotImplementedError(f"protobuf: wire type {wt}")
    return bytes(out)


def parse_message(buf: bytes) -> dict[int, list[tuple[int, object]]]:
    """Parse one message → {field_no: [(wire_type, raw_value), ...]}
    (repeated fields accumulate in order). Unknown fields are the
    caller's concern — everything parseable is returned; group wire
    types raise NotImplementedError, reserved type 6/7 ValueError."""
    out: dict[int, list[tuple[int, object]]] = {}
    pos = 0
    while pos < len(buf):
        key, pos = decode_varint(buf, pos)
        no, wt = key >> 3, key & 0x7
        if no == 0:
            raise ValueError("protobuf: field number 0")
        if wt == _WT_VARINT:
            v, pos = decode_varint(buf, pos)
        elif wt == _WT_I64:
            if pos + 8 > len(buf):
                raise ValueError("protobuf: truncated fixed64")
            (v,) = struct.unpack_from("<Q", buf, pos)
            pos += 8
        elif wt == _WT_I32:
            if pos + 4 > len(buf):
                raise ValueError("protobuf: truncated fixed32")
            (v,) = struct.unpack_from("<I", buf, pos)
            pos += 4
        elif wt == _WT_LEN:
            n, pos = decode_varint(buf, pos)
            if pos + n > len(buf):
                raise ValueError("protobuf: truncated length-delimited")
            v = buf[pos:pos + n]
            pos += n
        elif wt in (_WT_SGROUP, _WT_EGROUP):
            raise NotImplementedError("protobuf: group wire types")
        else:
            raise ValueError(f"protobuf: reserved wire type {wt}")
        out.setdefault(no, []).append((wt, v))
    return out


def decode_packed_varints(raw: bytes) -> list[int]:
    out, pos = [], 0
    while pos < len(raw):
        v, pos = decode_varint(raw, pos)
        out.append(v)
    return out


# ---------------------------------------------------------------------------
# The fixture message used by q_protobuf_extract
# ---------------------------------------------------------------------------
# message DocMeta {
#   int64  id     = 1;   sint64 delta  = 2;   string lang  = 3;
#   double score  = 4;   repeated int32 tags = 5 [packed];
#   fixed64 hash64 = 8;  Sub sub = 9 { int32 a = 1; string b = 2; }
# }  (field 7 appears on the wire but NOT in this schema -> skipped)

def encode_docmeta(*, id: int, delta: int, lang: str, score: float,
                   tags: list[int], hash64: int, sub_a: int,
                   sub_b: str, unknown7: bytes | None = None) -> bytes:
    sub = encode_fields([(1, _WT_VARINT, sub_a),
                         (2, _WT_LEN, sub_b.encode())])
    fields = [
        (1, _WT_VARINT, id),
        (2, _WT_VARINT, zigzag(delta)),
        (3, _WT_LEN, lang.encode()),
        (4, _WT_I64, struct.unpack("<Q", struct.pack("<d", score))[0]),
        (5, _WT_LEN, b"".join(encode_varint(t) for t in tags)),
    ]
    if unknown7 is not None:
        fields.append((7, _WT_LEN, unknown7))
    fields += [(8, _WT_I64, hash64), (9, _WT_LEN, sub)]
    return encode_fields(fields)


def decode_docmeta(buf: bytes) -> dict:
    m = parse_message(buf)

    def one(no: int, wt: int):
        vals = m.get(no, [])
        if len(vals) != 1 or vals[0][0] != wt:
            raise ValueError(f"protobuf: field {no} missing/mistyped")
        return vals[0][1]

    sub = parse_message(one(9, _WT_LEN))
    return {
        "id": one(1, _WT_VARINT),
        "delta": unzigzag(one(2, _WT_VARINT)),
        "lang": one(3, _WT_LEN).decode(),
        "score": struct.unpack(
            "<d", struct.pack("<Q", one(4, _WT_I64)))[0],
        "tags": decode_packed_varints(one(5, _WT_LEN)),
        "hash64": one(8, _WT_I64),
        "sub_a": sub[1][0][1],
        "sub_b": sub[2][0][1].decode(),
        "n_unknown": sum(len(v) for no, v in m.items()
                         if no not in (1, 2, 3, 4, 5, 8, 9)),
    }
