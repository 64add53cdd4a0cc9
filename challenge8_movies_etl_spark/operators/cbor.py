"""CBOR codec (RFC 8949) — encoder + decoder for the definite-length
core: unsigned/negative integers with shortest-form argument encoding,
byte and text strings, arrays, maps, booleans/null, and IEEE floats
(half/single/double decode; the encoder emits the canonical shortest
float that round-trips, per the RFC's preferred serialization).

Indefinite-length items and semantic tags are valid CBOR this decoder
does not support → NotImplementedError; structural damage (truncation,
reserved additional-info values, trailing bytes) → ValueError, per the
repo convention.
"""

from __future__ import annotations

import math
import struct


def _enc_head(major: int, arg: int) -> bytes:
    if arg < 24:
        return bytes([major << 5 | arg])
    for ai, fmt in ((24, "B"), (25, ">H"), (26, ">I"), (27, ">Q")):
        size = struct.calcsize(fmt)
        if arg < 1 << (8 * size):
            return bytes([major << 5 | ai]) + struct.pack(fmt, arg)
    raise ValueError("cbor: integer argument exceeds 64 bits")


def encode(obj) -> bytes:
    """Serialize a python value (int/str/bytes/bool/None/float/list/
    dict) with preferred (shortest-form) serialization."""
    if obj is False:
        return b"\xf4"
    if obj is True:
        return b"\xf5"
    if obj is None:
        return b"\xf6"
    if isinstance(obj, int):
        return _enc_head(0, obj) if obj >= 0 else _enc_head(1, -1 - obj)
    if isinstance(obj, bytes):
        return _enc_head(2, len(obj)) + obj
    if isinstance(obj, str):
        b = obj.encode()
        return _enc_head(3, len(b)) + b
    if isinstance(obj, list):
        return _enc_head(4, len(obj)) + b"".join(encode(x) for x in obj)
    if isinstance(obj, dict):
        out = _enc_head(5, len(obj))
        for k, v in obj.items():
            out += encode(k) + encode(v)
        return out
    if isinstance(obj, float):
        # preferred serialization: shortest float that round-trips
        if obj == obj:  # not NaN
            for ai, fmt in ((25, ">e"), (26, ">f")):
                try:
                    packed = struct.pack(fmt, obj)
                    if struct.unpack(fmt, packed)[0] == obj and \
                            math.copysign(1, struct.unpack(fmt, packed)[0]
                                          ) == math.copysign(1, obj):
                        return bytes([7 << 5 | ai]) + packed
                except OverflowError:
                    pass
        else:
            return b"\xf9\x7e\x00"  # canonical NaN, RFC 8949 §4.2.2
        return b"\xfb" + struct.pack(">d", obj)
    raise NotImplementedError(f"cbor: cannot encode {type(obj).__name__}")


def _dec(buf: bytes, pos: int):
    if pos >= len(buf):
        raise ValueError("cbor: truncated item")
    ib = buf[pos]
    major, ai = ib >> 5, ib & 0x1F
    pos += 1
    if ai < 24:
        arg = ai
    elif ai in (24, 25, 26, 27):
        size = 1 << (ai - 24)
        if pos + size > len(buf):
            raise ValueError("cbor: truncated argument")
        arg = int.from_bytes(buf[pos:pos + size], "big")
        pos += size
    elif ai == 31:
        raise NotImplementedError("cbor: indefinite-length item")
    else:
        raise ValueError(f"cbor: reserved additional info {ai}")
    if major == 0:
        return arg, pos
    if major == 1:
        return -1 - arg, pos
    if major in (2, 3):
        if pos + arg > len(buf):
            raise ValueError("cbor: truncated string")
        raw = buf[pos:pos + arg]
        return (raw if major == 2 else raw.decode()), pos + arg
    if major == 4:
        out = []
        for _ in range(arg):
            v, pos = _dec(buf, pos)
            out.append(v)
        return out, pos
    if major == 5:
        m = {}
        for _ in range(arg):
            k, pos = _dec(buf, pos)
            v, pos = _dec(buf, pos)
            m[k] = v
        return m, pos
    if major == 6:
        raise NotImplementedError(f"cbor: semantic tag {arg}")
    # major 7
    if ai == 20:
        return False, pos
    if ai == 21:
        return True, pos
    if ai == 22:
        return None, pos
    if ai == 25:
        return struct.unpack(">e", arg.to_bytes(2, "big"))[0], pos
    if ai == 26:
        return struct.unpack(">f", arg.to_bytes(4, "big"))[0], pos
    if ai == 27:
        return struct.unpack(">d", arg.to_bytes(8, "big"))[0], pos
    raise NotImplementedError(f"cbor: simple value {arg}")


def decode(buf: bytes):
    """Decode exactly one CBOR item; trailing bytes are corruption."""
    v, pos = _dec(buf, 0)
    if pos != len(buf):
        raise ValueError("cbor: trailing bytes after item")
    return v
