"""Parquet DELTA_BINARY_PACKED encoding — implemented from the public
Parquet format spec (Encodings: Delta Encoding): header = <block size
in values (ULEB128)> <miniblocks per block (ULEB128)> <total value
count (ULEB128)> <first value (zigzag ULEB128)>, then per block:
<min delta (zigzag ULEB128)> <one width byte per miniblock>
<miniblocks: (delta - min_delta) bit-packed LSB-first at that width>.
The standard writer geometry is used: 128 values per block, 4
miniblocks of 32. Trailing miniblocks with no values still carry
their width byte (0) and no payload; a partially-filled miniblock
pads with zeros at its width. This is the encoding under Parquet
INT32/INT64 delta columns (timestamps, auto-increment keys).

ValueError = corrupt stream (truncated header/payload, trailing
bytes); per the repo error taxonomy.
"""

from __future__ import annotations

from .rle import _read_uleb, _uleb

_BLOCK = 128
_MINIS = 4
_MINI = _BLOCK // _MINIS


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1


def _unzigzag(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


def delta_bp_encode(values: list[int]) -> bytes:
    out = bytearray()
    out += _uleb(_BLOCK)
    out += _uleb(_MINIS)
    out += _uleb(len(values))
    if not values:
        return bytes(out)
    out += _uleb(_zigzag(values[0]))
    deltas = [b - a for a, b in zip(values, values[1:])]
    for at in range(0, len(deltas), _BLOCK):
        block = deltas[at:at + _BLOCK]
        mn = min(block)
        out += _uleb(_zigzag(mn))
        adj = [d - mn for d in block]
        widths = []
        for m in range(_MINIS):
            mb = adj[m * _MINI:(m + 1) * _MINI]
            widths.append(max(mb).bit_length() if mb else 0)
        out += bytes(widths)
        for m in range(_MINIS):
            mb = adj[m * _MINI:(m + 1) * _MINI]
            w = widths[m]
            if not mb or w == 0:
                continue
            mb = mb + [0] * (_MINI - len(mb))
            acc = nbits = 0
            for v in mb:
                acc |= v << nbits
                nbits += w
                while nbits >= 8:
                    out.append(acc & 0xFF)
                    acc >>= 8
                    nbits -= 8
            if nbits:
                out.append(acc & 0xFF)
    return bytes(out)


def delta_bp_decode(buf: bytes) -> list[int]:
    block, pos = _read_uleb(buf, 0)
    minis, pos = _read_uleb(buf, pos)
    if block != _BLOCK or minis != _MINIS:
        raise ValueError("delta_bp: unsupported block geometry")
    n, pos = _read_uleb(buf, pos)
    if n == 0:
        if pos != len(buf):
            raise ValueError("delta_bp: trailing bytes")
        return []
    z, pos = _read_uleb(buf, pos)
    out = [_unzigzag(z)]
    while len(out) < n:
        z, pos = _read_uleb(buf, pos)
        mn = _unzigzag(z)
        if pos + _MINIS > len(buf):
            raise ValueError("delta_bp: truncated width bytes")
        widths = list(buf[pos:pos + _MINIS])
        pos += _MINIS
        remaining = n - len(out)
        for m in range(_MINIS):
            take = min(_MINI, remaining)
            w = widths[m]
            if take <= 0:
                if w:
                    raise ValueError("delta_bp: width on empty miniblock")
                continue
            if w == 0:
                deltas = [0] * take
            else:
                nbytes = (_MINI * w + 7) // 8
                if pos + nbytes > len(buf):
                    raise ValueError("delta_bp: truncated miniblock")
                acc = nbits = 0
                got = []
                for k in range(nbytes):
                    acc |= buf[pos + k] << nbits
                    nbits += 8
                    while nbits >= w and len(got) < _MINI:
                        got.append(acc & ((1 << w) - 1))
                        acc >>= w
                        nbits -= w
                pos += nbytes
                deltas = got[:take]
            for d in deltas:
                out.append(out[-1] + mn + d)
            remaining -= take
    if pos != len(buf):
        raise ValueError("delta_bp: trailing bytes")
    return out
