"""Parquet RLE / bit-packed hybrid encoding — implemented from the
public Parquet format spec (Encodings: RLE = Run Length Encoding /
Bit-Packing Hybrid): a stream of runs, each led by a ULEB128 header;
even header = RLE run (count = header >> 1, followed by the repeated
value in ceil(bit_width/8) little-endian bytes), odd header =
bit-packed run (groups = header >> 1, followed by groups * bit_width
bytes holding 8 * groups values packed LSB-first). This is the
encoding under every Parquet definition/repetition level and
dictionary index — the byte-level machinery a columnar engine's scan
path lives on.

Encoder policy (the standard writer rule): runs of >= 8 identical
values become RLE runs; everything else accumulates into one
bit-packed run per flush, padded with zeros to a full group of 8.

ValueError = corrupt stream (truncated header/payload, values
overrunning the declared count) — per the repo error taxonomy.
"""

from __future__ import annotations


def _uleb(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uleb(buf: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("rle: truncated header")
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def rle_bp_encode(values: list[int], bit_width: int) -> bytes:
    """Greedy hybrid encode: identical runs >= 8 go RLE, the rest
    bit-packs in groups of 8 (final group zero-padded)."""
    if not 0 < bit_width <= 32:
        raise ValueError("rle: bit_width out of range")
    vbytes = (bit_width + 7) // 8
    limit = 1 << bit_width
    out = bytearray()
    pending: list[int] = []

    def flush_pending() -> None:
        if not pending:
            return
        groups = (len(pending) + 7) // 8
        out.extend(_uleb((groups << 1) | 1))
        padded = pending + [0] * (groups * 8 - len(pending))
        acc = nbits = 0
        for v in padded:
            acc |= v << nbits
            nbits += bit_width
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        pending.clear()

    i, n = 0, len(values)
    while i < n:
        v = values[i]
        if not 0 <= v < limit:
            raise ValueError("rle: value exceeds bit_width")
        j = i
        while j < n and values[j] == v:
            j += 1
        run = j - i
        if run >= 8:
            flush_pending()
            out.extend(_uleb(run << 1))
            out.extend(v.to_bytes(vbytes, "little"))
        else:
            pending.extend(values[i:j])
        i = j
    flush_pending()
    return bytes(out)


def rle_bp_decode(buf: bytes, bit_width: int, n: int) -> list[int]:
    """Decode exactly ``n`` values; bit-packed zero padding beyond n
    is allowed only in the final group (the parquet contract)."""
    if not 0 < bit_width <= 32:
        raise ValueError("rle: bit_width out of range")
    vbytes = (bit_width + 7) // 8
    out: list[int] = []
    pos = 0
    while len(out) < n:
        header, pos = _read_uleb(buf, pos)
        if header & 1:
            groups = header >> 1
            nbytes = groups * bit_width
            if pos + nbytes > len(buf):
                raise ValueError("rle: truncated bit-packed run")
            acc = nbits = 0
            got = []
            for k in range(nbytes):
                acc |= buf[pos + k] << nbits
                nbits += 8
                while nbits >= bit_width:
                    got.append(acc & ((1 << bit_width) - 1))
                    acc >>= bit_width
                    nbits -= bit_width
            pos += nbytes
            room = n - len(out)
            if len(got) > room:
                if any(got[room:]):
                    raise ValueError("rle: non-zero padding past count")
                got = got[:room]
            out.extend(got)
        else:
            count = header >> 1
            if pos + vbytes > len(buf):
                raise ValueError("rle: truncated RLE value")
            v = int.from_bytes(buf[pos:pos + vbytes], "little")
            if v >= 1 << bit_width:
                raise ValueError("rle: RLE value exceeds bit_width")
            pos += vbytes
            if count > n - len(out):
                raise ValueError("rle: RLE run overruns declared count")
            out.extend([v] * count)
    if pos != len(buf):
        raise ValueError("rle: trailing bytes after final run")
    return out
