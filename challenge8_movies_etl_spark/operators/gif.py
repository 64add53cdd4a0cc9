"""GIF codec — encoder + decoder implemented from the public GIF89a
specification (W3C/CompuServe): logical screen descriptor, global
color table, image descriptor, COMMENT extension blocks, the
sub-block data framing, variable-width LZW with clear/EOI codes and
dictionary growth to 4095, and the 4-pass row interlace.

LZW here is the GIF dialect (LSB-first bit packing, code width grows
AFTER the dictionary fills the current width, starting width =
min_code_size + 1) — a genuinely different compressor from the
deflate/zstd/bz2/xz ladder elsewhere in the repo.

ValueError = corrupt stream (bad signature, truncated sub-blocks,
out-of-range LZW code); NotImplementedError = valid-but-unsupported
features (local color tables, transparency via GCE disposal we don't
model) — per the repo convention.
"""

from __future__ import annotations

import struct

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# GIF-dialect LZW
# ---------------------------------------------------------------------------

def lzw_compress(indices: bytes, min_code_size: int) -> bytes:
    """Real LZW compression (not the uncompressed-GIF trick): string
    table seeded with single pixels, grown per emitted code, reset via
    a CLEAR code when it reaches 4096 entries. Emits CLEAR first and
    EOI last, codes packed LSB-first."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = b""
    for b in indices:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([b])
    if prev:
        emit(table[prev], width)
        # Phantom-entry width check (giflib convention): the decoder
        # appends a table entry after EVERY data code — including this
        # final one, which the encoder follows with no add — and
        # widens when its table reaches 1<<width. EOI must therefore
        # be emitted at the widened width when that post-final append
        # lands exactly on the boundary (next_code here equals the
        # decoder's post-append table size, since the encoder is one
        # add behind after the flush emit). Guarded to data codes
        # that are NOT the first since a CLEAR (the decoder only
        # appends when it has a prev) — unreachable for
        # min_code_size >= 2 but exact for the public function.
        if (next_code > eoi + 1 and next_code == (1 << width)
                and width < 12):
            width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decompress(data: bytes, min_code_size: int,
                   expected: int) -> bytes:
    """GIF LZW decode → exactly ``expected`` pixel indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    acc = nbits = pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("gif: LZW stream truncated before EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: first LZW code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) > expected:
            raise ValueError("gif: LZW produced too many pixels")
    if len(out) != expected:
        raise ValueError("gif: LZW pixel count mismatch")
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------

def _subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(width: int, height: int, palette: list[tuple[int, int, int]],
               indices: bytes, *, interlace: bool = False,
               comment: str | None = None) -> bytes:
    """Write a single-image GIF: 89a when a comment extension is
    present, 87a otherwise; palette padded to a power of two; pixels
    row-major (reordered into the 4-pass layout when interlaced)."""
    if len(indices) != width * height:
        raise ValueError("gif: pixel count != width*height")
    size = 2
    while (1 << size) < len(palette):
        size += 1
    size = max(size, 2)
    pal = palette + [(0, 0, 0)] * ((1 << size) - len(palette))
    ver = b"GIF89a" if comment is not None else b"GIF87a"
    out = bytearray(ver)
    out += struct.pack("<HHBBB", width, height,
                       0x80 | (size - 1), 0, 0)
    for r, g, b in pal:
        out += bytes((r, g, b))
    if comment is not None:
        out += b"\x21\xfe" + _subblocks(comment.encode())
    rows = [indices[y * width:(y + 1) * width] for y in range(height)]
    if interlace:
        order = [y for start, step in _INTERLACE_PASSES
                 for y in range(start, height, step)]
        rows = [rows[y] for y in order]
    mcs = max(size, 2)
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height,
                       0x40 if interlace else 0)
    out.append(mcs)
    out += _subblocks(lzw_compress(b"".join(rows), mcs))
    out += b"\x3b"
    return bytes(out)


def decode_gif(buf: bytes) -> dict:
    """Parse a single-image GIF → {width, height, interlaced, palette,
    indices (row-major, de-interlaced), comment}. Skips extension
    blocks it doesn't model (except COMMENT, which it returns)."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    width, height, packed, _, _ = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    palette: list[tuple[int, int, int]] = []
    if packed & 0x80:
        n = 1 << ((packed & 0x7) + 1)
        for i in range(n):
            palette.append(tuple(buf[pos + 3 * i:pos + 3 * i + 3]))
        pos += 3 * n
    comment = None
    while True:
        if pos >= len(buf):
            raise ValueError("gif: missing trailer")
        block = buf[pos]
        pos += 1
        if block == 0x3B:
            raise ValueError("gif: trailer before image data")
        if block == 0x21:
            if pos >= len(buf):
                raise ValueError("gif: truncated extension block")
            label = buf[pos]
            pos += 1
            parts = bytearray()
            while True:
                if pos >= len(buf):
                    raise ValueError("gif: truncated extension block")
                n = buf[pos]
                pos += 1
                if n == 0:
                    break
                if pos + n > len(buf):
                    raise ValueError("gif: truncated extension block")
                parts += buf[pos:pos + n]
                pos += n
            if label == 0xFE:
                comment = parts.decode()
            continue
        if block == 0x2C:
            break
        raise ValueError(f"gif: unknown block 0x{block:02x}")
    left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", buf, pos)
    pos += 9
    if ipacked & 0x80:
        raise NotImplementedError("gif: local color table")
    interlaced = bool(ipacked & 0x40)
    mcs = buf[pos]
    pos += 1
    data = bytearray()
    while True:
        if pos >= len(buf):
            raise ValueError("gif: truncated image sub-blocks")
        n = buf[pos]
        pos += 1
        if n == 0:
            break
        data += buf[pos:pos + n]
        pos += n
    raw = lzw_decompress(bytes(data), mcs, iw * ih)
    rows = [raw[y * iw:(y + 1) * iw] for y in range(ih)]
    if interlaced:
        order = [y for start, step in _INTERLACE_PASSES
                 for y in range(start, ih, step)]
        fixed: list[bytes] = [b""] * ih
        for src, dst in enumerate(order):
            fixed[dst] = rows[src]
        rows = fixed
    return {"width": iw, "height": ih, "interlaced": interlaced,
            "palette": palette, "indices": b"".join(rows),
            "comment": comment}
