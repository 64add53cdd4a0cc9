"""Dependency-free PNG codec (round-5: extend the real-decode ladder
BMP/PPM/JPEG with the other ubiquitous crawl format).

Real decode path per the PNG spec (RFC 2083 / W3C PNG): signature,
chunk walk with CRC-32 verification, IHDR validation, multi-IDAT
concatenation, zlib inflate (stdlib zlib — DEFLATE is available
without any imaging library), and scanline UNFILTERING for all five
filter types (None/Sub/Up/Average/Paeth). The fixture encoder applies
a rotating filter per row, so a decoder that mishandles any single
filter type — or the Paeth predictor's tie-breaking order — produces
wrong pixels and breaks the closed-form oracle.

Round 6 closes the named refusal list: color-type 3 (palette — PLTE
parse + index expansion, the most common real-crawl variant, VERDICT
r5 item 5), 16-bit samples (big-endian u16 pairs through the same
byte-level unfilter with bpp=2/6), and Adam7 interlacing (the seven
sub-image passes, each with its own scanline filter chain, scattered
back into place).

Honest-stub policy (operators/multimodal.py): variants without a real
dependency-free path here — alpha channels (color types 4/6),
sub-byte depths (1/2/4-bit) — raise NotImplementedError instead of
faking output.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec 6.6): nearest of left/up/up-left to
    a+b-c, ties broken left, then up."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ftype: int, raw: bytes, prev: bytes, bpp: int) -> bytes:
    """Forward filter (encoder side)."""
    out = bytearray(len(raw))
    for i, x in enumerate(raw):
        a = raw[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - a) & 0xFF
        elif ftype == 2:
            out[i] = (x - b) & 0xFF
        elif ftype == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter {ftype}")
    return bytes(out)


def _unfilter_row(ftype: int, flt: bytes, prev: bytes, bpp: int) -> bytes:
    """Inverse filter (decoder side) — reconstruction is sequential in
    i because Sub/Average/Paeth reference the already-reconstructed
    left neighbor."""
    out = bytearray(len(flt))
    for i, x in enumerate(flt):
        a = out[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x + a) & 0xFF
        elif ftype == 2:
            out[i] = (x + b) & 0xFF
        elif ftype == 3:
            out[i] = (x + (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[i] = (x + _paeth(a, b, c)) & 0xFF
        else:
            raise NotImplementedError(f"unknown PNG filter type {ftype}")
    return bytes(out)


def encode_png_gradient(width: int, height: int,
                        r0: int, g0: int, b0: int) -> bytes:
    """8-bit RGB PNG whose pixel (x, y) is (r0+x+y, g0+x+y, b0+x+y) —
    callers must keep c0 + width + height <= 256 so there is no
    wraparound and the channel mean has the closed form
    c0 + (w-1)/2 + (h-1)/2 (a dyadic rational: bit-exact in double on
    any engine). Each row uses filter type y % 5, so every decode
    exercises all five filters once height >= 5."""
    if max(r0, g0, b0) + width + height > 256:
        raise ValueError("gradient would wrap modulo 256")
    raw_rows = []
    for y in range(height):
        row = bytearray()
        for x in range(width):
            row += bytes(((r0 + x + y), (g0 + x + y), (b0 + x + y)))
        raw_rows.append(bytes(row))
    prev = b"\x00" * (3 * width)
    stream = bytearray()
    for y, raw in enumerate(raw_rows):
        f = y % 5
        stream.append(f)
        stream += _filter_row(f, raw, prev, 3)
        prev = raw
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(stream)))
            + _chunk(b"IEND", b""))


def encode_png_gradient16(width: int, height: int, base: int) -> bytes:
    """16-bit grayscale PNG whose sample (x, y) is base + x + y —
    callers keep base + width + height <= 65536 so there is no
    wraparound and the mean has the closed form
    base + (w-1)/2 + (h-1)/2. Samples are big-endian u16; rows rotate
    filter types y % 5, so the byte-level filters run with bpp=2
    (hi/lo bytes reference their own counterparts two bytes left)."""
    if base + width + height > 65536:
        raise ValueError("16-bit gradient would wrap modulo 65536")
    prev = b"\x00" * (2 * width)
    stream = bytearray()
    for y in range(height):
        raw = b"".join(struct.pack(">H", base + x + y)
                       for x in range(width))
        f = y % 5
        stream.append(f)
        stream += _filter_row(f, raw, prev, 2)
        prev = raw
    ihdr = struct.pack(">IIBBBBB", width, height, 16, 0, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(stream)))
            + _chunk(b"IEND", b""))


def encode_png_adam7(width: int, height: int,
                     r0: int, g0: int, b0: int) -> bytes:
    """8-bit RGB PNG with the SAME gradient pixels as
    encode_png_gradient — pixel (x, y) = (c0+x+y) per channel — but
    stored Adam7-INTERLACED: seven sub-image passes, each row filtered
    with rotating types, so a decoder must walk the pass grid, keep an
    independent prev-row per pass, and scatter samples back to (x, y).
    Channel means keep the closed form c0 + (w-1)/2 + (h-1)/2, and
    probe pixels (corners/center) pin the scatter itself."""
    if max(r0, g0, b0) + width + height > 256:
        raise ValueError("gradient would wrap modulo 256")
    stream = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sw = (width - x0 + dx - 1) // dx if x0 < width else 0
        sh = (height - y0 + dy - 1) // dy if y0 < height else 0
        if sw == 0 or sh == 0:
            continue
        prev = b"\x00" * (3 * sw)
        for ry in range(sh):
            y = y0 + ry * dy
            row = bytearray()
            for x in range(x0, width, dx):
                row += bytes((r0 + x + y, g0 + x + y, b0 + x + y))
            f = ry % 5
            stream.append(f)
            stream += _filter_row(f, bytes(row), prev, 3)
            prev = bytes(row)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 1)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(stream)))
            + _chunk(b"IEND", b""))


def encode_png_palette(width: int, height: int,
                       r0: int, g0: int, b0: int) -> bytes:
    """8-bit palette (color-type 3) PNG: pixel (x, y) stores the
    1-byte index x+y into a PLTE of npal = width+height-1 entries with
    palette[j] = (r0+j, g0+2j, b0+j). Channel means then have closed
    forms — mean_r = r0 + (w-1)/2 + (h-1)/2 (dyadic rational, exact in
    double), mean_g = g0 + (w-1) + (h-1) — and the g-channel's 2x
    slope distinguishes a real PLTE lookup from treating indices as
    gray. Rows rotate filter types y % 5 like the truecolor encoder,
    so index bytes go through all five unfilters with bpp=1. Callers
    keep max(r0, b0) + npal <= 256 and g0 + 2*(npal-1) < 256."""
    npal = width + height - 1
    if max(r0, b0) + npal > 256 or g0 + 2 * (npal - 1) > 255:
        raise ValueError("palette entries would wrap modulo 256")
    plte = b"".join(bytes((r0 + j, g0 + 2 * j, b0 + j))
                    for j in range(npal))
    raw_rows = [bytes(bytearray(x + y for x in range(width)))
                for y in range(height)]
    prev = b"\x00" * width
    stream = bytearray()
    for y, raw in enumerate(raw_rows):
        f = y % 5
        stream.append(f)
        stream += _filter_row(f, raw, prev, 1)
        prev = raw
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte)
            + _chunk(b"IDAT", zlib.compress(bytes(stream)))
            + _chunk(b"IEND", b""))


# Adam7 pass grid: (x_start, y_start, x_step, y_step), PNG spec 8.2.
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def decode_png(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a truecolor, grayscale, or palette (color-type 3) PNG at
    8- or 16-bit depth, non-interlaced or Adam7. Returns (width,
    height, array h x w x 3 — or h x w for grayscale; uint8 for 8-bit,
    uint16 for 16-bit; palette images are expanded through their PLTE
    to h x w x 3 uint8). Raises ValueError on corruption (bad
    signature, CRC mismatch, truncated stream, missing/short PLTE,
    out-of-range index) and NotImplementedError on valid PNGs outside
    the supported subset (alpha color types, sub-byte depths, 16-bit
    palette)."""
    if buf[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    ended = False
    while pos + 8 <= len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        typ = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(buf):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", buf, pos + 8 + length)
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {typ!r} chunk")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            if idat:
                raise ValueError("PLTE after IDAT")
            if length == 0 or length % 3 != 0:
                raise ValueError("PLTE length not a multiple of 3")
            plte = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            ended = True
            break
        pos += 12 + length
    if ihdr is None or not ended:
        raise ValueError("missing IHDR/IEND")
    width, height, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr)
    if interlace not in (0, 1):
        raise ValueError(f"bad interlace method {interlace}")
    if depth not in (8, 16):
        raise NotImplementedError(f"bit depth {depth} not supported")
    if ctype not in (0, 2, 3):
        raise NotImplementedError(
            f"color type {ctype} (alpha) not supported")
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        if depth == 16:
            raise NotImplementedError("16-bit palette PNG not supported")
    if comp != 0 or filt != 0:
        raise ValueError("bad compression/filter method")
    channels = 3 if ctype == 2 else 1
    sbytes = depth // 8
    bpp = channels * sbytes  # filter distance in BYTES (PNG spec 6.2)
    try:
        stream = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"IDAT inflate failed: {exc}") from exc
    dt = np.uint16 if depth == 16 else np.uint8
    out = np.zeros((height, width, channels), dtype=dt)
    passes = _ADAM7 if interlace == 1 else ((0, 0, 1, 1),)
    off = 0
    for x0, y0, dx, dy in passes:
        sw = (width - x0 + dx - 1) // dx if x0 < width else 0
        sh = (height - y0 + dy - 1) // dy if y0 < height else 0
        if sw == 0 or sh == 0:
            continue  # empty pass contributes no scanlines
        stride = bpp * sw
        prev = b"\x00" * stride
        for ry in range(sh):
            if off + 1 + stride > len(stream):
                raise ValueError("decompressed size mismatch")
            raw = _unfilter_row(stream[off],
                                stream[off + 1:off + 1 + stride],
                                prev, bpp)
            off += 1 + stride
            arr = np.frombuffer(raw, dtype=np.uint8)
            if depth == 16:
                arr = ((arr[0::2].astype(np.uint16) << 8)
                       | arr[1::2].astype(np.uint16))
            out[y0 + ry * dy, x0::dx, :] = arr.reshape(sw, channels)
            prev = raw
    if off != len(stream):
        raise ValueError("decompressed size mismatch")
    px = out if channels == 3 else out[:, :, 0]
    if ctype == 3:
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if int(px.max()) >= pal.shape[0]:
            raise ValueError("palette index out of range")
        px = pal[px]  # (h, w) indices -> (h, w, 3) via PLTE lookup
    return width, height, px
