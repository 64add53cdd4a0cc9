"""Dependency-free baseline JPEG codec (grayscale + YCbCr color).

Round-3/5 verdict items: JPEG is the one multimodal format a real
corpus hits constantly, and the container has no image libraries — so
this module implements the baseline-DCT subset of the public JPEG spec
(ITU-T T.81) directly: marker parsing, DQT/DHT tables, canonical
Huffman decode with byte unstuffing, DC prediction + amplitude
"extend", AC run-length/EOB/ZRL, zigzag dequantization, float IDCT,
level shift — for single-component grayscale AND 3-component YCbCr
(4:4:4, 4:2:0, 4:2:2, and 4:4:0 sampling — everything a real crawl
corpus carries in practice), with nearest-neighbor chroma upsampling
per axis and the
JFIF full-range YCbCr→RGB transform, and restart-interval (DRI/RSTn)
streams — byte-realign + predictor reset per interval, the layout
cameras emit for error resilience — AND progressive (SOF2, T.81
Annex G): spectral-selection bands, successive approximation on DC
and AC (first + refinement passes with correction bits and EOB runs),
coefficients accumulated across scans and reconstructed once at EOI.
16-bit quant tables and exotic samplings still raise
NotImplementedError (the honest-stub policy — no fake output for
variants we cannot actually decode).

Rounding convention: the color transform rounds with floor(x + 0.5)
(not banker's round), chosen so a SQL oracle can reproduce decoded
values exactly — Python/numpy round() is half-even while DuckDB's is
half-away; floor(x + 0.5) is identical everywhere.

The encoder is the minimal valid baseline stream used by fixtures and
tests (standard Annex K tables); the decoder is general for the
baseline subset and is exercised on non-trivial AC patterns in
tests/test_multimodal.py against a numpy IDCT reference.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index = zigzag position, value = row-major position
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K (T.81 Tables K.1/K.3/K.5): luminance quant + Huffman tables
QTABLE_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)  # natural (row-major) order

QTABLE_CHR = np.array([  # T.81 Table K.2 (chrominance), natural order
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

DC_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
# T.81 Tables K.4 / K.6: chrominance DC + AC Huffman specifications
DC_CHR_BITS = [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHR_VALS = list(range(12))
AC_CHR_BITS = [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8x8 DCT basis: C[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_C = np.array([[(np.sqrt(0.125) if u == 0 else 0.5)
                * np.cos((2 * x + 1) * u * np.pi / 16)
                for x in range(8)] for u in range(8)])


def idct2d(coef: np.ndarray) -> np.ndarray:
    """8x8 inverse DCT (float), T.81 A.3.3 normalization."""
    return _C.T @ coef @ _C


_HUFF_CACHE: dict[tuple, dict] = {}


def _huff_codes(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman code map {(length, code) -> symbol}.
    Content-keyed cache: the standard Annex-K tables arrive in every
    DHT segment, and rebuilding 174 entries per image dominated the
    per-image decode cost on small images."""
    key = (tuple(bits), tuple(vals))
    cached = _HUFF_CACHE.get(key)
    if cached is not None:
        return cached
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    _HUFF_CACHE[key] = out
    return out


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any other marker."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            byte = self.buf[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.buf[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise ValueError("hit marker inside entropy data")
            self.acc = byte
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def sync_restart(self, expect: int) -> None:
        """Byte-align and consume the RSTn marker (T.81 F.2.1.3.1:
        entropy data is padded to a byte boundary before each
        restart)."""
        self.n = 0  # discard partial bits
        if self.buf[self.pos] != 0xFF:
            raise ValueError("expected restart marker")
        m = self.buf[self.pos + 1]
        if m != 0xD0 + expect:
            raise ValueError(
                f"restart marker out of sequence: got 0x{m:02X}, "
                f"want 0x{0xD0 + expect:02X}")
        self.pos += 2


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s low bits to the signed amplitude."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray,
                  cr: np.ndarray) -> np.ndarray:
    """JFIF full-range YCbCr -> RGB with floor(x + 0.5) rounding (the
    module-docstring convention: identical in numpy and any SQL
    engine, unlike half-even np.round)."""
    r = np.floor(y + 1.402 * (cr - 128.0) + 0.5)
    g = np.floor(y - 0.344136 * (cb - 128.0)
                 - 0.714136 * (cr - 128.0) + 0.5)
    b = np.floor(y + 1.772 * (cb - 128.0) + 0.5)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def decode_jpeg(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a baseline JPEG → (width, height, image): uint8 (H, W)
    for grayscale, uint8 (H, W, 3) RGB for 3-component YCbCr with
    4:4:4 or 4:2:0 sampling (nearest-neighbor chroma upsampling).

    Raises NotImplementedError for variants outside the supported
    subset (progressive, restart intervals, 16-bit quant, other
    samplings / component counts).
    """
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    width = height = -1
    restart_interval = 0
    progressive = False
    comps: list[dict] = []
    scan: list[tuple[int, int, int]] = []
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS")
        (seglen,) = struct.unpack_from(">H", buf, pos)
        if seglen < 2:
            # a crafted zero/one-length segment would otherwise stall
            # the `pos += seglen` marker walk forever — fail loudly
            raise ValueError(f"malformed segment length {seglen}")
        seg = buf[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(seg, np.uint8, 64, p + 1).astype(np.int64)
                nat = np.zeros(64, np.int64)
                nat[ZIGZAG] = zz  # DQT is stored in zigzag order
                qtables[tq] = nat
                p += 65
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline (SOF0) and progressive (SOF2) "
                f"supported, got SOF marker 0x{marker:02X}")
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            height, width = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG (only 1=gray / 3=YCbCr)")
            comps = []
            for ci in range(ncomp):
                cid = seg[6 + 3 * ci]
                hv = seg[7 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": seg[8 + 3 * ci]})
            if ncomp == 1:
                if (comps[0]["h"], comps[0]["v"]) != (1, 1):
                    raise NotImplementedError("subsampled grayscale")
            else:
                yhv = (comps[0]["h"], comps[0]["v"])
                if yhv not in ((1, 1), (2, 2), (2, 1), (1, 2)) or any(
                        (c["h"], c["v"]) != (1, 1) for c in comps[1:]):
                    raise NotImplementedError(
                        "only 4:4:4 / 4:2:0 / 4:2:2 / 4:4:0 color "
                        "sampling supported")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = [0] + list(seg[p + 1: p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17: p + 17 + nv])
                (dc_tables if tc == 0 else ac_tables)[th] = _huff_codes(
                    bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if progressive:
                # hand the whole scan sequence (this SOS included) to
                # the progressive path; pos-2 points at the SOS marker
                return _decode_progressive(
                    buf, pos - 2, comps, width, height, qtables,
                    dc_tables, ac_tables, restart_interval)
            ns = seg[0]
            if ns != len(comps):
                raise NotImplementedError("multi-scan (non-interleaved)")
            for i in range(ns):
                tt = seg[2 + 2 * i]
                scan.append((seg[1 + 2 * i], tt >> 4, tt & 15))
            pos += seglen
            break
        pos += seglen
    else:
        raise ValueError("no SOS marker")
    if width <= 0 or not comps:
        raise ValueError("missing SOF0/DQT before SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    planes = [np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8),
                       np.float64) for c in comps]
    tabs = []
    for c, (_cs, td, ta) in zip(comps, scan):
        if c["tq"] not in qtables:
            raise ValueError("missing quant table")
        tabs.append((qtables[c["tq"]], dc_tables[td], ac_tables[ta]))

    reader = _BitReader(buf, pos)
    preds = [0] * len(comps)
    mcu_i = 0
    rst_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                reader.sync_restart(rst_i)
                rst_i = (rst_i + 1) % 8
                preds = [0] * len(comps)
            mcu_i += 1
            for ci, comp in enumerate(comps):
                qt, dc_t, ac_t = tabs[ci]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        s = reader.decode_huff(dc_t)
                        preds[ci] += _extend(reader.read_bits(s), s)
                        zz = None
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(ac_t)
                            r, s = rs >> 4, rs & 15
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            if zz is None:
                                zz = np.zeros(64, np.int64)
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        py = (my * comp["v"] + by) * 8
                        px = (mx * comp["h"] + bx) * 8
                        if zz is None:
                            # DC-only block: the IDCT of a lone DC
                            # coefficient is a uniform fill at
                            # dc*q00/8 — skip zigzag + 2 matmuls (the
                            # common case in flat regions; every block
                            # of the uniform fixtures)
                            planes[ci][py:py + 8, px:px + 8] = (
                                preds[ci] * int(qt[0]) / 8.0 + 128.0)
                            continue
                        zz[0] = preds[ci]
                        coef = np.zeros(64, np.float64)
                        coef[ZIGZAG] = (zz * qt[ZIGZAG]).astype(np.float64)
                        block = idct2d(coef.reshape(8, 8)) + 128.0
                        planes[ci][py:py + 8, px:px + 8] = block

    if len(comps) == 1:
        out = np.clip(np.round(planes[0][:height, :width]),
                      0, 255).astype(np.uint8)
        return width, height, out
    # upsample chroma to luma resolution (nearest), crop, convert
    full = []
    for c, plane in zip(comps, planes):
        rep_y, rep_x = vmax // c["v"], hmax // c["h"]
        if rep_y > 1 or rep_x > 1:
            plane = plane.repeat(rep_y, axis=0).repeat(rep_x, axis=1)
        full.append(plane[:height, :width])
    # integer-round each plane first (floor(x+0.5), module convention)
    y, cb, cr = (np.clip(np.floor(p + 0.5), 0, 255) for p in full)
    return width, height, _ycbcr_to_rgb(y, cb, cr)


def decode_jpeg_gray(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Back-compat wrapper: decode and require a grayscale result."""
    width, height, img = decode_jpeg(buf)
    if img.ndim != 2:
        raise ValueError("color JPEG: use decode_jpeg()")
    return width, height, img


# ---------------------------------------------------------------------------
# progressive (SOF2) decode — T.81 Annex G: spectral selection +
# successive approximation.  Coefficients accumulate across scans in
# per-component zigzag-order arrays; dequant + IDCT happen once at EOI.
# ---------------------------------------------------------------------------


def _decode_progressive(buf: bytes, pos: int, comps: list[dict],
                        width: int, height: int,
                        qtables: dict, dc_tables: dict, ac_tables: dict,
                        restart_interval: int) -> tuple[int, int, np.ndarray]:
    if width <= 0 or not comps:
        raise ValueError("missing SOF2 before SOS")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    grids = []   # per comp: (full_bw, full_bh, used_bw, used_bh)
    for c in comps:
        cw = -(-(width * c["h"]) // hmax)
        ch = -(-(height * c["v"]) // vmax)
        grids.append((mcus_x * c["h"], mcus_y * c["v"],
                      -(-cw // 8), -(-ch // 8)))
    coefs = [np.zeros((g[1], g[0], 64), np.int64) for g in grids]

    while pos + 1 < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", buf, pos)
        if seglen < 2:
            raise ValueError(f"malformed segment length {seglen}")
        seg = buf[pos + 2: pos + seglen]
        if marker == 0xC4:  # DHT — progressive streams redefine per scan
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = [0] + list(seg[p + 1: p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17: p + 17 + nv])
                (dc_tables if tc == 0 else ac_tables)[th] = _huff_codes(
                    bits, vals)
                p += 17 + nv
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(seg, np.uint8, 64, p + 1).astype(np.int64)
                nat = np.zeros(64, np.int64)
                nat[ZIGZAG] = zz
                qtables[tq] = nat
                p += 65
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — one progressive scan
            pos = _decode_prog_scan(buf, pos + seglen, seg, comps, grids,
                                    coefs, dc_tables, ac_tables,
                                    restart_interval, mcus_x, mcus_y)
            continue
        pos += seglen

    # reconstruct: dequant + IDCT every block, then the shared
    # upsample/color tail (identical math to the baseline path)
    planes = []
    for c, g, cf in zip(comps, grids, coefs):
        bw_full, bh_full = g[0], g[1]
        qt = qtables[c["tq"]]
        plane = np.zeros((bh_full * 8, bw_full * 8), np.float64)
        for by in range(bh_full):
            for bx in range(bw_full):
                zz = cf[by, bx]
                if not zz[1:].any():
                    plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                        int(zz[0]) * int(qt[0]) / 8.0 + 128.0)
                    continue
                coef = np.zeros(64, np.float64)
                coef[ZIGZAG] = (zz * qt[ZIGZAG]).astype(np.float64)
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                    idct2d(coef.reshape(8, 8)) + 128.0
        planes.append(plane)
    if len(comps) == 1:
        out = np.clip(np.round(planes[0][:height, :width]),
                      0, 255).astype(np.uint8)
        return width, height, out
    full = []
    for c, plane in zip(comps, planes):
        rep_y, rep_x = vmax // c["v"], hmax // c["h"]
        if rep_y > 1 or rep_x > 1:
            plane = plane.repeat(rep_y, axis=0).repeat(rep_x, axis=1)
        full.append(plane[:height, :width])
    y, cb, cr = (np.clip(np.floor(p + 0.5), 0, 255) for p in full)
    return width, height, _ycbcr_to_rgb(y, cb, cr)


def _decode_prog_scan(buf: bytes, pos: int, seg: bytes, comps, grids,
                      coefs, dc_tables, ac_tables, restart_interval,
                      mcus_x, mcus_y) -> int:
    """Decode one progressive scan's entropy data; return the position
    of the next marker."""
    ns = seg[0]
    scomp = []
    for i in range(ns):
        cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
        ci = next((j for j, c in enumerate(comps) if c["id"] == cs), None)
        if ci is None:
            raise ValueError(f"scan references unknown component {cs}")
        scomp.append((ci, tt >> 4, tt & 15))
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
    reader = _BitReader(buf, pos)
    eobrun = 0
    if ss == 0:
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        preds = [0] * len(comps)
        if ns > 1:  # interleaved MCU order over all scan components
            unit = 0
            rst_i = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if (restart_interval and unit
                            and unit % restart_interval == 0):
                        reader.sync_restart(rst_i)
                        rst_i = (rst_i + 1) % 8
                        preds = [0] * len(comps)
                    unit += 1
                    for ci, td, _ta in scomp:
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blk = coefs[ci][my * c["v"] + by,
                                                mx * c["h"] + bx]
                                _dc_pass(reader, blk, dc_tables, td,
                                         preds, ci, ah, al)
        else:
            ci, td, _ta = scomp[0]
            _, _, bw_used, bh_used = grids[ci]
            unit = 0
            rst_i = 0
            for by in range(bh_used):
                for bx in range(bw_used):
                    if (restart_interval and unit
                            and unit % restart_interval == 0):
                        reader.sync_restart(rst_i)
                        rst_i = (rst_i + 1) % 8
                        preds = [0] * len(comps)
                    unit += 1
                    _dc_pass(reader, coefs[ci][by, bx], dc_tables, td,
                             preds, ci, ah, al)
    else:
        if ns != 1:
            raise ValueError("progressive AC scan must be single-component")
        ci, _td, ta = scomp[0]
        act = ac_tables[ta]
        _, _, bw_used, bh_used = grids[ci]
        cf = coefs[ci]
        unit = 0
        rst_i = 0
        for by in range(bh_used):
            for bx in range(bw_used):
                if (restart_interval and unit
                        and unit % restart_interval == 0):
                    reader.sync_restart(rst_i)
                    rst_i = (rst_i + 1) % 8
                    eobrun = 0
                unit += 1
                if ah == 0:
                    eobrun = _ac_first(reader, cf[by, bx], act,
                                       ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine(reader, cf[by, bx], act,
                                        ss, se, al, eobrun)
    # byte-align and find the next marker (skip stuffed FF00s)
    p = reader.pos
    while p + 1 < len(buf):
        if buf[p] == 0xFF and buf[p + 1] != 0x00:
            break
        p += 1
    return p


def _dc_pass(reader, blk, dc_tables, td, preds, ci, ah, al) -> None:
    if ah == 0:  # first pass: Huffman diff, shifted up by Al
        s = reader.decode_huff(dc_tables[td])
        preds[ci] += _extend(reader.read_bits(s), s)
        blk[0] = preds[ci] << al
    else:        # refinement: one raw bit per block
        if reader.read_bit():
            blk[0] |= 1 << al


def _ac_first(reader, blk, act, ss, se, al, eobrun) -> int:
    """AC first pass for one block (history all-zero in this band):
    run/size coding with EOB-run extension (T.81 G.1.2.2)."""
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = reader.decode_huff(act)
        r, s = sym >> 4, sym & 15
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            eb = (1 << r) - 1
            if r:
                eb += reader.read_bits(r)
            return eb
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine(reader, blk, act, ss, se, al, eobrun) -> int:
    """AC refinement pass for one block (T.81 G.1.2.3): place newly
    significant ±1<<Al coefficients and append one correction bit to
    every already-nonzero coefficient passed over."""
    p1, m1 = 1 << al, -(1 << al)
    if eobrun:
        for k in range(ss, se + 1):
            c = int(blk[k])
            if c and reader.read_bit() and (c & p1) == 0:
                blk[k] = c + (p1 if c >= 0 else m1)
        return eobrun - 1
    k = ss
    while k <= se:
        sym = reader.decode_huff(act)
        r, s = sym >> 4, sym & 15
        val = 0
        if s == 0:
            if r < 15:  # EOB-run: refine the rest of this band, then
                eb = (1 << r) - 1  # skip eb further whole blocks
                if r:
                    eb += reader.read_bits(r)
                while k <= se:
                    c = int(blk[k])
                    if c and reader.read_bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                    k += 1
                return eb
            # r == 15: skip 16 zero-history positions
        else:
            if s != 1:
                raise ValueError("AC refine symbol with size != 1")
            val = p1 if reader.read_bit() else m1
        while k <= se:
            c = int(blk[k])
            if c != 0:
                if reader.read_bit() and (c & p1) == 0:
                    blk[k] = c + (p1 if c >= 0 else m1)
            else:
                if r == 0:
                    if val:
                        blk[k] = val
                    k += 1
                    break
                r -= 1
            k += 1
    return 0


# ---------------------------------------------------------------------------
# minimal baseline encoder (fixtures + tests)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write_bits(self, v: int, count: int) -> None:
        for i in range(count - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.write_bits((1 << (8 - self.n)) - 1, 8 - self.n)  # pad 1s
        return bytes(self.out)


_REV_CACHE: dict[tuple, dict] = {}


def _rev_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (length, code): the encoder-side view of a table
    (content-keyed cache, same rationale as _huff_codes)."""
    key = (tuple(bits), tuple(vals))
    cached = _REV_CACHE.get(key)
    if cached is None:
        cached = {s: lc for lc, s in _huff_codes(bits, vals).items()}
        _REV_CACHE[key] = cached
    return cached


def _emit(w: _BitWriter, rev: dict[int, tuple[int, int]], sym: int) -> None:
    try:
        length, code = rev[sym]
    except KeyError:
        raise ValueError(f"symbol {sym} not in table") from None
    w.write_bits(code, length)


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def encode_jpeg_blocks(width: int, height: int,
                       blocks: "list[np.ndarray]") -> bytes:
    """Encode pre-quantized coefficient blocks (zigzag int64[64] each,
    row-major MCU order) as a baseline grayscale JPEG with the Annex K
    tables. The test-facing seam: any coefficient pattern round-trips
    through the real entropy/IDCT path."""
    dc_codes = _rev_codes(DC_BITS, DC_VALS)
    ac_codes = _rev_codes(AC_BITS, AC_VALS)
    w = _BitWriter()
    pred = 0
    for zz in blocks:
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        s = _category(diff)
        _emit(w, dc_codes, s)
        if s:
            w.write_bits(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                _emit(w, ac_codes, 0xF0)  # ZRL
                run -= 16
            s = _category(v)
            _emit(w, ac_codes, (run << 4) | s)
            w.write_bits(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            _emit(w, ac_codes, 0x00)  # EOB
    entropy = w.flush()

    qzz = QTABLE_LUM[ZIGZAG]  # natural -> zigzag for the DQT segment
    parts = [b"\xff\xd8"]  # SOI
    parts.append(b"\xff\xdb" + struct.pack(">HB", 67, 0)
                 + bytes(int(x) for x in qzz))
    parts.append(b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1)
                 + bytes((1, 0x11, 0)))
    dht = bytes(DC_BITS[1:]) + bytes(DC_VALS)
    parts.append(b"\xff\xc4" + struct.pack(">HB", 3 + len(dht), 0x00) + dht)
    dht = bytes(AC_BITS[1:]) + bytes(AC_VALS)
    parts.append(b"\xff\xc4" + struct.pack(">HB", 3 + len(dht), 0x10) + dht)
    parts.append(b"\xff\xda" + struct.pack(">HB", 8, 1)
                 + bytes((1, 0x00, 0, 63, 0)))
    parts.append(entropy)
    parts.append(b"\xff\xd9")  # EOI
    return b"".join(parts)


def encode_jpeg_gray_uniform(width: int, height: int, gray: int) -> bytes:
    """Uniform-gray baseline JPEG. With the Annex K table (q00=16) and
    even ``gray``, DC quantization is exact — round(8*(gray-128)/16) =
    (gray-128)/2 — so the decoded image is exactly ``gray`` everywhere
    and the fixture oracle's closed form holds bit-for-bit."""
    n_blocks = ((width + 7) // 8) * ((height + 7) // 8)
    dc = int(round(8.0 * (gray - 128) / int(QTABLE_LUM[0])))
    first = np.zeros(64, np.int64)
    first[0] = dc
    rest = np.zeros(64, np.int64)
    rest[0] = dc  # same DC -> diff 0 for blocks after the first
    return encode_jpeg_blocks(
        width, height, [first] + [rest] * (n_blocks - 1))


def encode_jpeg_color_uniform(width: int, height: int, y: int, cb: int,
                              cr: int, subsample: str = "420") -> bytes:
    """Uniform-color baseline YCbCr JPEG (4:4:4, 4:2:0, 4:2:2, or
    4:4:0), Annex K luminance + chrominance tables. DC-exactness
    contract (asserted): (y-128) divisible by 2 (q00_lum=16 → dc =
    8Δ/16 = Δ/2 exact) and (cb-128), (cr-128) divisible by 17
    (q00_chr=17 → dc = 8Δ/17 exact), so every decoded plane is uniform
    at exactly (y, cb, cr) and the decoded RGB follows the closed-form
    floor(x+0.5) JFIF transform — an engine-independent oracle can
    verify the decode without any codec (see synthesize_images /
    q_multimodal_decode / q_multimodal_decode_chroma422)."""
    if (y - 128) % 2 or (cb - 128) % 17 or (cr - 128) % 17:
        raise ValueError("uniform color violates DC-exactness contract")
    try:
        hy, vy = {"444": (1, 1), "420": (2, 2),
                  "422": (2, 1), "440": (1, 2)}[subsample]
    except KeyError:
        raise ValueError(
            "subsample must be one of 444/420/422/440") from None
    dc_y = 8 * (y - 128) // int(QTABLE_LUM[0])
    dc_cb = 8 * (cb - 128) // int(QTABLE_CHR[0])
    dc_cr = 8 * (cr - 128) // int(QTABLE_CHR[0])
    mcus_x = (width + 8 * hy - 1) // (8 * hy)
    mcus_y = (height + 8 * vy - 1) // (8 * vy)

    dc_lum = _rev_codes(DC_BITS, DC_VALS)
    ac_lum = _rev_codes(AC_BITS, AC_VALS)
    dc_chr = _rev_codes(DC_CHR_BITS, DC_CHR_VALS)
    ac_chr = _rev_codes(AC_CHR_BITS, AC_CHR_VALS)

    def put_block(w: _BitWriter, diff: int, dc_codes: dict,
                  ac_codes: dict) -> None:
        s = _category(diff)
        _emit(w, dc_codes, s)
        if s:
            w.write_bits(diff if diff >= 0 else diff + (1 << s) - 1, s)
        _emit(w, ac_codes, 0x00)  # EOB: all AC zero

    w = _BitWriter()
    preds = [0, 0, 0]
    for _ in range(mcus_x * mcus_y):
        for _ in range(hy * vy):  # Y blocks of this MCU
            put_block(w, dc_y - preds[0], dc_lum, ac_lum)
            preds[0] = dc_y
        put_block(w, dc_cb - preds[1], dc_chr, ac_chr)
        preds[1] = dc_cb
        put_block(w, dc_cr - preds[2], dc_chr, ac_chr)
        preds[2] = dc_cr
    entropy = w.flush()

    parts = [b"\xff\xd8"]  # SOI
    for tid, qt in ((0, QTABLE_LUM), (1, QTABLE_CHR)):
        parts.append(b"\xff\xdb" + struct.pack(">HB", 67, tid)
                     + bytes(int(x) for x in qt[ZIGZAG]))
    hv1 = (hy << 4) | vy
    parts.append(b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, height, width, 3)
                 + bytes((1, hv1, 0, 2, 0x11, 1, 3, 0x11, 1)))
    for tc_th, bits, vals in ((0x00, DC_BITS, DC_VALS),
                              (0x10, AC_BITS, AC_VALS),
                              (0x01, DC_CHR_BITS, DC_CHR_VALS),
                              (0x11, AC_CHR_BITS, AC_CHR_VALS)):
        dht = bytes(bits[1:]) + bytes(vals)
        parts.append(b"\xff\xc4" + struct.pack(">HB", 3 + len(dht), tc_th)
                     + dht)
    parts.append(b"\xff\xda" + struct.pack(">HB", 12, 3)
                 + bytes((1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0)))
    parts.append(entropy)
    parts.append(b"\xff\xd9")  # EOI
    return b"".join(parts)


def rgb_from_ycbcr_scalar(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    """Closed-form decoded RGB for a uniform (y, cb, cr) — the same
    floor(x+0.5) JFIF transform the decoder applies, as scalars (used
    by tests and mirrored in SQL by the q_multimodal_decode oracle)."""
    import math
    r = min(255, max(0, math.floor(y + 1.402 * (cr - 128) + 0.5)))
    g = min(255, max(0, math.floor(y - 0.344136 * (cb - 128)
                                   - 0.714136 * (cr - 128) + 0.5)))
    b = min(255, max(0, math.floor(y + 1.772 * (cb - 128) + 0.5)))
    return r, g, b


def encode_jpeg_color_blocks(width: int, height: int,
                             y_blocks: "list[np.ndarray]",
                             cb_blocks: "list[np.ndarray]",
                             cr_blocks: "list[np.ndarray]",
                             subsample: str = "420",
                             restart_interval: int = 0) -> bytes:
    """Encode pre-quantized coefficient blocks (zigzag int64[64]) for
    all three components as a baseline YCbCr JPEG. Y blocks are given
    in MCU-interleave order (for 4:2:0: the 4 blocks of MCU 0
    left-to-right top-to-bottom, then MCU 1, ...); chroma lists hold
    one block per MCU. The test-facing seam for exercising chroma AC
    coefficients, per-component DC prediction, and interleaving on the
    real entropy path (the uniform encoder only ever emits DC)."""
    try:
        hy, vy = {"444": (1, 1), "420": (2, 2),
                  "422": (2, 1), "440": (1, 2)}[subsample]
    except KeyError:
        raise ValueError(
            "subsample must be one of 444/420/422/440") from None
    mcus = ((width + 8 * hy - 1) // (8 * hy)) \
        * ((height + 8 * vy - 1) // (8 * vy))
    if (len(y_blocks) != mcus * hy * vy or len(cb_blocks) != mcus
            or len(cr_blocks) != mcus):
        raise ValueError("block counts do not match MCU grid")

    dc_lum = _rev_codes(DC_BITS, DC_VALS)
    ac_lum = _rev_codes(AC_BITS, AC_VALS)
    dc_chr = _rev_codes(DC_CHR_BITS, DC_CHR_VALS)
    ac_chr = _rev_codes(AC_CHR_BITS, AC_CHR_VALS)

    def put_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
        diff = int(zz[0]) - pred
        s = _category(diff)
        _emit(w, dc_codes, s)
        if s:
            w.write_bits(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                _emit(w, ac_codes, 0xF0)
                run -= 16
            s = _category(v)
            _emit(w, ac_codes, (run << 4) | s)
            w.write_bits(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            _emit(w, ac_codes, 0x00)
        return int(zz[0])

    chunks = []
    w = _BitWriter()
    preds = [0, 0, 0]
    yi = 0
    rst = 0
    for mi in range(mcus):
        if restart_interval and mi and mi % restart_interval == 0:
            chunks.append(w.flush())          # byte-align this chunk
            chunks.append(bytes((0xFF, 0xD0 + rst)))
            rst = (rst + 1) % 8
            preds = [0, 0, 0]
            w = _BitWriter()
        for _ in range(hy * vy):
            preds[0] = put_block(w, y_blocks[yi], preds[0],
                                 dc_lum, ac_lum)
            yi += 1
        preds[1] = put_block(w, cb_blocks[mi], preds[1], dc_chr, ac_chr)
        preds[2] = put_block(w, cr_blocks[mi], preds[2], dc_chr, ac_chr)
    chunks.append(w.flush())
    entropy = b"".join(chunks)

    parts = [b"\xff\xd8"]
    for tid, qt in ((0, QTABLE_LUM), (1, QTABLE_CHR)):
        parts.append(b"\xff\xdb" + struct.pack(">HB", 67, tid)
                     + bytes(int(x) for x in qt[ZIGZAG]))
    hv1 = (hy << 4) | vy
    parts.append(b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, height, width, 3)
                 + bytes((1, hv1, 0, 2, 0x11, 1, 3, 0x11, 1)))
    for tc_th, bits, vals in ((0x00, DC_BITS, DC_VALS),
                              (0x10, AC_BITS, AC_VALS),
                              (0x01, DC_CHR_BITS, DC_CHR_VALS),
                              (0x11, AC_CHR_BITS, AC_CHR_VALS)):
        dht = bytes(bits[1:]) + bytes(vals)
        parts.append(b"\xff\xc4" + struct.pack(">HB", 3 + len(dht), tc_th)
                     + dht)
    if restart_interval:
        parts.append(b"\xff\xdd" + struct.pack(">HH", 4, restart_interval))
    parts.append(b"\xff\xda" + struct.pack(">HB", 12, 3)
                 + bytes((1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0)))
    parts.append(entropy)
    parts.append(b"\xff\xd9")
    return b"".join(parts)


# ---------------------------------------------------------------------------
# progressive encoder (fixtures + tests) — emits a spectral-selection +
# successive-approximation scan script so every Annex-G decode path
# (DC first/refine, AC first with EOB runs, AC refine with correction
# bits, ZRL-in-refinement) is exercised by round-trip tests.
# ---------------------------------------------------------------------------

# "Flat" Huffman table: every symbol 0x00..0xFE at 8 bits, 0xFF at 16
# (the all-ones 8-bit code stays a prefix, as T.81 C.2 requires).
# Progressive EOBn symbols (r<<4 | 0, r<15) are NOT in the Annex-K
# baseline tables, so progressive streams need their own table anyway;
# flat codes keep the encoder trivially correct.
_FLAT_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 0, 0, 0, 0, 0, 0, 0, 1]
_FLAT_VALS = list(range(255)) + [255]


def _emit_val(w: _BitWriter, v: int, s: int) -> None:
    if s:
        w.write_bits(v if v >= 0 else v + (1 << s) - 1, s)


def _enc_dc_first(w: _BitWriter, rev: dict, blocks, al: int) -> None:
    pred = 0
    for zz in blocks:
        v = int(zz[0]) >> al
        diff = v - pred
        pred = v
        s = _category(diff)
        _emit(w, rev, s)
        _emit_val(w, diff, s)


def _enc_dc_refine(w: _BitWriter, blocks, al: int) -> None:
    for zz in blocks:
        w.write_bits((int(zz[0]) >> al) & 1, 1)


class _EobState:
    __slots__ = ("run", "bits")

    def __init__(self):
        self.run = 0
        self.bits: list[int] = []

    def flush(self, w: _BitWriter, rev: dict) -> None:
        if self.run:
            r = self.run.bit_length() - 1
            _emit(w, rev, r << 4)
            if r:
                w.write_bits(self.run - (1 << r), r)
        for b in self.bits:
            w.write_bits(b, 1)
        self.run = 0
        self.bits = []


def _enc_ac_first(w: _BitWriter, rev: dict, blocks, ss: int, se: int,
                  al: int, eob: "_EobState") -> None:
    for zz in blocks:
        vals = []
        for k in range(ss, se + 1):
            c = int(zz[k])
            mag = abs(c) >> al
            vals.append(mag if c >= 0 else -mag)
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            eob.run += 1
            if eob.run == 0x7FFF:
                eob.flush(w, rev)
            continue
        eob.flush(w, rev)
        run = 0
        for i in range(nz[-1] + 1):
            v = vals[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                _emit(w, rev, 0xF0)
                run -= 16
            s = _category(v)
            _emit(w, rev, (run << 4) | s)
            _emit_val(w, v, s)
            run = 0
        if nz[-1] < se - ss:
            eob.run += 1


def _enc_ac_refine(w: _BitWriter, rev: dict, blocks, ss: int, se: int,
                   al: int, eob: "_EobState") -> None:
    """Encoder mirror of _ac_refine's walk: correction bits are
    emitted positionally, exactly where the decoder's walk reads
    them (T.81 G.1.2.3 / libjpeg encode_mcu_AC_refine)."""
    for zz in blocks:
        cur = [int(zz[k]) for k in range(ss, se + 1)]
        t = [abs(c) >> al for c in cur]
        hist = [abs(c) >> (al + 1) for c in cur]
        n = len(cur)
        newsig = [i for i in range(n) if hist[i] == 0 and t[i] != 0]
        if not newsig:  # whole band is run + corrections
            eob.run += 1
            eob.bits.extend(t[i] & 1 for i in range(n) if hist[i])
            if eob.run == 0x7FFF:
                eob.flush(w, rev)
            continue
        # (newly-significant values are 1 by construction: t<=1
        # whenever hist == t>>1 == 0)
        eob.flush(w, rev)
        pos = 0
        for j in newsig:
            r = sum(1 for x in range(pos, j) if t[x] == 0)
            while r > 15:
                _emit(w, rev, 0xF0)
                left = 16
                while left:     # decoder consumes exactly 16 zeros,
                    if hist[pos]:   # reading corrections in between
                        w.write_bits(t[pos] & 1, 1)
                    else:
                        left -= 1
                    pos += 1
                r -= 16
            _emit(w, rev, (r << 4) | 1)
            w.write_bits(1 if cur[j] > 0 else 0, 1)
            left = r
            while True:         # consume r zeros + corrections, then
                if hist[pos]:   # the placement position j itself
                    w.write_bits(t[pos] & 1, 1)
                    pos += 1
                    continue
                if left == 0:
                    pos += 1
                    break
                left -= 1
                pos += 1
        if pos < n:             # trailing zeros/corrections → EOB run
            eob.run += 1
            eob.bits.extend(t[i] & 1 for i in range(pos, n) if hist[i])


def encode_jpeg_progressive_blocks(width: int, height: int,
                                   blocks: "list[np.ndarray]") -> bytes:
    """Encode pre-quantized grayscale coefficient blocks (zigzag
    int64[64], row-major) as a PROGRESSIVE (SOF2) JPEG with a
    six-scan script: DC first (Al=1) → AC 1..5 first (Al=1) →
    AC 6..63 first (Al=1) → DC refine (Al=0) → AC 1..5 refine →
    AC 6..63 refine (Ah=1, Al=0).  Spectral selection, successive
    approximation on both DC and AC, EOB runs, ZRL inside wide
    refinement bands, and correction bits are all in the stream."""
    rev = _rev_codes(_FLAT_BITS, _FLAT_VALS)

    def scan(header: tuple, body: bytes) -> bytes:
        cs, ss, se, ah, al = header
        return (b"\xff\xda" + struct.pack(">HB", 8, 1)
                + bytes((cs, 0x00, ss, se, (ah << 4) | al)) + body)

    w = _BitWriter()
    _enc_dc_first(w, rev, blocks, 1)
    s1 = scan((1, 0, 0, 0, 1), w.flush())

    w = _BitWriter()
    eob = _EobState()
    _enc_ac_first(w, rev, blocks, 1, 5, 1, eob)
    eob.flush(w, rev)
    s2 = scan((1, 1, 5, 0, 1), w.flush())

    w = _BitWriter()
    eob = _EobState()
    _enc_ac_first(w, rev, blocks, 6, 63, 1, eob)
    eob.flush(w, rev)
    s3 = scan((1, 6, 63, 0, 1), w.flush())

    w = _BitWriter()
    _enc_dc_refine(w, blocks, 0)
    s4 = scan((1, 0, 0, 1, 0), w.flush())

    w = _BitWriter()
    eob = _EobState()
    _enc_ac_refine(w, rev, blocks, 1, 5, 0, eob)
    eob.flush(w, rev)
    s5 = scan((1, 1, 5, 1, 0), w.flush())

    w = _BitWriter()
    eob = _EobState()
    _enc_ac_refine(w, rev, blocks, 6, 63, 0, eob)
    eob.flush(w, rev)
    s6 = scan((1, 6, 63, 1, 0), w.flush())

    qzz = QTABLE_LUM[ZIGZAG]
    parts = [b"\xff\xd8"]
    parts.append(b"\xff\xdb" + struct.pack(">HB", 67, 0)
                 + bytes(int(x) for x in qzz))
    parts.append(b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, height, width, 1)
                 + bytes((1, 0x11, 0)))
    dht = bytes(_FLAT_BITS[1:]) + bytes(_FLAT_VALS)
    parts.append(b"\xff\xc4" + struct.pack(">HB", 3 + len(dht), 0x00) + dht)
    parts.append(b"\xff\xc4" + struct.pack(">HB", 3 + len(dht), 0x10) + dht)
    parts.extend((s1, s2, s3, s4, s5, s6))
    parts.append(b"\xff\xd9")
    return b"".join(parts)


def encode_jpeg_progressive_gray_uniform(width: int, height: int,
                                         gray: int) -> bytes:
    """Uniform-gray progressive JPEG — same DC-exactness contract as
    encode_jpeg_gray_uniform (even ``gray`` → decoded plane exactly
    ``gray``), but through the five-scan progressive script, so the
    closed-form fixture oracle also verifies the Annex-G path."""
    n_blocks = ((width + 7) // 8) * ((height + 7) // 8)
    dc = int(round(8.0 * (gray - 128) / int(QTABLE_LUM[0])))
    zz = np.zeros(64, np.int64)
    zz[0] = dc
    return encode_jpeg_progressive_blocks(width, height,
                                          [zz] * n_blocks)
