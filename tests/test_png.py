"""PNG codec (operators/png.py): pixel-exact round-trip through all
five scanline filters, CRC/truncation corruption detection, and the
honest-stub refusals for unsupported variants."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from challenge8_movies_etl_spark.operators.png import (
    _SIG,
    _chunk,
    _paeth,
    decode_png,
    encode_png_gradient,
)


def expected_gradient(w, h, r0, g0, b0):
    xs = np.arange(w)[None, :, None]
    ys = np.arange(h)[:, None, None]
    c0 = np.array([r0, g0, b0])[None, None, :]
    return (c0 + xs + ys).astype(np.uint8)


def test_roundtrip_pixel_exact_all_filters():
    # height 7 > 5 rows -> filter types 0,1,2,3,4,0,1 all exercised
    w, h, r0, g0, b0 = 13, 7, 100, 50, 7
    buf = encode_png_gradient(w, h, r0, g0, b0)
    dw, dh, px = decode_png(buf)
    assert (dw, dh) == (w, h)
    assert px.shape == (h, w, 3)
    np.testing.assert_array_equal(px, expected_gradient(w, h, r0, g0, b0))


def test_roundtrip_1x1_and_wide():
    for w, h in ((1, 1), (1, 6), (9, 1)):
        buf = encode_png_gradient(w, h, 10, 20, 30)
        dw, dh, px = decode_png(buf)
        assert (dw, dh) == (w, h)
        np.testing.assert_array_equal(
            px, expected_gradient(w, h, 10, 20, 30))


def test_paeth_predictor_spec_cases():
    # spec 6.6: p = a+b-c; nearest wins, ties prefer left, then up
    assert _paeth(1, 1, 1) == 1
    assert _paeth(10, 20, 15) == 15  # pa=pb=5, pc=0 -> up-left
    assert _paeth(10, 20, 30) == 10  # p=0: pa=10<pb=20<pc=30 -> left
    assert _paeth(30, 20, 10) == 30  # p=40: pa=10<pb=20<pc=30 -> left
    assert _paeth(0, 64, 128) == 0   # p=-64: pa=64, pb=128, pc=192


def test_multi_idat_streams_concatenate():
    w, h = 5, 5
    buf = encode_png_gradient(w, h, 60, 70, 80)
    # split the single IDAT into two chunks
    pos = 8
    parts = {}
    order = []
    while pos + 8 <= len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        typ = buf[pos + 4:pos + 8]
        parts[typ] = buf[pos + 8:pos + 8 + length]
        order.append(typ)
        pos += 12 + length
        if typ == b"IEND":
            break
    idat = parts[b"IDAT"]
    cut = len(idat) // 2
    rebuilt = (_SIG + _chunk(b"IHDR", parts[b"IHDR"])
               + _chunk(b"IDAT", idat[:cut])
               + _chunk(b"IDAT", idat[cut:])
               + _chunk(b"IEND", b""))
    dw, dh, px = decode_png(rebuilt)
    np.testing.assert_array_equal(px, expected_gradient(w, h, 60, 70, 80))


def test_corruption_detected():
    buf = bytearray(encode_png_gradient(4, 4, 1, 2, 3))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x00" * 20)
    # flip one payload byte inside the IDAT chunk -> CRC mismatch
    (ihdr_len,) = struct.unpack_from(">I", buf, 8)
    idat_payload_off = 8 + 12 + ihdr_len + 8
    buf[idat_payload_off + 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(buf))
    with pytest.raises(ValueError, match="truncated|missing"):
        decode_png(bytes(encode_png_gradient(4, 4, 1, 2, 3))[:-8])


def test_unsupported_variants_refuse_honestly():
    # interlaced: rebuild IHDR with interlace=1
    def with_ihdr(depth=8, ctype=2, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, ctype, 0, 0,
                           interlace)
        raw = b"\x00" + bytes(6) if ctype == 2 else b"\x00" + bytes(2)
        stream = (raw) * 2
        return (_SIG + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", zlib.compress(stream))
                + _chunk(b"IEND", b""))

    # round 6: interlace + 16-bit are now REAL decode paths; the
    # remaining honest refusals are alpha color types, sub-byte
    # depths, and 16-bit palette
    with pytest.raises(NotImplementedError, match="depth"):
        decode_png(with_ihdr(depth=4))
    with pytest.raises(NotImplementedError, match="color type"):
        decode_png(with_ihdr(ctype=6))
    pal16 = (_SIG
             + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 16, 3,
                                           0, 0, 0))
             + _chunk(b"PLTE", b"\x01\x02\x03")
             + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00\x00"))
             + _chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="16-bit palette"):
        decode_png(pal16)
    # a malformed interlace method is corruption, not a refusal
    with pytest.raises(ValueError, match="interlace"):
        decode_png(with_ihdr(interlace=2))


def test_gradient_wraparound_guard():
    with pytest.raises(ValueError, match="wrap"):
        encode_png_gradient(13, 7, 250, 0, 0)


def test_palette_roundtrip_pixel_exact():
    from challenge8_movies_etl_spark.operators.png import (
        encode_png_palette)
    for w, h, r0, g0, b0 in [(13, 7, 5, 10, 20), (1, 1, 0, 0, 0),
                             (8, 6, 199, 199, 199)]:
        buf = encode_png_palette(w, h, r0, g0, b0)
        dw, dh, px = decode_png(buf)
        assert (dw, dh) == (w, h) and px.shape == (h, w, 3)
        idx = np.arange(w)[None, :] + np.arange(h)[:, None]
        want = np.stack([r0 + idx, g0 + 2 * idx, b0 + idx],
                        axis=-1).astype(np.uint8)
        assert (px == want).all()


def test_palette_closed_form_means():
    from challenge8_movies_etl_spark.operators.png import (
        encode_png_palette)
    w, h, r0, g0, b0 = 13, 7, 17, 40, 3
    _, _, px = decode_png(encode_png_palette(w, h, r0, g0, b0))
    assert px[:, :, 0].mean() == r0 + (w - 1) / 2 + (h - 1) / 2
    assert px[:, :, 1].mean() == g0 + (w - 1) + (h - 1)
    assert px[:, :, 2].mean() == b0 + (w - 1) / 2 + (h - 1) / 2


def test_palette_corruption_detected():
    from challenge8_movies_etl_spark.operators.png import (
        encode_png_palette)
    buf = encode_png_palette(4, 4, 1, 2, 3)
    # strip the PLTE chunk -> palette PNG missing PLTE
    (length,) = struct.unpack_from(">I", buf, 8)
    ihdr_end = 8 + 12 + length
    (plen,) = struct.unpack_from(">I", buf, ihdr_end)
    no_plte = buf[:ihdr_end] + buf[ihdr_end + 12 + plen:]
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(no_plte)
    # out-of-range index: 2x1 image indexing entry 1 of a 1-entry PLTE
    stream = zlib.compress(b"\x00\x00\x01")
    bad = (_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3,
                                              0, 0, 0))
           + _chunk(b"PLTE", b"\x01\x02\x03")
           + _chunk(b"IDAT", stream) + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="index out of range"):
        decode_png(bad)
    # PLTE length not a multiple of 3
    bad2 = (_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3,
                                               0, 0, 0))
            + _chunk(b"PLTE", b"\x01\x02")
            + _chunk(b"IDAT", stream) + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="multiple of 3"):
        decode_png(bad2)


def test_palette_wraparound_guard():
    from challenge8_movies_etl_spark.operators.png import (
        encode_png_palette)
    with pytest.raises(ValueError, match="wrap"):
        encode_png_palette(13, 7, 240, 0, 0)   # r0 + npal > 256
    with pytest.raises(ValueError, match="wrap"):
        encode_png_palette(13, 7, 0, 220, 0)   # g0 + 2(npal-1) > 255


def test_gradient16_roundtrip_and_refusals():
    from challenge8_movies_etl_spark.operators.png import (
        encode_png_gradient16)
    for w, h, base in [(13, 7, 50000), (1, 1, 0), (16, 9, 300)]:
        dw, dh, px = decode_png(encode_png_gradient16(w, h, base))
        assert (dw, dh) == (w, h) and px.dtype == np.uint16
        want = base + np.arange(w)[None, :] + np.arange(h)[:, None]
        assert (px == want).all()
        assert px.mean() == base + (w - 1) / 2 + (h - 1) / 2
    with pytest.raises(ValueError, match="wrap"):
        encode_png_gradient16(13, 7, 65530)


def test_adam7_matches_noninterlaced_pixel_exact():
    """Every size 1..17 x 1..11 — covers empty passes (w or h < 8),
    single-pixel images, and pass sub-grids of every shape."""
    from challenge8_movies_etl_spark.operators.png import (
        encode_png_adam7)
    for w in range(1, 18):
        for h in range(1, 12):
            a = decode_png(encode_png_adam7(w, h, 5, 10, 20))[2]
            b = decode_png(encode_png_gradient(w, h, 5, 10, 20))[2]
            assert (a == b).all(), (w, h)


def test_adam7_truncated_pass_detected():
    from challenge8_movies_etl_spark.operators.png import (
        encode_png_adam7)
    buf = bytearray(encode_png_adam7(9, 9, 1, 2, 3))
    # re-deflate a truncated scanline stream under intact chunk CRCs:
    # decode must fail on size mismatch, not scatter garbage
    import zlib as z
    (length,) = struct.unpack_from(">I", buf, 8)
    ihdr_end = 8 + 12 + length
    (ilen,) = struct.unpack_from(">I", bytes(buf), ihdr_end)
    stream = z.decompress(bytes(buf[ihdr_end + 8:ihdr_end + 8 + ilen]))
    short = z.compress(stream[:-4])
    rebuilt = (bytes(buf[:ihdr_end]) + _chunk(b"IDAT", short)
               + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(rebuilt)
