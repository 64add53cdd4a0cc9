"""Progressive (SOF2) JPEG: the Annex-G decode path must reproduce
the baseline decode bit-for-bit for identical quantized coefficients
— the strongest equivalence available without an external codec."""

import numpy as np

from challenge8_movies_etl_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg_blocks,
    encode_jpeg_progressive_blocks,
    encode_jpeg_progressive_gray_uniform,
)


def _rand_blocks(rng, nb):
    out = []
    for _ in range(nb):
        zz = np.zeros(64, np.int64)
        zz[0] = rng.randint(-60, 61)
        for _ in range(rng.randint(0, 12)):
            zz[rng.randint(1, 64)] = rng.randint(-30, 31)
        out.append(zz)
    return out


def test_progressive_equals_baseline_on_random_coefficients():
    rng = np.random.RandomState(2026)
    for _ in range(40):
        nbx, nby = rng.randint(1, 5), rng.randint(1, 3)
        blocks = _rand_blocks(rng, nbx * nby)
        w, h = nbx * 8, nby * 8
        _, _, base = decode_jpeg(encode_jpeg_blocks(w, h, blocks))
        _, _, prog = decode_jpeg(
            encode_jpeg_progressive_blocks(w, h, blocks))
        assert np.array_equal(base, prog)


def test_progressive_uniform_closed_form():
    # even gray -> DC quantization exact -> decoded plane uniform,
    # including non-multiple-of-8 dimensions (crop path)
    for w, h, g in ((5, 4, 130), (13, 7, 2), (16, 8, 254)):
        ww, hh, img = decode_jpeg(
            encode_jpeg_progressive_gray_uniform(w, h, g))
        assert (ww, hh) == (w, h)
        assert img.shape == (h, w) and np.unique(img).tolist() == [g]


def test_progressive_eob_runs_and_refinement_zrl():
    # 20 repeats of (sparse far-tail block, all-zero block): the
    # refine scan gets |c|==1 coefficients 32 zero-positions apart
    # (ZRL inside refinement) and EOB runs spanning many blocks
    zz = np.zeros(64, np.int64)
    zz[0], zz[30], zz[63] = 4, 1, -1
    blocks = [zz, np.zeros(64, np.int64)] * 20
    _, _, base = decode_jpeg(encode_jpeg_blocks(16, 80, blocks))
    _, _, prog = decode_jpeg(
        encode_jpeg_progressive_blocks(16, 80, blocks))
    assert np.array_equal(base, prog)


def test_progressive_stream_is_really_sof2():
    buf = encode_jpeg_progressive_gray_uniform(8, 8, 100)
    assert b"\xff\xc2" in buf and b"\xff\xc0" not in buf
