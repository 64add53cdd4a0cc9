"""Unit tests for the dependency-free Y4M codec (operators/video.py):
round-trip exactness for both plane layouts, frame striding, and
honest-stub refusals."""

import numpy as np
import pytest

from challenge8_movies_etl_spark.operators.video import (
    decode_y4m,
    encode_y4m,
)


def test_roundtrip_420_uniform_frames():
    frames = [(10, 20, 30), (40, 50, 60), (70, 80, 90)]
    w, h, chroma, out = decode_y4m(encode_y4m(4, 2, frames, "420jpeg"))
    assert (w, h, chroma) == (4, 2, "420jpeg")
    assert len(out) == 3
    for (y, cb, cr), (ey, ecb, ecr) in zip(out, frames):
        assert y.shape == (2, 4) and cb.shape == (1, 2)
        assert np.unique(y).tolist() == [ey]
        assert np.unique(cb).tolist() == [ecb]
        assert np.unique(cr).tolist() == [ecr]


def test_roundtrip_444_plane_geometry():
    _, _, chroma, out = decode_y4m(encode_y4m(3, 5, [(1, 2, 3)], "444"))
    assert chroma == "444"
    y, cb, cr = out[0]
    assert y.shape == cb.shape == cr.shape == (5, 3)


def test_frame_stride_not_shifted():
    # distinct per-frame values: a wrong plane size would bleed one
    # frame's bytes into the next and change later frames' content
    frames = [(i, 255 - i, i * 3 % 256) for i in range(6)]
    _, _, _, out = decode_y4m(encode_y4m(8, 4, frames, "420jpeg"))
    assert [int(f[0][0, 0]) for f in out] == [f[0] for f in frames]
    assert [int(f[2][0, 0]) for f in out] == [f[2] for f in frames]


def test_refusals():
    with pytest.raises(NotImplementedError):
        decode_y4m(b"RIFF not a y4m stream\n")
    with pytest.raises(NotImplementedError):  # C410 layout not built
        decode_y4m(b"YUV4MPEG2 W4 H4 C410\nFRAME\n" + b"\x00" * 32)
    with pytest.raises(ValueError):  # truncated frame payload
        decode_y4m(b"YUV4MPEG2 W4 H4 C444\nFRAME\n" + b"\x00" * 10)
    with pytest.raises(ValueError):  # odd dims cannot carry C420
        encode_y4m(3, 3, [(0, 0, 0)], "420jpeg")
    with pytest.raises(ValueError):  # odd width cannot carry C422
        encode_y4m(3, 3, [(0, 0, 0)], "422")


def test_c422_roundtrip():
    """Round 6: C422 (horizontal-only chroma subsample) is a real
    layout — plane sizes w/2 x h, frames walk correctly."""
    buf = encode_y4m(6, 3, [(10, 20, 30), (40, 50, 60)], "422")
    w, h, chroma, frames = decode_y4m(buf)
    assert (w, h, chroma) == (6, 3, "422")
    assert len(frames) == 2
    for (yv, cbv, crv), (y, cb, cr) in zip(
            [(10, 20, 30), (40, 50, 60)], frames):
        assert y.shape == (3, 6) and (y == yv).all()
        assert cb.shape == (3, 3) and (cb == cbv).all()
        assert cr.shape == (3, 3) and (cr == crv).all()


def test_scene_cuts_hand_built_clip(spark):
    """Frames [10, 10, 200, 200, 90]: cuts at frame 2 (|200-10|=190)
    and frame 4 (|90-200|=110); first_cut=2, max_diff=190."""
    import numpy as np

    from challenge8_movies_etl_spark.operators.video import (
        encode_y4m,
        scene_cuts,
    )

    frames = [(v, 128, 128) for v in (10, 10, 200, 200, 90)]
    media = spark.createDataFrame(
        [(7, bytearray(encode_y4m(4, 4, frames, "444")))],
        "doc_id long, payload binary")
    row = scene_cuts(media).collect()[0]
    assert row.n_frames == 5
    assert row.n_cuts == 2
    assert row.first_cut == 2
    assert row.max_diff == 190


def test_scene_cuts_no_cut_clip(spark):
    from challenge8_movies_etl_spark.operators.video import (
        encode_y4m,
        scene_cuts,
    )

    frames = [(50 + i, 0, 0) for i in range(4)]  # |diff| = 1 each
    media = spark.createDataFrame(
        [(1, bytearray(encode_y4m(2, 2, frames, "420jpeg")))],
        "doc_id long, payload binary")
    row = scene_cuts(media).collect()[0]
    assert row.n_cuts == 0 and row.first_cut == -1 and row.max_diff == 1
