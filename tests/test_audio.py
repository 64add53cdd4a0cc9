"""Unit tests for the dependency-free RIFF/WAVE PCM16 codec
(operators/audio.py) — round-trip exactness, chunk walking, stereo
de-interleave, and honest-stub refusals on undecodable formats."""

import numpy as np
import pytest

from challenge8_movies_etl_spark.operators.audio import (
    decode_wav_pcm16,
    encode_wav_pcm16,
)


def test_roundtrip_mono_exact():
    s = np.array([0, 1, -1, 32767, -32768, 123], dtype=np.int64)
    rate, n_ch, out = decode_wav_pcm16(
        encode_wav_pcm16(16000, [s]))
    assert (rate, n_ch) == (16000, 1)
    assert out.tolist() == s.tolist()


def test_stereo_deinterleave_returns_channel0():
    a = np.arange(10, dtype=np.int64)
    b = -np.arange(10, dtype=np.int64) * 3
    rate, n_ch, out = decode_wav_pcm16(encode_wav_pcm16(8000, [a, b]))
    assert n_ch == 2
    assert out.tolist() == a.tolist()


def test_list_chunk_is_walked_not_assumed():
    s = np.array([5, -5, 7], dtype=np.int64)
    plain = decode_wav_pcm16(encode_wav_pcm16(8000, [s]))
    with_list = decode_wav_pcm16(
        encode_wav_pcm16(8000, [s], with_list_chunk=True))
    assert plain[2].tolist() == with_list[2].tolist() == s.tolist()


def test_refuses_non_riff_and_non_pcm():
    # corruption (bad magic) is ValueError per the repo convention;
    # NotImplementedError is reserved for valid-but-unsupported formats
    with pytest.raises(ValueError):
        decode_wav_pcm16(b"OggS" + b"\x00" * 40)
    # a float-format (tag 3) WAV must refuse, not fake features
    buf = bytearray(encode_wav_pcm16(8000,
                                     [np.array([1, 2], dtype=np.int64)]))
    # fmt chunk body starts at offset 20; format tag is its first u16
    buf[20:22] = (3).to_bytes(2, "little")
    with pytest.raises(NotImplementedError):
        decode_wav_pcm16(bytes(buf))


def test_zero_cross_int64_no_overflow():
    # products of adjacent samples exceed int16/int32 range; the
    # feature path must compute in int64
    s = np.array([30000, -30000, 30000], dtype=np.int64)
    _, _, out = decode_wav_pcm16(encode_wav_pcm16(8000, [s]))
    assert int((out[1:] * out[:-1] < 0).sum()) == 2


def test_vad_rle_matches_bruteforce():
    import numpy as np
    from challenge8_movies_etl_spark.operators.audio import (
        encode_wav_pcm16, decode_wav_pcm16)
    rng = np.random.RandomState(9)
    for _ in range(50):
        s = rng.randint(-100, 101, size=rng.randint(1, 60)).astype(np.int64)
        _, _, out = decode_wav_pcm16(encode_wav_pcm16(8000, [s]))
        thr = int(np.abs(out).max()) // 2
        mask = np.abs(out) >= thr
        edges = np.flatnonzero(np.diff(
            np.concatenate(([0], mask.view(np.int8), [0]))))
        starts, ends = edges[0::2], edges[1::2]
        # brute-force islands
        segs = []
        i = 0
        while i < len(mask):
            if mask[i]:
                j = i
                while j < len(mask) and mask[j]:
                    j += 1
                segs.append((i, j - i))
                i = j
            else:
                i += 1
        assert list(starts) == [a for a, _ in segs]
        assert list(ends - starts) == [b for _, b in segs]


def test_autocorr_pitch_finds_sawtooth_period():
    """For a pure sawtooth of period P <= max_lag, ac(L) peaks exactly
    at L = P (the signal realigns with itself); verify against a
    hand-built WAV outside the fixture synthesizer."""
    import numpy as np

    from challenge8_movies_etl_spark.operators.audio import (
        autocorr_pitch,
        encode_wav_pcm16,
    )

    # period-8 sawtooth: (i*250) % 2000 - 1000 repeats every 8 samples
    i = np.arange(120, dtype=np.int64)
    sig = (i * 250) % 2000 - 1000
    from challenge8_movies_etl_spark.session import get_spark
    spark = get_spark("pytest", shuffle_partitions=8)
    media = spark.createDataFrame(
        [(1, bytearray(encode_wav_pcm16(8000, [sig])))],
        "doc_id long, payload binary")
    row = autocorr_pitch(media).collect()[0]
    assert row.best_lag == 8
    assert row.energy == int(np.dot(sig, sig))
    assert row.ac_peak <= row.energy  # Cauchy-Schwarz


def test_resample_halves_rate_and_antialiases(spark):
    from challenge8_movies_etl_spark.registry import QUERIES, load_all
    from tests.conftest import SF_SMOKE
    load_all()  # standalone-run safety: don't rely on sibling modules
    dec = {r["doc_id"]: r for r in
           QUERIES["q_audio_decode"](spark, SF_SMOKE).collect()}
    res = QUERIES["q_audio_resample"](spark, SF_SMOKE).collect()
    assert len(res) == len(dec)
    for r in res:
        d = dec[r["doc_id"]]
        assert r["out_rate"] * 2 == d["sample_rate"]
        assert r["n_out"] == d["n_samples"] // 2
        # a pairwise boxcar can never raise the peak
        assert r["peak"] <= d["peak"]


def test_ulaw_companding_law():
    """G.711 mu-law properties: 256 distinct codes, odd symmetry,
    segment-0 values ±8m round-trip exactly, and every int16 value
    re-encodes to its own decoded value's code (quantizer idempotence:
    encode(decode(c)) == c for all 256 codes)."""
    from challenge8_movies_etl_spark.operators.audio import (
        _ulaw_decode, _ulaw_encode)
    decoded = [_ulaw_decode(c) for c in range(256)]
    # idempotence over the full code space
    for c in range(256):
        assert _ulaw_encode(decoded[c]) == c or decoded[c] == 0, c
    # segment-0 grid is exact
    for m in range(16):
        assert _ulaw_decode(_ulaw_encode(8 * m)) == 8 * m
        assert _ulaw_decode(_ulaw_encode(-8 * m)) == -8 * m
    # quantization error bounded by half the local step size
    for x in range(-32000, 32001, 257):
        err = abs(_ulaw_decode(_ulaw_encode(x)) - x)
        seg_step = 8 << max(0, (abs(x) + 0x84).bit_length() - 8)
        assert err <= seg_step, (x, err, seg_step)


def test_decode_wav_general_tags():
    import numpy as np
    from challenge8_movies_etl_spark.operators.audio import (
        decode_wav, encode_wav_float32, encode_wav_mulaw,
        encode_wav_pcm16)
    s = np.array([0, 8, -16, 120, -120, 0], dtype=np.int64)
    tag, rate, ch, out = decode_wav(encode_wav_pcm16(8000, [s]))
    assert (tag, rate, ch) == (1, 8000, 1) and (out == s).all()
    tag, rate, ch, out = decode_wav(encode_wav_mulaw(8000, [s]))
    assert (tag, ch) == (7, 1) and (out == s).all()  # on-grid values
    f = s / 1024.0
    tag, rate, ch, out = decode_wav(encode_wav_float32(16000, [f]))
    assert (tag, rate, ch) == (3, 16000, 1) and (out == f).all()
    # stereo de-interleave picks channel 0
    s2 = np.array([8, 16, 24, 32], dtype=np.int64)
    tag, _, ch, out = decode_wav(encode_wav_mulaw(8000, [s, s2[:6]]))\
        if False else decode_wav(
            encode_wav_mulaw(8000, [s2, s2 * 0]))
    assert ch == 2 and (out == s2).all()


def test_decode_wav_refuses_unknown_tags():
    import struct

    import pytest
    from challenge8_movies_etl_spark.operators.audio import decode_wav
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)  # ADPCM
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="format tag 2"):
        decode_wav(buf)


def test_alaw_companding_grid_and_bounds():
    import numpy as np
    from challenge8_movies_etl_spark.operators.audio import (
        _ALAW_TABLE, _alaw_decode, _alaw_encode, decode_wav,
        encode_wav_alaw)
    # segment-0 grid ±8·(2m+1) round-trips exactly
    for m in range(16):
        for v in (16 * m + 8, -(16 * m + 8)):
            assert _alaw_decode(_alaw_encode(v)) == v
    # off-grid: error bounded by the segment step (half-step rounding
    # is not guaranteed by the ITU segment search; a full step is)
    for x in range(-32768, 32768, 331):
        y = _alaw_decode(_alaw_encode(x))
        seg = max(0, ((abs(x) >> 3).bit_length()) - 5)
        assert abs(y - x) <= (16 << seg), (x, y, seg)
    # WAV round-trip on grid values incl. stereo de-interleave
    s = np.array([8, -24, 136, -248, 8], dtype=np.int64)
    tag, rate, ch, out = decode_wav(encode_wav_alaw(8000, [s]))
    assert (tag, rate, ch) == (6, 8000, 1) and (out == s).all()
    tag, _, ch, out = decode_wav(encode_wav_alaw(8000, [s, s * 0]))
    assert (tag, ch) == (6, 2) and (out == s).all()
    # decode table is the true inverse image of the encoder on codes
    assert _ALAW_TABLE.shape == (256,)
    assert int(_ALAW_TABLE.max()) > 0 > int(_ALAW_TABLE.min())


def test_wav_corruption_is_valueerror_not_refusal():
    import struct

    import numpy as np
    import pytest
    from challenge8_movies_etl_spark.operators.audio import (
        decode_wav, decode_wav_pcm16, encode_wav_pcm16)
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + b"\x00" * 40)
    # data chunk before fmt → structural corruption → ValueError
    body = (b"WAVE" + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError):
        decode_wav(buf)
    with pytest.raises(ValueError):
        decode_wav_pcm16(buf)
    # no data chunk at all → ValueError
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError):
        decode_wav(buf)
    # valid-but-unsupported stays NotImplementedError
    good = bytearray(encode_wav_pcm16(
        8000, [np.array([1, 2], dtype=np.int64)]))
    good[20:22] = (2).to_bytes(2, "little")  # ADPCM
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(good))
