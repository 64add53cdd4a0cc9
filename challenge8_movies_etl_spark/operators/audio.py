"""REAL audio decode, no codec libraries: RIFF/WAVE PCM16.

WAV is the one mainstream audio container that needs no codec — the
payload IS the samples (little-endian PCM behind a RIFF chunk walk),
so a dependency-free decoder can be *real* rather than an
honest-stub: parse the RIFF header, walk chunks (skipping unknown
ones — real files carry LIST/INFO metadata), read ``fmt `` (PCM tag,
channels, rate, bits), de-interleave ``data``, and compute signal
features in numpy.  This fills the audio rung of the multimodal
ladder the same way operators/jpeg.py filled the image rung: the
synthesized fixtures are closed-form in doc_id, so the DuckDB oracle
can verify the DECODED features without decoding anything itself —
a wrong chunk walk, a wrong stride in de-interleave, a byte-order or
bit-depth mistake all break the value hash.

At 100 TB: identical shape to image decode — zero shuffle,
Arrow-batched mapInPandas, decode parallelism == partition count,
peak memory one Arrow batch of payloads per task.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def encode_wav_pcm16(rate: int, channels: list[np.ndarray],
                     with_list_chunk: bool = False) -> bytes:
    """Minimal-but-correct RIFF/WAVE writer: ``fmt `` (PCM, 16-bit) +
    optional ``LIST`` metadata chunk + interleaved ``data``.  The
    optional LIST chunk forces decoders to actually WALK chunks
    rather than assume data starts at byte 44."""
    n_ch = len(channels)
    n = len(channels[0])
    inter = np.empty(n * n_ch, dtype="<i2")
    for c, ch in enumerate(channels):
        inter[c::n_ch] = ch.astype("<i2")
    data = inter.tobytes()
    block_align = n_ch * 2
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * block_align,
                      block_align, 16)
    chunks = [b"fmt " + struct.pack("<I", len(fmt)) + fmt]
    if with_list_chunk:
        info = b"INFOISFT" + struct.pack("<I", 8) + b"mvetl\x00\x00\x00"
        chunks.append(b"LIST" + struct.pack("<I", len(info)) + info)
    chunks.append(b"data" + struct.pack("<I", len(data)) + data)
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Parse RIFF/WAVE → (sample_rate, n_channels, channel-0 samples
    as int64).  Walks chunks (word-aligned per the RIFF spec),
    tolerates unknown chunks, and fails loudly on anything that is
    not little-endian PCM16 — the honest-stub policy: never fake
    features for a format we cannot actually decode."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE stream")
    pos, end = 12, 8 + struct.unpack("<I", buf[4:8])[0]
    rate = n_ch = None
    samples = None
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
        body = buf[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            tag, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH",
                                                        body[:16])
            if tag != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM16 decodable without codecs "
                    f"(format tag {tag}, {bits}-bit)")
        elif cid == b"data":
            if rate is None:
                raise NotImplementedError("data chunk before fmt")
            samples = np.frombuffer(body, dtype="<i2")
        # unknown chunks (LIST, fact, ...) are skipped; chunks are
        # word-aligned so odd sizes carry a pad byte
        pos += 8 + size + (size & 1)
    if samples is None:
        raise NotImplementedError("no data chunk in WAVE stream")
    return rate, n_ch, samples[::n_ch].astype(np.int64)


AUDIO_SCHEMA = ("doc_id bigint, sample_rate bigint, channels bigint, "
                "n_samples bigint, duration_ms double, peak bigint, "
                "mean_abs double, zero_cross bigint")


def synthesize_audio(docs: DataFrame) -> DataFrame:
    """Deterministic per-doc WAV payloads: rate / length / amplitude /
    waveform slope are closed-form in doc_id.  Channel 0 is the
    sawtooth ``((i*k) mod 2A) - A``; stereo docs carry a DIFFERENT
    sawtooth (k+1) on channel 1, so a de-interleave stride mistake
    changes channel 0's features and breaks the hash.  Every 5th doc
    gets a LIST metadata chunk between fmt and data to force real
    chunk walking."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                rate = 8000 + d % 3 * 4000
                n = 50 + d % 97
                k, amp = d % 11 + 1, 1000 * (d % 7 + 1)
                i = np.arange(n, dtype=np.int64)
                chans = [(i * k) % (2 * amp) - amp]
                if d % 2:
                    chans.append((i * (k + 1)) % (2 * amp) - amp)
                payloads.append(encode_wav_pcm16(
                    rate, chans, with_list_chunk=(d % 5 == 0)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        run, schema="doc_id bigint, payload binary")


def decode_audio_features(media: DataFrame) -> DataFrame:
    """mapInPandas over binary WAV payloads → per-doc signal features
    on channel 0: duration, peak amplitude, mean |sample|, and
    zero-crossing count.  All integer math until the two final
    divisions (n*1000/rate, sum_abs/n), which are single IEEE ops —
    bit-identical on any engine — before round(,4)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "sample_rate", "channels",
                                   "n_samples", "duration_ms", "peak",
                                   "mean_abs", "zero_cross")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, n_ch, s = decode_wav_pcm16(bytes(payload))
                n = len(s)
                a = np.abs(s)
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                out["channels"].append(n_ch)
                out["n_samples"].append(n)
                out["duration_ms"].append(round(n * 1000.0 / rate, 4))
                out["peak"].append(int(a.max()))
                out["mean_abs"].append(round(int(a.sum()) / n, 4))
                out["zero_cross"].append(int((s[1:] * s[:-1] < 0).sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=AUDIO_SCHEMA)


VAD_SCHEMA = ("doc_id bigint, n_segments bigint, active_samples bigint, "
              "longest_run bigint, first_start bigint")


def vad_segments(media: DataFrame, threshold_frac: int = 2) -> DataFrame:
    """Energy-gate segmentation (the VAD shape ASR pipelines cut on):
    a sample is ACTIVE when |s| >= amp_threshold, where the threshold
    is the per-doc peak divided by ``threshold_frac`` — runs of active
    samples are the segments.  Per-payload run-length analysis happens
    in numpy inside the Arrow batch (the per-sample imperative work a
    built-in operator cannot express row-wise); output is one
    fixed-width feature row per doc, so downstream aggregation carries
    features, never samples."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "n_segments",
                                   "active_samples", "longest_run",
                                   "first_start")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _rate, _ch, s = decode_wav_pcm16(bytes(payload))
                thr = int(np.abs(s).max()) // threshold_frac
                mask = np.abs(s) >= thr
                # run-length encode the activity mask
                edges = np.flatnonzero(np.diff(
                    np.concatenate(([0], mask.view(np.int8), [0]))))
                starts, ends = edges[0::2], edges[1::2]
                runs = ends - starts
                out["doc_id"].append(doc_id)
                out["n_segments"].append(len(runs))
                out["active_samples"].append(int(runs.sum()))
                out["longest_run"].append(
                    int(runs.max()) if len(runs) else 0)
                out["first_start"].append(
                    int(starts[0]) if len(starts) else -1)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=VAD_SCHEMA)


PITCH_SCHEMA = ("doc_id bigint, best_lag bigint, ac_peak bigint, "
                "energy bigint")


def autocorr_pitch(media: DataFrame, max_lag: int = 20) -> DataFrame:
    """Autocorrelation pitch estimation over decoded channel-0 PCM16:
    ac(L) = Σ s[i]·s[i+L] for L in 1..max_lag; the reported lag is the
    argmax (ties → smallest lag, matched by iterating lags ascending).
    Everything stays in int64 — PCM16 products are ≤ 2^30 and the
    fixture signals are ≤ ~150 samples, so sums are exact integers and
    the value-hash needs no float discipline at all. This is the
    classic no-FFT pitch tracker; a spectral estimate would add
    transcendental constants no cross-engine oracle can reproduce
    bit-exactly, and for periodicity detection the time-domain
    autocorrelation is the same information."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "best_lag", "ac_peak",
                                   "energy")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _rate, _ch, s = decode_wav_pcm16(bytes(payload))
                s = s.astype(np.int64)
                best_lag, ac_peak = 0, None
                for lag in range(1, max_lag + 1):
                    ac = int(np.dot(s[:-lag], s[lag:]))
                    if ac_peak is None or ac > ac_peak:
                        best_lag, ac_peak = lag, ac
                out["doc_id"].append(doc_id)
                out["best_lag"].append(best_lag)
                out["ac_peak"].append(ac_peak)
                out["energy"].append(int(np.dot(s, s)))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=PITCH_SCHEMA)
