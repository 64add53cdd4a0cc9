"""Audio rung of the multimodal ladder: REAL RIFF/WAVE PCM16 decode
(operators/audio.py — no codec libraries) with a closed-form DuckDB
oracle, mirroring how operators/jpeg.py made image decode real.

The oracle never touches bytes: fixtures are synthesized with
closed-form parameters in doc_id, and DuckDB regenerates the exact
sample series with unnest(generate_series(...)) to recompute every
feature — so a wrong chunk walk, de-interleave stride, byte order, or
feature formula in the Spark-side decoder breaks the value hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators import audio
from .registry import query
from .sources.fixtures import load_table


@query(
    "q_audio_decode",
    oracle="""
    WITH params AS (
      SELECT doc_id,
             8000 + doc_id % 3 * 4000 AS rate,
             50 + doc_id % 97 AS n,
             1 + doc_id % 2 AS channels,
             doc_id % 11 + 1 AS k,
             1000 * (doc_id % 7 + 1) AS amp
      FROM documents
    ), samples AS (
      SELECT doc_id, rate, n, channels,
             unnest(generate_series(0, n - 1)) AS i,
             k, amp
      FROM params
    ), sig AS (
      SELECT doc_id, rate, n, channels,
             (i * k) % (2 * amp) - amp AS s,
             lag((i * k) % (2 * amp) - amp)
               OVER (PARTITION BY doc_id ORDER BY i) AS prev
      FROM samples
    )
    SELECT doc_id,
           rate AS sample_rate,
           channels,
           n AS n_samples,
           round(n * 1000.0 / rate, 4) AS duration_ms,
           max(abs(s)) AS peak,
           round(cast(sum(abs(s)) as bigint) * 1.0 / n, 4) AS mean_abs,
           cast(coalesce(sum(CASE WHEN s * prev < 0 THEN 1 END), 0)
                as bigint) AS zero_cross
    FROM sig
    GROUP BY doc_id, rate, channels, n
    """,
)
def q_audio_decode(spark, sf_dir):
    """REAL audio decode, no codec libraries: deterministic RIFF/WAVE
    PCM16 payloads (mono/stereo alternating, every 5th with a LIST
    metadata chunk that forces genuine chunk walking) are synthesized
    per doc, then an Arrow-batched mapInPandas decoder parses the
    container — chunk walk with word alignment, fmt validation
    (PCM16-only, honest-stub refusal otherwise), channel-0
    de-interleave — and computes duration / peak / mean|s| /
    zero-crossing features in numpy.  Stereo channel 1 carries a
    different sawtooth, so a de-interleave stride bug changes channel
    0's features and the hash.

    Scale: identical shape to q_multimodal_decode — zero shuffle,
    decode parallelism == partition count, one Arrow batch of
    payloads resident per task."""
    d = load_table(spark, sf_dir, "documents")
    media = audio.synthesize_audio(d)
    feats = audio.decode_audio_features(media)
    return feats.select(
        "doc_id", "sample_rate", "channels", "n_samples",
        F.round("duration_ms", 4).alias("duration_ms"),
        "peak",
        F.round("mean_abs", 4).alias("mean_abs"),
        "zero_cross")
