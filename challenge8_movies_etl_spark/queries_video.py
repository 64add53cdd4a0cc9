"""Video rung of the multimodal ladder: REAL Y4M (YUV4MPEG2) decode
(operators/video.py — no codec libraries) with a closed-form DuckDB
oracle, completing the image (jpeg.py) / audio (audio.py) / video
trio of honest dependency-free decoders.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators import video
from .registry import query
from .sources.fixtures import load_table


@query(
    "q_video_framestats",
    oracle="""
    WITH params AS (
      SELECT doc_id,
             2 * (doc_id % 8 + 1) AS width,
             2 * (doc_id % 4 + 1) AS height,
             3 + doc_id % 5 AS n,
             CASE WHEN doc_id % 2 = 0 THEN '420jpeg' ELSE '444' END
               AS chroma
      FROM documents
    ), f AS (
      SELECT doc_id, width, height, chroma,
             unnest(generate_series(0, n - 1)) AS i
      FROM params
    )
    SELECT doc_id, i AS frame_idx, width, height, chroma,
           round(cast((doc_id * 7 + i * 31) % 256 as double), 4)
             AS mean_y,
           round(cast((doc_id * 13 + i * 17) % 256 as double), 4)
             AS mean_cb,
           round(cast((doc_id * 19 + i * 23) % 256 as double), 4)
             AS mean_cr
    FROM f WHERE i % 2 = 0
    """,
)
def q_video_framestats(spark, sf_dir):
    """REAL video decode, no codec libraries: deterministic YUV4MPEG2
    payloads (alternating C420jpeg / C444 plane layouts, 3-7 frames
    each) are synthesized per doc, then an Arrow-batched mapInPandas
    decoder parses the container — stream-header tokens, per-frame
    FRAME markers, plane offsets from the declared chroma geometry —
    samples every 2nd frame, and computes per-plane means.  A wrong
    plane size, plane order, or frame stride shifts every subsequent
    byte and breaks the value hash.  Replaces the byte-chunk stand-in
    (q_multimodal_framesample keeps the generic-payload fan-out
    shape; THIS row decodes real frames).

    Scale: zero shuffle, Arrow-streamed; the one-row-per-frame
    fan-out happens inside the executor batch, never on the driver."""
    d = load_table(spark, sf_dir, "documents")
    media = video.synthesize_videos(d)
    feats = video.frame_stats(media, every=2)
    return feats.select(
        "doc_id", "frame_idx", "width", "height", "chroma",
        F.round("mean_y", 4).alias("mean_y"),
        F.round("mean_cb", 4).alias("mean_cb"),
        F.round("mean_cr", 4).alias("mean_cr"))


@query(
    "q_video_scenecut",
    oracle="""
    WITH params AS (
      SELECT doc_id, 3 + doc_id % 5 AS n FROM documents
    ), f AS (
      SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i
      FROM params
    ), luma AS (
      SELECT doc_id, n, i,
             (doc_id * 7 + i * 31) % 256 AS y,
             lag((doc_id * 7 + i * 31) % 256)
               OVER (PARTITION BY doc_id ORDER BY i) AS prev
      FROM f
    ), diffs AS (
      SELECT doc_id, n, i, abs(y - prev) AS d
      FROM luma WHERE prev IS NOT NULL
    )
    SELECT doc_id,
           cast(max(n) as bigint) AS n_frames,
           cast(coalesce(sum(CASE WHEN d >= 64 THEN 1 END), 0)
                as bigint) AS n_cuts,
           cast(coalesce(min(CASE WHEN d >= 64 THEN i END), -1)
                as bigint) AS first_cut,
           cast(max(d) as bigint) AS max_diff
    FROM diffs GROUP BY doc_id
    """,
)
def q_video_scenecut(spark, sf_dir):
    """Shot-boundary detection over DECODED Y4M frames
    (operators/video.scene_cuts): per-pixel mean |ΔY| between
    consecutive decoded luma planes, thresholded at 64 — the
    shot-segmentation pass a video-curation pipeline runs before
    frame sampling, so clips are sampled per shot rather than
    uniformly across cuts. The fixture frames are uniform, making the
    mean diff an exact integer the oracle reproduces from the closed
    form; a plane-size / stride / chroma-layout mistake in the decoder
    changes the luma bytes and breaks the hash.

    Scale: zero shuffle — per-payload frame walk inside the Arrow
    batch, one fixed-width row per clip out."""
    d = load_table(spark, sf_dir, "documents")
    media = video.synthesize_videos(d)
    return video.scene_cuts(media)


@query(
    "q_video_chroma422",
    oracle="""
    WITH params AS (
      SELECT doc_id,
             2 * (doc_id % 8 + 1) AS width,
             doc_id % 7 + 1 AS height,
             3 + doc_id % 5 AS n
      FROM documents WHERE doc_id % 5 = 2
    ), f AS (
      SELECT doc_id, width, height,
             unnest(generate_series(0, n - 1)) AS i
      FROM params
    )
    SELECT doc_id, i AS frame_idx, width, height,
           '422' AS chroma,
           round(cast((doc_id * 7 + i * 31) % 256 as double), 4)
             AS mean_y,
           round(cast((doc_id * 13 + i * 17) % 256 as double), 4)
             AS mean_cb,
           round(cast((doc_id * 19 + i * 23) % 256 as double), 4)
             AS mean_cr
    FROM f WHERE i % 2 = 0
    """,
)
def q_video_chroma422(spark, sf_dir):
    """REAL C422 Y4M decode (round 6: the interchange chroma layout
    q_video_framestats' C420/C444 rotation didn't walk): chroma
    planes are w/2 x h — subsampled horizontally only, so ODD frame
    heights are legal (the fixture uses them, which C420 cannot) and
    any decoder that reuses the 2x2 plane size reads misaligned
    frames and breaks every subsequent mean.

    Scale: identical to q_video_framestats — zero shuffle,
    Arrow-streamed, frame fan-out inside the executor batch."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 5 == 2)
    media = video.synthesize_videos_422(d)
    feats = video.frame_stats(media, every=2)
    return feats.select(
        "doc_id", "frame_idx", "width", "height", "chroma",
        F.round("mean_y", 4).alias("mean_y"),
        F.round("mean_cb", 4).alias("mean_cb"),
        F.round("mean_cr", 4).alias("mean_cr"))
