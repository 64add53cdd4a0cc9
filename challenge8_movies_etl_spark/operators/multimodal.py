"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
iterators (mapInPandas).

The container has no image/audio codecs, so the DECODE step is a
deterministic stub (documented below); everything around it — binary
column handling, Arrow batch shapes, output schema, partitioning — is
real and oracle-checkable, because the stub's "features" are pure
arithmetic on payload bytes that the DuckDB oracle reproduces in SQL.

At 100 TB: mapInPandas streams Arrow record batches per partition, so
peak memory is one batch of payloads, not a partition of decoded
frames; decode parallelism == partition count, no shuffle at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("doc_id bigint, n_bytes bigint, fake_width bigint, "
                "fake_height bigint, fmt string")


def attach_payload(docs: DataFrame) -> DataFrame:
    """Treat the document text bytes as the opaque media payload
    (binary column) — the fixture stand-in for real image bytes."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        "n_chars",
    )


def decode_stub(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decoder for one Arrow batch.

    A real deployment replaces the body with e.g. PIL/libvips decode —
    signature and batch shape stay identical. Raising path for codecs
    that are genuinely absent:

        raise NotImplementedError("image codecs not present in this
        container; decode_stub provides deterministic fake features")

    The fake features are pure byte arithmetic so the DuckDB oracle can
    verify the full pipeline.
    """
    n_bytes = pdf["payload"].map(len)
    return pd.DataFrame({
        "doc_id": pdf["doc_id"],
        "n_bytes": n_bytes,
        "fake_width": (n_bytes % 64) * 16,
        "fake_height": (n_bytes % 48) * 16,
        "fmt": "fake/raw",
    })


def decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas over binary payloads → typed metadata rows."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_stub(pdf)

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_len bigint"


def frame_sample(media: DataFrame, frame_bytes: int = 32,
                 every: int = 4) -> DataFrame:
    """Video-style frame sampling over opaque payloads: chunk each
    payload into ``frame_bytes`` frames, keep every ``every``-th one —
    the mapInPandas row-EXPLODING shape (one input row → many output
    rows) that real frame extractors use. Decode is the stub (byte
    slicing); batch shape, schema, and fan-out are real. At 100 TB the
    fan-out happens executor-side inside the Arrow batch, never on the
    driver, and needs no shuffle."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc, idx, ln = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                n_frames = (n + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every):
                    doc.append(doc_id)
                    idx.append(i)
                    ln.append(min(frame_bytes, n - i * frame_bytes))
            yield pd.DataFrame({"doc_id": doc, "frame_idx": idx,
                                "frame_len": ln})

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
