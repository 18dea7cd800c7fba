"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video ride as opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract run as Arrow-batched ``mapInPandas`` so
bytes never round-trip through Python row objects.  The actual codec calls
are STUBBED (no image/audio libraries in this container): decode_stub
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder derives metadata from the byte content — the
Spark-side plumbing (schema, batch shape, partitioning) is real and tested.

At 100 TB the pattern is: store blobs in the table (or object-store
pointers), keep ``spark.sql.execution.arrow.maxRecordsPerBatch`` small
enough that batch_bytes = batch_rows * avg_blob fits executor memory, and
partition by content hash so decode work balances.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, "
    "width int, height int, sha256 string, n_bytes long"
)


def attach_media_column(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test harness: derive a deterministic binary payload from text."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image/fake").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
    )


def decode_stub(content: bytes, fake: bool):
    if not fake:
        raise NotImplementedError(
            "real image/audio decode requires PIL/ffmpeg — not in this container"
        )
    # deterministic fake: dimensions derived from a stable digest
    digest = hashlib.sha256(content).hexdigest()
    width = 64 + int(digest[:4], 16) % 960
    height = 64 + int(digest[4:8], 16) % 960
    return width, height, digest


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary content (Arrow batches)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, digests, sizes = [], [], [], []
            for content in pdf["content"]:
                b = bytes(content)
                w, h, d = decode_stub(b, fake)
                widths.append(w)
                heights.append(h)
                digests.append(d)
                sizes.append(len(b))
            out = pdf[["media_id", "kind", "content"]].copy()
            out["width"] = widths
            out["height"] = heights
            out["sha256"] = digests
            out["n_bytes"] = sizes
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, kind string, content binary, "
    "width int, height int, resized_width int, resized_height int"
)


def resize_media(media: DataFrame, max_dim: int = 256, fake: bool = True) -> DataFrame:
    """Resize plumbing (Arrow-batched mapInPandas).

    The real pixel resample is stubbed (no PIL/ffmpeg here); the fake path
    computes the exact target geometry (aspect-preserving clamp to
    ``max_dim``) from the fake-decoded dimensions and passes content
    through, so schema / batch shape / partitioning — everything Spark
    sees — is production-real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                b = bytes(content)
                w, h, _ = decode_stub(b, fake)
                scale = min(1.0, max_dim / max(w, h))
                rows.append(
                    (
                        int(media_id), str(kind), b, w, h,
                        max(1, int(w * scale)), max(1, int(h * scale)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "content", "width", "height",
                    "resized_width", "resized_height",
                ],
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, frame_bytes binary, pts_ms long"


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    chunk_bytes: int = 64,
    fake: bool = True,
) -> DataFrame:
    """Frame sampling plumbing: one input blob -> N frame rows (flatMap
    shape via mapInPandas, so a video row fans out without exploding
    through Python row objects).

    The fake decoder treats the payload as a byte stream and emits one
    "frame" per ``chunk_bytes`` slice with a synthetic timestamp every
    ``every_ms``; a real build swaps ``decode_stub``-style slicing for
    ffmpeg keyframe extraction with the same output schema.
    """
    if not fake:
        raise NotImplementedError(
            "real frame sampling requires ffmpeg — not in this container"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                n = max(1, -(-len(b) // chunk_bytes))
                for i in range(n):
                    rows.append(
                        (
                            int(media_id),
                            i,
                            b[i * chunk_bytes : (i + 1) * chunk_bytes],
                            i * every_ms,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_bytes", "pts_ms"]
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
