"""Multimodal columns: opaque binary payloads + typed metadata.

Design (SURVEY.md §2 C5): image/audio/video travel as BinaryType
columns next to typed metadata; decode / feature-extract / resize /
frame-sample run as Arrow-batched Pandas functions over mapInPandas so
each worker touches only its partition's bytes — the bytes NEVER move
through the driver.

The real codecs (PIL/av/librosa) are not in this container, so the
decode kernels are STUBBED: ``decode_image_real`` raises
NotImplementedError, and ``fake_image_meta`` is the deterministic
stand-in wired through the real Spark plumbing (schema, partitioning,
UDF signature, Arrow batch shape) and exercised by tests + oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Output schema of the image-decode stage.
IMAGE_META_SCHEMA = "doc_id bigint, n_bytes int, width int, height int, channels int"


def attach_binary(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Model a multimodal table: (id, content: binary). The fixture has
    no real image bytes, so UTF-8 text bytes stand in as the payload."""
    return df.select(F.col(id_col), F.encode(F.col(text_col), "utf-8").alias("content"))


def decode_image_real(content: bytes) -> dict:
    """Real image decode — requires PIL, which is not installed here.

    STUB: replace the body with ``PIL.Image.open(io.BytesIO(content))``
    when the codec is available; the Spark-side plumbing
    (``image_meta``) is unchanged.
    """
    raise NotImplementedError("image codecs not available in this environment")


def fake_image_meta(content: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in decode: metadata derived from the bytes."""
    n = len(content)
    return n, n % 64 + 1, (n * 7) % 64 + 1, 3


def image_meta(df: DataFrame, id_col: str = "doc_id", content_col: str = "content") -> DataFrame:
    """mapInPandas decode stage: (id, content) -> IMAGE_META_SCHEMA.

    Arrow-batched; one Python worker per partition; output is columnar
    metadata only (the heavy bytes are dropped as early as possible,
    which is what you want when the input is 100 TB of media).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [fake_image_meta(c) for c in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "n_bytes": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                    "channels": [m[3] for m in metas],
                }
            )

    return df.mapInPandas(decode, IMAGE_META_SCHEMA)


def resize_image(content: bytes, width: int, height: int) -> bytes:
    """STUB — needs an image codec; plumbing mirrors image_meta."""
    raise NotImplementedError("image codecs not available in this environment")


# Output schema of the frame-sampling stage: one row per sampled frame.
FRAME_SCHEMA = "doc_id bigint, frame_no int, frame binary, frame_bytes int"


def decode_frames_real(content: bytes, every_n: int) -> list[bytes]:
    """Real video frame extraction — requires PyAV/ffmpeg (absent here).

    STUB: replace with ``av.open(io.BytesIO(content))`` keyframe
    iteration when the codec lands; ``sample_frames`` plumbing is
    unchanged.
    """
    raise NotImplementedError("video codecs not available in this environment")


def fake_frames(content: bytes, every_n: int) -> list[bytes]:
    """Deterministic stand-in: treat the payload as a fixed-size frame
    stream (64-byte 'frames'), keeping every n-th chunk."""
    frames = [content[i : i + 64] for i in range(0, len(content), 64)]
    return frames[::every_n]


def sample_frames(
    df: DataFrame,
    every_n: int = 2,
    id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """mapInPandas frame-sampling stage: (id, content) → FRAME_SCHEMA.

    A flat-map in Arrow batches — one input video row fans out to its
    sampled frames, bytes stay worker-local. At 100 TB the input is
    repartitioned by size (maxPartitionBytes) so a few giant videos
    don't skew tasks; output rows carry small frames + metadata, ready
    for a downstream embed/score stage.
    """

    def explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for doc_id, content in zip(pdf[id_col], pdf[content_col]):
                for i, fr in enumerate(fake_frames(bytes(content), every_n)):
                    ids.append(doc_id)
                    nos.append(i)
                    frames.append(fr)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_no": nos,
                    "frame": frames,
                    "frame_bytes": [len(f) for f in frames],
                }
            )

    return df.mapInPandas(explode_frames, FRAME_SCHEMA)
