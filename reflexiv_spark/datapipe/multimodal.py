"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video travel as ``binary`` columns plus a metadata struct;
decode / feature-extraction are Arrow-batched ``mapInPandas`` stages. The
decode bodies are STUBBED (the image/audio libraries are not available in
this container) behind ``fake=True`` deterministic implementations — the
Spark-side plumbing (schemas, batch iteration, partitioning) is real and
tested, so swapping a real decoder in changes one function body.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Magic-byte prefixes for cheap format sniffing (JVM-side, no decode).
_MAGIC = {
    "89504e47": "png",
    "ffd8ffe0": "jpeg",
    "ffd8ffe1": "jpeg",
    "52494646": "riff",  # wav/avi container
    "1a45dfa3": "matroska",
}

DECODED_IMAGE_SCHEMA = (
    "id bigint, width int, height int, channels int, mean_value double"
)
AUDIO_FRAMES_SCHEMA = "id bigint, frame_idx int, n_samples int, rms double"
RESIZED_IMAGE_SCHEMA = "id bigint, width int, height int, blob binary"
VIDEO_FRAMES_SCHEMA = "id bigint, frame_idx int, frame binary, digest string"
FEATURE_DIM = 64


def sniff_format(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Attach a ``format`` column from the payload's magic bytes —
    pure Catalyst (hex prefix compare), no Python, no decode."""
    prefix = F.lower(F.hex(F.substring(F.col(blob_col), 1, 4)))
    expr = F.lit("unknown")
    for magic, fmt in _MAGIC.items():
        expr = F.when(prefix == magic, fmt).otherwise(expr)
    return df.withColumn("format", expr)


def blob_meta(df: DataFrame, blob_col: str = "blob", id_col: str = "id") -> DataFrame:
    """Typed metadata for an opaque binary column: byte length, MD5,
    sniffed format. All JVM-side expressions."""
    return sniff_format(df, blob_col).select(
        F.col(id_col),
        F.length(F.col(blob_col)).alias("byte_len"),
        F.md5(F.col(blob_col)).alias("digest"),
        "format",
    )


def decode_images(
    df: DataFrame, blob_col: str = "blob", id_col: str = "id", fake: bool = False
) -> DataFrame:
    """blob → (id, width, height, channels, mean_value) via mapInPandas.

    ``fake=True`` derives deterministic pseudo-dimensions from the payload
    bytes (real batch shapes, fake pixels); ``fake=False`` raises until a
    real decoder (PIL/opencv) is wired in.
    """
    cols = df.select(F.col(id_col).alias("id"), F.col(blob_col).alias("blob"))

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires PIL/opencv; not available in this "
                    "container — pass fake=True for the deterministic stub"
                )
            blobs = pdf["blob"]
            n = blobs.str.len().fillna(0).astype(int)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "width": (n % 640) + 1,
                    "height": ((n // 7) % 480) + 1,
                    "channels": (n % 3) + 1,
                    "mean_value": ((n % 256) / 255.0).round(6),
                }
            )

    return cols.mapInPandas(decode, schema=DECODED_IMAGE_SCHEMA)


def sample_audio_frames(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
    frame_bytes: int = 1024,
    fake: bool = False,
) -> DataFrame:
    """blob → one row per fixed-size frame (id, frame_idx, n_samples, rms).

    Frame fan-out happens JVM-side (sequence+explode on byte offsets); only
    the per-frame feature is a pandas stage, so a 1-hour recording fans out
    to frames before hitting Python — batch shape is (frames, frame_bytes),
    not (files, file_bytes).
    """
    frames = df.select(
        F.col(id_col).alias("id"),
        F.col(blob_col).alias("blob"),
        F.posexplode(
            F.sequence(
                F.lit(1), F.greatest(F.length(blob_col).cast("int"), F.lit(1)), F.lit(frame_bytes)
            )
        ).alias("frame_idx", "off"),
    ).select(
        "id",
        "frame_idx",
        F.substring(F.col("blob"), F.col("off"), F.lit(frame_bytes)).alias("frame"),
    )

    def featurize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio decode requires soundfile/librosa; not available "
                    "in this container — pass fake=True for the stub"
                )
            n = pdf["frame"].str.len().fillna(0).astype(int)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "frame_idx": pdf["frame_idx"],
                    "n_samples": n // 2,
                    "rms": ((n % 97) / 96.0).round(6),
                }
            )

    return frames.mapInPandas(featurize, schema=AUDIO_FRAMES_SCHEMA)


def resize_images(
    df: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    blob_col: str = "blob",
    id_col: str = "id",
    fake: bool = False,
) -> DataFrame:
    """blob → (id, width, height, blob) resized payloads via mapInPandas.

    The stub truncates/zero-pads the payload to ``target_w*target_h``
    bytes (deterministic, real batch/memory shape); a real implementation
    replaces the body with a PIL/opencv resample.
    """
    cols = df.select(F.col(id_col).alias("id"), F.col(blob_col).alias("blob"))
    size = target_w * target_h

    def resize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resize requires PIL/opencv; not available in "
                    "this container — pass fake=True for the stub"
                )
            out = [
                (b or b"")[:size].ljust(size, b"\x00") for b in pdf["blob"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "width": target_w,
                    "height": target_h,
                    "blob": out,
                }
            )

    return cols.mapInPandas(resize, schema=RESIZED_IMAGE_SCHEMA)


def sample_video_frames(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
    frame_bytes: int = 4096,
    every_nth: int = 10,
) -> DataFrame:
    """blob → every ``every_nth`` fixed-size chunk as a pseudo-frame row
    (id, frame_idx, frame, digest). Entirely JVM-side (sequence + explode
    + substring + md5): a real keyframe extractor would replace the
    chunking with an ffmpeg ``mapInPandas`` stage, but the fan-out,
    sampling stride and per-frame schema are the production shape — an
    hour of video becomes frame rows BEFORE any Python/decoder touches
    the data."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.col(blob_col).alias("blob"),
            F.posexplode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.length(blob_col).cast("int"), F.lit(1)),
                    F.lit(frame_bytes * every_nth),
                )
            ).alias("frame_idx", "off"),
        )
        .select(
            "id",
            "frame_idx",
            F.substring(F.col("blob"), F.col("off"), F.lit(frame_bytes)).alias(
                "frame"
            ),
        )
        .withColumn("digest", F.md5(F.col("frame")))
    )


def extract_features(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "id",
    dim: int = FEATURE_DIM,
    fake: bool = False,
) -> DataFrame:
    """blob → (id, embedding: array<double>) feature vectors.

    The stub derives a deterministic unit vector from the payload's MD5
    (numpy, one RNG seed per row, vectorized batch stack); a real model
    replaces the body with an ONNX/torch forward pass. Output feeds the
    similarity operators (:mod:`reflexiv_spark.datapipe.similarity`)
    directly — blob → embedding → ANN is the end-to-end multimodal path.
    """
    cols = df.select(F.col(id_col).alias("id"), F.col(blob_col).alias("blob"))
    schema = f"id bigint, embedding array<double>"

    def embed(batches: Iterator) -> Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "feature extraction requires a vision/audio model; not "
                    "available in this container — pass fake=True for the stub"
                )
            vecs = []
            for b in pdf["blob"]:
                seed = int.from_bytes(
                    hashlib.md5(b or b"").digest()[:4], "big"
                )
                v = np.random.RandomState(seed).randn(dim)
                vecs.append((v / np.linalg.norm(v)).tolist())
            yield pd.DataFrame({"id": pdf["id"], "embedding": vecs})

    return cols.mapInPandas(embed, schema=schema)
