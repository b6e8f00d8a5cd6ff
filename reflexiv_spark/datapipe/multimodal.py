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
