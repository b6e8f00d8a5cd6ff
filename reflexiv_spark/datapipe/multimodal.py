"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video travel as ``binary`` columns plus a metadata struct;
decode / feature-extraction are Arrow-batched ``mapInPandas`` stages.

Real decode coverage (stdlib + numpy only — no PIL/opencv/ffmpeg in this
container):

- **PNG** (``decode_images(fake=False)``): full decode — chunk walk,
  zlib-inflate, scanline unfilter (filters 0-4), true pixel mean — for
  8-bit gray/RGB/(A) images; palette/16-bit return real dimensions with a
  null mean.
- **WAV PCM16** (``sample_audio_frames(fake=False)``): canonical-header
  files are frame-chunked JVM-side (aligned to the sample grid) and each
  frame's RMS is computed from the real int16 samples.

JPEG decode, image resampling, video keyframes and learned feature
extraction still require external libraries/models; those bodies raise
``NotImplementedError`` unless ``fake=True`` (deterministic stubs with
the production batch shapes).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(blob: bytes) -> tuple[int, int, int, float | None]:
    """Pure stdlib+numpy PNG decode → (width, height, channels, mean).

    Chunk walk → IHDR fields → zlib-inflated IDAT → per-scanline
    unfilter (filter types 0-4) → true pixel mean, for 8-bit depth color
    types 0/2/4/6 (gray, RGB, gray+A, RGBA), non-interlaced. Palette,
    16-bit and interlaced images return real dimensions with mean=None.
    Raises ``ValueError`` on a malformed stream.
    """
    import struct
    import zlib

    import numpy as np

    if blob[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos, idat, ihdr = len(_PNG_SIG), [], None
    while pos + 8 <= len(blob):
        (ln,) = struct.unpack(">I", blob[pos : pos + 4])
        typ = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    channels = _PNG_CHANNELS.get(ctype)
    if channels is None:
        raise ValueError(f"PNG unknown color type {ctype}")
    if depth != 8 or ctype == 3 or interlace != 0:
        return (w, h, channels, None)
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride, bpp = w * channels, channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel payload size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    at = 0
    for y in range(h):
        f = int(raw[at])
        line = raw[at + 1 : at + 1 + stride].astype(np.int32)
        at += 1 + stride
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need a left-to-right scan
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                if f == 1:
                    pr = a
                elif f == 3:
                    pr = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(line[x]) + pr) & 0xFF
        else:
            raise ValueError(f"PNG bad filter type {f}")
        out[y] = rec.astype(np.uint8)
    return (w, h, channels, float(out.mean()))


def decode_images(
    df: DataFrame, blob_col: str = "blob", id_col: str = "id", fake: bool = False
) -> DataFrame:
    """blob → (id, width, height, channels, mean_value) via mapInPandas.

    ``fake=False`` really decodes PNG payloads (:func:`decode_png` —
    stdlib zlib + numpy unfilter, true pixel mean) and raises
    ``NotImplementedError`` for formats that need an external decoder
    (JPEG etc.). ``fake=True`` derives deterministic pseudo-dimensions
    from the payload bytes (real batch shapes, fake pixels).
    """
    cols = df.select(F.col(id_col).alias("id"), F.col(blob_col).alias("blob"))

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                rows = []
                for i, b in zip(pdf["id"], pdf["blob"]):
                    b = bytes(b or b"")
                    if b[: len(_PNG_SIG)] != _PNG_SIG:
                        raise NotImplementedError(
                            "only PNG decodes natively (stdlib zlib); other "
                            "image formats require PIL/opencv — not available "
                            "in this container. Pass fake=True for the stub"
                        )
                    w, h, ch, mean = decode_png(b)
                    rows.append((i, w, h, ch, mean))
                yield pd.DataFrame(
                    rows, columns=["id", "width", "height", "channels", "mean_value"]
                )
                continue
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


def _le16(blob: Column, pos: int) -> Column:
    """Little-endian uint16 at 1-based byte ``pos`` of a binary column —
    pure Catalyst (hex + byte-swap + conv)."""
    h = F.hex(F.substring(blob, pos, 2))
    return F.conv(
        F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2)), 16, 10
    ).cast("int")


def _le32(blob: Column, pos: int) -> Column:
    h = F.hex(F.substring(blob, pos, 4))
    swapped = F.concat(
        F.substring(h, 7, 2), F.substring(h, 5, 2),
        F.substring(h, 3, 2), F.substring(h, 1, 2),
    )
    return F.conv(swapped, 16, 10).cast("bigint")


def _is_canonical_pcm16(blob: Column) -> Column:
    """Canonical 44-byte-header WAV: RIFF/WAVE, 16-byte PCM fmt chunk,
    16-bit samples, 'data' chunk immediately after fmt."""
    return (
        (F.substring(blob, 1, 4) == F.lit(b"RIFF"))
        & (F.substring(blob, 9, 8) == F.lit(b"WAVEfmt "))
        & (_le32(blob, 17) == 16)  # fmt chunk size
        & (_le16(blob, 21) == 1)  # audio format = PCM
        & (_le16(blob, 35) == 16)  # bits per sample
        & (F.substring(blob, 37, 4) == F.lit(b"data"))
    )


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

    ``fake=False`` is REAL for canonical-header PCM16 WAV payloads
    (stdlib/struct-level parsing, no audio library): the header is
    validated and the data offset located with Catalyst byte arithmetic,
    frames are carved on the sample grid, and each frame's RMS is computed
    from its int16 samples (normalized to [-1, 1]). Compressed audio
    raises ``NotImplementedError``. ``fake=True`` keeps the deterministic
    stub over raw byte chunks.
    """
    if not fake and frame_bytes % 2:
        raise ValueError("frame_bytes must be even for int16 sample alignment")
    if fake:
        frames = df.select(
            F.col(id_col).alias("id"),
            F.col(blob_col).alias("blob"),
            F.posexplode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.length(blob_col).cast("int"), F.lit(1)),
                    F.lit(frame_bytes),
                )
            ).alias("frame_idx", "off"),
        ).select(
            "id",
            "frame_idx",
            F.substring(F.col("blob"), F.col("off"), F.lit(frame_bytes)).alias(
                "frame"
            ),
            F.lit(True).alias("__pcm"),
        )
    else:
        blob = F.col(blob_col)
        pcm = _is_canonical_pcm16(blob)
        data_end = F.least(
            F.lit(44) + _le32(blob, 41), F.length(blob).cast("bigint")
        ).cast("int")
        # non-PCM rows keep one sentinel frame so the python stage can
        # raise an honest NotImplementedError instead of silently dropping
        offs = F.when(
            pcm, F.sequence(F.lit(45), F.greatest(data_end, F.lit(45)), F.lit(frame_bytes))
        ).otherwise(F.array(F.lit(1)))
        frames = (
            df.select(
                F.col(id_col).alias("id"),
                blob.alias("blob"),
                pcm.alias("__pcm"),
                data_end.alias("__end"),
                F.posexplode(offs).alias("frame_idx", "off"),
            )
            .select(
                "id",
                "frame_idx",
                F.substring(
                    F.col("blob"),
                    F.col("off"),
                    F.least(
                        F.lit(frame_bytes), F.col("__end") - F.col("off") + 1
                    ),
                ).alias("frame"),
                "__pcm",
            )
            .where(F.length("frame") > 0)
        )

    def featurize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not fake:
                if not bool(pdf["__pcm"].all()):
                    raise NotImplementedError(
                        "only canonical-header PCM16 WAV decodes natively; "
                        "compressed audio requires soundfile/librosa — not "
                        "available in this container. Pass fake=True for the "
                        "stub"
                    )
                ns, rms = [], []
                for fr in pdf["frame"]:
                    fr = bytes(fr or b"")
                    arr = np.frombuffer(fr[: len(fr) // 2 * 2], dtype="<i2")
                    ns.append(len(arr))
                    x = arr.astype(np.float64) / 32768.0
                    rms.append(
                        round(float(np.sqrt(np.mean(x * x))), 6) if len(arr) else 0.0
                    )
                yield pd.DataFrame(
                    {
                        "id": pdf["id"],
                        "frame_idx": pdf["frame_idx"],
                        "n_samples": ns,
                        "rms": rms,
                    }
                )
                continue
            n = pdf["frame"].str.len().fillna(0).astype(int)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "frame_idx": pdf["frame_idx"],
                    "n_samples": n // 2,
                    "rms": ((n % 97) / 96.0).round(6),
                }
            )

    return frames.select("id", "frame_idx", "frame", "__pcm").mapInPandas(
        featurize, schema=AUDIO_FRAMES_SCHEMA
    )


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
