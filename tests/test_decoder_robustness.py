"""Adversarial-input robustness for the native image/container
decoders: forged headers, truncations, and byte corruptions must raise
``ValueError`` (or ``NotImplementedError`` for unsupported formats)
quickly — never hang, attempt an unbounded allocation, or escape with a
foreign exception type — and the Arrow operator surface must convert
every failure into a per-row status, never a dead batch."""

from __future__ import annotations

import random
import struct
import zlib

import numpy as np
import pytest

from reflexiv_spark.datapipe.multimodal import (
    _MAX_PIXELS,
    decode_bmp,
    decode_gif,
    decode_jpeg,
    decode_png,
)
from tests.gif_encoder import encode_gif
from tests.jpeg_encoder import encode_jpeg, encode_progressive_jpeg
from tests.test_multimodal_real import _encode_png, _encode_png_variant

OK_ERRORS = (ValueError, NotImplementedError)


def _valid_corpus():
    rng = np.random.RandomState(7)
    px8 = rng.randint(0, 256, (12, 9, 3)).astype(np.uint8)
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, (8, 8))
    gif_px = [[(x * 16 % 256, 0, 128) for x in range(8)] for _ in range(6)]
    bmp = _make_bmp(rng.randint(0, 256, (6, 5, 3)).astype(np.uint8))
    return {
        decode_png: [
            _encode_png(px8),
            _encode_png_variant(idx, depth=4, ctype=3, palette=pal),
            _encode_png_variant(px8, ctype=2, interlace=1),
        ],
        decode_jpeg: [
            encode_jpeg(px8.astype(float)),
            encode_progressive_jpeg(px8.astype(float)),
        ],
        decode_gif: [encode_gif(gif_px), encode_gif(gif_px, interlace=True)],
        decode_bmp: [bmp],
    }


def _make_bmp(px):
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    for y in range(h - 1, -1, -1):
        row = px[y][:, [2, 1, 0]].tobytes()
        rows += row + b"\x00" * (stride - len(row))
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
    hdr += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 0, 0, 0, 0)
    return bytes(hdr + rows)


def _assert_clean(decoder, blob):
    try:
        out = decoder(blob)
        assert isinstance(out, tuple) and len(out) == 4
    except OK_ERRORS:
        pass  # the contract: these two types only


def test_truncations_raise_cleanly():
    for decoder, blobs in _valid_corpus().items():
        for blob in blobs:
            step = max(1, len(blob) // 40)
            for cut in range(0, len(blob), step):
                _assert_clean(decoder, blob[:cut])


def test_byte_corruptions_raise_cleanly_or_decode():
    rng = random.Random(23)
    for decoder, blobs in _valid_corpus().items():
        for blob in blobs:
            for _ in range(60):
                b = bytearray(blob)
                for _ in range(rng.randrange(1, 4)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
                _assert_clean(decoder, bytes(b))


def test_random_garbage_after_magic():
    rng = random.Random(5)
    magics = {
        decode_png: b"\x89PNG\r\n\x1a\n",
        decode_jpeg: b"\xff\xd8",
        decode_gif: b"GIF89a",
        decode_bmp: b"BM",
    }
    for decoder, magic in magics.items():
        for _ in range(40):
            junk = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 300)))
            _assert_clean(decoder, magic + junk)


def test_forged_huge_dimensions_raise_before_allocating():
    # PNG IHDR claiming 60000x60000 (3.6G px)
    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 100)) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="out of bounds"):
        decode_png(png)
    assert 60000 * 60000 > _MAX_PIXELS

    # JPEG SOF0 claiming 65000x65000
    sof = struct.pack(">BHHB", 8, 65000, 65000, 1) + bytes([1, 0x11, 0])
    jpg = (
        b"\xff\xd8"
        + b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
        + b"\xff\xc4" + struct.pack(">H", 19 + 1) + bytes([0]) + bytes([0] * 15 + [1]) + b"\x00"
        + b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
        + b"\x00" * 10 + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="out of bounds"):
        decode_jpeg(jpg)

    # GIF descriptor claiming 65535x65535
    gif = (
        b"GIF89a" + (65535).to_bytes(2, "little") * 2 + bytes([0x80, 0, 0])
        + b"\x00\x00\x00" * 2  # 2-entry global table
        + b"\x2c" + b"\x00" * 4 + (65535).to_bytes(2, "little") * 2
        + bytes([0]) + bytes([2]) + b"\x01\x00\x00" + b"\x3b"
    )
    with pytest.raises(ValueError, match="out of bounds"):
        decode_gif(gif)

    # BMP claiming 100000x100000
    hdr = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
    hdr += struct.pack(
        "<IiiHHIIiiII", 40, 100000, 100000, 1, 24, 0, 0, 0, 0, 0, 0
    )
    with pytest.raises(ValueError, match="out of bounds"):
        decode_bmp(bytes(hdr))


def test_png_zlib_bomb_is_bounded():
    """An IDAT that inflates far past the header's promised payload must
    not allocate past it (decompression is capped at the expected
    size)."""
    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    # header: 4x4 gray (expected payload 4*(4+1)=20 bytes)…
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    # …but the stream inflates to 50 MB
    bomb = zlib.compress(b"\x00" * (50 * 1024 * 1024), 9)
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", bomb) + chunk(b"IEND", b"")
    )
    w, h, ch, mean = decode_png(png)  # truncated inflate: decodes the 4x4
    assert (w, h, ch, mean) == (4, 4, 1, 0.0)


def test_image_phash_survives_garbage_batch(spark):
    """The operator surface: a batch of junk rows yields per-row
    statuses, never a dead batch."""
    from reflexiv_spark.datapipe.multimodal import image_phash

    rng = random.Random(11)
    rows = []
    for i in range(20):
        junk = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 200)))
        magic = [b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b"GIF89a", b"BM", b""][i % 5]
        rows.append((i, bytearray(magic + junk)))
    rng2 = np.random.RandomState(3)
    good = encode_jpeg(rng2.randint(0, 256, (8, 8)).astype(float))
    rows.append((99, bytearray(good)))
    df = spark.createDataFrame(rows, "id long, blob binary")
    out = {r.id: r for r in image_phash(df).collect()}
    assert len(out) == 21
    assert out[99].status == "ok" and out[99].phash is not None
    assert all(
        (r.status == "ok") == (r.phash is not None) for r in out.values()
    )


def test_decode_images_on_error_status(spark):
    """on_error='status' degrades per row with a reason; the default
    keeps the fail-fast contract for curated inputs."""
    from reflexiv_spark.datapipe.multimodal import decode_images

    rng = np.random.RandomState(1)
    good = encode_jpeg(rng.randint(0, 256, (8, 8)).astype(float))
    rows = [
        (1, bytearray(good)),
        (2, bytearray(b"\xff\xd8garbage")),
        (3, bytearray(b"not-an-image")),
        (4, bytearray(b"")),
    ]
    df = spark.createDataFrame(rows, "id long, blob binary")
    out = {r.id: r for r in decode_images(df, on_error="status").collect()}
    assert out[1].status == "ok" and out[1].width == 8
    assert out[2].status != "ok" and out[2].width is None
    assert out[3].status != "ok" and out[4].status != "ok"
    # default mode still raises on the bad rows
    with pytest.raises(Exception):
        decode_images(df).collect()
    # fake mode composes with the status schema
    fk = decode_images(df, fake=True, on_error="status").collect()
    assert all(r.status == "ok" for r in fk) and len(fk) == 4
