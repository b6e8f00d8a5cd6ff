"""Real (non-stub) multimodal decode paths: PNG via stdlib zlib+numpy,
baseline JPEG via numpy Huffman+IDCT (crafted by tests/jpeg_encoder.py),
canonical PCM16 WAV frame RMS via Catalyst header parsing + numpy."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from reflexiv_spark.datapipe.multimodal import (
    decode_images,
    decode_jpeg,
    decode_png,
    sample_audio_frames,
    sample_video_frames,
)
from tests.jpeg_encoder import encode_jpeg


def _encode_png(pixels: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Minimal PNG encoder (8-bit gray/RGB/RGBA) applying the requested
    filter type per scanline — exercises every unfilter branch."""
    h, w, ch = pixels.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    filters = filters or [0] * h
    stride = w * ch
    flat = pixels.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = filters[y]
        line = flat[y]
        left = np.concatenate([np.zeros(ch, np.int32), line[:-ch]]) if stride > ch else np.zeros(stride, np.int32)
        upleft = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]]) if stride > ch else np.zeros(stride, np.int32)
        if f == 0:
            enc = line
        elif f == 1:
            enc = (line - left) & 0xFF
        elif f == 2:
            enc = (line - prev) & 0xFF
        elif f == 3:
            enc = (line - (left + prev) // 2) & 0xFF
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = (line - pred) & 0xFF
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _encode_png_variant(img, depth=8, ctype=2, palette=None, interlace=0):
    """PNG writer for the exotic IHDR combos (palette, sub-byte, 16-bit,
    Adam7), filter 0 per scanline. ``img`` holds palette indices /
    gray values (2-D) or samples (3-D); uint16 values for depth 16."""
    img = np.asarray(img)
    h, w = img.shape[:2]

    def pack(sub):
        out = bytearray()
        for y in range(sub.shape[0]):
            row = sub[y].reshape(-1)
            out.append(0)
            if depth == 8:
                out += bytes(row.astype(np.uint8))
            elif depth == 16:
                out += row.astype(">u2").tobytes()
            else:
                bits = (
                    (row[:, None].astype(int) >> np.arange(depth - 1, -1, -1)) & 1
                ).astype(np.uint8).ravel()
                out += np.packbits(bits).tobytes()
        return out

    raw = bytearray()
    if interlace:
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                raw += pack(sub)
    else:
        raw += pack(img)

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    out = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    )
    if palette is not None:
        out += chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
    return out + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


def test_decode_png_palette_8bit_and_4bit():
    from reflexiv_spark.datapipe.multimodal import _png_pixels

    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, (200, 3)).astype(np.uint8)
    idx = rng.randint(0, 200, (9, 14))
    w, h, ch, px = _png_pixels(_encode_png_variant(idx, ctype=3, palette=pal))
    assert (w, h, ch) == (14, 9, 3)
    assert np.array_equal(px, pal[idx])
    pal4 = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    idx4 = rng.randint(0, 16, (7, 11))
    w, h, ch, px = _png_pixels(
        _encode_png_variant(idx4, depth=4, ctype=3, palette=pal4)
    )
    assert (w, h, ch) == (11, 7, 3)
    assert np.array_equal(px, pal4[idx4])


def test_decode_png_16bit_high_byte():
    from reflexiv_spark.datapipe.multimodal import _png_pixels

    rng = np.random.RandomState(5)
    gray = rng.randint(0, 65536, (6, 9)).astype(np.uint16)
    w, h, ch, px = _png_pixels(_encode_png_variant(gray, depth=16, ctype=0))
    assert (w, h, ch) == (9, 6, 1)
    assert np.array_equal(px[..., 0], (gray >> 8).astype(np.uint8))
    rgb = rng.randint(0, 65536, (5, 7, 3)).astype(np.uint16)
    w, h, ch, px = _png_pixels(_encode_png_variant(rgb, depth=16, ctype=2))
    assert (w, h, ch) == (7, 5, 3)
    assert np.array_equal(px, (rgb >> 8).astype(np.uint8))


def test_decode_png_sub_byte_gray_scales():
    from reflexiv_spark.datapipe.multimodal import _png_pixels

    bil = np.array([[0, 1, 1, 0, 1], [1, 0, 0, 1, 0], [1, 1, 0, 0, 1]])
    w, h, ch, px = _png_pixels(_encode_png_variant(bil, depth=1, ctype=0))
    assert (w, h, ch) == (5, 3, 1)
    assert np.array_equal(px[..., 0], (bil * 255).astype(np.uint8))
    g2 = np.array([[0, 1, 2, 3], [3, 2, 1, 0]])
    w, h, ch, px = _png_pixels(_encode_png_variant(g2, depth=2, ctype=0))
    assert np.array_equal(px[..., 0], np.round(g2 * 255 / 3).astype(np.uint8))


def test_decode_png_adam7_interlaced():
    from reflexiv_spark.datapipe.multimodal import _png_pixels

    rng = np.random.RandomState(9)
    rgb = rng.randint(0, 256, (13, 11, 3)).astype(np.uint8)
    w, h, ch, px = _png_pixels(_encode_png_variant(rgb, ctype=2, interlace=1))
    assert (w, h, ch) == (11, 13, 3)
    assert np.array_equal(px, rgb)
    # interlaced palette at depth 4: both exotic paths at once
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, (10, 9))
    w, h, ch, px = _png_pixels(
        _encode_png_variant(idx, depth=4, ctype=3, palette=pal, interlace=1)
    )
    assert (w, h, ch) == (9, 10, 3)
    assert np.array_equal(px, pal[idx])


def _wav_pcm16(samples: np.ndarray, rate: int = 8000) -> bytes:
    data = samples.astype("<i2").tobytes()
    return (
        struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
            1, 1, rate, rate * 2, 2, 16, b"data", len(data),
        )
        + data
    )


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_decode_png_roundtrip_all_filters(ch):
    rng = np.random.RandomState(7 + ch)
    pixels = rng.randint(0, 256, size=(5, 6, ch), dtype=np.uint8)
    blob = _encode_png(pixels, filters=[0, 1, 2, 3, 4])
    w, h, channels, mean = decode_png(blob)
    assert (w, h, channels) == (6, 5, ch)
    assert mean == pytest.approx(float(pixels.mean()), abs=1e-9)


def test_decode_images_real_png_in_spark(spark):
    rng = np.random.RandomState(11)
    imgs = {
        1: rng.randint(0, 256, size=(4, 3, 3), dtype=np.uint8),
        2: rng.randint(0, 256, size=(2, 8, 1), dtype=np.uint8),
    }
    df = spark.createDataFrame(
        [(i, bytearray(_encode_png(p, filters=[4] * p.shape[0]))) for i, p in imgs.items()],
        "id long, blob binary",
    )
    out = {r.id: r for r in decode_images(df, fake=False).collect()}
    assert (out[1].width, out[1].height, out[1].channels) == (3, 4, 3)
    assert out[1].mean_value == pytest.approx(float(imgs[1].mean()))
    assert (out[2].width, out[2].height, out[2].channels) == (8, 2, 1)
    assert out[2].mean_value == pytest.approx(float(imgs[2].mean()))


def test_decode_jpeg_roundtrip_gray_multi_mcu():
    rng = np.random.RandomState(21)
    px = rng.randint(0, 256, size=(16, 24)).astype(float)
    w, h, ch, mean = decode_jpeg(encode_jpeg(px))
    assert (w, h, ch) == (24, 16, 1)
    # all-ones quant tables: only DCT-coefficient rounding error survives
    assert mean == pytest.approx(float(px.mean()), abs=0.25)


def test_decode_jpeg_roundtrip_rgb444():
    rng = np.random.RandomState(22)
    px = rng.randint(0, 256, size=(8, 16, 3)).astype(float)
    w, h, ch, mean = decode_jpeg(encode_jpeg(px))
    assert (w, h, ch) == (16, 8, 3)
    assert mean == pytest.approx(float(px.mean()), abs=0.5)


def test_decode_jpeg_subsampled_420_solid_exact():
    px = np.full((16, 16, 3), [200.0, 30.0, 90.0])
    w, h, ch, mean = decode_jpeg(encode_jpeg(px, subsample=True))
    assert (w, h, ch) == (16, 16, 3)
    # solid color survives 2x2 chroma downsample+upsample exactly
    assert mean == pytest.approx(float(px.mean()), abs=1e-9)


def test_decode_jpeg_restart_interval():
    rng = np.random.RandomState(23)
    px = rng.randint(0, 256, size=(16, 16)).astype(float)
    blob = encode_jpeg(px, restart_interval=1)
    assert b"\xff\xd0" in blob or b"\xff\xd1" in blob  # RSTn present
    w, h, ch, mean = decode_jpeg(blob)
    assert (w, h, ch) == (16, 16, 1)
    assert mean == pytest.approx(float(px.mean()), abs=0.25)


def _pixels(blob):
    from reflexiv_spark.datapipe.multimodal import _jpeg_pixels

    return _jpeg_pixels(blob)[3]


def test_decode_jpeg_progressive_full_script_matches_baseline():
    """Default progressive script (DC SA + refinement, AC bands at two
    approximation levels incl. history correction bits) reconstructs the
    exact coefficients — pixels identical to the baseline encode."""
    from tests.jpeg_encoder import encode_progressive_jpeg

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(24, 17)).astype(float)
    blob = encode_progressive_jpeg(px)
    assert blob[3] == 0xC2 or b"\xff\xc2" in blob  # really SOF2
    w, h, ch, mean = decode_jpeg(blob)
    assert (w, h, ch) == (17, 24, 1)
    assert np.array_equal(_pixels(blob), _pixels(encode_jpeg(px)))


def test_decode_jpeg_progressive_rgb_420_odd_size():
    """Subsampled odd-size image: the non-interleaved AC scans cover the
    component's own block grid, smaller than the MCU-padded grid."""
    from tests.jpeg_encoder import encode_progressive_jpeg

    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(26, 21, 3)).astype(float)
    prog = encode_progressive_jpeg(px, subsample=True)
    base = encode_jpeg(px, subsample=True)
    assert np.array_equal(_pixels(prog), _pixels(base))


def test_decode_jpeg_progressive_restart_and_spectral_only():
    from tests.jpeg_encoder import encode_progressive_jpeg

    rng = np.random.RandomState(13)
    px = rng.randint(0, 256, size=(40, 40)).astype(float)
    want = _pixels(encode_jpeg(px))
    rst = encode_progressive_jpeg(px, restart_interval=3)
    assert b"\xff\xd0" in rst or b"\xff\xd1" in rst
    assert np.array_equal(_pixels(rst), want)
    # spectral selection without successive approximation
    sc = [([0], 0, 0, 0, 0), ([0], 1, 9, 0, 0), ([0], 10, 63, 0, 0)]
    assert np.array_equal(_pixels(encode_progressive_jpeg(px, scans=sc)), want)


def test_decode_jpeg_progressive_smooth_eob_runs():
    """Smooth gradient → most AC bands zero → long cross-block EOB runs
    (EOBn codes with extension bits) on both encode and decode."""
    from tests.jpeg_encoder import encode_progressive_jpeg

    gx = np.tile(np.linspace(0.0, 255.0, 64), (64, 1))
    assert np.array_equal(
        _pixels(encode_progressive_jpeg(gx)), _pixels(encode_jpeg(gx))
    )


def test_decode_images_real_mixed_png_jpeg(spark):
    rng = np.random.RandomState(24)
    png_px = rng.randint(0, 256, size=(4, 6, 3), dtype=np.uint8)
    jpg_px = rng.randint(0, 256, size=(8, 8)).astype(float)
    df = spark.createDataFrame(
        [
            (1, bytearray(_encode_png(png_px))),
            (2, bytearray(encode_jpeg(jpg_px))),
        ],
        "id long, blob binary",
    )
    out = {r.id: r for r in decode_images(df, fake=False).collect()}
    assert (out[1].width, out[1].height, out[1].channels) == (6, 4, 3)
    assert out[1].mean_value == pytest.approx(float(png_px.mean()))
    assert (out[2].width, out[2].height, out[2].channels) == (8, 8, 1)
    assert out[2].mean_value == pytest.approx(float(jpg_px.mean()), abs=0.25)


def test_decode_images_real_rejects_unknown_format(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"RIFFxxxxWEBP" + b"w" * 40))], "id long, blob binary"
    )
    with pytest.raises(Exception, match="PNG|JPEG|PIL"):
        decode_images(df, fake=False).collect()


def test_resize_images_real_box_means(spark):
    from reflexiv_spark.datapipe.multimodal import resize_images

    # 8x8 gray PNG with known 4x4-block means → 2x2 resize must equal them
    rng = np.random.RandomState(41)
    px = rng.randint(0, 256, size=(8, 8, 1), dtype=np.uint8)
    want = px.astype(float).reshape(2, 4, 2, 4).mean(axis=(1, 3))
    jpg = encode_jpeg(np.full((8, 16), 99.0))  # JPEG input rides the same path
    df = spark.createDataFrame(
        [(1, bytearray(_encode_png(px))), (2, bytearray(jpg))],
        "id long, blob binary",
    )
    out = {r.id: r for r in resize_images(df, 2, 2, fake=False).collect()}
    got_w, got_h, got_ch, _ = decode_png(bytes(out[1].blob))
    assert (got_w, got_h, got_ch) == (2, 2, 1)
    from reflexiv_spark.datapipe.multimodal import _png_pixels

    _, _, _, rpx = _png_pixels(bytes(out[1].blob))
    assert np.abs(rpx[..., 0].astype(float) - want).max() <= 0.5
    _, _, _, jr = _png_pixels(bytes(out[2].blob))
    assert jr.shape == (2, 2, 1)
    assert np.abs(jr.astype(float) - 99.0).max() <= 1.0


def test_extract_features_real_pooled_intensity(spark):
    from reflexiv_spark.datapipe.multimodal import extract_features

    grad = np.tile(np.linspace(0, 255, 16)[None, :, None], (16, 1, 1)).astype(
        np.uint8
    )
    flipped = grad[:, ::-1]
    df = spark.createDataFrame(
        [
            (1, bytearray(_encode_png(grad))),
            (2, bytearray(_encode_png(np.ascontiguousarray(flipped)))),
            (3, bytearray(_encode_png(grad))),
        ],
        "id long, blob binary",
    )
    feats = {r.id: np.array(r.embedding) for r in extract_features(df, fake=False).collect()}
    assert all(len(v) == 64 for v in feats.values())
    assert all(abs(np.linalg.norm(v) - 1.0) < 1e-9 for v in feats.values())
    assert np.allclose(feats[1], feats[3])  # deterministic
    # mirrored gradient → anti-correlated pooled features
    assert float(feats[1] @ feats[2]) < -0.9


def _encode_avi(frames: list[bytes], with_index: bool = True) -> bytes:
    """Minimal RIFF/AVI writer: LIST movi of 00dc chunks (+ optional
    idx1 with movi-relative offsets, all frames flagged keyframes)."""
    movi = b"movi"
    offsets = []
    for fr in frames:
        offsets.append(len(movi))
        movi += b"00dc" + struct.pack("<I", len(fr)) + fr + (b"\x00" if len(fr) % 2 else b"")
    body = b"LIST" + struct.pack("<I", len(movi)) + movi
    if with_index:
        idx = b""
        for off, fr in zip(offsets, frames):
            idx += struct.pack("<4sIII", b"00dc", 0x10, off, len(fr))
        body += b"idx1" + struct.pack("<I", len(idx)) + idx
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


@pytest.mark.parametrize("with_index", [True, False])
def test_sample_video_frames_real_mjpeg_avi(spark, with_index):
    """An MJPEG AVI's sampled keyframes are real baseline JPEGs that
    chain straight into decode_jpeg."""
    rng = np.random.RandomState(31)
    means = [40.0, 120.0, 200.0, 80.0, 160.0]
    frames = [
        encode_jpeg(np.full((8, 8), m)) for m in means
    ]
    avi = _encode_avi(frames, with_index=with_index)
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"\x00mp4" + b"x" * 50))],
        "id long, blob binary",
    )
    rows = sample_video_frames(df, every_nth=2, fake=False).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, []).append(r)
    got = sorted(by_id[1], key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in got] == [0, 2, 4]  # every 2nd keyframe
    for r, want in zip(got, [means[0], means[2], means[4]]):
        assert r.status == "ok" and r.digest
        w, h, ch, mean = decode_jpeg(bytes(r.frame))
        assert (w, h, ch) == (8, 8, 1)
        assert mean == pytest.approx(want, abs=0.5)
    assert [(r.status, r.frame) for r in by_id[2]] == [
        ("not_an_AVI_stream", None)
    ]


def test_sample_audio_frames_real_pcm16(spark):
    t = np.arange(48)
    samples = (10000 * np.sin(2 * np.pi * t / 16)).astype(np.int16)
    df = spark.createDataFrame(
        [(1, bytearray(_wav_pcm16(samples)))], "id long, blob binary"
    )
    # 48 samples × 2 bytes = 96 data bytes → frames of 32 bytes = 16 samples
    out = sorted(
        sample_audio_frames(df, frame_bytes=32, fake=False).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.n_samples for r in out] == [16, 16, 16]
    for i, r in enumerate(out):
        seg = samples[i * 16 : (i + 1) * 16].astype(np.float64) / 32768.0
        assert r.rms == pytest.approx(float(np.sqrt(np.mean(seg * seg))), abs=1e-6)


def test_sample_audio_frames_real_reports_per_row_status(spark):
    """Undecodable rows yield a per-row status instead of killing the
    batch, and decodable rows in the same batch still decode."""
    samples = np.arange(16, dtype=np.int16)
    good = _wav_pcm16(samples)
    # PCM WAV with an extra LIST chunk before fmt — decodable in
    # principle, non-canonical header here
    listed = (
        struct.pack("<4sI4s", b"RIFF", 94, b"WAVE")
        + struct.pack("<4sI", b"LIST", 4) + b"INFO"
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, 1, 8000, 16000, 2, 16
        )
        + struct.pack("<4sI", b"data", 32)
        + samples.astype("<i2").tobytes()
    )
    # mu-law WAV (format tag 7): genuinely not PCM16
    mulaw = (
        struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 36 + 8, b"WAVE", b"fmt ", 16,
            7, 1, 8000, 8000, 1, 8, b"data", 8,
        )
        + b"\x00" * 8
    )
    df = spark.createDataFrame(
        [
            (1, bytearray(good)),
            (2, bytearray(b"OggS" + b"\x00" * 100)),
            (3, bytearray(listed)),
            (4, bytearray(mulaw)),
        ],
        "id long, blob binary",
    )
    rows = sample_audio_frames(df, frame_bytes=64, fake=False).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, []).append(r)
    assert all(r.status == "ok" for r in by_id[1])
    assert by_id[1][0].n_samples == 16
    assert [ (r.status, r.n_samples, r.rms) for r in by_id[2] ] == [
        ("not_wav", None, None)
    ]
    assert [r.status for r in by_id[3]] == ["pcm_noncanonical_header"]
    assert [r.status for r in by_id[4]] == ["compressed_format_7"]


def test_sample_audio_frames_real_truncated_last_frame(spark):
    samples = np.arange(-20, 20, dtype=np.int16)  # 40 samples, 80 bytes
    df = spark.createDataFrame(
        [(1, bytearray(_wav_pcm16(samples)))], "id long, blob binary"
    )
    out = sorted(
        sample_audio_frames(df, frame_bytes=64, fake=False).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.n_samples for r in out] == [32, 8]


def test_image_phash_and_near_dups(spark):
    """pHash: invariant to uniform brightness, stable under mild noise,
    far for unrelated images; the chunked pair join finds exactly the
    planted near-dup cluster."""
    from reflexiv_spark.datapipe.multimodal import (
        image_near_dups,
        image_phash,
        phash64_of_pixels,
    )

    rng = np.random.RandomState(23)
    # structured base image (gradient + blob) so the DCT spectrum is rich
    yy, xx = np.mgrid[0:64, 0:64]
    base = (yy * 2 + xx + ((yy - 20) ** 2 + (xx - 40) ** 2 < 150) * 80) % 256
    base = np.repeat(base[..., None], 3, axis=2).astype(np.uint8)
    brighter = np.clip(base.astype(int) + 25, 0, 255).astype(np.uint8)
    noisy = np.clip(
        base.astype(int) + rng.randint(-6, 7, base.shape), 0, 255
    ).astype(np.uint8)
    other = rng.randint(0, 256, size=(64, 64, 3), dtype=np.uint8)

    # driver-side sanity on the kernel itself
    h_base = phash64_of_pixels(base)
    assert phash64_of_pixels(brighter) == h_base  # DC excluded
    assert bin(h_base ^ phash64_of_pixels(noisy)).count("1") <= 6
    assert bin(h_base ^ phash64_of_pixels(other)).count("1") > 12

    df = spark.createDataFrame(
        [
            (1, bytearray(_encode_png(base))),
            (2, bytearray(_encode_png(brighter))),
            (3, bytearray(_encode_png(noisy))),
            (4, bytearray(_encode_png(other))),
            (5, bytearray(b"not an image")),
        ],
        "id long, blob binary",
    )
    hashed = {r.id: r for r in image_phash(df).collect()}
    assert hashed[1].phash == h_base and hashed[1].status == "ok"
    assert hashed[5].phash is None and "undecodable" in hashed[5].status

    pairs = {
        (r.id1, r.id2): r.hamming
        for r in image_near_dups(df, max_hamming=8).collect()
    }
    assert set(pairs) == {(1, 2), (1, 3), (2, 3)}
    assert pairs[(1, 2)] == 0


def test_gif_decode_interlaced_exact():
    """4-pass interlaced frame de-interlaces to the original rows."""
    import random

    from tests.gif_encoder import encode_gif

    from reflexiv_spark.datapipe.multimodal import _gif_pixels

    rng = random.Random(17)
    px = [
        [(rng.randrange(0, 256, 16), rng.randrange(0, 256, 64), 0) for _ in range(7)]
        for _ in range(13)  # odd height: uneven pass sizes
    ]
    blob = encode_gif(px, interlace=True)
    assert blob[13 + 3 * (2 << (blob[10] & 7)) + 9] & 0x40  # flag really set
    w, h, ch, got = _gif_pixels(blob)
    assert (w, h, ch) == (7, 13, 3)
    want = np.array(px, dtype=np.uint8)
    assert np.array_equal(got, want)
    # non-interlaced twin decodes identically
    _, _, _, plain = _gif_pixels(encode_gif(px))
    assert np.array_equal(got, plain)


def test_gif_decode_real(spark):
    from tests.gif_encoder import encode_gif

    from reflexiv_spark.datapipe.multimodal import decode_gif, decode_images

    # 4x3 image with a red/green checker and one blue pixel
    px = [
        [(255, 0, 0), (0, 255, 0), (255, 0, 0), (0, 255, 0)],
        [(0, 255, 0), (255, 0, 0), (0, 255, 0), (255, 0, 0)],
        [(0, 0, 255), (255, 0, 0), (0, 255, 0), (255, 0, 0)],
    ]
    blob = encode_gif(px)
    w, h, ch, mean = decode_gif(blob)
    assert (w, h, ch) == (4, 3, 3)
    flat = [c for row in px for rgb in row for c in rgb]
    assert abs(mean - sum(flat) / len(flat)) < 1e-3

    # larger randomized image forces LZW code-width growth
    import random

    rng = random.Random(3)
    big = [
        [(rng.randrange(256), rng.randrange(2), 0) for _ in range(40)]
        for _ in range(30)
    ]
    # cap distinct colors at <=256 by construction? (256*2 combos) — quantize r
    big = [[(r // 2 * 2, g, 0) for r, g, _ in row] for row in big]
    blob2 = encode_gif(big)
    w2, h2, ch2, mean2 = decode_gif(blob2)
    flat2 = [c for row in big for rgb in row for c in rgb]
    assert (w2, h2, ch2) == (40, 30, 3)
    assert abs(mean2 - sum(flat2) / len(flat2)) < 1e-3

    # through the Arrow-batched operator
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(blob2))], "id long, blob binary"
    )
    rows = {r.id: r for r in decode_images(df, fake=False).collect()}
    assert (rows[1].width, rows[1].height) == (4, 3)
    assert abs(rows[2].mean_value - sum(flat2) / len(flat2)) < 1e-3


def test_bmp_decode_real(spark):
    import struct

    from reflexiv_spark.datapipe.multimodal import blob_meta, decode_bmp

    # hand-build a 3x2 24-bit bottom-up BMP: rows padded to 4 bytes
    w, h = 3, 2
    stride = (w * 3 + 3) & ~3
    # pixel rows in FILE order (bottom-up): file row 0 = image bottom row
    bottom = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]   # image row 1
    top = [(10, 20, 30), (40, 50, 60), (70, 80, 90)]   # image row 0
    body = bytearray()
    for row in (bottom, top):
        for r, g, b in row:
            body += bytes([b, g, r])  # BGR on disk
        body += b"\x00" * (stride - w * 3)
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    blob = hdr + dib + bytes(body)

    bw, bh, ch, mean = decode_bmp(blob)
    assert (bw, bh, ch) == (3, 2, 3)
    flat = [c for row in (top, bottom) for rgb in row for c in rgb]
    assert abs(mean - sum(flat) / len(flat)) < 1e-3

    df = spark.createDataFrame([(1, bytearray(blob))], "id long, blob binary")
    assert blob_meta(df).collect()[0].format == "bmp"


def _encode_rgb_avi(
    frames_px: list[np.ndarray], with_index: bool = True
) -> bytes:
    """Uncompressed BI_RGB AVI writer: LIST hdrl (strh 'vids' + strf
    BITMAPINFOHEADER) + LIST movi of raw 00db DIB frames (bottom-up BGR,
    4-byte row stride)."""
    h, w, _ = frames_px[0].shape
    stride = (w * 3 + 3) & ~3
    dibs = []
    for px in frames_px:
        rows = []
        for y in range(h - 1, -1, -1):
            row = px[y][:, ::-1].astype(np.uint8).tobytes()
            rows.append(row + b"\x00" * (stride - len(row)))
        dibs.append(b"".join(rows))
    strh = b"strh" + struct.pack("<I", 56) + b"vids" + b"DIB " + b"\x00" * 48
    strf_data = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0
    )
    strf = b"strf" + struct.pack("<I", len(strf_data)) + strf_data
    strl = (
        b"LIST"
        + struct.pack("<I", 4 + len(strh) + len(strf))
        + b"strl"
        + strh
        + strf
    )
    hdrl = b"LIST" + struct.pack("<I", 4 + len(strl)) + b"hdrl" + strl
    movi = b"movi"
    offsets = []
    for d in dibs:
        offsets.append(len(movi))
        movi += b"00db" + struct.pack("<I", len(d)) + d
        if len(d) % 2:
            movi += b"\x00"
    body = hdrl + b"LIST" + struct.pack("<I", len(movi)) + movi
    if with_index:
        idx = b""
        for off, d in zip(offsets, dibs):
            idx += struct.pack("<4sIII", b"00db", 0x10, off, len(d))
        body += b"idx1" + struct.pack("<I", len(idx)) + idx
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


@pytest.mark.parametrize("with_index", [True, False])
def test_sample_video_frames_uncompressed_rgb_avi(spark, with_index):
    """Raw BI_RGB DIB frames come out wrapped as standalone BMPs whose
    decoded pixels equal the planted frames exactly."""
    from reflexiv_spark.datapipe.multimodal import _bmp_pixels, decode_bmp

    rng = np.random.RandomState(7)
    px0 = rng.randint(0, 256, size=(5, 3, 3), dtype=np.uint8)
    px1 = np.full((5, 3, 3), 200, dtype=np.uint8)
    avi = _encode_rgb_avi([px0, px1], with_index=with_index)
    df = spark.createDataFrame([(1, bytearray(avi))], "id long, blob binary")
    out = sorted(
        sample_video_frames(df, every_nth=1, fake=False).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in out] == [0, 1]
    assert all(r.status == "ok" for r in out)
    for r, px in zip(out, [px0, px1]):
        w, h, ch, mean = decode_bmp(bytes(r.frame))
        assert (w, h, ch) == (3, 5, 3)
        assert mean == round(float(px.mean()), 4)
        _, _, _, arr = _bmp_pixels(bytes(r.frame))
        assert np.array_equal(arr, px)


def test_mjpeg_avi_unaffected_by_format_header_absence(spark):
    """The minimal movi-only MJPEG AVI (no hdrl) still passes frames
    through untouched — JPEG bytes, not BMP-wrapped."""
    frames = [encode_jpeg(np.full((8, 8), g, dtype=np.uint8)) for g in (10, 240)]
    avi = _encode_avi(frames, with_index=True)
    df = spark.createDataFrame([(1, bytearray(avi))], "id long, blob binary")
    out = sorted(
        sample_video_frames(df, every_nth=1, fake=False).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [bytes(r.frame)[:2] for r in out] == [b"\xff\xd8", b"\xff\xd8"]


def test_decode_jpeg_tolerates_fill_bytes():
    """T.81 permits any number of 0xFF fill bytes before a marker; the
    walk previously fell through to the segment-length branch on the
    fill byte and skipped a bogus distance (regression)."""
    rng = np.random.RandomState(33)
    px = rng.randint(0, 256, size=(8, 8)).astype(float)
    blob = encode_jpeg(px)
    sof = blob.index(b"\xff\xc0")
    padded = blob[:sof] + b"\xff\xff" + blob[sof:]  # two fills before SOF0
    w, h, ch, mean = decode_jpeg(padded)
    assert (w, h, ch) == (8, 8, 1)
    assert mean == pytest.approx(float(px.mean()), abs=0.25)
