"""Executable proof of the inter-frame-video external-binary escape
hatch (``pipe_ffmpeg_frames`` — the README-named extension path for the
codecs the native RIFF walk retires; same subprocess pattern as
``pipe_minimap2``, reference ``DSJavaPipeMinimap2``,
``ReflexivDSDynamicKmerMapping.java:1157-1267``).

Three layers:

1. The BMP image2pipe stream splitter is a pure function — tested
   directly on well-formed, concatenated, truncated, and garbage input.
2. The subprocess pipe machinery (blob → child stdin → BMP stream on
   stdout → rows) runs unconditionally against a fake ``ffmpeg`` shell
   shim emitting two deterministic BMPs — proving the executor-side
   plumbing executes, not just that it is gated.
3. Real-binary parity: when actual ffmpeg is on PATH, its sampled
   frames of an MJPEG AVI must agree with the native
   :func:`sample_video_frames` walk on frame count, dimensions, and
   pixel means. Skips cleanly otherwise.
"""

from __future__ import annotations

import os
import shutil
import stat
import struct

import pytest

from reflexiv_spark.datapipe.multimodal import (
    _split_bmp_stream,
    decode_bmp,
    decode_jpeg,
    pipe_ffmpeg_frames,
    sample_video_frames,
)


def _tiny_bmp(shade: int) -> bytes:
    """2×2 BI_RGB 24-bit BMP filled with one shade."""
    row = bytes([shade] * 6) + b"\x00\x00"  # 2 px BGR + stride pad to 8
    data = row * 2
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(data), 0, 0, 0, 0)
    return hdr + info + data


def test_split_bmp_stream_pure():
    a, b = _tiny_bmp(10), _tiny_bmp(200)
    assert _split_bmp_stream(a + b) == [a, b]
    assert _split_bmp_stream(a) == [a]
    assert _split_bmp_stream(b"") == []
    assert _split_bmp_stream(b"garbage") == []
    # truncated second frame → first survives, scan stops cleanly
    assert _split_bmp_stream(a + b[:20]) == [a]
    # size field lying past the buffer → rejected
    bad = b"BM" + struct.pack("<I", 10_000) + b"\x00" * 20
    assert _split_bmp_stream(bad) == []


def _write_fake_ffmpeg(tmpdir, stream: bytes, exit_code: int = 0) -> str:
    """Shim that drains stdin and emits ``stream`` on stdout. The bytes
    are baked into the script (base64) — executor-side Python workers do
    not inherit driver-side env mutations, so an env-var channel would
    be empty where the subprocess actually runs. ``exit_code`` simulates
    a truncated/partially corrupt container (frames emitted, then a
    nonzero exit)."""
    import base64

    p = os.path.join(str(tmpdir), "ffmpeg")
    with open(p, "w") as f:
        f.write(
            "#!/bin/sh\n"
            "# Fake ffmpeg: drains stdin, emits deterministic BMPs.\n"
            "cat > /dev/null\n"
            f"printf '%s' '{base64.b64encode(stream).decode()}' | base64 -d\n"
            f"exit {exit_code}\n"
        )
    os.chmod(p, os.stat(p).st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
    return p


def test_pipe_machinery_with_fake_binary(spark, tmp_path):
    stream = _tiny_bmp(10) + _tiny_bmp(200)
    shim = _write_fake_ffmpeg(tmp_path, stream)
    df = spark.createDataFrame(
        [(1, bytearray(b"fake-container-bytes")), (2, bytearray(b"x"))],
        "id long, blob binary",
    )
    rows = pipe_ffmpeg_frames(df, every_nth=3, ffmpeg_bin=shim).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, []).append(r)
    for i in (1, 2):
        got = sorted(by_id[i], key=lambda r: r.frame_idx)
        # two frames, original frame numbers recovered as j*nth
        assert [r.frame_idx for r in got] == [0, 3]
        assert all(r.status == "ok" and r.digest for r in got)
        w, h, ch, mean = decode_bmp(bytes(got[0].frame))
        assert (w, h) == (2, 2) and mean == pytest.approx(10.0)


def test_pipe_partial_decode_is_tagged(spark, tmp_path):
    """Nonzero ffmpeg exit WITH emitted frames = truncated container:
    the frames are kept but tagged 'partial_ffmpeg_exit_N' so callers
    can tell a complete decode from a partial one (ADVICE r8 — the old
    code returned them as 'ok' and swallowed the error)."""
    stream = _tiny_bmp(10) + _tiny_bmp(200)
    shim = _write_fake_ffmpeg(tmp_path, stream, exit_code=69)
    df = spark.createDataFrame(
        [(1, bytearray(b"truncated-container"))], "id long, blob binary"
    )
    rows = sorted(
        pipe_ffmpeg_frames(df, every_nth=2, ffmpeg_bin=shim).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in rows] == [0, 2]
    assert all(r.status == "partial_ffmpeg_exit_69" for r in rows)
    assert all(r.frame is not None and r.digest for r in rows)
    # nonzero exit with NO frames keeps the hard-failure tag
    # (separate dir: the shim filename is fixed to 'ffmpeg')
    d2 = tmp_path / "hard"
    d2.mkdir()
    shim2 = _write_fake_ffmpeg(d2, b"", exit_code=1)
    (row,) = pipe_ffmpeg_frames(df, ffmpeg_bin=shim2).collect()
    assert row.status == "ffmpeg_exit_1" and row.frame is None


def test_pipe_ffmpeg_absent_binary_raises(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))], "id long, blob binary")
    with pytest.raises(RuntimeError, match="not found on PATH"):
        pipe_ffmpeg_frames(df, ffmpeg_bin="definitely-not-a-real-binary")


@pytest.mark.skipif(
    shutil.which("ffmpeg") is None, reason="real ffmpeg not on PATH"
)
def test_real_ffmpeg_parity_with_native_sampler(spark, tmp_path):
    """MJPEG AVI: ffmpeg-sampled BMP frames and the native RIFF walk must
    agree on frame count, dimensions, and per-frame pixel means (JPEG
    decoder IDCTs differ at the last bit → tolerance 1.5)."""
    import numpy as np

    from tests.test_multimodal_real import _encode_avi
    from tests.jpeg_encoder import encode_jpeg

    means = [40.0, 120.0, 200.0, 80.0, 160.0, 60.0]
    frames = [encode_jpeg(np.full((8, 8), m)) for m in means]
    avi = _encode_avi(frames, with_index=True)
    df = spark.createDataFrame([(1, bytearray(avi))], "id long, blob binary")

    native = sorted(
        sample_video_frames(df, every_nth=2, fake=False).collect(),
        key=lambda r: r.frame_idx,
    )
    piped = sorted(
        pipe_ffmpeg_frames(df, every_nth=2).collect(),
        key=lambda r: r.frame_idx,
    )
    ok_piped = [r for r in piped if r.status == "ok"]
    assert len(ok_piped) == len(native) == 3
    for rn, rp in zip(native, ok_piped):
        wn, hn, _, mn = decode_jpeg(bytes(rn.frame))
        wp, hp, _, mp = decode_bmp(bytes(rp.frame))
        assert (wn, hn) == (wp, hp) == (8, 8)
        assert mp == pytest.approx(mn, abs=1.5)
