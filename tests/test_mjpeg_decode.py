"""MJPEG-in-AVI codec tests: container framing, full + selective
decode, header validation, quarantine-on-ValueError semantics."""

import numpy as np
import pytest

from kafka_delta_ingest_spark.operators.mjpeg import (
    decode_avi_frames,
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)


def _gradient(h, w, g0):
    x = np.arange(w, dtype=np.int32)[None, :]
    y = np.arange(h, dtype=np.int32)[:, None]
    return ((g0 + x + 2 * y) % 256).astype(np.uint8)


def test_roundtrip_geometry_fps_and_levels():
    frames = [np.full((16, 24), g, dtype=np.uint8) for g in (10, 80, 150, 220)]
    avi = encode_avi_mjpeg(frames, fps=12)
    dec, fps, (w, h) = decode_avi_mjpeg(avi)
    assert (len(dec), fps, w, h) == (4, 12, 24, 16)
    for f, g in zip(dec, (10, 80, 150, 220)):
        assert f.shape == (16, 24)
        assert abs(float(f.mean()) - g) <= 3.0


def test_roundtrip_gradient_content():
    # Non-constant frames: per-pixel tolerance against the planted
    # gradient, not just the mean.
    frames = [_gradient(16, 16, 7 * i) for i in range(3)]
    dec, _, _ = decode_avi_mjpeg(encode_avi_mjpeg(frames, fps=5, quality=95))
    for f, ref in zip(dec, frames):
        assert float(np.abs(f.astype(int) - ref.astype(int)).mean()) <= 4.0


def test_selective_decode_matches_full():
    frames = [np.full((8, 8), 30 * i + 5, dtype=np.uint8) for i in range(7)]
    avi = encode_avi_mjpeg(frames, fps=10)
    full, _, _ = decode_avi_mjpeg(avi)
    sampled = decode_avi_frames(avi, [0, 3, 6])
    for got, idx in zip(sampled, [0, 3, 6]):
        assert np.array_equal(got, full[idx])


def test_selective_decode_without_idx1():
    # Strip the idx1 chunk: selective decode falls back to the movi
    # scan (still skipping unselected JPEG decodes).
    frames = [np.full((8, 8), 60 * i + 10, dtype=np.uint8) for i in range(4)]
    avi = encode_avi_mjpeg(frames, fps=10)
    pos = avi.rfind(b"idx1")
    assert pos > 0
    stripped = avi[:pos]
    # patch the RIFF size down to the truncated body
    stripped = (
        stripped[:4] + (len(stripped) - 8).to_bytes(4, "little") + stripped[8:]
    )
    got = decode_avi_frames(stripped, [2])
    full, _, _ = decode_avi_mjpeg(stripped)
    assert np.array_equal(got[0], full[2])


def test_malformed_containers_raise():
    frames = [np.full((8, 8), 100, dtype=np.uint8)]
    avi = encode_avi_mjpeg(frames, fps=10)
    for bad in (b"", b"RIFF" + b"\x10\x00\x00\x00" + b"WAVE" + b"\x00" * 8,
                avi[:40]):
        with pytest.raises(ValueError):
            decode_avi_mjpeg(bad)
    # frame-count mismatch vs avih header
    tampered = bytearray(avi)
    avih_at = avi.find(b"avih") + 8
    tampered[avih_at + 16:avih_at + 20] = (9).to_bytes(4, "little")
    with pytest.raises(ValueError, match="frames"):
        decode_avi_mjpeg(bytes(tampered))
    # non-MJPG handler
    tampered = bytearray(avi)
    strh_at = avi.find(b"strh") + 8
    assert avi[strh_at:strh_at + 4] == b"vids"
    tampered[strh_at + 4:strh_at + 8] = b"H264"
    with pytest.raises(ValueError, match="handler"):
        decode_avi_mjpeg(bytes(tampered))


def test_encode_validations():
    with pytest.raises(ValueError, match="empty"):
        encode_avi_mjpeg([], fps=10)
    with pytest.raises(ValueError, match="geometry"):
        encode_avi_mjpeg(
            [np.zeros((8, 8), np.uint8), np.zeros((8, 16), np.uint8)], fps=10
        )
    with pytest.raises(ValueError, match="fps"):
        encode_avi_mjpeg([np.zeros((8, 8), np.uint8)], fps=0)
    with pytest.raises(ValueError, match="out of range"):
        decode_avi_frames(
            encode_avi_mjpeg([np.zeros((8, 8), np.uint8)], fps=10), [1]
        )


def test_word_alignment_odd_jpeg_sizes():
    # Many distinct frames make odd-length JPEG chunks likely; the
    # container must stay parseable regardless (RIFF pads to 16 bits).
    rng = np.random.default_rng(7)
    frames = [
        (rng.integers(0, 256, size=(8, 8))).astype(np.uint8) for _ in range(9)
    ]
    avi = encode_avi_mjpeg(frames, fps=3)
    dec, fps, _ = decode_avi_mjpeg(avi)
    assert len(dec) == 9 and fps == 3
