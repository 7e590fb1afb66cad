"""Baseline JPEG codec: planted-fixture pixel-space oracles.

Mirrors the PPM recorded-fixture approach (test_ppm_decode.py): the
encoder plants a JPEG with KNOWN pixel content; the decoder must
recover it within the codec's quantization tolerance. Encoder and
decoder are independent code paths (forward DCT + Huffman emit vs
Huffman parse + IDCT), so a round-trip match exercises both.
"""

import numpy as np
import pytest

from kafka_delta_ingest_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg_baseline,
    jpeg_features,
)


def _gradient_rgb(h=40, w=56):
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 255 / (w - 1)).astype(np.uint8)
    g = (y * 255 / (h - 1)).astype(np.uint8)
    b = ((x + y) * 255 / (w + h - 2)).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def test_flat_gray_roundtrip_is_near_exact():
    # A solid image is pure DC: quantization error is at most one
    # luma quant step after rounding.
    img = np.full((24, 24), 131, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_baseline(img, quality=90))
    assert out.shape == (24, 24)
    assert int(np.abs(out.astype(int) - 131).max()) <= 2


def test_flat_color_roundtrip_is_near_exact():
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 200, 80, 40
    out = decode_jpeg(encode_jpeg_baseline(img, quality=95))
    assert out.shape == (16, 16, 3)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 4


def test_gradient_rgb_roundtrip_within_quant_tolerance():
    img = _gradient_rgb()
    out = decode_jpeg(encode_jpeg_baseline(img, quality=95))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    # Smooth content at q95: small mean error, bounded max error.
    assert float(err.mean()) < 3.0, err.mean()
    assert int(err.max()) <= 25, err.max()


def test_non_multiple_of_8_dimensions():
    img = _gradient_rgb(h=21, w=13)
    out = decode_jpeg(encode_jpeg_baseline(img, quality=95))
    assert out.shape == (21, 13, 3)
    assert float(np.abs(out.astype(int) - img.astype(int)).mean()) < 6.0


def test_grayscale_gradient_roundtrip():
    y, x = np.mgrid[0:32, 0:48]
    img = ((x + y) * 255 / 78).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_baseline(img, quality=92))
    assert out.shape == img.shape
    assert float(np.abs(out.astype(int) - img.astype(int)).mean()) < 3.0


def test_malformed_inputs_raise():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    good = encode_jpeg_baseline(np.full((8, 8), 77, dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 2])  # truncated entropy data
    # progressive SOF marker is refused, not mis-decoded
    bad = bytearray(good)
    sof = bad.find(b"\xff\xc0")
    bad[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))


def test_single_component_scan_ignores_sampling_factors():
    # T.81 A.2.2: a non-interleaved (single-component) scan is one 8x8
    # data unit per MCU in raster order even when SOF declares 2x2
    # sampling. Flip the encoder's 1x1 sampling byte to 2x2 — the
    # entropy stream is unchanged, so decode must still match.
    y, x = np.mgrid[0:24, 0:24]
    img = ((x * 7 + y * 3) % 256).astype(np.uint8)
    good = encode_jpeg_baseline(img, quality=95)
    hacked = bytearray(good)
    sof = hacked.find(b"\xff\xc0")
    assert hacked[sof + 11] == 0x11  # component 1 sampling byte
    hacked[sof + 11] = 0x22
    assert np.array_equal(decode_jpeg(bytes(hacked)), decode_jpeg(good))


def test_zero_dimension_sof_is_refused():
    good = encode_jpeg_baseline(np.full((8, 8), 10, dtype=np.uint8))
    bad = bytearray(good)
    sof = bad.find(b"\xff\xc0")
    bad[sof + 5] = bad[sof + 6] = 0  # height := 0 (DNL-style)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))


def test_unknown_scan_component_is_refused():
    good = encode_jpeg_baseline(np.full((8, 8), 10, dtype=np.uint8))
    bad = bytearray(good)
    sos = bad.find(b"\xff\xda")
    bad[sos + 5] = 9  # scan references component id 9, SOF declares 1
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))


def test_decode_time_scales_linearly_not_quadratically():
    # The bit accumulators must stay word-sized: decoding a noisy
    # (incompressible) image used to go bignum-quadratic. 96x96 noise
    # decodes in well under a second when linear.
    import time

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(96, 96), dtype=np.uint8).astype(np.uint8)
    enc = encode_jpeg_baseline(img, quality=95)
    t0 = time.perf_counter()
    out = decode_jpeg(enc)
    assert out.shape == (96, 96)
    assert time.perf_counter() - t0 < 5.0


def test_jpeg_features_pixel_space_oracle():
    # Solid mid-gray: mean ≈ 128 every channel, histogram mass in the
    # bin holding 128, std ≈ 0 — pixel-space values, not byte hashes.
    img = np.full((16, 16, 3), 128, dtype=np.uint8)
    f = jpeg_features(encode_jpeg_baseline(img, quality=95))
    w, h = f[0], f[1]
    means, stds = f[2:5], f[5:8]
    luma_mean, hist = f[8], f[9:16]
    assert (w, h) == (16.0, 16.0)
    assert all(abs(m - 128.0) <= 2.0 for m in means), means
    assert all(s <= 2.0 for s in stds), stds
    assert abs(luma_mean - 128.0) <= 2.0
    assert hist[4] >= 0.99  # bin [128, 160)


def test_extract_features_with_jpeg_kernel(spark):
    # The Spark-side plumbing with the REAL jpeg kernel: plant encoded
    # images in a media table, decode via mapInPandas, quarantine the
    # undecodable row as NULL features.
    from pyspark.sql import Row

    from kafka_delta_ingest_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    imgs = {
        1: np.full((8, 8, 3), 50, dtype=np.uint8),
        2: np.full((8, 8, 3), 200, dtype=np.uint8),
    }
    rows = [
        Row(
            media_id=i,
            media=bytearray(encode_jpeg_baseline(a, quality=95)),
            meta=Row(format="image/jpeg", width=8, height=8, duration_ms=None),
        )
        for i, a in imgs.items()
    ] + [
        Row(
            media_id=3,
            media=bytearray(b"corrupt bytes"),
            meta=Row(format="image/jpeg", width=None, height=None, duration_ms=None),
        )
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r.media_id: r.features
        for r in extract_features(
            df, decode=jpeg_features, null_on_error=True
        ).collect()
    }
    assert got[3] is None  # quarantined, job not failed
    assert abs(got[1][2] - 50.0) <= 3.0  # R-channel mean, pixel space
    assert abs(got[2][2] - 200.0) <= 3.0


def test_high_quality_high_frequency_clamps_not_crashes():
    # At quality >= ~93 some Annex-K quant entries scale to 1, so a
    # checkerboard (max high-frequency energy) can quantize into
    # magnitude category 11, which the baseline AC tables don't carry.
    # The encoder must clamp to +/-1023 (category 10), as libjpeg
    # does, not raise KeyError.
    rng = np.random.default_rng(7)
    y, x = np.mgrid[0:24, 0:24]
    board = (((x + y) % 2) * 255).astype(np.uint8)
    noisy = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    for img in (board, noisy):
        for q in (93, 95, 97, 100):
            out = decode_jpeg(encode_jpeg_baseline(img, quality=q))
            assert out.shape == img.shape
    # clamping one coefficient still reconstructs the checkerboard to
    # within a coarse tolerance at quality 95
    out = decode_jpeg(encode_jpeg_baseline(board, quality=95))
    assert np.mean(np.abs(out.astype(int) - board.astype(int))) < 48


def test_restart_scan_skips_stuffed_ff_pad():
    # If the byte-alignment pad before an RSTn marker forms a 0xFF
    # byte, the stream contains a stuffed 0xFF 0x00 pair before the
    # marker; restart() must skip it rather than read the stuffed
    # 0x00 as the marker byte.
    from kafka_delta_ingest_spark.operators.jpeg import _BitReader

    data = b"\xff\x00\xff\xd0\xab"
    r = _BitReader(data, 0)
    r.restart()  # must consume the stuffed pair then RST0
    assert r.marker is None
    assert r.pos == 4
    assert r.read_bits(8) == 0xAB

    # plain pad byte then marker still works
    r2 = _BitReader(b"\x7f\xff\xd1\xcd", 0)
    r2.restart()
    assert r2.read_bits(8) == 0xCD

    # a real (non-RST) marker in place of the restart is still refused
    r3 = _BitReader(b"\xff\xd9", 0)
    with pytest.raises(ValueError):
        r3.restart()
