"""PNG codec: planted-fixture pixel-space oracles.

PNG is lossless, so every round-trip must be BIT-EXACT — a stronger
contract than the JPEG twin's quantization tolerance. The encoder
plants images with caller-chosen per-row filter types so one fixture
exercises every unfilter recurrence (None/Sub/Up/Average/Paeth).
"""

import struct
import zlib

import numpy as np
import pytest

from kafka_delta_ingest_spark.operators.png import (
    _SIG,
    _chunk,
    decode_png,
    encode_png,
    png_features,
)


def _gradient_rgb(h=23, w=31):
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 7 + y) % 256
    g = (y * 11 + 3 * x) % 256
    b = (x * x + y) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_each_filter_roundtrips_exactly(ft):
    img = _gradient_rgb()
    out = decode_png(encode_png(img, filter_type=ft))
    assert out.shape == img.shape
    assert np.array_equal(out, img), f"filter {ft} not lossless"


def test_mixed_filters_gray_rgba_roundtrip():
    gray = (np.arange(19 * 17, dtype=np.uint32).reshape(19, 17) * 31 % 256).astype(
        np.uint8
    )
    assert np.array_equal(decode_png(encode_png(gray, [0, 1, 2, 3, 4])), gray)
    rgba = np.dstack([_gradient_rgb(19, 17), gray[..., None]])
    out = decode_png(encode_png(rgba, [4, 3, 2, 1, 0]))
    assert out.shape == (19, 17, 4)
    assert np.array_equal(out, rgba)


def test_palette_image_decodes_to_rgb():
    # hand-build a color-type-3 PNG: 4x2 indices into a 3-entry palette
    w, h = 4, 2
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2, 1], [2, 2, 0, 0]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    png = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert out.shape == (2, 4, 3)
    assert np.array_equal(out, plte[idx])


def test_ancillary_chunks_are_skipped():
    img = _gradient_rgb(5, 5)
    b = encode_png(img)
    # splice a tEXt chunk between IHDR and IDAT
    ihdr_end = len(_SIG) + 12 + 13
    spliced = b[:ihdr_end] + _chunk(b"tEXt", b"comment\x00hi") + b[ihdr_end:]
    assert np.array_equal(decode_png(spliced), img)


def test_malformed_inputs_raise():
    img = _gradient_rgb(6, 6)
    good = encode_png(img)

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a" + good)
    # flip one IDAT byte -> CRC mismatch
    bad = bytearray(good)
    bad[len(_SIG) + 12 + 13 + 8 + 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="truncated|IEND|length"):
        decode_png(good[:-8])
    # 16-bit depth refused
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    png16 = _SIG + _chunk(b"IHDR", ihdr16) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(png16)
    # Adam7 refused
    ihdr_i = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    png_i = _SIG + _chunk(b"IHDR", ihdr_i) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlace"):
        decode_png(png_i)
    # pixel payload shorter than h*(1+stride)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    short = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 9))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(short)


def test_png_features_pixel_space_oracle():
    img = np.full((10, 20, 3), 100, dtype=np.uint8)
    f = png_features(encode_png(img, [0, 1, 2, 3, 4]))
    assert f[0] == 20.0 and f[1] == 10.0  # w, h
    assert abs(f[2] - 100.0) < 1e-9  # exact channel mean: lossless
    # alpha must not pollute features
    rgba = np.dstack([img, np.full((10, 20, 1), 7, dtype=np.uint8)])
    assert png_features(encode_png(rgba)) == f


def test_extract_features_with_png_kernel(spark):
    from pyspark.sql import Row

    from kafka_delta_ingest_spark.operators.multimodal import extract_features

    imgs = [
        (1, encode_png(_gradient_rgb(9, 9), [0, 1, 2, 3, 4])),
        (2, encode_png(np.full((4, 4), 50, dtype=np.uint8))),
        (3, b"not a png"),
    ]
    df = spark.createDataFrame([Row(media_id=i, media=b) for i, b in imgs])
    rows = {
        r.media_id: r
        for r in extract_features(
            df, decode=png_features, null_on_error=True
        ).collect()
    }
    assert rows[1].features is not None and rows[1].features[0] == 9.0
    assert abs(rows[2].features[2] - 50.0) < 1e-6
    assert rows[3].features is None  # quarantined, not crashed
