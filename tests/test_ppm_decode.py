"""Real (non-stub) multimodal decode: binary PPM through the same
mapInPandas plumbing, with pixel-space features and resize."""

import numpy as np
import pytest
from pyspark.sql import Row

from kafka_delta_ingest_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_ppm,
    encode_ppm,
    extract_features,
    ppm_features,
    ppm_resize,
    resize_media,
)


def _img(seed: int, h: int = 8, w: int = 6) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def _media_rows(spark, imgs: dict[int, np.ndarray]):
    rows = [
        Row(
            media_id=i,
            media=bytearray(encode_ppm(a)),
            meta=Row(
                format="image/x-portable-pixmap",
                width=int(a.shape[1]),
                height=int(a.shape[0]),
                duration_ms=None,
            ),
        )
        for i, a in imgs.items()
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_ppm_roundtrip_with_comments_and_whitespace():
    img = _img(1)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    # Header variants a strict parser must accept: comments + extra ws.
    h, w = img.shape[0], img.shape[1]
    hdr = b"P6\n# a comment\n  %d\t%d\n# more\n255\n" % (w, h)
    assert (decode_ppm(hdr + img.tobytes()) == img).all()


def test_ppm_rejects_malformed():
    with pytest.raises(ValueError):
        decode_ppm(b"JFIF....")
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n255\n\x00\x00\x00")  # truncated pixels


def test_extract_features_real_pixels(spark):
    imgs = {i: _img(i) for i in range(4)}
    df = _media_rows(spark, imgs)
    got = {
        r.media_id: list(r.features)
        for r in extract_features(df, decode=ppm_features).collect()
    }
    for i, a in imgs.items():
        f = got[i]
        assert len(f) == FEATURE_DIM
        assert f[0] == a.shape[1] and f[1] == a.shape[0]  # w, h
        np.testing.assert_allclose(
            f[2:5], a.reshape(-1, 3).mean(axis=0), rtol=1e-6
        )


def test_extract_features_nulls_bad_rows(spark):
    img = _img(7)
    rows = _media_rows(spark, {0: img}).unionByName(
        spark.createDataFrame(
            [
                Row(
                    media_id=1,
                    media=bytearray(b"not an image"),
                    meta=Row(
                        format="image/x-portable-pixmap",
                        width=None,
                        height=None,
                        duration_ms=None,
                    ),
                )
            ],
            MEDIA_SCHEMA,
        )
    )
    got = {
        r.media_id: r.features
        for r in extract_features(
            rows, decode=ppm_features, null_on_error=True
        ).collect()
    }
    assert got[0] is not None and got[1] is None


def test_resize_media_with_real_kernel(spark):
    img = _img(3, h=8, w=8)
    out = resize_media(
        _media_rows(spark, {0: img}), width=4, height=2, kernel=ppm_resize
    ).collect()[0]
    resized = decode_ppm(bytes(out.media))
    assert resized.shape == (2, 4, 3)
    assert out.meta.width == 4 and out.meta.height == 2
    # Nearest-neighbor: every output pixel exists in the source.
    src = {tuple(p) for p in img.reshape(-1, 3).tolist()}
    assert all(tuple(p) in src for p in resized.reshape(-1, 3).tolist())
