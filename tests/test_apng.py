"""APNG codec: lossless temporal-delta roundtrips, dispose/blend
compositing semantics via hand-built streams, and strict framing
validation (sequence numbers, acTL count, first-frame coverage)."""

import struct
import zlib

import numpy as np
import pytest

from kafka_delta_ingest_spark.operators.apng import (
    BLEND_OVER,
    BLEND_SOURCE,
    DISPOSE_BACKGROUND,
    DISPOSE_NONE,
    DISPOSE_PREVIOUS,
    _fctl,
    decode_apng,
    encode_apng,
)
from kafka_delta_ingest_spark.operators.png import (
    _SIG,
    _chunk,
    encode_png,
    encode_scanlines,
)


def _motion(n=5, h=24, w=32):
    base = np.zeros((h, w, 3), np.uint8)
    base[:, :, 2] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    fs = []
    for k in range(n):
        f = base.copy()
        f[4:10, 3 + 5 * k:9 + 5 * k] = (250, 10, 10)
        fs.append(f)
    return np.stack(fs)


def test_rgb_roundtrip_bit_exact_and_smaller_than_intra():
    fr = _motion()
    blob = encode_apng(fr)
    dec, delays = decode_apng(blob)
    assert np.array_equal(dec, fr)
    assert delays == [(1, 10)] * len(fr)
    intra = sum(len(encode_png(f, 2)) for f in fr)
    assert len(blob) < intra  # temporal delta must actually pay


@pytest.mark.parametrize("shape", [(3, 9, 7), (3, 9, 7, 3), (3, 9, 7, 4)])
def test_all_color_types_roundtrip(shape):
    rng = np.random.default_rng(5)
    fr = rng.integers(0, 256, shape).astype(np.uint8)
    dec, _ = decode_apng(encode_apng(fr))
    assert np.array_equal(dec, fr)


def test_static_animation_degenerates_to_minimum_regions():
    rng = np.random.default_rng(11)
    still = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    fr = np.stack([still] * 4)
    blob = encode_apng(fr)
    dec, _ = decode_apng(blob)
    assert np.array_equal(dec, fr)
    # later frames are spec-minimum 1x1 regions (~80 B each incl.
    # fcTL/fdAT framing), not re-coded stills (~3 KB of noise each)
    intra0 = len(encode_png(fr[0], 2))
    assert len(blob) < intra0 + 3 * 120
    assert len(blob) < 2 * intra0


def _apng(w, h, color_type, chunks):
    out = bytearray(_SIG)
    out += _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    )
    out += b"".join(chunks)
    out += _chunk(b"IEND", b"")
    return bytes(out)


def _idat(arr):
    return _chunk(b"IDAT", zlib.compress(encode_scanlines(arr, 0), 6))


def _fdat(seq, arr):
    return _chunk(
        b"fdAT",
        struct.pack(">I", seq) + zlib.compress(encode_scanlines(arr, 0), 6),
    )


def test_dispose_background_clears_region_for_next_frame():
    full = np.full((4, 4, 3), 200, np.uint8)
    dot = np.full((1, 1, 3), 50, np.uint8)
    blob = _apng(4, 4, 2, [
        _chunk(b"acTL", struct.pack(">II", 2, 0)),
        _fctl(0, 4, 4, 0, 0, (1, 10), DISPOSE_BACKGROUND, BLEND_SOURCE),
        _idat(full),
        _fctl(1, 1, 1, 2, 2, (1, 10), DISPOSE_NONE, BLEND_SOURCE),
        _fdat(2, dot),
    ])
    dec, _ = decode_apng(blob)
    assert (dec[0] == 200).all()
    # frame 1: canvas was cleared to black, then one dot at (2,2)
    assert (dec[1][2, 2] == 50).all()
    assert (dec[1][0, 0] == 0).all() and (dec[1][3, 3] == 0).all()


def test_dispose_previous_reverts_region():
    full = np.full((4, 4, 3), 100, np.uint8)
    big = np.full((4, 4, 3), 30, np.uint8)
    dot = np.full((1, 1, 3), 77, np.uint8)
    blob = _apng(4, 4, 2, [
        _chunk(b"acTL", struct.pack(">II", 3, 0)),
        _fctl(0, 4, 4, 0, 0, (1, 10), DISPOSE_NONE, BLEND_SOURCE),
        _idat(full),
        _fctl(1, 4, 4, 0, 0, (1, 10), DISPOSE_PREVIOUS, BLEND_SOURCE),
        _fdat(2, big),
        _fctl(3, 1, 1, 0, 0, (1, 10), DISPOSE_NONE, BLEND_SOURCE),
        _fdat(4, dot),
    ])
    dec, _ = decode_apng(blob)
    assert (dec[1] == 30).all()
    # frame 2 sees the frame-1 canvas REVERTED to 100, plus the dot
    assert (dec[2][0, 0] == 77).all() and (dec[2][1, 1] == 100).all()


def test_blend_over_composites_alpha():
    opaque = np.zeros((2, 2, 4), np.uint8)
    opaque[:, :, 1] = 200  # green
    opaque[:, :, 3] = 255
    half = np.zeros((2, 2, 4), np.uint8)
    half[:, :, 0] = 255  # red at alpha 128
    half[:, :, 3] = 128
    blob = _apng(2, 2, 6, [
        _chunk(b"acTL", struct.pack(">II", 2, 0)),
        _fctl(0, 2, 2, 0, 0, (1, 10), DISPOSE_NONE, BLEND_SOURCE),
        _idat(opaque),
        _fctl(1, 2, 2, 0, 0, (1, 10), DISPOSE_NONE, BLEND_OVER),
        _fdat(2, half),
    ])
    dec, _ = decode_apng(blob)
    px = dec[1][0, 0]
    assert px[0] == (255 * 128 + 127) // 255  # red in
    assert px[1] == (200 * 127 + 127) // 255  # green attenuated
    assert px[3] == 255  # over opaque stays opaque


def test_blend_over_onto_transparent_dest_yields_source_exactly():
    """Spec OVER weights the destination RGB by the destination's OWN
    alpha: compositing onto a fully-transparent pixel (here created by
    DISPOSE_BACKGROUND) must reproduce the source RGB exactly — the
    old straight mix halved the brightness (review fix)."""
    opaque = np.zeros((2, 2, 4), np.uint8)
    opaque[:, :, 1] = 200
    opaque[:, :, 3] = 255
    half_red = np.zeros((2, 2, 4), np.uint8)
    half_red[:, :, 0] = 255
    half_red[:, :, 3] = 128
    blob = _apng(2, 2, 6, [
        _chunk(b"acTL", struct.pack(">II", 2, 0)),
        _fctl(0, 2, 2, 0, 0, (1, 10), DISPOSE_BACKGROUND, BLEND_SOURCE),
        _idat(opaque),
        _fctl(1, 2, 2, 0, 0, (1, 10), DISPOSE_NONE, BLEND_OVER),
        _fdat(2, half_red),
    ])
    dec, _ = decode_apng(blob)
    px = dec[1][0, 0]
    assert px[0] == 255  # source red EXACT, not 128
    assert px[1] == 0
    assert px[3] == 128  # out alpha = source alpha over transparent


def test_default_image_idat_is_not_a_frame():
    still = np.full((3, 3, 3), 5, np.uint8)
    f1 = np.full((3, 3, 3), 60, np.uint8)
    f2 = np.full((3, 3, 3), 61, np.uint8)
    blob = _apng(3, 3, 2, [
        _chunk(b"acTL", struct.pack(">II", 2, 0)),
        _idat(still),  # default image: precedes any fcTL
        _fctl(0, 3, 3, 0, 0, (2, 7), DISPOSE_NONE, BLEND_SOURCE),
        _fdat(1, f1),
        _fctl(2, 3, 3, 0, 0, (2, 7), DISPOSE_NONE, BLEND_SOURCE),
        _fdat(3, f2),
    ])
    dec, delays = decode_apng(blob)
    assert dec.shape[0] == 2
    assert (dec[0] == 60).all() and (dec[1] == 61).all()
    assert delays == [(2, 7), (2, 7)]


def test_framing_violations_raise():
    fr = _motion(3)
    good = encode_apng(fr)
    # plain PNG (no acTL)
    with pytest.raises(ValueError, match="acTL"):
        decode_apng(encode_png(fr[0]))
    # CRC tamper
    bad = bytearray(good)
    bad[len(bad) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        decode_apng(bytes(bad))
    # acTL count mismatch
    full = np.full((2, 2, 3), 1, np.uint8)
    with pytest.raises(ValueError, match="num_frames"):
        decode_apng(_apng(2, 2, 2, [
            _chunk(b"acTL", struct.pack(">II", 5, 0)),
            _fctl(0, 2, 2, 0, 0, (1, 10), 0, 0),
            _idat(full),
        ]))
    # wrong sequence number
    with pytest.raises(ValueError, match="sequence"):
        decode_apng(_apng(2, 2, 2, [
            _chunk(b"acTL", struct.pack(">II", 2, 0)),
            _fctl(0, 2, 2, 0, 0, (1, 10), 0, 0),
            _idat(full),
            _fctl(7, 1, 1, 0, 0, (1, 10), 0, 0),
            _fdat(8, np.full((1, 1, 3), 2, np.uint8)),
        ]))
    # first animation frame must cover the canvas
    with pytest.raises(ValueError, match="cover"):
        decode_apng(_apng(2, 2, 2, [
            _chunk(b"acTL", struct.pack(">II", 1, 0)),
            _fctl(0, 1, 1, 0, 0, (1, 10), 0, 0),
            _idat(np.full((1, 1, 3), 2, np.uint8)),
        ]))
    # region outside canvas
    with pytest.raises(ValueError, match="region"):
        decode_apng(_apng(2, 2, 2, [
            _chunk(b"acTL", struct.pack(">II", 2, 0)),
            _fctl(0, 2, 2, 0, 0, (1, 10), 0, 0),
            _idat(full),
            _fctl(1, 2, 2, 1, 1, (1, 10), 0, 0),
            _fdat(2, np.full((2, 2, 3), 2, np.uint8)),
        ]))
