"""GIF89a codec tests: LZW variable-width coding, dictionary reset,
animation framing, interlace, palettes, malformed-stream rejection."""

import numpy as np
import pytest

from kafka_delta_ingest_spark.operators.gif import (
    _deinterlace,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif_gray,
)


def test_lzw_roundtrip_across_width_growth_and_reset():
    rng = np.random.default_rng(1)
    # 70k random bytes force width growth to 12 bits AND the 4096
    # dictionary reset (CLEAR mid-stream)
    for size, mcs in [(100, 8), (10_000, 8), (70_000, 8), (5_000, 2)]:
        vals = rng.integers(0, 1 << mcs, size=size).astype(np.uint8)
        assert np.array_equal(
            _lzw_decode(_lzw_encode(vals, mcs), mcs, size), vals
        )


def test_lzw_actually_compresses_repetitive_data():
    rep = np.tile(np.arange(16, dtype=np.uint8), 4000)
    enc = _lzw_encode(rep, 8)
    assert len(enc) < rep.size // 3
    assert np.array_equal(_lzw_decode(enc, 8, rep.size), rep)


def test_kwkwk_case():
    # the classic aaaa... stream exercises code == len(table)
    vals = np.zeros(1000, dtype=np.uint8)
    assert np.array_equal(
        _lzw_decode(_lzw_encode(vals, 2), 2, 1000), vals
    )


def test_animation_roundtrip_exact():
    rng = np.random.default_rng(2)
    frames = [np.full((13, 17), g, dtype=np.uint8) for g in (0, 77, 255)]
    frames.append(rng.integers(0, 256, size=(13, 17)).astype(np.uint8))
    gif = encode_gif_gray(frames, delays_cs=[5, 10, 15, 20])
    dec, delays, (w, h) = decode_gif(gif)
    assert (w, h) == (17, 13) and delays == [5, 10, 15, 20]
    for f, ref in zip(dec, frames):
        assert f.shape == (13, 17, 3)
        # grayscale palette: every channel equals the planted value
        for ch in range(3):
            assert np.array_equal(f[:, :, ch], ref)


def test_single_frame_has_no_netscape_loop():
    gif = encode_gif_gray([np.zeros((4, 4), np.uint8)])
    assert b"NETSCAPE" not in gif
    gif2 = encode_gif_gray([np.zeros((4, 4), np.uint8)] * 2)
    assert b"NETSCAPE" in gif2


def test_deinterlace_is_inverse_of_pass_order():
    rows = np.arange(29)[:, None] * np.ones((1, 3), dtype=int)
    order = [
        y
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
        for y in range(start, 29, step)
    ]
    assert np.array_equal(_deinterlace(rows[np.array(order)]), rows)


def test_malformed_streams_raise():
    gif = encode_gif_gray([np.full((8, 8), 3, np.uint8)])
    for bad in (b"", b"JIF89a" + gif[6:], gif[:12], gif[:40], gif[:-2]):
        with pytest.raises(ValueError):
            decode_gif(bad)
    with pytest.raises(ValueError, match="empty"):
        encode_gif_gray([])
    with pytest.raises(ValueError, match="geometry"):
        encode_gif_gray([np.zeros((4, 4), np.uint8),
                         np.zeros((4, 8), np.uint8)])
    with pytest.raises(ValueError, match="delays"):
        encode_gif_gray([np.zeros((4, 4), np.uint8)], delays_cs=[1, 2])


def test_subrectangle_frame_composites_onto_canvas():
    # r6 review finding: real encoders emit delta rectangles with
    # left/top offsets — decode must composite onto the canvas, not
    # return bare sub-rects, and per-frame delay must not inherit.
    full = np.full((10, 12), 50, dtype=np.uint8)
    gif = encode_gif_gray([full], delays_cs=[7])
    # append a second image descriptor: 4x3 rect of value 200 at (5,2)
    patch = np.full((3, 4), 200, dtype=np.uint8)
    lzw = _lzw_encode(patch.reshape(-1), 8)
    extra = bytearray()
    extra += b"\x2c" + (5).to_bytes(2, "little") + (2).to_bytes(2, "little")
    extra += (4).to_bytes(2, "little") + (3).to_bytes(2, "little") + b"\x00"
    extra.append(8)
    extra.append(len(lzw))
    extra += lzw
    extra.append(0)
    tampered = gif[:-1] + bytes(extra) + b"\x3b"
    frames, delays, (w, h) = decode_gif(tampered)
    assert len(frames) == 2 and (w, h) == (12, 10)
    assert frames[0].shape == (10, 12, 3) and frames[1].shape == (10, 12, 3)
    # frame 2 = frame 1 with the patch painted at (top=2, left=5)
    assert np.array_equal(frames[1][2:5, 5:9, 0], patch)
    assert frames[1][0, 0, 0] == 50  # rest of canvas untouched
    # the second frame has NO GCE: delay is the spec default 0, not 7
    assert delays == [7, 0]


def test_disposal_restore_background():
    full = np.full((6, 6), 100, dtype=np.uint8)
    gif = bytearray(encode_gif_gray([full, full], delays_cs=[1, 1]))
    # set first frame's disposal method to 2 (restore background)
    gce_at = bytes(gif).find(b"\x21\xf9\x04")
    gif[gce_at + 3] = 2 << 2
    frames, _, _ = decode_gif(bytes(gif))
    # second frame repaints everything, so both frames look identical;
    # the decode path just must not crash and must honor disposal 2
    assert np.array_equal(frames[0], frames[1])


def test_gif87a_and_local_palette_decode():
    # hand-build a minimal GIF87a with a LOCAL color table only
    import numpy as _np

    idx = _np.array([[0, 1], [1, 0]], dtype=_np.uint8)
    lzw = _lzw_encode(idx.reshape(-1), 2)
    b = bytearray(b"GIF87a")
    b += (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
    b += bytes([0x00, 0, 0])  # no global table
    b += b"\x2c" + b"\x00\x00\x00\x00"
    b += (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
    b += bytes([0x80])  # local table, 2 entries
    b += bytes([10, 20, 30, 200, 210, 220])
    b.append(2)  # min code size
    b.append(len(lzw))
    b += lzw
    b.append(0)
    b.append(0x3B)
    frames, delays, (w, h) = decode_gif(bytes(b))
    assert (w, h) == (2, 2)
    assert frames[0][0, 0].tolist() == [10, 20, 30]
    assert frames[0][0, 1].tolist() == [200, 210, 220]
