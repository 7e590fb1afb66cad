"""FLAC codec tests: lossless roundtrips across block boundaries and
edge sizes, stereo decorrelation modes, Rice coding, hand-built LPC
subframes, CRC verification, malformed-stream rejection."""

import numpy as np
import pytest

from kafka_delta_ingest_spark.operators.flac import (
    _BitReader,
    _BitWriter,
    _decode_subframe,
    decode_flac,
    encode_flac,
)


def _sine(n=8192, k=37, amp=12000):
    t = np.arange(n)
    return (amp * np.sin(2 * np.pi * k * t / n)).astype(np.int16)


def test_mono_roundtrip_is_bit_exact_and_compresses():
    s = _sine()
    blob = encode_flac(s, 8000)
    dec, rate = decode_flac(blob)
    assert rate == 8000
    assert np.array_equal(dec[:, 0], s)
    assert len(blob) < s.nbytes / 2  # fixed-order-2 compresses a sine


def test_noise_roundtrip_exact():
    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32768, 50_000).astype(np.int16)
    dec, _ = decode_flac(encode_flac(x, 16000))
    assert np.array_equal(dec[:, 0], x)


@pytest.mark.parametrize("n", [1, 2, 3, 100, 4096, 4097, 9000])
def test_edge_lengths(n):
    rng = np.random.default_rng(n)
    x = rng.integers(-1000, 1000, n).astype(np.int16)
    dec, _ = decode_flac(encode_flac(x, 8000))
    assert np.array_equal(dec[:, 0], x)


@pytest.mark.parametrize("mode", ["indep", "left-side", "mid-side"])
def test_stereo_modes_exact(mode):
    left = _sine()
    right = (left * 0.9).astype(np.int16)
    st = np.stack([left, right], axis=1)
    dec, rate = decode_flac(encode_flac(st, 44100, stereo_mode=mode))
    assert rate == 44100 and np.array_equal(dec, st)


def test_decorrelation_actually_compresses_correlated_channels():
    left = _sine()
    st = np.stack([left, (left * 0.9).astype(np.int16)], axis=1)
    indep = len(encode_flac(st, 44100, stereo_mode="indep"))
    ms = len(encode_flac(st, 44100, stereo_mode="mid-side"))
    ls = len(encode_flac(st, 44100, stereo_mode="left-side"))
    assert ms < indep and ls < indep


def test_mid_side_odd_sum_low_bit():
    # (l + r) odd exercises the shared-low-bit reconstruction
    st = np.array([[3, 2], [-7, 4], [1, 0]], dtype=np.int16)
    dec, _ = decode_flac(encode_flac(st, 8000, stereo_mode="mid-side"))
    assert np.array_equal(dec, st)


def test_hand_built_lpc_subframe_decodes():
    # LPC order 1, coef=2, shift=1 → pred = x[i-1]; our encoder never
    # emits LPC, so build the bitstream by hand to cover the decoder.
    w = _BitWriter()
    w.write(0, 1)
    w.write(0b100000, 6)  # LPC, order (0 & 31) + 1 = 1
    w.write(0, 1)         # no wasted bits
    w.write(100 & 0xFFFF, 16)  # warmup sample
    w.write(3, 4)         # precision - 1 = 3 → 4 bits
    w.write(1, 5)         # shift = 1
    w.write(2, 4)         # coefficient 2 (4-bit signed)
    w.write(0, 2)         # residual method 0
    w.write(0, 4)         # partition order 0
    w.write(0, 4)         # rice param k=0
    for res in (5, -3, 0):  # x = 100, 105, 102, 102
        zz = (abs(res) << 1) - (1 if res < 0 else 0)
        w.write_unary(zz)
    w.align()
    br = _BitReader(w.bytes())
    x = _decode_subframe(br, 4, 16)
    assert x.tolist() == [100, 105, 102, 102]


def test_constant_and_verbatim_subframes():
    w = _BitWriter()
    w.write(0, 1)
    w.write(0, 6)  # CONSTANT
    w.write(0, 1)
    w.write(-42 & 0xFFFF, 16)
    w.align()
    assert _decode_subframe(_BitReader(w.bytes()), 5, 16).tolist() == [-42] * 5

    w = _BitWriter()
    w.write(0, 1)
    w.write(1, 6)  # VERBATIM
    w.write(0, 1)
    for v in (1, -2, 30000):
        w.write(v & 0xFFFF, 16)
    w.align()
    assert _decode_subframe(_BitReader(w.bytes()), 3, 16).tolist() == [
        1, -2, 30000
    ]


def test_crc_tamper_detected():
    blob = bytearray(encode_flac(_sine(200), 8000))
    blob[-10] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(blob))


def test_malformed_streams_raise():
    s = _sine(100)
    good = encode_flac(s, 8000)
    for bad in (b"", b"fLaX" + good[4:], good[:20], good[:40]):
        with pytest.raises(ValueError):
            decode_flac(bad)
    with pytest.raises(ValueError, match="empty"):
        encode_flac(np.array([], dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="stereo_mode"):
        encode_flac(s, 8000, stereo_mode="quad")
    with pytest.raises(ValueError, match="mono/stereo"):
        encode_flac(np.zeros((10, 3), dtype=np.int16), 8000)


def test_utf8_frame_number_shortest_form():
    """RFC 9639 §9.1.5 requires the SHORTEST coded form — the 3-byte
    form holds 16 payload bits (4 lead + 2×6), so frame 65535 must
    encode in 3 bytes, not 4 (review finding r6)."""
    from kafka_delta_ingest_spark.operators.flac import (
        _read_utf8_number,
        _utf8_number,
    )

    for n, want_len in [(0, 1), (127, 1), (128, 2), (2047, 2),
                        (2048, 3), (65535, 3), (65536, 4),
                        ((1 << 21) - 1, 4), (1 << 21, 5)]:
        enc = _utf8_number(n)
        assert len(enc) == want_len, (n, enc)
        assert _read_utf8_number(_BitReader(enc)) == n


def test_channel_count_mismatch_raises_value_error():
    """A frame whose channel assignment disagrees with STREAMINFO must
    raise the documented ValueError (quarantine contract), not
    IndexError (review finding r6): patch a mono stream's STREAMINFO
    to claim stereo."""
    sig = _sine(1024).reshape(-1, 1)
    blob = bytearray(encode_flac(sig, 8000))
    body = 8  # 'fLaC' + 4-byte metadata block header
    val = int.from_bytes(blob[body + 10:body + 14], "big")
    assert ((val >> 9) & 7) + 1 == 1
    val |= (2 - 1) << 9  # claim 2 channels
    blob[body + 10:body + 14] = val.to_bytes(4, "big")
    with pytest.raises(ValueError, match="channel assignment"):
        decode_flac(bytes(blob))


def test_unknown_total_samples_decodes_to_end():
    """STREAMINFO total_samples == 0 means UNKNOWN (RFC 9639, legal
    for streaming encoders) — the decoder must consume frames until
    the bytes run out, not silently return zero samples (review fix).

    STREAMINFO bit layout: min_bs(16) max_bs(16) min_f(24) max_f(24)
    rate(20) ch(3) bps(5) total(36) md5(128); total therefore spans
    bits 108..144 of the block data, which starts at byte 8 (after
    the fLaC magic and the 4-byte block header)."""
    x = _sine(4096)
    blob = bytearray(encode_flac(x[:, None], 8000))
    base = 8
    blob[base + 13] &= 0xF0
    for i in range(14, 18):
        blob[base + i] = 0
    dec, rate = decode_flac(bytes(blob))
    assert rate == 8000
    assert dec.shape == (4096, 1)
    assert (dec[:, 0] == x).all()
