"""WAV/PCM codec: lossless round-trips and planted-sine spectral
oracles (same recorded-fixture approach as the PPM and JPEG codecs)."""

import numpy as np
import pytest

from kafka_delta_ingest_spark.operators.audio import (
    audio_features,
    decode_wav,
    dominant_bin,
    encode_wav,
)


def _sine(k: int, n: int = 2048, rate: int = 8000, amp: int = 12000):
    t = np.arange(n)
    return (amp * np.sin(2 * np.pi * k * t / n)).astype(np.int16), rate


def test_pcm16_roundtrip_is_lossless():
    rng = np.random.default_rng(3)
    mono = rng.integers(-32768, 32767, size=1000, dtype=np.int16)
    out, rate = decode_wav(encode_wav(mono, 44100))
    assert rate == 44100
    assert np.array_equal(out[:, 0], mono)
    stereo = rng.integers(-32768, 32767, size=(500, 2), dtype=np.int16)
    out2, _ = decode_wav(encode_wav(stereo, 16000))
    assert np.array_equal(out2, stereo)


def _wav8(samples_u8: bytes, rate: int = 8000, trailing_chunk: bool = False):
    """Hand-built 8-bit mono WAV — externally-produced shape the
    encoder never emits (encode_wav is 16-bit only)."""
    fmt = (
        (1).to_bytes(2, "little")  # PCM
        + (1).to_bytes(2, "little")  # mono
        + rate.to_bytes(4, "little")
        + rate.to_bytes(4, "little")  # byte rate (1 byte/sample)
        + (1).to_bytes(2, "little")  # block align
        + (8).to_bytes(2, "little")  # bits
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(samples_u8).to_bytes(4, "little") + samples_u8
    if len(samples_u8) % 2:
        chunks += b"\x00"  # RIFF word-alignment pad byte
    if trailing_chunk:
        chunks += b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def test_external_8bit_wav_with_odd_data_chunk_and_trailing_chunk():
    # ODD-size data chunk followed by a pad byte and ANOTHER chunk:
    # exercises the size+pad skip in the chunk walker — dropping the
    # word-alignment term would misparse the LIST header as samples.
    raw = bytes([128, 255, 0, 128, 200])  # 5 samples — odd
    out, rate = decode_wav(_wav8(raw, trailing_chunk=True))
    assert rate == 8000 and out.shape == (5, 1)
    # unsigned 8-bit centers at 128 then scales <<8
    want = (np.array([0, 127, -128, 0, 72], dtype=np.int16) << 8)
    assert np.array_equal(out[:, 0], want)


def test_planted_sine_dominant_bin_is_exact():
    # A pure sine at bin k has rFFT argmax exactly k — the integer
    # invariant the driver query's SQL oracle replays.
    for k in (3, 17, 101):
        samples, rate = _sine(k)
        assert dominant_bin(encode_wav(samples, rate)) == k


def test_audio_features_physical_values():
    k, n, rate = 50, 2048, 8000
    samples, _ = _sine(k, n=n, rate=rate)
    f = audio_features(encode_wav(samples, rate))
    duration, got_rate, channels = f[0], f[1], f[2]
    rms, peak, zcr, centroid = f[3], f[4], f[5], f[6]
    assert abs(duration - n / rate) < 1e-9
    assert (got_rate, channels) == (float(rate), 1.0)
    # sine RMS = amp/√2, ZCR ≈ 2 crossings per cycle
    assert abs(rms - (12000 / 32768.0) / np.sqrt(2)) < 0.01
    assert abs(peak - 12000 / 32768.0) < 0.01
    assert abs(zcr - 2 * k / n) < 0.01
    # spectral centroid near the tone frequency k*rate/n ≈ 195 Hz
    assert abs(centroid - k * rate / n) < 30.0


def test_malformed_and_compressed_inputs_raise():
    with pytest.raises(ValueError):
        decode_wav(b"not audio")
    good = bytearray(encode_wav(np.zeros(64, dtype=np.int16), 8000))
    with pytest.raises(ValueError):
        decode_wav(bytes(good[:30]))  # truncated chunk
    bad_tag = bytearray(good)
    fmt = bad_tag.find(b"fmt ")
    bad_tag[fmt + 8] = 0x55  # WAVE_FORMAT_MPEGLAYER3
    with pytest.raises(ValueError):
        decode_wav(bytes(bad_tag))


def test_extract_features_with_wav_kernel(spark):
    from pyspark.sql import Row

    from kafka_delta_ingest_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    rows = []
    for i, k in ((1, 5), (2, 40)):
        samples, rate = _sine(k)
        rows.append(
            Row(
                media_id=i,
                media=bytearray(encode_wav(samples, rate)),
                meta=Row(format="audio/wav", width=None, height=None,
                         duration_ms=256),
            )
        )
    rows.append(
        Row(media_id=3, media=bytearray(b"mp3 junk"),
            meta=Row(format="audio/mpeg", width=None, height=None,
                     duration_ms=None))
    )
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r.media_id: r.features
        for r in extract_features(
            df, decode=audio_features, null_on_error=True
        ).collect()
    }
    assert got[3] is None  # compressed/undecodable row quarantined
    assert abs(got[1][5] - 2 * 5 / 2048) < 0.01  # ZCR tracks frequency
    assert abs(got[2][5] - 2 * 40 / 2048) < 0.01
