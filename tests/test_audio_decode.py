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


# ---------------------------------------------------------------------------
# IMA ADPCM (operators/adpcm.py)
# ---------------------------------------------------------------------------

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
_IMA_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def _scalar_ima_decode(data: bytes, block_align: int):
    """Textbook scalar IMA decoder (straight from the public IMA
    reference algorithm) — the independent twin the vectorized
    decoder must match bit-for-bit."""
    spb = (block_align - 4) * 2 + 1
    out = []
    for off in range(0, len(data), block_align):
        block = data[off:off + block_align]
        pred = int.from_bytes(block[0:2], "little", signed=True)
        idx = block[2]
        out.append(pred)
        nibbles = []
        for byte in block[4:]:
            nibbles.append(byte & 0x0F)
            nibbles.append(byte >> 4)
        for nib in nibbles[: spb - 1]:
            step = _IMA_STEPS[idx]
            delta = step >> 3
            if nib & 4:
                delta += step
            if nib & 2:
                delta += step >> 1
            if nib & 1:
                delta += step >> 2
            pred = pred - delta if nib & 8 else pred + delta
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + _IMA_ADJ[nib & 7]))
            out.append(pred)
    return out


def test_adpcm_vectorized_decode_matches_scalar_reference():
    """Random nibble streams: the block-parallel numpy decoder must
    equal the textbook scalar algorithm sample-for-sample."""
    import numpy as np

    from kafka_delta_ingest_spark.operators.adpcm import decode_wav_adpcm

    rng = np.random.default_rng(42)
    for trial in range(5):
        n = int(rng.integers(1, 2000))
        samples = rng.integers(-32768, 32768, size=n).astype(np.int16)
        from kafka_delta_ingest_spark.operators.adpcm import (
            encode_wav_adpcm,
        )

        blob = encode_wav_adpcm(samples, 8000, block_align=64)
        # locate the data chunk and replay it through the scalar twin
        pos, data = 12, None
        while pos + 8 <= len(blob):
            cid = blob[pos:pos + 4]
            size = int.from_bytes(blob[pos + 4:pos + 8], "little")
            if cid == b"data":
                data = blob[pos + 8:pos + 8 + size]
            pos += 8 + size + (size % 2)
        want = _scalar_ima_decode(data, 64)[:n]
        got, rate = decode_wav_adpcm(blob)
        assert rate == 8000
        assert got.tolist() == want


def test_adpcm_roundtrip_snr_and_geometry():
    import numpy as np

    from kafka_delta_ingest_spark.operators.adpcm import (
        adpcm_snr_db,
        decode_wav_adpcm,
        encode_wav_adpcm,
        samples_per_block,
    )
    from kafka_delta_ingest_spark.operators.audio import (
        dominant_bin_samples,
    )

    n, rate = 1024, 8000
    t = np.arange(n)
    spb = samples_per_block(256)
    for k in (1, 5, 19, 37):
        s = (12000 * np.sin(2 * np.pi * k * t / n)).astype(np.int16)
        blob = encode_wav_adpcm(s, rate, block_align=256)
        d, got_rate = decode_wav_adpcm(blob)
        assert (got_rate, len(d)) == (rate, n)
        assert dominant_bin_samples(d[:, None]) == k
        assert adpcm_snr_db(s, d) >= 25.0
        # closed-form container size: RIFF 12 + fmt 28 + fact 12 +
        # data hdr 8 + ceil(n/spb) blocks * 256
        assert len(blob) == 12 + 28 + 12 + 8 + (-(-n // spb)) * 256
    # determinism
    s = (9000 * np.sin(2 * np.pi * 3 * t / n)).astype(np.int16)
    assert encode_wav_adpcm(s, rate) == encode_wav_adpcm(s, rate)


def test_adpcm_error_paths():
    import numpy as np
    import pytest

    from kafka_delta_ingest_spark.operators.adpcm import (
        decode_wav_adpcm,
        encode_wav_adpcm,
    )
    from kafka_delta_ingest_spark.operators.audio import encode_wav

    stereo = np.zeros((16, 2), dtype=np.int16)
    with pytest.raises(ValueError, match="mono-only"):
        encode_wav_adpcm(stereo, 8000)
    with pytest.raises(ValueError, match="empty"):
        encode_wav_adpcm(np.array([], dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav_adpcm(b"junk")
    # a plain PCM wav is NOT ADPCM: tag check must fire
    pcm = encode_wav(np.zeros(16, dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="not IMA ADPCM"):
        decode_wav_adpcm(pcm)
    # corrupt step index > 88 rejected
    good = bytearray(
        encode_wav_adpcm(np.zeros(16, dtype=np.int16), 8000, block_align=8)
    )
    di = good.find(b"data") + 8
    good[di + 2] = 200
    with pytest.raises(ValueError, match="step index"):
        decode_wav_adpcm(bytes(good))
    # truncated data chunk (not a whole block)
    with pytest.raises(ValueError):
        decode_wav_adpcm(bytes(good[:-2]))
