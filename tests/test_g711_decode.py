"""G.711 mu-law / A-law codec tests: standard reference points,
idempotent requantization, SNR floors, container framing, quarantine
semantics."""

import numpy as np
import pytest

from kafka_delta_ingest_spark.operators.g711 import (
    alaw_decode,
    alaw_encode,
    decode_wav_g711,
    encode_wav_g711,
    g711_snr_db,
    mulaw_decode,
    mulaw_encode,
)


def _sine(bin_k=37, n=4096, amp=12000):
    t = np.arange(n)
    return (amp * np.sin(2 * np.pi * bin_k * t / n)).astype(np.int16)


def test_mulaw_reference_points():
    # ITU/Sun reference: silence codes to 0xFF and back to exactly 0.
    assert mulaw_encode(np.array([0]))[0] == 0xFF
    assert mulaw_decode(np.array([0xFF], dtype=np.uint8))[0] == 0
    # sign symmetry of reconstruction levels
    lv = mulaw_decode(np.arange(256, dtype=np.uint8))
    assert lv.min() < -30000 and lv.max() > 30000
    neg = mulaw_decode((np.arange(128, dtype=np.uint8)))
    pos = mulaw_decode((np.arange(128, dtype=np.uint8) + 128))
    assert np.array_equal(np.abs(neg[:127]), np.abs(pos[:127]))


def test_alaw_reference_points():
    assert alaw_encode(np.array([0]))[0] == 0xD5  # standard A-law zero code
    lv = alaw_decode(np.arange(256, dtype=np.uint8))
    assert lv.min() < -30000 and lv.max() > 30000


@pytest.mark.parametrize("enc,dec", [(mulaw_encode, mulaw_decode),
                                     (alaw_encode, alaw_decode)])
def test_requantization_idempotent(enc, dec):
    # decode∘encode maps onto the 256 reconstruction levels; applying
    # it again must be exact identity — the invariant that lets a
    # lossy codec be certified exactly.
    rng = np.random.default_rng(3)
    x = rng.integers(-32768, 32768, size=100_000).astype(np.int16)
    once = dec(enc(x))
    assert np.array_equal(once, dec(enc(once)))


@pytest.mark.parametrize("enc,dec", [(mulaw_encode, mulaw_decode),
                                     (alaw_encode, alaw_decode)])
def test_snr_floor_on_sine(enc, dec):
    s = _sine()
    assert g711_snr_db(s, dec(enc(s))) >= 30.0  # G.711 delivers ~38 dB


@pytest.mark.parametrize("law", ["mulaw", "alaw"])
def test_container_roundtrip_recovers_planted_bin(law):
    s = _sine(bin_k=21)
    wav = encode_wav_g711(s, 8000, law=law)
    got, rate, got_law = decode_wav_g711(wav)
    assert (rate, got_law, got.size) == (8000, law, s.size)
    mags = np.abs(np.fft.rfft(got.astype(np.float64)))
    assert int(np.argmax(mags[1:])) + 1 == 21
    # closed-form container geometry: riff(12) + fmt(8+16) + fact(8+4)
    # + data(8 + n) — 8-bit codes, one byte per sample.
    assert len(wav) == 12 + 24 + 12 + 8 + s.size


def test_malformed_containers_raise():
    s = _sine()
    wav = encode_wav_g711(s, 8000)
    for bad in (b"", b"RIFF\x04\x00\x00\x00WAVE", wav[:30]):
        with pytest.raises(ValueError):
            decode_wav_g711(bad)
    with pytest.raises(ValueError, match="law"):
        encode_wav_g711(s, 8000, law="opus")
    with pytest.raises(ValueError, match="empty"):
        encode_wav_g711(np.array([], dtype=np.int16), 8000)
    # a PCM wav is NOT a G.711 payload
    from kafka_delta_ingest_spark.operators.audio import encode_wav

    with pytest.raises(ValueError, match="not G.711"):
        decode_wav_g711(encode_wav(s, 8000))
