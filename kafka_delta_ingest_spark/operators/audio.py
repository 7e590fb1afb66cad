"""WAV/PCM audio codec + features in pure numpy — the real audio
decode kernel for the multimodal path.

RIFF/WAVE with integer PCM is an uncompressed container (public
Microsoft/IBM format, the same role binary PPM plays for images), so
this runtime can decode it outright: no native audio library, just
header parsing and a dtype view. Compressed codecs (MP3/AAC/Vorbis)
remain behind the documented kernel seam in multimodal.py.

* ``encode_wav`` / ``decode_wav`` — lossless round-trip for 8/16-bit
  PCM, mono or multi-channel. ``decode_wav`` raises ``ValueError`` on
  non-PCM format tags and malformed headers; the Spark quarantine path
  (extract_features(null_on_error=True)) turns that into NULL
  features, mirroring the reference's row-quarantine rule
  (src/writer.rs:618-639).
* ``audio_features`` — FEATURE_DIM floats computed in SAMPLE space
  (duration, channels, RMS, peak, zero-crossing rate, spectral
  centroid, 8 log-spaced FFT band energies), not a byte hash.
* ``dominant_bin`` — argmax rFFT magnitude bin: an exact integer
  invariant planted fixtures can assert (a pure sine's dominant bin
  is known by construction), which is what lets a SQL oracle certify
  the decode path without running a decoder.

Scale note: per-row kernels inside Arrow-batched ``mapInPandas`` —
blobs never shuffle; swap in soundfile/ffmpeg wheels on a real
cluster for compressed formats, keep this as the dependency-free
contract.
"""

from __future__ import annotations

import numpy as np

_PCM = 1  # WAVE_FORMAT_PCM


def encode_wav(samples, sample_rate: int) -> bytes:
    """int16 array, shape (n,) mono or (n, channels) → RIFF/WAVE bytes
    (16-bit PCM, little-endian)."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, channels = a.shape
    data = a.astype("<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = (
        _PCM.to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    if len(data) % 2:
        chunks += b"\x00"  # RIFF chunks are word-aligned
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def decode_wav(b: bytes):
    """RIFF/WAVE bytes → (samples int16 (n, channels), sample_rate).

    Supports integer PCM, 8-bit (unsigned, rescaled to int16) and
    16-bit. Raises ValueError on non-PCM format tags (compressed
    audio), missing chunks, or malformed headers."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        size = int.from_bytes(b[pos + 4:pos + 8], "little")
        body = b[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("malformed fmt chunk")
            fmt = {
                "tag": int.from_bytes(body[0:2], "little"),
                "channels": int.from_bytes(body[2:4], "little"),
                "rate": int.from_bytes(body[4:8], "little"),
                "bits": int.from_bytes(body[14:16], "little"),
            }
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # word alignment
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if fmt["tag"] != _PCM:
        raise ValueError(
            f"compressed WAV format tag {fmt['tag']:#x} unsupported "
            f"(integer PCM only)"
        )
    channels = fmt["channels"]
    if channels < 1:
        raise ValueError("invalid channel count")
    if fmt["bits"] == 16:
        raw = np.frombuffer(data, dtype="<i2")
    elif fmt["bits"] == 8:
        # 8-bit WAV is unsigned; center and scale to int16 range.
        raw = ((np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128)
               << 8)
    else:
        raise ValueError(f"{fmt['bits']}-bit PCM unsupported (8/16 only)")
    n = raw.size // channels
    if n == 0:
        raise ValueError("empty audio payload")
    return raw[: n * channels].reshape(n, channels).astype(np.int16), fmt["rate"]


def dominant_bin_samples(samples) -> int:
    """Argmax rFFT magnitude bin (DC excluded) of already-decoded
    samples — callers that just ran ``decode_wav`` use this directly
    instead of paying a second RIFF parse."""
    mono = np.asarray(samples).mean(axis=1)
    mags = np.abs(np.fft.rfft(mono))
    if mags.size <= 1:
        raise ValueError("too short for spectral analysis")
    return int(np.argmax(mags[1:]) + 1)


def dominant_bin(b: bytes) -> int:
    """Exact integer invariant: the argmax magnitude bin of the rFFT
    over the mono mix (DC excluded). For a planted pure sine of
    frequency ``k * rate / n`` this is ``k`` by construction."""
    return dominant_bin_samples(decode_wav(b)[0])


AUDIO_FEATURE_DIM = 16


def audio_features(b: bytes) -> list[float]:
    """Sample-space features: duration_s, sample_rate, channels, RMS,
    peak, zero-crossing rate, spectral centroid (Hz), normalized
    dominant-bin magnitude, 8 log-spaced band energies."""
    return features_from_samples(*decode_wav(b))


def features_from_samples(samples, rate: int) -> list[float]:
    """The feature kernel itself, decoupled from the container parse
    so every audio codec (PCM WAV here, IMA ADPCM in adpcm.py) feeds
    the same FEATURE_DIM contract."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    mono = samples.mean(axis=1) / 32768.0
    rms = float(np.sqrt(np.mean(mono**2)))
    peak = float(np.abs(mono).max())
    zcr = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8)))))
    mags = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    total = float(mags.sum()) or 1.0
    centroid = float((mags * freqs).sum() / total)
    dom = float(mags[1:].max() / total) if mags.size > 1 else 0.0
    # 8 log-spaced band energies over (0, Nyquist], share of total power
    power = mags**2
    psum = float(power.sum()) or 1.0
    edges = np.logspace(np.log10(1), np.log10(max(2, mags.size)), 9)
    bands = [
        float(power[int(lo):int(hi)].sum() / psum)
        for lo, hi in zip(edges[:-1], edges[1:])
    ]
    out = [
        float(n) / rate, float(rate), float(channels),
        rms, peak, zcr, centroid, dom, *bands,
    ]
    return [float(x) for x in out[:AUDIO_FEATURE_DIM]]
