"""G.711 mu-law / A-law audio codec in pure numpy — real lossy
telephony compression for the multimodal path.

ITU-T G.711 is the public PSTN codec: 16-bit PCM compands to 8 bits
per sample via a piecewise-logarithmic curve (mu-law in North
America/Japan, A-law elsewhere). Both laws are closed-form and fully
vectorizable, so encode/decode are single numpy expressions over the
whole sample array — no sequential state at all (unlike ADPCM's
predictor), which makes this the *most* scale-friendly codec in the
family: a 1e9-sample stream compands in one elementwise pass.

Decode(encode(x)) is NOT identity (2:1 lossy compression), but it IS
an exact, deterministic step quantizer: every 16-bit input maps to one
of 256 reconstruction levels. That gives planted fixtures two exact
invariants — the recovered rFFT dominant bin of a planted sine (the
quantization noise sits far below a full-scale tone) and the exact
roundtrip of values that ARE reconstruction levels (decode∘encode is
idempotent: decode(encode(decode(encode(x)))) == decode(encode(x))).

Container: the same RIFF/WAVE framing as audio.py with format tags
0x07 (mu-law) / 0x06 (A-law), 8 bits per sample.

Reference seam: perceptual codecs (MP3/AAC) still require native
libraries (multimodal.py seam); G.711 + ADPCM + PCM now cover the
classical telephony/uncompressed tiers for real.
"""

from __future__ import annotations

import numpy as np

_WAVE_FORMAT_ALAW = 0x06
_WAVE_FORMAT_MULAW = 0x07

_MU_BIAS = 0x84  # 132
_MU_CLIP = 32635


def mulaw_encode(samples) -> np.ndarray:
    """int16 samples → uint8 mu-law codes (ITU-T G.711 u255 law,
    16-bit-domain formulation: bias 0x84, clip 32635, segment =
    msb(mag) - 7, mantissa = next 4 bits)."""
    x = np.asarray(samples, dtype=np.int64)
    sign = np.where(x < 0, 0x80, 0).astype(np.int64)
    mag = np.minimum(np.abs(x), _MU_CLIP) + _MU_BIAS  # >= 132, <= 32767
    exp = np.clip(np.floor(np.log2(mag)).astype(np.int64) - 7, 0, 7)
    mantissa = (mag >> (exp + 3)) & 0x0F
    code = ~(sign | (exp << 4) | mantissa) & 0xFF
    return code.astype(np.uint8)


def mulaw_decode(codes) -> np.ndarray:
    """uint8 mu-law codes → int16 reconstruction levels."""
    c = (~np.asarray(codes, dtype=np.int64)) & 0xFF
    sign = c & 0x80
    exp = (c >> 4) & 0x07
    mantissa = c & 0x0F
    mag = (((mantissa << 3) + _MU_BIAS) << exp) - _MU_BIAS
    out = np.where(sign != 0, -mag, mag)
    return out.astype(np.int16)


_A_SEG_END = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int64
)


def alaw_encode(samples) -> np.ndarray:
    """int16 samples → uint8 A-law codes (ITU-T G.711 A87.6 law,
    Sun g711.c formulation: 13-bit magnitude, segment table, even-bit
    inversion with 0x55)."""
    x = np.asarray(samples, dtype=np.int64)
    pcm = x >> 3  # 16 -> 13 bit, arithmetic shift
    mask = np.where(pcm >= 0, 0xD5, 0x55).astype(np.int64)
    pcm = np.where(pcm >= 0, pcm, -pcm - 1)
    pcm = np.minimum(pcm, 0xFFF)
    seg = np.searchsorted(_A_SEG_END, pcm)  # first seg with pcm <= end
    mant = np.where(seg < 2, (pcm >> 1) & 0x0F, (pcm >> seg) & 0x0F)
    return (((seg << 4) | mant) ^ mask).astype(np.uint8)


def alaw_decode(codes) -> np.ndarray:
    """uint8 A-law codes → int16 reconstruction levels."""
    c = (np.asarray(codes, dtype=np.int64)) ^ 0x55
    t = (c & 0x0F) << 4
    seg = (c >> 4) & 0x07
    t = np.where(
        seg == 0, t + 8,
        np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(seg - 1, 0)),
    )
    out = np.where(c & 0x80, t, -t)
    return out.astype(np.int16)


def encode_wav_g711(samples, sample_rate: int, law: str = "mulaw") -> bytes:
    """Mono int16 samples → RIFF/WAVE bytes with G.711 companding
    (format tag 0x07 mu-law / 0x06 A-law, 8 bits/sample)."""
    a = np.asarray(samples, dtype=np.int16).reshape(-1)
    if a.size == 0:
        raise ValueError("empty audio payload")
    if law == "mulaw":
        data, tag = mulaw_encode(a).tobytes(), _WAVE_FORMAT_MULAW
    elif law == "alaw":
        data, tag = alaw_encode(a).tobytes(), _WAVE_FORMAT_ALAW
    else:
        raise ValueError(f"unknown law {law!r} (mulaw|alaw)")
    fmt = (
        tag.to_bytes(2, "little")
        + (1).to_bytes(2, "little")          # channels
        + sample_rate.to_bytes(4, "little")
        + sample_rate.to_bytes(4, "little")  # byte rate = rate * 1 * 1
        + (1).to_bytes(2, "little")          # block align
        + (8).to_bytes(2, "little")          # bits per sample
    )
    fact = len(data).to_bytes(4, "little")
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"fact" + len(fact).to_bytes(4, "little") + fact
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    if len(data) % 2:
        chunks += b"\x00"
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def decode_wav_g711(b: bytes):
    """RIFF/WAVE G.711 bytes → (int16 samples (n,), sample_rate, law).

    Raises ValueError on malformed containers or non-G.711 tags."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
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
        pos += 8 + size + (size % 2)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if fmt["tag"] not in (_WAVE_FORMAT_MULAW, _WAVE_FORMAT_ALAW):
        raise ValueError(f"format tag {fmt['tag']:#x} is not G.711")
    if fmt["channels"] != 1:
        raise ValueError("G.711 path is mono-only here")
    if fmt["bits"] != 8:
        raise ValueError("G.711 uses 8 bits/sample")
    codes = np.frombuffer(data, dtype=np.uint8)
    if codes.size == 0:
        raise ValueError("empty audio payload")
    if fmt["tag"] == _WAVE_FORMAT_MULAW:
        return mulaw_decode(codes), fmt["rate"], "mulaw"
    return alaw_decode(codes), fmt["rate"], "alaw"


def g711_snr_db(original, decoded) -> float:
    """Signal-to-noise ratio of a companding roundtrip, in dB."""
    o = np.asarray(original, dtype=np.float64).reshape(-1)
    d = np.asarray(decoded, dtype=np.float64).reshape(-1)
    n = min(o.size, d.size)
    o, d = o[:n], d[:n]
    noise = float(np.sum((o - d) ** 2))
    if noise == 0:
        return float("inf")
    return 10.0 * np.log10(float(np.sum(o ** 2)) / noise)
