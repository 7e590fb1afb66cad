"""MJPEG-in-AVI video codec in pure numpy + stdlib — the real video
decode kernel for the multimodal path.

AVI is Microsoft's public RIFF container ("AVI RIFF File Reference");
Motion-JPEG stores each video frame as an independent baseline JPEG,
so the existing T.81 codec (operators/jpeg.py) decodes every frame and
no native video library is needed. This makes VIDEO a real decoded
modality here, the same move WAV (audio.py) and IMA ADPCM (adpcm.py)
made for audio: parse the public container, reuse a real per-payload
codec, quarantine malformed rows via ValueError. Inter-frame codecs
(H.264/VP9/AV1) remain behind the documented kernel seam in
multimodal.py — on a real cluster you swap an ffmpeg/pyav wheel into
the same mapInPandas plan shape.

* ``encode_avi_mjpeg`` — grayscale frame stack → RIFF/AVI bytes with
  ``hdrl`` (avih + strl/strh/strf), ``movi`` (one ``00dc`` JPEG chunk
  per frame, word-aligned) and an ``idx1`` index.
* ``decode_avi_mjpeg`` — full decode: header-validated frames, fps,
  geometry. Raises ``ValueError`` on malformed containers, non-MJPG
  handlers, or frame/header mismatches.
* ``decode_avi_frames`` — SELECTIVE decode through the ``idx1`` index:
  seek to the requested frame chunks and decode only those. This is
  the scale path for frame sampling — a 10k-frame clip sampled every
  100th frame parses one index and runs 100 JPEG decodes, not 10k —
  and is what ``multimodal.frame_sample_plan``'s per-frame work items
  map onto.

Scale note: per-row kernels inside Arrow-batched ``mapInPandas`` —
video blobs never shuffle; the frame loop is per-row Python but each
frame's DCT/Huffman work is vectorized numpy in jpeg.py.
"""

from __future__ import annotations

import numpy as np

from kafka_delta_ingest_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg_baseline,
)

_AVIF_HASINDEX = 0x10
_AVIIF_KEYFRAME = 0x10


def _u32(v: int) -> bytes:
    return int(v).to_bytes(4, "little")


def _u16(v: int) -> bytes:
    return int(v).to_bytes(2, "little")


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + _u32(len(body)) + body + pad


def _list(fourcc: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + body)


def encode_avi_mjpeg(frames, fps: int = 10, quality: int = 95) -> bytes:
    """Grayscale uint8 frames (iterable of (h, w) arrays, all the same
    geometry) → RIFF/AVI bytes with one baseline-JPEG ``00dc`` chunk
    per frame and an ``idx1`` index."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("empty frame list")
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("frames must share one geometry")
    if fps < 1:
        raise ValueError("fps must be >= 1")
    jpegs = [encode_jpeg_baseline(f, quality=quality) for f in frames]

    n = len(jpegs)
    avih = (
        _u32(1_000_000 // fps)       # dwMicroSecPerFrame
        + _u32(0)                    # dwMaxBytesPerSec
        + _u32(0)                    # dwPaddingGranularity
        + _u32(_AVIF_HASINDEX)       # dwFlags
        + _u32(n)                    # dwTotalFrames
        + _u32(0)                    # dwInitialFrames
        + _u32(1)                    # dwStreams
        + _u32(max(len(j) for j in jpegs))  # dwSuggestedBufferSize
        + _u32(w)
        + _u32(h)
        + _u32(0) * 4                # dwReserved
    )
    strh = (
        b"vids" + b"MJPG"
        + _u32(0) + _u16(0) + _u16(0)  # dwFlags, wPriority, wLanguage
        + _u32(0)                      # dwInitialFrames
        + _u32(1) + _u32(fps)          # dwScale / dwRate = frame rate
        + _u32(0) + _u32(n)            # dwStart, dwLength (frames)
        + _u32(max(len(j) for j in jpegs))
        + _u32(0xFFFFFFFF)             # dwQuality (default)
        + _u32(0)                      # dwSampleSize (varies per chunk)
        + _u16(0) + _u16(0) + _u16(w) + _u16(h)  # rcFrame
    )
    strf = (
        _u32(40) + _u32(w) + _u32(h) + _u16(1) + _u16(24)
        + b"MJPG" + _u32(w * h * 3)
        + _u32(0) * 4
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b"movi"
    idx = b""
    for j in jpegs:
        # idx1 offsets are relative to the movi LIST's fourcc position.
        idx += b"00dc" + _u32(_AVIIF_KEYFRAME) + _u32(len(movi_body)) + _u32(
            len(j)
        )
        movi_body += _chunk(b"00dc", j)
    movi = _chunk(b"LIST", movi_body)
    idx1 = _chunk(b"idx1", idx)

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + _u32(len(riff_body)) + riff_body


def _walk(b: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for each RIFF chunk in
    [pos, end); LIST chunks yield their list-type as fourcc with the
    body starting after it."""
    while pos + 8 <= end:
        cid = b[pos:pos + 4]
        size = int.from_bytes(b[pos + 4:pos + 8], "little")
        body = pos + 8
        if body + size > end:
            raise ValueError("truncated AVI chunk")
        if cid == b"LIST":
            if size < 4:
                raise ValueError("malformed LIST chunk")
            yield b[body:body + 4], body + 4, size - 4
        else:
            yield cid, body, size
        pos = body + size + (size % 2)


def _parse_container(b: bytes):
    """Shared header/movi/idx1 scan → (header dict, list of
    (jpeg_start, jpeg_size) in movi order, idx entries or None)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    hdr = {}
    chunks: list[tuple[int, int]] = []
    idx = None
    for fourcc, start, size in _walk(b, 12, 8 + int.from_bytes(b[4:8], "little")):
        if fourcc == b"hdrl":
            for f2, s2, z2 in _walk(b, start, start + size):
                if f2 == b"avih":
                    if z2 < 40:
                        raise ValueError("malformed avih header")
                    hdr["usec_per_frame"] = int.from_bytes(b[s2:s2 + 4], "little")
                    hdr["n_frames"] = int.from_bytes(b[s2 + 16:s2 + 20], "little")
                    hdr["width"] = int.from_bytes(b[s2 + 32:s2 + 36], "little")
                    hdr["height"] = int.from_bytes(b[s2 + 36:s2 + 40], "little")
                elif f2 == b"strl":
                    for f3, s3, z3 in _walk(b, s2, s2 + z2):
                        if f3 == b"strh":
                            if z3 < 48:
                                raise ValueError("malformed strh header")
                            if b[s3:s3 + 4] == b"vids":
                                handler = b[s3 + 4:s3 + 8]
                                if handler.upper() not in (b"MJPG", b"\x00\x00\x00\x00"):
                                    raise ValueError(
                                        f"unsupported video handler {handler!r} "
                                        "(MJPG only)"
                                    )
                                hdr["scale"] = int.from_bytes(b[s3 + 20:s3 + 24], "little")
                                hdr["rate"] = int.from_bytes(b[s3 + 24:s3 + 28], "little")
        elif fourcc == b"movi":
            hdr["movi_start"] = start - 4  # position of the 'movi' fourcc
            for f2, s2, z2 in _walk(b, start, start + size):
                if f2[2:4] in (b"dc", b"db"):
                    chunks.append((s2, z2))
        elif fourcc == b"idx1":
            idx = []
            for off in range(start, start + size - 15, 16):
                ckid = b[off:off + 4]
                if ckid[2:4] not in (b"dc", b"db"):
                    continue
                idx.append(
                    (
                        int.from_bytes(b[off + 8:off + 12], "little"),
                        int.from_bytes(b[off + 12:off + 16], "little"),
                    )
                )
    if "usec_per_frame" not in hdr:
        raise ValueError("missing avih header")
    if "movi_start" not in hdr:
        raise ValueError("missing movi list")
    return hdr, chunks, idx


def decode_avi_mjpeg(b: bytes):
    """RIFF/AVI bytes → (frames list[(h, w) uint8], fps, (w, h)).

    Every frame is decoded with the independent T.81 decoder; geometry
    and frame count are validated against the avih header."""
    hdr, chunks, _ = _parse_container(b)
    if not chunks:
        raise ValueError("no video frames in movi list")
    if hdr.get("n_frames") and hdr["n_frames"] != len(chunks):
        raise ValueError(
            f"header declares {hdr['n_frames']} frames, movi has {len(chunks)}"
        )
    frames = [decode_jpeg(b[s:s + z]) for s, z in chunks]
    w, h = hdr.get("width"), hdr.get("height")
    for f in frames:
        if w and h and f.shape != (h, w):
            raise ValueError(
                f"frame geometry {f.shape} != header ({h}, {w})"
            )
    if hdr.get("scale"):
        fps = int(round(hdr["rate"] / hdr["scale"]))
    else:
        fps = int(round(1_000_000 / max(1, hdr["usec_per_frame"])))
    return frames, fps, (frames[0].shape[1], frames[0].shape[0])


def decode_avi_frames(b: bytes, indices) -> list:
    """Decode ONLY the requested frame indices, seeking through the
    ``idx1`` index when present (falling back to the movi scan, which
    still skips the JPEG decode for unselected frames). This is the
    frame-sampling scale path: cost is O(container parse) +
    O(selected decodes), not O(total frames)."""
    hdr, chunks, idx = _parse_container(b)
    if idx:
        movi = hdr["movi_start"]
        locs = []
        for off, size in idx:
            # Offsets are relative to the 'movi' fourcc (the common
            # convention); a few writers use absolute offsets — detect
            # by checking the chunk id at the target.
            p = movi + off
            if b[p:p + 2] != b"00":
                p = off
            locs.append((p + 8, size))
    else:
        locs = chunks
    n = len(locs)
    out = []
    for i in indices:
        if not 0 <= i < n:
            raise ValueError(f"frame index {i} out of range 0..{n - 1}")
        s, z = locs[i]
        out.append(decode_jpeg(b[s:s + z]))
    return out
