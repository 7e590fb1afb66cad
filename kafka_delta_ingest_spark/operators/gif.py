"""GIF89a codec in pure Python/numpy — real LZW-compressed images,
including multi-frame animations.

Written from the public GIF89a specification (CompuServe 1990, the
format W3C republishes): logical screen descriptor, global/local color
tables, graphic-control extensions (frame delays, transparency index),
image descriptors with optional interlacing, and the GIF variant of
LZW (variable code width 3..12 bits LSB-first, CLEAR/END codes,
4096-entry dictionary). The encoder writes a REAL LZW compressor (not
the fixed-width no-compression hack); the decoder is independent and
handles streams from any conforming writer, so round-trip tests
actually certify both directions.

GIF is lossless over its palette, which gives the same exact
certification the PNG path uses: a planted grayscale frame decodes to
bit-identical pixels, so a SQL oracle can state pixel sums
closed-form. Animation makes it the second multi-frame modality next
to MJPEG-in-AVI — with per-frame delays instead of a global fps.

Scale note: LZW is sequential per image, but images are rows — the
Spark plan is the usual narrow Arrow-batched ``mapInPandas`` where
blobs never shuffle; per-frame work parallelizes across rows exactly
like the JPEG/PNG kernels.
"""

from __future__ import annotations

import numpy as np

_MAX_CODE = 4095

# Base code tables are rebuilt on every frame AND every clear-code
# reset; for 8-bit images that is a 256-entry comprehension each time
# (~30% of the LZW path measured). Build each size once and COPY —
# dict/list copies are an order of magnitude cheaper (guide §4.5).
_BYTE1 = [bytes([i]) for i in range(256)]
_ENC_INIT: dict[int, dict[bytes, int]] = {}
_DEC_INIT: dict[int, tuple[bytes, ...]] = {}


def _enc_base(clear: int) -> dict[bytes, int]:
    base = _ENC_INIT.get(clear)
    if base is None:
        base = {_BYTE1[i]: i for i in range(clear)}
        _ENC_INIT[clear] = base
    return base.copy()


def _dec_base(clear: int) -> list[bytes]:
    base = _DEC_INIT.get(clear)
    if base is None:
        base = tuple(_BYTE1[i] for i in range(clear))
        _DEC_INIT[clear] = base
    return [*base, b"", b""]


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW: variable code width, LSB-first bit packing."""
    clear = 1 << min_code_size
    end = clear + 1
    next_code = end + 1
    width = min_code_size + 1
    table: dict[bytes, int] = _enc_base(clear)

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for px in indices.tobytes():
        wk = w + _BYTE1[px]
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code > _MAX_CODE:
            emit(clear)
            table = _enc_base(clear)
            next_code = end + 1
            width = min_code_size + 1
        w = _BYTE1[px]
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = _dec_base(clear)

    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = _dec_base(clear)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise ValueError("LZW stream short of pixel count")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE_PASSES
             for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[np.array(order)] = rows
    return out


def _u16(v: int) -> bytes:
    return int(v).to_bytes(2, "little")


def encode_gif_gray(frames, delays_cs=None) -> bytes:
    """Grayscale uint8 frames (same geometry) → animated GIF89a with a
    256-entry grayscale global palette and per-frame delays in
    centiseconds (default 10 = 10 fps)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("empty frame list")
    h, w = frames[0].shape
    if any(f.shape != (h, w) for f in frames):
        raise ValueError("frames must share one geometry")
    if delays_cs is None:
        delays_cs = [10] * len(frames)
    if len(delays_cs) != len(frames):
        raise ValueError("delays_cs length must match frames")

    out = bytearray(b"GIF89a")
    out += _u16(w) + _u16(h)
    out += bytes([0xF7, 0, 0])  # global table, 256 entries; bg 0
    for i in range(256):  # grayscale palette
        out += bytes([i, i, i])
    if len(frames) > 1:  # NETSCAPE loop-forever extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f, delay in zip(frames, delays_cs):
        out += b"\x21\xf9\x04\x00" + _u16(delay) + b"\x00\x00"
        out += b"\x2c" + _u16(0) + _u16(0) + _u16(w) + _u16(h) + b"\x00"
        out.append(8)  # LZW min code size
        lzw = _lzw_encode(f.reshape(-1), 8)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def decode_gif(b: bytes):
    """GIF bytes → (frames list[(sh, sw, 3) uint8 RGB], delays_cs
    list, (width, height)). Full-featured decode: 87a/89a, global and
    local palettes, interlacing, variable-width LZW, and frame
    COMPOSITING — sub-rectangle frames (image left/top offsets smaller
    than the logical screen, the delta-frame optimization real
    encoders emit) paint onto the running canvas, honoring disposal
    methods 0/1 (leave in place) and 2 (restore background);
    disposal 3 (restore previous) raises. Every returned frame is the
    full composited canvas. Frame delay comes from each frame's own
    graphic-control extension (0 when absent — the spec default), not
    inherited from earlier frames. Raises ValueError on malformed
    streams."""
    if len(b) < 13 or b[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF payload")
    sw = int.from_bytes(b[6:8], "little")
    sh = int.from_bytes(b[8:10], "little")
    packed = b[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b[pos:pos + 3 * n], dtype=np.uint8)
        if gct.size != 3 * n:
            raise ValueError("truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n

    frames = []
    delays = []
    delay = 0
    disposal = 0
    canvas = None
    bg_rgb = None
    while True:
        if pos >= len(b):
            raise ValueError("missing GIF trailer")
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(b):
                raise ValueError("truncated extension")
            label = b[pos]
            pos += 1
            if label == 0xF9 and pos + 5 <= len(b) and b[pos] == 4:
                gce_packed = b[pos + 1]
                disposal = (gce_packed >> 2) & 0x07
                delay = int.from_bytes(b[pos + 2:pos + 4], "little")
            while True:  # skip/consume sub-blocks
                if pos >= len(b):
                    raise ValueError("truncated extension sub-blocks")
                sz = b[pos]
                pos += 1
                if sz == 0:
                    break
                pos += sz
        elif block == 0x2C:  # image descriptor
            if pos + 9 > len(b):
                raise ValueError("truncated image descriptor")
            left = int.from_bytes(b[pos:pos + 2], "little")
            top = int.from_bytes(b[pos + 2:pos + 4], "little")
            iw = int.from_bytes(b[pos + 4:pos + 6], "little")
            ih = int.from_bytes(b[pos + 6:pos + 8], "little")
            ipacked = b[pos + 8]
            pos += 9
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(b[pos:pos + 3 * n], dtype=np.uint8)
                if pal.size != 3 * n:
                    raise ValueError("truncated local color table")
                pal = pal.reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("image with no color table")
            if pos >= len(b):
                raise ValueError("missing LZW min code size")
            mcs = b[pos]
            pos += 1
            if not 2 <= mcs <= 11:
                raise ValueError(f"bad LZW min code size {mcs}")
            data = bytearray()
            while True:
                if pos >= len(b):
                    raise ValueError("truncated image data")
                sz = b[pos]
                pos += 1
                if sz == 0:
                    break
                data += b[pos:pos + sz]
                if len(b) < pos + sz:
                    raise ValueError("truncated image sub-block")
                pos += sz
            idx = _lzw_decode(bytes(data), mcs, iw * ih).reshape(ih, iw)
            if ipacked & 0x40:
                idx = _deinterlace(idx)
            if int(idx.max(initial=0)) >= pal.shape[0]:
                raise ValueError("pixel index outside color table")
            if left + iw > sw or top + ih > sh:
                raise ValueError("frame rectangle outside logical screen")
            if bg_rgb is None:
                bg = b[11]
                bg_rgb = (
                    gct[bg]
                    if gct is not None and bg < gct.shape[0]
                    else np.zeros(3, dtype=np.uint8)
                )
            if canvas is None:
                canvas = np.tile(bg_rgb, (sh, sw, 1)).astype(np.uint8)
            if disposal == 3:
                raise ValueError(
                    "disposal method 3 (restore previous) unsupported"
                )
            canvas[top:top + ih, left:left + iw] = pal[idx]
            frames.append(canvas.copy())
            delays.append(delay)
            if disposal == 2:  # restore background in the frame rect
                canvas[top:top + ih, left:left + iw] = bg_rgb
            delay = 0
            disposal = 0
        else:
            raise ValueError(f"unknown GIF block {block:#x}")
    if not frames:
        raise ValueError("no image frames in GIF")
    return frames, delays, (sw, sh)
