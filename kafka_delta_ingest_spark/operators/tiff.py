"""Baseline TIFF 6.0 codec in pure Python/numpy — 8-bit grayscale,
uncompressed and PackBits, both byte orders, multi-strip.

Written from the public TIFF 6.0 specification (Adobe, 1992): the
8-byte header (``II``/``MM`` byte order mark, magic 42, first-IFD
offset), IFD entry layout (tag, type, count, value-or-offset with
values ≤4 bytes packed INLINE), the baseline grayscale tag set
(ImageWidth 256, ImageLength 257, BitsPerSample 258, Compression 259,
PhotometricInterpretation 262, StripOffsets 273, SamplesPerPixel 277,
RowsPerStrip 278, StripByteCounts 279), strip-based pixel layout, and
the PackBits compression scheme (TIFF 6.0 §9 / Apple PackBits: header
byte n in 0..127 → n+1 literal bytes follow; n in -127..-1 → the next
byte repeats 1-n times; -128 is a no-op).

TIFF is lossless, so certification uses the same closed-form planted
pixel arithmetic the PNG/GIF paths use: a deterministic gradient
round-trips bit-exactly and a SQL oracle states the pixel sum without
a decoder. The encoder compresses for real (PackBits run detection);
the decoder is independent (handles either endianness, any strip
split, and files from other conforming writers).

Scale note: the Spark plan is the usual narrow Arrow-batched
``mapInPandas`` — blobs are created, coded, and dropped inside the
task; per-image work parallelizes across rows like the JPEG/PNG/GIF
kernels. Reference parity note: the reference daemon has no multimodal
surface; this family belongs to the training-data-pipeline extension.
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279

_COMP_NONE = 1
_COMP_PACKBITS = 32773

_TYPE_SHORT = 3
_TYPE_LONG = 4
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def packbits_encode(data: bytes) -> bytes:
    """Apple PackBits (TIFF 6.0 §9). Runs of >=3 identical bytes become
    a repeat packet; literals accumulate up to 128 per packet."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # measure the run at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 3:
            out.append(257 - run)  # -(run-1) as unsigned
            out.append(data[i])
            i = j
            continue
        # literal stretch: until the NEXT >=3 run or 128 bytes
        lit_start = i
        i = j
        while i < n and i - lit_start < 128:
            j = i + 1
            while j < n and data[j] == data[i]:
                j += 1
            if j - i >= 3:
                break
            i = j
        chunk = data[lit_start:min(i, lit_start + 128)]
        i = lit_start + len(chunk)
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Inverse of :func:`packbits_encode`; stops at ``expected`` bytes
    (the spec: a strip's decompressed size is StripByteCounts-driven)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        h = data[i]
        i += 1
        if h == 128:  # -128: no-op
            continue
        if h < 128:  # h+1 literal bytes
            if i + h + 1 > n:
                raise ValueError("truncated PackBits literal packet")
            out += data[i:i + h + 1]
            i += h + 1
        else:  # repeat next byte 257-h times
            if i >= n:
                raise ValueError("truncated PackBits repeat packet")
            out += bytes([data[i]]) * (257 - h)
            i += 1
    if len(out) < expected:
        raise ValueError(
            f"PackBits strip underflow: {len(out)} < {expected}"
        )
    return bytes(out[:expected])


def encode_tiff(
    img: np.ndarray,
    compression: int = _COMP_PACKBITS,
    rows_per_strip: int | None = None,
    byte_order: str = "little",
) -> bytes:
    """8-bit grayscale ndarray (h, w) → baseline TIFF bytes."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("encode_tiff wants a 2-D uint8 array")
    if compression not in (_COMP_NONE, _COMP_PACKBITS):
        raise ValueError(f"unsupported compression {compression}")
    h, w = img.shape
    if rows_per_strip is None:
        rows_per_strip = max(1, min(h, 8))
    e = "<" if byte_order == "little" else ">"
    strips = []
    for y0 in range(0, h, rows_per_strip):
        raw = img[y0:y0 + rows_per_strip].tobytes()
        strips.append(
            packbits_encode(raw) if compression == _COMP_PACKBITS
            else raw
        )
    n_strips = len(strips)

    # layout: header(8) | strip data | [offset/count arrays] | IFD.
    # TIFF 6.0 requires value offsets and the IFD on WORD boundaries —
    # odd-length strips get a pad byte (offsets skip it; byte counts
    # stay the true strip length).
    pos = 8
    strip_offsets = []
    pads = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
        pad = pos % 2
        pads.append(pad)
        pos += pad

    def arr_or_inline(values, typ):
        """IFD value packing: counts whose payload fits in 4 bytes go
        inline; larger arrays are appended after the strip data."""
        nonlocal pos
        size = _TYPE_SIZES[typ] * len(values)
        fmt = "H" if typ == _TYPE_SHORT else "I"
        if size <= 4:
            raw = struct.pack(f"{e}{len(values)}{fmt}", *values)
            return None, raw.ljust(4, b"\x00")
        off = pos
        pos += size
        return off, struct.pack(f"{e}I", off)

    entries = []  # (tag, type, count, 4-byte value field, extra bytes)
    extras = []

    def add(tag, typ, values):
        off, field = arr_or_inline(values, typ)
        if off is not None:
            fmt = "H" if typ == _TYPE_SHORT else "I"
            extras.append(struct.pack(f"{e}{len(values)}{fmt}", *values))
        entries.append((tag, typ, len(values), field))

    add(_TAG_WIDTH, _TYPE_LONG, [w])
    add(_TAG_LENGTH, _TYPE_LONG, [h])
    add(_TAG_BITS, _TYPE_SHORT, [8])
    add(_TAG_COMPRESSION, _TYPE_SHORT, [compression])
    add(_TAG_PHOTOMETRIC, _TYPE_SHORT, [1])  # BlackIsZero
    add(_TAG_STRIP_OFFSETS, _TYPE_LONG, strip_offsets)
    add(_TAG_SAMPLES, _TYPE_SHORT, [1])
    add(_TAG_ROWS_PER_STRIP, _TYPE_LONG, [rows_per_strip])
    add(_TAG_STRIP_COUNTS, _TYPE_LONG, [len(s) for s in strips])

    ifd_offset = pos
    out = bytearray()
    out += (b"II" if byte_order == "little" else b"MM")
    out += struct.pack(f"{e}H", 42)
    out += struct.pack(f"{e}I", ifd_offset)
    for s, pad in zip(strips, pads):
        out += s
        if pad:
            out += b"\x00"
    for x in extras:
        out += x
    out += struct.pack(f"{e}H", len(entries))
    for tag, typ, count, field in sorted(entries):
        out += struct.pack(f"{e}HHI", tag, typ, count) + field
    out += struct.pack(f"{e}I", 0)  # no next IFD
    return bytes(out)


def decode_tiff(data: bytes) -> np.ndarray:
    """Baseline TIFF bytes → 8-bit grayscale ndarray (h, w)."""
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    (magic,) = struct.unpack_from(f"{e}H", data, 2)
    if magic != 42:
        raise ValueError(f"not a TIFF: magic {magic}")
    (ifd,) = struct.unpack_from(f"{e}I", data, 4)
    (n_entries,) = struct.unpack_from(f"{e}H", data, ifd)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        base = ifd + 2 + 12 * i
        tag, typ, count = struct.unpack_from(f"{e}HHI", data, base)
        if typ not in (_TYPE_SHORT, _TYPE_LONG):
            continue  # baseline grayscale ignores RATIONAL etc.
        fmt = "H" if typ == _TYPE_SHORT else "I"
        size = _TYPE_SIZES[typ] * count
        if size <= 4:
            vals = struct.unpack_from(f"{e}{count}{fmt}", data, base + 8)
        else:
            (off,) = struct.unpack_from(f"{e}I", data, base + 8)
            vals = struct.unpack_from(f"{e}{count}{fmt}", data, off)
        tags[tag] = list(vals)

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"missing required TIFF tag {tag}")
            return default
        return v[0]

    w = one(_TAG_WIDTH)
    h = one(_TAG_LENGTH)
    bits = one(_TAG_BITS, 1)
    comp = one(_TAG_COMPRESSION, _COMP_NONE)
    samples = one(_TAG_SAMPLES, 1)
    if bits != 8 or samples != 1:
        raise ValueError(
            f"unsupported TIFF shape: {bits}-bit x{samples} samples "
            "(baseline 8-bit grayscale only)"
        )
    if comp not in (_COMP_NONE, _COMP_PACKBITS):
        raise ValueError(f"unsupported TIFF compression {comp}")
    rps = one(_TAG_ROWS_PER_STRIP, h)
    offsets = tags[_TAG_STRIP_OFFSETS]
    counts = tags[_TAG_STRIP_COUNTS]
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    raw = bytearray()
    remaining = h
    for off, cnt in zip(offsets, counts):
        rows = min(rps, remaining)
        remaining -= rows
        blob = data[off:off + cnt]
        if len(blob) != cnt:
            raise ValueError("strip extends past end of file")
        raw += (
            packbits_decode(blob, rows * w)
            if comp == _COMP_PACKBITS else blob[:rows * w]
        )
    if len(raw) != h * w:
        raise ValueError(f"pixel underflow: {len(raw)} != {h * w}")
    return np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, w)
