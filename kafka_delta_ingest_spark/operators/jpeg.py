"""Baseline JPEG codec in pure numpy — the compressed-image decode
kernel for the multimodal path.

Written from the public spec (ITU-T T.81 / ISO 10918-1, baseline
sequential DCT) plus the JFIF color conventions; the quality→quant
scaling is the well-known public libjpeg formula. No native image
library is involved, so this runs on the bare executor Python the
same way the PPM codec (multimodal.py) does.

Decoder (``decode_jpeg``): baseline sequential 8-bit, interleaved
single scan, grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling,
restart markers (DRI/RSTn), byte stuffing. Progressive (SOF2),
arithmetic coding, and 12-bit precision raise ``ValueError`` — the
caller's quarantine path (extract_features(null_on_error=True)) turns
that into NULL features, the reference's row-quarantine behavior
(src/writer.rs:618-639).

Encoder (``encode_jpeg_baseline``): the fixture generator — grayscale
or 4:4:4 color, Annex K quantization (quality-scaled) and Annex K
Huffman tables. It exists so tests can plant a JPEG with KNOWN pixel
content and assert the decoder recovers it within the codec's
quantization tolerance (same recorded-fixture approach as
encode_ppm/decode_ppm).

Scale note: this is a per-row kernel invoked inside Arrow-batched
``mapInPandas`` — the Spark plan (narrow, no blob shuffle) is
identical whether the kernel is this or libjpeg-turbo; swap in the
native wheel on a real cluster for throughput, keep this as the
dependency-free fallback and the behavioral contract.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K — published example tables)
# --------------------------------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# (bits[1..16], huffval) per Annex K
DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# Orthonormal 8x8 DCT-II basis: T @ f @ T.T is exactly T.81's FDCT
# (with its C(u) normalization), T.T @ F @ T the IDCT.
_T = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = np.sqrt(1 / 8) if _u == 0 else np.sqrt(2 / 8)
        _T[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """Quality 1..100 → scaled quant table (public libjpeg formula)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


# Canonical-code construction is ~12% of the whole decode path when
# rebuilt per image (guide §4.5: heavyweight init once) — and every
# real-world stream reuses a handful of tables (usually the Annex K
# standard ones), so both directions are memoized on the table spec.
# Returned dicts are SHARED — treat as immutable. Bounded: a stream
# with pathological per-image custom tables can't grow the cache past
# _TABLE_CACHE_MAX (reset wholesale, no LRU bookkeeping on the hot
# path).
_TABLE_CACHE_MAX = 64
_CODES_CACHE: dict = {}
_DECODE_CACHE: dict = {}


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per the canonical assignment (C.2)."""
    key = (tuple(bits), tuple(vals))
    hit = _CODES_CACHE.get(key)
    if hit is not None:
        return hit
    if len(vals) < sum(bits):
        raise ValueError("truncated Huffman table")
    out, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    if len(_CODES_CACHE) >= _TABLE_CACHE_MAX:
        _CODES_CACHE.clear()
    _CODES_CACHE[key] = out
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, for the bit-serial decoder."""
    key = (tuple(bits), tuple(vals))
    hit = _DECODE_CACHE.get(key)
    if hit is not None:
        return hit
    out = {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }
    if len(_DECODE_CACHE) >= _TABLE_CACHE_MAX:
        _DECODE_CACHE.clear()
    _DECODE_CACHE[key] = out
    return out


# --------------------------------------------------------------------------
# Encoder (fixture generator)
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (B.1.1.5)
                self.out.append(0x00)
        # Drop emitted bits so acc stays machine-word-sized (otherwise
        # it grows into a bignum and encode turns O(n^2)).
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill to byte boundary
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """v → (category, additional bits) per F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(
    w: _BitWriter,
    qblock: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    zz = qblock.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred
    size, bits = _magnitude(diff)
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        w.write(bits, size)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        # Clamp to magnitude category 10 (±1023): the baseline AC
        # Huffman tables carry sizes 1-10 only, and at quality ≳93 an
        # Annex-K quant entry can scale to 1, letting high-frequency
        # content quantize into category 11. libjpeg clamps the same
        # way rather than fail the encode.
        v = min(1023, max(-1023, int(zz[i])))
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        w.write(code, length)
        w.write(bits, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def encode_jpeg_baseline(arr, quality: int = 90) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → baseline JFIF bytes
    (4:4:4, Annex K tables scaled by ``quality``)."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    if gray:
        planes = [a.astype(np.float64)]
    else:
        rgb = a.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    qt = [_scaled_quant(QUANT_LUMA, quality)]
    if not gray:
        qt.append(_scaled_quant(QUANT_CHROMA, quality))

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, q in enumerate(qt):
        out += _seg(0xDB, bytes([tid]) + bytes(int(q[z]) for z in ZIGZAG))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)
    huff = [(0x00, DC_LUMA), (0x10, AC_LUMA)]
    if not gray:
        huff += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tc_id, (bits, vals) in huff:
        out += _seg(0xC4, bytes([tc_id]) + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    # Pad planes to 8-multiples (edge replicate), encode interleaved.
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    padded = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes
    ]
    dc_c = [_canonical_codes(*DC_LUMA), _canonical_codes(*DC_CHROMA)]
    ac_c = [_canonical_codes(*AC_LUMA), _canonical_codes(*AC_CHROMA)]
    writer = _BitWriter()
    preds = [0] * ncomp
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci in range(ncomp):
                t = 0 if ci == 0 else 1
                block = padded[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                coeffs = _T @ block @ _T.T
                qb = np.round(coeffs / qt[t].reshape(8, 8)).astype(np.int64)
                preds[ci] = _encode_block(
                    writer, qb, preds[ci], dc_c[t], ac_c[t]
                )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("entropy data ended at marker")
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed 0xFF
            else:
                self.marker = nxt
                self.pos += 1
                raise ValueError("entropy data ended at marker")
        # Mask to the live bits: an unmasked acc accretes every byte
        # ever read (bignum), turning decode O(n^2) on real-size files.
        self.acc = (((self.acc << 8) | byte) & ((1 << (self.nbits + 8)) - 1))
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker (E.2.4)."""
        self.nbits = 0
        if self.marker is None:
            # marker not yet hit: scan forward for it, skipping stuffed
            # 0xFF 0x00 pairs — if the byte-alignment pad before the
            # marker forms a 0xFF byte, the entropy stream contains
            # 0xFF 0x00 (stuffed data, F.1.2.3), not a marker, and
            # treating the 0x00 as the marker would reject a spec-valid
            # baseline file.
            while self.pos + 1 < len(self.data):
                if self.data[self.pos] != 0xFF:
                    self.pos += 1
                elif self.data[self.pos + 1] == 0x00:
                    self.pos += 2
                else:
                    break
            if self.pos + 1 >= len(self.data):
                raise ValueError("missing restart marker")
            self.marker = self.data[self.pos + 1]
            self.pos += 2
        if not (0xD0 <= self.marker <= 0xD7):
            raise ValueError(f"expected RSTn, got marker {self.marker:#x}")
        self.marker = None


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(b: bytes):
    """Baseline JPEG bytes → uint8 array: (h, w) gray or (h, w, 3) RGB.

    Raises ValueError on non-baseline or malformed input."""
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        raise ValueError("not a JPEG (missing SOI)")
    try:
        return _decode_segments(b)
    except IndexError as ex:
        # Out-of-range segment field on a malformed file — surface the
        # documented ValueError contract, never a bare IndexError.
        raise ValueError("malformed JPEG segment data") from ex


def _decode_segments(b: bytes):
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = b[pos + 1]
        if marker == 0xFF:  # fill byte (B.1.1.2)
            pos += 1
            continue
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("no scan data")
        seg_len = int.from_bytes(b[pos + 2:pos + 4], "big")
        payload = b[pos + 4:pos + 2 + seg_len]
        if seg_len < 2 or len(payload) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                for z in range(64):
                    tbl[ZIGZAG[z]] = payload[p + z]
                qt[tq] = tbl
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1:p + 17])
                if len(bits) < 16:
                    raise ValueError("truncated DHT segment")
                n = sum(bits)
                vals = list(payload[p + 17:p + 17 + n])
                huff[(tc, th)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline
            prec = payload[0]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(payload[1:3], "big")
            w = int.from_bytes(payload[3:5], "big")
            if h == 0 or w == 0:
                # h=0 is legal only with a DNL marker (unsupported);
                # refusing beats returning an empty image whose feature
                # math silently yields NaNs.
                raise ValueError("zero image dimension (DNL unsupported)")
            ncomp = payload[5]
            comps = []
            for ci in range(ncomp):
                cid = payload[6 + ci * 3]
                hv = payload[7 + ci * 3]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                     "tq": payload[8 + ci * 3]}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG supported")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(payload[:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            if ns != len(frame["comps"]):
                raise ValueError(
                    "only single interleaved (or grayscale) scans supported"
                )
            scan = []
            for si in range(ns):
                cs = payload[1 + si * 2]
                tt = payload[2 + si * 2]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None
                )
                if comp is None:
                    raise ValueError("scan references unknown component")
                scan.append((comp, tt >> 4, tt & 0x0F))
            data_start = pos + 2 + seg_len
            return _decode_scan(
                b, data_start, frame, scan, qt, huff, restart_interval
            )
        pos += 2 + seg_len
    raise ValueError("truncated JPEG (no SOS)")


def _decode_scan(b, pos, frame, scan, qt, huff, restart_interval):
    h, w = frame["h"], frame["w"]
    if len(scan) == 1:
        # Non-interleaved scan (T.81 A.2.2): one 8x8 data unit per MCU
        # in raster order, REGARDLESS of the component's declared
        # sampling factors — a grayscale SOF may legally say 2x2, but
        # the entropy stream still holds ceil(w/8)*ceil(h/8) blocks.
        scan = [(dict(scan[0][0], h=1, v=1), scan[0][1], scan[0][2])]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    for c, _, _ in scan:
        if not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4):
            raise ValueError("invalid sampling factors")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = []
    for comp, _, _ in scan:
        planes.append(
            np.zeros((mcus_y * comp["v"] * 8, mcus_x * comp["h"] * 8))
        )
    reader = _BitReader(b, pos)
    preds = [0] * len(scan)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                preds = [0] * len(scan)
            for si, (comp, td, ta) in enumerate(scan):
                dq = qt.get(comp["tq"])
                if dq is None:
                    raise ValueError("missing quant table")
                dc_tbl = huff.get((0, td))
                ac_tbl = huff.get((1, ta))
                if dc_tbl is None or ac_tbl is None:
                    raise ValueError("missing Huffman table")
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = _huff_decode(reader, dc_tbl)
                        diff = _extend(reader.read_bits(size), size) if size else 0
                        preds[si] += diff
                        zz[0] = preds[si]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, ac_tbl)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64)
                        block[ZIGZAG] = zz * dq[ZIGZAG]
                        pixels = _T.T @ block.reshape(8, 8) @ _T + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[si][y0:y0 + 8, x0:x0 + 8] = pixels
            mcu_count += 1
    # Upsample to full resolution, crop, color-convert.
    full = []
    for (comp, _, _), plane in zip(scan, planes):
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    rgb = np.stack([r, g, bl], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def jpeg_features(b: bytes) -> list[float]:
    """Pixel-space features from a JPEG payload — the shared
    ``multimodal.pixel_features`` layout (dims, channel mean/std, luma
    mean, luma histogram), FEATURE_DIM floats."""
    from kafka_delta_ingest_spark.operators.multimodal import pixel_features

    return pixel_features(decode_jpeg(b))
