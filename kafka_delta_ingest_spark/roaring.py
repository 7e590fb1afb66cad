"""Roaring-bitmap + Z85 codecs for Delta Lake DELETION VECTORS —
pure-Python, from the public specs:

* 32-bit roaring bitmap "portable" serialization
  (github.com/RoaringBitmap/RoaringFormatSpec): cookie 12346
  (no-run, + int32 container count) or 12347 (has-run, count-1 in the
  cookie's upper 16 bits + a run-flag bitset), per-container
  (key uint16, cardinality-1 uint16) descriptive headers, optional
  int32 offsets, then array (uint16 values) / bitmap (8 KiB bitset) /
  run (count + (start, len-1) pairs) container payloads — all
  little-endian.
* RoaringBitmapArray "portable" wrapper (Delta's 64-bit extension,
  delta PROTOCOL.md + the delta-rs/Delta implementations): int32 LE
  magic 1681511377, int64 LE number of 32-bit bitmaps, then each
  bitmap's standard portable serialization; the ARRAY INDEX is the
  high-32-bit key.
* Z85 (ZeroMQ RFC 32/Z85): 4 bytes → 5 chars over an 85-symbol
  alphabet — how Delta encodes DV file UUIDs and inline DVs.
* The DV FILE format (PROTOCOL.md "Deletion Vector Format"): a 1-byte
  format version (1), then per stored DV: int32 BIG-endian size,
  `size` bytes of serialized RoaringBitmapArray, int32 BIG-endian
  CRC-32 of those bytes. A descriptor's ``offset`` points at the size
  prefix.

The reference ingest daemon never deletes rows, but its output tables
live in ecosystems that do — a reader claiming standard-Delta interop
(delta_standard.py) must apply DVs or silently resurrect deleted rows.
"""

from __future__ import annotations

import struct
import zlib

_MAGIC = 1681511377  # RoaringBitmapArray portable magic (int32 LE)
_COOKIE_RUN = 12347
_COOKIE_NORUN = 12346
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    ".-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(b: bytes) -> str:
    if len(b) % 4:
        raise ValueError("z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(b), 4):
        v = int.from_bytes(b[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_CHARS[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise ValueError("z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i:i + 5]:
            try:
                v = v * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid z85 char {c!r}") from None
        out += v.to_bytes(4, "big")
    return bytes(out)


# ---------------------------------------------------------------------------
# 32-bit roaring


def _serialize_roaring32(values: list[int]) -> bytes:
    """Portable serialization (always the no-run cookie + offsets;
    array containers for cardinality <= 4096, bitmap containers
    otherwise — a spec-legal writer choice, the reader handles runs
    too). ``values`` must be sorted unique uint32."""
    containers: dict[int, list[int]] = {}
    for v in values:
        if not 0 <= v < (1 << 32):
            raise ValueError(f"value {v} out of uint32 range")
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    n = len(keys)
    out = bytearray()
    out += struct.pack("<ii", _COOKIE_NORUN, n)
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offsets: byte position of each container payload from stream start
    header_len = 8 + 4 * n + 4 * n
    payloads = []
    for k in keys:
        vals = containers[k]
        if len(vals) <= _ARRAY_MAX:
            payloads.append(struct.pack(f"<{len(vals)}H", *vals))
        else:
            bits = bytearray(8192)
            for lo in vals:
                bits[lo >> 3] |= 1 << (lo & 7)
            payloads.append(bytes(bits))
    pos = header_len
    for p in payloads:
        out += struct.pack("<i", pos)
        pos += len(p)
    for p in payloads:
        out += p
    return bytes(out)


def _deserialize_roaring32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Parse one portable 32-bit roaring bitmap at ``pos``; returns
    (sorted values, position after the bitmap)."""
    (cookie16,) = struct.unpack_from("<H", buf, pos)
    if cookie16 == _COOKIE_RUN:
        # Unsigned: with >=32769 containers the high half-word sets the
        # int32 sign bit and a signed unpack yields a negative count.
        (word,) = struct.unpack_from("<I", buf, pos)
        n = (word >> 16) + 1
        pos += 4
        flag_bytes = (n + 7) // 8
        run_flags = buf[pos:pos + flag_bytes]
        pos += flag_bytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie16 == _COOKIE_NORUN:
        (_, n) = struct.unpack_from("<ii", buf, pos)
        pos += 8
        run_flags = b"\x00" * ((n + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie16}")
    keys, cards = [], []
    for i in range(n):
        k, c = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys.append(k)
        cards.append(c + 1)
    if has_offsets:
        pos += 4 * n  # offsets are a seek aid; sequential parse here
    values: list[int] = []
    for i in range(n):
        base = keys[i] << 16
        card = cards[i]
        is_run = bool(run_flags[i >> 3] & (1 << (i & 7)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(base + start + j for j in range(length + 1))
        elif card <= _ARRAY_MAX:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
        else:
            bits = buf[pos:pos + 8192]
            pos += 8192
            for byte_i, byte in enumerate(bits):
                if byte:
                    for bit in range(8):
                        if byte & (1 << bit):
                            values.append(base + (byte_i << 3) + bit)
    return values, pos


# ---------------------------------------------------------------------------
# 64-bit RoaringBitmapArray (Delta's DV payload)


def serialize_rbm_array(values: list[int]) -> bytes:
    """Sorted unique uint64 row indexes → portable RoaringBitmapArray
    bytes (array index = high-32 key; gaps get empty bitmaps)."""
    by_high: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        if v < 0:
            raise ValueError("row index must be non-negative")
        by_high.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    n = (max(by_high) + 1) if by_high else 0
    out = bytearray(struct.pack("<iq", _MAGIC, n))
    for high in range(n):
        out += _serialize_roaring32(by_high.get(high, []))
    return bytes(out)


def _roaring32_cardinality(buf: bytes, pos: int) -> tuple[int, int]:
    """Total cardinality of one portable 32-bit roaring bitmap at
    ``pos`` WITHOUT materializing values; returns (cardinality,
    position after the bitmap). The descriptive header carries each
    container's cardinality-1, so only payload *sizes* are walked."""
    (cookie16,) = struct.unpack_from("<H", buf, pos)
    if cookie16 == _COOKIE_RUN:
        (word,) = struct.unpack_from("<I", buf, pos)
        n = (word >> 16) + 1
        pos += 4
        flag_bytes = (n + 7) // 8
        run_flags = buf[pos:pos + flag_bytes]
        pos += flag_bytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie16 == _COOKIE_NORUN:
        (_, n) = struct.unpack_from("<ii", buf, pos)
        pos += 8
        run_flags = b"\x00" * ((n + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie16}")
    cards = []
    for i in range(n):
        _k, c = struct.unpack_from("<HH", buf, pos)
        pos += 4
        cards.append(c + 1)
    if has_offsets:
        pos += 4 * n
    total = 0
    for i in range(n):
        card = cards[i]
        total += card
        if run_flags[i >> 3] & (1 << (i & 7)):
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2 + 4 * n_runs
        elif card <= _ARRAY_MAX:
            pos += 2 * card
        else:
            pos += 8192
    return total, pos


def rbm_array_cardinality(buf: bytes) -> int:
    """Decoded position count of a portable RoaringBitmapArray —
    header-only walk, no value materialization. A run container
    encodes up to 65,536 positions in 4 payload bytes, so serialized
    size is NOT a safe proxy for expanded cardinality; gate broadcast
    decisions on this count instead."""
    magic, n = struct.unpack_from("<iq", buf, 0)
    if magic != _MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    pos = 12
    total = 0
    for _high in range(n):
        card, pos = _roaring32_cardinality(buf, pos)
        total += card
    return total


def deserialize_rbm_array(buf: bytes) -> list[int]:
    magic, n = struct.unpack_from("<iq", buf, 0)
    if magic != _MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    pos = 12
    values: list[int] = []
    for high in range(n):
        vals, pos = _deserialize_roaring32(buf, pos)
        values.extend((high << 32) | v for v in vals)
    return values


# ---------------------------------------------------------------------------
# DV file framing + descriptor resolution


def write_dv_file(path: str, dvs: list[list[int]]) -> list[dict]:
    """Write a deletion-vector ``.bin`` file holding one serialized
    bitmap per entry; returns per-entry ``{"offset", "sizeInBytes",
    "cardinality"}`` for descriptor assembly."""
    metas = []
    with open(path, "wb") as f:
        f.write(b"\x01")  # format version
        pos = 1
        for values in dvs:
            data = serialize_rbm_array(values)
            f.write(struct.pack(">i", len(data)))
            f.write(data)
            f.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            metas.append(
                {
                    "offset": pos,
                    "sizeInBytes": len(data),
                    "cardinality": len(set(values)),
                }
            )
            pos += 4 + len(data) + 4
    return metas


def read_dv_bytes(path: str, offset: int, size: int) -> bytes:
    """Read one DV's serialized bitmap from a ``.bin`` file, verifying
    the size prefix and CRC-32 trailer."""
    with open(path, "rb") as f:
        f.seek(offset)
        (declared,) = struct.unpack(">i", f.read(4))
        if declared != size:
            raise ValueError(
                f"DV size mismatch: descriptor {size}, file {declared}"
            )
        data = f.read(size)
        (crc,) = struct.unpack(">I", f.read(4))
    if (zlib.crc32(data) & 0xFFFFFFFF) != crc:
        raise ValueError("DV checksum mismatch")
    return data


def dv_descriptor_bytes(table_path: str, desc: dict) -> bytes:
    """Resolve an ``add.deletionVector`` descriptor to the serialized
    bitmap bytes (storageType u / i / p per the protocol)."""
    import os
    import uuid as _uuid

    st = desc["storageType"]
    payload = desc["pathOrInlineDv"]
    if st == "i":
        return z85_decode(payload)
    if st == "u":
        prefix, enc = payload[:-20], payload[-20:]
        u = _uuid.UUID(bytes=z85_decode(enc))
        rel = f"deletion_vector_{u}.bin"
        path = os.path.join(table_path, prefix, rel) if prefix else (
            os.path.join(table_path, rel)
        )
        return read_dv_bytes(path, desc["offset"], desc["sizeInBytes"])
    if st == "p":
        p = payload
        if p.startswith("file:"):
            p = p[len("file:"):]
        return read_dv_bytes(p, desc["offset"], desc["sizeInBytes"])
    raise ValueError(f"unknown DV storageType {st!r}")
