"""Baseline TIFF 6.0 codec (operators/tiff.py): PackBits property
roundtrips, both byte orders, strip splits, malformed-input errors."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_delta_ingest_spark.operators.tiff import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=500))
def test_packbits_roundtrip(data):
    assert packbits_decode(packbits_encode(data), len(data)) == data


def test_packbits_long_runs_and_literals():
    b = b"\x07" * 1000 + b"\x01\x02" + b"\x09" * 300 + bytes(range(256))
    enc = packbits_encode(b)
    assert len(enc) < len(b)  # runs actually compress
    assert packbits_decode(enc, len(b)) == b


def test_packbits_noop_header_skipped():
    # -128 (0x80) is a spec no-op between packets
    assert packbits_decode(b"\x80\x00A\x80\xfeB", 4) == b"ABBB"


@pytest.mark.parametrize("byte_order", ["little", "big"])
@pytest.mark.parametrize("compression", [1, 32773])
def test_tiff_roundtrip_shapes(byte_order, compression):
    for h, w in [(1, 1), (3, 5), (16, 13), (40, 17)]:
        y, x = np.mgrid[0:h, 0:w]
        img = ((x + 2 * y + 5) % 256).astype(np.uint8)
        for rps in (None, 1, 7, 1000):
            blob = encode_tiff(
                img, compression=compression,
                rows_per_strip=rps, byte_order=byte_order,
            )
            assert np.array_equal(decode_tiff(blob), img)


def test_tiff_header_errors():
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX\x2a\x00\x08\x00\x00\x00")
    with pytest.raises(ValueError, match="magic"):
        decode_tiff(b"II\x2b\x00\x08\x00\x00\x00")


def test_tiff_unsupported_and_truncated():
    import struct as _struct

    img = np.zeros((4, 4), dtype=np.uint8)
    blob = bytearray(encode_tiff(img, compression=1))
    # tail truncation cuts the IFD (written after strip data): raises
    with pytest.raises((ValueError, _struct.error)):
        decode_tiff(bytes(blob[:-20]))
    with pytest.raises(ValueError, match="compression"):
        encode_tiff(img, compression=5)  # LZW not claimed
    # a strip whose byte count runs past EOF is caught explicitly
    good = encode_tiff(img, compression=1)
    # corrupt the StripByteCounts value: find the IFD entry for 279
    e = "<"
    (ifd,) = _struct.unpack_from(f"{e}I", good, 4)
    (n,) = _struct.unpack_from(f"{e}H", good, ifd)
    patched = bytearray(good)
    for i in range(n):
        base = ifd + 2 + 12 * i
        tag, typ, cnt = _struct.unpack_from(f"{e}HHI", patched, base)
        if tag == 279 and cnt == 1:
            _struct.pack_into(f"{e}I", patched, base + 8, 1 << 20)
    with pytest.raises(ValueError, match="strip extends"):
        decode_tiff(bytes(patched))


def test_tiff_cross_endian_identical_pixels():
    img = (np.arange(9 * 7) % 256).astype(np.uint8).reshape(7, 9)
    le = decode_tiff(encode_tiff(img, byte_order="little"))
    be = decode_tiff(encode_tiff(img, byte_order="big"))
    assert np.array_equal(le, be) and np.array_equal(le, img)


def test_tiff_word_alignment():
    import struct as _struct

    # odd-width uncompressed image → odd strip lengths must be padded
    # so the offset/count arrays and the IFD land on word boundaries
    img = (np.arange(5 * 3) % 256).astype(np.uint8).reshape(3, 5)
    for comp in (1, 32773):
        blob = encode_tiff(img, compression=comp, rows_per_strip=1)
        (ifd,) = _struct.unpack_from("<I", blob, 4)
        assert ifd % 2 == 0
        (n,) = _struct.unpack_from("<H", blob, ifd)
        for i in range(n):
            base = ifd + 2 + 12 * i
            tag, typ, cnt = _struct.unpack_from("<HHI", blob, base)
            size = {3: 2, 4: 4}[typ] * cnt
            if size > 4:
                (off,) = _struct.unpack_from("<I", blob, base + 8)
                assert off % 2 == 0, f"tag {tag} value at odd offset"
        assert np.array_equal(decode_tiff(blob), img)


def test_packbits_truncated_packets_raise():
    with pytest.raises(ValueError, match="repeat"):
        packbits_decode(b"\xfe", 3)  # repeat header, no payload byte
    with pytest.raises(ValueError, match="literal"):
        packbits_decode(b"\x04AB", 5)  # promises 5 literals, has 2
