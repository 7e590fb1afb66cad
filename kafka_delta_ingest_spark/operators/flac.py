"""FLAC codec in pure Python/numpy — real lossless compressed audio.

Written from the public FLAC format specification (xiph.org/flac/
format.html, now RFC 9639): ``fLaC`` magic, STREAMINFO metadata block,
frame headers with CRC-8, subframes (CONSTANT, VERBATIM, FIXED orders
0-4, LPC orders 1-32), partitioned Rice residual coding (both 4- and
5-bit parameter methods, escape-to-raw partitions), wasted-bits,
stereo decorrelation (left-side, right-side, mid-side), and frame
CRC-16.

The encoder emits a conforming subset — FIXED order-2 prediction with
single-partition Rice residuals (order 0/1 for short blocks), the
shape that compresses tonal signals well — so round-trips exercise
the decoder's Rice and fixed-predictor paths for real, and the
decoder independently handles streams from any conforming encoder.

FLAC is LOSSLESS: decode(encode(x)) == x exactly, which gives the
strongest certification invariant in the audio family (PCM equality,
no tolerance). With this, every classical codec tier decodes for
real: uncompressed (WAV), companded (G.711), ADPCM, entropy-coded
lossless (FLAC), DCT-lossy (JPEG), deflate (PNG), LZW (GIF) —
only perceptual codecs (MP3/AAC) and inter-frame video remain native
seams.

Scale note: bit-serial per frame inside Arrow-batched ``mapInPandas``
rows, like the JPEG Huffman path — per-row kernels, blobs never
shuffle.
"""

from __future__ import annotations

import numpy as np


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int):
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        out = 0
        while bits:
            if self.byte >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            take = min(bits, 8 - self.bit)
            cur = self.data[self.byte]
            out = (out << take) | (
                (cur >> (8 - self.bit - take)) & ((1 << take) - 1)
            )
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            bits -= take
        return out

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        if v >= 1 << (bits - 1):
            v -= 1 << bits
        return v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.read(1):
                return q
            q += 1
            if q > 1 << 24:
                raise ValueError("runaway unary code")

    def align(self):
        if self.bit:
            self.bit = 0
            self.byte += 1


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index)."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    # capacity of the nbytes form: (7 - nbytes) payload bits in the
    # lead byte + 6 per continuation byte (RFC 9639 §9.1.5 requires
    # the SHORTEST form; the old formula understated 3+ byte capacity
    # by nbytes-2 bits, emitting overlong codes past frame 32767)
    nbytes = 2
    while bits > (7 - nbytes) + 6 * (nbytes - 1):
        nbytes += 1
        if nbytes > 7:
            raise ValueError("frame number too large")
    # leading byte: nbytes ones, a zero, then payload bits
    lead = (0xFF << (8 - nbytes) & 0xFF) | (
        (n >> (6 * (nbytes - 1))) & ((1 << (7 - nbytes)) - 1)
    )
    out.append(lead)
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad coded frame number")
    n = first & ((1 << (7 - nbytes)) - 1)
    for _ in range(nbytes - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad coded-number continuation")
        n = (n << 6) | (c & 0x3F)
    return n


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def encode_flac(samples, sample_rate: int, block_size: int = 4096,
                stereo_mode: str = "indep") -> bytes:
    """Mono or stereo int16 samples → FLAC bytes (FIXED order-2
    subframes, single-partition Rice). ``stereo_mode`` selects the
    channel decorrelation for stereo input: ``indep``, ``left-side``
    (L, L-R), or ``mid-side`` ((L+R)>>1 with the shared low bit in the
    side, L-R) — the decorrelated modes compress correlated channels
    better and exercise the decoder's reconstruction paths."""
    a = np.asarray(samples, dtype=np.int64)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    if n == 0:
        raise ValueError("empty audio payload")
    if ch > 2:
        raise ValueError("encoder supports mono/stereo only")
    if stereo_mode not in ("indep", "left-side", "mid-side"):
        raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
    if ch == 1:
        stereo_mode = "indep"

    out = bytearray(b"fLaC")
    info = _BitWriter()
    info.write(block_size, 16)
    info.write(block_size, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(ch - 1, 3)
    info.write(15, 5)  # bits per sample - 1
    info.write(n, 36)
    info.align()
    si = info.bytes() + b"\x00" * 16  # md5 unset (all zero = unknown)
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si  # last block

    for fi, start in enumerate(range(0, n, block_size)):
        blk = a[start:start + block_size]
        bs = blk.shape[0]
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed blocking strategy
        w.write(0b0111, 4)  # block size: 16-bit at end
        w.write(0, 4)       # sample rate: from STREAMINFO
        if stereo_mode == "left-side":
            ch_code = 8
        elif stereo_mode == "mid-side":
            ch_code = 10
        else:
            ch_code = ch - 1
        w.write(ch_code, 4)
        w.write(0b100, 3)   # 16 bits per sample
        w.write(0, 1)
        w.align()
        head = bytes(w.buf) + _utf8_number(fi) + (bs - 1).to_bytes(2, "big")
        head += bytes([_crc8(head)])
        if stereo_mode == "left-side":
            sub_data = [(blk[:, 0], 16), (blk[:, 0] - blk[:, 1], 17)]
        elif stereo_mode == "mid-side":
            side = blk[:, 0] - blk[:, 1]
            mid = (blk[:, 0] + blk[:, 1]) >> 1
            sub_data = [(mid, 16), (side, 17)]
        else:
            sub_data = [(blk[:, c], 16) for c in range(ch)]
        w = _BitWriter()
        for x, sbits in sub_data:
            order = min(2, bs - 1) if bs > 1 else 0
            w.write(0, 1)
            w.write(0b001000 | order, 6)  # FIXED, given order
            w.write(0, 1)  # no wasted bits
            for i in range(order):
                w.write(int(x[i]) & ((1 << sbits) - 1), sbits)
            if order == 2:
                res = x[2:] - 2 * x[1:-1] + x[:-2]
            elif order == 1:
                res = x[1:] - x[:-1]
            else:
                res = x
            # single Rice partition, 4-bit parameter
            zz = (np.abs(res) * 2 - (res < 0)).astype(np.int64)
            mean = float(zz.mean()) if zz.size else 0.0
            k = 0
            while (1 << (k + 1)) < mean + 1 and k < 14:
                k += 1
            w.write(0, 2)   # method: 4-bit params
            w.write(0, 4)   # partition order 0
            w.write(k, 4)
            for v in zz:
                v = int(v)
                w.write_unary(v >> k)
                if k:
                    w.write(v & ((1 << k) - 1), k)
        w.align()
        frame = head + w.bytes()
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
    return bytes(out)


_BLOCKSIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_RATE_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def _decode_subframe(br: _BitReader, bs: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("bad subframe header padding bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        v = br.read_signed(eff)
        x = np.full(bs, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        x = np.array([br.read_signed(eff) for _ in range(bs)],
                     dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        x = _predicted(br, bs, eff, order, _FIXED_COEFS[order], 0)
    elif stype >= 32:  # LPC
        order = (stype & 0x1F) + 1
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision escape")
        shift = br.read_signed(5)
        coefs = [br.read_signed(prec) for _ in range(order)]
        x = _predicted_warm(br, bs, order, coefs, shift, warm)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    return x << wasted


def _predicted(br, bs, eff, order, coefs, shift):
    warm = [br.read_signed(eff) for _ in range(order)]
    return _predicted_warm(br, bs, order, coefs, shift, warm)


def _predicted_warm(br, bs, order, coefs, shift, warm):
    res = _read_residual(br, bs, order)
    x = list(warm)
    for i in range(order, bs):
        pred = sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
        x.append(res[i - order] + (pred >> shift))
    return np.array(x, dtype=np.int64)


def _read_residual(br: _BitReader, bs: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if bs % nparts:
        raise ValueError("block size not divisible by partition count")
    out: list[int] = []
    for p in range(nparts):
        cnt = bs // nparts - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("partition smaller than predictor order")
        k = br.read(pbits)
        if k == escape:  # raw residuals
            raw_bits = br.read(5)
            for _ in range(cnt):
                out.append(br.read_signed(raw_bits) if raw_bits else 0)
        else:
            for _ in range(cnt):
                q = br.read_unary()
                v = (q << k) | (br.read(k) if k else 0)
                out.append((v >> 1) ^ -(v & 1))
    return out


def decode_flac(b: bytes):
    """FLAC bytes → (samples int16 (n, channels), sample_rate).
    Verifies magic, STREAMINFO, frame CRC-8/CRC-16; supports CONSTANT/
    VERBATIM/FIXED/LPC subframes, both Rice methods with escapes,
    wasted bits, and all four channel assignments."""
    if b[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(b):
            raise ValueError("truncated metadata block")
        last = b[pos] & 0x80
        btype = b[pos] & 0x7F
        size = int.from_bytes(b[pos + 1:pos + 4], "big")
        body = b[pos + 4:pos + 4 + size]
        if len(body) != size:
            raise ValueError("truncated metadata body")
        if btype == 0:
            br = _BitReader(body)
            br.read(16)
            br.read(16)
            br.read(24)
            br.read(24)
            rate = br.read(20)
            ch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            info = (rate, ch, bps, total)
        pos += 4 + size
        if last:
            break
    if info is None:
        raise ValueError("missing STREAMINFO")
    rate, ch, bps, total = info
    if bps != 16:
        raise ValueError(f"{bps}-bit FLAC unsupported (16 only)")

    chans: list[list[int]] = [[] for _ in range(ch)]
    got = 0
    # STREAMINFO total_samples == 0 means UNKNOWN (RFC 9639 — legal for
    # streaming encoders): decode frames until the bytes run out
    # instead of silently returning zero samples.
    while (got < total) if total else (pos < len(b)):
        frame_start = pos
        br = _BitReader(b, pos)
        if br.read(14) != 0b11111111111110:
            raise ValueError("lost frame sync")
        br.read(1)
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        rate_code = br.read(4)
        ch_code = br.read(4)
        size_code = br.read(3)
        br.read(1)
        _read_utf8_number(br)
        if bs_code == 6:
            bs = br.read(8) + 1
        elif bs_code == 7:
            bs = br.read(16) + 1
        elif bs_code in _BLOCKSIZE_TABLE:
            bs = _BLOCKSIZE_TABLE[bs_code]
        else:
            raise ValueError(f"reserved block size code {bs_code}")
        if rate_code == 12:
            br.read(8)
        elif rate_code in (13, 14):
            br.read(16)
        elif rate_code != 0 and rate_code not in _RATE_TABLE:
            raise ValueError(f"bad sample rate code {rate_code}")
        if size_code not in (0, 0b100):
            raise ValueError("frame sample size != STREAMINFO unsupported")
        br.align()
        hdr = b[frame_start:br.byte]
        if _crc8(hdr) != br.read(8):
            raise ValueError("frame header CRC-8 mismatch")
        if ch_code < 8:
            nsub, assign = ch_code + 1, "indep"
        elif ch_code == 8:
            nsub, assign = 2, "left-side"
        elif ch_code == 9:
            nsub, assign = 2, "right-side"
        elif ch_code == 10:
            nsub, assign = 2, "mid-side"
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        subs = []
        for s in range(nsub):
            sb = bps
            if assign == "left-side" and s == 1:
                sb += 1
            if assign == "right-side" and s == 0:
                sb += 1
            if assign == "mid-side" and s == 1:
                sb += 1
            subs.append(_decode_subframe(br, bs, sb))
        br.align()
        crc = int.from_bytes(b[br.byte:br.byte + 2], "big")
        if _crc16(b[frame_start:br.byte]) != crc:
            raise ValueError("frame CRC-16 mismatch")
        pos = br.byte + 2
        if assign == "indep":
            chan_data = subs
        elif assign == "left-side":
            chan_data = [subs[0], subs[0] - subs[1]]
        elif assign == "right-side":
            chan_data = [subs[1] + subs[0], subs[1]]
        else:  # mid-side
            side = subs[1]
            mid = (subs[0] << 1) | (side & 1)
            chan_data = [(mid + side) >> 1, (mid - side) >> 1]
        if len(chan_data) != ch:
            raise ValueError(
                "frame channel assignment yields "
                f"{len(chan_data)} channels, STREAMINFO says {ch}"
            )
        take = min(bs, total - got) if total else bs
        for c in range(ch):
            chans[c].extend(int(v) for v in chan_data[c][:take])
        got += take
    out = np.array(chans, dtype=np.int64).T
    if out.size and (out.max() > 32767 or out.min() < -32768):
        raise ValueError("decoded samples exceed 16-bit range")
    return out.astype(np.int16), rate
