"""Minimal pure-Python/numpy FLAC codec (no audio libs in this container).

Implements the FLAC bitstream subset sufficient for the clips table's
``codec="flac"`` rows — REAL lossless compression, not a stub: fixed
linear predictors with Rice-coded residuals, per the public format spec
(RFC 9639).  The north-rule per-row invariant holds exactly (lossless ⇒
decoded PCM is sample-identical, SNR = ∞).

Encoder (fixture/test side): mono, 16 bps, fixed 4096-sample blocks,
order-2 fixed predictor, one Rice partition per subframe (partition
order 0, 4-bit parameters, escape-to-raw fallback), frame CRC-8/CRC-16
and STREAMINFO MD5 all emitted properly.

Decoder: streams any mono 16 bps fixed-blocksize subset using CONSTANT,
VERBATIM, and FIXED(0-4) subframes, both Rice methods (4- and 5-bit
parameters), any partition order, escape partitions, and wasted bits;
verifies the sync code, header CRC-8, frame CRC-16, and final MD5.
(LPC subframes and stereo decorrelation are outside the subset and
raise ``UnsupportedCodecError`` — the container has no reference encoder
that could produce them for our fixtures.)

Bit-level reads are O(1) numpy ops over a pre-unpacked bit array
(``np.searchsorted`` over one-bit positions for unary codes), so decode
is a cheap per-residual loop, not per-bit.
"""

from __future__ import annotations

import hashlib

import numpy as np

from intertext_ray.functions.audio import UnsupportedCodecError

_BLOCK = 4096

# fixed-predictor coefficients per order: residual = sum(c_j * s[i-j-1])
# subtracted from s[i] (RFC 9639 §9.2.2)
_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _make_crc_table(poly: int, width: int) -> list[int]:
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    table = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        table.append(crc)
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)       # x^8 + x^2 + x + 1
_CRC16_TABLE = _make_crc_table(0x8005, 16)   # x^16 + x^15 + x^2 + 1


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[(crc >> 8) ^ b]
    return crc


def _utf8_number(n: int) -> bytes:
    """FLAC 'extended UTF-8' coded number (frame index)."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 6 * (nbytes - 1) + (7 - nbytes):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


class _BitWriter:
    def __init__(self) -> None:
        self._acc = 0
        self._nbits = 0
        self._out = bytearray()

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_unary(self, q: int) -> None:
        # q zero bits terminated by a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def getvalue(self) -> bytes:
        assert self._nbits == 0
        return bytes(self._out)


def _zigzag(res: np.ndarray) -> np.ndarray:
    r = np.asarray(res, dtype=np.int64)
    return np.where(r >= 0, 2 * r, -2 * r - 1)


def _best_rice_param(zz: np.ndarray) -> tuple[int, int]:
    """(param, total_bits) minimizing sum(zz >> p) + n * (p + 1)."""
    n = len(zz)
    best_p, best_cost = 0, None
    for p in range(15):
        cost = int((zz >> p).sum()) + n * (p + 1)
        if best_cost is None or cost < best_cost:
            best_p, best_cost = p, cost
    return best_p, best_cost


def encode_flac(pcm: np.ndarray, sr_hz: int) -> bytes:
    """int16 mono PCM -> FLAC stream (see module docstring for subset)."""
    pcm = np.asarray(pcm, dtype=np.int16)
    n = len(pcm)
    out = bytearray(b"fLaC")
    # STREAMINFO (last-metadata-block=1, type 0, length 34)
    si = _BitWriter()
    si.write(_BLOCK, 16)  # min blocksize
    si.write(_BLOCK, 16)  # max blocksize
    si.write(0, 24)  # min framesize unknown
    si.write(0, 24)  # max framesize unknown
    si.write(sr_hz, 20)
    si.write(0, 3)  # channels - 1
    si.write(15, 5)  # bps - 1
    si.write(n, 36)
    md5 = hashlib.md5(pcm.astype("<i2").tobytes()).digest()
    out += bytes([0x80]) + (34).to_bytes(3, "big") + si.getvalue() + md5

    x = pcm.astype(np.int64)
    for fi, start in enumerate(range(0, max(n, 1), _BLOCK)):
        blk = x[start : start + _BLOCK]
        bs = len(blk)
        if bs == 0:
            break
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed blocksize stream
        full = bs == _BLOCK
        w.write(0b1100 if full else 0b0111, 4)  # 4096 | 16-bit follows
        w.write(0b0000, 4)  # sample rate from STREAMINFO
        w.write(0b0000, 4)  # mono
        w.write(0b100, 3)  # 16 bps
        w.write(0, 1)  # reserved
        for b in _utf8_number(fi):
            w.write(b, 8)
        if not full:
            w.write(bs - 1, 16)
        hdr = w.getvalue()
        w.write(_crc8(hdr), 8)

        order = 2 if bs > 2 else 0
        coef = _FIXED_COEF[order]
        w.write(0, 1)  # subframe pad bit
        w.write(0b001000 | order, 6)  # FIXED, order
        w.write(0, 1)  # no wasted bits
        for s in blk[:order]:  # warmup, raw 16-bit
            w.write(int(s) & 0xFFFF, 16)
        res = blk[order:].copy()
        for j, c in enumerate(coef):
            res -= c * blk[order - 1 - j : bs - 1 - j]
        zz = _zigzag(res)
        p, rice_cost = _best_rice_param(zz)
        w.write(0b00, 2)  # 4-bit rice parameters
        w.write(0, 4)  # partition order 0
        if rice_cost <= 18 * len(zz):
            w.write(p, 4)
            for v in zz:
                w.write_unary(int(v) >> p)
                w.write(int(v), p)
        else:  # escape: raw residuals
            w.write(0b1111, 4)
            w.write(18, 5)  # signed 18 bits: order-2 residual range ±131070
            for v in res:
                w.write(int(v) & 0x3FFFF, 18)
        w.align()
        frame = w.getvalue()
        out += frame + _crc16(frame).to_bytes(2, "big")
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self._ones = np.nonzero(self._bits)[0]
        self._pow = (1 << np.arange(63, -1, -1)).astype(object)
        self.pos = 0

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        b = self._bits[self.pos : self.pos + nbits]
        if len(b) < nbits:
            raise ValueError("flac: truncated stream")
        self.pos += nbits
        return int(b @ self._pow[-nbits:])

    def read_unary(self) -> int:
        i = np.searchsorted(self._ones, self.pos)
        if i >= len(self._ones):
            raise ValueError("flac: truncated unary code")
        q = int(self._ones[i]) - self.pos
        self.pos = int(self._ones[i]) + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        assert self.pos % 8 == 0
        return self.pos // 8


def _read_utf8_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    val = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        cont = r.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("flac: bad coded number")
        val = (val << 6) | (cont & 0x3F)
    return val


_BLOCKSIZE_TABLE = {
    0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304, 0b0101: 4608,
    0b1000: 256, 0b1001: 512, 0b1010: 1024, 0b1011: 2048, 0b1100: 4096,
    0b1101: 8192, 0b1110: 16384, 0b1111: 32768,
}


def _signed(v: int, bits: int) -> int:
    return v - (1 << bits) if v >= 1 << (bits - 1) else v


def _decode_residuals(r: _BitReader, bs: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if bs % nparts:
        raise ValueError("flac: partition count does not divide blocksize")
    out = np.empty(bs - order, dtype=np.int64)
    w = 0
    for part in range(nparts):
        cnt = bs // nparts - (order if part == 0 else 0)
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            for i in range(cnt):
                out[w + i] = _signed(r.read(raw), raw) if raw else 0
        else:
            for i in range(cnt):
                q = r.read_unary()
                v = (q << param) | r.read(param)
                out[w + i] = (v >> 1) ^ -(v & 1)  # un-zigzag
        w += cnt
    return out


def _restore_fixed(res: np.ndarray, warm: list[int], order: int) -> np.ndarray:
    n = len(res) + order
    s = np.empty(n, dtype=np.int64)
    s[:order] = warm
    coef = _FIXED_COEF[order]
    if order == 0:
        s[:] = res
        return s
    # sequential reconstruction; orders 1-2 via cumsum (the common path)
    if order == 1:
        s[1:] = warm[0] + np.cumsum(res)
        return s
    if order == 2:
        d = (warm[1] - warm[0]) + np.cumsum(res)  # first differences
        s[2:] = warm[1] + np.cumsum(d)
        return s
    for i in range(order, n):
        s[i] = res[i - order] + sum(
            c * s[i - 1 - j] for j, c in enumerate(coef)
        )
    return s


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC stream -> (int16 PCM, sample rate); verifies CRC-8/16 + MD5."""
    if data[:4] != b"fLaC":
        raise ValueError("flac: bad magic")
    pos = 4
    sr = bps = total = None
    md5_expect = None
    while True:
        hdr = data[pos]
        btype = hdr & 0x7F
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + length]
        if btype == 0:
            r = _BitReader(body)
            r.read(16), r.read(16), r.read(24), r.read(24)
            sr = r.read(20)
            nch = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            md5_expect = body[18:34]
        pos += 4 + length
        if hdr & 0x80:
            break
    if sr is None:
        raise ValueError("flac: missing STREAMINFO")
    if nch != 1 or bps != 16:
        raise UnsupportedCodecError(f"flac subset: {nch}ch/{bps}bps")

    r = _BitReader(data[pos:])
    chunks = []
    decoded = 0
    while decoded < total:
        frame_start = r.byte_pos()
        if r.read(14) != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        r.read(1)
        r.read(1)  # blocking strategy (both handled via coded number)
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        bps_code = r.read(3)
        r.read(1)
        if ch_code != 0:
            raise UnsupportedCodecError("flac subset: non-mono frame")
        _read_utf8_number(r)
        if bs_code == 0b0110:
            bs = r.read(8) + 1
        elif bs_code == 0b0111:
            bs = r.read(16) + 1
        else:
            bs = _BLOCKSIZE_TABLE.get(bs_code)
            if bs is None:
                raise ValueError("flac: reserved blocksize code")
        if sr_code == 0b1100:
            r.read(8)
        elif sr_code in (0b1101, 0b1110):
            r.read(16)
        elif sr_code == 0b1111:
            raise ValueError("flac: invalid sample rate code")
        hdr_bytes = data[pos + frame_start : pos + r.byte_pos()]
        if _crc8(hdr_bytes) != r.read(8):
            raise ValueError("flac: frame header CRC-8 mismatch")
        if bps_code not in (0b000, 0b100):
            raise UnsupportedCodecError("flac subset: frame bps != 16")

        if r.read(1) != 0:
            raise ValueError("flac: bad subframe pad bit")
        stype = r.read(6)
        wasted = 0
        if r.read(1):
            wasted = r.read_unary() + 1
        eff = 16 - wasted
        if stype == 0b000000:  # CONSTANT
            block = np.full(bs, _signed(r.read(eff), eff), dtype=np.int64)
        elif stype == 0b000001:  # VERBATIM
            block = np.array(
                [_signed(r.read(eff), eff) for _ in range(bs)], dtype=np.int64
            )
        elif 0b001000 <= stype <= 0b001100:  # FIXED
            order = stype & 0x07
            warm = [_signed(r.read(eff), eff) for _ in range(order)]
            res = _decode_residuals(r, bs, order)
            block = _restore_fixed(res, warm, order)
        else:
            raise UnsupportedCodecError(f"flac subset: subframe type {stype:06b}")
        if wasted:
            block <<= wasted
        r.align()
        frame_bytes = data[pos + frame_start : pos + r.byte_pos()]
        if _crc16(frame_bytes) != r.read(16):
            raise ValueError("flac: frame CRC-16 mismatch")
        chunks.append(block)
        decoded += bs
    pcm = (
        np.concatenate(chunks)[:total] if chunks else np.empty(0, np.int64)
    ).astype(np.int16)
    if md5_expect != b"\x00" * 16:
        if hashlib.md5(pcm.astype("<i2").tobytes()).digest() != md5_expect:
            raise ValueError("flac: MD5 mismatch")
    return pcm, sr
