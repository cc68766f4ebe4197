"""FLAC internals: bit IO, fixed-predictor restore (all orders), and
decoder paths the fixture encoder never emits (higher partition orders,
5-bit Rice method), exercised via hand-crafted streams."""

import numpy as np
import pytest

from intertext_ray.functions.flac import (
    _BitReader,
    _BitWriter,
    _crc8,
    _crc16,
    _FIXED_COEF,
    _decode_residuals,
    _restore_fixed,
    _utf8_number,
    _zigzag,
    decode_flac,
    encode_flac,
)


def test_bit_io_roundtrip():
    w = _BitWriter()
    vals = [(5, 3), (0, 1), (1023, 10), (0xDEADBEEF, 32), (1, 1), (77, 7)]
    for v, n in vals:
        w.write(v, n)
    w.write_unary(0)
    w.write_unary(13)
    w.write_unary(100)
    w.align()
    r = _BitReader(w.getvalue())
    for v, n in vals:
        assert r.read(n) == v
    assert r.read_unary() == 0
    assert r.read_unary() == 13
    assert r.read_unary() == 100


def test_utf8_number_roundtrip():
    for n in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10FFFF, 2**30]:
        w = _BitWriter()
        for b in _utf8_number(n):
            w.write(b, 8)
        w.align()
        from intertext_ray.functions.flac import _read_utf8_number

        assert _read_utf8_number(_BitReader(w.getvalue())) == n, n


def test_crc_known_vectors():
    # CRC-8 poly 0x07 over "123456789" is the published check value 0xF4;
    # CRC-16/BUYPASS (poly 0x8005, init 0, no reflect) check is 0xFEE8
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_restore_fixed_matches_recurrence(order):
    rng = np.random.default_rng(order)
    s_true = rng.integers(-30000, 30000, size=200).astype(np.int64)
    coef = _FIXED_COEF[order]
    res = s_true[order:].copy()
    for j, c in enumerate(coef):
        res -= c * s_true[order - 1 - j : len(s_true) - 1 - j]
    got = _restore_fixed(res, list(s_true[:order]), order)
    assert np.array_equal(got, s_true)


def _write_rice(w, zz, param, pbits):
    w.write(param, pbits)
    for v in zz:
        w.write_unary(int(v) >> param)
        w.write(int(v), param)


@pytest.mark.parametrize("method,porder", [(0, 1), (0, 2), (1, 0), (1, 3)])
def test_decode_residuals_partitions(method, porder):
    """Hand-craft a residual section with partition order > 0 and/or the
    5-bit parameter method and check the decoder reassembles it."""
    rng = np.random.default_rng(porder * 7 + method)
    bs, order = 64, 2
    res = rng.integers(-500, 500, size=bs - order)
    zz = _zigzag(res)
    w = _BitWriter()
    w.write(method, 2)
    w.write(porder, 4)
    nparts = 1 << porder
    pbits = 4 if method == 0 else 5
    pos = 0
    for part in range(nparts):
        cnt = bs // nparts - (order if part == 0 else 0)
        _write_rice(w, zz[pos : pos + cnt], 6, pbits)
        pos += cnt
    w.align()
    got = _decode_residuals(_BitReader(w.getvalue()), bs, order)
    assert np.array_equal(got, res)


def test_decode_residuals_escape_partition():
    bs, order = 32, 0
    res = np.arange(-16, 16, dtype=np.int64) * 1000
    w = _BitWriter()
    w.write(0, 2)
    w.write(0, 4)
    w.write(0b1111, 4)  # escape
    w.write(15, 5)
    for v in res:
        w.write(int(v) & 0x7FFF, 15)
    w.align()
    got = _decode_residuals(_BitReader(w.getvalue()), bs, order)
    assert np.array_equal(got, res)


def test_multi_frame_stream():
    rng = np.random.default_rng(11)
    pcm = (
        (8000 * np.sin(np.arange(10_000) / 7)).astype(np.int16)
        + rng.integers(-80, 80, 10_000).astype(np.int16)
    )
    dec, sr = decode_flac(encode_flac(pcm, 44100))
    assert sr == 44100 and np.array_equal(dec, pcm)
