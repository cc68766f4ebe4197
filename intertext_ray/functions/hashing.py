"""Deterministic, vectorized hashing kernels shared by the Ray engine and the
single-process oracle.

The reference delegates char-shingle hashing + MinHash to the external
``vectorizedMinHash`` package (``/root/reference/setup.py:27-31``, used at
``intertext/intertext.py:385-386``) whose exact constants are not vendored in
the repo; parity is therefore defined against *our* pinned permutation family
(SURVEY.md §7.1).  Everything here is pure numpy uint64 arithmetic — no Python
``hash()``, no RNG state — so signatures are byte-identical across processes,
partitions and machines.

Family: per-permutation seed s_i derived by a splitmix64 chain from
``hash_seed``; h_i(gram) = splitmix64(gram ^ s_i); signature value =
top-32-bits of the min (uint32).  ``mirror=True`` doubles the signature width
from the same seeds via the complement trick: sig[n_half+i] = min(~h_i) =
~max(h_i) (matching the spirit of VectorizedMinHash(mirror=True),
``intertext/intertext.py:104``).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_GAMMA = _U64(0x9E3779B97F4A7C15)
_M1 = _U64(0xBF58476D1CE4E5B9)
_M2 = _U64(0x94D049BB133111EB)
_MAX64 = _U64(0xFFFFFFFFFFFFFFFF)

# numpy wraps integer overflow silently for unsigned dtypes — that wrap IS the
# mod-2^64 arithmetic splitmix64 is defined over.
_err = np.seterr(over="ignore")


def splitmix64(x: np.ndarray | int) -> np.ndarray | np.uint64:
    """Vectorized splitmix64 finalizer over uint64 (wrapping) arithmetic."""
    z = np.asarray(x, dtype=_U64) + _GAMMA
    z = (z ^ (z >> _U64(30))) * _M1
    z = (z ^ (z >> _U64(27))) * _M2
    z = z ^ (z >> _U64(31))
    return z if z.ndim else _U64(z)


def perm_seeds(n_half: int, seed: int) -> np.ndarray:
    """The pinned per-permutation seeds: splitmix64 over a seeded counter."""
    idx = np.arange(1, n_half + 1, dtype=_U64) * _GAMMA
    return splitmix64(idx ^ _U64(seed))


def chargram_values(data: np.ndarray, n: int = 4) -> np.ndarray:
    """uint8 byte array -> uint64 array of little-endian n-byte gram values.

    One value per sliding position (len-n+1 of them).  Inputs shorter than
    ``n`` are zero-padded to ``n`` (single gram).
    """
    a = np.asarray(data, dtype=np.uint8)
    if len(a) < n:
        a = np.concatenate([a, np.zeros(n - len(a), dtype=np.uint8)])
    w = np.lib.stride_tricks.sliding_window_view(a, n).astype(_U64)
    shifts = (np.arange(n, dtype=_U64) * _U64(8))[None, :]
    return (w << shifts).sum(axis=1, dtype=_U64)


def minhash_concat(
    buf: np.ndarray,
    offsets: np.ndarray,
    seeds: np.ndarray,
    chargram_length: int = 4,
    mirror: bool = True,
) -> np.ndarray:
    """Batch MinHash over a concatenation of window byte strings.

    Args:
        buf: uint8 array — all windows' (lowercased, encoded) bytes
            concatenated.
        offsets: int64 array of length n_windows+1 — window w occupies
            ``buf[offsets[w]:offsets[w+1]]``.  Every window must be non-empty.
        seeds: uint64 seeds from :func:`perm_seeds` (length n_half).
        mirror: emit 2*n_half signature values via the complement trick.

    Returns:
        (n_windows, n_perm) uint32 signature matrix; columns [0, n_half) are
        the min-hashes, [n_half, 2*n_half) the mirrored (complement) halves.
    """
    n = chargram_length
    offsets = np.asarray(offsets, dtype=np.int64)
    n_win = len(offsets) - 1
    n_half = len(seeds)
    n_perm = 2 * n_half if mirror else n_half
    sig = np.empty((n_win, n_perm), dtype=np.uint32)
    if n_win == 0:
        return sig
    lengths = np.diff(offsets)
    if (lengths < n).any():
        # pad the rare short window out-of-line (windows are >= 14 words so
        # this only happens in adversarial unit tests)
        parts = []
        new_off = [0]
        for w in range(n_win):
            seg = buf[offsets[w] : offsets[w + 1]]
            if len(seg) < n:
                seg = np.concatenate([seg, np.zeros(n - len(seg), dtype=np.uint8)])
            parts.append(seg)
            new_off.append(new_off[-1] + len(seg))
        buf = np.concatenate(parts)
        offsets = np.asarray(new_off, dtype=np.int64)

    # gram values over the whole buffer; grams that span a window boundary are
    # masked out of both the min and the max reductions.
    grams = chargram_values(buf, n)  # len(buf)-n+1 values
    total = len(grams)
    # window w's own grams occupy [offsets[w], offsets[w+1]-n+1); positions
    # [offsets[w+1]-n+1, offsets[w+1]) (for w < last) span into window w+1.
    starts = offsets[:-1].copy()
    starts[0] = 0
    mask = np.zeros(total, dtype=bool)
    for w in range(n_win - 1):
        mask[offsets[w + 1] - n + 1 : offsets[w + 1]] = True
    mask_idx = np.nonzero(mask)[0]

    red_starts = offsets[:-1]
    for i in range(n_half):
        h = splitmix64(grams ^ seeds[i])
        if len(mask_idx):
            hmin = h.copy()
            hmin[mask_idx] = _MAX64
        else:
            hmin = h
        sig[:, i] = (np.minimum.reduceat(hmin, red_starts) >> _U64(32)).astype(
            np.uint32
        )
        if mirror:
            if len(mask_idx):
                hmax = h.copy()
                hmax[mask_idx] = _U64(0)
            else:
                hmax = h
            sig[:, n_half + i] = (
                (~np.maximum.reduceat(hmax, red_starts)) >> _U64(32)
            ).astype(np.uint32)
    return sig


def band_keys(
    sig: np.ndarray, hashband_length: int = 4, hashband_step: int = 3, seed: int = 0
) -> np.ndarray:
    """(n_windows, n_perm) uint32 signatures -> (n_windows, n_bands) uint64 keys.

    Overlapping bands exactly as the reference extracts them
    (``intertext/intertext.py:367-372``): n-grams of ``hashband_length``
    consecutive signature values keeping every ``hashband_step``-th.  Like the
    reference's dotted-string key, the band *position is NOT part of the key*
    — equal value-tuples at different offsets collide (candidate superset
    safety, SURVEY.md §2.11).  Key = splitmix64 chain over the 4 values.
    """
    sig = np.asarray(sig)
    n_perm = sig.shape[1]
    starts = np.arange(0, n_perm - hashband_length + 1, hashband_step)
    acc = np.full((sig.shape[0], len(starts)), _U64(seed) ^ _GAMMA, dtype=_U64)
    for off in range(hashband_length):
        vals = sig[:, starts + off].astype(_U64)
        acc = splitmix64(acc ^ vals)
    return acc


def hash_pack_pair(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pack two uint32-ranged int arrays into one uint64 key (a<<32 | b)."""
    return (np.asarray(a, dtype=_U64) << _U64(32)) | np.asarray(b, dtype=_U64)


def lowered_utf8_buffer(texts) -> tuple[np.ndarray, np.ndarray]:
    """Lowercase a batch of window texts and expose the concatenated utf-8
    bytes + offsets, zero-copy from the Arrow string buffers.

    The SAME kernel (pyarrow ``utf8_lower``) is used by the Ray engine and
    the oracle, so case-folding semantics can never diverge between them
    (the reference lowercases per window, ``intertext/intertext.py:385``).
    Accepts a list[str], pa.Array or pa.ChunkedArray.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(list(texts), pa.string())
    arr = pc.utf8_lower(texts)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    base = offsets[0]
    return data[base : offsets[-1]], offsets - base


def minhash_texts(
    texts,
    seeds: np.ndarray,
    chargram_length: int = 4,
    mirror: bool = True,
) -> np.ndarray:
    """Window texts -> (n, n_perm) uint32 signatures (lowercase + encode +
    char-4-gram hash + min, all vectorized)."""
    buf, offsets = lowered_utf8_buffer(texts)
    return minhash_concat(buf, offsets, seeds, chargram_length, mirror)
