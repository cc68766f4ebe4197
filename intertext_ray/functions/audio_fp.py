"""Philips-style audio subfingerprints (Haitsma & Kalker 2002, "A Highly
Robust Audio Fingerprinting System") — the audio analog of the text
pipeline's char-shingle MinHash (SURVEY.md §2; no reference analog: the
reference fingerprints transcripts only, this extends the same
shingle→bucket→verify dedup shape to the audio payload itself).

Pure-numpy, deterministic, public-algorithm implementation:

1. resample the decoded PCM to a common 8 kHz grid (linear interpolation —
   deterministic, codec/sample-rate independent);
2. frame with a Hann window (512 samples = 64 ms, hop 256 = 32 ms) and take
   the power spectrum (`numpy.fft.rfft`);
3. integrate power into ``N_BANDS`` log-spaced bands in 100–3800 Hz;
4. one 16-bit *subfingerprint* per frame boundary: bit m is the sign of the
   band-energy difference's time derivative,
   ``(E[n,m]-E[n,m+1]) - (E[n-1,m]-E[n-1,m+1]) > 0``.

Two clips of the same underlying audio (re-encoded, re-gained, mildly
noised, time-shifted by whole hops) agree on most bits: bit-error-rate
(BER) over aligned subfingerprints ~0.0-0.15, while unrelated audio sits
at ~0.5 — the verification statistic for near-dup detection.
"""

from __future__ import annotations

import numpy as np

TARGET_SR = 8000
FRAME = 512
HOP = 256
N_BANDS = 17  # 17 band edges of power -> 16 difference bits per subfp
F_LO = 100.0
F_HI = 3800.0

_BAND_EDGES_HZ = np.logspace(np.log10(F_LO), np.log10(F_HI), N_BANDS + 1)
# rfft bin k covers frequency k * sr / FRAME
_BAND_EDGE_BINS = np.clip(
    np.round(_BAND_EDGES_HZ * FRAME / TARGET_SR).astype(np.int64),
    0,
    FRAME // 2,
)
_HANN = np.hanning(FRAME)

# 16-bit popcount lookup (64 KiB, built once per process)
_POPCOUNT16 = np.array(
    [bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8
)


def resample_to(pcm: np.ndarray, sr_hz: int, target_sr: int = TARGET_SR) -> np.ndarray:
    """Linear-interpolation resample of int16/float PCM to ``target_sr``,
    normalized to float64 in [-1, 1)."""
    x = np.asarray(pcm, dtype=np.float64) / 32768.0
    if sr_hz == target_sr:
        return x
    n_out = int(round(len(x) * target_sr / sr_hz))
    if n_out < 2 or len(x) < 2:
        return np.zeros(0, dtype=np.float64)
    t_out = np.arange(n_out, dtype=np.float64) * (sr_hz / target_sr)
    return np.interp(t_out, np.arange(len(x), dtype=np.float64), x)


def subfingerprints(pcm: np.ndarray, sr_hz: int) -> np.ndarray:
    """int16 PCM -> uint32 array of 16-bit subfingerprints (one per frame
    transition; empty for clips shorter than two frames)."""
    x = resample_to(pcm, sr_hz)
    if len(x) < FRAME + HOP:
        return np.zeros(0, dtype=np.uint32)
    n_frames = 1 + (len(x) - FRAME) // HOP
    idx = np.arange(FRAME)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = x[idx] * _HANN[None, :]
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (n_frames, FRAME//2+1)
    # band energies via prefix sums over the bin axis
    csum = np.concatenate(
        [np.zeros((n_frames, 1)), np.cumsum(power, axis=1)], axis=1
    )
    e = csum[:, _BAND_EDGE_BINS[1:]] - csum[:, _BAND_EDGE_BINS[:-1]]
    d = e[:, :-1] - e[:, 1:]  # (n_frames, N_BANDS-1) spectral slope
    bits = (d[1:] - d[:-1]) > 0  # time derivative of the slope
    weights = (1 << np.arange(N_BANDS - 1, dtype=np.uint32))[None, :]
    return (bits.astype(np.uint32) * weights).sum(axis=1).astype(np.uint32)


def shingle_keys(subfps: np.ndarray, g: int = 2) -> np.ndarray:
    """uint64 LSH keys: ``g`` consecutive 16-bit subfingerprints packed
    (g <= 4).  Key i covers frames [i, i+g); len(out) = len(subfps)-g+1."""
    if len(subfps) < g:
        return np.zeros(0, dtype=np.uint64)
    out = np.zeros(len(subfps) - g + 1, dtype=np.uint64)
    for j in range(g):
        out |= subfps[j : len(subfps) - g + 1 + j].astype(np.uint64) << np.uint64(
            16 * j
        )
    return out


def ber_at_offset(
    fa: np.ndarray, fb: np.ndarray, offset: int
) -> tuple[int, float]:
    """(overlap_frames, bit error rate) aligning ``fa[i] ~ fb[i - offset]``
    — i.e. ``offset = frame_index_in_a - frame_index_in_b`` for the same
    audio instant, matching the candidate emission's (win_a - win_b)."""
    a_lo = max(0, offset)
    b_lo = a_lo - offset
    n = min(len(fa) - a_lo, len(fb) - b_lo)
    if n <= 0:
        return 0, 1.0
    x = np.bitwise_xor(
        fa[a_lo : a_lo + n].astype(np.uint32), fb[b_lo : b_lo + n].astype(np.uint32)
    )
    errs = int(_POPCOUNT16[x & 0xFFFF].sum(dtype=np.int64))
    return n, errs / (16.0 * n)


def bruteforce_dup_pairs(
    fps: dict[int, np.ndarray],
    max_offset: int = 8,
    max_ber: float = 0.25,
    min_overlap: int = 6,
) -> dict[tuple[int, int], tuple[int, float]]:
    """Single-process oracle: for every clip pair, scan all frame offsets in
    [-max_offset, max_offset] and keep the pair at its best (lowest-BER)
    qualifying alignment.  Returns {(a, b): (offset, ber)} with a < b."""
    out: dict[tuple[int, int], tuple[int, float]] = {}
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            best: tuple[int, float] | None = None
            for off in range(-max_offset, max_offset + 1):
                n, ber = ber_at_offset(fps[a], fps[b], off)
                if n >= min_overlap and ber <= max_ber:
                    if best is None or ber < best[1]:
                        best = (off, ber)
            if best is not None:
                out[(a, b)] = best
    return out


def matching_spans(
    fa: np.ndarray,
    fb: np.ndarray,
    offset: int,
    win: int = 8,
    max_ber: float = 0.2,
    min_len: int = 12,
) -> list[tuple[int, int, int, float]]:
    """Maximal aligned sub-runs where the WINDOWED bit-error-rate stays
    <= ``max_ber`` — the audio analogue of an ExactSubstr duplicated
    span (two clips sharing only a jingle/intro match here even though
    their global BER is ~0.5).  Alignment ``fa[i] ~ fb[i - offset]``,
    same convention as :func:`ber_at_offset`.

    Returns [(a_start, b_start, n_frames, span_ber)] with n_frames >=
    ``min_len``; every length-``win`` window inside a span has BER <=
    ``max_ber``.  Vectorized: one XOR/popcount pass + prefix sums.
    """
    a_lo = max(0, offset)
    b_lo = a_lo - offset
    n = min(len(fa) - a_lo, len(fb) - b_lo)
    if n < max(win, min_len):
        return []
    x = np.bitwise_xor(
        fa[a_lo : a_lo + n].astype(np.uint32),
        fb[b_lo : b_lo + n].astype(np.uint32),
    )
    errs = _POPCOUNT16[x & 0xFFFF].astype(np.int64)
    csum = np.concatenate([[0], np.cumsum(errs)])
    wsum = csum[win:] - csum[:-win]
    ok = wsum <= max_ber * 16.0 * win
    if not ok.any():
        return []
    # runs of consecutive ok window positions [i..j] cover frames [i, j+win)
    d = np.diff(ok.astype(np.int8))
    starts = np.nonzero(np.concatenate([[ok[0]], d == 1]))[0]
    ends = np.nonzero(np.concatenate([d == -1, [ok[-1]]]))[0]
    out: list[tuple[int, int, int, float]] = []
    for i, j in zip(starts, ends):
        length = int(j + win - i)
        if length < min_len:
            continue
        span_err = int(csum[j + win] - csum[i])
        out.append(
            (
                int(a_lo + i),
                int(b_lo + i),
                length,
                span_err / (16.0 * length),
            )
        )
    return out
