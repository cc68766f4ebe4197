"""Vectorized suffix-array construction and neighbor-LCP computation.

The north-star names three near-dup families: MinHash, SimHash, and
suffix-array substring (Lee et al. 2021, "Deduplicating Training Data
Makes Language Models Better" — the ExactSubstr dedup).  This module is
the suffix-array leg: a numpy prefix-doubling suffix array (Manber-Myers,
O(n log^2 n), every step a lexsort/cumsum over the whole array — no
per-suffix Python) plus a banded neighbor-LCP that answers the only
question substring dedup asks: "does suffix i share a prefix of >= L
with its sorted neighbor?"  (capping LCP extension at L keeps each of
the <= L rounds fully vectorized over still-active pairs).

Used per co-grouped partition by ``ops.substring.suffix_repeat_spans``;
the cross-partition global equivalent at a fixed threshold L is the
L-gram groupby in ``ops.substring.duplicate_spans`` — globally sorting
length-L-truncated suffixes IS grouping L-grams, which is how the
single-machine suffix array of the reference approach distributes.
"""

from __future__ import annotations

import numpy as np


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of an integer sequence by prefix doubling.

    Returns ``sa`` with ``sa[r]`` = start index of the rank-``r`` suffix
    in lexicographic order.  Element values are compared as integers
    (callers pass rank-compressed token ids), shorter-is-smaller on
    prefix ties (standard suffix order: out-of-range compares below any
    symbol).
    """
    s = np.asarray(s)
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    _, rank = np.unique(s, return_inverse=True)
    rank = rank.astype(np.int64)
    k = 1
    sa = np.argsort(rank, kind="stable").astype(np.int64)
    while rank[sa[-1]] != n - 1:
        rank2 = np.full(n, -1, dtype=np.int64)
        rank2[: n - k] = rank[k:]
        sa = np.lexsort((rank2, rank)).astype(np.int64)
        r1, r2 = rank[sa], rank2[sa]
        changed = np.ones(n, dtype=np.int64)
        changed[1:] = ((r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])).astype(
            np.int64
        )
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[sa] = np.cumsum(changed) - 1
        rank = new_rank
        k *= 2
    return sa


def neighbor_lcp(s: np.ndarray, sa: np.ndarray, cap: int) -> np.ndarray:
    """``lcp[r]`` = length of the common prefix of the rank-``r`` and
    rank-``r+1`` suffixes, truncated at ``cap``.

    Vectorized by extension depth: round ``d`` compares position ``d`` of
    every still-matching neighbor pair at once, so the work is
    O(sum min(lcp, cap)) with <= ``cap`` numpy passes and no per-pair
    Python.  ``cap`` is the duplication threshold L — substring dedup
    never needs to know an LCP more precisely than ">= L".
    """
    s = np.asarray(s)
    n = len(sa)
    lcp = np.zeros(max(n - 1, 0), dtype=np.int64)
    if n < 2 or cap <= 0:
        return lcp
    i = np.asarray(sa[:-1], dtype=np.int64)
    j = np.asarray(sa[1:], dtype=np.int64)
    active = np.arange(n - 1, dtype=np.int64)
    d = 0
    while len(active) and d < cap:
        ii = i[active] + d
        jj = j[active] + d
        in_range = (ii < len(s)) & (jj < len(s))
        act = active[in_range]
        eq = s[i[act] + d] == s[j[act] + d]
        matched = act[eq]
        lcp[matched] += 1
        active = matched
        d += 1
    return lcp


def repeat_mask(s: np.ndarray, min_len: int) -> np.ndarray:
    """Boolean mask over positions of ``s``: True where the length-
    ``min_len`` substring starting there occurs >= 2 times in ``s``.

    A position's best match is always a sorted-order neighbor, so
    position ``p`` (at rank ``r``) starts a duplicated ``min_len``-gram
    iff ``max(lcp[r-1], lcp[r]) >= min_len``.
    """
    s = np.asarray(s)
    n = len(s)
    out = np.zeros(n, dtype=bool)
    if n < min_len or min_len <= 0:
        return out
    sa = suffix_array(s)
    lcp = neighbor_lcp(s, sa, cap=min_len)
    best = np.zeros(n, dtype=np.int64)
    if n > 1:
        np.maximum(best[:-1], lcp, out=best[:-1])
        np.maximum(best[1:], lcp, out=best[1:])
    hit = best >= min_len
    out[sa[hit]] = True
    # a gram must fit: start positions beyond n - min_len can't host one
    out[n - min_len + 1 :] = False
    return out
