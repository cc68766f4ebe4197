"""Verification similarity — the reference's exact metric.

``get_string_sim`` (``/root/reference/intertext/intertext.py:1261-1263``) is
``difflib.SequenceMatcher(None, a, b, autojunk=False).ratio() * 100``; the
stored match similarity is ``int(sim)`` (``intertext/intertext.py:495-509``).
difflib is the correctness anchor (SURVEY.md §2.8 F1) — "faster equivalents"
(rapidfuzz etc.) score differently on some inputs, and by the time this runs
LSH has already thinned the candidate set, so we keep difflib itself.

The junk filter (``intertext/intertext.py:497-501``) drops a match when
either window has >= 0.75*window_length single-character words.
"""

from __future__ import annotations

from difflib import SequenceMatcher


def string_sim(a: str, b: str) -> float:
    """difflib ratio * 100 (float; callers int-cast for storage)."""
    return SequenceMatcher(None, a, b, autojunk=False).ratio() * 100


def is_junk_window(text: str, window_length: int = 14, frac: float = 0.75) -> bool:
    singles = sum(1 for w in text.split() if len(w) == 1)
    return singles >= window_length * frac


def verify_pair(
    text_a: str,
    text_b: str,
    min_sim: int = 50,
    window_length: int = 14,
    junk_frac: float = 0.75,
) -> int | None:
    """Return int similarity if the pair is a validated match, else None."""
    sim = string_sim(text_a, text_b)
    if sim < min_sim:
        return None
    if is_junk_window(text_a, window_length, junk_frac) or is_junk_window(
        text_b, window_length, junk_frac
    ):
        return None
    return int(sim)


_MISS = object()


class BatchVerifier:
    """Vector verifier with EXACT-semantics accelerations over naive
    per-pair difflib (scores identical to the reference, only work is saved):

    - memoized distinct (a, b) text pairs and per-text junk flags — candidate
      sets repeat window texts heavily;
    - one ``SequenceMatcher`` with ``set_seq2`` reuse — difflib precomputes
      the b-side index once per distinct b (pairs are processed sorted by b);
    - difflib's own ``real_quick_ratio``/``quick_ratio`` cascade — both are
      documented UPPER BOUNDS on ``ratio``, so rejecting when the bound is
      already below ``min_sim`` never changes the result; identical strings
      short-circuit to 100;
    - ``verify_arrow`` (round 5, VERDICT r4 #3) lifts the identical / junk /
      real_quick / quick checks OUT of the per-pair Python loop into numpy
      over the whole batch — quick_ratio's char-multiset bound becomes one
      ``np.minimum(Ca, Cb).sum(axis=1)`` over per-distinct-text bincount
      rows (ASCII fast path; non-ASCII texts fall back to difflib's own
      cascade in the loop) — so the Python loop runs ``ratio()`` and the
      memo only.  Bound arithmetic is the same IEEE ``2.0*M/T`` as
      difflib's ``_calculate_ratio``, so accept/reject decisions are
      bit-identical (pinned by ``test_verify_arrow_parity``).
    """

    def __init__(self, min_sim: int = 50, window_length: int = 14,
                 junk_frac: float = 0.75):
        self.min_sim = min_sim
        self.window_length = window_length
        self.junk_frac = junk_frac
        self._pair_memo: dict[tuple[str, str], int | None] = {}
        self._junk_memo: dict[str, bool] = {}

    def _junk(self, t: str) -> bool:
        j = self._junk_memo.get(t)
        if j is None:
            j = is_junk_window(t, self.window_length, self.junk_frac)
            self._junk_memo[t] = j
        return j

    def verify_many(self, texts_a: list[str], texts_b: list[str]) -> list[int | None]:
        n = len(texts_a)
        out: list[int | None] = [None] * n
        order = sorted(range(n), key=lambda i: texts_b[i])
        sm = SequenceMatcher(None, autojunk=False)
        last_b: str | None = None
        memo = self._pair_memo
        for i in order:
            a, b = texts_a[i], texts_b[i]
            key = (a, b)
            if key in memo:
                out[i] = memo[key]
                continue
            if self._junk(a) or self._junk(b):
                memo[key] = None
                continue
            if a == b:
                sim = 100
            else:
                if b is not last_b:
                    sm.set_seq2(b)
                    last_b = b
                sm.set_seq1(a)
                if sm.real_quick_ratio() * 100 < self.min_sim:
                    memo[key] = None
                    continue
                if sm.quick_ratio() * 100 < self.min_sim:
                    memo[key] = None
                    continue
                r = sm.ratio() * 100
                if r < self.min_sim:
                    memo[key] = None
                    continue
                sim = int(r)
            if sim < self.min_sim:
                memo[key] = None
                continue
            memo[key] = sim
            out[i] = sim
        return out

    def verify_arrow(self, arr_a, arr_b):
        """Vectorized verify over two Arrow string arrays.  Returns an
        int32 numpy array of similarities with -1 for rejected pairs —
        decision-identical to ``verify_many`` (same memo, same difflib
        cascade semantics), with the bound checks batched in numpy."""
        import numpy as np

        n = len(arr_a)
        out = np.full(n, -1, np.int32)
        if n == 0:
            return out
        ta = arr_a.to_pylist()
        tb = arr_b.to_pylist()

        import pandas as pd

        codes, uniques = pd.factorize(
            np.array(ta + tb, dtype=object), sort=False
        )
        ia, ib = codes[:n], codes[n:]
        uniq = uniques.tolist()
        nu = len(uniq)

        junk = np.fromiter((self._junk(t) for t in uniq), bool, nu)
        ulen = np.fromiter((len(t) for t in uniq), np.int64, nu)
        la, lb = ulen[ia], ulen[ib]
        T = la + lb
        alive = ~(junk[ia] | junk[ib])

        # identical texts (same factorize code) short-circuit to 100 —
        # difflib ratio of equal strings is 1.0
        ident = alive & (ia == ib) & (ulen[ia] > 0)
        out[ident] = 100
        alive &= ~ident
        # two empty strings: ratio is defined 1.0 by _calculate_ratio
        both_empty = alive & (T == 0)
        out[both_empty] = 100
        alive &= ~both_empty

        # real_quick_ratio bound: 2*min(la,lb)/T — same float ops as difflib
        rq = (2.0 * np.minimum(la, lb)) / np.maximum(T, 1)
        alive &= ~(rq * 100 < self.min_sim)

        # quick_ratio bound via per-distinct-text char bincounts (ASCII
        # fast path; non-ASCII / very long texts take difflib's own
        # cascade inside the loop below)
        if alive.any():
            C = np.zeros((nu, 256), np.uint16)
            plain = np.zeros(nu, bool)
            for i, t in enumerate(uniq):
                if len(t) > 60000:
                    continue
                b = t.encode("utf-8")
                if len(b) != len(t):
                    continue
                plain[i] = True
                C[i] = np.bincount(
                    np.frombuffer(b, np.uint8), minlength=256
                ).astype(np.uint16)
            fast = alive & plain[ia] & plain[ib]
            idx = np.flatnonzero(fast)
            if len(idx):
                M = np.minimum(C[ia[idx]], C[ib[idx]]).sum(
                    axis=1, dtype=np.int64
                )
                qr = (2.0 * M) / T[idx]
                alive[idx[qr * 100 < self.min_sim]] = False
            bounded = fast  # pairs whose bounds are fully pre-checked
        else:
            bounded = np.zeros(n, bool)

        # the lean loop: memo + set_seq2 reuse + ratio() on survivors only
        surv = np.flatnonzero(alive)
        if len(surv) == 0:
            return out
        order = surv[np.argsort(ib[surv], kind="stable")]
        sm = SequenceMatcher(None, autojunk=False)
        last_ib = -1
        memo = self._pair_memo
        min_sim = self.min_sim
        for i in order:
            a, b = ta[i], tb[i]
            hit = memo.get((a, b), _MISS)
            if hit is not _MISS:
                if hit is not None:
                    out[i] = hit
                continue
            cur_ib = ib[i]
            if cur_ib != last_ib:
                sm.set_seq2(b)
                last_ib = cur_ib
            sm.set_seq1(a)
            if not bounded[i]:
                if sm.real_quick_ratio() * 100 < min_sim:
                    memo[(a, b)] = None
                    continue
                if sm.quick_ratio() * 100 < min_sim:
                    memo[(a, b)] = None
                    continue
            r = sm.ratio() * 100
            if r < min_sim:
                memo[(a, b)] = None
                continue
            sim = int(r)
            memo[(a, b)] = sim
            out[i] = sim
        return out
