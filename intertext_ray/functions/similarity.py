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


class BatchVerifier:
    """Vector verifier with three EXACT-semantics accelerations over naive
    per-pair difflib (scores identical to the reference, only work is saved):

    - memoized distinct (a, b) text pairs and per-text junk flags — candidate
      sets repeat window texts heavily;
    - one ``SequenceMatcher`` with ``set_seq2`` reuse — difflib precomputes
      the b-side index once per distinct b (pairs are processed sorted by b);
    - difflib's own ``real_quick_ratio``/``quick_ratio`` cascade — both are
      documented UPPER BOUNDS on ``ratio``, so rejecting when the bound is
      already below ``min_sim`` never changes the result; identical strings
      short-circuit to 100.
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
