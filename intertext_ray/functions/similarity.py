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
