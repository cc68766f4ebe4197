"""Tokenization / windowing kernels (reference semantics).

Mirrors ``get_words`` / ``get_windows`` of the reference
(``/root/reference/intertext/intertext.py:1133-1158, 1180-1189``): whitespace
``str.split()`` tokenization, sliding ``window_length``-word shingles keeping
every ``slide_length``-th, ``window_id`` = index in the kept list (word offset
= window_id * slide_length), window text = space-join.  Documents shorter than
``window_length`` words produce zero windows.
"""

from __future__ import annotations

import unicodedata

import numpy as np


def strip_diacritics(text: str) -> str:
    """Diacritic folding (reference uses ``unidecode``,
    ``intertext/intertext.py:1143-1144``; unidecode is not in this
    environment, so we pin NFKD + combining-mark strip — a documented
    divergence that only matters when ``strip_diacritics=True``)."""
    return "".join(
        c for c in unicodedata.normalize("NFKD", text) if not unicodedata.combining(c)
    )


def tokenize(text: str, fold_diacritics: bool = False) -> list[str]:
    """Whitespace word split (reference ``get_words`` matching path)."""
    if fold_diacritics:
        text = strip_diacritics(text)
    return text.split()


def window_texts(
    words: list[str], window_length: int = 14, slide_length: int = 4
) -> list[str]:
    """All kept sliding windows; index in the returned list IS window_id."""
    n = len(words)
    if n < window_length:
        return []
    return [
        " ".join(words[i : i + window_length])
        for i in range(0, n - window_length + 1, slide_length)
    ]


def windowize_texts(
    texts: list[str],
    window_length: int = 14,
    slide_length: int = 4,
    fold_diacritics: bool = False,
) -> tuple[np.ndarray, np.ndarray, list[str]]:
    """Batch windowizer: texts -> (row_index, window_id, window_text).

    Returns parallel arrays: ``row_index[j]`` is the input row that produced
    window j, ``window_id[j]`` its per-document id, ``texts_out[j]`` its text.
    """
    row_idx: list[int] = []
    win_id: list[int] = []
    out: list[str] = []
    for r, t in enumerate(texts):
        ws = window_texts(
            tokenize(t, fold_diacritics), window_length, slide_length
        )
        if not ws:
            continue
        row_idx.extend([r] * len(ws))
        win_id.extend(range(len(ws)))
        out.extend(ws)
    return (
        np.asarray(row_idx, dtype=np.int64),
        np.asarray(win_id, dtype=np.int32),
        out,
    )


def extract_xml_text(
    markup: str,
    base_tag: str | None = None,
    remove_tags: tuple[str, ...] = (),
) -> str:
    """XML/HTML text extraction (reference S3 ``get_soup``,
    ``intertext/intertext.py:1166-1177``, which uses BeautifulSoup; bs4 is
    not in this environment, so this is a regex equivalent: keep the subtree
    under ``base_tag``, drop ``remove_tags`` subtrees, strip all tags,
    unescape entities).  Only used when the corpus front end is XML."""
    import html
    import re

    s = markup
    if base_tag:
        m = re.search(
            rf"<{base_tag}\b[^>]*>(.*?)</{base_tag}>", s, re.S | re.I
        )
        s = m.group(1) if m else ""
    for tag in remove_tags:
        s = re.sub(rf"<{tag}\b[^>]*>.*?</{tag}>", " ", s, flags=re.S | re.I)
        s = re.sub(rf"<{tag}\b[^>]*/>", " ", s, flags=re.I)
    s = re.sub(r"<[^>]+>", " ", s)
    return html.unescape(s)


def display_words(text: str) -> list[str]:
    """Display-variant word list (reference ``get_words(display=True)``,
    ``intertext/intertext.py:1146-1156``): newlines become ``<br/>`` suffixes
    on the preceding word, capped at two consecutive."""
    NEWLINE = "__NEWLINE__"
    l = text.replace("\n", " " + NEWLINE + " ").split()
    formatted: list[str] = []
    for w in l:
        if w == NEWLINE:
            if formatted and not formatted[-1].endswith("<br/><br/>"):
                formatted[-1] += "<br/>"
        else:
            formatted.append(w)
    return formatted


def get_sequences(window_ids) -> list[list[int]]:
    """Maximal runs of consecutive ints (reference ``get_sequences``,
    ``intertext/intertext.py:670-678``)."""
    sequences: list[list[int]] = []
    for i in sorted(set(int(x) for x in window_ids)):
        if not sequences or sequences[-1][-1] != i - 1:
            sequences.append([])
        sequences[-1].append(i)
    return sequences
