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


# Latin characters unidecode transliterates but NFKD cannot decompose —
# pinned to unidecode's published outputs so strip_diacritics matches it on
# the full Latin range (remaining divergence: non-Latin scripts, which
# unidecode transliterates and we pass through; documented)
_UNIDECODE_EXTRAS = str.maketrans(
    {
        "ß": "ss", "ẞ": "SS",
        "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
        "ø": "o", "Ø": "O", "đ": "d", "Đ": "D",
        "ð": "d", "Ð": "D", "þ": "th", "Þ": "Th",
        "ł": "l", "Ł": "L", "ħ": "h", "Ħ": "H",
        "ŋ": "ng", "Ŋ": "NG", "ı": "i", "ĸ": "k",
        "ſ": "s", "ť": "t", "ŧ": "t", "Ŧ": "T",
    }
)

# Greek + Cyrillic romanization (standard ELOT/GOST-style tables, applied
# after NFKD so accented forms fold to their base letter first).  This
# narrows the documented non-Latin divergence from the reference's
# ``unidecode``: outputs follow the standard romanizations and agree with
# unidecode on the common range, but byte-parity is only *guaranteed* for
# the Latin table above (unidecode itself is not importable here to pin
# against).  CJK + Arabic are handled by ``functions/translit.py``
# (applied before NFKD); only hanzi outside its pinned subset pass through.
_ROMANIZE = str.maketrans(
    {
        # Greek (lowercase / uppercase)
        "α": "a", "β": "b", "γ": "g", "δ": "d", "ε": "e", "ζ": "z",
        "η": "e", "θ": "th", "ι": "i", "κ": "k", "λ": "l", "μ": "m",
        "ν": "n", "ξ": "x", "ο": "o", "π": "p", "ρ": "r", "σ": "s",
        "ς": "s", "τ": "t", "υ": "u", "φ": "ph", "χ": "kh", "ψ": "ps",
        "ω": "o",
        "Α": "A", "Β": "B", "Γ": "G", "Δ": "D", "Ε": "E", "Ζ": "Z",
        "Η": "E", "Θ": "Th", "Ι": "I", "Κ": "K", "Λ": "L", "Μ": "M",
        "Ν": "N", "Ξ": "X", "Ο": "O", "Π": "P", "Ρ": "R", "Σ": "S",
        "Τ": "T", "Υ": "U", "Φ": "Ph", "Χ": "Kh", "Ψ": "Ps", "Ω": "O",
        # Cyrillic (lowercase / uppercase)
        "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e",
        "ж": "zh", "з": "z", "и": "i", "й": "i", "к": "k", "л": "l",
        "м": "m", "н": "n", "о": "o", "п": "p", "р": "r", "с": "s",
        "т": "t", "у": "u", "ф": "f", "х": "kh", "ц": "ts", "ч": "ch",
        "ш": "sh", "щ": "shch", "ъ": "", "ы": "y", "ь": "", "э": "e",
        "ю": "iu", "я": "ia", "ё": "e",
        "А": "A", "Б": "B", "В": "V", "Г": "G", "Д": "D", "Е": "E",
        "Ж": "Zh", "З": "Z", "И": "I", "Й": "I", "К": "K", "Л": "L",
        "М": "M", "Н": "N", "О": "O", "П": "P", "Р": "R", "С": "S",
        "Т": "T", "У": "U", "Ф": "F", "Х": "Kh", "Ц": "Ts", "Ч": "Ch",
        "Ш": "Sh", "Щ": "Shch", "Ъ": "", "Ы": "Y", "Ь": "", "Э": "E",
        "Ю": "Iu", "Я": "Ia", "Ё": "E",
    }
)


def strip_diacritics(text: str) -> str:
    """Diacritic folding (reference uses ``unidecode``,
    ``intertext/intertext.py:1143-1144``; unidecode is not in this
    environment, so we pin an explicit table for the non-decomposable Latin
    characters — matching unidecode's outputs — then romanize CJK/Arabic
    (``functions/translit.py``: full Arabic block, full kana, algorithmic
    Hangul, a pinned high-frequency hanzi subset — BEFORE NFKD, which
    would otherwise split voiced kana / Hangul syllables), followed by
    NFKD + combining-mark strip, then Greek/Cyrillic romanization via the
    standard tables in ``_ROMANIZE``.  Remaining divergence: hanzi outside
    the pinned subset pass through, and the non-Latin romanizations are
    standard-table-close to unidecode but not pinned byte-exact (see
    translit.py's header for the documented choices); only matters when
    ``strip_diacritics=True``)."""
    from intertext_ray.functions.translit import romanize_cjk_arabic

    text = text.translate(_UNIDECODE_EXTRAS)
    text = romanize_cjk_arabic(text)
    folded = "".join(
        c for c in unicodedata.normalize("NFKD", text) if not unicodedata.combining(c)
    )
    return folded.translate(_ROMANIZE)


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


def window_page_map(
    markup: str,
    slide_length: int = 4,
    xml_page_tag: str | None = None,
    xml_page_attr: str | None = None,
) -> dict[int, str] | None:
    """Window-id -> page-id map for XML inputs (reference N10
    ``get_window_map``, ``intertext/intertext.py:1192-1237``): the document
    is split at ``<tag ``/``<tag/>`` boundaries (lowercased, string ops —
    same as the reference), each page's id comes from ``xml_page_attr``,
    else from text between the page tags, else the sequential page index;
    window ids advance every ``slide_length`` words CONTINUOUSLY across
    pages (per-page word index, reference quirk preserved: a window
    straddling a break maps to the later page, content before the first
    page tag is skipped).  Returns None when ``xml_page_tag`` is unset.

    Tag stripping uses :func:`extract_xml_text`'s regex engine in place of
    the reference's BeautifulSoup (bs4 absent here — documented S3
    divergence)."""
    if not xml_page_tag:
        return None
    tag = xml_page_tag.lower()
    attr = xml_page_attr.lower() if xml_page_attr else None
    f = markup.lower()
    pagebreak = "\x00_$pb$_\x00"  # deterministic stand-in for the
    # reference's random sentinel (never occurs in text)
    f = f.replace(f"<{tag} ", pagebreak)
    f = f.replace(f"<{tag}/>", pagebreak)
    pages = f.split(pagebreak)
    d: dict[int, str] = {}
    window_id = 0
    for page_index, page in enumerate(pages[1:]):
        if attr:
            head = page.split(">")[0]
            parts = head.split(f"{attr}=")
            page_id = parts[1].split(" ")[0] if len(parts) > 1 else ""
            page_id = page_id.replace('"', "").replace("'", "").rstrip("/>")
        elif f"</{tag}" in page:
            page_id = page.split(f"</{tag}")[0]
            if ">" in page_id:
                page_id = page_id.split(">")[1]
        else:
            page_id = page_index
        page_id = str(page_id).strip()
        body = ">".join(page.split(">")[1:])
        words = extract_xml_text(body).split()
        for word_index in range(len(words)):
            if word_index and (word_index % slide_length == 0):
                window_id += 1
            d[window_id] = page_id
    return d


def substitute_page_url(
    url: str,
    window_pages: dict[int, str] | None,
    first_window: int | None,
) -> str:
    """Reference N9 ``get_url`` (``intertext/intertext.py:632-635``): when a
    page map exists, ``$PAGE_ID`` in the metadata url is replaced with the
    page of the cluster's first window; otherwise the url passes through."""
    if window_pages is None:
        return url
    return url.replace(
        "$PAGE_ID",
        window_pages.get(int(first_window), "") if first_window is not None else "",
    )


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
