"""End-to-end corpus curation — the composed filter chain a pre-training
data pipeline runs before tokenization: language gate, quality gates
(length / lexical diversity / stopword ratio), then exact-dedup survivor
selection over what remains.

Scale shape: the cheap per-row gates run FIRST so the only exchange (the
content-hash bucket groupby inside
:func:`intertext_ray.ops.exact_dedup.exact_dedup`) moves already-thinned
rows; the gates themselves are one vectorized pass that never shuffles.
Signals are the integer-scaled columns of
:func:`intertext_ray.ops.text_stats.quality_scores_batch`, so every
threshold is exact-integer comparable with the DuckDB twin.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from intertext_ray.ops.exact_dedup import exact_dedup
from intertext_ray.ops.text_stats import quality_scores_batch


def curate_corpus(
    docs: ray.data.Dataset,
    lang: str | None = "en",
    min_tokens: int = 20,
    min_ttr_x1000: int = 300,
    max_stopword_x1000: int = 500,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Surviving docs after language -> quality -> exact-dedup curation.

    Input needs (doc_id, text, lang).  Returns one row per kept doc:
    (doc_id, n_tokens, ttr_x1000, stopword_x1000).  Among identical texts
    that pass the gates, the minimum doc_id survives (exact_dedup policy).
    """
    if lang is not None:
        docs = docs.filter(expr=f"lang == '{lang}'")

    def gate(batch: pa.Table) -> pa.Table:
        s = quality_scores_batch(batch)
        nt = s["n_tokens"].to_numpy(zero_copy_only=False)
        ttr = s["ttr_x1000"].to_numpy(zero_copy_only=False)
        sw = s["stopword_x1000"].to_numpy(zero_copy_only=False)
        keep = pa.array(
            (nt >= min_tokens)
            & (ttr >= min_ttr_x1000)
            & (sw <= max_stopword_x1000)
        )
        kept, sk = batch.filter(keep), s.filter(keep)
        return pa.table(
            {
                "doc_id": sk["doc_id"],
                "text": kept["text"],
                "n_tokens": sk["n_tokens"],
                "ttr_x1000": sk["ttr_x1000"],
                "stopword_x1000": sk["stopword_x1000"],
            }
        )

    gated = docs.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)
    return exact_dedup(gated, num_buckets=num_buckets).drop_columns(["text"])


def blocklist_report(
    docs: ray.data.Dataset,
    blocked_words: list[str],
    text_col: str = "text",
) -> ray.data.Dataset:
    """(doc_id, n_tokens, n_blocked, kept) — the C4-style lexicon gate:
    a doc is dropped (``kept = False``) when ANY whitespace token,
    lowercased, is in the blocklist (C4 applied the same policy with the
    "List of Dirty, Naughty, Obscene..." lexicon; the list here is a
    caller-supplied parameter).

    Scale shape: the lexicon is broadcast once via ``ray.put`` (eval-side
    data is lexicon-sized by nature, same justification as
    ``decontam.decontaminate``); the corpus side is one vectorized pass —
    ``utf8_split_whitespace`` -> ``utf8_lower`` -> ``is_in`` against the
    broadcast value set -> per-doc bincount.  Row-local, zero shuffles at
    any corpus size.

    Token contract matches :func:`text_stats.token_counts` /
    the ``word_counts`` chain (str.split() semantics), and the match is
    on the WHOLE token ("spark," != "spark").  The DuckDB twin mirrors
    str.split() by regexp-splitting on ``\\s+`` and dropping empty
    tokens; as elsewhere in the repo the whitespace *class* is the
    ASCII/Unicode set Arrow's ``utf8_split_whitespace`` recognizes —
    exotic Unicode spaces outside both engines' common set are the
    documented caveat, not a contract guarantee.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray

    from intertext_ray.ops.text_stats import _flat_tokens

    lex_ref = ray.put(
        pa.array(sorted({w.lower() for w in blocked_words}), pa.string())
    )

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        flat, dix, n = _flat_tokens(texts)
        hit = np.asarray(
            pc.is_in(
                pc.utf8_lower(flat), value_set=ray.get(lex_ref)
            ).to_numpy(zero_copy_only=False),
            dtype=bool,
        )
        n_blocked = np.bincount(
            dix[hit], minlength=len(texts)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "n_blocked": pa.array(n_blocked, pa.int64()),
                "kept": pa.array(n_blocked == 0),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def quality_topk_per_source(
    docs: ray.data.Dataset,
    k: int = 5,
    source_col: str = "source",
) -> ray.data.Dataset:
    """(source, doc_id, stopword_x1000, n_tokens) — the k BEST documents
    per source, ranked by stopword ratio (the C4 naturalness proxy;
    higher = more natural prose), ties by token count descending then
    doc_id.  The "keep the best per domain" curation step — the
    quality-ranked sibling of `ops/sampling.stratified_sample`'s
    hash-uniform pick.

    Scale shape: same distributed top-k as stratified_sample — a
    per-batch combiner cuts every batch to k rows per source BEFORE the
    shuffle (metrics ride the rows, recomputed nowhere), so the
    per-source stage sees at most k * n_blocks rows per source, never
    the source's full membership."""
    import numpy as np

    kk = int(k)

    def topk(tbl: pa.Table) -> pa.Table:
        src = np.asarray(tbl[source_col].to_pylist(), dtype=object)
        d = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sw = tbl["stopword_x1000"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        nt = tbl["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((d, -nt, -sw, src))
        src, d, sw, nt = src[order], d[order], sw[order], nt[order]
        new = np.ones(len(src), dtype=bool)
        if len(src) > 1:
            new[1:] = src[1:] != src[:-1]
        starts = np.nonzero(new)[0]
        rank = np.arange(len(src)) - starts[np.cumsum(new) - 1]
        keep = rank < kk
        return pa.table(
            {
                source_col: pa.array(src[keep].tolist(), pa.string()),
                "doc_id": pa.array(d[keep], pa.int64()),
                "stopword_x1000": pa.array(sw[keep], pa.int64()),
                "n_tokens": pa.array(nt[keep], pa.int64()),
            }
        )

    def score(b: pa.Table) -> pa.Table:
        q = quality_scores_batch(b)
        return topk(
            pa.table(
                {
                    source_col: b[source_col],
                    "doc_id": q["doc_id"],
                    "stopword_x1000": q["stopword_x1000"],
                    "n_tokens": q["n_tokens"],
                }
            )
        )

    combined = docs.select_columns(
        ["doc_id", "text", source_col]
    ).map_batches(score, batch_format="pyarrow")
    return combined.groupby(source_col).map_groups(
        topk, batch_format="pyarrow"
    )


def length_outliers(
    docs: ray.data.Dataset,
    k: int = 3,
    len_col: str = "n_chars",
    source_col: str = "source",
) -> ray.data.Dataset:
    """Per-source robust length-outlier gate: flag documents whose length
    sits more than ``k`` MADs from their source's median length — the
    standard scale-free way to catch truncated fragments and
    concatenation blowups WITHOUT a global magic length threshold (each
    domain has its own natural length profile).

    Integer contract (twin-exact): median and MAD are the DISCRETE lower
    medians — ``sorted(x)[(n-1)//2]`` — matching DuckDB
    ``quantile_disc(x, 0.5)`` element-for-element, so every emitted
    column is an exact integer and ``is_outlier = |len - med| > k * mad``
    is decidable identically on both sides.

    Scale shape: phase 1 ships ONLY (source, length) into a per-source
    groupby — int64 pairs, no text moves; the resulting per-source
    (median, MAD) table is source-cardinality-sized (domains ≪ docs at
    any scale), broadcast once via ``ray.put``; phase 2 flags rows
    locally.  Partitioning assumption: one source's lengths fit one
    group task (int64 per doc; a 10^9-doc source is 8 GB — shard such a
    source upstream or switch the median to the DDSketch quantile in
    `ops/sketches` and accept approximation; documented trade)."""
    import numpy as np
    import ray

    kk = int(k)

    def med_mad(tbl: pa.Table) -> pa.Table:
        x = tbl[len_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = np.sort(x)
        med = int(x[(len(x) - 1) // 2])
        dev = np.sort(np.abs(x - med))
        mad = int(dev[(len(dev) - 1) // 2])
        return pa.table(
            {
                source_col: pa.array([tbl[source_col][0].as_py()]),
                "med": pa.array([med], pa.int64()),
                "mad": pa.array([mad], pa.int64()),
            }
        )

    stats = (
        docs.select_columns([source_col, len_col])
        .groupby(source_col)
        .map_groups(med_mad, batch_format="pyarrow")
        .to_pandas()
    )
    lut_ref = ray.put(
        {
            r[source_col]: (int(r["med"]), int(r["mad"]))
            for _, r in stats.iterrows()
        }
    )

    def flag(b: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        src = b[source_col].to_pylist()
        ln = b[len_col].to_numpy(zero_copy_only=False).astype(np.int64)
        med = np.fromiter((lut[s][0] for s in src), np.int64, len(src))
        mad = np.fromiter((lut[s][1] for s in src), np.int64, len(src))
        dev = np.abs(ln - med)
        return pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                source_col: b[source_col],
                len_col: pa.array(ln, pa.int64()),
                "med": pa.array(med, pa.int64()),
                "mad": pa.array(mad, pa.int64()),
                "is_outlier": pa.array(dev > kk * mad),
            }
        )

    return docs.select_columns(["doc_id", source_col, len_col]).map_batches(
        flag, batch_format="pyarrow"
    )


# The classic UTF-8-read-as-latin1/cp1252 artifact substrings (accented
# latin digraphs and smart-punctuation trigraphs), plus U+FFFD handled
# separately — all LITERAL substrings so engine (count_substring) and SQL
# (replace-length delta) count identically with zero regex-dialect risk.
# The trigraphs are built from escapes: mis-decoded UTF-8 punctuation is
# "\u00e2" followed by C1/cp1252 codepoints that must not appear raw in
# source.
MOJIBAKE_PATTERNS = (
    "\u00c3\u00a9",  # mis-decoded e-acute
    "\u00c3\u00a8",  # e-grave
    "\u00c3\u00a1",  # a-acute
    "\u00c3\u00b3",  # o-acute
    "\u00c3\u00b1",  # n-tilde
    "\u00c3\u00a7",  # c-cedilla
    "\u00c3\u00bc",  # u-umlaut
    "\u00c3\u00b6",  # o-umlaut
    "\u00c3\u00a4",  # a-umlaut
    "\u00e2\u20ac\u2122",  # right single quote via cp1252
    "\u00e2\u20ac\u0153",  # left double quote via cp1252
    "\u00e2\u20ac\u201c",  # en dash via cp1252
    "\u00e2\u20ac\u201d",  # em dash via cp1252
)

_REPLACEMENT = "\ufffd"


def mojibake_report(
    docs: ray.data.Dataset,
    patterns: tuple[str, ...] = MOJIBAKE_PATTERNS,
    min_artifacts: int = 2,
) -> ray.data.Dataset:
    """Encoding-damage gate: flag documents carrying UTF-8-as-latin1
    mojibake substrings or U+FFFD replacement characters — the standard
    crawl-corpus cleanup signal (a page decoded through the wrong charset
    is unusable even when every other quality gate passes).

    Per doc: ``n_chars``, ``n_replacement`` (U+FFFD count),
    ``n_artifacts`` (total hits over the literal pattern table),
    ``artifacts_per_kchar`` (integer, *1000 // n_chars), and the gate
    ``is_mojibake = n_replacement > 0 OR n_artifacts >= min_artifacts``
    (one artifact can be a legitimate quotation OF mojibake; two or more
    means the document itself is damaged).

    Every count is a LITERAL substring count (pyarrow ``count_substring``,
    non-overlapping), so the DuckDB twin recomputes it exactly via the
    replace-length delta — no regex dialect in the contract.

    Scale: one stateless vectorized pass, lexicon is a compile-time
    constant — no exchange, no broadcast.
    """
    import numpy as np
    import pyarrow.compute as pc

    pats = tuple(patterns)
    ma = int(min_artifacts)

    def fn(b: pa.Table) -> pa.Table:
        txt = b["text"]
        n_chars = pc.utf8_length(txt).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        rep = pc.count_substring(txt, _REPLACEMENT).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        art = np.zeros(len(b), dtype=np.int64)
        for p in pats:
            art += pc.count_substring(txt, p).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        per_k = np.where(n_chars > 0, art * 1000 // np.maximum(n_chars, 1), 0)
        return pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_replacement": pa.array(rep, pa.int64()),
                "n_artifacts": pa.array(art, pa.int64()),
                "artifacts_per_kchar": pa.array(per_k, pa.int64()),
                "is_mojibake": pa.array((rep > 0) | (art >= ma)),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )



def gopher_rules(
    docs: ray.data.Dataset,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_len_x100: int = 300,
    max_mean_len_x100: int = 1000,
    max_symbol_x1000: int = 100,
    max_bullet_x1000: int = 900,
    max_ellipsis_x1000: int = 300,
    min_alpha_x1000: int = 800,
) -> ray.data.Dataset:
    """The Gopher quality-rule bundle (Rae et al. 2021, "Scaling Language
    Models" C.1) as exact integer signals + per-rule flags — the standard
    pre-training heuristic gate between language-ID and dedup:

    - ``n_tokens`` in [min_tokens, max_tokens];
    - mean token length in [3, 10] chars (x100 contract of
      `quality_scores`);
    - symbol-to-word ratio (# and ellipsis chars per token) <= 0.1;
    - <= 90 % of lines start with a bullet (- * \u2022), after a
      space-ltrim;
    - <= 30 %% of lines end with an ellipsis (... or \u2026), after a
      space-rtrim;
    - >= 80 %% of tokens contain at least one ASCII letter.

    ``gopher_pass`` ANDs them.  Every ratio is an exact cross-multiplied
    integer comparison; every count is a vectorized Arrow kernel over the
    whole batch (token path shares `_flat_tokens`'s str.split contract
    with the quality twins), so the DuckDB twin replays each rule
    exactly.  One stateless pass — no exchange at any scale.
    """
    import pyarrow.compute as pc

    from intertext_ray.ops.text_stats import _flat_tokens

    def fn(b: pa.Table) -> pa.Table:
        import numpy as np

        texts = b["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        nd = len(texts)
        flat, dix, n = _flat_tokens(texts)
        tok_len = np.asarray(
            pc.utf8_length(flat).to_numpy(zero_copy_only=False), np.int64
        )
        total_len = np.bincount(dix, weights=tok_len, minlength=nd).astype(
            np.int64
        )
        alpha = np.asarray(
            pc.match_substring_regex(flat, "[a-zA-Z]").to_numpy(
                zero_copy_only=False
            )
        )
        n_alpha = np.bincount(dix[alpha], minlength=nd).astype(np.int64)
        n_hash = pc.count_substring(texts, "#").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n_ell_char = pc.count_substring(texts, "\u2026").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n_sym = n_hash + n_ell_char

        lines = pc.split_pattern(texts, "\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        lflat = lines.flatten()
        lcounts = np.asarray(
            pc.list_value_length(lines).to_numpy(zero_copy_only=False),
            np.int64,
        )
        ldix = np.repeat(np.arange(nd), lcounts)
        lt = pc.utf8_ltrim(lflat, characters=" ")
        bullet = np.zeros(len(lflat), dtype=bool)
        for pref in ("-", "*", "\u2022"):
            bullet |= np.asarray(
                pc.starts_with(lt, pref).to_numpy(zero_copy_only=False)
            )
        rt = pc.utf8_rtrim(lflat, characters=" ")
        ell = np.zeros(len(lflat), dtype=bool)
        for suf in ("...", "\u2026"):
            ell |= np.asarray(
                pc.ends_with(rt, suf).to_numpy(zero_copy_only=False)
            )
        n_lines = np.bincount(ldix, minlength=nd).astype(np.int64)
        n_bullet = np.bincount(ldix[bullet], minlength=nd).astype(np.int64)
        n_ell = np.bincount(ldix[ell], minlength=nd).astype(np.int64)

        mean_len_x100 = np.zeros(nd, np.int64)
        nz = n > 0
        mean_len_x100[nz] = total_len[nz] * 100 // n[nz]

        length_ok = (n >= min_tokens) & (n <= max_tokens)
        tok_len_ok = nz & (mean_len_x100 >= min_mean_len_x100) & (
            mean_len_x100 <= max_mean_len_x100
        )
        symbol_ok = nz & (n_sym * 1000 <= max_symbol_x1000 * n)
        bullet_ok = n_bullet * 1000 <= max_bullet_x1000 * n_lines
        ellipsis_ok = n_ell * 1000 <= max_ellipsis_x1000 * n_lines
        alpha_ok = nz & (n_alpha * 1000 >= min_alpha_x1000 * n)
        gopher_pass = (
            length_ok & tok_len_ok & symbol_ok & bullet_ok & ellipsis_ok
            & alpha_ok
        )
        return pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "mean_tok_len_x100": pa.array(mean_len_x100, pa.int64()),
                "n_symbol_chars": pa.array(n_sym, pa.int64()),
                "n_alpha_tokens": pa.array(n_alpha, pa.int64()),
                "n_lines": pa.array(n_lines, pa.int64()),
                "n_bullet_lines": pa.array(n_bullet, pa.int64()),
                "n_ellipsis_lines": pa.array(n_ell, pa.int64()),
                "length_ok": pa.array(length_ok),
                "tok_len_ok": pa.array(tok_len_ok),
                "symbol_ok": pa.array(symbol_ok),
                "bullet_ok": pa.array(bullet_ok),
                "ellipsis_ok": pa.array(ellipsis_ok),
                "alpha_ok": pa.array(alpha_ok),
                "gopher_pass": pa.array(gopher_pass),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


# entity decode table for strip_markup — ORDER IS THE CONTRACT: tags are
# stripped first, then non-ampersand entities, then &amp; LAST (decoding
# it earlier would resurrect entities from double-escaped text, and
# decoding &lt;/&gt; before tag removal would fabricate tags)
MARKUP_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_markup(
    docs: ray.data.Dataset,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Markup-residue cleanup — the light-weight tag/entity pass a crawl
    pipeline runs on extractor output that still carries HTML fragments
    (the reference strips XML with a tag allowlist,
    `reference/intertext/intertext.py` get_words; this is the generic
    crawl-side sibling):

    - every ``<...>`` tag (RE2 ``<[^>]*>``) becomes one space, so word
      boundaries survive ``word<br>word``;
    - the standard entities decode in the fixed table order with
      ``&amp;`` LAST (see ``MARKUP_ENTITIES``).

    Returns (doc_id, text, n_tags, n_entities).  Both the tag regex
    (RE2 on both engines) and the literal entity replaces are
    twin-exact.  One stateless vectorized pass — no exchange."""
    import numpy as np
    import pyarrow.compute as pc

    def fn(b: pa.Table) -> pa.Table:
        txt = b[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        n_tags = pc.count_substring_regex(txt, "<[^>]*>").cast(
            pa.int64()
        ).to_numpy(zero_copy_only=False)
        out = pc.replace_substring_regex(txt, pattern="<[^>]*>", replacement=" ")
        n_ent = np.zeros(len(b), dtype=np.int64)
        for ent, rep in MARKUP_ENTITIES:
            n_ent += pc.count_substring(out, ent).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            out = pc.replace_substring(out, pattern=ent, replacement=rep)
        return pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                "text": out,
                "n_tags": pa.array(n_tags, pa.int64()),
                "n_entities": pa.array(n_ent, pa.int64()),
            }
        )

    return docs.select_columns(["doc_id", text_col]).map_batches(
        fn, batch_format="pyarrow"
    )
