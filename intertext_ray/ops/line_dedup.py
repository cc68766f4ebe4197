"""Line-level boilerplate dedup (the C4 / RefinedWeb / MassiveWeb filter).

Web curation pipelines strip LINES that recur across many documents —
navigation bars, cookie banners, boilerplate footers — before any
document-level dedup (C4 dropped repeated three-sentence spans;
RefinedWeb/MassiveWeb drop lines by document frequency).  The operator:

    remove every line whose document frequency >= ``min_df``,
    preserving the order of the surviving lines in each doc.

Physical plan (two streaming passes over the corpus, ONE slim shuffle):

1. df pass: split each doc on newlines (vectorized ``pc.split_pattern``),
   distinct lines per doc (a doc lives in one row, so per-row distinct is
   global distinct), ``groupby(line).count()`` = exact document frequency.
   The exchange carries one row per distinct (doc, line) — text lines,
   pre-deduped per doc.
2. the frequent set (df >= min_df) is BY CONSTRUCTION bounded by
   total_lines / min_df and in practice tiny (boilerplate is the point:
   few distinct lines, many occurrences) — it is collected and broadcast
   once via ``ray.put``, same justification as the decontamination gram
   set (`ops/decontam.py`).  At min_df=100 the bound is 1% of distinct
   lines; the term-bucketed-join fallback of `ops/text_stats.doc_top_terms`
   is the escape hatch if a corpus ever defeats the bound.
3. clean pass: re-split, drop frequent lines via the vectorized hash-set
   probe ``pc.is_in``, reassemble with offset arithmetic +
   ``pc.binary_join`` — zero shuffles on the corpus side.

Membership is decided on the LINE STRING, not a hash — exact semantics
(and exactly what the DuckDB twin computes); hashing the lines to u64
first is the slim-exchange variant, trading a 2^-64 collision for ~10x
less shuffle volume (documented, not default).

``break_into_lines`` derives a deterministic multi-line view (every
``tokens_per_line`` whitespace tokens become one line) for corpora that
carry no newlines — the driver query uses it so the twin can re-derive
the identical view in SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _flat_nonempty(list_arr: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Flatten a list<string> and drop empty strings ('' artifacts of
    splitting an empty doc); returns (flat values, per-list counts)."""
    if isinstance(list_arr, pa.ChunkedArray):
        list_arr = list_arr.combine_chunks()
    flat = list_arr.flatten()
    counts = np.asarray(
        pc.list_value_length(list_arr).to_numpy(zero_copy_only=False),
        dtype=np.int64,
    )
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    keep = lens > 0
    if not keep.all():
        # per-list count of dropped empties, vectorized over the flat mask
        doc_of = np.repeat(np.arange(len(counts)), counts)
        drops = np.bincount(doc_of[~keep], minlength=len(counts))
        counts = counts - drops
        flat = flat.filter(pa.array(keep))
    return flat, counts


def break_into_lines(
    docs: ray.data.Dataset, tokens_per_line: int = 3, text_col: str = "text"
) -> ray.data.Dataset:
    """Deterministic multi-line view: whitespace-tokenize each doc and emit
    the same doc_id with every ``tokens_per_line`` consecutive tokens joined
    by ' ' and lines joined by '\\n'.  Tokens with index i land on line
    ``i // tokens_per_line``.  Docs with no tokens become ''.  Fully
    vectorized (offset arithmetic + ``binary_join``)."""
    npl = int(tokens_per_line)

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(texts))
        flat, counts = _flat_nonempty(toks)
        lines_per_doc = -(-counts // npl)  # ceil
        total_lines = int(lines_per_doc.sum())
        # every line holds npl tokens except each doc's last line
        line_len = np.full(total_lines, npl, dtype=np.int64)
        last = np.cumsum(lines_per_doc) - 1
        nz = counts > 0
        line_len[last[nz]] = counts[nz] - (lines_per_doc[nz] - 1) * npl
        tok_off = np.concatenate([[0], np.cumsum(line_len)]).astype(np.int64)
        line_vals = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(tok_off, pa.int64()), flat), " "
        )
        doc_off = np.concatenate([[0], np.cumsum(lines_per_doc)]).astype(
            np.int64
        )
        text = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(doc_off, pa.int64()), line_vals),
            "\n",
        )
        return pa.table({"doc_id": batch["doc_id"], "text": text})

    return docs.map_batches(fn, batch_format="pyarrow")


def line_doc_frequencies(
    docs: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """(line, df): exact document frequency of every distinct non-empty
    line.  Per-row (= per-doc) distinct happens batch-side, so the shuffle
    carries one row per distinct (doc, line)."""

    def distinct_lines(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        split = pc.split_pattern(texts, pattern="\n")
        flat, counts = _flat_nonempty(split)
        doc_of = np.repeat(np.arange(len(counts)), counts)
        t = pa.table({"d": pa.array(doc_of, pa.int64()), "line": flat})
        return t.group_by(["d", "line"]).aggregate([]).select(["line"])

    return (
        docs.map_batches(distinct_lines, batch_format="pyarrow")
        .groupby("line")
        .count()
        .map_batches(
            lambda t: t.rename_columns(["line", "df"]), batch_format="pyarrow"
        )
    )


def line_dedup(
    docs: ray.data.Dataset, min_df: int = 3, text_col: str = "text"
) -> ray.data.Dataset:
    """(doc_id, text, n_removed): each doc with every line of document
    frequency >= ``min_df`` removed (surviving line order preserved; docs
    reduced to nothing become '').  ``n_removed`` counts removed line
    OCCURRENCES in that doc (a line repeated k times in one doc counts k)."""
    freq = line_doc_frequencies(docs, text_col).map_batches(
        lambda t: t.filter(pc.greater_equal(t["df"], pa.scalar(min_df))),
        batch_format="pyarrow",
    )
    # bounded by total_lines/min_df (see module docstring) -> broadcast once
    freq_lines = [b["line"] for b in freq.iter_batches(batch_format="pyarrow")]
    freq_arr = (
        pa.concat_arrays([pa.concat_arrays(c.chunks) if isinstance(c, pa.ChunkedArray) else c for c in freq_lines])
        if freq_lines
        else pa.array([], pa.string())
    )
    freq_ref = ray.put(freq_arr)

    def clean(batch: pa.Table) -> pa.Table:
        fl = ray.get(freq_ref)
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        split = pc.split_pattern(texts, pattern="\n")
        flat, counts = _flat_nonempty(split)
        n = len(counts)
        if len(fl) and len(flat):
            drop = pc.is_in(flat, value_set=fl).to_numpy(zero_copy_only=False)
        else:
            drop = np.zeros(len(flat), dtype=bool)
        doc_of = np.repeat(np.arange(n), counts)
        removed = np.bincount(doc_of[drop], minlength=n).astype(np.int64)
        kept_counts = counts - removed
        kept = flat.filter(pa.array(~drop))
        off = np.concatenate([[0], np.cumsum(kept_counts)]).astype(np.int64)
        text = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(off, pa.int64()), kept), "\n"
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": text,
                "n_removed": pa.array(removed, pa.int64()),
            }
        )

    return docs.map_batches(clean, batch_format="pyarrow")
