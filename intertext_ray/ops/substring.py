"""Exact-substring duplicate detection (the suffix-array dedup family).

Completes the north-star's three near-dup families (MinHash, SimHash,
suffix-array substring, per Lee et al. 2021 ExactSubstr): find document
pairs sharing a verbatim run of >= ``k`` words, and the exact spans such
runs cover, over arbitrarily large corpora.

Distributed shape: a corpus-global suffix array is a single-machine
construct, but at a fixed threshold ``k`` the question "does this
position start a substring that occurs elsewhere?" only needs suffixes
*truncated to k tokens* — and globally sorting k-truncated suffixes is
exactly grouping k-grams by hash.  So the global path here is the
L-gram-hash groupby (``duplicate_spans`` / ``substring_dup_pairs``),
bucketed by gram hash like every other shuffle in this repo, while the
*real* suffix array (``functions/suffix.py``, prefix doubling + banded
neighbor LCP) powers the in-partition path ``suffix_repeat_spans``,
which handles arbitrary lengths without gram explosion once candidate
docs are co-located.  The two paths provably agree at threshold ``k``
(test-pinned, plus a DuckDB islands oracle for both).

The gram hash is the SAME pinned positional polynomial as
``ops.text_stats.rolling_fingerprints`` (hash-verified green against its
HUGEINT DuckDB twin), at ``keep_mod=1`` and with 1-based word positions
kept.  Reference analog: the hashed shingle runs of
``/root/reference/intertext/intertext.py:363-453`` at band width 1.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from intertext_ray.functions.hashing import splitmix64

_U64 = np.uint64


def gram_positions_batch(
    batch: pa.Table, text_col: str = "text", k: int = 8
) -> pa.Table:
    """(doc_id, pos, f) rows: every word-``k``-gram of every doc, ``pos``
    the 1-based word index of the gram start, ``f`` the pinned polynomial
    gram hash (identical value to ``rolling_fp_batch`` at ``keep_mod=1``).
    Vectorized over the flat Arrow token buffer: one chain-hash pass, k
    shifted multiply-adds, no per-gram Python."""
    from intertext_ray.ops.simhash import _chain_hash_tokens
    from intertext_ray.ops.text_stats import rolling_gram_weights

    P = rolling_gram_weights(k)
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
            "f": pa.array([], pa.uint64()),
        }
    )
    if n_docs == 0:
        return empty
    toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(texts))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    counts = np.asarray(
        pc.list_value_length(toks).to_numpy(zero_copy_only=False),
        dtype=np.int64,
    )
    doc_idx = np.repeat(np.arange(n_docs), counts)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    valid = np.asarray(lens, dtype=np.int64) > 0
    th = _chain_hash_tokens(flat)[valid]
    dix = doc_idx[valid]
    n = len(th)
    if n < k:
        return empty
    # 1-based position of each remaining token within its doc
    new_doc = np.ones(n, dtype=bool)
    new_doc[1:] = dix[1:] != dix[:-1]
    run_starts = np.nonzero(new_doc)[0]
    run_id = np.cumsum(new_doc) - 1
    pos = np.arange(n, dtype=np.int64) - run_starts[run_id] + 1

    total = n - k + 1
    acc = np.zeros(total, dtype=_U64)
    for j in range(k):
        acc += th[j : j + total] * P[j]
    in_doc = dix[:total] == dix[k - 1 :]
    f = splitmix64(acc[in_doc])
    owner = dix[:total][in_doc]
    gpos = pos[:total][in_doc]
    batch_docs = batch["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": pa.array(batch_docs[owner].astype(np.int64), pa.int64()),
            "pos": pa.array(gpos, pa.int64()),
            "f": pa.array(f, pa.uint64()),
        }
    )


def gram_positions(
    docs: ray.data.Dataset, text_col: str = "text", k: int = 8
) -> ray.data.Dataset:
    return docs.map_batches(
        lambda b: gram_positions_batch(b, text_col, k), batch_format="pyarrow"
    )


def _spans_table(doc, start, end, n) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(np.asarray(doc, dtype=np.int64), pa.int64()),
            "start_pos": pa.array(np.asarray(start, dtype=np.int64), pa.int64()),
            "end_pos": pa.array(np.asarray(end, dtype=np.int64), pa.int64()),
            "n_grams": pa.array(np.asarray(n, dtype=np.int64), pa.int64()),
        }
    )


def _merge_islands(doc: np.ndarray, pos: np.ndarray, k: int) -> pa.Table:
    """Merge per-doc consecutive duplicated gram-start positions into
    maximal spans [start_pos, start_pos_last + k - 1] — the vectorized
    gaps-and-islands step shared by both span ops."""
    if len(doc) == 0:
        return _spans_table([], [], [], [])
    order = np.lexsort((pos, doc))
    doc, pos = doc[order], pos[order]
    new = np.ones(len(doc), dtype=bool)
    new[1:] = (doc[1:] != doc[:-1]) | (pos[1:] != pos[:-1] + 1)
    starts = np.nonzero(new)[0]
    counts = np.diff(np.concatenate([starts, [len(doc)]]))
    return _spans_table(
        doc[starts], pos[starts], pos[starts] + counts - 1 + (k - 1), counts
    )


def substring_dup_pairs(
    docs: ray.data.Dataset,
    text_col: str = "text",
    k: int = 8,
    num_buckets: int = 32,
    gram_cap: int = 0,
) -> ray.data.Dataset:
    """(doc_a, doc_b, n_shared) for every doc pair sharing >= 1 verbatim
    ``k``-word run; ``n_shared`` = number of distinct shared gram hashes.
    EXACT for the ">= k words in common" predicate: two docs share a
    k-word substring iff they share a stride-1 k-gram.

    Shape: per-batch distinct (doc, f) -> gram-hash-bucketed groupby ->
    within-run pair emission (``gram_cap`` > 0 skips runs longer than the
    cap — the hot-gram guard for boilerplate grams at corpus scale;
    default off for oracle parity) -> pair-bucketed count.
    """
    nb = _U64(num_buckets)
    grams = gram_positions(docs, text_col, k)

    def distinct_and_bucket(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        f = t["f"].to_numpy(zero_copy_only=False)
        order = np.lexsort((f, d))
        d, f = d[order], f[order]
        keep = np.ones(len(d), dtype=bool)
        if len(d) > 1:
            keep[1:] = (d[1:] != d[:-1]) | (f[1:] != f[:-1])
        d, f = d[keep], f[keep]
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "f": pa.array(f, pa.uint64()),
                "bucket": pa.array((splitmix64(f) % nb).astype(np.int64)),
            }
        )

    def emit(group: pa.Table) -> pa.Table:
        from intertext_ray.stages.candidates import pairs_within_runs

        f = group["f"].to_numpy(zero_copy_only=False)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, f))
        f, d = f[order], d[order]
        n = len(f)
        if n == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                }
            )
        starts = np.concatenate([[0], np.nonzero(f[1:] != f[:-1])[0] + 1])
        counts = np.diff(np.concatenate([starts, [n]]))
        if gram_cap > 0:
            hot = counts > gram_cap
            if hot.any():
                keep_rows = ~np.repeat(hot, counts)
                f, d = f[keep_rows], d[keep_rows]
                counts = counts[~hot]
        ii, jj = pairs_within_runs(counts)
        da, db = d[ii], d[jj]
        keep = da != db
        da, db = da[keep], db[keep]
        swap = da > db
        a = np.where(swap, db, da)
        b = np.where(swap, da, db)
        return pa.table(
            {
                "doc_a": pa.array(a.astype(np.int64), pa.int64()),
                "doc_b": pa.array(b.astype(np.int64), pa.int64()),
            }
        )

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        da = t["doc_a"].to_numpy(zero_copy_only=False).astype(_U64)
        db = t["doc_b"].to_numpy(zero_copy_only=False).astype(_U64)
        return t.append_column(
            "bucket", pa.array(((splitmix64(da) ^ db) % nb).astype(np.int64))
        )

    def count_pairs(group: pa.Table) -> pa.Table:
        da = group["doc_a"].to_numpy(zero_copy_only=False)
        db = group["doc_b"].to_numpy(zero_copy_only=False)
        if len(da) == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "n_shared": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((db, da))
        da, db = da[order], db[order]
        new = np.ones(len(da), dtype=bool)
        new[1:] = (da[1:] != da[:-1]) | (db[1:] != db[:-1])
        starts = np.nonzero(new)[0]
        counts = np.diff(np.concatenate([starts, [len(da)]]))
        return pa.table(
            {
                "doc_a": pa.array(da[starts], pa.int64()),
                "doc_b": pa.array(db[starts], pa.int64()),
                "n_shared": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    pairs = (
        grams.map_batches(distinct_and_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(emit, batch_format="pyarrow")
    )
    return (
        pairs.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_pairs, batch_format="pyarrow")
    )


def duplicate_spans(
    docs: ray.data.Dataset,
    text_col: str = "text",
    k: int = 8,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """(doc_id, start_pos, end_pos, n_grams) maximal spans (1-based,
    inclusive word indices) covered by ``k``-word runs occurring >= 2
    times anywhere in the corpus (including elsewhere in the same doc) —
    the spans Lee-et-al-style ExactSubstr dedup would cut.

    Global and exact at threshold ``k``: gram-hash-bucketed groupby finds
    duplicated grams (each bucket sees every occurrence of its hashes),
    then a doc-bucketed groupby merges consecutive duplicated positions
    into maximal spans."""
    nb = _U64(num_buckets)
    grams = gram_positions(docs, text_col, k)

    def add_bucket(t: pa.Table) -> pa.Table:
        f = t["f"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((splitmix64(f) % nb).astype(np.int64))
        )

    def dup_positions(group: pa.Table) -> pa.Table:
        f = group["f"].to_numpy(zero_copy_only=False)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        p = group["pos"].to_numpy(zero_copy_only=False)
        order = np.argsort(f, kind="stable")
        f, d, p = f[order], d[order], p[order]
        n = len(f)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                }
            )
        starts = np.concatenate([[0], np.nonzero(f[1:] != f[:-1])[0] + 1])
        counts = np.diff(np.concatenate([starts, [n]]))
        dup = np.repeat(counts >= 2, counts)
        return pa.table(
            {
                "doc_id": pa.array(d[dup], pa.int64()),
                "pos": pa.array(p[dup], pa.int64()),
            }
        )

    def add_doc_bucket(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(_U64)
        return t.append_column(
            "bucket", pa.array((splitmix64(d) % nb).astype(np.int64))
        )

    def merge(group: pa.Table) -> pa.Table:
        return _merge_islands(
            group["doc_id"].to_numpy(zero_copy_only=False),
            group["pos"].to_numpy(zero_copy_only=False),
            k,
        )

    dups = (
        grams.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(dup_positions, batch_format="pyarrow")
    )
    return (
        dups.map_batches(add_doc_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
    )


def suffix_repeat_spans(
    docs: ray.data.Dataset,
    text_col: str = "text",
    min_len: int = 8,
    num_buckets: int = 1,
) -> ray.data.Dataset:
    """Same output contract as :func:`duplicate_spans`, computed with a
    REAL suffix array (prefix doubling + banded neighbor LCP,
    ``functions/suffix.py``) over the co-grouped docs of each bucket:
    rank-compress token hashes, concatenate docs with per-doc unique
    separators (no repeat can cross one), mark positions whose
    ``min_len``-truncated suffix ties a sorted neighbor, merge islands.

    With ``num_buckets=1`` this is globally exact and equals
    :func:`duplicate_spans` at ``k=min_len`` (test-pinned + shared DuckDB
    oracle).  With more buckets it is the in-partition refinement path —
    repeats spanning buckets are delegated to the gram-hash path, which
    is how this scales past one machine's memory: partition by content
    bucket, suffix-array within, gram-groupby across."""
    from intertext_ray.functions.suffix import repeat_mask
    from intertext_ray.ops.simhash import _chain_hash_tokens

    nb = _U64(num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(_U64)
        return t.append_column(
            "bucket", pa.array((splitmix64(d) % nb).astype(np.int64))
        )

    def spans(group: pa.Table) -> pa.Table:
        texts = group[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n_docs = len(texts)
        if n_docs == 0:
            return _spans_table([], [], [], [])
        toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(texts))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        counts = np.asarray(
            pc.list_value_length(toks).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        doc_idx = np.repeat(np.arange(n_docs), counts)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        valid = np.asarray(lens, dtype=np.int64) > 0
        th = _chain_hash_tokens(flat)[valid]
        dix = doc_idx[valid]
        if len(th) == 0:
            return _spans_table([], [], [], [])
        # exact symbols: rank-compress token hashes, then per-doc unique
        # separators above the vocab so no repeat crosses a boundary
        _, sym = np.unique(th, return_inverse=True)
        vocab = int(sym.max()) + 1 if len(sym) else 0
        n = len(sym)
        new_doc = np.ones(n, dtype=bool)
        new_doc[1:] = dix[1:] != dix[:-1]
        pos_in_doc = (
            np.arange(n, dtype=np.int64)
            - np.nonzero(new_doc)[0][np.cumsum(new_doc) - 1]
            + 1
        )
        present = np.unique(dix)
        sep_sym = vocab + np.arange(len(present), dtype=np.int64)
        # interleave: seq = d0 tokens, sep0, d1 tokens, sep1, ...
        seq = np.empty(n + len(present), dtype=np.int64)
        tok_slots = np.ones(len(seq), dtype=bool)
        doc_ends = np.concatenate([np.nonzero(new_doc)[0][1:], [n]])
        sep_slots = doc_ends + np.arange(len(present))
        tok_slots[sep_slots] = False
        seq[tok_slots] = sym
        seq[sep_slots] = sep_sym
        mask = repeat_mask(seq, min_len)[tok_slots]
        hit = np.nonzero(mask)[0]
        batch_docs = group["doc_id"].to_numpy(zero_copy_only=False)
        return _merge_islands(
            batch_docs[dix[hit]].astype(np.int64), pos_in_doc[hit], min_len
        )

    return (
        docs.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(spans, batch_format="pyarrow")
    )


def cut_spans(
    docs: ray.data.Dataset,
    spans: ray.data.Dataset,
    text_col: str = "text",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """(doc_id, text, n_removed): remove the token ranges in ``spans``
    (columns ``doc_id, start_pos, end_pos`` — 1-based inclusive) from
    every doc and rejoin survivors with single spaces.  The shared
    REMOVAL co-group behind :func:`remove_duplicate_spans` and
    ``ops.cdc.remove_dup_chunks``.

    Shape: a doc-hash bucketed co-group of (docs, spans) — spans are
    dup-content-proportional, never broadcast — with the per-bucket mask
    built by a vectorized interval-delta cumsum over the flat token
    array (no per-doc Python loop)."""
    nb = _U64(num_buckets)

    def tag_doc(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(_U64)
        return pa.table(
            {
                "doc_id": pa.array(d.astype(np.int64), pa.int64()),
                "text": t[text_col],
                "start_pos": pa.array(np.zeros(len(t), np.int64)),
                "end_pos": pa.array(np.full(len(t), -1, np.int64)),
                "bucket": pa.array((splitmix64(d) % nb).astype(np.int64)),
            }
        )

    def tag_span(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(_U64)
        return pa.table(
            {
                "doc_id": pa.array(d.astype(np.int64), pa.int64()),
                "text": pa.array([None] * len(t), pa.string()),
                "start_pos": t["start_pos"],
                "end_pos": t["end_pos"],
                "bucket": pa.array((splitmix64(d) % nb).astype(np.int64)),
            }
        )

    def cut(group: pa.Table) -> pa.Table:
        is_doc = pc.is_valid(group["text"]).to_numpy(zero_copy_only=False)
        dtab = group.filter(pa.array(is_doc))
        stab = group.filter(pa.array(~is_doc))
        texts = dtab["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(texts))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        counts = np.asarray(
            pc.list_value_length(toks).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        nonempty = lens > 0
        if not nonempty.all():  # '' artifacts of splitting empty docs
            doc_of = np.repeat(np.arange(len(counts)), counts)
            counts = counts - np.bincount(
                doc_of[~nonempty], minlength=len(counts)
            )
            flat = flat.filter(pa.array(nonempty))
        doc_ids = dtab["doc_id"].to_numpy(zero_copy_only=False)
        doc_starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        total = int(doc_starts[-1])
        # interval-delta cumsum: covered[i] > 0 <=> word i is in a span
        delta = np.zeros(total + 1, np.int64)
        if len(stab):
            pos_of = {int(d): j for j, d in enumerate(doc_ids)}
            sd = stab["doc_id"].to_numpy(zero_copy_only=False)
            ss = stab["start_pos"].to_numpy(zero_copy_only=False)
            se = stab["end_pos"].to_numpy(zero_copy_only=False)
            j = np.array([pos_of[int(x)] for x in sd], np.int64)
            base = doc_starts[j]
            n_doc = counts[j]
            lo = base + np.minimum(ss - 1, n_doc)
            hi = base + np.minimum(se, n_doc)
            np.add.at(delta, lo, 1)
            np.add.at(delta, hi, -1)
        covered = np.cumsum(delta[:-1]) > 0
        keep = ~covered
        kept_counts = np.zeros(len(counts), np.int64)
        nz = counts > 0
        if total and nz.any():  # reduceat over nonempty docs only (an
            # empty doc's start can equal `total`, which is out of range)
            kept_counts[nz] = np.add.reduceat(
                keep.astype(np.int64), doc_starts[:-1][nz]
            )
        kept = flat.filter(pa.array(keep))
        off = np.concatenate([[0], np.cumsum(kept_counts)]).astype(np.int64)
        text = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(off, pa.int64()), kept), " "
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "text": text,
                "n_removed": pa.array(counts - kept_counts, pa.int64()),
            }
        )

    tagged = docs.map_batches(tag_doc, batch_format="pyarrow").union(
        spans.map_batches(
            lambda t: tag_span(t.select(["doc_id", "start_pos", "end_pos"])),
            batch_format="pyarrow",
        )
    )
    return tagged.groupby("bucket").map_groups(cut, batch_format="pyarrow")


def remove_duplicate_spans(
    docs: ray.data.Dataset,
    text_col: str = "text",
    k: int = 8,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """(doc_id, text, n_removed): the Lee-et-al ExactSubstr REMOVAL step —
    every word inside a :func:`duplicate_spans` span (a maximal run
    covered by k-word grams occurring >= 2 times corpus-wide) is cut, and
    the surviving words are rejoined with single spaces.  ``n_removed``
    counts removed WORDS.  Docs with no spans pass through re-joined
    (whitespace canonicalized — same tokenization contract as the twin).

    Shape: spans are detected by the existing two-shuffle plan; the cut
    is the shared :func:`cut_spans` co-group."""
    return cut_spans(
        docs, duplicate_spans(docs, text_col, k, num_buckets),
        text_col, num_buckets,
    )
