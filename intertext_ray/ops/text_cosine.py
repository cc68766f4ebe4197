"""Bag-of-words cosine similarity pairs — term-frequency cosine.

The third text-similarity geometry next to set-Jaccard (`ngram_jaccard`,
`minhash_doc`) and bit-fingerprints (`simhash`, `sorted_neighborhood`):
cosine over word-count vectors weights REPETITION, so it separates "same
vocabulary, different emphasis" cases the set measures collapse.

Exactness contract: everything is integer arithmetic —

    cos2_x1e6(a, b) = floor( (sum_t a_t b_t)^2 * 10^6
                             / (sum a_t^2 * sum b_t^2) )

so the DuckDB twin is hash-exact (no sqrt, no float dot products).

Physical plan (the inverted-index join):

1. (term, doc, count, norm2) rows — counts AND the doc's squared norm are
   row-local (a doc lives in one row), so norms RIDE the term shuffle
   instead of a second join;
2. optional ``max_df`` vocabulary restriction: terms appearing in more
   than ``max_df`` docs are excluded from the geometry (the stop-word
   control — a df > max_df term contributes O(df^2) pair partials, the
   classic inverted-index hot key).  The dropped set is bounded by
   total_occurrences / max_df and broadcast (same posture as
   `line_dedup`'s frequent set); norms are computed AFTER the restriction
   so the cosine stays a true cosine on the restricted space;
3. term-hash bucketed groupby -> per-term-run pair partials (vectorized
   ``pairs_within_runs``) -> pair-hash bucketed groupby -> run-sum of
   partials (reduceat) -> integer cos^2 filter.

On corpora without a df cap the hot-term cost is O(df^2) per term — set
``max_df`` at web scale (it is disabled by default because the synthetic
testdata's ~31-word vocabulary makes every term "hot" by construction;
the driver query documents this).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from intertext_ray.functions.hashing import splitmix64

_U64 = np.uint64


def _term_rows(
    docs: ray.data.Dataset,
    text_col: str,
    drop_ref,
    num_buckets: int,
) -> ray.data.Dataset:
    """(term_hash, doc_id, count, norm2, bucket) — one row per distinct
    (doc, kept term); norm2 is the doc's squared count-vector norm over
    the KEPT vocabulary."""
    from intertext_ray.ops.simhash import _chain_hash_tokens

    nb = _U64(num_buckets)

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
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
        keep = lens > 0
        doc_of = np.repeat(
            batch["doc_id"].to_numpy(zero_copy_only=False), counts
        )
        h = _chain_hash_tokens(flat)[keep]
        doc_of = doc_of[keep]
        dropped = ray.get(drop_ref) if drop_ref is not None else None
        if dropped is not None and len(dropped):
            m = ~np.isin(h, dropped)
            h, doc_of = h[m], doc_of[m]
        if not len(h):
            return pa.table(
                {
                    "term": pa.array([], pa.uint64()),
                    "doc_id": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                    "norm2": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((h, doc_of))
        h, doc_of = h[order], doc_of[order]
        new = np.ones(len(h), dtype=bool)
        new[1:] = (h[1:] != h[:-1]) | (doc_of[1:] != doc_of[:-1])
        starts = np.nonzero(new)[0]
        c = np.diff(np.concatenate([starts, [len(h)]]))
        th, td = h[starts], doc_of[starts]
        # per-doc norm2 over the kept vocab (doc rows are contiguous);
        # integer reduceat — float64 weights would lose exactness on
        # very long docs
        dnew = np.ones(len(td), dtype=bool)
        dnew[1:] = td[1:] != td[:-1]
        dstarts = np.nonzero(dnew)[0]
        dlens = np.diff(np.concatenate([dstarts, [len(td)]]))
        n2 = np.repeat(np.add.reduceat(c * c, dstarts), dlens)
        return pa.table(
            {
                "term": pa.array(th, pa.uint64()),
                "doc_id": pa.array(td.astype(np.int64), pa.int64()),
                "c": pa.array(c, pa.int64()),
                "norm2": pa.array(n2, pa.int64()),
                "bucket": pa.array(
                    (splitmix64(th) % nb).astype(np.int64), pa.int64()
                ),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def cosine_text_pairs(
    docs: ray.data.Dataset,
    text_col: str = "text",
    min_cos2_x1e6: int = 990000,
    max_df: int = 0,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """(doc_a, doc_b, cos2_x1e6), doc_a < doc_b: all doc pairs whose
    squared word-count cosine (x 10^6, floored) reaches
    ``min_cos2_x1e6``, over the vocabulary restricted to terms with
    document frequency <= ``max_df`` (0 disables the restriction)."""
    drop_ref = None
    if max_df:
        tr = _term_rows(docs, text_col, None, num_buckets)
        df = tr.groupby("term").count()
        hot = df.map_batches(
            lambda t: t.filter(
                pc.greater(t["count()"], pa.scalar(max_df))
            ).select(["term"]),
            batch_format="pyarrow",
        )
        vals = [
            b["term"].to_numpy(zero_copy_only=False)
            for b in hot.iter_batches(batch_format="pyarrow")
        ]
        dropped = (
            np.sort(np.concatenate(vals)) if vals else np.array([], _U64)
        )
        drop_ref = ray.put(dropped)

    rows = _term_rows(docs, text_col, drop_ref, num_buckets)
    nb = _U64(num_buckets)

    def emit(group: pa.Table) -> pa.Table:
        from intertext_ray.stages.candidates import pairs_within_runs

        t = group["term"].to_numpy(zero_copy_only=False)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        c = group["c"].to_numpy(zero_copy_only=False)
        n2 = group["norm2"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, t))
        t, d, c, n2 = t[order], d[order], c[order], n2[order]
        n = len(t)
        if n == 0:
            return _partial_table([], [], [], [], [], 0)
        starts = np.concatenate([[0], np.nonzero(t[1:] != t[:-1])[0] + 1])
        runs = np.diff(np.concatenate([starts, [n]]))
        ii, jj = pairs_within_runs(runs)
        da, db = d[ii], d[jj]
        ab = c[ii] * c[jj]
        na, nb2_ = n2[ii], n2[jj]
        swap = da > db
        da2 = np.where(swap, db, da)
        db2 = np.where(swap, da, db)
        na2 = np.where(swap, nb2_, na)
        nb3 = np.where(swap, na, nb2_)
        return _partial_table(da2, db2, ab, na2, nb3, num_buckets)

    def reduce_pairs(group: pa.Table) -> pa.Table:
        da = group["doc_a"].to_numpy(zero_copy_only=False)
        db = group["doc_b"].to_numpy(zero_copy_only=False)
        ab = group["ab"].to_numpy(zero_copy_only=False)
        na = group["n2a"].to_numpy(zero_copy_only=False)
        nb2_ = group["n2b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((db, da))
        da, db, ab, na, nb2_ = (
            da[order], db[order], ab[order], na[order], nb2_[order],
        )
        n = len(da)
        if n == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "cos2_x1e6": pa.array([], pa.int64()),
                }
            )
        new = np.ones(n, dtype=bool)
        new[1:] = (da[1:] != da[:-1]) | (db[1:] != db[:-1])
        starts = np.nonzero(new)[0]
        dot = np.add.reduceat(ab, starts)
        a0, b0, na0, nb0 = da[starts], db[starts], na[starts], nb2_[starts]
        # python ints: dot^2 * 1e6 overflows int64 on long docs
        cos2 = np.array(
            [
                (int(x) * int(x) * 1_000_000) // (int(p) * int(q))
                if p and q
                else 0
                for x, p, q in zip(dot, na0, nb0)
            ],
            dtype=np.int64,
        )
        keep = cos2 >= min_cos2_x1e6
        return pa.table(
            {
                "doc_a": pa.array(a0[keep], pa.int64()),
                "doc_b": pa.array(b0[keep], pa.int64()),
                "cos2_x1e6": pa.array(cos2[keep], pa.int64()),
            }
        )

    partials = rows.groupby("bucket").map_groups(emit, batch_format="pyarrow")
    return partials.groupby("pbucket").map_groups(
        reduce_pairs, batch_format="pyarrow"
    )


def _partial_table(da, db, ab, n2a, n2b, num_buckets) -> pa.Table:
    da = np.asarray(da, np.int64)
    db = np.asarray(db, np.int64)
    pb = (
        (splitmix64(da.astype(_U64)) ^ db.astype(_U64)) % _U64(max(1, num_buckets))
    ).astype(np.int64)
    return pa.table(
        {
            "doc_a": pa.array(da, pa.int64()),
            "doc_b": pa.array(db, pa.int64()),
            "ab": pa.array(np.asarray(ab, np.int64), pa.int64()),
            "n2a": pa.array(np.asarray(n2a, np.int64), pa.int64()),
            "n2b": pa.array(np.asarray(n2b, np.int64), pa.int64()),
            "pbucket": pa.array(pb, pa.int64()),
        }
    )
