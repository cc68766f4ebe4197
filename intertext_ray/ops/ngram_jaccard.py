"""Char n-gram Jaccard similarity — exact pairwise dedup metric.

Physical plan: explode docs to distinct (gram, doc_id, doc_size) rows
(vectorized over the concatenated utf-8 buffer), bucket-groupby gram to
count pairwise intersections — each emitted pair CARRIES both doc sizes
through the shuffle, so the union term needs no driver-side broadcast (at
10⁹ docs a doc→size dict would be driver-resident state; 16 bytes/row in
the shuffle is not).  A gram frequency cap bounds the quadratic blowup of
stop-grams — at corpus scale, grams shared by thousands of docs carry no
dedup signal; the cap is a knob and the dropped mass is measurable (same
argument as the LSH hot-band cap).

Output pairs carry ``jaccard_x1000 = floor(1000 * inter / union)`` — the
floor of a float64 division, expression-identical to the DuckDB oracle
twin so value-hash comparison is exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.functions.hashing import splitmix64

_U64 = np.uint64


def doc_grams(text: str, n: int = 4) -> set[bytes]:
    b = text.encode("utf-8")
    if len(b) < n:
        return {b} if b else set()
    return {b[i : i + n] for i in range(len(b) - n + 1)}


def gram_rows_batch(
    batch: pa.Table, text_col: str = "text", n: int = 4
) -> pa.Table:
    """Distinct (gram_hash:uint64, doc_id, dsize) rows per doc, vectorized
    over the batch's flat UTF-8 byte buffer: ``n`` shifted ORs build every
    byte-gram's little-endian uint64 (value-identical to
    ``np.frombuffer(gram.ljust(8, b'\\0'))`` — the scalar reference
    :func:`doc_grams` path, test-pinned), a doc-boundary mask drops
    cross-doc windows, and per-doc distinct is one lexsort run mask.  No
    per-doc Python.  ``dsize`` (the doc's distinct-gram count) rides every
    row so downstream scoring never needs a per-doc lookup table."""
    if n > 8:
        raise ValueError("byte grams are packed into uint64: n must be <= 8")
    import pyarrow.compute as pc

    empty = pa.table(
        {
            "gram": pa.array([], pa.uint64()),
            "doc_id": pa.array([], pa.int64()),
            "dsize": pa.array([], pa.int64()),
        }
    )
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if len(texts) == 0:
        return empty
    bin_arr = pc.cast(texts, pa.large_binary())
    off0 = bin_arr.offset
    offs = np.frombuffer(bin_arr.buffers()[1], dtype=np.int64)[
        off0 : off0 + len(bin_arr) + 1
    ]
    buf = bin_arr.buffers()[2]
    base, total = int(offs[0]), int(offs[-1] - offs[0])
    data = (
        np.frombuffer(buf, dtype=np.uint8)[base : base + total]
        if buf is not None
        else np.empty(0, np.uint8)
    )
    offs_rel = (offs - base).astype(np.int64)
    lens = np.diff(offs_rel)
    ndocs = len(lens)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), lens)
    vals_parts, owner_parts = [], []
    ngram_total = total - n + 1
    if ngram_total > 0:
        d8 = data.astype(np.uint64)
        acc = np.zeros(ngram_total, dtype=np.uint64)
        for j in range(n):
            acc |= d8[j : j + ngram_total] << np.uint64(8 * j)
        in_doc = doc_of[:ngram_total] == doc_of[n - 1 :]
        vals_parts.append(acc[in_doc])
        owner_parts.append(doc_of[:ngram_total][in_doc])
    # docs shorter than n bytes contribute their whole payload, zero-padded
    short = np.nonzero((lens > 0) & (lens < n))[0]
    if len(short):
        sv = np.zeros(len(short), dtype=np.uint64)
        for j in range(n - 1):
            has = lens[short] > j
            sv[has] |= data[offs_rel[short[has]] + j].astype(
                np.uint64
            ) << np.uint64(8 * j)
        vals_parts.append(sv)
        owner_parts.append(short)
    if not vals_parts:
        return empty
    vals = np.concatenate(vals_parts)
    owner = np.concatenate(owner_parts)
    if len(vals) == 0:
        return empty
    order = np.lexsort((vals, owner))
    vals, owner = vals[order], owner[order]
    keep = np.ones(len(vals), dtype=bool)
    keep[1:] = (owner[1:] != owner[:-1]) | (vals[1:] != vals[:-1])
    vals, owner = vals[keep], owner[keep]
    new = np.ones(len(owner), dtype=bool)
    new[1:] = owner[1:] != owner[:-1]
    starts = np.nonzero(new)[0]
    counts = np.diff(np.concatenate([starts, [len(owner)]]))
    return pa.table(
        {
            "gram": pa.array(splitmix64(vals), pa.uint64()),
            "doc_id": pa.array(doc_ids[owner], pa.int64()),
            "dsize": pa.array(np.repeat(counts, counts), pa.int64()),
        }
    )


def gram_rows(docs: ray.data.Dataset, text_col: str = "text", n: int = 4):
    """Dataset wrapper over :func:`gram_rows_batch`."""
    return docs.map_batches(
        lambda b: gram_rows_batch(b, text_col, n), batch_format="pyarrow"
    )


def _inter_table(a, b, sa, sb, inter) -> pa.Table:
    return pa.table(
        {
            "doc_a": pa.array(np.asarray(a, np.int64), pa.int64()),
            "doc_b": pa.array(np.asarray(b, np.int64), pa.int64()),
            "size_a": pa.array(np.asarray(sa, np.int64), pa.int64()),
            "size_b": pa.array(np.asarray(sb, np.int64), pa.int64()),
            "inter": pa.array(np.asarray(inter, np.int64), pa.int64()),
        }
    )


def ngram_jaccard_pairs(
    docs: ray.data.Dataset,
    text_col: str = "text",
    n: int = 4,
    min_jaccard: float = 0.5,
    num_buckets: int = 32,
    gram_doc_cap: int = 0,
) -> ray.data.Dataset:
    """(doc_a, doc_b, jaccard_x1000) for pairs with Jaccard >= min_jaccard.

    ``gram_doc_cap``: drop grams appearing in more docs (0 = exact, no cap —
    use the cap at scale and account the divergence)."""
    grams = gram_rows(docs, text_col, n)
    nb = _U64(num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        g = t["gram"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((g % nb).astype(np.int64)))

    def count_pairs(group: pa.Table) -> pa.Table:
        """Within a bucket: per-gram doc lists -> pairwise intersection
        counts (partial; summed across buckets next) — sizes ride along."""
        from intertext_ray.stages.candidates import pairs_within_runs

        g = group["gram"].to_numpy(zero_copy_only=False)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        sz = group["dsize"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, g))
        g, d, sz = g[order], d[order], sz[order]
        nrow = len(g)
        if nrow == 0:
            return _inter_table([], [], [], [], [])
        starts = np.concatenate([[0], np.nonzero(g[1:] != g[:-1])[0] + 1])
        counts = np.diff(np.concatenate([starts, [nrow]]))
        if gram_doc_cap:
            keep_runs = counts <= gram_doc_cap
            keep_rows = np.repeat(keep_runs, counts)
            g, d, sz = g[keep_rows], d[keep_rows], sz[keep_rows]
            counts = counts[keep_runs]
        ii, jj = pairs_within_runs(counts)
        da, db, sa, sb = d[ii], d[jj], sz[ii], sz[jj]
        swap = da > db
        a = np.where(swap, db, da)
        b = np.where(swap, da, db)
        sa2 = np.where(swap, sb, sa)
        sb2 = np.where(swap, sa, sb)
        if len(a) == 0:
            return _inter_table([], [], [], [], [])
        # vectorized partial per-pair intersection counts within the bucket
        order = np.lexsort((b, a))
        a, b, sa2, sb2 = a[order], b[order], sa2[order], sb2[order]
        head = np.ones(len(a), dtype=bool)
        head[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        hstarts = np.nonzero(head)[0]
        hcounts = np.diff(np.concatenate([hstarts, [len(a)]]))
        return _inter_table(
            a[hstarts], b[hstarts], sa2[hstarts], sb2[hstarts], hcounts
        )

    from ray.data.aggregate import Max, Sum

    partials = (
        grams.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_pairs, batch_format="pyarrow")
    )
    totals = partials.groupby(["doc_a", "doc_b"]).aggregate(
        Sum("inter", alias_name="inter"),
        Max("size_a", alias_name="size_a"),
        Max("size_b", alias_name="size_b"),
    )

    # integer threshold (pct/100) so the DuckDB oracle's comparison is
    # value-identical (no decimal-vs-double literal mismatch)
    pct = int(round(min_jaccard * 100))

    def score(batch: pa.Table) -> pa.Table:
        da = batch["doc_a"].to_numpy(zero_copy_only=False)
        db = batch["doc_b"].to_numpy(zero_copy_only=False)
        sa = batch["size_a"].to_numpy(zero_copy_only=False)
        sb = batch["size_b"].to_numpy(zero_copy_only=False)
        inter = batch["inter"].to_numpy(zero_copy_only=False)
        union = sa + sb - inter
        keep = (union > 0) & (100 * inter >= pct * union)
        # float64 division + floor — expression-identical to the SQL twin
        jx = np.zeros(len(da), dtype=np.int64)
        nz = union > 0
        jx[nz] = np.floor(1000.0 * inter[nz] / union[nz]).astype(np.int64)
        t = pa.table(
            {
                "doc_a": pa.array(da, pa.int64()),
                "doc_b": pa.array(db, pa.int64()),
                "jaccard_x1000": pa.array(jx, pa.int64()),
            }
        )
        return t.filter(pa.array(keep))

    return totals.map_batches(score, batch_format="pyarrow")
