"""SimHash near-duplicate detection.

64-bit SimHash over word features (splitmix64-chained token hashes, the same
pinned family as the MinHash stage): sign-sum of feature bit vectors.
Near-dup candidates come from bucketing on bit-bands whose COUNT IS DERIVED
FROM THE RADIUS — splitting 64 bits into ``max_hamming + 1`` contiguous bands
guarantees (pigeonhole) that any pair within Hamming ``max_hamming`` agrees
exactly on at least one band — verified by exact Hamming distance.  This is
the classic Charikar/Manku-Jain-Sarma layout, expressed as map_batches +
bucketed groupby like the MinHash path (reference analog: the LSH band
pipeline, ``/root/reference/intertext/intertext.py:363-453``).

Everything is vectorized over the Arrow string buffers: tokenization via
``pyarrow.compute.utf8_split_whitespace``, token hashing as a splitmix64
chain iterated per byte POSITION (max-token-length passes over the whole
flat token array, no per-token Python), per-doc bit sums via
``np.add.reduceat`` over the list offsets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from intertext_ray.functions.hashing import splitmix64

_U64 = np.uint64
_GAMMA = _U64(0x9E3779B97F4A7C15)


def hash_bytes(s: str) -> int:
    """Deterministic 64-bit value of one token (scalar reference used by
    tests; the batch path is :func:`_chain_hash_tokens`).  Chain:
    ``h = GAMMA; for byte: h = splitmix64(h ^ byte)``."""
    h = _GAMMA
    for b in s.encode("utf-8"):
        h = splitmix64(h ^ _U64(b))
    return int(h)


def _chain_hash_tokens(arr: pa.Array) -> np.ndarray:
    """Vectorized splitmix64 chain over an Arrow string array's utf-8
    buffers: one pass per BYTE POSITION (bounded by the longest token), each
    pass a vectorized xor+splitmix over every still-active token."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    n = len(arr)
    h = np.full(n, _GAMMA, dtype=_U64)
    if n == 0:
        return h
    starts = offsets[:-1]
    ends = offsets[1:]
    max_len = int((ends - starts).max()) if n else 0
    for p in range(max_len):
        idx = starts + p
        active = idx < ends
        ia = idx[active]
        h[active] = splitmix64(h[active] ^ data[ia].astype(_U64))
    return h


def simhash_batch(texts) -> np.ndarray:
    """Batch of texts -> uint64 SimHash fingerprints (docs with no tokens
    hash to 0).  Fully vectorized: tokenize (Arrow), chain-hash the flat
    token array, per-doc signed bit sums via ``reduceat``."""
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(list(texts), pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    out = np.zeros(n_docs, dtype=_U64)
    if n_docs == 0:
        return out
    toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(texts))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    tok_counts = np.asarray(
        pc.list_value_length(toks).to_numpy(zero_copy_only=False), dtype=np.int64
    )
    # utf8_split_whitespace of '' yields [''] — treat empty-string tokens as
    # absent (str.split() semantics)
    tok_hash = _chain_hash_tokens(flat)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    valid = lens > 0
    # signed bit contributions, reduced per doc over the flat layout
    bits = np.arange(64, dtype=_U64)
    bitmat = ((tok_hash[:, None] >> bits[None, :]) & _U64(1)).astype(np.int64)
    contrib = 2 * bitmat - 1
    contrib[~valid] = 0
    doc_starts = np.concatenate([[0], np.cumsum(tok_counts)[:-1]])
    nonempty = tok_counts > 0
    if nonempty.any():
        sums = np.add.reduceat(contrib, doc_starts[nonempty], axis=0)
        fp = ((sums > 0).astype(_U64) << bits[None, :]).sum(axis=1, dtype=_U64)
        out[nonempty] = fp
    return out


def simhash_fingerprints(
    docs: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        sh = simhash_batch(batch[text_col])
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(sh, pa.uint64())}
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def band_layout(max_hamming: int) -> list[tuple[int, int]]:
    """(shift, width) per band: 64 bits split into ``max_hamming + 1``
    contiguous bands (minimum 4), widths differing by at most one.  With
    ``h + 1`` bands, any two fingerprints within Hamming ``h`` agree on at
    least one full band (pigeonhole) — guaranteed candidate recall."""
    n_bands = max(4, int(max_hamming) + 1)
    base, extra = divmod(64, n_bands)
    layout = []
    shift = 0
    for b in range(n_bands):
        width = base + (1 if b < extra else 0)
        layout.append((shift, width))
        shift += width
    return layout


def simhash_near_dups(
    docs: ray.data.Dataset,
    text_col: str = "text",
    max_hamming: int = 3,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """(doc_a, doc_b, hamming) pairs with Hamming(simhash) <= max_hamming —
    EXACT (full recall): the band count is derived from the radius
    (:func:`band_layout`), so every qualifying pair collides in >= 1 band;
    collisions are verified by exact Hamming distance and deduped.
    Band-key groupby -> pair emission -> exact verify -> dedup, mirroring
    the MinHash/LSH physical plan.
    """
    fps = simhash_fingerprints(docs, text_col)
    layout = band_layout(max_hamming)

    def explode(batch: pa.Table) -> pa.Table:
        sh = batch["simhash"].to_numpy(zero_copy_only=False)
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        bands = []
        for i, (shift, width) in enumerate(layout):
            mask = _U64((1 << width) - 1)
            bands.append(((sh >> _U64(shift)) & mask) | (_U64(i) << _U64(32)))
        band = np.concatenate(bands)
        k = len(layout)
        return pa.table(
            {
                "band": pa.array(band, pa.uint64()),
                "doc_id": pa.array(np.tile(doc, k), pa.int64()),
                "simhash": pa.array(np.tile(sh, k), pa.uint64()),
            }
        )

    nb = _U64(num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        band = t["band"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((splitmix64(band) % nb).astype(np.int64))
        )

    def emit(group: pa.Table) -> pa.Table:
        from intertext_ray.stages.candidates import pairs_within_runs

        band = group["band"].to_numpy(zero_copy_only=False)
        doc = group["doc_id"].to_numpy(zero_copy_only=False)
        sh = group["simhash"].to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, band))
        band, doc, sh = band[order], doc[order], sh[order]
        n = len(band)
        if n == 0:
            return _pairs_table([], [], [])
        starts = np.concatenate(
            [[0], np.nonzero(band[1:] != band[:-1])[0] + 1]
        )
        counts = np.diff(np.concatenate([starts, [n]]))
        ii, jj = pairs_within_runs(counts)
        da, db, ha, hb = doc[ii], doc[jj], sh[ii], sh[jj]
        keep = da != db
        da, db, ha, hb = da[keep], db[keep], ha[keep], hb[keep]
        ham = hamming64(ha, hb)
        keep = ham <= max_hamming
        da, db, ham = da[keep], db[keep], ham[keep]
        swap = da > db
        a = np.where(swap, db, da)
        b = np.where(swap, da, db)
        return _pairs_table(a, b, ham)

    def dedup(group: pa.Table) -> pa.Table:
        da = group["doc_a"].to_numpy(zero_copy_only=False)
        db = group["doc_b"].to_numpy(zero_copy_only=False)
        hm = group["hamming"].to_numpy(zero_copy_only=False)
        order = np.lexsort((hm, db, da))
        da, db, hm = da[order], db[order], hm[order]
        keep = np.ones(len(da), dtype=bool)
        if len(da) > 1:
            keep[1:] = ~((da[1:] == da[:-1]) & (db[1:] == db[:-1]))
        return _pairs_table(da[keep], db[keep], hm[keep])

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        da = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        db = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "bucket", pa.array(((splitmix64(da) ^ db) % nb).astype(np.int64))
        )

    pairs = (
        fps.map_batches(explode, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(emit, batch_format="pyarrow")
    )
    return (
        pairs.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(dedup, batch_format="pyarrow")
    )


_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1
).astype(np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a^b via a byte lookup table (8 lookups, not a
    64-iteration shift loop)."""
    x = (np.asarray(a, _U64) ^ np.asarray(b, _U64)).view(np.uint8)
    return _POP8[x.reshape(-1, 8)].sum(axis=1)


def _pairs_table(a, b, ham) -> pa.Table:
    return pa.table(
        {
            "doc_a": pa.array(np.asarray(a, dtype=np.int64), pa.int64()),
            "doc_b": pa.array(np.asarray(b, dtype=np.int64), pa.int64()),
            "hamming": pa.array(np.asarray(ham, dtype=np.int64), pa.int64()),
        }
    )


def simhash_clusters(
    docs: ray.data.Dataset,
    text_col: str = "text",
    max_hamming: int = 3,
    num_buckets: int = 64,
) -> pa.Table:
    """(doc_id, dup_cluster_id) — connected components with min-member
    labels over the exact :func:`simhash_near_dups` pairs (driver
    union-find; the radius-verified pair graph is ≪ corpus — same
    justification and distributed escape hatch as
    ``stages/cluster.components_from_matches``).  The SQL twin re-derives
    everything from the raw table: simhash fingerprints -> bit_count
    Hamming pairs -> recursive min-label closure."""
    from intertext_ray.stages.cluster import _cc_min_label

    pairs = simhash_near_dups(docs, text_col, max_hamming, num_buckets)
    aa, bb = [], []
    for batch in pairs.iter_batches(batch_format="pyarrow"):
        aa.append(batch["doc_a"].to_numpy(zero_copy_only=False))
        bb.append(batch["doc_b"].to_numpy(zero_copy_only=False))
    if not aa or not sum(len(x) for x in aa):
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "dup_cluster_id": pa.array([], pa.int64()),
            }
        )
    u = np.concatenate(aa).astype(np.int64)
    v = np.concatenate(bb).astype(np.int64)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    label = _cc_min_label(inv[: len(u)], inv[len(u) :], len(nodes))
    return pa.table(
        {
            "doc_id": pa.array(nodes, pa.int64()),
            "dup_cluster_id": pa.array(nodes[label], pa.int64()),
        }
    )
