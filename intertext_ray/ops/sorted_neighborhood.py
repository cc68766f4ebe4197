"""Sorted-neighborhood (SortingLSH) near-duplicate detection.

The classic blocking alternative to banded LSH (Hernandez-Stolfo merge/purge;
"SortingLSH" in web-dedup practice): sort every document by a locality-
preserving fingerprint and compare each doc only against its ``window``
nearest rank-neighbors.  Near-identical docs get near-identical SimHash
fingerprints, so they land adjacent in fingerprint order; the window scan
finds them with O(n * window) comparisons and NO candidate explosion on hot
bands (the failure mode banded LSH needs caps for).

Ray-Data-first physical plan (no global sort operator, no driver data):

1. fingerprint: the vectorized SimHash kernel (``ops/simhash.simhash_batch``).
2. exact global ranks by ``(simhash, doc_id)`` via the two-phase prefix scan
   (same shape as ``ops/packing.assign_chunks``): order-preserving range
   partition on the TOP BITS of the fingerprint -> one tiny per-partition
   count aggregate to the driver -> cumsum -> broadcast offsets -> each
   partition sorts locally and adds its offset.  Partitioning by a monotone
   function of the sort key makes local rank + offset == global rank.
3. rank-block pairing with GHOST rows: row at global rank r goes to block
   ``r // block_size``; rows with ``r % block_size < window`` are also
   copied to the previous block.  Every pair with rank gap <= window then
   lives in exactly one block (the lower rank's block, since
   window <= block_size), and ranks inside a block are CONSECUTIVE integers
   so pairing is ``window`` vectorized index shifts, not a join.
4. exact verify: Hamming(simhash) <= max_hamming (byte-LUT popcount).

Exchange volume: two shuffles of a slim (rank, doc_id, fingerprint) triple —
24 bytes/row + ghosts (window/block_size overhead, <1% at the defaults).
Skew caveat: step 2's range partition inherits the key distribution exactly
like any sort does; a degenerate corpus where most fingerprints are EQUAL
(e.g. all-empty transcripts) concentrates one partition.  ``part_bits``
trades partition count vs. size; equal keys must share a partition for rank
exactness, so the mitigation for a pathological equal-key pile-up is
upstream filtering (empty docs), not salting.

Reference analog: the LSH band pipeline this complements,
``/root/reference/intertext/intertext.py:363-453``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from intertext_ray.ops.simhash import hamming64, simhash_fingerprints

_U64 = np.uint64


def _pairs_table(a, b, gap, ham) -> pa.Table:
    return pa.table(
        {
            "doc_a": pa.array(np.asarray(a, dtype=np.int64), pa.int64()),
            "doc_b": pa.array(np.asarray(b, dtype=np.int64), pa.int64()),
            "rank_gap": pa.array(np.asarray(gap, dtype=np.int64), pa.int64()),
            "hamming": pa.array(np.asarray(ham, dtype=np.int64), pa.int64()),
        }
    )


def _rotl(f: np.ndarray, r: int) -> np.ndarray:
    """uint64 rotate-left (r=0 is the identity; numpy shifts by 64 are UB)."""
    if r % 64 == 0:
        return f
    r = r % 64
    return (f << _U64(r)) | (f >> _U64(64 - r))


def sorted_neighbor_dups(
    docs: ray.data.Dataset,
    text_col: str = "text",
    window: int = 8,
    max_hamming: int = 8,
    part_bits: int = 6,
    block_size: int = 4096,
) -> ray.data.Dataset:
    """(doc_a, doc_b, rank_gap, hamming): all pairs whose global ranks in
    ``(simhash, doc_id)`` order differ by at most ``window`` AND whose
    fingerprints are within Hamming ``max_hamming``.  ``doc_a`` is the
    LOWER-RANK doc (not the smaller id) — rank order is the semantic the
    operator is about, and it keeps the SQL twin a pure row_number join.

    Deterministic: ranks are a total order, so output is partition-layout
    invariant (pinned in tests).  ``window <= block_size`` is required for
    the one-block-per-pair guarantee.
    """
    fps = simhash_fingerprints(docs, text_col)
    return _ordering_pairs(
        fps, 0, window, max_hamming, part_bits, block_size
    )


def _ordering_pairs(
    fps: ray.data.Dataset,
    rot: int,
    window: int,
    max_hamming: int,
    part_bits: int,
    block_size: int,
) -> ray.data.Dataset:
    """The rank/block/pair core for ONE ordering: sort key is the
    fingerprint rotated left by ``rot`` bits (Hamming distance is
    rotation-invariant, so ``hamming`` rides unchanged)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    if window > block_size:
        raise ValueError("window must be <= block_size")

    shift = _U64(64 - part_bits)

    def add_part(b: pa.Table) -> pa.Table:
        sh = _rotl(b["simhash"].to_numpy(zero_copy_only=False), rot)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "simhash": b["simhash"],
                "key": pa.array(sh, pa.uint64()),
                "part": pa.array((sh >> shift).astype(np.int64), pa.int64()),
            }
        )

    parted = fps.map_batches(add_part, batch_format="pyarrow")

    # phase 1: per-partition row counts — one tiny row per partition
    counts = parted.groupby("part").count().to_pandas()
    counts = counts.sort_values("part")
    parts = counts["part"].to_numpy().astype(np.int64)
    sums = counts["count()"].to_numpy().astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])
    off_ref = ray.put({int(p): int(o) for p, o in zip(parts, offsets)})

    w = int(window)
    bs = int(block_size)

    # phase 2: local sort + offset = exact global rank; emit rank-block
    # rows, duplicating the first `window` ranks of each block into the
    # previous block (ghosts) so every rank-window pair is block-local.
    def rank_and_block(group: pa.Table) -> pa.Table:
        key = group["key"].to_numpy(zero_copy_only=False)
        sh = group["simhash"].to_numpy(zero_copy_only=False)
        d = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((d, key))
        key, sh, d = key[order], sh[order], d[order]
        off = ray.get(off_ref)[int(key[0] >> shift)] if len(key) else 0
        rank = off + np.arange(len(key), dtype=np.int64)
        block = rank // bs
        ghost = (rank % bs < w) & (block > 0)
        return pa.table(
            {
                "block": pa.array(
                    np.concatenate([block, block[ghost] - 1]), pa.int64()
                ),
                "rank": pa.array(np.concatenate([rank, rank[ghost]])),
                "doc_id": pa.array(np.concatenate([d, d[ghost]])),
                "simhash": pa.array(
                    np.concatenate([sh, sh[ghost]]), pa.uint64()
                ),
            }
        )

    ranked = parted.groupby("part").map_groups(
        rank_and_block, batch_format="pyarrow"
    )

    # phase 3: per-block pairing.  Ranks in a block are consecutive ints
    # (own rows kB..kB+B-1 plus ghosts kB+B..kB+B+w-1), so neighbor pairs
    # are `window` vectorized shifts over the rank-sorted arrays.
    def emit(group: pa.Table) -> pa.Table:
        rank = group["rank"].to_numpy(zero_copy_only=False)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        sh = group["simhash"].to_numpy(zero_copy_only=False)
        blk = int(group["block"][0].as_py()) if len(rank) else 0
        order = np.argsort(rank, kind="stable")
        rank, d, sh = rank[order], d[order], sh[order]
        n = len(rank)
        own = rank < (blk + 1) * bs  # ghosts only ever pair as the b side
        aa, bb, gg, hh = [], [], [], []
        for g in range(1, w + 1):
            if g >= n:
                break
            lo = slice(None, n - g)
            hi = slice(g, None)
            keep = own[lo] & (rank[hi] - rank[lo] == g)
            if not keep.any():
                continue
            ham = hamming64(sh[lo][keep], sh[hi][keep])
            ok = ham <= max_hamming
            aa.append(d[lo][keep][ok])
            bb.append(d[hi][keep][ok])
            gg.append(np.full(int(ok.sum()), g, dtype=np.int64))
            hh.append(ham[ok])
        if not aa:
            return _pairs_table([], [], [], [])
        return _pairs_table(
            np.concatenate(aa),
            np.concatenate(bb),
            np.concatenate(gg),
            np.concatenate(hh),
        )

    return ranked.groupby("block").map_groups(emit, batch_format="pyarrow")


def sorted_neighbor_dups_multi(
    docs: ray.data.Dataset,
    text_col: str = "text",
    window: int = 4,
    max_hamming: int = 8,
    n_orderings: int = 4,
    part_bits: int = 6,
    block_size: int = 4096,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """(doc_a, doc_b, hamming), doc_a < doc_b by ID: the UNION over
    ``n_orderings`` sort orders — ordering r sorts by the fingerprint
    rotated left ``r * (64 // n_orderings)`` bits — of the rank-window
    pairs within Hamming ``max_hamming``.  The standard SortingLSH recall
    fix: a qualifying pair missed in one ordering (separated by > window
    unrelated docs there) is found in another where its differing bits
    rotate out of the most-significant positions.

    Scale: per-ordering cost is the single-ordering pipeline (the slim
    fingerprint map is recomputed per branch — 16 B/row of re-read, far
    cheaper than materializing a corpus-sized cache); the final dedup is
    the same capped bucketed pair shuffle as `ops/simhash`."""
    from intertext_ray.functions.hashing import splitmix64

    fps = simhash_fingerprints(docs, text_col)
    step = 64 // int(n_orderings)
    branches = [
        _ordering_pairs(
            fps, r * step, window, max_hamming, part_bits, block_size
        )
        for r in range(int(n_orderings))
    ]
    pairs = branches[0]
    if len(branches) > 1:
        pairs = pairs.union(*branches[1:])

    nb = np.uint64(num_buckets)

    def canon(t: pa.Table) -> pa.Table:
        da = t["doc_a"].to_numpy(zero_copy_only=False)
        db = t["doc_b"].to_numpy(zero_copy_only=False)
        hm = t["hamming"].to_numpy(zero_copy_only=False)
        a = np.minimum(da, db)
        b = np.maximum(da, db)
        bucket = (splitmix64(a.astype(np.uint64)) ^ b.astype(np.uint64)) % nb
        return pa.table(
            {
                "doc_a": pa.array(a, pa.int64()),
                "doc_b": pa.array(b, pa.int64()),
                "hamming": pa.array(hm, pa.int64()),
                "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
            }
        )

    def dedup(group: pa.Table) -> pa.Table:
        da = group["doc_a"].to_numpy(zero_copy_only=False)
        db = group["doc_b"].to_numpy(zero_copy_only=False)
        hm = group["hamming"].to_numpy(zero_copy_only=False)
        order = np.lexsort((hm, db, da))
        da, db, hm = da[order], db[order], hm[order]
        keep = np.ones(len(da), dtype=bool)
        if len(da) > 1:
            keep[1:] = ~((da[1:] == da[:-1]) & (db[1:] == db[:-1]))
        return pa.table(
            {
                "doc_a": pa.array(da[keep], pa.int64()),
                "doc_b": pa.array(db[keep], pa.int64()),
                "hamming": pa.array(hm[keep], pa.int64()),
            }
        )

    return (
        pairs.map_batches(canon, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(dedup, batch_format="pyarrow")
    )
