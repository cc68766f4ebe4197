"""SimHash near-duplicate detection.

64-bit SimHash over word features (splitmix64-hashed, the same pinned family
as the MinHash stage): sign-sum of feature bit vectors.  Near-dup candidates
come from bucketing on bit-bands (4 × 16-bit bands -> Hamming distance <= 3
guaranteed to collide in >= 1 band), verified by exact Hamming distance —
the classic Charikar/Manku-Jain-Sarma layout, expressed as map_batches +
bucketed groupby like the MinHash path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.functions.hashing import splitmix64

_U64 = np.uint64


def simhash_batch(texts: list[str]) -> np.ndarray:
    out = np.zeros(len(texts), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = t.split()
        if not toks:
            continue
        # vectorized: hash each unique token, expand to ±1 bit contributions
        uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
        hs = np.array(
            [int(splitmix64(np.uint64(hash_bytes(w)))) for w in uniq], dtype=np.uint64
        )
        bitmat = ((hs[:, None] >> bits[None, :]) & _U64(1)).astype(np.int64)
        contrib = (2 * bitmat - 1) * counts[:, None]
        sums = contrib.sum(axis=0)
        out[i] = ((sums > 0).astype(np.uint64) << bits).sum(dtype=np.uint64)
    return out


_token_hash_cache: dict[str, int] = {}


def hash_bytes(s: str) -> int:
    """Deterministic 64-bit value of a token (no Python hash()); memoized —
    corpora have small vocabularies relative to token occurrences."""
    v = _token_hash_cache.get(s)
    if v is None:
        h = np.uint64(0x9E3779B97F4A7C15)
        for b in s.encode("utf-8"):
            h = splitmix64(h ^ np.uint64(b))
        v = int(h)
        if len(_token_hash_cache) > 1_000_000:
            _token_hash_cache.clear()
        _token_hash_cache[s] = v
    return v


def simhash_fingerprints(
    docs: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        sh = simhash_batch(batch[text_col].to_pylist())
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(sh, pa.uint64())}
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def simhash_near_dups(
    docs: ray.data.Dataset,
    text_col: str = "text",
    max_hamming: int = 3,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """(doc_a, doc_b, hamming) pairs with Hamming(simhash) <= max_hamming.

    Candidates: explode each fingerprint into 4 16-bit band keys (band value
    + band index); any pair within Hamming <= 3 shares at least one exact
    band (pigeonhole).  Band-key groupby -> pair emission -> exact Hamming
    verify -> dedup, mirroring the MinHash/LSH physical plan.
    """
    fps = simhash_fingerprints(docs, text_col)

    def explode(batch: pa.Table) -> pa.Table:
        sh = batch["simhash"].to_numpy(zero_copy_only=False)
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        bands = []
        for b in range(4):
            bands.append(((sh >> _U64(16 * b)) & _U64(0xFFFF)) | (_U64(b) << _U64(16)))
        band = np.concatenate(bands)
        return pa.table(
            {
                "band": pa.array(band, pa.uint64()),
                "doc_id": pa.array(np.tile(doc, 4), pa.int64()),
                "simhash": pa.array(np.tile(sh, 4), pa.uint64()),
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


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a ^ b
    cnt = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        cnt += (x & _U64(1)).astype(np.int64)
        x = x >> _U64(1)
    return cnt


def _pairs_table(a, b, ham) -> pa.Table:
    return pa.table(
        {
            "doc_a": pa.array(np.asarray(a, dtype=np.int64), pa.int64()),
            "doc_b": pa.array(np.asarray(b, dtype=np.int64), pa.int64()),
            "hamming": pa.array(np.asarray(ham, dtype=np.int64), pa.int64()),
        }
    )
