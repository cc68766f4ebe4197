"""Exact deduplication: hash-partition + vectorized first-per-key.

Content hash (sha1, split into two uint64 columns) is computed per batch;
the shuffle is ONE bucketed groupby — inside each bucket a vectorized sort +
boundary mask keeps the minimum-id row per identical text (no per-distinct-
text ``map_groups`` calls: one Python call per BUCKET, the same physical
plan as the LSH candidate dedup, ``stages/candidates.py:170``).

Keeper = minimum doc_id per identical text (deterministic); grouping is by
the 128-bit sha1 prefix, so two distinct texts collide with probability
~2^-128 (cryptographic), never at corpus scale.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data


def add_content_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append ch1/ch2 (uint64 halves of the sha1-128 prefix).  sha1 runs at
    C speed per row; the numeric columns keep the shuffle and the in-bucket
    sort fully vectorized."""
    digs = [
        hashlib.sha1(t.encode("utf-8")).digest()[:16]
        for t in batch[col].to_pylist()
    ]
    buf = np.frombuffer(b"".join(digs), dtype=np.uint64).reshape(-1, 2) if digs \
        else np.empty((0, 2), dtype=np.uint64)
    batch = batch.append_column("ch1", pa.array(buf[:, 0], pa.uint64()))
    return batch.append_column("ch2", pa.array(buf[:, 1], pa.uint64()))


def _first_per_hash(group: pa.Table, id_col: str) -> pa.Table:
    """Vectorized keeper selection inside one bucket: sort by (hash, id),
    keep run heads."""
    h1 = group["ch1"].to_numpy(zero_copy_only=False)
    h2 = group["ch2"].to_numpy(zero_copy_only=False)
    ids = group[id_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, h2, h1))
    keep = np.ones(len(order), dtype=bool)
    if len(order) > 1:
        s1, s2 = h1[order], h2[order]
        keep[1:] = (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])
    return group.take(order[keep])


def exact_dedup(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Keep the minimum-id row of every identical-text group."""
    nb = np.uint64(num_buckets)

    def hash_and_bucket(b: pa.Table) -> pa.Table:
        t = add_content_hash(b, text_col)
        h1 = t["ch1"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((h1 % nb).astype(np.int64)))

    return (
        docs.map_batches(hash_and_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: _first_per_hash(g, id_col), batch_format="pyarrow")
        .drop_columns(["ch1", "ch2", "bucket"])
    )


def duplicate_groups(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """(content_hash, n_dups, keeper_id) for every text with > 1 copy —
    same bucketed plan, vectorized run-length summary per bucket."""
    nb = np.uint64(num_buckets)

    def hash_and_bucket(b: pa.Table) -> pa.Table:
        t = add_content_hash(b, text_col)
        h1 = t["ch1"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((h1 % nb).astype(np.int64)))

    def summarize(group: pa.Table) -> pa.Table:
        h1 = group["ch1"].to_numpy(zero_copy_only=False)
        h2 = group["ch2"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h2, h1))
        s1, s2, si = h1[order], h2[order], ids[order]
        n = len(order)
        if n == 0:
            return pa.table(
                {
                    "content_hash": pa.array([], pa.string()),
                    "n_dups": pa.array([], pa.int64()),
                    "keeper_id": pa.array([], pa.int64()),
                }
            )
        head = np.ones(n, dtype=bool)
        head[1:] = (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])
        starts = np.nonzero(head)[0]
        counts = np.diff(np.concatenate([starts, [n]]))
        multi = counts > 1
        starts, counts = starts[multi], counts[multi]
        hexes = [f"{s1[i]:016x}{s2[i]:016x}" for i in starts]
        return pa.table(
            {
                "content_hash": pa.array(hexes, pa.string()),
                "n_dups": pa.array(counts.astype(np.int64), pa.int64()),
                "keeper_id": pa.array(
                    si[starts].astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        docs.map_batches(hash_and_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(summarize, batch_format="pyarrow")
    )
