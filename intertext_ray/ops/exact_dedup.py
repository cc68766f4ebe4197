"""Exact deduplication: hash-partition + per-group first (guide pattern).

Content hash is computed vectorized per batch; the shuffle moves only
(hash, doc_id) plus whatever payload columns the caller keeps.  Keeper =
minimum doc_id per identical text (deterministic).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data


def add_content_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    h = [hashlib.sha1(t.encode("utf-8")).hexdigest() for t in batch[col].to_pylist()]
    return batch.append_column("content_hash", pa.array(h, pa.string()))


def exact_dedup(
    docs: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep the minimum-id row of every identical-text group."""

    def first(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False)
        return group.take([int(np.argmin(ids))])

    return (
        docs.map_batches(
            lambda b: add_content_hash(b, text_col), batch_format="pyarrow"
        )
        .groupby("content_hash")
        .map_groups(first, batch_format="pyarrow")
        .drop_columns(["content_hash"])
    )


def duplicate_groups(
    docs: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """(content_hash, n_dups, keeper_id) for every text with > 1 copy."""

    def summarize(group: pa.Table) -> pa.Table:
        if len(group) < 2:
            return pa.table(
                {
                    "content_hash": pa.array([], pa.string()),
                    "n_dups": pa.array([], pa.int64()),
                    "keeper_id": pa.array([], pa.int64()),
                }
            )
        ids = group[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "content_hash": group["content_hash"].slice(0, 1),
                "n_dups": pa.array([len(group)], pa.int64()),
                "keeper_id": pa.array([int(ids.min())], pa.int64()),
            }
        )

    return (
        docs.map_batches(
            lambda b: add_content_hash(b, text_col), batch_format="pyarrow"
        )
        .groupby("content_hash")
        .map_groups(summarize, batch_format="pyarrow")
    )
