"""Deterministic corpus sampling/splitting for training-data pipelines.

A 100 TB pipeline cannot hold a split assignment table: membership must be
a pure function of the row key so any stage (and any re-run after resume)
computes the same split with zero shuffle and zero state.  That is the
hash-split idiom: ``splitmix64(doc_id ^ salt) % 1000`` against a permille
threshold — content-independent, cluster-size-independent, and
re-derivable row-locally inside any ``map_batches``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from intertext_ray.functions.hashing import splitmix64


def hash_split(
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
    permille_train: int = 900,
    salt: int = 0,
) -> ray.data.Dataset:
    """(id, split) with split in {'train', 'val'}: train iff
    ``splitmix64(id ^ salt) % 1000 < permille_train``.  ``salt`` yields
    independent re-splits without touching the data."""
    s = np.uint64(salt)

    def fn(b: pa.Table) -> pa.Table:
        d = b[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = splitmix64(d ^ s) % np.uint64(1000)
        split = np.where(h < permille_train, "train", "val")
        return pa.table(
            {
                id_col: pc.cast(b[id_col], pa.int64()),
                "split": pa.array(split.tolist(), pa.string()),
            }
        )

    return docs.select_columns([id_col]).map_batches(
        fn, batch_format="pyarrow"
    )
