"""Band-explode stage — stateless ``map_batches`` task (reference band
extraction, ``/root/reference/intertext/intertext.py:363-372``).

One signature row -> 85 (band, doc_id, window_id) rows (width 4, stride 3
over the 256 signature values; band *position* is not part of the key, same
as the reference's dotted-string key).  A per-batch ``np.unique`` dedup
replaces the reference's per-file Python-set dedup (D1) — a cheap pre-shuffle
combiner so duplicate triples never enter the band shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from intertext_ray.config import IntertextConfig
from intertext_ray.functions.hashing import band_keys


def make_band_exploder(cfg: IntertextConfig):
    n_perm = cfg.n_perm

    def explode(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.uint64()),
                    "doc_id": pa.array([], pa.uint64()),
                    "window_id": pa.array([], pa.int32()),
                }
            )
        sig_col = batch["sig"]
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        sig = sig_col.flatten().to_numpy(zero_copy_only=False).reshape(n, n_perm)
        keys = band_keys(sig, cfg.hashband_length, cfg.hashband_step, cfg.hash_seed)
        n_bands = keys.shape[1]
        band = keys.reshape(-1)
        doc = np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False), n_bands)
        win = np.repeat(batch["window_id"].to_numpy(zero_copy_only=False), n_bands)
        # D1 dedup: identical (band, doc, window) triples within the batch
        # (equal value-tuples at different band offsets) collapse to one row
        order = np.lexsort((win, doc, band))
        band, doc, win = band[order], doc[order], win[order]
        keep = np.ones(len(band), dtype=bool)
        if len(band) > 1:
            same = (
                (band[1:] == band[:-1])
                & (doc[1:] == doc[:-1])
                & (win[1:] == win[:-1])
            )
            keep[1:] = ~same
        return pa.table(
            {
                "band": pa.array(band[keep], pa.uint64()),
                "doc_id": pa.array(doc[keep], pa.uint64()),
                "window_id": pa.array(win[keep].astype(np.int32), pa.int32()),
            }
        )

    return explode


def hashbands_stage(signatures, cfg: IntertextConfig, batch_size: int = 4096):
    return signatures.map_batches(
        make_band_exploder(cfg),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
