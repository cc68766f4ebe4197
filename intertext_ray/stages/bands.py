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
        # D1 dedup: duplicate (band, doc, window) triples can ONLY arise
        # within one window's 85 keys (equal value-tuples at different band
        # offsets), so detect with a cheap per-row sort; rebuild (rare path)
        # only the rows that actually contain duplicates.
        srt = np.sort(keys, axis=1)
        dup_rows = np.nonzero((srt[:, 1:] == srt[:, :-1]).any(axis=1))[0]
        if len(dup_rows):
            docs_arr = batch["doc_id"].to_numpy(zero_copy_only=False)
            wins_arr = batch["window_id"].to_numpy(zero_copy_only=False)
            clean = np.ones(n, dtype=bool)
            clean[dup_rows] = False
            parts_b = [keys[clean].reshape(-1)]
            parts_d = [np.repeat(docs_arr[clean], n_bands)]
            parts_w = [np.repeat(wins_arr[clean], n_bands)]
            for r in dup_rows:
                u = np.unique(keys[r])
                parts_b.append(u)
                parts_d.append(np.full(len(u), docs_arr[r], np.uint64))
                parts_w.append(np.full(len(u), wins_arr[r], np.int64))
            band = np.concatenate(parts_b)
            doc = np.concatenate(parts_d)
            win = np.concatenate(parts_w)
        return pa.table(
            {
                "band": pa.array(band, pa.uint64()),
                "doc_id": pa.array(doc, pa.uint64()),
                "window_id": pa.array(win.astype(np.int32), pa.int32()),
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
