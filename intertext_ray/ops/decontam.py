"""Benchmark decontamination — flag training documents that share any
verbatim word-k-gram with an evaluation/benchmark set.

The standard pre-training hygiene step (C4 / The Pile / Llama train-set
decontamination): the eval side is tiny and FIXED-SIZE regardless of the
training-corpus scale (a benchmark suite is ~10^4-10^6 grams even when the
training side is 100 TB), so this is the textbook broadcast-small-side
join — the distinct eval gram hashes are collected once, ``ray.put`` once,
and every training batch membership-tests against the shared sorted array
with ``np.searchsorted``.  No shuffle touches the training side at all:
one streaming pass, gram hashing over the flat Arrow token buffer
(:func:`intertext_ray.ops.substring.gram_positions_batch` — the same
pinned polynomial the exact-substring family and its DuckDB twins use).

If the "eval" side ever ceased to be small, the shuffle twin already
exists: ``substring_dup_pairs`` buckets both sides by gram hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from intertext_ray.ops.substring import gram_positions_batch

_OUT_SCHEMA = pa.schema(
    {
        "doc_id": pa.int64(),
        "n_shared_grams": pa.int64(),
        "contaminated": pa.bool_(),
    }
)


def collect_eval_grams(
    eval_docs: ray.data.Dataset, text_col: str = "text", k: int = 8
) -> np.ndarray:
    """Distinct gram hashes of the benchmark set, as a sorted uint64 array.

    Streamed: each batch contributes its per-batch distinct hashes; the
    driver holds only the running distinct set (eval-suite-sized, not
    corpus-sized).
    """
    parts: list[np.ndarray] = []
    distinct = eval_docs.map_batches(
        lambda b: pa.table(
            {
                "f": pa.array(
                    np.unique(
                        gram_positions_batch(b, text_col, k)["f"].to_numpy(
                            zero_copy_only=False
                        )
                    ),
                    pa.uint64(),
                )
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    for b in distinct.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        parts.append(b["f"].to_numpy(zero_copy_only=False))
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(parts))


def decontaminate(
    train_docs: ray.data.Dataset,
    eval_docs: ray.data.Dataset,
    text_col: str = "text",
    k: int = 8,
) -> ray.data.Dataset:
    """Per training doc: the number of DISTINCT word-``k``-gram hashes it
    shares with ``eval_docs``, and a ``contaminated`` flag (>= 1 shared
    gram).  Docs shorter than ``k`` words report 0 / false.
    """
    eval_f = collect_eval_grams(eval_docs, text_col, k)
    ref = ray.put(eval_f)

    def score(batch: pa.Table) -> pa.Table:
        ev: np.ndarray = ray.get(ref)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        grams = gram_positions_batch(batch, text_col, k)
        f = grams["f"].to_numpy(zero_copy_only=False)
        gd = grams["doc_id"].to_numpy(zero_copy_only=False)
        if len(f) and len(ev):
            idx = np.searchsorted(ev, f)
            idx_c = np.minimum(idx, len(ev) - 1)
            hit = ev[idx_c] == f
        else:
            hit = np.zeros(len(f), dtype=bool)
        counts = pd.Series(0, index=pd.Index(doc_ids, name="doc_id"), dtype=np.int64)
        if hit.any():
            hits = (
                pd.DataFrame({"doc_id": gd[hit], "f": f[hit]})
                .drop_duplicates()
                .groupby("doc_id")
                .size()
            )
            counts.loc[hits.index] = hits.to_numpy()
        n = counts.to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_shared_grams": pa.array(n, pa.int64()),
                "contaminated": pa.array(n > 0),
            },
            schema=_OUT_SCHEMA,
        )

    return train_docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
