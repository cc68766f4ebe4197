"""MinHash signature stage — stateful actor pool (reference MH1,
``/root/reference/intertext/intertext.py:104, 376-390``).

The permutation seeds (the reference's module-global ``hasher`` state,
inherited by fork) live in actor ``__init__`` — built once per actor, reused
for every batch.  The batch body is fully vectorized: the lowercased window
bytes are taken zero-copy from the Arrow string buffers, char-4-grams are
hashed over the whole concatenated buffer, and per-window minima come from
``np.minimum.reduceat`` — no Python loop over rows.
"""

from __future__ import annotations

import pyarrow as pa

from intertext_ray.config import IntertextConfig
from intertext_ray.functions.hashing import minhash_texts, perm_seeds


class MinHasher:
    """Callable-class actor: ``map_batches(MinHasher, fn_constructor_args=(cfg,),
    concurrency=N, batch_format='pyarrow')``."""

    def __init__(self, cfg: IntertextConfig | None = None):
        self.cfg = cfg or IntertextConfig()
        self.seeds = perm_seeds(self.cfg.n_half, self.cfg.hash_seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        sig = minhash_texts(
            batch["text"], self.seeds, cfg.chargram_length, cfg.mirror
        )
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sig.reshape(-1), pa.uint32()), cfg.n_perm
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "window_id": batch["window_id"],
                "sig": sig_col,
            }
        )


def signatures_stage(windows, cfg: IntertextConfig, pre_split: bool = True):
    """windows Dataset -> signatures Dataset via an actor pool."""
    # actor-pool task granularity = upstream blocks; a windows table arriving
    # as a handful of big blocks would cap the pool at that parallelism, so
    # split first (block slicing, no data movement)
    from intertext_ray.stages import maybe_split

    if pre_split:
        windows = maybe_split(windows, 4 * cfg.minhash_concurrency)
    # autoscaling pool (1, N): a fixed pool of N can reserve every CPU on a
    # small cluster and starve the upstream read / downstream write tasks
    # (deadlock) — the min=1 floor lets the scheduler balance stages.
    return windows.map_batches(
        MinHasher,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.minhash_batch_size,
        concurrency=(max(1, cfg.minhash_concurrency // 4), cfg.minhash_concurrency),
        num_cpus=1,
        zero_copy_batch=True,
    )
