"""MinHash signature stage (reference MH1,
``/root/reference/intertext/intertext.py:104, 376-390``).

The permutation seeds (the reference's module-global ``hasher`` state,
inherited by fork) are deterministic and cheap to build, so this stage runs
as a plain **task-pool** ``map_batches`` with the seeds cached once per
worker process (``lru_cache``) — the same amortization an actor pool gives,
without its two failure modes measured on shared-CPU hosts:

- a pool floor equal to the CPU count starves the read/write stages
  (streaming-executor deadlock — hit in the 4-cpu test fixture);
- a low floor never ramps: the autoscaler sat at ~min for the whole stage
  (7.4 effective actors over a 41 s window at 32 cpus with a (8, 32) pool).

Task pools are elastic: every idle CPU picks up a batch, backpressure does
the rest.  Actor pools remain the right call only when per-actor state is
genuinely expensive (model weights, big indexes) — not a 256-int seed array.

The batch body is fully vectorized: the lowercased window bytes are taken
zero-copy from the Arrow string buffers, char-4-grams are hashed over the
whole concatenated buffer, and per-window minima come from
``np.minimum.reduceat`` — no Python loop over rows.
"""

from __future__ import annotations

from functools import lru_cache

import pyarrow as pa

from intertext_ray.config import IntertextConfig
from intertext_ray.functions.hashing import minhash_texts, perm_seeds


@lru_cache(maxsize=8)
def _seeds_cached(n_half: int, hash_seed: int):
    """Per-worker-process seed cache (tasks reuse worker processes)."""
    return perm_seeds(n_half, hash_seed)


def minhash_batch(
    batch: pa.Table,
    *,
    n_half: int,
    hash_seed: int,
    chargram_length: int,
    mirror: bool,
    n_perm: int,
) -> pa.Table:
    """windows batch -> (doc_id, window_id, sig) batch; vectorized."""
    sig = minhash_texts(
        batch["text"], _seeds_cached(n_half, hash_seed), chargram_length, mirror
    )
    sig_col = pa.FixedSizeListArray.from_arrays(
        pa.array(sig.reshape(-1), pa.uint32()), n_perm
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "window_id": batch["window_id"],
            "sig": sig_col,
        }
    )


class MinHasher:
    """Callable-class form of :func:`minhash_batch` (kept for API/back-compat
    and for callers that do want an actor pool)."""

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
    """windows Dataset -> signatures Dataset (task-pool map_batches)."""
    # task granularity = upstream blocks; a windows table arriving as a
    # handful of big blocks would cap parallelism at that block count, so
    # split first (block slicing, no data movement)
    from intertext_ray.stages import maybe_split

    if pre_split:
        windows = maybe_split(windows, 4 * cfg.minhash_concurrency)
    return windows.map_batches(
        minhash_batch,
        fn_kwargs={
            "n_half": cfg.n_half,
            "hash_seed": cfg.hash_seed,
            "chargram_length": cfg.chargram_length,
            "mirror": cfg.mirror,
            "n_perm": cfg.n_perm,
        },
        batch_format="pyarrow",
        batch_size=cfg.minhash_batch_size,
        num_cpus=1,
        zero_copy_batch=True,
    )
