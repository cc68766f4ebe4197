"""Match verification — two (doc,window)->text joins + the exact difflib
scorer (reference J1+F1+N4, ``/root/reference/intertext/intertext.py:479-510,
1261-1263``).

Join strategies (cfg.join_strategy):

- ``"hash"``    — explicit partitioned hash join: both sides bucketed by
  ``doc % B`` and co-grouped (``groupby('bucket').map_groups``), side A and
  side B resolved in two passes; scales to windows tables that fit no single
  node.  (Ray's ``Dataset.join`` exists in this version; we keep the explicit
  bucket join because it lets the text-resolution and the verify scorer live
  in the same co-partitioned pass and its partitioning is documented.)
- ``"broadcast"`` — windows table materialized once, ``ray.put``, looked up
  per batch inside the verify task.  Right when the windows table is small
  relative to cluster memory (e.g. driver-side correctness runs).

The scorer itself is per-pair Python difflib BY DESIGN — it is the
reference's correctness anchor (SURVEY.md §2.8 F1) and runs only on the
LSH-thinned candidate set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from intertext_ray.config import IntertextConfig
from intertext_ray.functions.similarity import verify_pair

_U64 = np.uint64


def _verify_batch(batch: pa.Table, cfg: IntertextConfig) -> pa.Table:
    """(doc_a, doc_b, win_a, win_b, text_a, text_b) -> matches rows."""
    ta = batch["text_a"].to_pylist()
    tb = batch["text_b"].to_pylist()
    sims = np.empty(len(ta), dtype=np.int32)
    keep = np.zeros(len(ta), dtype=bool)
    for i, (a, b) in enumerate(zip(ta, tb)):
        s = verify_pair(a, b, cfg.min_sim, cfg.window_length, cfg.junk_single_char_frac)
        if s is not None:
            keep[i] = True
            sims[i] = s
    out = batch.select(["doc_a", "doc_b", "win_a", "win_b"]).filter(
        pa.array(keep)
    )
    return out.append_column("similarity", pa.array(sims[keep], pa.int32()))


def verify_broadcast(candidates, windows, cfg: IntertextConfig):
    """Broadcast join: windows -> {doc_id: {window_id: text}} via ray.put."""
    lookup: dict[int, dict[int, str]] = {}
    for b in windows.iter_batches(batch_size=65536, batch_format="pyarrow"):
        docs = b["doc_id"].to_numpy(zero_copy_only=False)
        wins = b["window_id"].to_numpy(zero_copy_only=False)
        texts = b["text"].to_pylist()
        for d, w, t in zip(docs, wins, texts):
            lookup.setdefault(int(d), {})[int(w)] = t
    ref = ray.put(lookup)

    class Verifier:
        def __init__(self):
            self.lookup = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            da = batch["doc_a"].to_numpy(zero_copy_only=False)
            db = batch["doc_b"].to_numpy(zero_copy_only=False)
            wa = batch["win_a"].to_numpy(zero_copy_only=False)
            wb = batch["win_b"].to_numpy(zero_copy_only=False)
            ta, tb = [], []
            for i in range(len(da)):
                ta.append(self.lookup[int(da[i])][int(wa[i])])
                tb.append(self.lookup[int(db[i])][int(wb[i])])
            t = batch.append_column("text_a", pa.array(ta, pa.string()))
            t = t.append_column("text_b", pa.array(tb, pa.string()))
            return _verify_batch(t, cfg)

    return candidates.map_batches(
        Verifier,
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, cfg.minhash_concurrency),
        num_cpus=1,
    )


def _resolve_side(candidates, windows, side: str, num_buckets: int):
    """One partitioned hash join pass: attach ``text_<side>`` to candidates.

    Both sides get ``bucket = doc % B``; a union is co-grouped by bucket and
    the lookup happens vectorized (pandas merge) inside each bucket group.
    """
    doc_col = f"doc_{side}"
    win_col = f"win_{side}"
    text_col = f"text_{side}"
    nb = np.int64(num_buckets)

    def tag_windows(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((doc % _U64(nb)).astype(np.int64)),
                "kind": pa.array(np.zeros(len(t), np.int8)),
                "doc": t["doc_id"],
                "win": t["window_id"],
                "text": t["text"],
                # candidate payload columns, null on the windows side
                "doc_a": pa.nulls(len(t), pa.uint64()),
                "doc_b": pa.nulls(len(t), pa.uint64()),
                "win_a": pa.nulls(len(t), pa.int32()),
                "win_b": pa.nulls(len(t), pa.int32()),
                "other_text": pa.nulls(len(t), pa.string()),
            }
        )

    have_other = "text_a" if side == "b" else None

    def tag_cands(t: pa.Table) -> pa.Table:
        doc = t[doc_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array((doc % _U64(nb)).astype(np.int64)),
                "kind": pa.array(np.ones(len(t), np.int8)),
                "doc": t[doc_col],
                "win": t[win_col],
                "text": pa.nulls(len(t), pa.string()),
                "doc_a": t["doc_a"],
                "doc_b": t["doc_b"],
                "win_a": t["win_a"],
                "win_b": t["win_b"],
                "other_text": t[have_other]
                if have_other
                else pa.nulls(len(t), pa.string()),
            }
        )

    unioned = windows.map_batches(
        tag_windows, batch_format="pyarrow", zero_copy_batch=True
    ).union(candidates.map_batches(tag_cands, batch_format="pyarrow"))

    def join_bucket(g: pa.Table) -> pa.Table:
        import pandas as pd

        df = g.to_pandas()
        wins = df[df["kind"] == 0][["doc", "win", "text"]]
        cands = df[df["kind"] == 1].drop(columns=["text"])
        merged = cands.merge(wins, on=["doc", "win"], how="inner")
        cols = {
            "doc_a": pa.array(merged["doc_a"].to_numpy(np.uint64), pa.uint64()),
            "doc_b": pa.array(merged["doc_b"].to_numpy(np.uint64), pa.uint64()),
            "win_a": pa.array(merged["win_a"].to_numpy(np.int32), pa.int32()),
            "win_b": pa.array(merged["win_b"].to_numpy(np.int32), pa.int32()),
        }
        if have_other:
            cols["text_a"] = pa.array(merged["other_text"].tolist(), pa.string())
        cols[text_col] = pa.array(merged["text"].tolist(), pa.string())
        return pa.table(cols)

    return unioned.groupby("bucket").map_groups(join_bucket, batch_format="pyarrow")


def verify_hash_join(candidates, windows, cfg: IntertextConfig, num_buckets: int = 64):
    withA = _resolve_side(candidates, windows, "a", num_buckets)
    withAB = _resolve_side(withA, windows, "b", num_buckets)
    return withAB.map_batches(
        lambda t: _verify_batch(t, cfg), batch_format="pyarrow", batch_size=8192
    )


def matches_stage(candidates, windows, cfg: IntertextConfig, num_buckets: int = 64):
    if cfg.join_strategy == "broadcast":
        return verify_broadcast(candidates, windows, cfg)
    return verify_hash_join(candidates, windows, cfg, num_buckets)
