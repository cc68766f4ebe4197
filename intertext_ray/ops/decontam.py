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


_FUZZY_SCHEMA = pa.schema(
    {
        "doc_id": pa.int64(),
        "eval_id": pa.int64(),
        "jaccard_x1000": pa.int64(),
    }
)


def fuzzy_decontam(
    train_docs: ray.data.Dataset,
    eval_docs: ray.data.Dataset,
    text_col: str = "text",
    k: int = 3,
    n_perm: int = 16,
    band_rows: int = 2,
    min_jaccard: float = 0.5,
) -> ray.data.Dataset:
    """NEAR-duplicate decontamination: training docs whose word-``k``-gram
    set is >= ``min_jaccard`` Jaccard-similar to ANY benchmark doc — the
    fuzzy upgrade of :func:`decontaminate` (exact-gram overlap misses a
    lightly paraphrased eval leak; GPT-3/Llama-style audits use n-gram
    overlap, corpus-dedup practice uses MinHash — this is that operator
    against the eval set).

    Returns (doc_id, eval_id, jaccard_x1000) per flagged pair, with the
    SAME pinned MinHash chain, band fold, and integer score contract as
    ``minhash_doc.minhash_doc_dedup`` (pct gate ``100*i >= pct*union``) —
    so the DuckDB twin recomputes the whole thing from the raw tables.

    Scale shape (the decontam broadcast story, one level up): the eval
    side is benchmark-sized by nature, so its band keys AND its distinct
    gram sets are collected once on the driver and broadcast via
    ``ray.put``; the training side is ONE streaming ``map_batches`` pass —
    band keys per batch doc, ``searchsorted`` membership against the
    broadcast eval keys, and exact-Jaccard verification against the
    matched eval gram sets all inside the same task.  Zero corpus
    shuffles; per-batch verify work is candidate-proportional (LSH
    thinning), output is flagged-pair-proportional.
    """
    from intertext_ray.ops.minhash_doc import (
        doc_band_rows_batch,
        doc_minhash_seeds,
    )

    if n_perm % band_rows:
        raise ValueError("n_perm must be a multiple of band_rows")
    seeds = doc_minhash_seeds(n_perm)
    pct = int(min_jaccard * 100)

    # ---- eval side (driver; benchmark-sized) ----
    ev_keys: list[np.ndarray] = []
    ev_key_ids: list[np.ndarray] = []
    ev_gram_parts: list[tuple[np.ndarray, np.ndarray]] = []
    for b in eval_docs.iter_batches(batch_size=4096, batch_format="pyarrow"):
        br = doc_band_rows_batch(b, text_col, k, seeds, band_rows, 1)
        ev_keys.append(br["band_key"].to_numpy(zero_copy_only=False))
        ev_key_ids.append(br["doc_id"].to_numpy(zero_copy_only=False))
        g = gram_positions_batch(b, text_col, k)
        ev_gram_parts.append(
            (
                g["doc_id"].to_numpy(zero_copy_only=False),
                g["f"].to_numpy(zero_copy_only=False),
            )
        )
    if ev_keys:
        keys = np.concatenate(ev_keys)
        kid = np.concatenate(ev_key_ids)
        order = np.argsort(keys, kind="stable")
        keys, kid = keys[order], kid[order]
    else:
        keys = np.empty(0, np.uint64)
        kid = np.empty(0, np.int64)
    # distinct sorted gram array per eval doc
    if ev_gram_parts:
        gd = np.concatenate([p[0] for p in ev_gram_parts])
        gf = np.concatenate([p[1] for p in ev_gram_parts])
        o = np.lexsort((gf, gd))
        gd, gf = gd[o], gf[o]
        keep = np.ones(len(gd), dtype=bool)
        keep[1:] = (gd[1:] != gd[:-1]) | (gf[1:] != gf[:-1])
        gd, gf = gd[keep], gf[keep]
        new = np.ones(len(gd), dtype=bool)
        new[1:] = gd[1:] != gd[:-1]
        starts = np.nonzero(new)[0]
        bounds = np.concatenate([starts, [len(gd)]])
        ev_grams = {
            int(gd[starts[j]]): gf[bounds[j] : bounds[j + 1]]
            for j in range(len(starts))
        }
    else:
        ev_grams = {}
    state = ray.put((keys, kid, ev_grams))

    def score(batch: pa.Table) -> pa.Table:
        ekeys, ekid, egrams = ray.get(state)
        br = doc_band_rows_batch(batch, text_col, k, seeds, band_rows, 1)
        ck = br["band_key"].to_numpy(zero_copy_only=False)
        cd = br["doc_id"].to_numpy(zero_copy_only=False)
        lo = np.searchsorted(ekeys, ck, side="left")
        hi = np.searchsorted(ekeys, ck, side="right")
        m = hi > lo
        if not m.any():
            return _FUZZY_SCHEMA.empty_table()
        # expand matching runs -> candidate (train doc, eval doc) pairs
        reps = (hi - lo)[m]
        c_doc = np.repeat(cd[m], reps)
        idx = np.concatenate([np.arange(a, b) for a, b in zip(lo[m], hi[m])])
        e_doc = ekid[idx]
        cand = np.unique(
            np.stack([c_doc, e_doc.astype(np.int64)], axis=1), axis=0
        )
        # distinct sorted grams per train doc in this batch
        g = gram_positions_batch(batch, text_col, k)
        td = g["doc_id"].to_numpy(zero_copy_only=False)
        tf = g["f"].to_numpy(zero_copy_only=False)
        o = np.lexsort((tf, td))
        td, tf = td[o], tf[o]
        keep = np.ones(len(td), dtype=bool)
        keep[1:] = (td[1:] != td[:-1]) | (tf[1:] != tf[:-1])
        td, tf = td[keep], tf[keep]
        new = np.ones(len(td), dtype=bool)
        new[1:] = td[1:] != td[:-1]
        starts = np.nonzero(new)[0]
        bounds = np.concatenate([starts, [len(td)]])
        tgrams = {
            int(td[starts[j]]): tf[bounds[j] : bounds[j + 1]]
            for j in range(len(starts))
        }
        out_d, out_e, out_j = [], [], []
        for a, e in cand:
            fa = tgrams.get(int(a))
            fb = egrams.get(int(e))
            if fa is None or fb is None:
                continue
            inter = int(
                (fb[np.searchsorted(fb, fa, side="left") % len(fb)] == fa).sum()
            ) if len(fb) else 0
            union = len(fa) + len(fb) - inter
            if union > 0 and 100 * inter >= pct * union:
                out_d.append(int(a))
                out_e.append(int(e))
                out_j.append(1000 * inter // union)
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "eval_id": pa.array(out_e, pa.int64()),
                "jaccard_x1000": pa.array(out_j, pa.int64()),
            },
            schema=_FUZZY_SCHEMA,
        )

    return train_docs.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def fuzzy_decontam_survivors(
    train_docs: ray.data.Dataset,
    eval_docs: ray.data.Dataset,
    text_col: str = "text",
    k: int = 3,
    n_perm: int = 16,
    band_rows: int = 2,
    min_jaccard: float = 0.5,
) -> ray.data.Dataset:
    """(doc_id) of the training docs that SURVIVE near-dup
    decontamination — the purge face of :func:`fuzzy_decontam` (drop
    every doc flagged against ANY benchmark doc).  Flagged set is
    pair-proportional: broadcast once, corpus filtered row-locally."""
    flagged = fuzzy_decontam(
        train_docs, eval_docs, text_col, k, n_perm, band_rows, min_jaccard
    )
    ids: set[int] = set()
    for b in flagged.select_columns(["doc_id"]).iter_batches(
        batch_size=1 << 18, batch_format="pyarrow"
    ):
        ids.update(b["doc_id"].to_numpy(zero_copy_only=False).tolist())
    drop = np.array(sorted(ids), dtype=np.int64)
    ref = ray.put(drop)

    def keep(batch: pa.Table) -> pa.Table:
        dr = ray.get(ref)
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(dr, d)
        hit = (pos < len(dr)) & (dr[np.minimum(pos, len(dr) - 1)] == d)
        return pa.table({"doc_id": pa.array(d[~hit], pa.int64())})

    return train_docs.map_batches(keep, batch_format="pyarrow")


def eval_leak_report(
    train_docs: ray.data.Dataset,
    eval_docs: ray.data.Dataset,
    text_col: str = "text",
    k: int = 8,
) -> ray.data.Dataset:
    """Per-EVAL-doc leakage report — the flip side of
    :func:`decontaminate`: for each benchmark document, how many of its
    distinct k-gram hashes appear ANYWHERE in the training corpus
    (``n_grams``, ``n_leaked``, ``leak_x1000``, ``fully_leaked``).  A
    benchmark owner reads THIS table to decide whether an eval is still
    trustworthy after training; `decontaminate` answers the dual
    question (which training docs to drop).

    Scale shape: the eval gram set is broadcast once (eval-suite-sized,
    the module's standard argument); the corpus contributes one
    streamed pass emitting only the eval grams it HITS, deduped per
    batch — the hit stream is bounded by the eval gram count, never
    corpus-sized, and one `unique()` reduces it.  Zero corpus
    shuffles.  Per-eval counting happens on the driver over
    eval-suite-sized arrays."""
    import ray

    # (eval-suite-sized) per-eval-doc distinct gram lists on the driver
    ev_docs, ev_grams = [], []
    for b in eval_docs.select_columns(["doc_id", text_col]).iter_batches(
        batch_format="pyarrow"
    ):
        g = gram_positions_batch(b, text_col, k)
        d = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        f = g["f"].to_numpy(zero_copy_only=False)
        ev_docs.append(d)
        ev_grams.append(f)
        # docs with < k tokens contribute no grams; track them via the
        # id column directly
        ev_docs.append(
            b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        ev_grams.append(np.full(len(b), np.uint64(0)))
    if ev_docs:
        d_all = np.concatenate(ev_docs)
        f_all = np.concatenate(ev_grams)
    else:
        d_all = np.empty(0, np.int64)
        f_all = np.empty(0, np.uint64)
    # the sentinel gram 0 marks "doc exists" rows; real gram hashes are
    # splitmix outputs (0 occurs with probability 2^-64 — never on real
    # data, and a collision would only add a phantom gram to the count)
    uniq_grams = np.unique(f_all[f_all != np.uint64(0)])
    grams_ref = ray.put(uniq_grams)

    def hits(batch: pa.Table) -> pa.Table:
        ug = ray.get(grams_ref)
        g = gram_positions_batch(batch, text_col, k)
        f = np.unique(g["f"].to_numpy(zero_copy_only=False))
        if len(ug) == 0 or len(f) == 0:
            return pa.table({"f": pa.array([], pa.int64())})
        pos = np.searchsorted(ug, f)
        ok = (pos < len(ug)) & (ug[np.minimum(pos, len(ug) - 1)] == f)
        # ship as two's-complement int64: unique()'s aggregate would
        # otherwise overflow Arrow int64 on high-bit hashes and fall back
        # to pickled blocks (the ops/sketches bloom lesson)
        return pa.table({"f": pa.array(f[ok].view(np.int64), pa.int64())})

    leaked_vals = (
        train_docs.select_columns(["doc_id", text_col])
        .map_batches(hits, batch_format="pyarrow", zero_copy_batch=True)
        .unique("f")
        or []
    )
    leaked = np.sort(
        np.unique(
            np.asarray(
                [v for v in leaked_vals if v is not None], dtype=np.int64
            )
        ).view(np.uint64)
    )

    # driver-side per-eval-doc rollup (eval-suite-sized)
    real = f_all != np.uint64(0)
    d_r, f_r = d_all[real], f_all[real]
    order = np.lexsort((f_r, d_r))
    d_r, f_r = d_r[order], f_r[order]
    keep = np.ones(len(d_r), dtype=bool)
    keep[1:] = (d_r[1:] != d_r[:-1]) | (f_r[1:] != f_r[:-1])
    d_r, f_r = d_r[keep], f_r[keep]
    is_leak = np.zeros(len(f_r), dtype=bool)
    if len(leaked) and len(f_r):
        pos = np.searchsorted(leaked, f_r)
        is_leak = (pos < len(leaked)) & (
            leaked[np.minimum(pos, len(leaked) - 1)] == f_r
        )
    all_ids = np.unique(d_all)
    n_grams = np.zeros(len(all_ids), np.int64)
    n_leak = np.zeros(len(all_ids), np.int64)
    if len(d_r):
        idx = np.searchsorted(all_ids, d_r)
        np.add.at(n_grams, idx, 1)
        np.add.at(n_leak, idx, is_leak.astype(np.int64))
    leak_x1000 = np.where(
        n_grams > 0, n_leak * 1000 // np.maximum(n_grams, 1), 0
    )
    out = pa.table(
        {
            "doc_id": pa.array(all_ids, pa.int64()),
            "n_grams": pa.array(n_grams, pa.int64()),
            "n_leaked": pa.array(n_leak, pa.int64()),
            "leak_x1000": pa.array(leak_x1000, pa.int64()),
            "fully_leaked": pa.array(
                (n_grams > 0) & (n_leak == n_grams)
            ),
        }
    )
    import ray.data as rd

    return rd.from_arrow(out)
