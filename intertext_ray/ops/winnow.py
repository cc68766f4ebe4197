"""Winnowing document fingerprints (Schleimer, Wilkes & Aiken,
SIGMOD 2003 — the MOSS local fingerprinting algorithm) and the dup-pair
detector built on the selected fingerprints.

Winnowing picks, from the stream of word k-gram hashes of each document,
the MINIMUM hash in every window of ``w`` consecutive gram positions
(rightmost occurrence on ties), then dedups the selections.  Unlike the
``keep_mod`` sparsification of ``text_stats.rolling_fingerprints`` (a
global mod-p filter with no positional guarantee), winnowing gives the
LOCAL guarantee: any token run shared by two documents of length
``>= w + k - 1`` contributes at least one identical selected
fingerprint to both — so ``winnow_dup_pairs`` has zero false negatives
for long-enough shared passages at density ``~2/(w+1)``, independent of
where the passage sits.  (The reference engine reaches the same effect
with dense MinHash bands over windows — /root/reference/intertext/
intertext.py:640 ``get_doc_hashbands``; winnowing is the sparse,
position-robust alternative a training-data pipeline uses for
substring-level dedup at corpus scale.)

Scale shape: fingerprint selection is row-local (one vectorized pass per
batch, zero shuffles — docs arrive whole, so a batch's gram stream is
per-doc complete).  Pair detection shuffles only the slim
(fp:uint64, doc_id:int64) projection, bucketed by ``fp % num_buckets``
exactly like ``ngram_jaccard_pairs``; a per-fingerprint doc cap bounds
the quadratic blowup of boilerplate fingerprints (same knob + measured
dropped-mass argument as the LSH hot-band cap,
``stages/candidates.py``).

Both kernels are expression-identical to their DuckDB twins
(``__ray_entry__.oracle_sql['winnow_fingerprints' / 'winnow_dup_pairs']``):
the k-gram hash is the shared splitmix64 token-chain + positional
polynomial of ``text_stats.kgram_hashes``, and the window selection is
replayed in SQL as a range-join min + rightmost-position resolve.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_U64 = np.uint64


def winnow_select(fp: np.ndarray, owner: np.ndarray, window: int) -> np.ndarray:
    """Indices (into ``fp``) selected by winnowing with window size
    ``window``, deduplicated and sorted.  ``owner`` marks doc membership
    (contiguous runs, as produced by ``text_stats.kgram_hashes``).

    Every window of ``window`` consecutive same-doc gram positions
    selects its minimum hash, rightmost occurrence on ties.  A doc with
    fewer than ``window`` grams is winnowed as one truncated window (so
    short docs still carry one fingerprint instead of vanishing from
    dedup entirely).
    """
    n = len(fp)
    if n == 0:
        return np.empty(0, np.int64)
    w = int(window)
    if w <= 1:
        return np.arange(n, dtype=np.int64)
    idx = np.arange(n, dtype=np.int64)
    chosen = []

    # full windows: sliding over the compacted array; a start s is valid
    # iff the whole window sits in one doc (owner runs are contiguous)
    if n >= w:
        from numpy.lib.stride_tricks import sliding_window_view

        wins = sliding_window_view(fp, w)  # (n - w + 1, w), zero-copy view
        valid = owner[: n - w + 1] == owner[w - 1 :]
        if valid.any():
            vwins = wins[valid]
            m = vwins.min(axis=1)
            # rightmost occurrence of the min: argmax over the reversed
            # equality mask gives the offset from the window's right edge
            roff = np.argmax(vwins[:, ::-1] == m[:, None], axis=1)
            starts = idx[: n - w + 1][valid]
            chosen.append(starts + (w - 1) - roff)

    # truncated windows: docs with fewer than `window` grams get one
    # window covering all their grams
    run_starts = np.concatenate(
        [[0], np.nonzero(owner[1:] != owner[:-1])[0] + 1]
    ).astype(np.int64)
    run_lens = np.diff(np.concatenate([run_starts, [n]]))
    short = run_lens < w
    if short.any():
        s_starts = run_starts[short]
        s_lens = run_lens[short]
        total = int(s_lens.sum())
        seg_starts = np.concatenate([[0], np.cumsum(s_lens)[:-1]])
        run_id = np.repeat(np.arange(len(s_starts)), s_lens)
        # gather the short runs' positions into one compacted array
        # (short runs are NOT adjacent in fp, so reduceat must run over
        # the gathered copy, not fp itself)
        flat = (
            np.repeat(s_starts, s_lens)
            + np.arange(total, dtype=np.int64)
            - np.repeat(seg_starts, s_lens)
        )
        vals = fp[flat]
        mins = np.minimum.reduceat(vals, seg_starts)
        # rightmost position of the run min: mask non-min slots to -1,
        # then a segmented max over the positions
        cand = np.where(vals == mins[run_id], flat, -1)
        chosen.append(np.maximum.reduceat(cand, seg_starts).astype(np.int64))

    if not chosen:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate(chosen))


def winnow_fp_batch(
    batch: pa.Table, text_col: str = "text", k: int = 4, window: int = 4
) -> pa.Table:
    """(doc_id, pos, fp_hex) rows: the winnowed fingerprints of each doc.
    ``pos`` is the 0-based gram position (== token start index) of the
    selected k-gram within its doc."""
    from intertext_ray.ops.text_stats import kgram_hashes

    fp, owner = kgram_hashes(batch, text_col, k)
    sel = winnow_select(fp, owner, window)
    if len(sel) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "fp_hex": pa.array([], pa.string()),
            }
        )
    n = len(fp)
    run_starts = np.concatenate(
        [[0], np.nonzero(owner[1:] != owner[:-1])[0] + 1]
    ).astype(np.int64)
    # first gram index of each doc's run, indexed by compacted position
    doc_first = np.repeat(
        run_starts, np.diff(np.concatenate([run_starts, [n]]))
    )
    batch_docs = batch["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": pa.array(
                batch_docs[owner[sel]].astype(np.int64), pa.int64()
            ),
            "pos": pa.array(sel - doc_first[sel], pa.int64()),
            "fp_hex": pa.array(
                [f"{int(v):016x}" for v in fp[sel]], pa.string()
            ),
        }
    )


def winnow_fingerprints(
    docs: ray.data.Dataset,
    text_col: str = "text",
    k: int = 4,
    window: int = 4,
) -> ray.data.Dataset:
    """Dataset wrapper over :func:`winnow_fp_batch` — row-local, no
    shuffle at any corpus size."""
    return docs.map_batches(
        lambda b: winnow_fp_batch(b, text_col, k, window),
        batch_format="pyarrow",
    )


def _fp_doc_rows(
    batch: pa.Table, text_col: str, k: int, window: int
) -> pa.Table:
    """Distinct (fp:uint64, doc_id) rows per doc — the slim projection
    that enters the pair shuffle.  Per-batch distinct IS global distinct
    because each doc's text lives in exactly one input row."""
    from intertext_ray.ops.text_stats import kgram_hashes

    fp, owner = kgram_hashes(batch, text_col, k)
    sel = winnow_select(fp, owner, window)
    empty = pa.table(
        {
            "fp": pa.array([], pa.uint64()),
            "doc_id": pa.array([], pa.int64()),
        }
    )
    if len(sel) == 0:
        return empty
    key = np.stack([owner[sel].astype(np.uint64), fp[sel]], axis=1)
    uniq = np.unique(key, axis=0)
    batch_docs = batch["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "fp": pa.array(uniq[:, 1], pa.uint64()),
            "doc_id": pa.array(
                batch_docs[uniq[:, 0].astype(np.int64)].astype(np.int64),
                pa.int64(),
            ),
        }
    )


def winnow_dup_pairs(
    docs: ray.data.Dataset,
    text_col: str = "text",
    k: int = 4,
    window: int = 4,
    min_shared: int = 2,
    num_buckets: int = 32,
    fp_doc_cap: int = 0,
) -> ray.data.Dataset:
    """(doc_a, doc_b, shared): doc pairs sharing >= ``min_shared``
    distinct winnowed fingerprint values.

    ``fp_doc_cap``: skip fingerprints held by more docs than the cap
    (0 = exact).  At corpus scale a fingerprint shared by thousands of
    docs is boilerplate, not reuse signal; the cap bounds the quadratic
    pair emission and the skipped mass is deterministic (whole runs are
    dropped), so the DuckDB twin replays it exactly
    (``HAVING count(*) <= cap``).
    """
    rows = docs.map_batches(
        lambda b: _fp_doc_rows(b, text_col, k, window),
        batch_format="pyarrow",
    )
    nb = _U64(num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        f = t["fp"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((f % nb).astype(np.int64)))

    def count_pairs(group: pa.Table) -> pa.Table:
        from intertext_ray.stages.candidates import pairs_within_runs

        f = group["fp"].to_numpy(zero_copy_only=False)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "shared": pa.array([], pa.int64()),
            }
        )
        if len(f) == 0:
            return empty
        order = np.lexsort((d, f))
        f, d = f[order], d[order]
        starts = np.concatenate([[0], np.nonzero(f[1:] != f[:-1])[0] + 1])
        counts = np.diff(np.concatenate([starts, [len(f)]]))
        if fp_doc_cap:
            keep_runs = counts <= fp_doc_cap
            keep_rows = np.repeat(keep_runs, counts)
            f, d = f[keep_rows], d[keep_rows]
            counts = counts[keep_runs]
        ii, jj = pairs_within_runs(counts)
        if len(ii) == 0:
            return empty
        da, db = d[ii], d[jj]
        swap = da > db
        a = np.where(swap, db, da)
        b = np.where(swap, da, db)
        # partial per-pair shared counts within the bucket
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        head = np.ones(len(a), dtype=bool)
        head[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        hstarts = np.nonzero(head)[0]
        hcounts = np.diff(np.concatenate([hstarts, [len(a)]]))
        return pa.table(
            {
                "doc_a": pa.array(a[hstarts].astype(np.int64), pa.int64()),
                "doc_b": pa.array(b[hstarts].astype(np.int64), pa.int64()),
                "shared": pa.array(hcounts.astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    totals = (
        rows.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Sum("shared", alias_name="shared"))
    )
    ms = int(min_shared)

    def gate(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["shared"], ms))

    return totals.map_batches(gate, batch_format="pyarrow")
