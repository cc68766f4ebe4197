"""Candidate-pair generation — THE wide shuffle (reference A1+A2+A3,
``/root/reference/intertext/intertext.py:398-453, 964-996``).

Reference semantics: group hashband rows by band key; every band shared by
>= 2 distinct docs emits all cross-doc (doc,window) pairs in canonical
(min,max) doc order; pairs are exact-deduped.  (Our output is the *exact*
groupby result — a superset of the reference, whose chunked scan drops some
groups: quirks Q1/Q2, SURVEY.md §2.11.)

Physical plan (explicit hash partitioning, no per-band Python calls):

1. ``bucket = band % num_buckets`` added in a vectorized ``map_batches``;
2. ``groupby('bucket').map_groups`` — ONE Python call per bucket, not per
   band; inside, a numpy lexsort finds equal-band runs and pair emission is
   fully vectorized (triangular-index decode), with a hot-band row cap
   (``cfg.band_docs_cap``) bounding the quadratic blowup of degenerate bands
   (boilerplate/silence transcripts) — a standard LSH frequency cap whose
   dropped mass is reported by :func:`band_metrics`;
3. candidate dedup: same bucketed-groupby pattern keyed on the pair tuple.

At cluster scale ``num_buckets`` should be >= total_cores and sized so one
bucket (rows/num_buckets) fits a worker heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from intertext_ray.config import IntertextConfig

_U64 = np.uint64


def pairs_within_runs(counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """For runs of sizes ``counts`` laid out consecutively, return global
    (i, j) index pairs (i < j) of every within-run pair — vectorized
    triangular decode, no Python loop over runs."""
    counts = np.asarray(counts, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    p = counts * (counts - 1) // 2
    total = int(p.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    run_of_pair = np.repeat(np.arange(len(counts)), p)
    p_start = np.concatenate([[0], np.cumsum(p)[:-1]])
    local = np.arange(total, dtype=np.int64) - p_start[run_of_pair]
    # pair l -> (i, j): pairs ordered (0,1),(0,2),(1,2),(0,3)... by j then i
    jj = ((1.0 + np.sqrt(1.0 + 8.0 * local.astype(np.float64))) / 2.0).astype(
        np.int64
    )
    # correct float edge cases so that j(j-1)/2 <= local < j(j+1)/2
    over = jj * (jj - 1) // 2 > local
    jj[over] -= 1
    under = (jj + 1) * jj // 2 <= local
    jj[under] += 1
    ii = local - jj * (jj - 1) // 2
    base = starts[run_of_pair]
    return base + ii, base + jj


def _emit_pairs_from_sorted(
    band: np.ndarray,
    doc: np.ndarray,
    win: np.ndarray,
    cap: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Rows sorted by band -> canonical candidate arrays."""
    n = len(band)
    if n == 0:
        e = np.empty(0, _U64)
        return e, e, np.empty(0, np.int32), np.empty(0, np.int32)
    boundaries = np.nonzero(band[1:] != band[:-1])[0] + 1
    starts = np.concatenate([[0], boundaries])
    counts = np.diff(np.concatenate([starts, [n]]))
    if cap:
        keep_runs = counts <= cap
    else:
        keep_runs = np.ones(len(counts), dtype=bool)
    # compact kept runs so pairs_within_runs sees consecutive layout
    keep_rows = np.repeat(keep_runs, counts)
    band, doc, win = band[keep_rows], doc[keep_rows], win[keep_rows]
    counts = counts[keep_runs]
    ii, jj = pairs_within_runs(counts)
    da, db = doc[ii], doc[jj]
    wa, wb = win[ii], win[jj]
    cross = da != db  # same-doc pairs skipped (reference :448)
    da, db, wa, wb = da[cross], db[cross], wa[cross], wb[cross]
    swap = da > db  # canonical (min,max) doc order (reference :449-453)
    da2 = np.where(swap, db, da)
    db2 = np.where(swap, da, db)
    wa2 = np.where(swap, wb, wa)
    wb2 = np.where(swap, wa, wb)
    return da2, db2, wa2.astype(np.int32), wb2.astype(np.int32)


def _dedup4(
    da: np.ndarray, db: np.ndarray, wa: np.ndarray, wb: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    order = np.lexsort((wb, wa, db, da))
    da, db, wa, wb = da[order], db[order], wa[order], wb[order]
    keep = np.ones(len(da), dtype=bool)
    if len(da) > 1:
        same = (
            (da[1:] == da[:-1])
            & (db[1:] == db[:-1])
            & (wa[1:] == wa[:-1])
            & (wb[1:] == wb[:-1])
        )
        keep[1:] = ~same
    return da[keep], db[keep], wa[keep], wb[keep]


def _cand_table(da, db, wa, wb) -> pa.Table:
    return pa.table(
        {
            "doc_a": pa.array(da, pa.uint64()),
            "doc_b": pa.array(db, pa.uint64()),
            "win_a": pa.array(wa, pa.int32()),
            "win_b": pa.array(wb, pa.int32()),
        }
    )


def candidates_stage(
    hashbands,
    cfg: IntertextConfig,
    num_buckets: int = 256,
    pre_split: bool = True,
    dedup: bool = True,
) -> "ray.data.Dataset":
    """hashbands Dataset(band, doc_id, window_id) -> deduped candidates.

    ``dedup=False`` skips the global pair-key exchange (candidates are still
    pre-deduped WITHIN each band bucket — measured residual duplication
    ~1.16x at sf0.01): the streaming pipeline uses this and dedups inside
    the verify join's pair co-group instead, saving one AllToAll barrier.
    The checkpointed path keeps ``dedup=True`` so the candidates artifact
    stays the exact reference A3 (UNIQUE) contract."""
    nb = np.uint64(num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        band = t["band"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((band % nb).astype(np.int64), pa.int64())
        )

    only = cfg.only_doc_id

    def emit(group: pa.Table) -> pa.Table:
        band = group["band"].to_numpy(zero_copy_only=False)
        doc = group["doc_id"].to_numpy(zero_copy_only=False)
        win = group["window_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((win, doc, band))
        da, db, wa, wb = _emit_pairs_from_sorted(
            band[order], doc[order], win[order], cfg.band_docs_cap
        )
        if only is not None:
            # reference --only (N6, intertext.py:439-445): keep candidates
            # where one side is the focal doc
            m = (da == _U64(only)) | (db == _U64(only))
            da, db, wa, wb = da[m], db[m], wa[m], wb[m]
        # pre-dedup inside the bucket (combiner) before the pair shuffle
        da, db, wa, wb = _dedup4(da, db, wa, wb)
        return _cand_table(da, db, wa, wb)

    from intertext_ray.stages import maybe_split

    bucketed = hashbands.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    if pre_split:
        # widen the shuffle when upstream arrives as few huge blocks (e.g.
        # a checkpoint read); in a streaming chain upstream block counts are
        # already adequate and the extra AllToAll barrier only costs overlap
        bucketed = maybe_split(bucketed, num_buckets)
    raw = bucketed.groupby("bucket").map_groups(emit, batch_format="pyarrow")
    if not dedup:
        return raw
    return dedup_candidates(raw, num_buckets, pre_split=False)


def dedup_candidates(candidates, num_buckets: int = 256, pre_split: bool = True):
    """Exact dedup of (doc_a, doc_b, win_a, win_b) — the reference's SQLite
    UNIQUE constraint (A3) as a bucketed groupby + vectorized unique."""
    from intertext_ray.functions.hashing import splitmix64

    nb = np.uint64(num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        da = t["doc_a"].to_numpy(zero_copy_only=False).astype(_U64)
        db = t["doc_b"].to_numpy(zero_copy_only=False).astype(_U64)
        key = splitmix64(splitmix64(da) ^ db)
        return t.append_column(
            "bucket", pa.array((key % nb).astype(np.int64), pa.int64())
        )

    def uniq(group: pa.Table) -> pa.Table:
        da = group["doc_a"].to_numpy(zero_copy_only=False)
        db = group["doc_b"].to_numpy(zero_copy_only=False)
        wa = group["win_a"].to_numpy(zero_copy_only=False)
        wb = group["win_b"].to_numpy(zero_copy_only=False)
        return _cand_table(*_dedup4(da, db, wa, wb))

    from intertext_ray.stages import maybe_split

    bucketed = candidates.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    if pre_split:
        bucketed = maybe_split(bucketed, num_buckets)
    return bucketed.groupby("bucket").map_groups(uniq, batch_format="pyarrow")


def band_metrics(hashbands, cap: int = 0) -> dict:
    """Collision metrics for manifests: band-cardinality histogram, pair
    mass, and the mass a hot-band cap would drop.  One extra pass; run only
    when metrics are requested."""
    from ray.data.aggregate import Count

    sizes = hashbands.groupby("band").aggregate(Count(alias_name="n"))

    def summarize(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        pairs = n * (n - 1) // 2
        dropped = pairs[n > cap].sum() if cap else 0
        return pa.table(
            {
                "bands": pa.array([len(n)], pa.int64()),
                "multi_bands": pa.array([int((n > 1).sum())], pa.int64()),
                "max_band": pa.array([int(n.max()) if len(n) else 0], pa.int64()),
                "pair_mass": pa.array([int(pairs.sum())], pa.int64()),
                "dropped_pair_mass": pa.array([int(dropped)], pa.int64()),
            }
        )

    parts = sizes.map_batches(summarize, batch_format="pyarrow").to_pandas()
    return {
        "bands": int(parts["bands"].sum()),
        "multi_bands": int(parts["multi_bands"].sum()),
        "max_band": int(parts["max_band"].max()) if len(parts) else 0,
        "pair_mass": int(parts["pair_mass"].sum()),
        "dropped_pair_mass": int(parts["dropped_pair_mass"].sum()),
    }
