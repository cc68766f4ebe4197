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


def stratified_sample(
    docs: ray.data.Dataset,
    group_col: str = "lang",
    id_col: str = "doc_id",
    k: int = 10,
    salt: int = 0,
) -> ray.data.Dataset:
    """Deterministic k-per-group sample: within each group keep the k rows
    with the smallest ``splitmix64(id ^ salt)`` (ties by id) — a uniform
    without-replacement sample that is a pure function of the keys, so any
    re-run (or resumed partition) selects identical rows.

    Scale shape: the shuffle moves only (group, id, hash) after a
    PER-BATCH combiner has already cut each batch to k rows per group, so
    the per-group stage sees at most k * n_blocks rows per group — the
    classic distributed top-k, never the group's full membership."""
    s = np.uint64(salt)

    def topk(tbl: pa.Table) -> pa.Table:
        g = tbl[group_col].to_numpy(zero_copy_only=False)
        d = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = splitmix64(d ^ s)
        order = np.lexsort((d, h, g))
        g, d, h = g[order], d[order], h[order]
        # rank within group runs, vectorized
        new = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new[1:] = g[1:] != g[:-1]
        run_id = np.cumsum(new) - 1
        starts = np.nonzero(new)[0]
        rank = np.arange(len(g)) - starts[run_id]
        keep = rank < k
        return pa.table(
            {
                group_col: pa.array(g[keep]),
                id_col: pa.array(d[keep].astype(np.int64), pa.int64()),
            }
        )

    slim = docs.select_columns([group_col, id_col])
    combined = slim.map_batches(topk, batch_format="pyarrow")
    # the final per-group pass re-derives the hash from the ids (pure
    # function), so the combiner ships only (group, id)
    return combined.groupby(group_col).map_groups(
        topk, batch_format="pyarrow"
    )


def exact_int_quantiles(
    values: ray.data.Dataset,
    value_col: str,
    qs: list[float],
) -> pa.Table:
    """Exact quantiles of an integer column via the value-histogram
    selection: one distributed ``groupby(value).count()`` (result size =
    number of DISTINCT values, not rows), then a driver-side cumulative
    scan.  quantile(q) = smallest v whose cumulative count reaches
    ``max(1, ceil(q * n))`` — mirrored verbatim by the SQL twin.

    Exact at any corpus size as long as the distinct-value count is
    driver-small (token counts, durations, year fields...); for unbounded
    continuous columns use a two-pass range-refine instead."""
    counts = values.groupby(value_col).count().to_pandas()
    counts = counts.sort_values(value_col, ignore_index=True)
    v = counts[value_col].to_numpy().astype(np.int64)
    c = counts["count()"].to_numpy().astype(np.int64)
    cum = np.cumsum(c)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        rank = max(1, int(np.ceil(q * n)))
        idx = int(np.searchsorted(cum, rank))
        out_q.append(float(q))
        out_v.append(int(v[min(idx, len(v) - 1)]) if n else 0)
    return pa.table(
        {
            "q": pa.array(out_q, pa.float64()),
            "value": pa.array(out_v, pa.int64()),
        }
    )


def temperature_resample(
    docs: ray.data.Dataset,
    group_col: str = "lang",
    id_col: str = "doc_id",
    target_rows: int = 1000,
    temperature: float = 2.0,
    salt: int = 0,
) -> ray.data.Dataset:
    """Data-mixing / temperature resampling (the multilingual-corpus
    rebalancing step, mBERT/XLM-R style): keep rows so group g's expected
    share is proportional to ``n_g^(1/T)`` rather than ``n_g`` —
    temperature T > 1 upsamples small groups RELATIVE to their raw share
    while the total lands at ~``target_rows`` (less the shortfall from
    groups whose rate caps at 1; documented, not redistributed, so the
    assignment stays a pure per-row function).

    Exactness contract (what makes the SQL twin bit-identical): per-group
    weights are INTEGERIZED as ``floor(sqrt(n_g) * 1000)`` at T=2 (IEEE
    sqrt is correctly rounded, so engine and DuckDB agree to the bit; any
    other T uses ``n**(1/T)`` via libm pow — engine-only, no twin), and
    the keep threshold is pure integer arithmetic: group g's kept count
    targets ``target_rows * w_g / sum(w)``, so the per-row rate is
    ``t_g = min(2^20, (2^20 * target_rows * w_g) // (sum(w) * n_g))``,
    row kept iff ``splitmix64(id ^ salt) % 2^20 < t_g``.

    Scale shape: one tiny ``groupby(group).count()`` (group-cardinality
    rows) to the driver, thresholds broadcast as a dict, then a row-local
    filter — no shuffle of the corpus, resume-invariant like hash_split."""
    import math

    counts = docs.groupby(group_col).count().to_pandas()
    groups = counts[group_col].tolist()
    ns = [int(x) for x in counts["count()"]]
    if temperature == 2.0:
        ws = [int(math.floor(math.sqrt(n) * 1000)) for n in ns]
    else:
        ws = [int(math.floor((n ** (1.0 / temperature)) * 1000)) for n in ns]
    W = sum(ws)
    scale = 1 << 20
    thr = {
        g: (
            min(scale, (scale * int(target_rows) * w) // (W * n))
            if W * n
            else 0
        )
        for g, w, n in zip(groups, ws, ns)
    }
    s = np.uint64(salt)

    def keep(b: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(b[group_col])
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        dict_thr = np.array(
            [thr.get(v.as_py(), 0) for v in enc.dictionary], dtype=np.uint64
        )
        t = dict_thr[np.asarray(enc.indices.to_numpy(zero_copy_only=False))]
        d = b[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = splitmix64(d ^ s) % np.uint64(scale)
        return b.filter(pa.array(h < t))

    return docs.select_columns([id_col, group_col]).map_batches(
        keep, batch_format="pyarrow"
    )


def uniform_sample_k(
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
    k: int = 100,
    salt: int = 0,
) -> ray.data.Dataset:
    """Deterministic GLOBAL uniform k-sample without replacement: the k rows
    with the smallest ``splitmix64(id ^ salt)`` (ties by id) — the
    distributed equivalent of reservoir sampling, but a pure function of
    the keys (layout-, partition- and resume-invariant, unlike an actual
    reservoir whose content depends on encounter order).

    Scale shape: a per-batch combiner cuts every batch to its k smallest
    hashes, so at most ``k x n_blocks`` (id, hash) rows reach the single
    final top-k — never the corpus."""
    s = np.uint64(salt)

    def topk(tbl: pa.Table) -> pa.Table:
        d = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = splitmix64(d ^ s)
        order = np.lexsort((d, h))[:k]
        return pa.table(
            {
                id_col: pa.array(d[order].astype(np.int64), pa.int64()),
                "sample_rank": pa.array(
                    np.arange(len(order), dtype=np.int64), pa.int64()
                ),
            }
        )

    combined = docs.select_columns([id_col]).map_batches(
        topk, batch_format="pyarrow"
    )
    # single final cut over ALL combiner survivors in one batch
    # (batch_size=None = whole block; the stream is <= k rows per block)
    return combined.repartition(1).map_batches(
        topk, batch_format="pyarrow", batch_size=None
    )


def leakage_safe_split(
    docs: ray.data.Dataset,
    clusters: pa.Table,
    id_col: str = "doc_id",
    permille_train: int = 900,
    salt: int = 0,
) -> ray.data.Dataset:
    """Train/val split that can never leak near-duplicates across the
    boundary: the split is decided by ``splitmix64(split_key ^ salt)``
    where ``split_key`` is the doc's dup-CLUSTER label (min member id,
    from `ops/minhash_doc.minhash_doc_clusters` or any (doc_id,
    dup_cluster_id) table) for clustered docs and the doc's own id
    otherwise — every member of a near-dup cluster therefore lands in
    the SAME split.  A plain `hash_split` puts ~2·p·(1−p) of each dup
    pair across the boundary (18 % at 90/10), silently contaminating
    eval; this op makes that fraction exactly zero while staying a pure
    function of the keys (re-runs and resumed partitions agree).

    Scale shape: the cluster table is dup-pair-proportional (≪ corpus
    after LSH thinning + verification — the `minhash_doc_survivors`
    broadcast-budget argument), broadcast once via ``ray.put`` as two
    sorted int64 arrays; the split pass is row-local searchsorted +
    splitmix — no shuffle at any corpus size."""
    import ray

    ids = clusters[clusters.column_names[0]].to_numpy(zero_copy_only=False)
    labs = clusters[clusters.column_names[1]].to_numpy(zero_copy_only=False)
    order = np.argsort(ids)
    lut_ref = ray.put(
        (ids[order].astype(np.int64), labs[order].astype(np.int64))
    )
    s = np.uint64(salt)
    pt = int(permille_train)

    def fn(b: pa.Table) -> pa.Table:
        cid, clab = ray.get(lut_ref)
        d = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = d.copy()
        if len(cid):
            pos = np.searchsorted(cid, d)
            hit = (pos < len(cid)) & (cid[np.minimum(pos, len(cid) - 1)] == d)
            key[hit] = clab[pos[hit]]
        h = splitmix64(key.astype(np.uint64) ^ s) % np.uint64(1000)
        split = np.where(h < pt, "train", "val")
        return pa.table(
            {
                id_col: pa.array(d, pa.int64()),
                "split_key": pa.array(key, pa.int64()),
                "split": pa.array(split.tolist(), pa.string()),
            }
        )

    return docs.select_columns([id_col]).map_batches(
        fn, batch_format="pyarrow"
    )
