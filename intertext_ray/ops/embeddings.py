"""Embedding ops: cosine ANN top-k (exact brute-force baseline + IVF
scale path), threshold near-dup pairs, and an LSH-bucketed scale variant.

The query matrix is ``ray.put`` ONCE and read per actor — never re-shipped
per batch; each batch does one float64 matmul against it (vectorized).

``cosine_dup_pairs`` (exact all-pairs) is CLUSTER-RESIDENT: dataset blocks
are re-partitioned into hash buckets by worker tasks whose RESULTS stay in
the object store (the driver only holds object refs); every bucket pair is
scored by a task reading two refs; the output Dataset is assembled with
``ray.data.from_arrow_refs`` — at no point does a vector matrix travel
through the driver.  The LSH variant buckets vectors by random-hyperplane
sign bits so only same-bucket pairs are scored — the scale path when B²
bucket-pair matmuls get too big.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray
import ray.data

from intertext_ray.functions.hashing import splitmix64


def _embedding_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_fixed_size_list(arr.type):
        dim = arr.type.list_size
        return arr.flatten().to_numpy(zero_copy_only=False).reshape(len(arr), dim)
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    offs = np.asarray(arr.offsets)
    dim = int(offs[1] - offs[0])
    return flat.reshape(len(arr), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    m = m.astype(np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class CosineTopK:
    """Actor: holds the normalized query matrix; per batch emits the top-k
    candidate rows of that batch per query (merged on the driver)."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref)
        self.qids = q["ids"]
        self.qmat = _normalize(q["mat"])
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(_embedding_matrix(batch))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = vecs @ self.qmat.T  # (batch, n_queries)
        k = min(self.k, len(ids))
        out_q, out_v, out_c = [], [], []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            top = np.argpartition(-col, k - 1)[:k] if k < len(col) else np.arange(len(col))
            for t in top:
                out_q.append(int(self.qids[qi]))
                out_v.append(int(ids[t]))
                out_c.append(float(col[t]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )


def ann_topk(
    embeddings: ray.data.Dataset,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
) -> pa.Table:
    """Exact brute-force cosine top-k for each query id (queries drawn from
    the dataset itself).  Returns (query_id, vec_id, rank, cos_x1000) —
    deterministic tie-break by vec_id.  DuckDB twin:
    ``oracle_sql()['ann_topk']`` (window function over
    ``list_cosine_similarity``)."""
    qarr = np.asarray(sorted(int(q) for q in query_ids), dtype=np.int64)

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(ids, qarr)))

    qtbl = embeddings.map_batches(pick, batch_format="pyarrow").to_pandas()
    qtbl = qtbl.sort_values(id_col)
    qmat = np.vstack(qtbl["embedding"].to_numpy())
    queries_ref = ray.put({"ids": qtbl[id_col].to_numpy(), "mat": qmat})

    partials = embeddings.map_batches(
        CosineTopK,
        fn_constructor_args=(queries_ref, k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
        num_cpus=1,
    ).to_pandas()
    # merge per-batch top-k on the driver (small: n_queries * k * n_batches)
    out = []
    for qid, grp in partials.groupby("query_id"):
        grp = grp.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        for rank, r in enumerate(grp.itertuples()):
            # +1e-6 before floor: a query's cosine with itself computes as
            # 0.999...9 or 1.000...1 depending on float op order (normalized
            # matmul here vs dot/|a||b| in the SQL twin) — the epsilon makes
            # floor(1000*cos) stable on both sides of such boundaries
            out.append(
                (int(qid), int(r.vec_id), rank, math.floor(1000.0 * r.cos + 1e-6))
            )
    return pa.table(
        {
            "query_id": pa.array([o[0] for o in out], pa.int64()),
            "vec_id": pa.array([o[1] for o in out], pa.int64()),
            "rank": pa.array([o[2] for o in out], pa.int64()),
            "cos_x1000": pa.array([o[3] for o in out], pa.int64()),
        }
    )


@ray.remote
def _partition_block(tbl: pa.Table, num_buckets: int, id_col: str):
    """Worker task: split one block into per-bucket (ids, normalized-matrix)
    pieces.  Results stay in the object store (num_returns=num_buckets)."""
    ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = _normalize(_embedding_matrix(tbl))
    bk = ids % num_buckets
    out = []
    for b in range(num_buckets):
        m = bk == b
        out.append((ids[m].copy(), np.ascontiguousarray(mat[m])))
    return tuple(out) if num_buckets > 1 else out[0]


@ray.remote
def _assemble_bucket(*pieces):
    ids = np.concatenate([p[0] for p in pieces])
    mat = np.vstack([p[1] for p in pieces]) if len(ids) else np.empty((0, 0))
    order = np.argsort(ids, kind="stable")
    return ids[order], mat[order] if len(ids) else mat


@ray.remote
def _score_bucket_pair(pa_i, pa_j, same: bool, threshold: float) -> pa.Table:
    ids_a, mat_a = pa_i
    ids_b, mat_b = pa_j
    if len(ids_a) == 0 or len(ids_b) == 0:
        return _cos_pairs_table([], [], [])
    sims = mat_a @ mat_b.T
    ia, ib = np.nonzero(sims >= threshold)
    da, db = ids_a[ia], ids_b[ib]
    if same:
        keep = da < db
    else:
        keep = da != db
    da, db, cs = da[keep], db[keep], sims[ia, ib][keep]
    swap = da > db
    a = np.where(swap, db, da)
    b = np.where(swap, da, db)
    return _cos_pairs_table(a, b, np.floor(1000.0 * cs))


def _cos_pairs_table(a, b, cx) -> pa.Table:
    return pa.table(
        {
            "a": pa.array(np.asarray(a, np.int64), pa.int64()),
            "b": pa.array(np.asarray(b, np.int64), pa.int64()),
            "cos_x1000": pa.array(np.asarray(cx, np.int64), pa.int64()),
        }
    )


def cosine_dup_pairs(
    embeddings: ray.data.Dataset,
    threshold: float = 0.9,
    num_buckets: int = 16,
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Embedding-cosine near-dup pairs: (a, b) with cos >= threshold, a < b.

    Exact all-pairs via bucketed block-matmul, fully cluster-resident: the
    driver sees only object refs — blocks are hash-partitioned by worker
    tasks, bucket matrices assembled by worker tasks, and each bucket PAIR
    scored with one float64 matmul in a task — O((N/B)²) memory per task,
    exact results.  For corpora where N² bucket-pair work is infeasible,
    use :func:`lsh_cosine_dup_pairs`.
    """
    block_refs = embeddings.to_arrow_refs()
    nb = num_buckets
    piece_refs = [
        _partition_block.options(num_returns=nb if nb > 1 else 1).remote(
            r, nb, id_col
        )
        for r in block_refs
    ]
    if nb == 1:
        piece_refs = [[r] for r in piece_refs]
    buckets = [
        _assemble_bucket.remote(*[pieces[b] for pieces in piece_refs])
        for b in range(nb)
    ]
    out_refs = [
        _score_bucket_pair.remote(buckets[i], buckets[j], i == j, threshold)
        for i in range(nb)
        for j in range(i, nb)
    ]
    ds = ray.data.from_arrow_refs(out_refs)
    return ds.sort(["a", "b"])


def _dedup_pairs_bucketed(pairs: ray.data.Dataset, num_buckets: int = 64):
    """Exact (a, b) pair dedup as a bucketed groupby + vectorized
    first-per-key (the engine-wide dedup pattern — no per-key map_groups)."""
    nbu = np.uint64(num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "bucket", pa.array(((splitmix64(a) ^ b) % nbu).astype(np.int64))
        )

    def uniq(group: pa.Table) -> pa.Table:
        a = group["a"].to_numpy(zero_copy_only=False)
        b = group["b"].to_numpy(zero_copy_only=False)
        c = group["cos_x1000"].to_numpy(zero_copy_only=False)
        order = np.lexsort((c, b, a))
        a, b, c = a[order], b[order], c[order]
        keep = np.ones(len(a), dtype=bool)
        if len(a) > 1:
            keep[1:] = ~((a[1:] == a[:-1]) & (b[1:] == b[:-1]))
        return _cos_pairs_table(a[keep], b[keep], c[keep])

    return (
        pairs.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(uniq, batch_format="pyarrow")
    )


def lsh_cosine_dup_pairs(
    embeddings: ray.data.Dataset,
    threshold: float = 0.9,
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 0xE5B,
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Scale path: random-hyperplane LSH — each vector lands in ``n_tables``
    sign-buckets; only same-bucket pairs are exactly scored.  Approximate
    (recall < 1 by design) but shuffle-shaped like the MinHash path: explode
    -> bucket groupby -> verify -> bucketed dedup."""
    # deterministic planes from the pinned seed family
    first = embeddings.take(1)
    dim = len(first[0]["embedding"])
    rng = np.random.default_rng(int(splitmix64(np.uint64(seed))))
    planes = rng.standard_normal((n_tables, n_planes, dim))
    planes_ref = ray.put(planes)

    def explode(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        vecs = _normalize(_embedding_matrix(batch))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keys, out_ids, out_vecs = [], [], []
        for t in range(pl.shape[0]):
            signs = (vecs @ pl[t].T) > 0
            key = np.zeros(len(ids), dtype=np.uint64)
            for p in range(pl.shape[1]):
                key |= signs[:, p].astype(np.uint64) << np.uint64(p)
            key |= np.uint64(t) << np.uint64(48)
            keys.append(key)
            out_ids.append(ids)
            out_vecs.append(vecs)
        vec_list = pa.array(
            list(np.concatenate(out_vecs)), pa.list_(pa.float64())
        )
        return pa.table(
            {
                "bucket_key": pa.array(np.concatenate(keys), pa.uint64()),
                "vec_id": pa.array(np.concatenate(out_ids).astype(np.int64)),
                "vec": vec_list,
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_numpy(zero_copy_only=False)
        if len(ids) < 2:
            return _cos_pairs_table([], [], [])
        mat = _embedding_matrix(group, "vec")
        sims = mat @ mat.T
        ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
        da, db = ids[ia], ids[ib]
        swap = da > db
        a = np.where(swap, db, da)
        b = np.where(swap, da, db)
        return _cos_pairs_table(a, b, np.floor(1000.0 * sims[ia, ib]))

    raw = (
        embeddings.map_batches(explode, batch_format="pyarrow")
        .groupby("bucket_key")
        .map_groups(verify, batch_format="pyarrow")
    )
    return _dedup_pairs_bucketed(raw)


# ---------------------------------------------------------------------------
# IVF ANN — the 100 TB scale path for top-k search
# ---------------------------------------------------------------------------


def train_ivf_centroids(
    embeddings: ray.data.Dataset,
    n_cells: int = 16,
    sample_rows: int = 4096,
    iters: int = 8,
    seed: int = 0x1BF,
) -> np.ndarray:
    """Coarse quantizer: k-means over a bounded sample (sample ≪ corpus, so
    driver-side Lloyd iterations are scale-correct — the FULL dataset never
    leaves the cluster; only ``sample_rows`` rows do).  Deterministic from
    ``seed``.  Returns (n_cells, dim) L2-normalized centroids."""
    sample = embeddings.limit(sample_rows).to_pandas()
    mat = _normalize(np.vstack(sample["embedding"].to_numpy()))
    rng = np.random.default_rng(int(splitmix64(np.uint64(seed))))
    n_cells = min(n_cells, len(mat))
    cent = mat[rng.choice(len(mat), size=n_cells, replace=False)]
    for _ in range(iters):
        # cosine assignment == argmax dot on normalized vectors
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(n_cells):
            m = assign == c
            if m.any():
                cent[c] = mat[m].mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_assign(
    embeddings: ray.data.Dataset,
    centroids: np.ndarray,
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Index build: tag every vector with its nearest-centroid ``cell``
    (one broadcast ``ray.put`` of the centroid matrix, one matmul per
    batch).  At scale, write the result partitioned by ``cell`` so queries
    read only the probed partitions."""
    cref = ray.put(np.ascontiguousarray(centroids))

    def assign(batch: pa.Table) -> pa.Table:
        cent = ray.get(cref)
        vecs = _normalize(_embedding_matrix(batch))
        cell = np.argmax(vecs @ cent.T, axis=1).astype(np.int32)
        return batch.append_column("cell", pa.array(cell, pa.int32()))

    return embeddings.map_batches(assign, batch_format="pyarrow")


def ann_topk_ivf(
    embeddings: ray.data.Dataset,
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
) -> pa.Table:
    """Approximate cosine top-k via IVF: only the ``nprobe`` cells nearest
    each query are scanned (~nprobe/n_cells of the corpus instead of all of
    it).  Same output schema as :func:`ann_topk`; recall < 1 by design —
    measured against the exact path in tests/test_embeddings_ivf.py.

    The scan filters to the union of probed cells AT THE READ (cell
    pruning), then scores each batch against the broadcast query matrix
    with per-query cell masks — no driver-side vector materialization
    beyond the queries themselves."""
    if centroids is None:
        centroids = train_ivf_centroids(embeddings, n_cells=n_cells)
    n_cells = len(centroids)
    nprobe = min(nprobe, n_cells)

    qarr = np.asarray(sorted(int(q) for q in query_ids), dtype=np.int64)

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(ids, qarr)))

    qtbl = embeddings.map_batches(pick, batch_format="pyarrow").to_pandas()
    qtbl = qtbl.sort_values(id_col)
    qmat = _normalize(np.vstack(qtbl["embedding"].to_numpy()))
    qids = qtbl[id_col].to_numpy()

    # per-query probe cells; scan set = their union
    qcells = np.argsort(-(qmat @ centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    scan_cells = np.unique(qcells)
    probe_mask = np.zeros((len(qids), n_cells), dtype=bool)
    for qi in range(len(qids)):
        probe_mask[qi, qcells[qi]] = True

    assigned = ivf_assign(embeddings, centroids, id_col)

    def keep_cells(batch: pa.Table) -> pa.Table:
        cell = batch["cell"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(cell, scan_cells)))

    bref = ray.put({"ids": qids, "mat": qmat, "probe": probe_mask})

    def score(batch: pa.Table) -> pa.Table:
        q = ray.get(bref)
        vecs = _normalize(_embedding_matrix(batch))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        cell = batch["cell"].to_numpy(zero_copy_only=False)
        sims = vecs @ q["mat"].T  # (batch, nq)
        # mask rows outside each query's probed cells
        allowed = q["probe"][:, cell].T  # (batch, nq)
        sims = np.where(allowed, sims, -np.inf)
        kk = min(k, len(ids))
        out_q, out_v, out_c = [], [], []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            top = (
                np.argpartition(-col, kk - 1)[:kk]
                if kk < len(col)
                else np.arange(len(col))
            )
            for t in top:
                if np.isfinite(col[t]):
                    out_q.append(int(q["ids"][qi]))
                    out_v.append(int(ids[t]))
                    out_c.append(float(col[t]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )

    partials = (
        assigned.map_batches(keep_cells, batch_format="pyarrow")
        .map_batches(score, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    out = []
    for qid, grp in partials.groupby("query_id"):
        grp = grp.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        for rank, r in enumerate(grp.itertuples()):
            out.append(
                (int(qid), int(r.vec_id), rank, math.floor(1000.0 * r.cos + 1e-6))
            )
    return pa.table(
        {
            "query_id": pa.array([o[0] for o in out], pa.int64()),
            "vec_id": pa.array([o[1] for o in out], pa.int64()),
            "rank": pa.array([o[2] for o in out], pa.int64()),
            "cos_x1000": pa.array([o[3] for o in out], pa.int64()),
        }
    )


def semantic_dedup(
    embeddings: ray.data.Dataset,
    threshold: float = 0.95,
    n_cells: int = 16,
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): partition the
    embedding space with the coarse k-means quantizer, then within each
    cell greedily keep the lowest-id vector of every cosine-``threshold``
    near-dup group.

    Scale shape: the cell assignment is one broadcast matmul per batch;
    the only exchange is the groupby on ``cell``; within-cell work is one
    (m x m) matmul + an O(m) masked sweep.  At corpus scale ``n_cells``
    grows proportionally (SemDeDup used 50k clusters for LAION) so the
    per-cell m stays bounded — same knob as the IVF index.  Near-dups
    split across a cell boundary are missed BY DESIGN (the paper's
    trade-off); recall vs the exact all-pairs path is measured in
    tests/test_embeddings_ivf.py.

    Returns one row per vector: (vec_id, cell, keep).
    """
    if centroids is None:
        centroids = train_ivf_centroids(embeddings, n_cells=n_cells)
    assigned = ivf_assign(embeddings, centroids, id_col)

    def dedup_cell(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        vecs = _normalize(_embedding_matrix(group))[order]
        n = len(ids)
        keep = np.ones(n, dtype=bool)
        sims = vecs @ vecs.T
        arange = np.arange(n)
        for i in range(n):
            if keep[i]:
                keep &= ~((sims[i] >= threshold) & (arange > i))
        cell = group["cell"].to_numpy(zero_copy_only=False)[order]
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cell": pa.array(cell, pa.int32()),
                "keep": pa.array(keep),
            }
        )

    return assigned.groupby("cell").map_groups(dedup_cell, batch_format="pyarrow")
