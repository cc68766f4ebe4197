"""Embedding ops: brute-force cosine ANN top-k (broadcast query matrix),
threshold near-dup pairs, and an LSH-bucketed scale variant.

The query matrix is ``ray.put`` ONCE and read per actor — never re-shipped
per batch; each batch does one float64 matmul against it (vectorized).  The
LSH variant buckets vectors by random-hyperplane sign bits so only
same-bucket pairs are scored — the scale path when N×Q matmuls get too big.
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
    deterministic tie-break by vec_id."""
    qset = set(int(q) for q in query_ids)
    qref = ray.put(qset)

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = np.array([int(i) in ray.get(qref) for i in ids], bool)
        return batch.filter(pa.array(m))

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
            out.append((int(qid), int(r.vec_id), rank, math.floor(1000.0 * r.cos)))
    return pa.table(
        {
            "query_id": pa.array([o[0] for o in out], pa.int64()),
            "vec_id": pa.array([o[1] for o in out], pa.int64()),
            "rank": pa.array([o[2] for o in out], pa.int64()),
            "cos_x1000": pa.array([o[3] for o in out], pa.int64()),
        }
    )


def cosine_dup_pairs(
    embeddings: ray.data.Dataset,
    threshold: float = 0.9,
    num_buckets: int = 16,
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """Embedding-cosine near-dup pairs: (a, b) with cos >= threshold, a < b.

    Exact all-pairs via bucketed block-matmul: rows are hash-bucketed by id;
    every bucket PAIR is scored with one float64 matmul (map over the
    bucket-pair list) — O(N²/B²) memory per task, exact results.  For
    corpora where N² is infeasible, use :func:`lsh_cosine_dup_pairs`.
    """
    mats: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    nb = num_buckets
    for b in embeddings.iter_batches(batch_size=8192, batch_format="pyarrow"):
        ids = b[id_col].to_numpy(zero_copy_only=False)
        mat = _normalize(_embedding_matrix(b))
        for bk in range(nb):
            m = (ids % nb) == bk
            if m.any():
                prev = mats.get(bk)
                if prev is None:
                    mats[bk] = (ids[m].copy(), mat[m])
                else:
                    mats[bk] = (
                        np.concatenate([prev[0], ids[m]]),
                        np.vstack([prev[1], mat[m]]),
                    )
    refs = {bk: ray.put(v) for bk, v in mats.items()}
    tasks = [(i, j) for i in sorted(refs) for j in sorted(refs) if i <= j]

    @ray.remote
    def score(pair):
        i, j = pair
        ids_a, mat_a = ray.get(refs[i])
        ids_b, mat_b = ray.get(refs[j])
        sims = mat_a @ mat_b.T
        ia, ib = np.nonzero(sims >= threshold)
        da, db = ids_a[ia], ids_b[ib]
        if i == j:
            keep = da < db
        else:
            keep = da != db
        da, db, cs = da[keep], db[keep], sims[ia, ib][keep]
        swap = da > db
        a = np.where(swap, db, da)
        b = np.where(swap, da, db)
        return pa.table(
            {
                "a": pa.array(a.astype(np.int64), pa.int64()),
                "b": pa.array(b.astype(np.int64), pa.int64()),
                "cos_x1000": pa.array(
                    np.floor(1000.0 * cs).astype(np.int64), pa.int64()
                ),
            }
        )

    tables = ray.get([score.remote(t) for t in tasks])
    merged = pa.concat_tables(tables) if tables else pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "cos_x1000": pa.array([], pa.int64())}
    )
    ds = ray.data.from_arrow(merged)
    return ds.sort(["a", "b"])


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
    -> bucket groupby -> verify."""
    import pandas as pd

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
        mat = _embedding_matrix(group, "vec")
        sims = mat @ mat.T
        ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
        da, db = ids[ia], ids[ib]
        swap = da > db
        a = np.where(swap, db, da)
        b = np.where(swap, da, db)
        return pa.table(
            {
                "a": pa.array(a.astype(np.int64)),
                "b": pa.array(b.astype(np.int64)),
                "cos_x1000": pa.array(
                    np.floor(1000.0 * sims[ia, ib]).astype(np.int64)
                ),
            }
        )

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["a", "b"])

    return (
        embeddings.map_batches(explode, batch_format="pyarrow")
        .groupby("bucket_key")
        .map_groups(verify, batch_format="pyarrow")
        .groupby(["a", "b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )
