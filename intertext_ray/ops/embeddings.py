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


def _merge_topk(
    partials: ray.data.Dataset, k: int, score_col: str, out_col: str
) -> pa.Table:
    """Merge per-batch top-k partials into the exact global per-query top-k
    as a DATASET stage: one ``groupby(query_id)`` exchange + per-group
    vectorized sort-and-head, so the driver receives exactly
    ``n_queries x k`` rows — never the ``n_blocks x n_queries x k`` partial
    set (a 10^5-block scan with a 10^3-query batch would otherwise put
    ~10^9 rows on the driver).  Deterministic tie-break by vec_id."""

    def topk(group: pa.Table) -> pa.Table:
        s = group[score_col].to_numpy(zero_copy_only=False)
        v = group["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = group["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((v, -s))[:k]
        # +1e-6 before floor: a query's cosine with itself computes as
        # 0.999...9 or 1.000...1 depending on float op order (normalized
        # matmul here vs dot/|a||b| in the SQL twin) — the epsilon makes
        # floor(1000*score) stable on both sides of such boundaries
        scaled = np.floor(1000.0 * s[order] + 1e-6).astype(np.int64)
        return pa.table(
            {
                "query_id": pa.array(q[order], pa.int64()),
                "vec_id": pa.array(v[order], pa.int64()),
                "rank": pa.array(
                    np.arange(len(order), dtype=np.int64), pa.int64()
                ),
                out_col: pa.array(scaled, pa.int64()),
            }
        )

    merged = (
        partials.groupby("query_id")
        .map_groups(topk, batch_format="pyarrow")
        .to_pandas()  # exactly n_queries x k rows by construction
        .sort_values(["query_id", "rank"])
    )
    return pa.table(
        {
            "query_id": pa.array(merged["query_id"].to_numpy(), pa.int64()),
            "vec_id": pa.array(merged["vec_id"].to_numpy(), pa.int64()),
            "rank": pa.array(merged["rank"].to_numpy(), pa.int64()),
            out_col: pa.array(merged[out_col].to_numpy(), pa.int64()),
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
    )
    return _merge_topk(partials, k, "cos", "cos_x1000")


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


_CAND_PAIR_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])

_RESOLVED_VEC_SCHEMA = pa.schema(
    [
        ("a", pa.int64()),
        ("b", pa.int64()),
        ("side", pa.int8()),
        ("vec", pa.list_(pa.float64())),
    ]
)


def _dedup_id_pairs_bucketed(pairs: ray.data.Dataset, num_buckets: int = 64):
    """Exact (a, b) id-pair dedup as a bucketed groupby + vectorized
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
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.ones(len(a), dtype=bool)
        if len(a) > 1:
            keep[1:] = ~((a[1:] == a[:-1]) & (b[1:] == b[:-1]))
        return pa.table(
            {
                "a": pa.array(a[keep], pa.int64()),
                "b": pa.array(b[keep], pa.int64()),
            },
            schema=_CAND_PAIR_SCHEMA,
        )

    return (
        pairs.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(uniq, batch_format="pyarrow")
    )


def _score_pairs_cogroup(
    cand: ray.data.Dataset,
    embeddings: ray.data.Dataset,
    threshold: float,
    id_col: str = "vec_id",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Exactly score candidate (a, b) id pairs by cosine without ever
    shipping a vector more than once: phase 1 co-locates each pair side
    with its vector by id-hash bucket (the `audio_dedup.verify_audio_pairs`
    pattern); phase 2 co-locates the two resolved sides by pair-hash bucket
    and computes the dot products vectorized.  Emits (a, b, cos_x1000) for
    pairs with cos >= threshold."""
    nbu = np.uint64(num_buckets)

    def tag_vecs(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _normalize(_embedding_matrix(t))
        return pa.table(
            {
                "bucket": pa.array(
                    (splitmix64(ids.astype(np.uint64)) % nbu).astype(np.int64)
                ),
                "kind": pa.array(np.zeros(len(t), np.int8), pa.int8()),
                "doc": pa.array(ids, pa.int64()),
                "a": pa.array(np.zeros(len(t), np.int64), pa.int64()),
                "b": pa.array(np.zeros(len(t), np.int64), pa.int64()),
                "vec": pa.array(list(mat), pa.list_(pa.float64())),
            }
        )

    def tag_requests(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.concatenate([a, b])
        return pa.table(
            {
                "bucket": pa.array(
                    (splitmix64(doc.astype(np.uint64)) % nbu).astype(np.int64)
                ),
                "kind": pa.array(np.ones(2 * len(t), np.int8), pa.int8()),
                "doc": pa.array(doc, pa.int64()),
                "a": pa.array(np.concatenate([a, a]), pa.int64()),
                "b": pa.array(np.concatenate([b, b]), pa.int64()),
                "vec": pa.array([[]] * (2 * len(t)), pa.list_(pa.float64())),
            }
        )

    def resolve(gtab: pa.Table) -> pa.Table:
        kind = gtab["kind"].to_numpy(zero_copy_only=False)
        doc = gtab["doc"].to_numpy(zero_copy_only=False)
        vec_col = gtab["vec"]
        if isinstance(vec_col, pa.ChunkedArray):
            vec_col = vec_col.combine_chunks()
        src_rows = np.nonzero(kind == 0)[0]
        req = np.nonzero(kind == 1)[0]
        if len(req) == 0 or len(src_rows) == 0:
            return _RESOLVED_VEC_SCHEMA.empty_table()
        src_docs = doc[src_rows]
        order = np.argsort(src_docs, kind="stable")
        src_docs, src_rows = src_docs[order], src_rows[order]
        pos = np.searchsorted(src_docs, doc[req])
        ok = (pos < len(src_docs)) & (
            src_docs[np.minimum(pos, len(src_docs) - 1)] == doc[req]
        )
        req = req[ok]
        gather = src_rows[pos[ok]]
        a = gtab["a"].to_numpy(zero_copy_only=False)[req]
        b = gtab["b"].to_numpy(zero_copy_only=False)[req]
        side = np.where(doc[req] == a, np.int8(0), np.int8(1))
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "side": pa.array(side, pa.int8()),
                "vec": vec_col.take(pa.array(gather, pa.int64())),
            },
            schema=_RESOLVED_VEC_SCHEMA,
        )

    def pair_bucket(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "bucket",
            pa.array((splitmix64(splitmix64(a) ^ b) % nbu).astype(np.int64)),
        )

    def score(gtab: pa.Table) -> pa.Table:
        a = gtab["a"].to_numpy(zero_copy_only=False)
        b = gtab["b"].to_numpy(zero_copy_only=False)
        side = gtab["side"].to_numpy(zero_copy_only=False)
        if len(a) < 2:
            return _cos_pairs_table([], [], [])
        order = np.lexsort((side, b, a))
        a, b, side = a[order], b[order], side[order]
        mat = _embedding_matrix(gtab, "vec")[order]
        # runs of exactly (side 0, side 1) for the same (a, b) pair
        same_next = np.zeros(len(a), dtype=bool)
        same_next[:-1] = (
            (a[1:] == a[:-1]) & (b[1:] == b[:-1])
            & (side[:-1] == 0) & (side[1:] == 1)
        )
        lo = np.nonzero(same_next)[0]
        if len(lo) == 0:
            return _cos_pairs_table([], [], [])
        sims = np.einsum("ij,ij->i", mat[lo], mat[lo + 1])
        keep = sims >= threshold
        return _cos_pairs_table(
            a[lo][keep], b[lo][keep], np.floor(1000.0 * sims[keep])
        )

    tagged = embeddings.map_batches(tag_vecs, batch_format="pyarrow").union(
        cand.map_batches(tag_requests, batch_format="pyarrow")
    )
    resolved = tagged.groupby("bucket").map_groups(
        resolve, batch_format="pyarrow"
    )
    return (
        resolved.map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(score, batch_format="pyarrow")
    )


def _lsh_sign_planes(
    embeddings: ray.data.Dataset, n_planes: int, n_tables: int, seed: int
):
    """Deterministic random hyperplanes from the pinned seed family,
    broadcast once (``ray.put``)."""
    first = embeddings.take(1)
    dim = len(first[0]["embedding"])
    rng = np.random.default_rng(int(splitmix64(np.uint64(seed))))
    return ray.put(rng.standard_normal((n_tables, n_planes, dim)))


def _lsh_explode(planes_ref, id_col: str):
    """(vec_id, embedding) batch -> one (bucket_key, vec_id) row per table;
    the exchange ships ids ONLY (vectors travel once, in the verify join)."""

    def explode(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        vecs = _normalize(_embedding_matrix(batch))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keys, out_ids = [], []
        for t in range(pl.shape[0]):
            signs = (vecs @ pl[t].T) > 0
            key = np.zeros(len(ids), dtype=np.uint64)
            for p in range(pl.shape[1]):
                key |= signs[:, p].astype(np.uint64) << np.uint64(p)
            key |= np.uint64(t) << np.uint64(48)
            keys.append(key)
            out_ids.append(ids)
        return pa.table(
            {
                "bucket_key": pa.array(np.concatenate(keys), pa.uint64()),
                "vec_id": pa.array(np.concatenate(out_ids).astype(np.int64)),
            }
        )

    return explode


def lsh_cosine_dup_pairs(
    embeddings: ray.data.Dataset,
    threshold: float = 0.9,
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 0xE5B,
    id_col: str = "vec_id",
    bucket_docs_cap: int = 4096,
) -> ray.data.Dataset:
    """Scale path: random-hyperplane LSH — each vector lands in ``n_tables``
    sign-buckets; only same-bucket pairs are exactly scored.  Approximate
    (recall < 1 by design) but shuffle-shaped like the MinHash path:
    explode -> bucket groupby -> pair emission -> bucketed pair dedup ->
    co-grouped vector resolution + exact scoring.

    The LSH exchange ships (bucket_key, vec_id) ONLY — at 768-dim float64
    a vector is ~6 KB, so replicating it ``n_tables``x through the shuffle
    (the round-2 shape) multiplies exchange volume by orders of magnitude;
    instead the full vectors travel exactly once, into the id-hash-bucketed
    verify join (the `audio_dedup.verify_audio_pairs` pattern), and each
    DISTINCT candidate pair is scored once (the old path scored every
    duplicate then deduped).

    Hot-bucket cap (the `stages/candidates.py` ``band_docs_cap`` pattern):
    a sign-bucket with more than ``bucket_docs_cap`` distinct ids emits NO
    pairs — with only ``2^n_planes`` buckets per table, average occupancy
    grows linearly with corpus size, so one degenerate bucket (near-zero /
    boilerplate embeddings all hashing to the same signs) would otherwise
    emit O(n^2) pairs inside a single ``map_groups`` task.  Dropped pair
    mass is measured by :func:`lsh_cosine_bucket_metrics` (same one-pass
    shape as ``stages.candidates.band_metrics``).  At corpus scale, size
    ``n_planes`` with ``log2(corpus / target_occupancy)`` — e.g. 10^9
    vectors at ~1k expected ids per bucket needs n_planes ≈ 20 — so the
    cap is the skew backstop, not the operating point; recall lost to
    extra planes is bought back by raising ``n_tables`` (OR-construction).
    ``bucket_docs_cap=0`` disables the cap."""
    planes_ref = _lsh_sign_planes(embeddings, n_planes, n_tables, seed)

    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group["vec_id"].to_numpy(zero_copy_only=False))
        if len(ids) < 2 or (bucket_docs_cap and len(ids) > bucket_docs_cap):
            return _CAND_PAIR_SCHEMA.empty_table()
        ia, ib = np.triu_indices(len(ids), k=1)
        return pa.table(
            {
                "a": pa.array(ids[ia], pa.int64()),
                "b": pa.array(ids[ib], pa.int64()),
            },
            schema=_CAND_PAIR_SCHEMA,
        )

    cand = (
        embeddings.map_batches(_lsh_explode(planes_ref, id_col), batch_format="pyarrow")
        .groupby("bucket_key")
        .map_groups(emit_pairs, batch_format="pyarrow")
    )
    cand = _dedup_id_pairs_bucketed(cand)
    return _score_pairs_cogroup(cand, embeddings, threshold, id_col)


def lsh_cosine_bucket_metrics(
    embeddings: ray.data.Dataset,
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 0xE5B,
    id_col: str = "vec_id",
    cap: int = 4096,
) -> dict:
    """Sign-bucket occupancy metrics for manifests: bucket count, max
    occupancy, candidate-pair mass, and the mass ``bucket_docs_cap=cap``
    drops.  One extra streaming pass (distinct-ids-per-bucket groupby);
    run when metrics are requested, mirroring ``candidates.band_metrics``."""
    planes_ref = _lsh_sign_planes(embeddings, n_planes, n_tables, seed)

    def bucket_size(group: pa.Table) -> pa.Table:
        n = len(np.unique(group["vec_id"].to_numpy(zero_copy_only=False)))
        return pa.table({"n": pa.array([n], pa.int64())})

    sizes = (
        embeddings.map_batches(_lsh_explode(planes_ref, id_col), batch_format="pyarrow")
        .groupby("bucket_key")
        .map_groups(bucket_size, batch_format="pyarrow")
    )

    def summarize(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        pairs = n * (n - 1) // 2
        dropped = pairs[n > cap].sum() if cap else 0
        return pa.table(
            {
                "buckets": pa.array([len(n)], pa.int64()),
                "max_bucket": pa.array([int(n.max()) if len(n) else 0], pa.int64()),
                "pair_mass": pa.array([int(pairs.sum())], pa.int64()),
                "dropped_pair_mass": pa.array([int(dropped)], pa.int64()),
            }
        )

    parts = sizes.map_batches(summarize, batch_format="pyarrow").to_pandas()
    return {
        "buckets": int(parts["buckets"].sum()),
        "max_bucket": int(parts["max_bucket"].max()) if len(parts) else 0,
        "pair_mass": int(parts["pair_mass"].sum()),
        "dropped_pair_mass": int(parts["dropped_pair_mass"].sum()),
    }


# ---------------------------------------------------------------------------
# IVF ANN — the 100 TB scale path for top-k search
# ---------------------------------------------------------------------------


def train_ivf_centroids(
    embeddings: ray.data.Dataset,
    n_cells: int = 16,
    sample_rows: int = 4096,
    iters: int = 8,
    seed: int = 0x1BF,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Coarse quantizer: k-means over a bounded UNIFORM sample (sample ≪
    corpus, so driver-side Lloyd iterations are scale-correct — the FULL
    dataset never leaves the cluster; only ~``sample_rows`` rows do).

    The sample is seeded-uniform, not positional: keep rows whose
    ``splitmix64(vec_id ^ salt)`` clears a count-derived rate threshold
    (2x oversampled), then the ``sample_rows`` smallest hashes win.  A
    pure function of the ids — identical across layouts, partitionings
    and re-runs, and free of head-of-corpus bias (``limit()`` would train
    on the FIRST rows, a biased slice on any sorted/clustered layout:
    by-source, by-time...).  Deterministic from ``seed``.  Returns
    (n_cells, dim) L2-normalized centroids."""
    total = embeddings.count()
    rate = min(1.0, (2.0 * sample_rows) / max(total, 1))
    thresh = np.uint64(min(int(rate * float(2**64 - 1)), 2**64 - 1))
    salt = splitmix64(np.uint64(seed ^ 0xA5A5_5A5A))

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = splitmix64(ids ^ salt)
        m = h <= thresh
        kept = batch.select([id_col, "embedding"]).filter(pa.array(m))
        return kept.append_column("_h", pa.array(h[m], pa.uint64()))

    # the rate filter leaves ~2x sample_rows rows in total, so this
    # to_pandas is bounded by the sample size, never the corpus
    sample = embeddings.map_batches(pick, batch_format="pyarrow").to_pandas()
    sample = sample.sort_values(["_h", id_col]).head(sample_rows)
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

    partials = assigned.map_batches(
        keep_cells, batch_format="pyarrow"
    ).map_batches(score, batch_format="pyarrow", batch_size=4096)
    return _merge_topk(partials, k, "cos", "cos_x1000")


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


def train_pq_codebooks(
    embeddings: ray.data.Dataset,
    m: int = 8,
    n_centroids: int = 32,
    sample_rows: int = 4096,
    iters: int = 12,
    seed: int = 0x90_1234,
    id_col: str = "vec_id",
    coarse: np.ndarray | None = None,
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. 2011): split the
    L2-normalized vector into ``m`` contiguous subspaces and k-means each
    independently over the same seeded-uniform bounded sample as
    :func:`train_ivf_centroids` (layout/partition-invariant, no head-of-
    corpus bias).  With ``coarse`` centroids given, codebooks are trained
    on the RESIDUAL x - c(x) (the IVFADC construction — residual energy
    is the within-cell offset, far smaller than the vector itself, so the
    same code budget quantizes much finer).  Returns float64
    (m, n_centroids, dim//m)."""
    total = embeddings.count()
    rate = min(1.0, (2.0 * sample_rows) / max(total, 1))
    thresh = np.uint64(min(int(rate * float(2**64 - 1)), 2**64 - 1))
    salt = splitmix64(np.uint64(seed ^ 0xC3C3_3C3C))

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = splitmix64(ids ^ salt)
        keep = h <= thresh
        kept = batch.select([id_col, "embedding"]).filter(pa.array(keep))
        return kept.append_column("_h", pa.array(h[keep], pa.uint64()))

    sample = embeddings.map_batches(pick, batch_format="pyarrow").to_pandas()
    sample = sample.sort_values(["_h", id_col]).head(sample_rows)
    mat = _normalize(np.vstack(sample["embedding"].to_numpy()))
    if coarse is not None:
        mat = mat - coarse[np.argmax(mat @ coarse.T, axis=1)]
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(int(splitmix64(np.uint64(seed))))
    kc = min(n_centroids, len(mat))
    books = np.empty((m, kc, dsub))
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        cent = sub[rng.choice(len(sub), size=kc, replace=False)]
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(kc):
                msk = assign == c
                if msk.any():
                    cent[c] = sub[msk].mean(axis=0)
        books[j] = cent
    return books


def pq_encode(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes: per subspace, index of the nearest codeword
    (L2) for each L2-normalized input row."""
    n, dim = mat.shape
    m, kc, dsub = books.shape
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def ann_topk_pq(
    embeddings: ray.data.Dataset,
    query_ids: list[int],
    k: int = 10,
    m: int = 8,
    n_centroids: int = 32,
    n_cells: int = 16,
    sample_rows: int = 4096,
    seed: int = 0x90_1234,
    id_col: str = "vec_id",
) -> pa.Table:
    """Approximate cosine top-k via IVFADC (Jégou et al. 2011): a coarse
    quantizer (the IVF centroids) plus product-quantized RESIDUALS with
    asymmetric distance computation — score(q, x) ≈ <q, c(x)> +
    Σ_j table_q[j, code_j(x)], i.e. one cell lookup + m table lookups
    instead of a dim-length dot product; at scale (codes materialized)
    ~dim*8 bytes -> m + 1 bytes per vector of memory.

    Scale shape: codebooks train on the bounded seeded sample; the scan
    is one streaming ``map_batches`` with per-batch partial top-k (the
    `ann_topk` merge contract); queries and codebooks broadcast once.
    Returns (query_id, vec_id, rank, ip_x1000) — approximate scores,
    recall pinned in tests (rows-only: k-means not SQL-expressible)."""
    coarse = train_ivf_centroids(
        embeddings, n_cells=n_cells, sample_rows=sample_rows,
        seed=seed ^ 0x777, id_col=id_col,
    )
    books = train_pq_codebooks(
        embeddings, m, n_centroids, sample_rows, seed=seed, id_col=id_col,
        coarse=coarse,
    )
    qarr = np.asarray(sorted(int(q) for q in query_ids), dtype=np.int64)

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(ids, qarr)))

    qtbl = embeddings.map_batches(pick, batch_format="pyarrow").to_pandas()
    qtbl = qtbl.sort_values(id_col)
    qmat = _normalize(np.vstack(qtbl["embedding"].to_numpy()))
    mm, kc, dsub = books.shape
    # ADC tables: table[q][j][c] = <q_sub_j, codeword_c>; coarse table
    # ct[q][cell] = <q, centroid_cell>
    tables = np.einsum("qjd,jcd->qjc", qmat.reshape(len(qmat), mm, dsub), books)
    ctab = qmat @ coarse.T
    state = ray.put(
        {
            "qids": qtbl[id_col].to_numpy(),
            "tables": tables,
            "books": books,
            "coarse": coarse,
            "ctab": ctab,
        }
    )
    jj = np.arange(mm)

    def scan(batch: pa.Table) -> pa.Table:
        st = ray.get(state)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _normalize(np.vstack(batch["embedding"].to_pandas().to_numpy()))
        cell = np.argmax(mat @ st["coarse"].T, axis=1)
        codes = pq_encode(mat - st["coarse"][cell], st["books"])
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(st["qids"]):
            s = st["ctab"][qi][cell] + st["tables"][qi][jj, codes].sum(axis=1)
            top = np.argsort(-s, kind="stable")[:k]
            out_q.extend([int(qid)] * len(top))
            out_v.extend(ids[top].tolist())
            out_s.extend(s[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "ip": pa.array(out_s, pa.float64()),
            }
        )

    partials = embeddings.map_batches(
        scan, batch_format="pyarrow", batch_size=4096
    )
    return _merge_topk(partials, k, "ip", "ip_x1000")


def pq_codes(
    embeddings: ray.data.Dataset,
    m: int = 8,
    n_centroids: int = 32,
    n_cells: int = 16,
    sample_rows: int = 4096,
    seed: int = 0x90_1234,
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """(vec_id, cell, codes:list<uint8>) — the MATERIALIZED IVFADC index
    artifact: each vector compressed to 1 coarse-cell byte + ``m`` code
    bytes (vs dim*8 raw), the form a 100 TB embedding store would keep
    resident for repeated ANN scans (`ann_topk_pq` encodes on the fly;
    at scale you write THIS table once and scan it instead).

    One streaming pass; codebooks broadcast once.  Deterministic from
    ``seed`` (layout-invariant training sample)."""
    coarse = train_ivf_centroids(
        embeddings, n_cells=n_cells, sample_rows=sample_rows,
        seed=seed ^ 0x777, id_col=id_col,
    )
    books = train_pq_codebooks(
        embeddings, m, n_centroids, sample_rows, seed=seed, id_col=id_col,
        coarse=coarse,
    )
    state = ray.put({"coarse": coarse, "books": books})

    def encode(batch: pa.Table) -> pa.Table:
        st = ray.get(state)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _normalize(_embedding_matrix(batch))
        cell = np.argmax(mat @ st["coarse"].T, axis=1)
        codes = pq_encode(mat - st["coarse"][cell], st["books"])
        n, mm = codes.shape
        offs = np.arange(0, (n + 1) * mm, mm, dtype=np.int32)
        codes_col = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()),
            pa.array(codes.ravel(), pa.uint8()),
        )
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cell": pa.array(cell.astype(np.int64), pa.int64()),
                "codes": codes_col,
            }
        )

    return embeddings.map_batches(encode, batch_format="pyarrow")
