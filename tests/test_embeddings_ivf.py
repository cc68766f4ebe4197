"""IVF ANN scale path: recall against the exact brute-force baseline, cell
pruning actually prunes, and determinism from the pinned seed."""

import numpy as np
import pytest
import ray.data as rd

from intertext_ray.ops.embeddings import (
    ann_topk,
    ann_topk_ivf,
    ivf_assign,
    train_ivf_centroids,
)


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    # clustered synthetic embeddings: IVF recall is only meaningful when the
    # data has coarse structure (uniform vectors make every cell equidistant)
    rng = np.random.default_rng(7)
    n_clusters, per, dim = 12, 50, 32
    centers = rng.standard_normal((n_clusters, dim)) * 3.0
    vecs = np.vstack(
        [centers[c] + rng.standard_normal((per, dim)) for c in range(n_clusters)]
    )
    import pyarrow as pa

    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
        }
    )
    return rd.from_arrow(tbl)


def test_ivf_recall_vs_exact(emb_ds):
    qids = [0, 57, 123, 305, 588]
    exact = ann_topk(emb_ds, qids, k=10).to_pandas()
    approx = ann_topk_ivf(emb_ds, qids, k=10, n_cells=12, nprobe=4).to_pandas()
    recalls = []
    for q in qids:
        e = set(exact[exact.query_id == q].vec_id)
        a = set(approx[approx.query_id == q].vec_id)
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.9, recalls


def test_ivf_full_probe_equals_exact(emb_ds):
    """nprobe == n_cells scans everything -> identical to brute force."""
    qids = [3, 77]
    exact = ann_topk(emb_ds, qids, k=5).to_pandas()
    full = ann_topk_ivf(emb_ds, qids, k=5, n_cells=8, nprobe=8).to_pandas()
    assert exact.values.tolist() == full.values.tolist()


def test_ivf_assign_partitions_and_determinism(emb_ds):
    cent1 = train_ivf_centroids(emb_ds, n_cells=8)
    cent2 = train_ivf_centroids(emb_ds, n_cells=8)
    assert np.array_equal(cent1, cent2)  # pinned seed
    assigned = ivf_assign(emb_ds, cent1).to_pandas()
    assert assigned["cell"].between(0, 7).all()
    # coarse structure -> multiple non-empty cells, none owning everything
    sizes = assigned.groupby("cell").size()
    assert len(sizes) >= 4
    assert sizes.max() < len(assigned)


def test_ivf_recall_on_sorted_layout(ray_session):
    """The round-2 trainer sampled with limit() — the FIRST rows — which on
    a cluster-sorted layout trains centroids on a single cluster's slice.
    The seeded-uniform hash sample must keep recall on exactly that layout:
    vectors laid out strictly cluster-by-cluster (as a by-source or by-time
    corpus would be)."""
    import pyarrow as pa

    rng = np.random.default_rng(23)
    n_clusters, per, dim = 12, 60, 32
    centers = rng.standard_normal((n_clusters, dim)) * 3.0
    # sorted layout: cluster 0 rows first, then cluster 1, ... (no shuffle)
    vecs = np.vstack(
        [centers[c] + rng.standard_normal((per, dim)) for c in range(n_clusters)]
    )
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(tbl).repartition(8)
    # sample budget smaller than one cluster's span: limit() would see
    # ONLY cluster-0 rows; the hash sample must still cover all clusters
    cents = train_ivf_centroids(ds, n_cells=12, sample_rows=48)
    assigned = ivf_assign(ds, cents).to_pandas()
    sizes = assigned.groupby("cell").size()
    # centroids spread across the space: no cell owns the corpus, and the
    # assignment uses a healthy share of the trained cells
    assert sizes.max() <= len(assigned) * 0.5
    assert len(sizes) >= 6
    qids = [5, 130, 311, 415, 702]
    exact = ann_topk(ds, qids, k=10).to_pandas()
    approx = ann_topk_ivf(
        ds, qids, k=10, n_cells=12, nprobe=4, centroids=cents
    ).to_pandas()
    recalls = []
    for q in qids:
        e = set(exact[exact.query_id == q].vec_id)
        a = set(approx[approx.query_id == q].vec_id)
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.9, recalls


def test_ivf_centroids_layout_invariant(emb_ds, ray_session):
    """The training sample is a pure function of vec_id — reordering or
    repartitioning the corpus must yield bit-identical centroids (the
    limit() sample could not satisfy this)."""
    base = train_ivf_centroids(emb_ds, n_cells=8, sample_rows=128)
    perm = emb_ds.to_pandas().sample(frac=1.0, random_state=3)
    import pyarrow as pa

    shuffled = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(perm["vec_id"].to_numpy(), pa.int64()),
                "embedding": pa.array(
                    list(perm["embedding"].to_numpy()), pa.list_(pa.float64())
                ),
            }
        )
    ).repartition(5)
    assert np.array_equal(
        base, train_ivf_centroids(shuffled, n_cells=8, sample_rows=128)
    )


def test_semantic_dedup(ray_session):
    """Planted near-identical groups: one survivor per group (the lowest
    vec_id), singletons all kept, exactly n rows out."""
    import pyarrow as pa

    from intertext_ray.ops.embeddings import semantic_dedup

    rng = np.random.default_rng(11)
    dim = 16
    base = rng.standard_normal((6, dim)) * 4.0
    vecs, gid = [], []
    for g in range(6):
        # 3 copies with tiny jitter (cos ~ 1), then one distant singleton
        for _ in range(3):
            vecs.append(base[g] + rng.standard_normal(dim) * 1e-3)
            gid.append(g)
    singles = rng.standard_normal((8, dim)) * 4.0
    for s in singles:
        vecs.append(s)
        gid.append(-1)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(tbl)
    out = semantic_dedup(ds, threshold=0.99, n_cells=6).to_pandas()
    assert len(out) == len(vecs)
    out = out.sort_values("vec_id").reset_index(drop=True)
    out["gid"] = gid
    # every planted triple collapses to exactly its lowest id (copies are so
    # close that they always land in the same k-means cell)
    for g in range(6):
        grp = out[out.gid == g]
        kept = grp[grp.keep]
        assert len(kept) == 1 and kept.vec_id.iloc[0] == grp.vec_id.min()
    # far-apart singletons survive
    assert out[out.gid == -1].keep.all()


def test_lsh_cosine_subset_and_recall(emb_ds):
    """LSH pairs are a subset of the exact pairs at the same threshold;
    near-identical pairs (cos >= 0.95, tiny hyperplane-flip odds per
    table, 8 tables) are recovered with high recall."""
    from intertext_ray.ops.embeddings import cosine_dup_pairs, lsh_cosine_dup_pairs

    exact = cosine_dup_pairs(emb_ds, threshold=0.6).to_pandas()
    lsh = lsh_cosine_dup_pairs(
        emb_ds, threshold=0.6, n_planes=8, n_tables=8
    ).to_pandas()
    epairs = set(zip(exact.a, exact.b))
    lpairs = set(zip(lsh.a, lsh.b))
    assert lpairs <= epairs
    # one cos value per pair, identical on both paths
    merged = exact.merge(lsh, on=["a", "b"], suffixes=("_e", "_l"))
    assert (merged.cos_x1000_e == merged.cos_x1000_l).all()
    hi = exact[exact.cos_x1000 >= 950]
    if len(hi):
        hipairs = set(zip(hi.a, hi.b))
        recall = len(hipairs & lpairs) / len(hipairs)
        assert recall >= 0.9, recall


def test_pq_near_dup_retrieval_and_determinism(ray_session):
    """IVFADC product quantization serves the engine's retrieval need:
    planted near-dup copies (jitter << cloud noise) of a query vector
    rank at the top under ADC scoring.  Top-10 of ISOTROPIC noise is
    intentionally not asserted — ranking within a unit-noise cloud is
    quantization-resolution-free information no PQ code can retain (the
    IVF path re-scores probed cells exactly and covers that case)."""
    from intertext_ray.ops.embeddings import ann_topk_pq

    rng = np.random.default_rng(11)
    n_base, dim, n_copies = 150, 32, 3
    bases = rng.standard_normal((n_base, dim)) * 3.0
    vecs = [bases]
    for c in range(n_copies):
        vecs.append(bases + rng.standard_normal((n_base, dim)) * 0.05)
    mat = np.vstack(vecs)  # copy j of base i has id i + (j+1)*n_base
    import pyarrow as pa

    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(mat)), pa.int64()),
                "embedding": pa.array(list(mat), pa.list_(pa.float64())),
            }
        )
    )
    qids = [0, 17, 63, 99, 142]
    out = ann_topk_pq(
        ds, qids, k=n_copies + 1, m=8, n_centroids=64
    ).to_pandas()
    recalls = []
    for q in qids:
        want = {q + (j + 1) * n_base for j in range(n_copies)} | {q}
        got = set(out[out.query_id == q].vec_id)
        recalls.append(len(want & got) / len(want))
    assert np.mean(recalls) >= 0.9, recalls
    again = ann_topk_pq(
        ds, qids, k=n_copies + 1, m=8, n_centroids=64
    ).to_pandas()
    assert again.equals(out)


def test_pq_codes_artifact(emb_ds):
    """The materialized code table: one row per vector, m uint8 codes,
    cell in range, and codes agree with the on-the-fly encoding used by
    ann_topk_pq (same seed -> same codebooks)."""
    from intertext_ray.ops.embeddings import (
        _embedding_matrix,
        _normalize,
        pq_codes,
        pq_encode,
        train_ivf_centroids,
        train_pq_codebooks,
    )
    import pyarrow as pa

    out = pq_codes(emb_ds, m=8, n_centroids=32, n_cells=12).to_pandas()
    assert len(out) == 600
    assert out["cell"].between(0, 11).all()
    assert all(len(c) == 8 for c in out["codes"])
    # independent re-derivation
    coarse = train_ivf_centroids(emb_ds, n_cells=12, seed=0x90_1234 ^ 0x777)
    books = train_pq_codebooks(
        emb_ds, 8, 32, 4096, seed=0x90_1234, coarse=coarse
    )
    tbl = pa.Table.from_pandas(emb_ds.to_pandas())
    mat = _normalize(_embedding_matrix(tbl))
    ids = tbl["vec_id"].to_numpy()
    cell = np.argmax(mat @ coarse.T, axis=1)
    codes = pq_encode(mat - coarse[cell], books)
    got = out.set_index("vec_id")
    assert (got.loc[ids, "cell"].to_numpy() == cell).all()
    assert all(
        list(got.loc[i, "codes"]) == list(codes[j])
        for j, i in enumerate(ids[:50])
    )


def test_lsh_cosine_hot_bucket_cap(ray_session):
    """A degenerate sign-bucket (identical vectors all hashing to the same
    signs) must not blow up one map_groups task: with the cap, the hot
    bucket emits NOTHING (bounded emission) and the metrics pass reports
    the dropped pair mass; small buckets are untouched."""
    import pyarrow as pa

    from intertext_ray.ops.embeddings import (
        lsh_cosine_bucket_metrics,
        lsh_cosine_dup_pairs,
    )

    rng = np.random.default_rng(11)
    dim, n_hot = 16, 60
    hot = np.tile(rng.standard_normal(dim), (n_hot, 1))  # one degenerate bucket
    # two planted near-dup pairs far from the hot direction
    a = rng.standard_normal(dim)
    b = rng.standard_normal(dim)
    vecs = np.vstack([hot, a, a * 1.001, b, b * 0.999])
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(tbl)

    capped = lsh_cosine_dup_pairs(
        ds, threshold=0.99, bucket_docs_cap=16
    ).to_pandas()
    hot_ids = set(range(n_hot))
    # bounded emission: zero pairs out of the degenerate bucket...
    assert not any(
        r.a in hot_ids and r.b in hot_ids for r in capped.itertuples()
    )
    # ...while the small planted buckets still verify
    got_pairs = {(r.a, r.b) for r in capped.itertuples()}
    assert (n_hot, n_hot + 1) in got_pairs
    assert (n_hot + 2, n_hot + 3) in got_pairs

    uncapped = lsh_cosine_dup_pairs(
        ds, threshold=0.99, bucket_docs_cap=0
    ).to_pandas()
    assert len(uncapped) >= n_hot * (n_hot - 1) // 2  # hot pairs all present

    m = lsh_cosine_bucket_metrics(ds, cap=16)
    # every table collapses the identical vectors into one bucket of 60
    assert m["max_bucket"] == n_hot
    assert m["dropped_pair_mass"] >= n_hot * (n_hot - 1) // 2
    m0 = lsh_cosine_bucket_metrics(ds, cap=0)
    assert m0["dropped_pair_mass"] == 0


def test_merge_topk_many_queries(ray_session):
    """The distributed top-k merge: >=10^3 queries resolve in one
    groupby(query_id) stage — the driver sees exactly n_queries x k rows —
    and every query ranks itself first at cos_x1000 == 1000."""
    import pyarrow as pa

    from intertext_ray.ops.embeddings import ann_topk

    rng = np.random.default_rng(23)
    n, dim, k = 1200, 16, 5
    vecs = rng.standard_normal((n, dim))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(tbl).repartition(16)
    qids = list(range(n))  # every vector is a query
    out = ann_topk(ds, qids, k=k).to_pandas()
    assert len(out) == n * k
    self_rows = out[out["rank"] == 0]
    assert len(self_rows) == n
    assert (self_rows["query_id"].to_numpy() == self_rows["vec_id"].to_numpy()).all()
    assert (self_rows["cos_x1000"].to_numpy() == 1000).all()
