"""Deterministic hash split + corpus-wide top n-grams."""

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd


def test_hash_split_deterministic_and_balanced(ray_session):
    from intertext_ray.functions.hashing import splitmix64
    from intertext_ray.ops.sampling import hash_split

    ids = list(range(2000))
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(["x"] * len(ids))})
    )
    got = {r["doc_id"]: r["split"] for r in hash_split(docs, permille_train=900).take_all()}
    for i in ids:
        expect = "train" if int(splitmix64(np.uint64(i)) % np.uint64(1000)) < 900 else "val"
        assert got[i] == expect
    frac = sum(1 for v in got.values() if v == "train") / len(ids)
    assert 0.87 < frac < 0.93
    # salt produces a different (but deterministic) assignment
    got2 = {r["doc_id"]: r["split"] for r in hash_split(docs, salt=7).take_all()}
    assert got2 != got


def test_top_ngrams_brute_force(ray_session):
    from intertext_ray.ops.text_stats import top_ngrams

    rng = np.random.default_rng(2)
    vocab = [f"w{i}" for i in range(5)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(0, 30))))
        for _ in range(60)
    ] + ["", "solo"]
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )
    c = Counter()
    for t in texts:
        toks = t.split()
        c.update(" ".join(toks[i : i + 2]) for i in range(len(toks) - 1))
    expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r["gram"], r["n_occ"]) for r in top_ngrams(docs, n=2, top=10).take_all()]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == expect


def test_top_ngrams_trigram(ray_session):
    from intertext_ray.ops.text_stats import top_ngrams

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["a b c a b c a b", "b c a"], pa.string()),
            }
        )
    )
    got = {(r["gram"], r["n_occ"]) for r in top_ngrams(docs, n=3, top=3).take_all()}
    assert got == {("a b c", 2), ("b c a", 3), ("c a b", 2)}


def test_stratified_sample_matches_brute_force(ray_session):
    from intertext_ray.functions.hashing import splitmix64
    from intertext_ray.ops.sampling import stratified_sample

    rng = np.random.default_rng(4)
    n = 3000
    groups = [f"g{int(x)}" for x in rng.integers(0, 7, n)]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "lang": pa.array(groups, pa.string()),
            }
        )
    ).repartition(13)  # force the combiner to run on many partial blocks
    k = 9
    out = stratified_sample(docs, group_col="lang", k=k).to_pandas()

    want = {}
    for g in set(groups):
        ids = [i for i in range(n) if groups[i] == g]
        ids.sort(key=lambda i: (int(splitmix64(np.uint64(i))), i))
        want[g] = set(ids[:k])
    got = {}
    for r in out.itertuples():
        got.setdefault(r.lang, set()).add(int(r.doc_id))
    assert got == want


def test_stratified_sample_salt_changes_selection(ray_session):
    from intertext_ray.ops.sampling import stratified_sample

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(500), pa.int64()),
                "lang": pa.array(["a"] * 500, pa.string()),
            }
        )
    )
    s0 = set(stratified_sample(docs, k=20).to_pandas().doc_id)
    s1 = set(stratified_sample(docs, k=20, salt=3).to_pandas().doc_id)
    assert len(s0) == 20 and len(s1) == 20 and s0 != s1


def test_exact_int_quantiles(ray_session):
    from intertext_ray.ops.sampling import exact_int_quantiles

    rng = np.random.default_rng(9)
    vals = rng.integers(0, 40, 777).astype(np.int64)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
    qs = [0.0, 0.1, 0.5, 0.9, 0.99, 1.0]
    out = exact_int_quantiles(ds, "v", qs).to_pandas()
    sv = np.sort(vals)
    n = len(sv)
    for q, v in zip(out.q, out.value):
        rank = max(1, int(np.ceil(q * n)))
        assert v == sv[rank - 1], (q, v, sv[rank - 1])


def test_uniform_sample_k_matches_scalar_and_is_layout_invariant(ray_session):
    """The distributed two-phase top-k equals a scalar argsort of
    splitmix64(id^salt) over ALL ids, at any partitioning, and with more
    combiner survivors than one default batch (k * n_blocks > 1024 would
    silently break a batched final cut — hence batch_size=None there)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from intertext_ray.functions.hashing import splitmix64
    from intertext_ray.ops.sampling import uniform_sample_k

    n, k, salt = 5000, 700, 7
    ids = np.arange(n, dtype=np.uint64)
    tbl = pa.table({"doc_id": pa.array(ids.astype(np.int64)), "x": pa.array(ids.astype(np.int64))})
    h = splitmix64(ids ^ np.uint64(salt))
    expect = ids[np.lexsort((ids, h))][:k].astype(np.int64).tolist()

    for parts in (3, 17):
        got = (
            uniform_sample_k(rd.from_arrow(tbl).repartition(parts), k=k, salt=salt)
            .to_pandas()
            .sort_values("sample_rank")
        )
        assert got["doc_id"].tolist() == expect
        assert got["sample_rank"].tolist() == list(range(k))


def test_temperature_resample_rebalances_skew(ray_session):
    """T=2 on a skewed corpus: kept shares follow sqrt(n_g), total lands
    near target, and the assignment is layout-invariant and matches the
    scalar integer-threshold reference exactly."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from intertext_ray.functions.hashing import splitmix64
    from intertext_ray.ops.sampling import temperature_resample

    sizes = {"big": 6400, "mid": 1600, "small": 100}
    ids, groups = [], []
    i = 0
    for g, n in sizes.items():
        for _ in range(n):
            ids.append(i)
            groups.append(g)
            i += 1
    tbl = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "lang": pa.array(groups)}
    )
    target, salt, scale = 2000, 3, 1 << 20

    # scalar integer reference (the twin's arithmetic)
    ws = {g: int(math.floor(math.sqrt(n) * 1000)) for g, n in sizes.items()}
    W = sum(ws.values())
    thr = {
        g: min(scale, (scale * target * ws[g]) // (W * n))
        for g, n in sizes.items()
    }
    hid = splitmix64(np.array(ids, np.uint64) ^ np.uint64(salt)) % np.uint64(scale)
    expect = {
        i for i, g, h in zip(ids, groups, hid) if h < thr[g]
    }

    for parts in (2, 13):
        got = temperature_resample(
            rd.from_arrow(tbl).repartition(parts),
            group_col="lang",
            target_rows=target,
            salt=salt,
        ).to_pandas()
        assert set(got["doc_id"]) == expect

    # rebalancing: kept share of 'small' >> raw share; raw ratio big:small
    # = 64:1 but sqrt ratio = 8:1
    kept = {g: sum(1 for i2, g2 in zip(ids, groups) if g2 == g and i2 in expect) for g in sizes}
    assert abs(len(expect) - target) < 0.1 * target
    raw_ratio = sizes["big"] / sizes["small"]
    kept_ratio = kept["big"] / max(1, kept["small"])
    assert kept_ratio < raw_ratio / 4  # much flatter than raw
    assert kept["big"] > kept["mid"] > kept["small"]  # order preserved


def test_temperature_resample_cap_and_high_T(ray_session):
    """A tiny group whose rate caps at 1 keeps ALL its rows; temperature
    != 2 exercises the pow path."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from intertext_ray.ops.sampling import temperature_resample

    n_big, n_tiny = 5000, 5
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_big + n_tiny), pa.int64()),
            "lang": pa.array(["big"] * n_big + ["tiny"] * n_tiny),
        }
    )
    got = temperature_resample(
        rd.from_arrow(tbl), group_col="lang", target_rows=4000, temperature=8.0
    ).to_pandas()
    kept_tiny = (got["lang"] == "tiny").sum()
    assert kept_tiny == n_tiny  # capped at rate 1 -> all kept


def test_quality_topk_per_source(ray_session):
    """Best-k per source by stopword ratio, ties by n_tokens then id;
    combiner path (many small batches) agrees with single-batch truth."""
    import ray.data as rd

    from intertext_ray.ops.curate import quality_topk_per_source

    rows = [
        # source A: doc 1 has the highest stopword ratio; doc 2 ties doc 3
        # on ratio but has more tokens
        {"doc_id": 1, "source": "A", "text": "the and of to a"},
        {"doc_id": 2, "source": "A", "text": "the cat and dog of x y z"},
        {"doc_id": 3, "source": "A", "text": "the cat"},
        {"doc_id": 4, "source": "A", "text": "qqq www eee"},
        {"doc_id": 5, "source": "B", "text": "zz yy"},
        {"doc_id": 6, "source": "B", "text": ""},
    ]
    docs = rd.from_items(rows)
    got = (
        quality_topk_per_source(docs, k=2)
        .to_pandas()
        .sort_values(["source", "stopword_x1000"], ascending=[True, False])
        .reset_index(drop=True)
    )
    a = got[got.source == "A"]
    assert a.doc_id.tolist()[0] == 1  # all-stopwords doc wins
    assert len(a) == 2
    b = got[got.source == "B"]
    assert len(b) == 2  # both B docs kept (k=2), incl. the empty one
    assert set(b.doc_id) == {5, 6}
    # partition invariance: 1-row batches through the combiner
    got2 = (
        quality_topk_per_source(docs.repartition(6), k=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert sorted(got2.doc_id) == sorted(got.doc_id)


def test_leakage_safe_split_never_straddles(ray_session):
    """Every member of a dup cluster lands in the same split, and
    unclustered docs reproduce plain hash_split at the same salt."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from intertext_ray.ops.minhash_doc import minhash_doc_clusters
    from intertext_ray.ops.sampling import hash_split, leakage_safe_split

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(40)]
    base = " ".join(rng.choice(vocab, size=30))
    texts, ids = [], []
    for i in range(60):
        if i % 6 == 0:  # ten near-dup copies of base (1-token edits)
            t = base.split()
            t[i % len(t)] = f"edit{i}"
            texts.append(" ".join(t))
        else:
            texts.append(" ".join(rng.choice(vocab, size=25)))
        ids.append(i)
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(4)
    clusters = minhash_doc_clusters(
        docs, k=3, n_perm=16, band_rows=2, min_jaccard=0.5
    )
    assert clusters.num_rows >= 2  # the planted family clustered
    got = (
        leakage_safe_split(docs, clusters, permille_train=700, salt=1)
        .to_pandas()
        .set_index("doc_id")
    )
    assert len(got) == 60
    # no-straddle invariant
    lab = dict(
        zip(
            clusters["doc_id"].to_pylist(),
            clusters["dup_cluster_id"].to_pylist(),
        )
    )
    by_cluster = {}
    for d, c in lab.items():
        by_cluster.setdefault(c, set()).add(got.loc[d, "split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    # split_key is the cluster label for members, own id otherwise
    for d in ids:
        assert got.loc[d, "split_key"] == lab.get(d, d)
    # unclustered docs agree with plain hash_split at the same salt
    plain = (
        hash_split(docs, permille_train=700, salt=1)
        .to_pandas()
        .set_index("doc_id")
    )
    for d in ids:
        if d not in lab:
            assert got.loc[d, "split"] == plain.loc[d, "split"]
