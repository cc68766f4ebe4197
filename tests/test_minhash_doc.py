"""Doc-level MinHash+LSH dedup (`ops/minhash_doc.py`): brute-force-oracle
parity (an independent numpy reimplementation of the whole chain),
partition invariance, and S-curve sanity.  The DuckDB twin
(`__ray_entry__._minhash_doc_sql`) is the second, fully-SQL oracle."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def _brute_force(texts, k, n_perm, band_rows, min_jaccard):
    """Independent single-process recomputation: gram sets via the pinned
    hash primitives composed from scratch (chain hash per token, poly
    k-gram, salted mins, fold), then LSH candidates + exact Jaccard."""
    from intertext_ray.functions.hashing import splitmix64
    from intertext_ray.ops.minhash_doc import doc_minhash_seeds
    from intertext_ray.ops.simhash import _chain_hash_tokens
    from intertext_ray.ops.text_stats import rolling_gram_weights

    P = rolling_gram_weights(k)
    seeds = doc_minhash_seeds(n_perm)
    n_bands = n_perm // band_rows
    gram_sets: dict[int, set[int]] = {}
    sigs: dict[int, np.ndarray] = {}
    for doc_id, text in enumerate(texts):
        toks = text.split()
        if len(toks) < k:
            continue
        th = _chain_hash_tokens(pa.array(toks, pa.string()))
        fs = set()
        for i in range(len(toks) - k + 1):
            acc = np.uint64(0)
            for j in range(k):
                acc = np.uint64(acc + th[i + j] * P[j])
            fs.add(int(splitmix64(acc)))
        gram_sets[doc_id] = fs
        farr = np.array(sorted(fs), dtype=np.uint64)
        sigs[doc_id] = np.array(
            [splitmix64(farr ^ s).min() for s in seeds], dtype=np.uint64
        )
    keys: dict[int, list[int]] = {}
    for doc_id, sig in sigs.items():
        ks = []
        for b in range(n_bands):
            acc = np.uint64(b)
            for p in range(b * band_rows, (b + 1) * band_rows):
                acc = splitmix64(acc ^ sig[p])
            ks.append(int(acc))
        keys[doc_id] = ks
    docs = sorted(sigs)
    expected = {}
    for i, a in enumerate(docs):
        for b in docs[i + 1 :]:
            if not set(keys[a]) & set(keys[b]):
                continue
            inter = len(gram_sets[a] & gram_sets[b])
            union = len(gram_sets[a] | gram_sets[b])
            if inter and 100 * inter >= int(round(min_jaccard * 100)) * union:
                expected[(a, b)] = int(np.floor(1000.0 * inter / union))
    return expected


@pytest.fixture(scope="module")
def dup_docs(ray_session):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = []
    base = [str(vocab[i]) for i in rng.integers(0, 40, size=30)]
    for i in range(30):
        if i % 3 == 0:
            # near-dup of base: perturb a few words
            t = list(base)
            for j in rng.integers(0, 30, size=i % 5):
                t[j] = vocab[int(rng.integers(0, 40))]
            texts.append(" ".join(t))
        else:
            texts.append(
                " ".join(vocab[int(x)] for x in rng.integers(0, 40, size=25))
            )
    texts.append("")        # empty doc: no grams, no signature
    texts.append("a b")     # < k tokens
    return texts


def _run(texts, num_buckets, **kw):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    from intertext_ray.ops.minhash_doc import minhash_doc_dedup

    res = (
        minhash_doc_dedup(rd.from_arrow(t), num_buckets=num_buckets, **kw)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    return {
        (int(r.doc_a), int(r.doc_b)): int(r.jaccard_x1000)
        for r in res.itertuples()
    }


def test_matches_brute_force(dup_docs, ray_session):
    got = _run(dup_docs, num_buckets=8)
    expected = _brute_force(
        dup_docs, k=3, n_perm=16, band_rows=2, min_jaccard=0.5
    )
    assert got == expected
    assert len(expected) > 0  # planted near-dups must surface


def test_partition_invariance(dup_docs, ray_session):
    assert _run(dup_docs, num_buckets=1) == _run(dup_docs, num_buckets=16)


def test_threshold_monotone(dup_docs, ray_session):
    lo = _run(dup_docs, num_buckets=8, min_jaccard=0.3)
    hi = _run(dup_docs, num_buckets=8, min_jaccard=0.8)
    assert set(hi) <= set(lo)
    for pair, jx in hi.items():
        assert jx == lo[pair] >= 800


def test_exact_dups_score_1000(ray_session):
    texts = ["x y z w v u t s", "x y z w v u t s", "q r s t u v w x"]
    got = _run(texts, num_buckets=4)
    assert got[(0, 1)] == 1000


def test_clusters_match_pairs(dup_docs, ray_session):
    """Cluster labels == min-label connected components over the pair set."""
    import pyarrow as pa
    import ray.data as rd

    from intertext_ray.ops.minhash_doc import minhash_doc_clusters

    t = pa.table(
        {
            "doc_id": pa.array(range(len(dup_docs)), pa.int64()),
            "text": pa.array(dup_docs, pa.string()),
        }
    )
    got = minhash_doc_clusters(rd.from_arrow(t), num_buckets=8).to_pandas()
    pairs = _run(dup_docs, num_buckets=8)
    # independent union-find over the same pair set
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}
    assert {
        (int(r.doc_id), int(r.dup_cluster_id)) for r in got.itertuples()
    } == set(expected.items())
    assert len(expected) > 0


def test_source_dup_report_matches_pairwise_truth(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from intertext_ray.ops.minhash_doc import (
        minhash_doc_dedup,
        source_dup_report,
    )

    texts, sources = [], []
    for i in range(120):
        if i % 4 == 0:
            texts.append("the quick brown fox jumps over the lazy dog wow")
        elif i % 4 == 1:
            texts.append("the quick brown fox jumps over the lazy dog yes")
        else:
            texts.append(f"totally unique document number {i} with words {i*7}")
        sources.append(f"src{i % 3}")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(120), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(sources, pa.string()),
        }
    )
    kw = dict(k=3, n_perm=16, band_rows=2, min_jaccard=0.5)
    pairs = minhash_doc_dedup(
        rd.from_arrow(tbl).select_columns(["doc_id", "text"]), **kw
    ).take_all()
    dup = set()
    for p in pairs:
        dup.add(p["doc_a"])
        dup.add(p["doc_b"])
    assert dup  # planted near-dups must be found
    got = source_dup_report(
        rd.from_arrow(tbl).repartition(9), **kw
    ).to_pylist()
    want = {}
    for i in range(120):
        n, d = want.get(sources[i], (0, 0))
        want[sources[i]] = (n + 1, d + (1 if i in dup else 0))
    assert len(got) == 3
    for row in got:
        n, d = want[row["source"]]
        assert (row["n_docs"], row["n_dup_docs"]) == (n, d)
        assert row["dup_rate_x1000"] == int(np.floor(1000.0 * d / n))


def test_fuzzy_decontam_planted(ray_session):
    """Planted paraphrased eval leaks are flagged with the exact integer
    jaccard; unrelated docs are not; scores match a brute-force gram-set
    reference computed straight from the texts."""
    import numpy as np
    import ray.data as rd

    from intertext_ray.ops.decontam import fuzzy_decontam
    from intertext_ray.ops.substring import gram_positions_batch
    import pyarrow as pa

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(50)]

    def sent(n):
        return " ".join(rng.choice(vocab, n))

    ev_texts = [sent(30) for _ in range(4)]
    # train 0/1: light paraphrases of eval 0/2 (drop + swap a few words)
    t0 = ev_texts[0].split()
    t0[5], t0[17] = "zzz", "qqq"
    t1 = ev_texts[2].split()[2:]
    train_texts = [" ".join(t0), " ".join(t1)] + [sent(30) for _ in range(6)]

    ev = rd.from_items(
        [{"doc_id": 100 + i, "text": t} for i, t in enumerate(ev_texts)]
    )
    tr = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(train_texts)]
    )
    out = fuzzy_decontam(tr, ev, k=3, min_jaccard=0.4).to_pandas()

    def grams(text):
        t = pa.table({"doc_id": [0], "text": [text]})
        return set(
            gram_positions_batch(t, "text", 3)["f"].to_numpy(
                zero_copy_only=False
            )
        )

    # brute-force truth over all (train, eval) pairs
    want = {}
    for i, tt in enumerate(train_texts):
        for j, et in enumerate(ev_texts):
            a, b = grams(tt), grams(et)
            inter = len(a & b)
            union = len(a | b)
            if union and 100 * inter >= 40 * union:
                want[(i, 100 + j)] = 1000 * inter // union

    got = {
        (int(r.doc_id), int(r.eval_id)): int(r.jaccard_x1000)
        for r in out.itertuples()
    }
    # LSH may only MISS brute-force pairs (never invent); planted leaks
    # are near-identical (j >> 0.4) so they MUST be found
    assert set(got) <= set(want)
    assert (0, 100) in got and (1, 102) in got
    for p, v in got.items():
        assert want[p] == v


def test_minhash_doc_survivors(ray_session):
    """Survivors = corpus minus non-keeper cluster members, keeper = min
    id per cluster; independent union-find reference."""
    import ray.data as rd

    from intertext_ray.ops.minhash_doc import (
        minhash_doc_clusters,
        minhash_doc_survivors,
    )

    docs = rd.from_items(
        [
            {"doc_id": 0, "text": "a b c d e f g h"},
            {"doc_id": 1, "text": "a b c d e f g h"},
            {"doc_id": 2, "text": "a b c d e f g x"},
            {"doc_id": 3, "text": "p q r s t u v w"},
            {"doc_id": 4, "text": "z z z y y y x x"},
        ]
    )
    cl = minhash_doc_clusters(docs).to_pandas()
    drop = set(cl.doc_id[cl.doc_id != cl.dup_cluster_id])
    got = set(minhash_doc_survivors(docs).to_pandas().doc_id)
    assert got == {0, 1, 2, 3, 4} - drop
    assert 0 in got and 3 in got and 4 in got  # keepers / singletons
    assert 1 not in got  # exact dup of 0 must drop


def test_fuzzy_decontam_survivors(ray_session):
    """Survivors = training docs minus every doc flagged vs any eval
    doc; composes with the planted-leak fixture."""
    import numpy as np
    import ray.data as rd

    from intertext_ray.ops.decontam import (
        fuzzy_decontam,
        fuzzy_decontam_survivors,
    )

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(50)]
    ev_texts = [" ".join(rng.choice(vocab, 30)) for _ in range(3)]
    leak = ev_texts[1].split()
    leak[4] = "zz"
    train_texts = [" ".join(leak)] + [
        " ".join(rng.choice(vocab, 30)) for _ in range(5)
    ]
    ev = rd.from_items(
        [{"doc_id": 100 + i, "text": t} for i, t in enumerate(ev_texts)]
    )
    tr = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(train_texts)]
    )
    flagged = set(
        fuzzy_decontam(tr, ev, k=3, min_jaccard=0.4).to_pandas().doc_id
    )
    surv = set(
        fuzzy_decontam_survivors(tr, ev, k=3, min_jaccard=0.4)
        .to_pandas()
        .doc_id
    )
    assert 0 in flagged
    assert surv == set(range(6)) - flagged


def test_minhash_doc_canonicals_policy(ray_session):
    """Canonical survivor = LONGEST member (char count), tiebreak min id;
    cross-checked against clusters + a pandas argmax reference."""
    import ray.data as rd

    from intertext_ray.ops.minhash_doc import (
        minhash_doc_canonicals,
        minhash_doc_clusters,
    )

    docs = rd.from_items(
        [
            # cluster A: 11 is the longest member -> must win over min-id 10
            {"doc_id": 10, "text": "a b c d e f g h"},
            {"doc_id": 11, "text": "a b c d e f g h iii"},
            # cluster B: exact dups, equal length -> tiebreak min id (20)
            {"doc_id": 20, "text": "p q r s t u v w"},
            {"doc_id": 21, "text": "p q r s t u v w"},
            # singleton: must NOT appear (no cluster)
            {"doc_id": 30, "text": "z z z y y y x x"},
        ]
    )
    got = (
        minhash_doc_canonicals(docs)
        .to_pandas()
        .set_index("dup_cluster_id")
        .sort_index()
    )
    cl = minhash_doc_clusters(docs).to_pandas()
    assert set(cl.doc_id) == {10, 11, 20, 21}
    assert list(got.index) == sorted(set(cl.dup_cluster_id))
    a, b = got.loc[10], got.loc[20]
    assert int(a.survivor_doc_id) == 11  # longest, NOT min id
    assert int(a.n_members) == 2
    assert int(a.survivor_chars) == len("a b c d e f g h iii")
    assert int(b.survivor_doc_id) == 20  # equal length -> min id
    assert int(b.survivor_chars) == len("p q r s t u v w")


def test_minhash_doc_canonical_survivors(ray_session):
    """Policy purge keeps the LONGEST cluster member (not min id) plus
    all singletons."""
    import ray.data as rd

    from intertext_ray.ops.minhash_doc import minhash_doc_canonical_survivors

    docs = rd.from_items(
        [
            {"doc_id": 10, "text": "a b c d e f g h"},
            {"doc_id": 11, "text": "a b c d e f g h iii"},  # longest -> kept
            {"doc_id": 20, "text": "p q r s t u v w"},       # tie -> min id
            {"doc_id": 21, "text": "p q r s t u v w"},
            {"doc_id": 30, "text": "z z z y y y x x"},       # singleton
        ]
    )
    got = set(
        minhash_doc_canonical_survivors(docs).to_pandas().doc_id.astype(int)
    )
    assert got == {11, 20, 30}


def test_jaccard_histogram_matches_pairs(ray_session):
    """Histogram = exact decile bincount of the verified pair table."""
    import numpy as np
    import ray.data as rd

    from intertext_ray.ops.minhash_doc import (
        jaccard_histogram,
        minhash_doc_dedup,
    )

    docs = rd.from_items(
        [
            {"doc_id": 0, "text": "a b c d e f g h"},
            {"doc_id": 1, "text": "a b c d e f g h"},
            {"doc_id": 2, "text": "a b c d e f g x"},
            {"doc_id": 3, "text": "a b c d e y y x"},
            {"doc_id": 4, "text": "p q r s t u v w"},
        ]
    )
    pairs = minhash_doc_dedup(docs).to_pandas()
    want = (
        (pairs["jaccard_x1000"].astype(int) // 100)
        .value_counts()
        .sort_index()
    )
    got = (
        jaccard_histogram(docs)
        .to_pandas()
        .sort_values("sim_bucket")
        .set_index("sim_bucket")["n_pairs"]
    )
    assert got.index.tolist() == want.index.tolist()
    assert got.tolist() == want.tolist()
    assert int(got.sum()) == len(pairs)


def test_doc_faces_anti_join_path(ray_session, monkeypatch):
    """VERDICT r4 #2: above the broadcast knob the survivor/canonical
    faces must use the bucketed anti-join and NEVER build a driver-side
    broadcast set.  Forced-high dup rate corpus (every doc clustered);
    knob forced to 0; ``_broadcast`` patched to explode if touched."""
    import ray.data as rd

    import intertext_ray.ops.minhash_doc as M

    # 3 clusters x 4 near-identical members + 2 singletons = 12/14 dup
    # rate (≫ any web crawl) — the regime the anti-join exists for
    rows = []
    for c in range(3):
        base = " ".join(f"w{c}_{i}" for i in range(12))
        for m in range(4):
            rows.append(
                {
                    "doc_id": 10 * c + m,
                    # vary length so the canonical argmax is non-trivial
                    "text": base + " pad" * m,
                }
            )
    rows.append({"doc_id": 100, "text": "lone a b c d e f g"})
    rows.append({"doc_id": 101, "text": "solo p q r s t u v"})
    docs = rd.from_items(rows)

    kw = dict(k=3, n_perm=16, band_rows=2, min_jaccard=0.5)
    want_surv = set(M.minhash_doc_survivors(docs, **kw).to_pandas().doc_id)
    want_canon = (
        M.minhash_doc_canonicals(docs, **kw)
        .to_pandas()
        .sort_values("dup_cluster_id", ignore_index=True)
    )
    want_cs = set(
        M.minhash_doc_canonical_survivors(docs, **kw).to_pandas().doc_id
    )
    # sanity: the dup rate really is high and the policy argmax differs
    # from min-id (longest member wins)
    assert len(want_canon) == 3
    assert set(want_canon.survivor_doc_id) == {3, 13, 23}
    assert want_surv == {0, 10, 20, 100, 101}
    assert want_cs == {3, 13, 23, 100, 101}

    monkeypatch.setattr(
        M,
        "_broadcast",
        lambda obj: (_ for _ in ()).throw(
            AssertionError("driver-side set broadcast above the knob")
        ),
    )
    got_surv = set(
        M.minhash_doc_survivors(docs, broadcast_threshold=0, **kw)
        .to_pandas()
        .doc_id
    )
    got_canon = (
        M.minhash_doc_canonicals(docs, broadcast_threshold=0, **kw)
        .to_pandas()
        .sort_values("dup_cluster_id", ignore_index=True)
    )
    got_cs = set(
        M.minhash_doc_canonical_survivors(docs, broadcast_threshold=0, **kw)
        .to_pandas()
        .doc_id
    )
    assert got_surv == want_surv
    assert got_canon.equals(want_canon)
    assert got_cs == want_cs


def test_doc_clusters_distributed_parity(ray_session):
    """components='distributed' (min-label propagation shuffle) must
    produce the exact table the driver union-find does — the doc-level
    escape hatch past components_driver_max_pairs."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from intertext_ray.ops.minhash_doc import minhash_doc_clusters

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(40)]
    texts = []
    base = [str(vocab[i]) for i in rng.integers(0, 40, size=30)]
    for i in range(40):
        if i % 3 == 0:
            t = list(base)
            for j in rng.integers(0, 30, size=i % 4):
                t[j] = vocab[int(rng.integers(0, 40))]
            texts.append(" ".join(t))
        else:
            texts.append(
                " ".join(vocab[int(x)] for x in rng.integers(0, 40, size=25))
            )
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    drv = minhash_doc_clusters(docs, components="driver").to_pandas()
    dist = minhash_doc_clusters(docs, components="distributed").to_pandas()
    assert len(drv) > 0  # planted near-dups must cluster
    assert drv.equals(dist)
    # auto with a zero threshold routes to the distributed backend
    auto = minhash_doc_clusters(
        docs, components="auto", components_driver_max_pairs=0
    ).to_pandas()
    assert auto.equals(drv)
