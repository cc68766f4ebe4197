"""Training-data ops: exact dedup, simhash, n-gram jaccard, embeddings ANN,
text stats, multimodal stubs (the extensions beyond the reference surface)."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


@pytest.fixture(scope="module")
def toy_docs(ray_session):
    rows = {
        "doc_id": list(range(6)),
        "text": [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy dog",  # exact dup of 0
            "the quick brown fox leaps over the lazy dog",  # near dup
            "completely different content about spark and ray data pipelines",
            "the and of to a in is that it for the and of to",  # stopword heavy
            "",
        ],
    }
    return rd.from_arrow(pa.table(rows))


def test_exact_dedup(toy_docs):
    from intertext_ray.ops.exact_dedup import duplicate_groups, exact_dedup

    kept = exact_dedup(toy_docs).to_pandas()
    assert len(kept) == 5  # doc 1 removed
    assert 1 not in set(kept.doc_id)
    assert 0 in set(kept.doc_id)  # min-id keeper
    groups = duplicate_groups(toy_docs).to_pandas()
    assert len(groups) == 1
    assert groups.n_dups.iloc[0] == 2 and groups.keeper_id.iloc[0] == 0


def test_token_and_quality(toy_docs):
    from intertext_ray.ops.text_stats import quality_scores, token_counts

    tc = token_counts(toy_docs).to_pandas().set_index("doc_id")
    assert tc.loc[0, "n_tokens"] == 9
    assert tc.loc[5, "n_tokens"] == 0
    q = quality_scores(toy_docs).to_pandas().set_index("doc_id")
    assert q.loc[0, "n_unique_tokens"] == 8  # 'the' twice
    assert q.loc[0, "ttr_x1000"] == math.floor(1000 * 8 / 9)
    assert q.loc[5].tolist() == [0, 0, 0, 0, 0]


def test_lang_id(toy_docs):
    from intertext_ray.ops.text_stats import lang_id

    p = lang_id(toy_docs).to_pandas().set_index("doc_id")
    assert p.loc[4, "pred_lang"] == "en"
    assert p.loc[5, "pred_lang"] == "und"


def test_fingerprints(toy_docs):
    import hashlib

    from intertext_ray.ops.text_stats import content_fingerprints

    fp = content_fingerprints(toy_docs).to_pandas().set_index("doc_id")
    assert fp.loc[0, "content_md5"] == fp.loc[1, "content_md5"]
    assert fp.loc[0, "content_md5"] != fp.loc[2, "content_md5"]
    expect = hashlib.md5(
        "the quick brown fox jumps over the lazy dog".encode()
    ).hexdigest()
    assert fp.loc[0, "content_md5"] == expect


def test_simhash(toy_docs):
    from intertext_ray.ops.simhash import (
        hamming64,
        simhash_fingerprints,
        simhash_near_dups,
    )

    fp = simhash_fingerprints(toy_docs).to_pandas().set_index("doc_id")
    assert fp.loc[0, "simhash"] == fp.loc[1, "simhash"]
    h = hamming64(
        np.array([fp.loc[0, "simhash"]], np.uint64),
        np.array([fp.loc[2, "simhash"]], np.uint64),
    )[0]
    assert 0 < h < 20  # near dup: small but nonzero distance
    pairs = simhash_near_dups(toy_docs, max_hamming=int(h)).to_pandas()
    got = set(zip(pairs.doc_a, pairs.doc_b))
    assert (0, 1) in got
    assert (0, 2) in got or h > 3  # banding guarantees hamming<=3 collisions


def test_ngram_jaccard(toy_docs):
    from intertext_ray.ops.ngram_jaccard import doc_grams, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(toy_docs, min_jaccard=0.5).to_pandas()
    got = {(int(r.doc_a), int(r.doc_b)): int(r.jaccard_x1000) for r in pairs.itertuples()}
    assert got[(0, 1)] == 1000  # identical
    # manual jaccard for (0,2)
    g0 = doc_grams("the quick brown fox jumps over the lazy dog")
    g2 = doc_grams("the quick brown fox leaps over the lazy dog")
    j = len(g0 & g2) / len(g0 | g2)
    if j >= 0.5:
        assert got[(0, 2)] == math.floor(1000.0 * len(g0 & g2) / len(g0 | g2))
    assert (0, 3) not in got


def test_gram_rows_batch_matches_scalar_reference():
    """The buffer-vectorized gram kernel is value-identical to the scalar
    doc_grams set reference on every edge shape: normal docs, docs shorter
    than n (whole-payload gram), empty docs (no rows), multi-byte UTF-8,
    repeated grams (distinct once), and a sliced batch (non-zero Arrow
    offset)."""
    import numpy as np

    from intertext_ray.functions.hashing import splitmix64
    from intertext_ray.ops.ngram_jaccard import doc_grams, gram_rows_batch

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "abc",          # shorter than n=4: one gram, zero-padded
        "",             # empty: no rows
        "aaaaaaa",      # heavy repetition: distinct collapses to one gram
        "héllo wörld",  # multi-byte UTF-8: byte grams, not char grams
        "xy",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    for batch in (tbl, tbl.slice(1, 4)):  # also exercise a non-zero offset
        out = gram_rows_batch(batch, "text", 4)
        got: dict[int, set[int]] = {}
        sizes: dict[int, set[int]] = {}
        for r in out.to_pylist():
            got.setdefault(r["doc_id"], set()).add(r["gram"])
            sizes.setdefault(r["doc_id"], set()).add(r["dsize"])
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            gs = doc_grams(text, 4)
            want = {
                int(splitmix64(np.frombuffer(g.ljust(8, b"\0"), np.uint64))[0])
                for g in gs
            }
            assert got.get(did, set()) == want, did
            if gs:
                assert sizes[did] == {len(gs)}, did


def test_ann_and_cosine(ray_session):
    from intertext_ray.ops.embeddings import ann_topk, cosine_dup_pairs, lsh_cosine_dup_pairs

    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    base[7] = base[3] + 0.01 * rng.standard_normal(16).astype(np.float32)  # near dup
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(40), pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in base],
                                      pa.list_(pa.float32())),
            }
        )
    )
    top = ann_topk(emb, query_ids=[3], k=5).to_pandas()
    assert top.iloc[0]["vec_id"] == 3 and top.iloc[0]["rank"] == 0  # self first
    assert 7 in set(top.vec_id)
    pairs = cosine_dup_pairs(emb, threshold=0.95).to_pandas()
    assert (3, 7) in set(zip(pairs.a, pairs.b))
    lsh = lsh_cosine_dup_pairs(emb, threshold=0.95, n_planes=6, n_tables=8).to_pandas()
    assert (3, 7) in set(zip(lsh.a, lsh.b))


def test_rolling_fingerprints(toy_docs):
    from intertext_ray.ops.text_stats import rolling_fingerprints

    fp = rolling_fingerprints(toy_docs, k=4, keep_mod=2).to_pandas()
    # identical docs 0/1 produce identical fingerprint sets
    s0 = set(fp[fp.doc_id == 0].fp_hex)
    s1 = set(fp[fp.doc_id == 1].fp_hex)
    assert s0 == s1


def test_rolling_fingerprints_scalar_parity(ray_session):
    """The vectorized polynomial hash equals a straight-line scalar
    recomputation (independent of the Arrow-buffer batch path)."""
    import numpy as np
    import ray.data

    from intertext_ray.functions.hashing import splitmix64
    from intertext_ray.ops.simhash import hash_bytes
    from intertext_ray.ops.text_stats import (
        rolling_fingerprints,
        rolling_gram_weights,
    )

    k, keep_mod = 3, 1
    texts = {7: "alpha beta gamma delta epsilon", 8: "x y z"}
    ds = ray.data.from_items(
        [{"doc_id": d, "text": t} for d, t in texts.items()]
    )
    got = rolling_fingerprints(ds, k=k, keep_mod=keep_mod).to_pandas()
    P = rolling_gram_weights(k)
    want = []
    for d, t in texts.items():
        toks = t.split()
        for i in range(len(toks) - k + 1):
            acc = np.uint64(0)
            for j in range(k):
                acc += np.uint64(hash_bytes(toks[i + j])) * P[j]
            v = int(splitmix64(acc))
            if v % keep_mod == 0:
                want.append((d, f"{v:016x}"))
    assert sorted(zip(got.doc_id, got.fp_hex)) == sorted(want)


def test_multimodal_stub(ray_session):
    from intertext_ray.ops.multimodal import frame_sample_plan, image_features_stage

    tbl = pa.table(
        {
            "clip_id": pa.array(["a", "b"], pa.string()),
            "bytes": pa.array([b"payload-a", b"payload-b"], pa.binary()),
            "dur_ms": pa.array([2500, 400], pa.int32()),
        }
    )
    ds = rd.from_arrow(tbl)
    feats = image_features_stage(ds, dim=8).to_pandas()
    assert all(len(f) == 8 for f in feats.feature)
    # deterministic fake: same payload -> same feature
    f2 = image_features_stage(ds, dim=8).to_pandas()
    assert (np.vstack(feats.feature) == np.vstack(f2.feature)).all()
    plan = frame_sample_plan(ds, every_ms=1000).to_pandas()
    assert len(plan[plan.clip_id == "a"]) == 2
    assert len(plan[plan.clip_id == "b"]) == 1
    # real-decoder path is explicitly stubbed in this container
    from intertext_ray.ops.multimodal import ImageFeatureExtractor

    with pytest.raises(NotImplementedError):
        ImageFeatureExtractor(real_decoder=True)


def test_exports_roundtrip(ray_session, tmp_path):
    import json

    from intertext_ray.config import IntertextConfig
    from intertext_ray.pipelines.dedup import run_dedup
    from intertext_ray.stages.exports import (
        format_clusters,
        scatterplot_aggregates,
        sort_indices,
        word_counts_dict,
        write_api_outputs,
    )

    t = " ".join(f"w{i}" for i in range(30))
    docs = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([0, 1, 2], pa.uint64()),
             "text": [t, t, "x " * 40]}
        )
    )
    res = run_dedup(docs, IntertextConfig(), work_dir=str(tmp_path / "w"),
                    num_buckets=2)
    counts = word_counts_dict(docs)
    meta = {0: {"author": "A", "title": "T0", "year": 1800},
            1: {"author": "B", "title": "T1", "year": 1700}}
    fm = format_clusters(res.pair_clusters, docs, IntertextConfig(),
                         metadata=meta, counts=counts)
    assert len(fm) > 0
    # year ordering (N8): source must be the earlier publication (doc 1)
    assert (fm.source_file_id == 1).all()
    assert fm.probability.iloc[0] > 0
    sp = scatterplot_aggregates(fm)
    assert set(sp["statistic"]) == {"sum", "mean"}
    idx = sort_indices(fm)
    assert set(idx) == {"length", "probability", "similarity", "author", "title", "year"}
    out = str(tmp_path / "api")
    write_api_outputs(out, fm, docs, IntertextConfig(), metadata=meta)
    cfgj = json.load(open(f"{out}/config.json"))
    assert cfgj["files_with_matches"] == [0, 1]
    assert json.load(open(f"{out}/texts/2.json"))[0] == "x"


def test_bpe_token_counts(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from intertext_ray.ops.text_stats import bpe_token_counts

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["Hello world", "it's 2024, don't stop!", ""]),
            }
        )
    )
    out = bpe_token_counts(docs).to_pandas().sort_values("doc_id")
    # "Hello world" -> [Hello][ world]; the contraction splits as
    # [it]['s][ 2024][,][ don][']+[t]... counted by the same RE2 scan
    assert list(out.n_bpe_tokens) == [2, 8, 0]


def test_containment_search(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from intertext_ray.ops.text_stats import containment_search

    base = " ".join(f"tok{i}" for i in range(60))
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        base,  # contains the passage verbatim
                        "prefix words here " + base + " suffix words",
                        " ".join(f"other{i}" for i in range(60)),  # unrelated
                    ]
                ),
            }
        )
    )
    passage = " ".join(f"tok{i}" for i in range(20, 50))
    out = (
        containment_search(docs, passage, k=4, keep_mod=2)
        .to_pandas()
        .set_index("doc_id")
    )
    assert 1 in out.index and 2 in out.index
    assert 3 not in out.index
    # the verbatim container shares every passage fingerprint
    assert out.loc[1, "n_shared"] == out.loc[2, "n_shared"]


def test_decontaminate(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from intertext_ray.ops.decontam import decontaminate

    bench = " ".join(f"ev{i}" for i in range(20))
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    [
                        # verbatim 10-word excerpt of the benchmark inside
                        "clean start " + " ".join(f"ev{i}" for i in range(5, 15)) + " tail",
                        " ".join(f"train{i}" for i in range(40)),  # clean
                        "short doc",  # < k words -> 0 / false
                        bench,  # the whole benchmark verbatim
                    ]
                ),
            }
        )
    )
    ev = rd.from_arrow(
        pa.table({"doc_id": pa.array([100], pa.int64()), "text": pa.array([bench])})
    )
    out = decontaminate(docs, ev, k=4).to_pandas().set_index("doc_id")
    assert bool(out.loc[1, "contaminated"]) and out.loc[1, "n_shared_grams"] == 7
    assert not bool(out.loc[2, "contaminated"]) and out.loc[2, "n_shared_grams"] == 0
    assert not bool(out.loc[3, "contaminated"])
    # whole-benchmark copy shares every one of the 17 distinct 4-grams
    assert out.loc[4, "n_shared_grams"] == 17


def test_doc_top_terms(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from intertext_ray.ops.text_stats import doc_top_terms

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "apple apple banana cherry",   # tf: apple 2
                        "banana banana banana apple",  # tf: banana 3
                        "",                            # empty -> no rows
                    ]
                ),
            }
        )
    )
    out = doc_top_terms(docs, top=2).to_pandas()
    d1 = out[out.doc_id == 1].sort_values("term_rank")
    # apple wins doc 1 on tf; cherry (df=1) beats banana (df=2) on the tie
    assert list(d1.term) == ["apple", "cherry"]
    assert list(d1.tf) == [2, 1] and list(d1.df) == [2, 1]
    d2 = out[out.doc_id == 2].sort_values("term_rank")
    assert list(d2.term) == ["banana", "apple"]
    assert not (out.doc_id == 3).any()


def test_doc_top_terms_join_path_equals_broadcast(ray_session):
    """Force the term-bucketed join fallback (broadcast_vocab_limit=0) and
    pin row-identical output against the broadcast path on a corpus with
    tf ties, shared and unique terms, and empty docs."""
    import pyarrow as pa
    import ray.data as rd

    from intertext_ray.ops.text_stats import doc_top_terms

    rng = __import__("numpy").random.default_rng(5)
    vocab = [f"w{i:03d}" for i in range(60)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(0, 30))))
        for _ in range(40)
    ]
    texts[7] = ""  # empty doc
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(6)
    key = ["doc_id", "term_rank"]
    broad = doc_top_terms(docs, top=3).to_pandas().sort_values(key)
    joined = (
        doc_top_terms(docs, top=3, broadcast_vocab_limit=0)
        .to_pandas()
        .sort_values(key)
    )
    assert broad.reset_index(drop=True).equals(joined.reset_index(drop=True))


def test_incremental_dedup(ray_session, tmp_path):
    """Incremental wave vs full recompute: pairs with >=1 new doc agree
    exactly with the all-pairs ngram result; old-vs-old never emitted;
    appending a passed wave to the index makes the next wave see it."""
    from intertext_ray.ops.incremental import build_gram_index, incremental_dup_pairs
    from intertext_ray.ops.ngram_jaccard import ngram_jaccard_pairs

    texts = [
        "the quick brown fox jumps over the lazy dog",   # 0 old
        "the quick brown fox jumps over the lazy dog",   # 1 old (old-old dup)
        "pack my box with five dozen liquor jugs today", # 2 old
        "completely different content about ray data",   # 3 old
        "the quick brown fox jumps over the lazy dog",   # 4 new: dup of 0/1
        "pack my box with five dozen liquor jugs today", # 5 new: dup of 2
        "some fresh never seen before text entirely",    # 6 new
        "some fresh never seen before text entirely",    # 7 new (new-new dup)
    ]
    mk = lambda ids: rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": [texts[i] for i in ids]})
    )
    idx = str(tmp_path / "gram_index")
    build_gram_index(mk([0, 1, 2, 3]), idx, num_buckets=8)
    got = incremental_dup_pairs(
        mk([4, 5, 6, 7]), idx, min_jaccard=0.5, num_buckets=8
    ).to_pandas()
    gpairs = {(int(r.doc_a), int(r.doc_b)): (int(r.jaccard_x1000), r.kind)
              for r in got.itertuples()}
    full = ngram_jaccard_pairs(mk(list(range(8))), min_jaccard=0.5).to_pandas()
    want = {
        (int(r.doc_a), int(r.doc_b)): int(r.jaccard_x1000)
        for r in full.itertuples()
        if int(r.doc_a) >= 4 or int(r.doc_b) >= 4
    }
    assert {k: v[0] for k, v in gpairs.items()} == want
    assert (0, 1) not in gpairs  # old-old settled in a prior wave
    assert gpairs[(6, 7)][1] == "new_new"
    assert gpairs[(0, 4)][1] == "new_old"
    # append the passed wave -> next wave sees docs 4-7 as old
    build_gram_index(mk([4, 5, 6, 7]), idx + "/wave2_append", num_buckets=8)
    import os, shutil
    for b in os.listdir(idx + "/wave2_append"):
        if b.startswith("bucket="):
            os.makedirs(f"{idx}/{b}", exist_ok=True)
            for f in os.listdir(f"{idx}/wave2_append/{b}"):
                shutil.copy(f"{idx}/wave2_append/{b}/{f}", f"{idx}/{b}/w2_{f}")
    wave3 = rd.from_arrow(
        pa.table({"doc_id": pa.array([8], pa.int64()),
                  "text": ["the quick brown fox jumps over the lazy dog"]})
    )
    got2 = incremental_dup_pairs(
        wave3, idx, min_jaccard=0.5, num_buckets=8
    ).to_pandas()
    assert set(zip(got2.doc_a, got2.doc_b)) == {(0, 8), (1, 8), (4, 8)}


def test_simhash_clusters_min_label(ray_session):
    """simhash_clusters labels every paired doc with its component's min
    doc_id, consistent with the pairs the exact-radius path emits."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from intertext_ray.ops.simhash import simhash_clusters, simhash_near_dups

    base = " ".join(f"w{i}" for i in range(30))
    texts = [base, base + " x", base + " y z", "totally different words here"]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(4, dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    ds = rd.from_arrow(tbl)
    pairs = simhash_near_dups(ds, max_hamming=8).to_pandas()
    clusters = simhash_clusters(ds, max_hamming=8).to_pandas()
    # membership == nodes of the pair graph
    assert set(clusters.doc_id) == set(pairs.doc_a) | set(pairs.doc_b)
    # union-find ground truth
    parent = {d: d for d in set(pairs.doc_a) | set(pairs.doc_b)}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in zip(pairs.doc_a, pairs.doc_b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for d in parent:
        comp.setdefault(find(d), []).append(d)
    want = {d: min(m) for r, m in comp.items() for d in m}
    got = dict(zip(clusters.doc_id, clusters.dup_cluster_id))
    assert got == want


def test_blocklist_report(ray_session):
    """C4-style lexicon gate: whole-token lowercased match, counts and
    kept flag; punctuation-attached tokens do NOT match; empty docs
    yield (0, 0, True)."""
    import ray.data as rd

    from intertext_ray.ops.curate import blocklist_report

    docs = rd.from_items(
        [
            {"doc_id": 0, "text": "the bad word here"},
            {"doc_id": 1, "text": "all clean tokens"},
            {"doc_id": 2, "text": "BAD shouting bad"},
            {"doc_id": 3, "text": "bad, punctuation attached"},
            {"doc_id": 4, "text": ""},
        ]
    )
    out = (
        blocklist_report(docs, ["bad", "evil"])
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "n_blocked"] == 1 and not out.loc[0, "kept"]
    assert out.loc[1, "n_blocked"] == 0 and out.loc[1, "kept"]
    # case-insensitive, both occurrences counted
    assert out.loc[2, "n_blocked"] == 2 and not out.loc[2, "kept"]
    # whole-token contract: "bad," is not "bad"
    assert out.loc[3, "n_blocked"] == 0 and out.loc[3, "kept"]
    assert (
        out.loc[4, "n_tokens"] == 0
        and out.loc[4, "n_blocked"] == 0
        and out.loc[4, "kept"]
    )


def test_eval_leak_report_planted(ray_session):
    """Planted leakage: one eval doc fully copied into train (leak 1000),
    one partially quoted, one untouched (leak 0), one sub-k (zero
    grams, not fully_leaked)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from intertext_ray.ops.decontam import eval_leak_report

    rng = np.random.default_rng(9)
    vocab = [f"t{i}" for i in range(60)]
    ev_full = " ".join(rng.choice(vocab, size=20))
    ev_part = " ".join(rng.choice(vocab, size=20))
    ev_clean = " ".join(f"only{i}" for i in range(20))
    evals = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([100, 101, 102, 103], pa.int64()),
                "text": pa.array(
                    [ev_full, ev_part, ev_clean, "too short"], pa.string()
                ),
            }
        )
    )
    train_texts = [
        "prefix words " + ev_full + " suffix words",       # full copy
        " ".join(ev_part.split()[:8]),                      # 8-token quote
    ] + [" ".join(rng.choice(vocab, size=15)) for _ in range(5)]
    train = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(train_texts)), pa.int64()),
                "text": pa.array(train_texts, pa.string()),
            }
        )
    ).repartition(3)
    got = (
        eval_leak_report(train, evals, k=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(got.index) == [100, 101, 102, 103]
    assert got.loc[100, "leak_x1000"] == 1000
    assert bool(got.loc[100, "fully_leaked"])
    # the 8-token quote leaks exactly 5 of the doc's 17 distinct grams
    # (assuming no accidental overlap; check bounds instead of exact)
    assert 0 < got.loc[101, "n_leaked"] < got.loc[101, "n_grams"]
    assert got.loc[102, "n_leaked"] == 0 and not bool(
        got.loc[102, "fully_leaked"]
    )
    assert got.loc[103, "n_grams"] == 0 and not bool(
        got.loc[103, "fully_leaked"]
    )
