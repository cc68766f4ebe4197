"""Tiered dedup (`ops/tiers.py`): the full cascade recomputed by an
independent single-process brute-force reference (exact dict-grouping +
the pinned MinHash chain + all-pairs SimHash Hamming + pure-Python
union-find), plus planted-structure assertions, survivor cleanliness and
partition invariance.  The DuckDB twins are the second oracle."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def _brute_minhash_pairs(ids, texts, k=3, n_perm=16, band_rows=2, pct=50):
    """Pinned-chain recomputation (same math as
    tests/test_minhash_doc._brute_force, keyed by explicit doc ids)."""
    from intertext_ray.functions.hashing import splitmix64
    from intertext_ray.ops.minhash_doc import doc_minhash_seeds
    from intertext_ray.ops.simhash import _chain_hash_tokens
    from intertext_ray.ops.text_stats import rolling_gram_weights

    P = rolling_gram_weights(k)
    seeds = doc_minhash_seeds(n_perm)
    n_bands = n_perm // band_rows
    gram_sets, keys = {}, {}
    for doc_id, text in zip(ids, texts):
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
        sig = np.array(
            [splitmix64(farr ^ s).min() for s in seeds], dtype=np.uint64
        )
        ks = []
        for b in range(n_bands):
            acc = np.uint64(b)
            for p in range(b * band_rows, (b + 1) * band_rows):
                acc = splitmix64(acc ^ sig[p])
            ks.append(int(acc))
        keys[doc_id] = ks
    docs = sorted(gram_sets)
    pairs = set()
    for i, a in enumerate(docs):
        for b in docs[i + 1 :]:
            if not set(keys[a]) & set(keys[b]):
                continue
            inter = len(gram_sets[a] & gram_sets[b])
            union = len(gram_sets[a] | gram_sets[b])
            if inter and 100 * inter >= pct * union:
                pairs.add((a, b))
    return pairs


def _brute_simhash_pairs(ids, texts, max_hamming=8):
    from intertext_ray.ops.simhash import simhash_batch

    fps = simhash_batch(pa.array(texts, pa.string()))
    pairs = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if bin(int(fps[i]) ^ int(fps[j])).count("1") <= max_hamming:
                pairs.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return pairs


def _uf_droppees(pairs):
    """Pure-Python union-find; droppees = members above the cluster min."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x for x in parent if find(x) != x}


def _py_norm(t):
    import re

    return re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()


def _brute_cascade(ids, texts, max_hamming=8):
    """Independent reference for tiered_purge_report (4-stage:
    exact -> norm-fold -> near -> weak)."""
    by_text = {}
    for d, t in zip(ids, texts):
        by_text.setdefault(t, []).append(d)
    dropped_exact = {
        d for mem in by_text.values() if len(mem) > 1 for d in sorted(mem)[1:]
    }
    s1 = [(d, t) for d, t in zip(ids, texts) if d not in dropped_exact]
    by_norm = {}
    for d, t in s1:
        by_norm.setdefault(_py_norm(t), []).append(d)
    dropped_norm = {
        d for mem in by_norm.values() if len(mem) > 1 for d in sorted(mem)[1:]
    }
    s1b = [(d, t) for d, t in s1 if d not in dropped_norm]
    dropped_near = _uf_droppees(
        _brute_minhash_pairs([d for d, _ in s1b], [t for _, t in s1b])
    )
    s2 = [(d, t) for d, t in s1b if d not in dropped_near]
    dropped_weak = _uf_droppees(
        _brute_simhash_pairs(
            [d for d, _ in s2], [t for _, t in s2], max_hamming
        )
    )
    out = {}
    for d in ids:
        if d in dropped_exact:
            out[d] = "exact"
        elif d in dropped_norm:
            out[d] = "norm"
        elif d in dropped_near:
            out[d] = "near"
        elif d in dropped_weak:
            out[d] = "weak"
        else:
            out[d] = "none"
    return out


@pytest.fixture(scope="module")
def tier_corpus():
    """Planted structure: exact triple, near pair, weak-only candidates,
    singletons, plus degenerate rows (empty, sub-k)."""
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(60)]
    texts = []
    base = " ".join(vocab[int(x)] for x in rng.integers(0, 60, size=30))
    texts += [base, base, base]                      # ids 0,1,2: exact group
    near = base.split()
    near[4] = "zz"                                   # 1/30 token edit
    texts.append(" ".join(near))                     # id 3: near dup of base
    mid = base.split()
    for j in range(0, 30, 4):                        # ~25% token edits
        mid[j] = vocab[(j * 7) % 60]
    texts.append(" ".join(mid))                      # id 4: weak-ish dup
    for i in range(20):                              # ids 5..24: background
        texts.append(
            " ".join(vocab[int(x)] for x in rng.integers(0, 60, size=25))
        )
    texts.append("")                                 # id 25: empty
    texts.append("a b")                              # id 26: < k tokens
    # id 27: SHOUTED copy of base — raw-distinct (not exact) but folds to
    # base's normalized form; raw tokens hash differently so the minhash
    # and simhash families never link it: the norm tier's exclusive catch
    texts.append(base.upper() + "!!")
    ids = list(range(len(texts)))
    return ids, texts


def _docs_ds(ids, texts, blocks=4):
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    return rd.from_arrow(t).repartition(blocks)


def test_tier_report_matches_brute(tier_corpus, ray_session):
    from intertext_ray.ops.tiers import dedup_tier_report

    ids, texts = tier_corpus
    got = (
        dedup_tier_report(_docs_ds(ids, texts), num_buckets=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(got.index) == ids  # one row per doc

    by_text = {}
    for d, t in zip(ids, texts):
        by_text.setdefault(t, []).append(d)
    exact_m = {d for mem in by_text.values() if len(mem) > 1 for d in mem}
    by_norm = {}
    for d, t in zip(ids, texts):
        by_norm.setdefault(_py_norm(t), []).append(d)
    norm_m = {d for mem in by_norm.values() if len(mem) > 1 for d in mem}
    near_m = {
        d for p in _brute_minhash_pairs(ids, texts) for d in p
    }
    weak_m = {d for p in _brute_simhash_pairs(ids, texts) for d in p}
    for d in ids:
        if d in exact_m:
            want = "exact"
        elif d in norm_m:
            want = "norm"
        elif d in near_m:
            want = "near"
        elif d in weak_m:
            want = "weak"
        else:
            want = "unique"
        assert got.loc[d, "tier"] == want, d
    from intertext_ray.ops.tiers import TIER_RANKS as ranks

    assert all(
        int(got.loc[d, "tier_rank"]) == ranks[got.loc[d, "tier"]] for d in ids
    )
    # planted expectations hold on this corpus
    assert {got.loc[d, "tier"] for d in (0, 1, 2)} == {"exact"}
    assert got.loc[3, "tier"] == "near"
    assert got.loc[27, "tier"] == "norm"  # the fold's exclusive catch
    assert got.loc[25, "tier"] != "exact" or texts.count("") > 1


def test_purge_report_matches_brute(tier_corpus, ray_session):
    from intertext_ray.ops.tiers import tiered_purge_report

    ids, texts = tier_corpus
    got = (
        tiered_purge_report(_docs_ds(ids, texts), num_buckets=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(got.index) == ids
    want = _brute_cascade(ids, texts)
    for d in ids:
        assert got.loc[d, "dropped_at"] == want[d], d
    assert all(
        bool(got.loc[d, "kept"]) == (want[d] == "none") for d in ids
    )
    # cascade keeps exactly one member of the exact group
    kept_exact = [d for d in (0, 1, 2) if want[d] == "none"]
    assert got.loc[0, "dropped_at"] == "none" or kept_exact


def test_purge_survivors_are_clean(tier_corpus, ray_session):
    """Running every detector over the survivors finds nothing — the
    defining property of the cascade."""
    from intertext_ray.ops.minhash_doc import minhash_doc_dedup
    from intertext_ray.ops.simhash import simhash_near_dups
    from intertext_ray.ops.tiers import tiered_purge_report

    ids, texts = tier_corpus
    rep = (
        tiered_purge_report(_docs_ds(ids, texts), num_buckets=8)
        .to_pandas()
        .set_index("doc_id")
    )
    keep = set(rep.index[rep["kept"]])
    s_ids = [d for d in ids if d in keep]
    s_texts = [texts[d] for d in s_ids]
    assert len({t for t in s_texts}) == len(s_texts)  # no exact dups
    # no normalized-form dups either (the norm rung's defining property)
    norms = [_py_norm(t) for t in s_texts]
    assert len(set(norms)) == len(norms)
    surv = _docs_ds(s_ids, s_texts, blocks=2)
    assert minhash_doc_dedup(surv, num_buckets=8).count() == 0
    assert simhash_near_dups(surv, max_hamming=8, num_buckets=8).count() == 0


def test_partition_invariance(tier_corpus, ray_session):
    from intertext_ray.ops.tiers import dedup_tier_report, tiered_purge_report

    ids, texts = tier_corpus
    frames = []
    for blocks in (1, 7):
        frames.append(
            dedup_tier_report(_docs_ds(ids, texts, blocks), num_buckets=8)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    assert frames[0].equals(frames[1])
    frames = []
    for blocks in (1, 7):
        frames.append(
            tiered_purge_report(_docs_ds(ids, texts, blocks), num_buckets=8)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    assert frames[0].equals(frames[1])


def test_audio_tier_report_planted(ray_session):
    """Audio tier ladder on a planted corpus: identical PCM -> exact,
    lossless x2 re-gain -> norm, gain-perturbed-with-noise copy -> near,
    spliced shared bed only -> partial, unrelated -> unique; and the
    composed labels equal the strongest membership of the four chains
    run separately."""
    from intertext_ray.fixtures.gen_audio import base_signal
    from intertext_ray.functions.audio_fp import HOP
    from intertext_ray.ops.audio_dedup import audio_dup_pairs
    from intertext_ray.ops.audio_exact import (
        audio_exact_dup_groups,
        audio_norm_exact_dup_groups,
    )
    from intertext_ray.ops.audio_spans import audio_common_spans
    from intertext_ray.ops.tiers import audio_tier_report
    from intertext_ray.sources.clips import doc_ids_for_clip_ids

    sr = 8000
    n = sr * 4
    rng = np.random.default_rng(5)
    seg = base_signal(88, 1000, sr, sr * 16 // 10)
    sigs = {
        "c0": base_signal(88, 0, sr, n),
        "c1": base_signal(88, 1, sr, n),
        "c2": base_signal(88, 2, sr, n),
        "c5": base_signal(88, 5, sr, n),
    }
    sigs["c0"][20 * HOP : 20 * HOP + len(seg)] = seg
    sigs["c1"][60 * HOP : 60 * HOP + len(seg)] = seg
    pcm = {
        k: np.clip(v * 8192.0, -32768, 32767).astype(np.int16)
        for k, v in sigs.items()
    }
    pcm["c3"] = pcm["c2"].copy()                       # exact PCM copy
    pert = sigs["c2"] * 1.06 + rng.normal(0, 0.004, n)  # near dup
    pcm["c4"] = np.clip(pert * 8192.0, -32768, 32767).astype(np.int16)
    # lossless x2 re-gain of c5: raw-exact-distinct, but peak-normalizes
    # to bit-identical samples -> the norm rung's exclusive catch
    _c6 = pcm["c5"].astype(np.int64) * 2
    assert int(np.max(np.abs(_c6))) < 32768  # gain never clips
    pcm["c6"] = _c6.astype(np.int16)

    keys = sorted(pcm)
    tbl = pa.table(
        {
            "clip_id": keys,
            "bytes": [pcm[k].tobytes() for k in keys],
            "sr_hz": [sr] * len(keys),
            "dur_ms": [4000] * len(keys),
            "codec": ["pcm_s16le"] * len(keys),
        }
    )
    doc_of = {
        k: int(d) for k, d in zip(keys, doc_ids_for_clip_ids(tbl["clip_id"]))
    }
    clips = rd.from_arrow(tbl)
    got = (
        audio_tier_report(clips, num_buckets=8)
        .to_pandas()
        .set_index("doc_id")["tier"]
        .to_dict()
    )
    assert len(got) == len(keys)  # one row per clip

    # expected labels from the four chains run independently
    exact_m = {
        doc_of[c]
        for c in audio_exact_dup_groups(clips, num_buckets=8)
        .to_pandas()["clip_id"]
    }
    norm_m = {
        doc_of[c]
        for c in audio_norm_exact_dup_groups(clips, num_buckets=8)
        .to_pandas()["clip_id"]
    }
    near = audio_dup_pairs(clips, num_buckets=8).to_pandas()
    near_m = set(near.clip_a.astype(int)) | set(near.clip_b.astype(int))
    spans = audio_common_spans(clips, num_buckets=8).to_pandas()
    part_m = set(spans.clip_a.astype(int)) | set(spans.clip_b.astype(int))
    for k in keys:
        d = doc_of[k]
        if d in exact_m:
            want = "exact"
        elif d in norm_m:
            want = "norm"
        elif d in near_m:
            want = "near"
        elif d in part_m:
            want = "partial"
        else:
            want = "unique"
        assert got[d] == want, (k, got[d], want)

    # planted structure
    assert got[doc_of["c2"]] == "exact" and got[doc_of["c3"]] == "exact"
    assert got[doc_of["c4"]] == "near"
    assert got[doc_of["c0"]] == "partial" and got[doc_of["c1"]] == "partial"
    # the re-gained pair is invisible to raw-exact but caught by the fold
    assert got[doc_of["c5"]] == "norm" and got[doc_of["c6"]] == "norm"
    assert doc_of["c5"] not in exact_m and doc_of["c6"] not in exact_m
    # exact groups are a subset of norm groups
    assert exact_m <= norm_m


def test_savings_report_accounts_every_doc(tier_corpus, ray_session):
    """Savings rollup equals the brute per-doc cascade joined with
    str.split token counts; every doc is accounted exactly once."""
    from intertext_ray.ops.tiers import dedup_savings_report

    ids, texts = tier_corpus
    got = (
        dedup_savings_report(_docs_ds(ids, texts), num_buckets=8)
        .to_pandas()
        .set_index("dropped_at")
        .sort_index()
    )
    want = _brute_cascade(ids, texts)
    import collections

    agg = collections.defaultdict(lambda: [0, 0, 0])
    for d, t in zip(ids, texts):
        a = agg[want[d]]
        a[0] += 1
        a[1] += len(t.split())
        a[2] += len(t)
    assert set(got.index) == set(agg)
    for tier, (nd, nt, nc) in agg.items():
        assert int(got.loc[tier, "n_docs"]) == nd, tier
        assert int(got.loc[tier, "total_tokens"]) == nt, tier
        assert int(got.loc[tier, "total_chars"]) == nc, tier
    assert int(got["n_docs"].sum()) == len(ids)


def test_purge_checkpoint_resume(tier_corpus, ray_session, tmp_path):
    """With work_dir, every cascade boundary checkpoints; a second run
    resumes from the finished stages and returns identical rows; a knob
    change recomputes (the manifest's config hash no longer matches, so
    the stage is rebuilt and atomically swapped in)."""
    import os

    from intertext_ray.ops.tiers import tiered_purge_report

    ids, texts = tier_corpus
    wd = str(tmp_path / "tiers_ckpt")
    r1 = (
        tiered_purge_report(_docs_ds(ids, texts), num_buckets=8, work_dir=wd)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    stages = [
        "exact_members", "survivors_exact", "norm_members",
        "survivors_norm", "near_droppees", "survivors_near",
        "weak_droppees",
    ]
    for s in stages:
        assert os.path.exists(os.path.join(wd, s, "_MANIFEST.json")), s
    # resume: identical output, no recompute (manifests untouched)
    mtimes = {
        s: os.path.getmtime(os.path.join(wd, s, "_MANIFEST.json"))
        for s in stages
    }
    r2 = (
        tiered_purge_report(_docs_ds(ids, texts), num_buckets=8, work_dir=wd)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert r1.equals(r2)
    for s in stages:
        assert mtimes[s] == os.path.getmtime(
            os.path.join(wd, s, "_MANIFEST.json")
        ), s
    # a semantic knob change uses a different hash -> fresh compute, and
    # the result still matches the in-memory path
    r3 = tiered_purge_report(
        _docs_ds(ids, texts), num_buckets=8, max_hamming=0, work_dir=wd
    ).to_pandas()
    r3m = tiered_purge_report(
        _docs_ds(ids, texts), num_buckets=8, max_hamming=0
    ).to_pandas()
    assert (
        r3.sort_values("doc_id").reset_index(drop=True)
        .equals(r3m.sort_values("doc_id").reset_index(drop=True))
    )


def test_audio_savings_matches_ladder(ray_session):
    """Savings rollup equals the per-clip ladder joined with metadata —
    every clip accounted once, totals add up."""
    from intertext_ray.fixtures.gen_audio import base_signal
    from intertext_ray.functions.audio import encode_clip
    from intertext_ray.ops.tiers import audio_savings_report, audio_tier_report
    from intertext_ray.sources.clips import doc_ids_for_clip_ids

    sr = 8000
    n = sr * 2
    pcm = {}
    for i in range(4):
        pcm[f"s{i}"] = np.clip(
            base_signal(40 + i, i, sr, n) * 8000.0, -32768, 32767
        ).astype(np.int16)
    pcm["s4"] = pcm["s0"].copy()  # exact copy
    keys = sorted(pcm)
    tbl = pa.table(
        {
            "clip_id": keys,
            "bytes": [encode_clip(pcm[k], sr, "pcm_s16le") for k in keys],
            "sr_hz": pa.array([sr] * len(keys), pa.int32()),
            "dur_ms": pa.array([2000] * len(keys), pa.int32()),
            "codec": ["pcm_s16le"] * len(keys),
        }
    )
    clips = rd.from_arrow(tbl)
    ladder = (
        audio_tier_report(clips, num_buckets=8)
        .to_pandas()
        .set_index("doc_id")["tier"]
        .to_dict()
    )
    got = (
        audio_savings_report(clips, num_buckets=8)
        .to_pandas()
        .set_index("tier")
    )
    import collections

    nbytes = {
        int(d): len(b)
        for d, b in zip(
            doc_ids_for_clip_ids(tbl["clip_id"]).astype(np.int64),
            tbl["bytes"].to_pylist(),
        )
    }
    want = collections.defaultdict(lambda: [0, 0, 0])
    for d, t in ladder.items():
        want[t][0] += 1
        want[t][1] += 2000
        want[t][2] += nbytes[d]
    assert set(got.index) == set(want)
    for tier, (nc, dur, byt) in want.items():
        assert int(got.loc[tier, "n_clips"]) == nc
        assert int(got.loc[tier, "total_dur_ms"]) == dur
        assert int(got.loc[tier, "total_bytes"]) == byt
    assert int(got["n_clips"].sum()) == len(keys)
    # the exact pair is visible in the rollup
    assert int(got.loc["exact", "n_clips"]) >= 2
