"""Exact-substring (suffix-array family) dedup: the suffix-array kernel
is pinned against brute-force suffix sorting; the three distributed paths
(pair emission, gram-hash spans, suffix-array spans) are pinned against a
brute-force k-gram reference and against each other."""

import itertools
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from intertext_ray.functions.suffix import (
    neighbor_lcp,
    repeat_mask,
    suffix_array,
)

K = 6


def _corpus(n_docs=50, seed=11, vocab_n=30):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(vocab_n)]
    docs = [
        list(rng.choice(vocab, size=int(rng.integers(3, 60))))
        for _ in range(n_docs)
    ]
    run = list(rng.choice(vocab, size=18))
    # cross-doc verbatim runs, a same-doc repeat, and a short sub-run
    docs[2][4:4] = run
    docs[9][0:0] = run
    docs[9][30:30] = run[: K + 2]
    docs[13][1:1] = run[:K]
    docs[20] = run[:3]  # shorter than K: must contribute nothing
    return docs


def _ds(docs):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array([" ".join(t) for t in docs], pa.string()),
            }
        )
    )


def _gram_list(toks, k=K):
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _bf_pairs(docs, k=K):
    out = {}
    for a, b in itertools.combinations(range(len(docs)), 2):
        shared = set(_gram_list(docs[a], k)) & set(_gram_list(docs[b], k))
        if shared:
            out[(a, b)] = len(shared)
    return out


def _bf_spans(docs, k=K):
    allg = Counter()
    for t in docs:
        allg.update(_gram_list(t, k))
    spans = set()
    for d, toks in enumerate(docs):
        dup = [
            i + 1 for i, g in enumerate(_gram_list(toks, k)) if allg[g] >= 2
        ]
        for _, grp in itertools.groupby(
            enumerate(dup), key=lambda x: x[1] - x[0]
        ):
            ps = [p for _, p in grp]
            spans.add((d, ps[0], ps[-1] + k - 1, len(ps)))
    return spans


# --- suffix-array kernel -------------------------------------------------


def test_suffix_array_vs_sorted_suffixes():
    rng = np.random.default_rng(3)
    for n, alpha in [(0, 2), (1, 2), (2, 1), (40, 3), (200, 5), (300, 2)]:
        s = rng.integers(0, alpha, size=n)
        sa = suffix_array(s)
        expect = sorted(range(n), key=lambda i: tuple(s[i:]))
        assert list(sa) == expect, (n, alpha)


def test_neighbor_lcp_capped():
    s = np.array([1, 2, 1, 2, 1, 9])
    sa = suffix_array(s)
    lcp = neighbor_lcp(s, sa, cap=3)
    # brute-force, truncated at the cap
    def bf(i, j, cap):
        d = 0
        while (
            d < cap and i + d < len(s) and j + d < len(s) and s[i + d] == s[j + d]
        ):
            d += 1
        return d

    for r in range(len(s) - 1):
        assert lcp[r] == bf(sa[r], sa[r + 1], 3)


def test_repeat_mask_brute_force():
    rng = np.random.default_rng(5)
    for trial in range(20):
        n = int(rng.integers(0, 120))
        s = rng.integers(0, 4, size=n)
        L = int(rng.integers(1, 6))
        mask = repeat_mask(s, L)
        grams = [tuple(s[i : i + L]) for i in range(max(n - L + 1, 0))]
        c = Counter(grams)
        expect = np.zeros(n, dtype=bool)
        for i, g in enumerate(grams):
            expect[i] = c[g] >= 2
        assert np.array_equal(mask, expect), (trial, n, L)


# --- distributed ops -----------------------------------------------------


def test_substring_dup_pairs_exact(ray_session):
    from intertext_ray.ops.substring import substring_dup_pairs

    docs = _corpus()
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in substring_dup_pairs(_ds(docs), k=K, num_buckets=8).take_all()
    }
    assert got == _bf_pairs(docs)


def test_duplicate_spans_exact(ray_session):
    from intertext_ray.ops.substring import duplicate_spans

    docs = _corpus()
    got = {
        (r["doc_id"], r["start_pos"], r["end_pos"], r["n_grams"])
        for r in duplicate_spans(_ds(docs), k=K, num_buckets=8).take_all()
    }
    assert got == _bf_spans(docs)


def test_suffix_repeat_spans_matches_gram_path(ray_session):
    from intertext_ray.ops.substring import suffix_repeat_spans

    docs = _corpus(seed=23)
    got = {
        (r["doc_id"], r["start_pos"], r["end_pos"], r["n_grams"])
        for r in suffix_repeat_spans(
            _ds(docs), min_len=K, num_buckets=1
        ).take_all()
    }
    assert got == _bf_spans(docs)


def test_suffix_repeat_spans_bucketed_is_within_bucket_subset(ray_session):
    """With >1 bucket the suffix path sees only within-bucket repeats:
    every reported span must be a sub-span of a global one, and every
    repeat whose docs land in the same bucket must be found."""
    from intertext_ray.functions.hashing import splitmix64
    from intertext_ray.ops.substring import suffix_repeat_spans

    docs = _corpus(seed=31)
    got = {
        (r["doc_id"], r["start_pos"], r["end_pos"])
        for r in suffix_repeat_spans(
            _ds(docs), min_len=K, num_buckets=3
        ).take_all()
    }
    full = {(d, s, e) for d, s, e, _ in _bf_spans(docs)}
    covered = {
        (d, s1, e1)
        for d, s1, e1 in got
        for dd, s2, e2 in full
        if d == dd and s2 <= s1 and e1 <= e2
    }
    assert got == covered  # no span outside a global span
    # per-bucket exactness: recompute brute force per bucket
    nb = 3
    for bucket in range(nb):
        sub = [
            t if int(splitmix64(np.uint64(d)) % np.uint64(nb)) == bucket else []
            for d, t in enumerate(docs)
        ]
        expect = {
            (d, s, e)
            for d, s, e, _ in _bf_spans(sub)
            if sub[d]
        }
        got_b = {
            (d, s, e)
            for d, s, e in got
            if int(splitmix64(np.uint64(d)) % np.uint64(nb)) == bucket
        }
        assert got_b == expect


def test_empty_and_short_docs(ray_session):
    from intertext_ray.ops.substring import (
        duplicate_spans,
        substring_dup_pairs,
        suffix_repeat_spans,
    )

    ds = _ds([[], ["a"], ["a", "b"], []])
    assert substring_dup_pairs(ds, k=3).take_all() == []
    assert duplicate_spans(ds, k=3).take_all() == []
    assert suffix_repeat_spans(ds, min_len=3).take_all() == []


def test_remove_duplicate_spans_matches_span_cut(ray_session):
    """Removal = detection spans cut from the token stream, rejoined; the
    scalar reference derives the cut directly from duplicate_spans."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from intertext_ray.ops.substring import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(300)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(10, 40))))
        for _ in range(60)
    ]
    run = " ".join(rng.choice(vocab, size=12))
    texts[0] += " " + run
    texts[1] = run + " " + texts[1]
    texts[3] = run + " middle filler " + run  # in-doc repeat
    texts[4] = ""  # empty doc passes through
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )

    spans = duplicate_spans(rd.from_arrow(tbl).repartition(5), k=8).to_pandas()
    got = (
        remove_duplicate_spans(rd.from_arrow(tbl).repartition(5), k=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(got) == len(texts)
    span_by_doc = {}
    for r in spans.itertuples():
        span_by_doc.setdefault(r.doc_id, []).append((r.start_pos, r.end_pos))
    assert 0 in span_by_doc and 3 in span_by_doc  # planted runs detected
    for i, t in enumerate(texts):
        toks = t.split()
        cov = set()
        for s, e in span_by_doc.get(i, []):
            cov.update(range(s - 1, e))
        ref = " ".join(w for j, w in enumerate(toks) if j not in cov)
        assert got.loc[i, "text"] == ref
        assert got.loc[i, "n_removed"] == len(cov)
    assert got.loc[3, "n_removed"] == 24  # both in-doc copies cut
