"""Winnowing (MOSS) fingerprints: kernel parity vs a scalar reference,
the locality guarantee, and the hot-fingerprint cap."""

import numpy as np
import pyarrow as pa
import pytest

from intertext_ray.ops.winnow import (
    winnow_dup_pairs,
    winnow_fingerprints,
    winnow_fp_batch,
    winnow_select,
)


def _brute_select(fp, owner, w):
    """Scalar reference: per-doc windows, min hash, rightmost on ties;
    docs shorter than a window get one truncated window."""
    sel = set()
    n = len(fp)
    runs, s = [], 0
    for i in range(1, n + 1):
        if i == n or owner[i] != owner[i - 1]:
            runs.append((s, i))
            s = i
    for a, b in runs:
        t = b - a
        wins = [(a, b)] if t < w else [(a + o, a + o + w) for o in range(t - w + 1)]
        for lo, hi in wins:
            m = min(fp[lo:hi])
            sel.add(max(i for i in range(lo, hi) if fp[i] == m))
    return np.array(sorted(sel), dtype=np.int64)


def test_winnow_select_matches_scalar_reference_with_ties():
    rng = np.random.default_rng(0)
    for trial in range(200):
        n_docs = int(rng.integers(1, 6))
        lens = rng.integers(0, 12, n_docs)
        fp, owner = [], []
        for d, length in enumerate(lens):
            # tiny value range -> tie-heavy, exercising the rightmost rule
            fp.extend(rng.integers(0, 8, length))
            owner.extend([d] * int(length))
        fp = np.array(fp, dtype=np.uint64)
        owner = np.array(owner, dtype=np.int64)
        w = int(rng.integers(2, 6))
        got = winnow_select(fp, owner, w)
        want = _brute_select(fp, owner, w)
        assert np.array_equal(got, want), (trial, fp.tolist(), owner.tolist(), w)


def _fps_of(text, k=4, window=4):
    batch = pa.table({"doc_id": pa.array([0], pa.int64()), "text": [text]})
    t = winnow_fp_batch(batch, k=k, window=window)
    return set(t["fp_hex"].to_pylist())


def test_locality_guarantee_shared_run_shares_a_fingerprint():
    """Schleimer et al. guarantee: a token run of length >= w + k - 1
    shared by two docs yields at least one common selected fingerprint,
    wherever the run sits in either doc."""
    rng = np.random.default_rng(7)
    k = w = 4
    run = " ".join(f"shared{i}" for i in range(w + k - 1))  # 7 tokens
    for trial in range(20):
        pre_a = " ".join(f"a{rng.integers(1e6)}" for _ in range(rng.integers(0, 30)))
        post_a = " ".join(f"b{rng.integers(1e6)}" for _ in range(rng.integers(0, 30)))
        pre_b = " ".join(f"c{rng.integers(1e6)}" for _ in range(rng.integers(0, 30)))
        post_b = " ".join(f"d{rng.integers(1e6)}" for _ in range(rng.integers(0, 30)))
        doc_a = " ".join(x for x in (pre_a, run, post_a) if x)
        doc_b = " ".join(x for x in (pre_b, run, post_b) if x)
        assert _fps_of(doc_a, k, w) & _fps_of(doc_b, k, w), trial


def test_short_doc_still_fingerprinted():
    # 4 tokens = exactly one k-gram, fewer grams than the window
    fps = _fps_of("just four tiny tokens", k=4, window=4)
    assert len(fps) == 1


def test_winnow_density_below_mod_filter():
    """Winnowing density ~2/(w+1) — every gram must NOT be selected."""
    rng = np.random.default_rng(3)
    text = " ".join(f"t{rng.integers(1e9)}" for _ in range(500))
    batch = pa.table({"doc_id": pa.array([0], pa.int64()), "text": [text]})
    out = winnow_fp_batch(batch, k=4, window=4)
    n_grams = 500 - 4 + 1
    assert 0 < len(out) < n_grams
    # expected density 2/(w+1) = 0.4; allow generous slack
    assert len(out) / n_grams == pytest.approx(0.4, abs=0.12)


def test_dup_pairs_and_cap(ray_session):
    import ray.data

    # docs 0/1 share a long passage; docs 2..6 all share one boilerplate
    # sentence (a degenerate hot fingerprint); doc 7 is unrelated
    passage = " ".join(f"p{i}" for i in range(12))
    boiler = " ".join(f"b{i}" for i in range(8))
    rows = {
        "doc_id": list(range(8)),
        "text": [
            passage + " xa xb xc xd",
            "ya yb yc yd " + passage,
            boiler + " u0 u1 u2 u3",
            boiler + " v0 v1 v2 v3",
            boiler + " w0 w1 w2 w3",
            boiler + " q0 q1 q2 q3",
            boiler + " r0 r1 r2 r3",
            "z0 z1 z2 z3 z4 z5 z6 z7 z8 z9",
        ],
    }
    docs = ray.data.from_arrow(pa.table(rows))
    exact = winnow_dup_pairs(docs, min_shared=1).to_pandas()
    pairs = set(zip(exact.doc_a, exact.doc_b))
    assert (0, 1) in pairs
    # all 10 boilerplate pairs present without a cap
    boiler_pairs = {(a, b) for a in range(2, 7) for b in range(a + 1, 7)}
    assert boiler_pairs <= pairs
    assert not any(7 in p for p in pairs)

    # cap at 4 docs/fingerprint: the 5-doc boilerplate runs are dropped
    # whole, the 2-doc passage pair survives
    docs2 = ray.data.from_arrow(pa.table(rows))
    capped = winnow_dup_pairs(docs2, min_shared=1, fp_doc_cap=4).to_pandas()
    cpairs = set(zip(capped.doc_a, capped.doc_b))
    assert (0, 1) in cpairs
    assert not (boiler_pairs & cpairs)


def test_dup_pairs_matches_brute_force(ray_session):
    """Distributed shared-fp counts == a single-batch brute force."""
    import ray.data

    rng = np.random.default_rng(11)
    vocab = [f"v{i}" for i in range(40)]
    shared_runs = [
        " ".join(rng.choice(vocab, size=10)) for _ in range(6)
    ]
    texts = []
    for _ in range(50):
        parts = [" ".join(rng.choice(vocab, size=rng.integers(5, 30)))]
        # splice 0-2 shared passages into random spots so real dup pairs
        # exist alongside coincidental single-fp overlaps
        for _ in range(int(rng.integers(0, 3))):
            parts.insert(
                int(rng.integers(0, len(parts) + 1)),
                shared_runs[int(rng.integers(0, len(shared_runs)))],
            )
        texts.append(" ".join(parts))
    tbl = pa.table(
        {"doc_id": pa.array(range(50), pa.int64()), "text": texts}
    )
    # brute force from the batch kernel
    fps = winnow_fp_batch(tbl)
    by_doc = {}
    for d, f in zip(fps["doc_id"].to_pylist(), fps["fp_hex"].to_pylist()):
        by_doc.setdefault(d, set()).add(f)
    want = {}
    ids = sorted(by_doc)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            c = len(by_doc[a] & by_doc[b])
            if c >= 2:
                want[(a, b)] = c
    got_df = (
        winnow_dup_pairs(
            ray.data.from_arrow(tbl).repartition(8), min_shared=2
        )
        .to_pandas()
    )
    got = (
        {}
        if got_df.empty
        else {
            (a, b): s
            for a, b, s in zip(got_df.doc_a, got_df.doc_b, got_df.shared)
        }
    )
    assert want, "fixture must produce real dup pairs"
    assert got == want
