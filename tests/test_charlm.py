"""Char-bigram LM perplexity: Q20 log2 kernel properties, scalar scoring
parity, and the quality-filter separation property."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.integers(1, (1 << 52)))
def test_log2_q20_accuracy_and_powers(x):
    from intertext_ray.ops.charlm import log2_q20

    got = int(log2_q20(np.array([x]))[0])
    true = math.log2(x) * (1 << 20)
    assert abs(got - true) < 8  # < 1e-5 in log2 units
    if x & (x - 1) == 0:  # exact at powers of two
        assert got == int(math.log2(x)) << 20


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 1 << 40), st.integers(1, 1 << 40))
def test_log2_q20_monotone(a, b):
    from intertext_ray.ops.charlm import log2_q20

    la, lb = log2_q20(np.array([a, b]))
    if a <= b:
        assert la <= lb
    else:
        assert la >= lb


@pytest.fixture(scope="module")
def scored(ray_session):
    from intertext_ray.ops.charlm import perplexity_scores

    rng = np.random.default_rng(3)
    vocab = ["table", "scan", "query", "fast", "slow", "window"]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(3, 12))))
        for _ in range(80)
    ]
    texts[5] = ""
    texts[6] = "x"
    # gibberish docs: uniform random letters (never in the training dist)
    for i in (70, 71, 72):
        texts[i] = "".join(
            rng.choice(list("qzjxkvw"), size=40).tolist()
        )
    tbl = pa.table(
        {"doc_id": pa.array(range(80), pa.int64()), "text": pa.array(texts)}
    )
    out = (
        perplexity_scores(rd.from_arrow(tbl).repartition(5))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    return texts, out


def test_scoring_matches_scalar_reference(scored):
    from intertext_ray.functions.hashing import splitmix64
    from intertext_ray.ops.charlm import log2_q20

    texts, out = scored
    train = [
        t
        for i, t in enumerate(texts)
        if splitmix64(np.uint64(i)) % np.uint64(1000) < 500
    ]
    cab: Counter = Counter()
    for t in train:
        b = t.encode()
        for i in range(len(b) - 1):
            cab[(b[i], b[i + 1])] += 1
    ca: Counter = Counter()
    for (a, _), c in cab.items():
        ca[a] += c

    def L(x):
        return int(log2_q20(np.array([x]))[0])

    for i, t in enumerate(texts):
        b = t.encode()
        if len(b) < 2:
            assert out.loc[i, "n_pairs"] == 0 and out.loc[i, "avg_nll2_q20"] == 0
            continue
        tot = sum(
            L(ca[b[j]] + 256) - L(cab[(b[j], b[j + 1])] + 1)
            for j in range(len(b) - 1)
        )
        assert out.loc[i, "n_pairs"] == len(b) - 1
        assert out.loc[i, "avg_nll2_q20"] == tot // (len(b) - 1)


def test_gibberish_scores_higher_than_fluent(scored):
    """The quality-filter property: out-of-distribution byte sequences
    score strictly higher NLL than in-vocabulary docs."""
    texts, out = scored
    gib = out.loc[[70, 71, 72], "avg_nll2_q20"]
    fluent = out.loc[
        [i for i in range(60) if len(texts[i]) > 10], "avg_nll2_q20"
    ]
    assert gib.min() > fluent.max()
    assert gib.mean() > 2 * fluent.mean()


def test_char_entropy_scalar_reference_and_properties():
    """char_entropy_scores == the scalar H_q20 formula per doc; constant
    docs score exactly 0; entropy approximates Shannon H within the Q20
    floor error; uniform byte spread scores higher than skewed."""
    from intertext_ray.ops.charlm import char_entropy_scores, log2_q20

    texts = [
        "",                      # empty -> (0, 0)
        "aaaaaaa",               # single symbol -> exactly 0
        "abababab",              # two symbols, uniform
        "aaab",                  # two symbols, skewed
        "abcdefgh",              # 8 symbols uniform -> ~3 bits
        "the quick brown fox jumps over the lazy dog",
        "ééx",        # non-ASCII: utf-8 BYTE entropy
    ]
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )
    out = (
        char_entropy_scores(ds).to_pandas().set_index("doc_id").sort_index()
    )

    def L(x: int) -> int:
        return int(log2_q20(np.array([x], dtype=np.int64))[0])

    for i, t in enumerate(texts):
        b = t.encode("utf-8")
        n = len(b)
        assert out.loc[i, "n_bytes"] == n
        if n == 0:
            assert out.loc[i, "entropy_q20"] == 0
            continue
        cnt = Counter(b)
        expect = L(n) - sum(c * L(c) for c in cnt.values()) // n
        assert out.loc[i, "entropy_q20"] == expect
        # Q20 value tracks float Shannon entropy to < 2^-18 relative
        h = -sum(
            (c / n) * math.log2(c / n) for c in cnt.values() if c > 0
        )
        assert abs(out.loc[i, "entropy_q20"] / 2**20 - h) < 1e-4 + 1e-5 * h

    assert out.loc[1, "entropy_q20"] == 0  # constant doc: exactly zero
    assert out.loc[2, "entropy_q20"] > out.loc[3, "entropy_q20"]  # skew
    assert abs(out.loc[4, "entropy_q20"] - 3 * 2**20) <= 1  # 8 uniform


def test_perplexity_quantile_filter():
    """The gate keeps exactly the lowest ceil(n*p/1000) scores plus
    threshold ties, and every kept score <= every dropped score."""
    from intertext_ray.ops.charlm import (
        perplexity_quantile_filter,
        perplexity_scores,
    )

    rng = np.random.default_rng(4)
    vocab = ["the", "cat", "sat", "mat", "dog", "ran"]
    texts = [
        " ".join(rng.choice(vocab, 12)) for _ in range(40)
    ] + ["zqxj" * 8, "wvkp" * 8]  # gibberish tail must drop at p<=954
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )
    all_scores = (
        perplexity_scores(ds).to_pandas().set_index("doc_id")["avg_nll2_q20"]
    )
    kept = perplexity_quantile_filter(ds, keep_permille=900).to_pandas()
    n = len(texts)
    need = (n * 900 + 999) // 1000
    vals = np.sort(all_scores.to_numpy())
    t = vals[need - 1]
    want = set(all_scores.index[all_scores <= t])
    assert set(kept.doc_id) == want
    assert len(kept) >= need
    assert 40 not in set(kept.doc_id) and 41 not in set(kept.doc_id)
