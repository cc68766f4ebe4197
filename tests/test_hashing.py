"""Unit tests for the pinned hashing kernels (SURVEY.md §5 step 1)."""

import numpy as np
import pytest

from intertext_ray.config import IntertextConfig
from intertext_ray.functions.hashing import (
    band_keys,
    chargram_values,
    minhash_concat,
    minhash_texts,
    perm_seeds,
    splitmix64,
)

CFG = IntertextConfig()
SEEDS = perm_seeds(CFG.n_half, CFG.hash_seed)


def test_splitmix64_deterministic_and_scrambling():
    a = splitmix64(np.arange(1000, dtype=np.uint64))
    b = splitmix64(np.arange(1000, dtype=np.uint64))
    assert (a == b).all()
    assert len(np.unique(a)) == 1000
    # output is well spread over uint64 range
    assert a.max() > np.uint64(2**63)


def test_perm_seeds_pinned():
    s1 = perm_seeds(128, CFG.hash_seed)
    s2 = perm_seeds(128, CFG.hash_seed)
    assert (s1 == s2).all()
    assert len(np.unique(s1)) == 128
    assert not (perm_seeds(128, 999) == s1).all()


def test_chargram_values():
    v = chargram_values(np.frombuffer(b"abcde", dtype=np.uint8), 4)
    assert len(v) == 2  # "abcd", "bcde"
    # little-endian packing
    assert v[0] == ord("a") | ord("b") << 8 | ord("c") << 16 | ord("d") << 24
    # short input zero-padded
    v2 = chargram_values(np.frombuffer(b"ab", dtype=np.uint8), 4)
    assert len(v2) == 1 and v2[0] == ord("a") | ord("b") << 8


def _sig_one(text: str) -> np.ndarray:
    return minhash_texts([text], SEEDS, CFG.chargram_length, CFG.mirror)[0]


def test_identical_text_identical_sig():
    a = _sig_one("the quick brown fox jumps over the lazy dog again and again")
    b = _sig_one("the quick brown fox jumps over the lazy dog again and again")
    assert (a == b).all()
    assert a.shape == (256,)


def test_concat_equals_per_window():
    """Boundary masking: batched minhash == one-at-a-time minhash."""
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi",
        "one two three four five six seven eight nine ten eleven twelve thirteen fourteen",
        "aa",  # shorter than a 4-gram — exercised pad path
        "the quick brown fox jumps over the lazy dog",
    ]
    batched = minhash_texts(texts, SEEDS, CFG.chargram_length, CFG.mirror)
    for i, t in enumerate(texts):
        assert (batched[i] == _sig_one(t)).all(), i


def test_case_folding_pinned():
    assert (_sig_one("Hello World ABC") == _sig_one("hello world abc")).all()


def test_minhash_jaccard_estimate():
    """Signature agreement tracks char-4-gram Jaccard within binomial bounds."""
    rng = np.random.default_rng(7)
    words = ["w%03d" % i for i in range(60)]
    a = " ".join(words)
    # replace some words -> moderately similar shingle sets
    words2 = list(words)
    for i in rng.choice(60, 12, replace=False):
        words2[i] = "x%03d" % i
    b = " ".join(words2)

    def grams(s):
        bs = s.lower().encode()
        return {bs[i : i + 4] for i in range(len(bs) - 3)}

    j = len(grams(a) & grams(b)) / len(grams(a) | grams(b))
    sa, sb = _sig_one(a), _sig_one(b)
    est = (sa == sb).mean()
    # 256 trials, p=j -> ~4 sigma bound
    bound = 4 * np.sqrt(j * (1 - j) / 256)
    assert abs(est - j) < bound + 0.02, (est, j)


def test_band_keys_shape_and_position_independence():
    sig = np.arange(2 * 256, dtype=np.uint32).reshape(2, 256)
    k = band_keys(sig, 4, 3, CFG.hash_seed)
    assert k.shape == (2, 85)
    # same 4 consecutive values at different offsets -> SAME key (reference
    # keys exclude band position)
    sig2 = np.zeros((1, 256), dtype=np.uint32)
    sig2[0, 0:4] = [9, 8, 7, 6]
    sig2[0, 6:10] = [9, 8, 7, 6]  # band offsets 0 and 6 are both extracted
    k2 = band_keys(sig2, 4, 3, CFG.hash_seed)
    assert k2[0, 0] == k2[0, 2]


def test_minhash_empty_batch():
    out = minhash_concat(
        np.empty(0, np.uint8), np.zeros(1, np.int64), SEEDS, 4, True
    )
    assert out.shape == (0, 256)
