"""Gopher-style repetition counts, pinned against a Counter brute force."""

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd


def _bf(text):
    toks = text.split()
    nt = len(toks)
    wc = Counter(toks)
    dup = sum(c for c in wc.values() if c >= 2)
    out = {"n_tokens": nt, "dup_word_occ": dup}
    for k, name in ((2, "bigram"), (3, "trigram")):
        grams = [tuple(toks[i : i + k]) for i in range(nt - k + 1)]
        out[f"n_{name}s"] = max(nt - k + 1, 0)
        out[f"top_{name}_count"] = max(Counter(grams).values()) if grams else 0
    return out


def test_repetition_scores_brute_force(ray_session):
    from intertext_ray.ops.text_stats import repetition_scores

    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(6)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(0, 40))))
        for _ in range(40)
    ]
    texts += ["", "   ", "solo", "a a a a", "x y x y x y", "p q r p q r p q"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = {
        r["doc_id"]: r
        for r in repetition_scores(rd.from_arrow(tbl)).take_all()
    }
    assert len(got) == len(texts)
    for i, t in enumerate(texts):
        expect = _bf(t)
        for key, v in expect.items():
            assert got[i][key] == v, (i, key, got[i], expect)
