"""BoW cosine pairs: brute-force parity (incl. the df restriction),
integer exactness, repetition-sensitivity vs set measures."""

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd


def _corpus():
    rng = np.random.default_rng(6)
    vocab = [f"w{i}" for i in range(25)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(8, 40))))
        for _ in range(120)
    ]
    for i in range(0, 30, 3):
        texts[i + 1] = texts[i] + " extra"
    texts[7] = ""
    return texts, pa.table(
        {"doc_id": pa.array(range(120), pa.int64()), "text": pa.array(texts)}
    )


def _brute(texts, min_c, max_df=0):
    cs = [Counter(t.split()) for t in texts]
    if max_df:
        df = Counter()
        for c in cs:
            for w in c:
                df[w] += 1
        drop = {w for w, d in df.items() if d > max_df}
        cs = [
            Counter({w: v for w, v in c.items() if w not in drop}) for c in cs
        ]
    ref = set()
    for a in range(len(cs)):
        for b in range(a + 1, len(cs)):
            ca, cb = cs[a], cs[b]
            dot = sum(ca[w] * cb[w] for w in ca if w in cb)
            na = sum(v * v for v in ca.values())
            nb = sum(v * v for v in cb.values())
            if na and nb:
                c2 = (dot * dot * 1_000_000) // (na * nb)
                if c2 >= min_c:
                    ref.add((a, b, c2))
    return ref


def _run(tbl, **kw):
    from intertext_ray.ops.text_cosine import cosine_text_pairs

    out = cosine_text_pairs(rd.from_arrow(tbl).repartition(6), **kw)
    got = set()
    for b in out.iter_batches(batch_format="pyarrow"):
        got.update(
            zip(
                b["doc_a"].to_pylist(),
                b["doc_b"].to_pylist(),
                b["cos2_x1e6"].to_pylist(),
            )
        )
    return got


def test_matches_brute_force(ray_session):
    texts, tbl = _corpus()
    for min_c, mdf in [(900000, 0), (700000, 0), (600000, 100)]:
        got = _run(tbl, min_cos2_x1e6=min_c, max_df=mdf, num_buckets=8)
        assert got == _brute(texts, min_c, mdf), (min_c, mdf)
    assert len(_run(tbl, min_cos2_x1e6=900000, max_df=0)) > 0


def test_repetition_sensitivity(ray_session):
    """Cosine separates emphasis where set-Jaccard cannot: doc 1 repeats
    'aa' heavily, doc 2 repeats 'bb' — SAME token set, low cosine."""
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["aa " * 20 + "bb", "aa " + "bb " * 20]),
        }
    )
    got = _run(tbl, min_cos2_x1e6=0, max_df=0, num_buckets=4)
    assert len(got) == 1
    (_, _, c2), = got
    # dot = 20*1 + 1*20 = 40; n2 = 401 each -> cos2 = 40^2/401^2 ~ 0.00995
    assert c2 == (40 * 40 * 1_000_000) // (401 * 401)
    assert c2 < 20000  # near-orthogonal despite identical token SETS
