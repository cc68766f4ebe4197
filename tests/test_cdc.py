"""Content-defined chunking: kernel parity vs a scalar reference, the
shift-resistance property, and the distributed dup report."""

import numpy as np
import pyarrow as pa

from intertext_ray.functions.hashing import splitmix64
from intertext_ray.ops.cdc import (
    cdc_chunk_batch,
    cdc_dup_chunks,
    cdc_pos_weights,
)
from intertext_ray.ops.text_stats import rolling_gram_weights


def _sm1(x) -> int:
    return int(splitmix64(np.array([x], np.uint64))[0])


def brute_chunks(text, k=4, divisor=16, max_tokens=0):
    """Scalar reference chunker: python-loop cuts + chunk hashes."""
    from intertext_ray.ops.simhash import _chain_hash_tokens

    toks = text.split()
    if not toks:
        return []
    th = _chain_hash_tokens(pa.array(toks, pa.string()))
    T = len(toks)
    P = rolling_gram_weights(k)
    cutset = set()
    for i in range(T - k + 1):
        acc = np.uint64(0)
        for j in range(k):
            acc = np.uint64(acc + th[i + j] * P[j])  # wraparound
        if _sm1(acc) % divisor == 0:
            cutset.add(i + k - 1)
    chunks, cur = [], []
    for i in range(T):
        cur.append(i)
        if i in cutset:
            chunks.append(cur)
            cur = []
    if cur:
        chunks.append(cur)
    if max_tokens:
        chunks = [
            c[o : o + max_tokens]
            for c in chunks
            for o in range(0, len(c), max_tokens)
        ]
    out = []
    for ci, c in enumerate(chunks):
        W = cdc_pos_weights(len(c))
        s = np.uint64(0)
        for j, t in enumerate(c):
            s = np.uint64(s + th[t] * W[j])
        out.append((ci, len(c), f"{_sm1(s):016x}"))
    return out


def _kernel_chunks(texts, **kw):
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": texts,
        }
    )
    t = cdc_chunk_batch(batch, **kw)
    by_doc = {}
    for d, ci, nt, h in zip(
        t["doc_id"].to_pylist(),
        t["chunk_idx"].to_pylist(),
        t["n_tokens"].to_pylist(),
        t["chunk_hash_hex"].to_pylist(),
    ):
        by_doc.setdefault(d, []).append((ci, nt, h))
    return {d: sorted(v) for d, v in by_doc.items()}


def test_kernel_matches_scalar_reference():
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=int(n)))
        for n in rng.integers(1, 120, 40)
    ] + ["one two three", "", "   ", "solo"]
    got = _kernel_chunks(texts, k=4, divisor=8)
    for d, text in enumerate(texts):
        want = sorted(brute_chunks(text, k=4, divisor=8))
        assert got.get(d, []) == want, (d, text)


def test_kernel_matches_scalar_reference_with_max_tokens():
    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(10)]
    texts = [
        " ".join(rng.choice(vocab, size=int(n)))
        for n in rng.integers(1, 200, 25)
    ]
    got = _kernel_chunks(texts, k=4, divisor=32, max_tokens=7)
    for d, text in enumerate(texts):
        want = sorted(brute_chunks(text, k=4, divisor=32, max_tokens=7))
        assert got.get(d, []) == want, (d, text)


def test_shift_resistance():
    """Prepending a junk prefix leaves every chunk after the first cut
    identical — the CDC property fixed-size chunking lacks."""
    rng = np.random.default_rng(1)
    vocab = [f"v{i}" for i in range(50)]
    base = " ".join(rng.choice(vocab, size=400))
    prefix = " ".join(f"junk{i}" for i in range(17))
    a = brute_chunks(base, k=4, divisor=16)
    b = brute_chunks(prefix + " " + base, k=4, divisor=16)
    hashes_a = [h for _, _, h in a]
    hashes_b = {h for _, _, h in b}
    assert len(hashes_a) > 3, "fixture must chunk several times"
    # everything after the doc's first chunk realigns
    missing = [h for h in hashes_a[1:] if h not in hashes_b]
    assert not missing


def _brute_remove(texts, k=4, divisor=16):
    """Scalar reference for remove_dup_chunks: global canonical per
    hash by (doc_id, chunk_idx), all other occurrences cut."""
    per_doc = {d: brute_chunks(t, k, divisor) for d, t in enumerate(texts)}
    first = {}
    for d in sorted(per_doc):
        for ci, nt, h in per_doc[d]:
            first.setdefault(h, (d, ci))
    out = {}
    for d, t in enumerate(texts):
        toks = t.split()
        keep = np.ones(len(toks), dtype=bool)
        pos = 0
        for ci, nt, h in per_doc[d]:
            if first[h] != (d, ci):
                keep[pos : pos + nt] = False
            pos += nt
        kept = [w for w, kf in zip(toks, keep) if kf]
        out[d] = (" ".join(kept), len(toks) - len(kept))
    return out


def test_remove_dup_chunks_matches_scalar_reference(ray_session):
    import ray.data

    rng = np.random.default_rng(21)
    vocab = [f"v{i}" for i in range(30)]
    boiler = " ".join(rng.choice(vocab, size=50))
    texts = []
    for i in range(25):
        t = " ".join(rng.choice(vocab, size=int(rng.integers(10, 60))))
        if i % 3 == 0:
            t = boiler + " " + t  # shared heads -> duplicated chunks
        if i % 5 == 0:
            t = t + " " + boiler
        texts.append(t)
    texts.append("")  # empty doc passes through
    texts.append("tiny doc")  # < k tokens: one chunk, maybe canonical
    texts.append("tiny doc")  # exact dup of the short doc -> fully cut
    want = _brute_remove(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": texts,
        }
    )
    from intertext_ray.ops.cdc import remove_dup_chunks

    got_df = (
        remove_dup_chunks(ray.data.from_arrow(tbl).repartition(5))
        .to_pandas()
    )
    got = {
        int(r.doc_id): (r.text, int(r.n_removed))
        for r in got_df.itertuples()
    }
    assert got == want
    # the exact-dup short doc was cut entirely, its canonical kept
    assert got[len(texts) - 1] == ("", 2)
    assert got[len(texts) - 2] == ("tiny doc", 0)


def test_dup_chunks_distributed_matches_brute(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    vocab = [f"v{i}" for i in range(40)]
    boiler = " ".join(rng.choice(vocab, size=60))
    texts = []
    for _ in range(30):
        t = " ".join(rng.choice(vocab, size=int(rng.integers(20, 80))))
        if rng.random() < 0.5:
            t = t + " " + boiler  # shared tail -> shared chunks
        texts.append(t)
    tbl = pa.table(
        {"doc_id": pa.array(range(30), pa.int64()), "text": texts}
    )
    # brute force over the kernel's chunk table
    chunks = cdc_chunk_batch(tbl, k=4, divisor=16)
    want = {}
    rows = list(
        zip(
            chunks["chunk_hash_hex"].to_pylist(),
            chunks["doc_id"].to_pylist(),
            chunks["n_tokens"].to_pylist(),
        )
    )
    agg = {}
    for h, d, nt in rows:
        occ, docs, mx = agg.get(h, (0, set(), 0))
        agg[h] = (occ + 1, docs | {d}, max(mx, nt))
    want = {
        h: (occ, len(docs), mx)
        for h, (occ, docs, mx) in agg.items()
        if occ > 1
    }
    assert want, "fixture must produce duplicated chunks"
    got_df = (
        cdc_dup_chunks(ray.data.from_arrow(tbl).repartition(6))
        .to_pandas()
    )
    got = {
        r.chunk_hash_hex: (r.n_occurrences, r.n_docs, r.n_tokens)
        for r in got_df.itertuples()
    }
    assert got == want
