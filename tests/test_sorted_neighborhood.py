"""Sorted-neighborhood (SortingLSH) near-dup: brute-force parity across
partition layouts, boundary/ghost correctness, determinism."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def _corpus(n=300, seed=7):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(40)]
    texts = []
    for _ in range(n):
        texts.append(" ".join(rng.choice(words, size=rng.integers(5, 30))))
    for i in range(0, 60, 3):  # planted near-dups
        texts[i + 1] = texts[i] + " extra"
    texts[5] = ""  # empty doc -> fingerprint 0
    texts[6] = "   "  # whitespace-only -> fingerprint 0 too
    return pa.table(
        {"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(texts)}
    )


def _brute(tbl, window, max_hamming):
    from intertext_ray.ops.simhash import hamming64, simhash_batch

    fp = simhash_batch(tbl["text"])
    n = len(fp)
    order = np.lexsort((np.arange(n), fp))
    d, f = np.arange(n)[order], fp[order]
    ref = set()
    for g in range(1, window + 1):
        if g >= n:
            break
        ham = hamming64(f[:-g], f[g:])
        for x, y, h in zip(d[:-g], d[g:], ham):
            if h <= max_hamming:
                ref.add((int(x), int(y), g, int(h)))
    return ref


def _run(tbl, **kw):
    from intertext_ray.ops.sorted_neighborhood import sorted_neighbor_dups

    out = sorted_neighbor_dups(rd.from_arrow(tbl).repartition(7), **kw)
    got = set()
    for b in out.iter_batches(batch_format="pyarrow"):
        got.update(
            zip(
                b["doc_a"].to_pylist(),
                b["doc_b"].to_pylist(),
                b["rank_gap"].to_pylist(),
                b["hamming"].to_pylist(),
            )
        )
    return got


@pytest.mark.parametrize(
    "part_bits,block_size",
    [(6, 4096), (2, 16), (4, 64), (6, 8)],  # incl. block_size == window
)
def test_matches_brute_force_across_layouts(ray_session, part_bits, block_size):
    tbl = _corpus()
    ref = _brute(tbl, window=8, max_hamming=8)
    got = _run(
        tbl, window=8, max_hamming=8, part_bits=part_bits, block_size=block_size
    )
    assert got == ref
    assert len(ref) > 0  # planted dups must surface


def test_doc_a_is_lower_rank_not_lower_id(ray_session):
    """doc_a is the LOWER-RANK doc in (simhash, doc_id) order; with distinct
    fingerprints rank order follows fingerprint order, so doc_a > doc_b
    happens whenever the larger id has the smaller fingerprint."""
    from intertext_ray.ops.simhash import simhash_batch

    tbl = _corpus()
    got = _run(tbl, window=8, max_hamming=64)  # keep every window pair
    fp = simhash_batch(tbl["text"])
    inverted = [
        (a, b)
        for a, b, _, _ in got
        if a > b and (fp[a], a) < (fp[b], b)
    ]
    assert any(a > b for a, b, _, _ in got)  # the semantic is exercised
    for a, b, _, _ in got:
        assert (int(fp[a]), a) < (int(fp[b]), b)
    assert inverted  # some pair has id order opposite rank order


def test_tiny_and_degenerate_corpora(ray_session):
    from intertext_ray.ops.sorted_neighborhood import sorted_neighbor_dups

    one = pa.table({"doc_id": pa.array([0], pa.int64()), "text": ["hello"]})
    assert _run(one, window=4, max_hamming=8) == set()

    # all-equal fingerprints (every doc empty): C(n,2) window pairs capped by w
    n = 6
    allempty = pa.table(
        {"doc_id": pa.array(range(n), pa.int64()), "text": [""] * n}
    )
    got = _run(allempty, window=3, max_hamming=0)
    ref = _brute(allempty, window=3, max_hamming=0)
    assert got == ref and len(got) == sum(min(3, n - 1 - i) for i in range(n))

    with pytest.raises(ValueError):
        sorted_neighbor_dups(rd.from_arrow(one), window=16, block_size=8)
    with pytest.raises(ValueError):
        sorted_neighbor_dups(rd.from_arrow(one), window=0)


def test_window_one_adjacent_only(ray_session):
    tbl = _corpus(n=100, seed=3)
    got = _run(tbl, window=1, max_hamming=64, block_size=16)
    ref = _brute(tbl, window=1, max_hamming=64)
    assert got == ref
    assert all(g == 1 for _, _, g, _ in got)
    assert len(got) == 99  # every adjacent pair kept at max_hamming=64


def test_multi_ordering_matches_brute_force_and_boosts_recall(ray_session):
    from intertext_ray.ops.simhash import hamming64, simhash_batch
    from intertext_ray.ops.sorted_neighborhood import (
        _rotl,
        sorted_neighbor_dups_multi,
    )

    tbl = _corpus(n=250, seed=13)
    W, H, NO = 4, 8, 4
    fp = simhash_batch(tbl["text"])
    n = len(fp)
    ref = set()
    for r in range(NO):
        key = _rotl(fp, r * (64 // NO))
        order = np.lexsort((np.arange(n), key))
        d, f = np.arange(n)[order], fp[order]
        for g in range(1, W + 1):
            ham = hamming64(f[:-g], f[g:])
            for x, y, h in zip(d[:-g], d[g:], ham):
                if h <= H:
                    ref.add((min(int(x), int(y)), max(int(x), int(y)), int(h)))

    out = sorted_neighbor_dups_multi(
        rd.from_arrow(tbl).repartition(5),
        window=W,
        max_hamming=H,
        n_orderings=NO,
        block_size=64,
        num_buckets=8,
    )
    got = set()
    for b in out.iter_batches(batch_format="pyarrow"):
        got.update(
            zip(
                b["doc_a"].to_pylist(),
                b["doc_b"].to_pylist(),
                b["hamming"].to_pylist(),
            )
        )
    assert got == ref

    # recall boost: the union over 4 orderings finds pairs ordering 0 misses
    one = {
        (min(a, b), max(a, b), h)
        for a, b, _, h in _run(tbl, window=W, max_hamming=H)
    }
    assert one < got or one == got
    assert len(got) >= len(one)
