"""Normalization-folded exact dedup: fold contract vs a Python re
reference, group accounting, survivors, partition invariance."""

import re

import numpy as np
import pyarrow as pa
import ray.data as rd


def _py_norm(t: str) -> str:
    return re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()


def _docs_ds(ids, texts, blocks=4):
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    return rd.from_arrow(t).repartition(blocks)


CORPUS = [
    (1, "Hello, World!"),
    (2, "hello world"),  # same fold as 1, different raw
    (3, "HELLO   world"),  # same fold, third raw variant
    (4, "hello world"),  # exact duplicate of 2 (same raw)
    (5, "a unique document"),
    (6, "Another one; entirely."),
    (7, "another ONE -- entirely"),  # folds with 6
    (8, ""),  # empty
    (9, "!!!"),  # folds to empty -> groups with 8
    (10, "tab\tand\nnewline mix"),
    (11, "tab and newline MIX?"),  # folds with 10
]


def test_normalize_matches_re_reference():
    from intertext_ray.ops.norm_dedup import normalize_text

    texts = [t for _, t in CORPUS] + ["Ünïcode słowa", "x  y", " lead trail "]
    got = normalize_text(pa.array(texts, pa.string())).to_pylist()
    assert got == [_py_norm(t) for t in texts]


def test_groups_and_variants(ray_session):
    from intertext_ray.ops.norm_dedup import norm_dedup_groups

    ids = [i for i, _ in CORPUS]
    texts = [t for _, t in CORPUS]
    got = (
        norm_dedup_groups(_docs_ds(ids, texts), num_buckets=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # groups: {1,2,3,4} canon 1 (3 raw variants), {6,7} canon 6,
    # {8,9} canon 8 (fold to ''), {10,11} canon 10
    assert got["doc_id"].tolist() == [1, 6, 8, 10]
    assert got["n_members"].tolist() == [4, 2, 2, 2]
    assert got["n_variants"].tolist() == [3, 2, 2, 2]
    assert got["n_chars_norm"].tolist() == [
        len(_py_norm("Hello, World!")),
        len(_py_norm("Another one; entirely.")),
        0,
        len(_py_norm("tab\tand\nnewline mix")),
    ]


def test_survivors_keep_min_id_and_raw_text(ray_session):
    from intertext_ray.ops.norm_dedup import norm_dedup

    ids = [i for i, _ in CORPUS]
    texts = [t for _, t in CORPUS]
    surv = (
        norm_dedup(_docs_ds(ids, texts), num_buckets=8)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert surv["doc_id"].tolist() == [1, 5, 6, 8, 10]
    # the keeper's RAW text is preserved, not the folded form
    assert surv.set_index("doc_id").loc[1, "text"] == "Hello, World!"


def test_partition_invariance(ray_session):
    from intertext_ray.ops.norm_dedup import norm_dedup_groups

    ids = [i for i, _ in CORPUS]
    texts = [t for _, t in CORPUS]
    frames = [
        norm_dedup_groups(_docs_ds(ids, texts, blocks=b), num_buckets=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        for b in (1, 7)
    ]
    assert frames[0].equals(frames[1])


def test_no_false_groups(ray_session):
    from intertext_ray.ops.norm_dedup import norm_dedup_groups

    ids = list(range(20))
    texts = [f"distinct text number {i}" for i in ids]
    assert (
        norm_dedup_groups(_docs_ds(ids, texts), num_buckets=8).count() == 0
    )
