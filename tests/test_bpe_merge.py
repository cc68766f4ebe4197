"""BPE merge-pair counts: scalar-reference parity (incl. multibyte chars),
tie-break determinism, partition invariance."""

from collections import Counter

import pyarrow as pa
import ray.data

from intertext_ray.ops.text_stats import bpe_merge_counts


def _ref_pairs(texts, top):
    c = Counter()
    for t in texts:
        for w in t.split():
            for i in range(len(w) - 1):
                c[w[i : i + 2]] += 1
    rows = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
    return [(p, n) for p, n in rows]


def _run(texts, top, override_num_blocks=None):
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )
    if override_num_blocks:
        ds = ds.repartition(override_num_blocks)
    out = bpe_merge_counts(ds, top=top).to_pandas()
    if out.empty:
        return []
    return list(zip(out["pair"], out["n_occ"]))


def test_scalar_parity_ascii(ray_session):
    texts = [
        "the cat sat on the mat",
        "the mats that cats pat",
        "a bb ccc dddd",
        "",
        "   ",
    ]
    assert _run(texts, 30) == _ref_pairs(texts, 30)


def test_multibyte_chars(ray_session):
    texts = ["héllo héllo naïve", "日本語 日本語 日本 café café café"]
    assert _run(texts, 20) == _ref_pairs(texts, 20)


def test_tiebreak_and_partition_invariance(ray_session):
    texts = ["ab cd ab cd ef", "gh ef gh ij"] * 7
    top = 3  # cuts inside a tie group: pair ASC must decide
    expect = _ref_pairs(texts, top)
    assert _run(texts, top) == expect
    assert _run(texts, top, override_num_blocks=5) == expect


def test_single_char_words_yield_nothing(ray_session):
    assert _run(["a b c", "x y"], 10) == []
