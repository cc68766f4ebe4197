"""Gram-novelty: brute-force parity + boundary semantics."""

import numpy as np
import pyarrow as pa

from intertext_ray.ops.novelty import gram_novelty


def _brute(texts, k=4):
    from intertext_ray.ops.text_stats import kgram_hashes

    per_doc = {}
    for d, t in enumerate(texts):
        tbl = pa.table(
            {"doc_id": pa.array([d], pa.int64()), "text": [t]}
        )
        fp, _ = kgram_hashes(tbl, "text", k)
        if len(fp):
            per_doc[d] = set(fp.tolist())
    first = {}
    for d in sorted(per_doc):
        for g in per_doc[d]:
            first.setdefault(g, d)
    out = {}
    for d, grams in per_doc.items():
        novel = sum(1 for g in grams if first[g] == d)
        out[d] = (
            len(grams),
            novel,
            int(np.floor(1000.0 * novel / len(grams))),
        )
    return out


def test_gram_novelty_matches_brute(ray_session):
    import ray.data

    rng = np.random.default_rng(17)
    vocab = [f"v{i}" for i in range(25)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(0, 50))))
        for _ in range(40)
    ]
    texts[5] = texts[2]  # exact dup: novelty 0
    texts[9] = " ".join(f"u{i}" for i in range(20))  # all-novel doc
    texts[11] = "a b"  # < k tokens: omitted
    want = _brute(texts)
    got_df = (
        gram_novelty(
            ray.data.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array(range(len(texts)), pa.int64()),
                        "text": texts,
                    }
                )
            ).repartition(7)
        )
        .to_pandas()
    )
    got = {
        int(r.doc_id): (int(r.n_grams), int(r.n_novel), int(r.novelty_x1000))
        for r in got_df.itertuples()
    }
    assert got == want
    assert got[5][1] == 0 and got[5][2] == 0  # exact dup wins nothing
    assert got[9][2] == 1000  # fully novel
    assert 11 not in got  # sub-k doc omitted (documented contract)


def test_audio_fp_novelty_matches_brute(ray_session):
    import ray.data

    from intertext_ray.fixtures.gen_audio import gen_audio_dup_corpus
    from intertext_ray.functions.audio import decode_clip
    from intertext_ray.functions.audio_fp import subfingerprints
    from intertext_ray.ops.novelty import audio_fp_novelty

    clips, truth = gen_audio_dup_corpus(40, seed=11)
    got_df = audio_fp_novelty(
        ray.data.from_arrow(clips), num_buckets=8
    ).to_pandas()
    got = {
        int(r.doc_id): (int(r.n_subfps), int(r.n_novel), int(r.novelty_x1000))
        for r in got_df.itertuples()
    }

    per_clip = {}
    for i in range(len(clips)):
        pcm = decode_clip(
            clips["bytes"][i].as_py(),
            clips["sr_hz"][i].as_py(),
            clips["codec"][i].as_py(),
        )
        fps = subfingerprints(pcm, clips["sr_hz"][i].as_py())
        if len(fps):
            per_clip[i] = set(int(v) for v in fps)
    first = {}
    for d in sorted(per_clip):
        for v in per_clip[d]:
            first.setdefault(v, d)
    want = {}
    for d, s in per_clip.items():
        novel = sum(1 for v in s if first[v] == d)
        want[d] = (
            len(s),
            novel,
            int(np.floor(1000.0 * novel / len(s))),
        )
    assert got == want

    # curation signal: planted dup members (non-leaders) score lower on
    # average than singletons
    cl = truth["cluster_id"].to_numpy()
    members = [i for i in range(len(cl)) if cl[i] >= 0 and cl[i] != i]
    singles = [i for i in range(len(cl)) if cl[i] < 0]
    if members and singles:
        m_avg = np.mean([got[i][2] for i in members if i in got])
        s_avg = np.mean([got[i][2] for i in singles if i in got])
        assert m_avg < s_avg
