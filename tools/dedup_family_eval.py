"""Cross-family dedup evaluation on one planted-truth corpus.

Every dedup family answers a different question (exact bytes, token-set
overlap, bit-fingerprint radius, rank locality, substring cover), so a
user choosing one needs MEASURED sensitivity, not folklore.  This harness
plants near-dup pairs at three edit rates into one corpus and reports,
per family at its repo-default thresholds:

- recall per edit rate (how deep into "edited" a family still sees a dup)
- overall pair precision vs the planted truth (pairs found outside the
  truth are counted as spurious even if textually similar — conservative)

Corpus: 400 base docs from a 120-word vocabulary (seeded); 40 exact
copies; 40 near-dup copies at each of edit rates 5% / 15% / 30% (that
fraction of token positions re-drawn).  Truth = (base, copy) pairs.

Usage: python tools/dedup_family_eval.py   (prints one JSON line;
numbers recorded in COVERAGE.md)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EDIT_RATES = (0.05, 0.15, 0.30)
N_BASE, N_PER_RATE, N_EXACT = 400, 40, 40


def build_corpus(seed: int = 23):
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i}" for i in range(120)])
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(40, 90))))
        for _ in range(N_BASE)
    ]
    truth = {}  # (a, b) -> kind
    next_id = N_BASE
    for i in range(N_EXACT):
        texts.append(texts[i])
        truth[(i, next_id)] = "exact"
        next_id += 1
    base_i = N_EXACT
    for rate in EDIT_RATES:
        for j in range(N_PER_RATE):
            src = base_i + j
            toks = texts[src].split()
            n_edit = max(1, int(len(toks) * rate))
            pos = rng.choice(len(toks), size=n_edit, replace=False)
            for p in pos:
                toks[p] = str(rng.choice(vocab))
            texts.append(" ".join(toks))
            truth[(src, next_id)] = f"edit_{int(rate * 100)}"
            next_id += 1
        base_i += N_PER_RATE
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    return tbl, truth


def _canon(pairs) -> set:
    return {(min(a, b), max(a, b)) for a, b in pairs}


def evaluate(tbl: pa.Table, truth: dict) -> dict:
    import ray.data as rd

    ds = lambda: rd.from_arrow(tbl).repartition(8)  # noqa: E731
    kinds = ["exact"] + [f"edit_{int(r * 100)}" for r in EDIT_RATES]
    families = {}

    from intertext_ray.ops.exact_dedup import exact_dedup

    kept = set(exact_dedup(ds()).to_pandas().doc_id)
    by_text: dict = {}
    for i, t in enumerate(tbl["text"].to_pylist()):
        by_text.setdefault(t, []).append(i)
    pairs = set()
    for ids in by_text.values():
        if len(ids) > 1:
            keeper = min(ids)
            assert keeper in kept  # engine keeps the min-id copy
            for m in ids[1:]:
                assert m not in kept
                pairs.add((keeper, m))
    families["exact_dedup"] = pairs

    from intertext_ray.ops.minhash_doc import minhash_doc_dedup

    p = minhash_doc_dedup(ds()).to_pandas()
    families["minhash_doc (j>=0.5)"] = _canon(zip(p.doc_a, p.doc_b))

    from intertext_ray.ops.simhash import simhash_near_dups

    p = simhash_near_dups(ds(), max_hamming=8).to_pandas()
    families["simhash (h<=8)"] = _canon(zip(p.doc_a, p.doc_b))

    from intertext_ray.ops.sorted_neighborhood import sorted_neighbor_dups_multi

    p = sorted_neighbor_dups_multi(
        ds(), window=4, max_hamming=8, n_orderings=4
    ).to_pandas()
    families["sorted_neighbor (4x4, h<=8)"] = _canon(zip(p.doc_a, p.doc_b))

    from intertext_ray.ops.ngram_jaccard import ngram_jaccard_pairs

    p = ngram_jaccard_pairs(ds(), min_jaccard=0.5).to_pandas()
    families["ngram_jaccard (j>=0.5, default)"] = _canon(zip(p.doc_a, p.doc_b))
    # threshold-sensitivity row: on a small fixed vocabulary, char-4-grams
    # are shared by UNRELATED docs, so a loose threshold saturates —
    # reported deliberately as the cautionary operating point
    p = ngram_jaccard_pairs(ds(), min_jaccard=0.35).to_pandas()
    families["ngram_jaccard (j>=0.35, loose)"] = _canon(zip(p.doc_a, p.doc_b))

    from intertext_ray.ops.substring import substring_dup_pairs

    p = substring_dup_pairs(ds(), k=8, num_buckets=32).to_pandas()
    families["substring (k=8)"] = _canon(zip(p.doc_a, p.doc_b))

    from intertext_ray.ops.text_cosine import cosine_text_pairs

    p = cosine_text_pairs(ds(), min_cos2_x1e6=810_000).to_pandas()
    families["bow_cosine (cos>=0.9)"] = _canon(zip(p.doc_a, p.doc_b))

    from intertext_ray.ops.winnow import winnow_dup_pairs

    p = winnow_dup_pairs(ds(), min_shared=2).to_pandas()
    families["winnow (k=4, w=4, >=2 shared)"] = (
        _canon(zip(p.doc_a, p.doc_b)) if len(p) else set()
    )

    from intertext_ray.ops.cdc import cdc_dup_chunks

    # CDC answers "shared block", not "near-dup doc": derive doc pairs
    # from docs sharing >= 2 duplicated chunk hashes (same spirit as the
    # winnow threshold)
    from intertext_ray.ops.cdc import cdc_chunks

    ch = cdc_chunks(ds()).to_pandas()
    seen = {}
    for h, d in zip(ch.chunk_hash_hex, ch.doc_id):
        seen.setdefault(h, set()).add(int(d))
    from collections import Counter

    cnt = Counter()
    for h, dset in seen.items():
        dl = sorted(dset)
        for i in range(len(dl)):
            for j in range(i + 1, len(dl)):
                cnt[(dl[i], dl[j])] += 1
    families["cdc_chunks (>=2 shared)"] = {
        p for p, c in cnt.items() if c >= 2
    }

    tset = set(truth)
    by_kind = {k: {pr for pr, kd in truth.items() if kd == k} for k in kinds}
    out = {}
    for name, got in families.items():
        row = {
            k: (round(len(got & by_kind[k]) / len(by_kind[k]), 3))
            for k in kinds
        }
        tp = len(got & tset)
        row["precision"] = round(tp / len(got), 3) if got else None
        row["spurious_pairs"] = len(got) - tp
        out[name] = row
    return out


def evaluate_audio(seed: int = 9) -> dict:
    """Audio-family sensitivity on the planted gen_audio corpus: recall
    vs planted cluster pairs + pair precision, per family at repo
    defaults.  (audio_exact requires BIT-identical decoded PCM, so on a
    perturbed-dup corpus its recall is honestly ~0 — reported as the
    cautionary row; the fingerprint families are the perturbation-robust
    operating points.)"""
    import ray.data as rd

    from intertext_ray.fixtures.gen_audio import gen_audio_dup_corpus
    from intertext_ray.ops.audio_dedup import audio_dup_pairs
    from intertext_ray.ops.audio_exact import audio_exact_dup_groups
    from intertext_ray.ops.audio_spans import audio_common_spans

    clips, truth = gen_audio_dup_corpus(120, seed=seed)
    from intertext_ray.sources.clips import doc_ids_for_clip_ids

    doc = doc_ids_for_clip_ids(clips["clip_id"])
    cl = truth["cluster_id"].to_numpy()
    by_cluster: dict = {}
    for i, c in enumerate(cl):
        if int(c) >= 0:  # -1 = background singleton
            by_cluster.setdefault(int(c), []).append(int(doc[i]))
    tset = set()
    for ids in by_cluster.values():
        ids = sorted(ids)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                tset.add((ids[x], ids[y]))

    ds = lambda: rd.from_arrow(clips)  # noqa: E731
    fams = {}
    p = audio_dup_pairs(ds(), num_buckets=8).to_pandas()
    fams["audio_fp (ber<=0.25)"] = _canon(zip(p.clip_a, p.clip_b))
    p = audio_common_spans(ds(), num_buckets=8).to_pandas()
    fams["audio_spans (win-ber<=0.2)"] = (
        _canon(zip(p.clip_a, p.clip_b)) if len(p) else set()
    )
    g = audio_exact_dup_groups(ds()).to_pandas()
    pairs = set()
    if len(g):
        g["doc"] = [
            int(d) for d in doc_ids_for_clip_ids(pa.array(g["clip_id"]))
        ]
        for _, grp in g.groupby("group_id"):
            ids = sorted(grp["doc"])
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    pairs.add((ids[x], ids[y]))
    fams["audio_exact (bit-identical)"] = pairs

    def closure(pairs: set) -> set:
        par: dict = {}

        def find(x):
            while par.setdefault(x, x) != x:
                par[x] = par[par[x]]
                x = par[x]
            return x

        for a, b in pairs:
            par[find(a)] = find(b)
        comp: dict = {}
        for x in par:
            comp.setdefault(find(x), []).append(x)
        out = set()
        for ids in comp.values():
            ids = sorted(ids)
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    out.add((ids[x], ids[y]))
        return out

    out = {}
    for name, got in fams.items():
        tp = len(got & tset)
        tclo = closure(got)
        out[name] = {
            "recall": round(tp / len(tset), 3) if tset else None,
            "recall_transitive": (
                round(len(tclo & tset) / len(tset), 3) if tset else None
            ),
            "precision": round(tp / len(got), 3) if got else None,
            "spurious_pairs": len(got) - tp,
        }
    out["n_truth_pairs"] = len(tset)
    return out


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    from intertext_ray.logs import quiet_ray_data_noise

    quiet_ray_data_noise()
    DataContext.get_current().enable_progress_bars = False
    if "--audio" in sys.argv:
        print(json.dumps({"audio_families": evaluate_audio()}))
        return
    tbl, truth = build_corpus()
    print(
        json.dumps(
            {
                "n_docs": tbl.num_rows,
                "n_truth_pairs": len(truth),
                "families": evaluate(tbl, truth),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
