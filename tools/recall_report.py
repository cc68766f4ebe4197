"""Measured recall of the approximate embedding paths vs their exact
baselines, at TWO corpus layouts (VERDICT r2 #10):

- ``shuffled``: rows in hash order (the layout-neutral case)
- ``sorted``:   rows ordered by cluster/label — the by-source/by-time
  layout that breaks naive first-N sampling

Two corpora, because they answer different questions:

1. ``ann_topk_ivf`` recall@10 vs exact on the REAL testdata embeddings,
   swept over ``nprobe`` — the testdata vectors are near-uniform (max
   pairwise cos ~0.51 at sf0.01), the hardest case for cell pruning, so
   this shows the recall/cost knob honestly.
2. ``semantic_dedup`` / ``lsh_cosine_dup_pairs`` recall vs exact pairs on
   a PLANTED near-dup corpus (seeded clusters + jittered copies, the shape
   those ops exist for) — the testdata embeddings contain zero pairs above
   cos 0.6, which would make dup-recall vacuously 1.0.

Usage: python tools/recall_report.py [sf_dir]  (default /root/testdata/sf0.01)
Prints one JSON line; numbers recorded in COVERAGE.md.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ds_from(vec_ids: np.ndarray, vecs: np.ndarray):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(vec_ids, pa.int64()),
                "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float64())),
            }
        )
    ).repartition(8)


def _ivf_sweep(sf_dir: str) -> dict:
    import duckdb

    from intertext_ray.ops.embeddings import ann_topk, ann_topk_ivf

    df = duckdb.sql(
        f"SELECT vec_id, embedding, label FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    ).df()
    out: dict = {"n_vecs": len(df)}
    for layout, d in {
        "shuffled": df.sample(frac=1.0, random_state=5),
        "sorted": df.sort_values(["label", "vec_id"]),
    }.items():
        ds = _ds_from(
            d["vec_id"].to_numpy(),
            np.array([np.asarray(v) for v in d["embedding"]]),
        )
        n = len(d)
        qids = [int(d["vec_id"].iloc[i]) for i in range(0, n, max(1, n // 8))][:8]
        exact = ann_topk(ds, qids, k=10).to_pandas()
        sweep = {}
        for nprobe in (4, 6, 10, 16):
            approx = ann_topk_ivf(
                ds, qids, k=10, n_cells=16, nprobe=nprobe
            ).to_pandas()
            recalls = []
            for q in qids:
                e = set(exact[exact.query_id == q].vec_id)
                a = set(approx[approx.query_id == q].vec_id)
                recalls.append(len(e & a) / len(e))
            sweep[f"nprobe_{nprobe}"] = round(float(np.mean(recalls)), 4)
        out[layout] = sweep
    return out


def _planted_dup_recall() -> dict:
    """Planted near-dup corpus: 40 clusters x 25 vectors, every cluster's
    first 5 rows are jittered copies of each other (cos >> 0.95)."""
    from intertext_ray.ops.embeddings import (
        cosine_dup_pairs,
        lsh_cosine_dup_pairs,
        semantic_dedup,
    )

    rng = np.random.default_rng(17)
    n_clusters, per, dim = 40, 25, 32
    centers = rng.standard_normal((n_clusters, dim)) * 4.0
    vecs, labels = [], []
    for c in range(n_clusters):
        proto = centers[c] + rng.standard_normal(dim)
        for i in range(per):
            if i < 5:  # near-identical copies
                vecs.append(proto + rng.standard_normal(dim) * 1e-3)
            else:
                vecs.append(centers[c] + rng.standard_normal(dim))
            labels.append(c)
    vecs = np.array(vecs)
    ids = np.arange(len(vecs))
    order_sorted = np.argsort(labels, kind="stable")
    order_shuffled = rng.permutation(len(vecs))

    out: dict = {"n_vecs": len(vecs)}
    for layout, order in {
        "shuffled": order_shuffled,
        "sorted": order_sorted,
    }.items():
        ds = _ds_from(ids[order], vecs[order])
        epairs = cosine_dup_pairs(ds, threshold=0.95).to_pandas()
        ep = set(zip(epairs["a"], epairs["b"])) if len(epairs) else set()
        exact_dups = {b for _, b in ep}

        sem = semantic_dedup(ds, threshold=0.95, n_cells=n_clusters).to_pandas()
        dropped = set(sem[~sem.keep].vec_id)
        lsh = lsh_cosine_dup_pairs(
            ds, threshold=0.95, n_planes=8, n_tables=8
        ).to_pandas()
        lp = set(zip(lsh["a"], lsh["b"])) if len(lsh) else set()

        out[layout] = {
            "exact_dup_pairs": len(ep),
            "semdedup_recall": round(
                len(dropped & exact_dups) / len(exact_dups), 4
            ) if exact_dups else None,
            "semdedup_precision": round(
                len(dropped & exact_dups) / len(dropped), 4
            ) if dropped else None,
            "lsh_cosine_recall": round(len(ep & lp) / len(ep), 4) if ep else None,
        }
    return out


def _sorted_neighbor_recall(sf_dir: str) -> dict:
    """Sorted-neighborhood recall vs the EXACT radius pairs
    (``simhash_near_dups`` has guaranteed full recall at its radius):
    fraction of Hamming<=8 pairs whose ranks in (simhash, doc_id) order
    sit within the window, swept over window size.  Rank-locality is the
    op's documented trade-off — this measures it on the real testdata."""
    from intertext_ray.ops.simhash import simhash_near_dups
    from intertext_ray.ops.sorted_neighborhood import sorted_neighbor_dups
    from intertext_ray.sources.clips import read_documents

    exact = simhash_near_dups(read_documents(sf_dir), max_hamming=8).to_pandas()
    ep = set(zip(exact["doc_a"], exact["doc_b"]))
    out: dict = {"exact_pairs": len(ep)}
    for window in (4, 8, 16, 32):
        got = sorted_neighbor_dups(
            read_documents(sf_dir), window=window, max_hamming=8
        ).to_pandas()
        # canonicalize: engine emits (lower-rank, higher-rank); exact emits id order
        gp = {(min(a, b), max(a, b)) for a, b in zip(got["doc_a"], got["doc_b"])}
        out[f"window_{window}"] = (
            round(len(ep & gp) / len(ep), 4) if ep else None
        )
    # same comparison budget as window_16, spread over 4 rotated orderings
    from intertext_ray.ops.sorted_neighborhood import sorted_neighbor_dups_multi

    got = sorted_neighbor_dups_multi(
        read_documents(sf_dir), window=4, max_hamming=8, n_orderings=4
    ).to_pandas()
    gp = set(zip(got["doc_a"], got["doc_b"]))
    out["multi_4x_window_4"] = round(len(ep & gp) / len(ep), 4) if ep else None
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    from intertext_ray.logs import quiet_ray_data_noise

    quiet_ray_data_noise()
    DataContext.get_current().enable_progress_bars = False

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "ivf_recall_at_10_vs_nprobe_testdata": _ivf_sweep(sf_dir),
                "dup_recall_planted": _planted_dup_recall(),
                "sorted_neighbor_recall_vs_exact_radius": _sorted_neighbor_recall(
                    sf_dir
                ),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
