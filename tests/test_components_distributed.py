"""Distributed min-label-propagation components == driver union-find."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from intertext_ray.stages.cluster import (
    components_distributed,
    components_from_matches,
)


def _matches_ds(pairs):
    da, db, wa, wb = zip(*pairs)
    return rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array(da, pa.uint64()),
                "doc_b": pa.array(db, pa.uint64()),
                "win_a": pa.array(wa, pa.int32()),
                "win_b": pa.array(wb, pa.int32()),
                "similarity": pa.array([90] * len(pairs), pa.int32()),
            }
        )
    )


def _canon(tbl: pa.Table):
    df = tbl.to_pandas()
    comp = {}
    for r in df.itertuples():
        comp.setdefault(int(r.component_id), set()).add(
            (int(r.doc_id), int(r.window_id))
        )
    return sorted(map(sorted, comp.values()))


def test_chain_and_clusters(ray_session):
    # a long chain (worst case for propagation) + a separate triangle
    chain = [(i, i + 1, 0, 0) for i in range(0, 12)]
    tri = [(100, 101, 3, 4), (101, 102, 4, 5), (100, 102, 3, 5)]
    ds = _matches_ds(chain + tri)
    a = _canon(components_from_matches(ds))
    b = _canon(components_distributed(ds, num_buckets=4))
    assert a == b
    assert len(a) == 2


def test_matches_corpus(ray_session, small_corpus, oracle_result):
    from intertext_ray.config import IntertextConfig
    from intertext_ray.sources.clips import clips_to_docs
    from intertext_ray.stages.bands import hashbands_stage
    from intertext_ray.stages.candidates import candidates_stage
    from intertext_ray.stages.minhash import signatures_stage
    from intertext_ray.stages.verify import matches_stage
    from intertext_ray.stages.windows import windows_stage

    clips, _, _ = small_corpus
    cfg = IntertextConfig()
    docs = rd.from_arrow(clips_to_docs(clips).select(["doc_id", "text"]))
    w = windows_stage(docs, cfg).materialize()
    m = (
        matches_stage(
            candidates_stage(hashbands_stage(signatures_stage(w, cfg), cfg), cfg, 8),
            w,
            cfg,
            8,
        )
        .limit(100)  # per-round Ray overhead dominates at test scale; the
        .materialize()  # chain test covers the long-diameter case
    )
    a = _canon(components_from_matches(m))
    b = _canon(components_distributed(m, num_buckets=4))
    assert a == b


def test_run_dedup_auto_threshold(ray_session, small_corpus, tmp_path):
    """components='auto' switches to the distributed backend past the
    pair-count threshold and produces identical clusters to the driver
    union-find — the 100x path needs no code change."""
    from intertext_ray.config import IntertextConfig
    from intertext_ray.pipelines.dedup import run_dedup
    from intertext_ray.sources.clips import clips_to_docs

    clips, _, _ = small_corpus
    docs = rd.from_arrow(clips_to_docs(clips).select(["doc_id", "text"]))
    # threshold=0 forces every match over it -> distributed backend
    cfg_dist = IntertextConfig(components_driver_max_pairs=0)
    res_dist = run_dedup(
        docs, cfg_dist, work_dir=str(tmp_path / "w1"), num_buckets=8,
        with_pair_clusters=False,
    )
    cfg_drv = IntertextConfig()
    res_drv = run_dedup(
        docs, cfg_drv, work_dir=str(tmp_path / "w2"), num_buckets=8,
        with_pair_clusters=False, components="driver",
    )
    assert _canon(res_dist.components) == _canon(res_drv.components)
    dc_a = sorted(
        zip(
            res_dist.doc_clusters["doc_id"].to_pylist(),
            res_dist.doc_clusters["dup_cluster_id"].to_pylist(),
        )
    )
    dc_b = sorted(
        zip(
            res_drv.doc_clusters["doc_id"].to_pylist(),
            res_drv.doc_clusters["dup_cluster_id"].to_pylist(),
        )
    )
    assert dc_a == dc_b
