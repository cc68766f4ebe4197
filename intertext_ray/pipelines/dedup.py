"""The flagship pipeline: docs -> windows -> signatures -> hashbands ->
candidates -> matches -> components/clusters (reference ``process_texts``
lifecycle, ``/root/reference/intertext/intertext.py:179-228``, re-expressed
as a checkpointed chain of Ray Datasets — SURVEY.md §3.4).

Every stage is a streaming Dataset transform; the only driver-side
materializations are the (small) verified-pair graph for union-find and the
stage manifests.  ``work_dir`` checkpoints make each stage resumable and let
the windows table be consumed twice (minhash + verification) without
recomputation.
"""

from __future__ import annotations

import tempfile
from dataclasses import dataclass, field

import pyarrow as pa
import ray.data

from intertext_ray.config import IntertextConfig
from intertext_ray.stages.bands import hashbands_stage
from intertext_ray.stages.candidates import band_metrics, candidates_stage
from intertext_ray.stages.cluster import (
    banish_filter,
    components_distributed,
    components_from_matches,
    doc_clusters_from_components,
    pair_clusters_stage,
)
from intertext_ray.stages.minhash import signatures_stage
from intertext_ray.stages.verify import matches_stage
from intertext_ray.stages.windows import windows_stage
from intertext_ray.state.checkpoint import CheckpointStore


@dataclass
class DedupResult:
    windows: ray.data.Dataset
    matches: ray.data.Dataset
    components: pa.Table
    doc_clusters: pa.Table
    store: CheckpointStore
    pair_clusters: ray.data.Dataset | None = None
    metrics: dict = field(default_factory=dict)


def run_dedup(
    docs: ray.data.Dataset,
    cfg: IntertextConfig | None = None,
    work_dir: str | None = None,
    banished_doc_ids: set[int] | None = None,
    excluded_doc_ids: set[int] | None = None,
    num_buckets: int = 64,
    with_pair_clusters: bool = True,
    with_metrics: bool = False,
    checkpoints: bool = True,
    components: str = "auto",
) -> DedupResult:
    """docs: Dataset(doc_id uint64, text string).  Returns all stage handles.

    ``checkpoints=True``: every stage is written/resumed as Parquet under
    ``work_dir`` (the production posture: resumable, stage outputs
    inspectable).  ``checkpoints=False``: the whole chain runs as ONE
    streaming execution — windows pinned in the object store (used by both
    the minhash path and the verify join), everything else pipelined with
    backpressure; maximizes stage overlap for benchmarking/one-shot runs.
    """
    cfg = cfg or IntertextConfig()
    work_dir = work_dir or cfg.checkpoint_root or tempfile.mkdtemp(
        prefix="intertext_ray_"
    )
    store = CheckpointStore(work_dir, cfg.semantic_hash())
    metrics: dict = {}

    if checkpoints:
        windows = store.get_or_compute(
            "windows", lambda: windows_stage(docs, cfg), upstream=["docs"]
        )

        def build_hashbands():
            return hashbands_stage(signatures_stage(store.load("windows"), cfg), cfg)

        hashbands = store.get_or_compute(
            "hashbands", build_hashbands, upstream=["windows"]
        )
        if with_metrics:
            metrics["bands"] = band_metrics(hashbands, cap=cfg.band_docs_cap)

        candidates = store.get_or_compute(
            "candidates",
            lambda: candidates_stage(store.load("hashbands"), cfg, num_buckets),
            upstream=["hashbands"],
            # collision metrics ride the candidates manifest (north_rule:
            # rows in/out, candidate counts, collision rates per stage)
            metrics=metrics.get("bands"),
        )

        matches = store.get_or_compute(
            "matches",
            lambda: matches_stage(
                store.load("candidates"), store.load("windows"), cfg, num_buckets
            ),
            upstream=["candidates", "windows"],
        )
    else:
        windows = windows_stage(docs, cfg).materialize()
        hashbands = hashbands_stage(signatures_stage(windows, cfg), cfg)
        if with_metrics:
            hashbands = hashbands.materialize()
            metrics["bands"] = band_metrics(hashbands, cap=cfg.band_docs_cap)
        # pre_split=False: in one streaming chain the upstream stages already
        # emit enough blocks; the extra AllToAll barriers only cost overlap.
        # NOTE dedup stays ON: fusing the candidate dedup into the verify
        # join's pair co-group (candidates_stage(dedup=False)) was measured
        # BOTH ways — it saves one AllToAll but ships every duplicate into
        # the join, and near-identical windows collide in MANY of their 85
        # bands: residual duplication is 1.16x on the low-similarity
        # documents corpus but 9.0x on the clips corpus (104,445 vs 11,592
        # candidate rows at sf0.01), which cost ~2-3x headline wall time.
        # The early dedup removes ~89% of join traffic and wins.
        candidates = candidates_stage(hashbands, cfg, num_buckets, pre_split=False)
        matches = matches_stage(
            candidates, windows, cfg, num_buckets, pre_split=False
        ).materialize()

    if banished_doc_ids:
        if checkpoints:
            matches = store.get_or_compute(
                "matches_banished",
                lambda: banish_filter(store.load("matches"), banished_doc_ids, cfg),
                upstream=["matches"],
            )
        else:
            matches = banish_filter(matches, banished_doc_ids, cfg).materialize()

    # Components backend: the verified-pair graph is usually orders of
    # magnitude smaller than the corpus, so driver union-find is the fast
    # default — but past ``cfg.components_driver_max_pairs`` verified pairs
    # the label-propagation shuffle variant takes over WITHOUT a code
    # change (``components='auto'``; force with 'driver'/'distributed').
    # Both produce identical tables (component_id = min packed node key;
    # tested in tests/test_components_distributed.py).
    if components == "auto":
        n_matches = matches.count()
        use_distributed = n_matches > cfg.components_driver_max_pairs
    else:
        use_distributed = components == "distributed"
    if use_distributed:
        components_tbl = components_distributed(matches, num_buckets)
    else:
        components_tbl = components_from_matches(matches)
    doc_clusters = doc_clusters_from_components(components_tbl)

    pair_clusters = None
    if with_pair_clusters:
        pair_clusters = pair_clusters_stage(
            matches,
            cfg,
            windows if cfg.max_file_sim is not None else None,
            excluded_doc_ids,
            num_buckets,
        )

    return DedupResult(
        windows=windows,
        matches=matches,
        components=components_tbl,
        doc_clusters=doc_clusters,
        store=store,
        pair_clusters=pair_clusters,
        metrics=metrics,
    )
