"""Lineage / metrics report over a checkpointed run (north_rule: every
stage checkpoint-resumable with per-partition lineage and metrics, made
user-visible as tables instead of raw ``_MANIFEST.json`` files).

``stage_report``: one row per stage — rows out, partitions, wall seconds,
upstream lineage, config hash, flattened stage metrics (e.g. the candidate
stage's band-collision counters).

``partition_report``: one row per (stage, partition file) — the
per-partition lineage a resume or a skew investigation reads (which file,
how many rows).
"""

from __future__ import annotations

import json

import pyarrow as pa

from intertext_ray.state.checkpoint import CheckpointStore


def stage_report(store: CheckpointStore) -> pa.Table:
    rows = []
    for stage, man in store.all_manifests().items():
        rows.append(
            {
                "stage": stage,
                "rows": int(man.get("rows", 0)),
                "n_partitions": len(man.get("partitions", [])),
                "wall_s": float(man.get("wall_s", 0.0)),
                "complete": bool(man.get("complete", False)),
                "config_hash": man.get("config_hash", ""),
                "upstream": ",".join(man.get("upstream", [])),
                "metrics_json": json.dumps(
                    man.get("metrics") or {}, sort_keys=True
                ),
            }
        )
    if not rows:
        return pa.table(
            {
                "stage": pa.array([], pa.string()),
                "rows": pa.array([], pa.int64()),
                "n_partitions": pa.array([], pa.int64()),
                "wall_s": pa.array([], pa.float64()),
                "complete": pa.array([], pa.bool_()),
                "config_hash": pa.array([], pa.string()),
                "upstream": pa.array([], pa.string()),
                "metrics_json": pa.array([], pa.string()),
            }
        )
    return pa.Table.from_pylist(rows)


def partition_report(store: CheckpointStore) -> pa.Table:
    rows = []
    for stage, man in store.all_manifests().items():
        for part in man.get("partitions", []):
            rows.append(
                {
                    "stage": stage,
                    "file": part["file"],
                    "rows": int(part["rows"]),
                }
            )
    if not rows:
        return pa.table(
            {
                "stage": pa.array([], pa.string()),
                "file": pa.array([], pa.string()),
                "rows": pa.array([], pa.int64()),
            }
        )
    return pa.Table.from_pylist(rows)
