"""Per-stage checkpoint + lineage manifests (north_rule: every stage
checkpoint-resumable with per-partition lineage and metrics).

Replaces the reference's ad-hoc resume artifacts — per-file ``.npy`` minhash
cache (``/root/reference/intertext/intertext.py:376-390``), SQLite tables as
stage outputs, and the ``--update_metadata`` reformat path (``:189``) — with
the idiomatic batch-pipeline pattern: each stage writes partitioned Parquet
into ``<root>/<stage>/`` atomically (tmp dir + rename) together with a
``_MANIFEST.json`` recording the semantic config hash, row count, per-file
partition list and stage metrics.  A rerun with the same config hash skips
straight to ``read_parquet`` of the finished stage; a config change
invalidates exactly the stages whose semantics changed.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import ray.data

MANIFEST = "_MANIFEST.json"


class CheckpointStore:
    def __init__(self, root: str, config_hash: str):
        self.root = root
        self.config_hash = config_hash
        os.makedirs(root, exist_ok=True)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def manifest(self, stage: str) -> dict | None:
        path = os.path.join(self._dir(stage), MANIFEST)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def is_complete(self, stage: str) -> bool:
        m = self.manifest(stage)
        return bool(m and m.get("complete") and m.get("config_hash") == self.config_hash)

    def load(self, stage: str) -> ray.data.Dataset:
        return ray.data.read_parquet(self._dir(stage))

    def save(
        self,
        stage: str,
        ds: ray.data.Dataset,
        metrics: dict | None = None,
        upstream: list[str] | None = None,
    ) -> ray.data.Dataset:
        """Write ``ds`` as the stage checkpoint (atomic), record the
        manifest, and return a Dataset reading the checkpoint (so downstream
        stages consume the materialized artifact, not the lineage)."""
        final = self._dir(stage)
        tmp = final + f".tmp-{os.getpid()}"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        t0 = time.time()
        # write the new artifact FULLY before touching the previous good
        # checkpoint — a crash mid-write leaves the old one intact (resume
        # re-reads it instead of recomputing the stage)
        ds.write_parquet(tmp)
        os.makedirs(tmp, exist_ok=True)
        if not glob.glob(os.path.join(tmp, "*.parquet")):
            # an empty dataset writes no files; persist an empty file with
            # the schema so load()/read_parquet still round-trips
            import pyarrow as pa
            import pyarrow.parquet as _pq

            schema = ds.schema(fetch_if_missing=False)
            arrow_schema = getattr(schema, "base_schema", None) if schema else None
            if arrow_schema is None:
                arrow_schema = pa.schema([])
            _pq.write_table(
                arrow_schema.empty_table(), os.path.join(tmp, "empty_0.parquet")
            )
        parts = sorted(
            os.path.relpath(p, tmp) for p in glob.glob(os.path.join(tmp, "*.parquet"))
        )
        rows = 0
        import pyarrow.parquet as pq

        per_part = []
        for p in parts:
            n = pq.ParquetFile(os.path.join(tmp, p)).metadata.num_rows
            per_part.append({"file": p, "rows": n})
            rows += n
        man = {
            "stage": stage,
            "config_hash": self.config_hash,
            "complete": True,
            "rows": rows,
            "partitions": per_part,
            "upstream": upstream or [],
            "wall_s": round(time.time() - t0, 3),
            "metrics": metrics or {},
        }
        with open(os.path.join(tmp, MANIFEST), "w") as f:
            json.dump(man, f, indent=1)
        # atomic swap: old checkpoint survives until the new one is complete
        old = final + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(tmp, final)
        if os.path.exists(old):
            shutil.rmtree(old)
        return self.load(stage)

    def get_or_compute(
        self,
        stage: str,
        factory,
        metrics: dict | None = None,
        upstream: list[str] | None = None,
    ) -> ray.data.Dataset:
        if self.is_complete(stage):
            return self.load(stage)
        return self.save(stage, factory(), metrics=metrics, upstream=upstream)

    def stage_rows(self, stage: str) -> int | None:
        m = self.manifest(stage)
        return m["rows"] if m else None

    def all_manifests(self) -> dict[str, dict]:
        out = {}
        for d in sorted(glob.glob(os.path.join(self.root, "*"))):
            if os.path.isdir(d) and os.path.exists(os.path.join(d, MANIFEST)):
                with open(os.path.join(d, MANIFEST)) as f:
                    out[os.path.basename(d)] = json.load(f)
        return out
