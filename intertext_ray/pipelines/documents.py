"""Adapters running the engine over the driver testdata ``documents`` table
(and synthesized clips corpora keyed to the same scale)."""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from intertext_ray.config import IntertextConfig
from intertext_ray.pipelines.dedup import DedupResult, run_dedup
from intertext_ray.sources.clips import read_documents


def dedup_documents(
    sf_dir: str,
    cfg: IntertextConfig | None = None,
    work_dir: str | None = None,
    num_buckets: int = 32,
    **kw,
) -> DedupResult:
    docs = read_documents(sf_dir)
    work_dir = work_dir or tempfile.mkdtemp(prefix="itx_docs_")
    return run_dedup(docs, cfg or IntertextConfig(), work_dir=work_dir,
                     num_buckets=num_buckets, **kw)


def clips_corpus_for_sf(sf_dir: str, with_audio: bool = True, mult: int = 1):
    """Deterministic synthetic clips table sized to the sf tier (FIXTURES.md
    scale points), cached under /tmp per (n, seed)."""
    import pyarrow.parquet as pq

    from intertext_ray.fixtures.gen_clips import write_corpus

    n_docs = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    n_clips = max(200, n_docs * mult)
    cache = f"/tmp/itx_clips_v4_n{n_clips}_s42_a{int(with_audio)}"
    if not os.path.exists(os.path.join(cache, "clips")):
        write_corpus(cache, n_clips, seed=42, with_audio=with_audio)
    return cache


def clips_table_path(cache: str) -> str:
    """Path of the clips table under a corpus cache dir (sharded dir)."""
    d = os.path.join(cache, "clips")
    return d if os.path.exists(d) else os.path.join(cache, "clips.parquet")


def docs_as_int64(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Cast every integer column (and list-of-integer column) to int64 so
    outputs compare cleanly against DuckDB BIGINT results (DuckDB has no
    uint64/int32 in its default pandas bridge)."""

    def cast(b: pa.Table) -> pa.Table:
        cols = {}
        for name in b.column_names:
            col = b[name]
            t = col.type
            if pa.types.is_integer(t) and t != pa.int64():
                col = pc.cast(col, pa.int64())
            elif (
                pa.types.is_list(t)
                and pa.types.is_integer(t.value_type)
                and t.value_type != pa.int64()
            ):
                col = pc.cast(col, pa.list_(pa.int64()))
            cols[name] = col
        return pa.table(cols)

    return ds.map_batches(cast, batch_format="pyarrow")
