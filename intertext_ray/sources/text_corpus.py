"""Text-corpus source formats beyond Parquet/Lance: JSONL, CSV, and a
directory of plain-text files (the reference's actual ingestion surface —
sorted-glob ``.txt`` corpus, ``/root/reference/intertext/intertext.py:
231-274``).

All three adapt to the same (doc_id uint64, text string) table the rest of
the engine consumes; ``doc_id`` assignment reuses the clip-id rule
(trailing integer when present, splitmix64 of the utf-8 name otherwise —
``sources/clips.doc_ids_for_clip_ids``), so ids are row-local and
deterministic with no global sort.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data

from intertext_ray.sources.clips import doc_ids_for_clip_ids


def _with_doc_ids(batch: pa.Table, id_field: str, text_field: str) -> pa.Table:
    ids = batch[id_field]
    if not pa.types.is_string(ids.type):
        import pyarrow.compute as pc

        ids = pc.cast(ids, pa.string())
    return pa.table(
        {
            "doc_id": pa.array(doc_ids_for_clip_ids(ids), pa.uint64()),
            "text": batch[text_field],
        }
    )


def read_documents_jsonl(
    path: str, id_field: str = "doc_id", text_field: str = "text"
) -> ray.data.Dataset:
    """JSONL corpus (one JSON object per line — the common web-corpus
    interchange format) -> (doc_id, text)."""
    ds = ray.data.read_json(path)
    return ds.map_batches(
        lambda b: _with_doc_ids(b, id_field, text_field), batch_format="pyarrow"
    )


def read_documents_csv(
    path: str, id_field: str = "doc_id", text_field: str = "text"
) -> ray.data.Dataset:
    """CSV corpus -> (doc_id, text)."""
    ds = ray.data.read_csv(path)
    return ds.map_batches(
        lambda b: _with_doc_ids(b, id_field, text_field), batch_format="pyarrow"
    )


def read_text_dir(path: str) -> ray.data.Dataset:
    """Directory of plain-text files, one document per file (the
    reference's sorted-glob corpus shape) -> (doc_id, text).  doc_id
    derives from the FILE NAME (trailing integer / splitmix64 fallback),
    not from a globally sorted index — row-local, shuffle-free, and stable
    under re-sharding (SCALING.md §ids)."""
    ds = ray.data.read_binary_files(path, include_paths=True)

    def to_docs(batch: pa.Table) -> pa.Table:
        names = pa.array(
            [
                os.path.splitext(os.path.basename(p))[0]
                for p in batch["path"].to_pylist()
            ],
            pa.string(),
        )
        texts = pa.array(
            [b.decode("utf-8", "replace") for b in batch["bytes"].to_pylist()],
            pa.string(),
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids_for_clip_ids(names), pa.uint64()),
                "text": texts,
            }
        )

    return ds.map_batches(to_docs, batch_format="pyarrow")
