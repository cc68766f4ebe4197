"""Sources: the clips table (Lance-first, Parquet fallback) and the
documents-table adapter.

Replaces the reference's sorted-glob + file-reader front end
(``/root/reference/intertext/intertext.py:231-274, 1133-1163``): the corpus
is a table scan, ``clip_id`` replaces the path, and a fixed-width ``doc_id``
(uint64) replaces the file-list index as the shuffle key.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from intertext_ray.functions.hashing import splitmix64

_CLIP_NUM = re.compile(r"^[A-Za-z_]*?_?(\d+)$")


def read_clips(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read the clips table.  Prefers Lance (the north_rule input format) when
    the reader is available in this environment, else Parquet with the same
    schema.  ``columns`` prunes at the read."""
    if path.endswith(".lance"):
        try:
            return ray.data.read_lance(path, columns=columns)
        except (AttributeError, ImportError):
            raise ImportError(
                "lance reader unavailable in this environment; "
                "supply a parquet mirror of the clips table"
            )
    return ray.data.read_parquet(path, columns=columns)


def read_table(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """``read_parquet`` with the file's schema metadata stripped.

    Tables written through pandas embed a ``pandas`` JSON blob in the Arrow
    schema metadata; such schemas are unhashable (``hash(schema)`` raises
    ``unhashable type: 'dict'``), which trips a noisy-but-harmless Ray
    warning in plan-time schema unification (``transform_pyarrow.
    unify_schemas``'s set-dedup fast path).  Passing the metadata-free
    schema keeps plan inference quiet; column pruning still happens at the
    read."""
    import pyarrow.parquet as pq

    try:
        clean = pq.read_schema(path).remove_metadata()
    except (OSError, pa.ArrowInvalid):  # directory / glob input: leave as-is
        return ray.data.read_parquet(path, columns=columns)
    if columns is not None:  # Ray validates blocks against the PROJECTED schema
        clean = pa.schema([clean.field(c) for c in columns])
    return ray.data.read_parquet(path, schema=clean, columns=columns)


def doc_ids_for_clip_ids(clip_ids: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Deterministic uint64 doc_id per clip_id, computed row-locally (no
    global sort/shuffle — SURVEY.md §2.9 'ordering').

    ``clip_NNNN``-style ids parse to their integer (dense, stable, matching
    the reference's sorted-glob index because the fixture generator emits ids
    already in sorted order); anything else falls back to splitmix64 of the
    utf-8 bytes (collision odds ~n²/2⁶⁵ — negligible below ~10⁹ docs; for
    10¹²-clip corpora switch to the 128-bit variant or a dictionary pass).

    NOTE: the components/cluster stages use packed (doc<<32|win) node keys
    and REJECT doc_id >= 2^32 with a loud error (``stages/cluster.py``) —
    the splitmix64 fallback produces full-64-bit ids, so corpora with
    non-numeric clip ids must be renumbered densely (one sort/dictionary
    pass at ingestion) before clustering; see SCALING.md §ids.
    """
    if isinstance(clip_ids, pa.ChunkedArray):
        clip_ids = clip_ids.combine_chunks()
    vals = clip_ids.to_pylist()
    out = np.empty(len(vals), dtype=np.uint64)
    for i, s in enumerate(vals):
        m = _CLIP_NUM.match(s)
        if m:
            out[i] = np.uint64(int(m.group(1)))
        else:
            h = np.uint64(0x243F6A8885A308D3)
            for b in s.encode("utf-8"):
                h = splitmix64(h ^ np.uint64(b))
            out[i] = h
    return out


def clips_to_docs(batch: pa.Table) -> pa.Table:
    """clips batch -> (doc_id, clip_id, text) rows for the windowizer."""
    doc_id = doc_ids_for_clip_ids(batch["clip_id"])
    return pa.table(
        {
            "doc_id": pa.array(doc_id, pa.uint64()),
            "clip_id": batch["clip_id"],
            "text": batch["transcript"],
        }
    )


def read_documents(sf_dir: str) -> ray.data.Dataset:
    """Adapter: the driver testdata ``documents`` table -> (doc_id, text)."""
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_docs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.uint64()),
                "text": batch["text"],
            }
        )

    return ds.map_batches(to_docs, batch_format="pyarrow")
