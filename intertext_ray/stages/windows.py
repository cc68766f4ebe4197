"""Windowize stage — stateless ``map_batches`` task (reference N1+N2,
``/root/reference/intertext/intertext.py:1133-1158, 1180-1189``).

One input doc row -> ceil(max(0, W-13)/4) window rows.  ``window_id`` is
generated per-row inside the batch, so per-doc consecutiveness (needed by run
clustering) holds without any global ordering (SURVEY.md §2.9).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from intertext_ray.config import IntertextConfig
from intertext_ray.functions.text import extract_xml_text, windowize_texts


def make_windowizer(cfg: IntertextConfig):
    def windowize(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        if cfg.xml_base_tag or cfg.xml_remove_tags:
            texts = [
                extract_xml_text(t, cfg.xml_base_tag, cfg.xml_remove_tags)
                for t in texts
            ]
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        row_idx, win_id, out_texts = windowize_texts(
            texts, cfg.window_length, cfg.slide_length, cfg.strip_diacritics
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[row_idx], pa.uint64()),
                "window_id": pa.array(win_id, pa.int32()),
                "text": pa.array(out_texts, pa.string()),
            }
        )

    return windowize


def windows_stage(docs, cfg: IntertextConfig, batch_size: int = 1024):
    """docs Dataset(doc_id, text) -> windows Dataset(doc_id, window_id, text)."""
    return docs.map_batches(
        make_windowizer(cfg),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
