"""Gram-novelty scoring — the dedup-aware curation metric: for each
document, the fraction of its distinct word k-grams whose FIRST corpus
occurrence (minimum ``doc_id``) is this document.  Near-duplicates and
boilerplate-heavy docs score near 0, fresh content near 1000; data-mixing
pipelines use the score to downweight redundant mass without hard
deletion (complements the hard-dedup family: MinHash/SimHash drop whole
docs, ExactSubstr/CDC cut spans, novelty RANKS what remains).

Scale shape: stage A is row-local (distinct (gram, doc, dsize) rows per
batch — per-batch distinct IS per-doc distinct because docs arrive
whole; ``dsize`` = the doc's distinct-gram count rides every row so no
second doc-keyed exchange is ever needed, the same trick as
``ngram_jaccard.gram_rows``).  Stage B is ONE bucketed groupby on
``gram % num_buckets``: each gram's rows land in one bucket, so the
per-run minimum doc is the global first occurrence; the winner row
yields a (doc, dsize, +1) partial folded by a doc-keyed aggregate whose
cardinality is docs-with-novel-grams, not gram-volume.

Kernel is expression-identical to the DuckDB twin
(``__ray_entry__.oracle_sql['gram_novelty']``): shared k-gram chain +
``floor(1000.0 * novel / distinct)`` in float64, the repo's standard
ratio idiom.  Docs with fewer than ``k`` tokens have no grams and are
omitted on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_U64 = np.uint64


def _distinct_rows(
    fp: np.ndarray, owner: np.ndarray, batch_docs: np.ndarray
) -> pa.Table:
    """Distinct (gram:uint64, doc_id, dsize) rows from per-item hash
    streams (``owner`` indexes ``batch_docs``)."""
    empty = pa.table(
        {
            "gram": pa.array([], pa.uint64()),
            "doc_id": pa.array([], pa.int64()),
            "dsize": pa.array([], pa.int64()),
        }
    )
    if len(fp) == 0:
        return empty
    key = np.stack([owner.astype(np.uint64), fp], axis=1)
    uniq = np.unique(key, axis=0)
    uown = uniq[:, 0].astype(np.int64)
    # distinct-gram count per doc, aligned to the unique rows
    head = np.ones(len(uown), dtype=bool)
    head[1:] = uown[1:] != uown[:-1]
    starts = np.nonzero(head)[0]
    lens = np.diff(np.concatenate([starts, [len(uown)]]))
    dsize = np.repeat(lens, lens)
    return pa.table(
        {
            "gram": pa.array(uniq[:, 1], pa.uint64()),
            "doc_id": pa.array(
                batch_docs[uown].astype(np.int64), pa.int64()
            ),
            "dsize": pa.array(dsize.astype(np.int64), pa.int64()),
        }
    )


def _gram_doc_rows(batch: pa.Table, text_col: str, k: int) -> pa.Table:
    """Distinct (gram:uint64, doc_id, dsize) rows per doc."""
    from intertext_ray.ops.text_stats import kgram_hashes

    fp, owner = kgram_hashes(batch, text_col, k)
    batch_docs = batch["doc_id"].to_numpy(zero_copy_only=False)
    return _distinct_rows(fp, owner, batch_docs)


def novelty_over_rows(
    rows: ray.data.Dataset, num_buckets: int = 32
) -> ray.data.Dataset:
    """(doc_id, n_grams, n_novel, novelty_x1000) from distinct
    (gram:uint64, doc_id, dsize) rows — the generic first-occurrence
    scorer behind :func:`gram_novelty` (word k-grams) and the audio
    subfingerprint face (``__ray_entry__._q_audio_novelty``)."""
    nb = _U64(num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        g = t["gram"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((g % nb).astype(np.int64))
        )

    def novel_partials(group: pa.Table) -> pa.Table:
        """Per-gram run minimum doc -> (doc_id, dsize, novel partial)."""
        g = group["gram"].to_numpy(zero_copy_only=False)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        sz = group["dsize"].to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "dsize": pa.array([], pa.int64()),
                "novel": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        order = np.lexsort((d, g))
        g, d, sz = g[order], d[order], sz[order]
        head = np.ones(len(g), dtype=bool)
        head[1:] = g[1:] != g[:-1]
        # run head = the gram's global first occurrence (all rows of a
        # gram share this bucket)
        wd, wsz = d[head], sz[head]
        order2 = np.argsort(wd, kind="stable")
        wd, wsz = wd[order2], wsz[order2]
        h2 = np.ones(len(wd), dtype=bool)
        h2[1:] = wd[1:] != wd[:-1]
        starts = np.nonzero(h2)[0]
        cnt = np.diff(np.concatenate([starts, [len(wd)]]))
        # zero partials: every doc with >=1 gram must surface even when
        # it wins nothing, so each bucket also emits its distinct
        # (doc, dsize) pairs with novel = 0 (folded by the Sum below)
        zorder = np.argsort(d, kind="stable")
        zd, zsz = d[zorder], sz[zorder]
        zhead = np.ones(len(zd), dtype=bool)
        zhead[1:] = zd[1:] != zd[:-1]
        out_d = np.concatenate([wd[starts], zd[zhead]])
        out_sz = np.concatenate([wsz[starts], zsz[zhead]])
        out_nv = np.concatenate(
            [cnt, np.zeros(int(zhead.sum()), np.int64)]
        )
        return pa.table(
            {
                "doc_id": pa.array(out_d.astype(np.int64), pa.int64()),
                "dsize": pa.array(out_sz.astype(np.int64), pa.int64()),
                "novel": pa.array(out_nv.astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Max, Sum

    partials = (
        rows.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(novel_partials, batch_format="pyarrow")
    )
    totals = partials.groupby("doc_id").aggregate(
        Max("dsize", alias_name="n_grams"),
        Sum("novel", alias_name="n_novel"),
    )

    def score(t: pa.Table) -> pa.Table:
        ng = t["n_grams"].to_numpy(zero_copy_only=False)
        nv = t["n_novel"].to_numpy(zero_copy_only=False)
        # float64 division + floor -- expression-identical to the twin
        nx = np.floor(1000.0 * nv / ng).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(
                    t["doc_id"].to_numpy(zero_copy_only=False).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
                "n_grams": pa.array(ng.astype(np.int64), pa.int64()),
                "n_novel": pa.array(nv.astype(np.int64), pa.int64()),
                "novelty_x1000": pa.array(nx, pa.int64()),
            }
        )

    return totals.map_batches(score, batch_format="pyarrow")


def gram_novelty(
    docs: ray.data.Dataset,
    text_col: str = "text",
    k: int = 4,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """(doc_id, n_grams, n_novel, novelty_x1000): per-doc distinct-gram
    count, count of grams first seen (min doc_id) in this doc, and
    ``floor(1000 * n_novel / n_grams)``."""
    rows = docs.map_batches(
        lambda b: _gram_doc_rows(b, text_col, k), batch_format="pyarrow"
    )
    return novelty_over_rows(rows, num_buckets)


def audio_fp_novelty(
    clips: ray.data.Dataset, num_buckets: int = 32
) -> ray.data.Dataset:
    """(doc_id, n_subfps, n_novel, novelty_x1000): the AUDIO novelty
    rank — fraction of a clip's distinct Haitsma–Kalker subfingerprints
    whose first corpus occurrence (min doc_id) is this clip.  Re-ingested
    and re-encoded copies score near 0 (their subfingerprints were seen
    first in the canonical clip), fresh recordings near 1000 — the wave-
    curation signal before the (more expensive) pairwise BER dedup runs.

    Shape: decode+FFT is the existing row-local fingerprint stage; the
    novelty fold is the same single bucketed exchange as
    :func:`gram_novelty` over (subfp, clip, dsize) rows.  No SQL twin
    (FFT), pinned by the brute-force parity test like the rest of the
    audio-payload family."""
    from intertext_ray.ops.audio_dedup import audio_fingerprints

    fps = audio_fingerprints(clips)

    def rows(batch: pa.Table) -> pa.Table:
        subl = batch["subfps"]
        if isinstance(subl, pa.ChunkedArray):
            subl = subl.combine_chunks()
        flat = subl.values.to_numpy(zero_copy_only=False).astype(np.uint64)
        offs = subl.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        owner = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
        batch_docs = (
            batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return _distinct_rows(flat, owner, batch_docs)

    out = novelty_over_rows(
        fps.map_batches(rows, batch_format="pyarrow"), num_buckets
    )
    return out.map_batches(
        lambda t: t.rename_columns(
            ["doc_id", "n_subfps", "n_novel", "novelty_x1000"]
        ),
        batch_format="pyarrow",
    )
