"""Joint transcript+audio duplicate classification — the two dedup engines
of this repo composed over the same clip table (the A+B payoff: the text
chain reimplements the reference's matcher, the audio chain fingerprints
the payload; their agreement is what a curation pipeline acts on).

Per clip: which transcript dup cluster it belongs to (reference MinHash →
LSH → difflib chain, `pipelines/dedup.py`), which audio dup cluster
(`ops/audio_dedup.py`), and the joint class:

  - ``both``       — same audio AND same words: a true re-upload, drop it;
  - ``text_only``  — same words, different audio: a legitimate re-recording
                     (keep; valuable augmentation);
  - ``audio_only`` — same audio, different words: re-dub or transcription
                     error (keep one, flag for QA);
  - ``unique``     — neither.

The classification join is the 3-way bucketed co-group idiom used
throughout the repo: all-clips rows + text-cluster rows + audio-cluster
rows hash-bucketed by doc_id, one shuffle, vectorized pivot per bucket —
both cluster tables are dup-members-only (≪ corpus) and the clip side is a
slim id projection, so nothing driver-side scales with the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.config import IntertextConfig
from intertext_ray.functions.hashing import splitmix64

_U64 = np.uint64

_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.uint64()),
        ("text_cluster_id", pa.int64()),
        ("audio_cluster_id", pa.int64()),
        ("dup_class", pa.string()),
    ]
)


def classify_joint_dups(
    clips: ray.data.Dataset,
    text_clusters: pa.Table,
    audio_clusters: pa.Table,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """(doc_id, text_cluster_id, audio_cluster_id, dup_class) for EVERY
    clip; cluster ids are -1 for clips not in that modality's dup set.

    ``text_clusters``: (doc_id, dup_cluster_id) from `run_dedup`;
    ``audio_clusters``: (clip_id, audio_cluster_id) from
    `audio_dup_clusters` — both driver-small dup-members-only tables; the
    corpus-scale side (all clips) stays a streaming Dataset."""
    from intertext_ray.sources.clips import doc_ids_for_clip_ids

    nb = _U64(num_buckets)

    def tag_clips(t: pa.Table) -> pa.Table:
        doc = doc_ids_for_clip_ids(t["clip_id"])
        return pa.table(
            {
                "bucket": pa.array(
                    (splitmix64(doc) % nb).astype(np.int64), pa.int64()
                ),
                "kind": pa.array(np.zeros(len(t), np.int8), pa.int8()),
                "doc": pa.array(doc, pa.uint64()),
                "cluster": pa.array(np.full(len(t), -1, np.int64), pa.int64()),
            }
        )

    def tag_text(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(_U64)
        cl = t["dup_cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(
                    (splitmix64(doc) % nb).astype(np.int64), pa.int64()
                ),
                "kind": pa.array(np.ones(len(t), np.int8), pa.int8()),
                "doc": pa.array(doc, pa.uint64()),
                "cluster": pa.array(cl, pa.int64()),
            }
        )

    text_tagged = tag_text(text_clusters)
    audio_tagged = tag_text(
        pa.table(
            {
                "doc_id": audio_clusters["clip_id"],
                "dup_cluster_id": pa.array(
                    audio_clusters["audio_cluster_id"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    pa.int64(),
                ),
            }
        )
    ).set_column(1, "kind", pa.array([np.int8(2)] * len(audio_clusters), pa.int8()))

    def pivot(g: pa.Table) -> pa.Table:
        kind = g["kind"].to_numpy(zero_copy_only=False)
        doc = g["doc"].to_numpy(zero_copy_only=False)
        cl = g["cluster"].to_numpy(zero_copy_only=False)
        base = doc[kind == 0]
        if len(base) == 0:
            return _OUT_SCHEMA.empty_table()
        order = np.argsort(base, kind="stable")
        base = base[order]
        tcl = np.full(len(base), -1, np.int64)
        acl = np.full(len(base), -1, np.int64)
        for kv, out in ((1, tcl), (2, acl)):
            m = kind == kv
            pos = np.searchsorted(base, doc[m])
            ok = (pos < len(base)) & (base[np.minimum(pos, len(base) - 1)] == doc[m])
            out[pos[ok]] = cl[m][ok]
        cls = np.where(
            (tcl >= 0) & (acl >= 0),
            "both",
            np.where(
                tcl >= 0, "text_only", np.where(acl >= 0, "audio_only", "unique")
            ),
        )
        return pa.table(
            {
                "doc_id": pa.array(base, pa.uint64()),
                "text_cluster_id": pa.array(tcl, pa.int64()),
                "audio_cluster_id": pa.array(acl, pa.int64()),
                "dup_class": pa.array(cls.tolist(), pa.string()),
            },
            schema=_OUT_SCHEMA,
        )

    tagged = (
        clips.select_columns(["clip_id"])
        .map_batches(tag_clips, batch_format="pyarrow", zero_copy_batch=True)
        .union(ray.data.from_arrow(text_tagged))
        .union(ray.data.from_arrow(audio_tagged))
    )
    return tagged.groupby("bucket").map_groups(pivot, batch_format="pyarrow")


def joint_dup_report(
    clips: ray.data.Dataset,
    cfg: IntertextConfig | None = None,
    num_buckets: int = 32,
    work_dir: str | None = None,
) -> ray.data.Dataset:
    """Full two-modality chain over a clips table: transcript dedup
    (reference semantics) + audio-fingerprint dedup + joint classification."""
    import tempfile

    from intertext_ray.ops.audio_dedup import (
        audio_dup_clusters,
        audio_dup_pairs,
    )
    from intertext_ray.pipelines.dedup import run_dedup
    from intertext_ray.sources.clips import clips_to_docs

    cfg = cfg or IntertextConfig()
    docs = clips.map_batches(
        clips_to_docs, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["doc_id", "text"])
    res = run_dedup(
        docs,
        cfg,
        work_dir=work_dir or tempfile.mkdtemp(prefix="itx_joint_"),
        num_buckets=num_buckets,
        with_pair_clusters=False,
        checkpoints=bool(work_dir),
    )
    apairs = audio_dup_pairs(clips, num_buckets=num_buckets)
    aclusters = audio_dup_clusters(apairs)
    return classify_joint_dups(
        clips, res.doc_clusters, aclusters, num_buckets=num_buckets
    )
