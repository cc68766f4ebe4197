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


def transcript_exact_dup_groups(
    clips: ray.data.Dataset,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """(clip_id, group_id, group_size) for every clip whose TRANSCRIPT is
    byte-identical to another's — the text-side exact rung over the clip
    table (group_id = lexicographically smallest member, the same keeper
    rule as `ops/audio_exact._group_summary`).

    Scale shape: slim (bucket, clip_id, transcript) rows through ONE
    bucketed groupby — the bucket key is crc32 of the transcript bytes
    (deterministic across workers, unlike salted ``hash()``), grouping
    inside the bucket compares the exact strings, so collisions cost
    nothing."""
    import zlib

    nb = int(num_buckets)

    def slim(b: pa.Table) -> pa.Table:
        texts = b["transcript"].to_pylist()
        bk = np.fromiter(
            (zlib.crc32(t.encode("utf-8")) % nb for t in texts),
            np.int64,
            len(texts),
        )
        return pa.table(
            {
                "bucket": pa.array(bk, pa.int64()),
                "clip_id": b["clip_id"],
                "transcript": b["transcript"],
            }
        )

    def groups(g: pa.Table) -> pa.Table:
        ids = np.asarray(g["clip_id"].to_pylist(), dtype=object)
        txt = np.asarray(g["transcript"].to_pylist(), dtype=object)
        empty = pa.table(
            {
                "clip_id": pa.array([], pa.string()),
                "group_id": pa.array([], pa.string()),
                "group_size": pa.array([], pa.int64()),
            }
        )
        n = len(ids)
        if n == 0:
            return empty
        order = np.lexsort((ids, txt))
        si, st = ids[order], txt[order]
        head = np.ones(n, bool)
        head[1:] = st[1:] != st[:-1]
        starts = np.nonzero(head)[0]
        counts = np.diff(np.concatenate([starts, [n]]))
        keep = counts >= 2
        if not keep.any():
            return empty
        starts, counts = starts[keep], counts[keep]
        member_idx = np.concatenate(
            [np.arange(s, s + c) for s, c in zip(starts, counts)]
        )
        return pa.table(
            {
                "clip_id": pa.array(list(si[member_idx]), pa.string()),
                "group_id": pa.array(
                    list(np.repeat(si[starts], counts)), pa.string()
                ),
                "group_size": pa.array(
                    np.repeat(counts, counts).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        clips.select_columns(["clip_id", "transcript"])
        .map_batches(slim, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(groups, batch_format="pyarrow")
    )


def joint_leakage_safe_split(
    clips: ray.data.Dataset,
    permille_train: int = 900,
    salt: int = 0,
    target_peak: int = 30000,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """(clip_id, split_key, split) — train/val split that leaks NEITHER
    modality across the boundary: clips are joined into JOINT components
    over the union of transcript-exact groups and gain-invariant
    audio-exact groups (a re-recording bridges through its shared
    transcript, a re-dub through its shared audio), and the whole
    component splits together, keyed by its lexicographically smallest
    member's numeric id.  The A+B composition of
    `audio_exact.audio_leakage_safe_split` — the strictest exact-tier
    no-leak guarantee the two engines can give jointly.

    Scale shape: both member tables are dup-proportional (≪ corpus); the
    bridge components run on the driver over those edges (vectorized
    min-label, same budget argument as `minhash_doc_clusters`' driver
    default — swap in `components_distributed` past its threshold); the
    split pass is row-local broadcast-searchsorted + splitmix, no
    corpus shuffle."""
    import ray

    from intertext_ray.ops.audio_exact import (
        _SQL_CODECS,
        audio_norm_exact_dup_groups,
    )
    from intertext_ray.sources.clips import doc_ids_for_clip_ids
    from intertext_ray.stages.cluster import _cc_min_label

    a = audio_norm_exact_dup_groups(
        clips, target_peak=target_peak, num_buckets=num_buckets,
        codecs=_SQL_CODECS,
    )
    t = transcript_exact_dup_groups(clips, num_buckets=num_buckets)
    mem: list[str] = []
    kee: list[str] = []
    for ds in (a, t):
        for b in ds.iter_batches(batch_format="pyarrow"):
            mem.extend(b["clip_id"].to_pylist())
            kee.extend(b["group_id"].to_pylist())

    if mem:
        nodes, inv = np.unique(
            np.asarray(mem + kee, dtype=object), return_inverse=True
        )
        label = _cc_min_label(
            inv[: len(mem)].astype(np.int64),
            inv[len(mem):].astype(np.int64),
            len(nodes),
        )
        # component label = lexicographically-min member (np.unique sorts
        # object strings with the same binary collation DuckDB's
        # min(VARCHAR) uses on ASCII ids)
        keeper = nodes[label]
        keys = doc_ids_for_clip_ids(
            pa.array(list(keeper), pa.string())
        ).astype(np.int64)
        lut_ref = ray.put((nodes, keys))
    else:
        lut_ref = ray.put(
            (np.empty(0, dtype=object), np.empty(0, np.int64))
        )
    from intertext_ray.functions.hashing import splitmix64

    s = np.uint64(salt)
    pt = int(permille_train)

    def fn(b: pa.Table) -> pa.Table:
        node_s, key_s = ray.get(lut_ref)
        ids = np.asarray(b["clip_id"].to_pylist(), dtype=object)
        key = doc_ids_for_clip_ids(b["clip_id"]).astype(np.int64)
        if len(node_s):
            pos = np.searchsorted(node_s, ids)
            safe = np.minimum(pos, len(node_s) - 1)
            hit = (pos < len(node_s)) & (node_s[safe] == ids)
            key[hit] = key_s[safe[hit]]
        h = splitmix64(key.astype(np.uint64) ^ s) % np.uint64(1000)
        split = np.where(h < pt, "train", "val")
        return pa.table(
            {
                "clip_id": b["clip_id"],
                "split_key": pa.array(key, pa.int64()),
                "split": pa.array(split.tolist(), pa.string()),
            }
        )

    return clips.select_columns(["clip_id"]).map_batches(
        fn, batch_format="pyarrow"
    )
