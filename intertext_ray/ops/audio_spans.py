"""Shared-audio-span detection — the ExactSubstr / ``duplicate_spans``
analogue for the AUDIO payload: find clip pairs that share only a
SEGMENT (a jingle, an intro bed, an ad read) even though their global
fingerprint BER is ~0.5, and report the aligned span boundaries.

Why the whole-clip chain can't see these: ``audio_dup_pairs`` scores one
global BER per alignment, so a 2-second shared intro inside two
otherwise-unrelated 30-second clips averages out to noise.  Here the
verification statistic is the WINDOWED BER (``functions/audio_fp.
matching_spans``): maximal runs where every length-``win`` window stays
under ``max_ber``.

Physical plan — identical exchange shape to the whole-clip chain (the
same shingle-LSH candidate generation and the same bucketed two-phase
fingerprint join, reused directly), only the per-pair scoring kernel
differs; candidates run with ``max_offset=None`` because a shared
segment can sit at ANY relative position.  Output rows are
span-proportional.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.functions.audio_fp import matching_spans
from intertext_ray.functions.hashing import splitmix64
from intertext_ray.ops.audio_dedup import (
    _join_helpers,
    audio_candidates,
    audio_fingerprints,
)
from intertext_ray.sources.clips import doc_ids_for_clip_ids

_U64 = np.uint64

_SPAN_SCHEMA = pa.schema(
    [
        ("clip_a", pa.uint64()),
        ("clip_b", pa.uint64()),
        ("a_start", pa.int64()),
        ("b_start", pa.int64()),
        ("n_frames", pa.int64()),
        ("ber", pa.float64()),
    ]
)


def verify_audio_spans(
    candidates: ray.data.Dataset,
    fps: ray.data.Dataset,
    win: int = 8,
    max_ber: float = 0.2,
    min_len: int = 12,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Candidate (clip_a, clip_b, offset) alignments -> maximal matching
    spans.  Same two-phase bucketed join as ``verify_audio_pairs``;
    per pair-group the spans from all candidate offsets are pooled and
    exact duplicates dropped (near-identical alignments from probing can
    re-derive the same span)."""
    nb = _U64(num_buckets)
    tag_fps, tag_requests, resolve, pair_bucket = _join_helpers(nb)

    def score(gtab: pa.Table) -> pa.Table:
        a = gtab["clip_a"].to_numpy(zero_copy_only=False)
        b = gtab["clip_b"].to_numpy(zero_copy_only=False)
        o = gtab["offset"].to_numpy(zero_copy_only=False)
        side = gtab["side"].to_numpy(zero_copy_only=False)
        fps_col = gtab["fps"]
        if isinstance(fps_col, pa.ChunkedArray):
            fps_col = fps_col.combine_chunks()
        flat = fps_col.values.to_numpy(zero_copy_only=False).astype(np.uint32)
        offs = fps_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((side, o, b, a))
        a, b, o, side = a[order], b[order], o[order], side[order]
        if len(order) < 2:
            return _SPAN_SCHEMA.empty_table()
        first = (
            (a[:-1] == a[1:])
            & (b[:-1] == b[1:])
            & (o[:-1] == o[1:])
            & (side[:-1] == 0)
            & (side[1:] == 1)
        )
        p0 = np.nonzero(first)[0]
        rows: list[tuple[int, int, int, int, int, float]] = []
        r0s, r1s = order[p0], order[p0 + 1]
        for i in range(len(p0)):
            fa = flat[offs[r0s[i]] : offs[r0s[i] + 1]]
            fb = flat[offs[r1s[i]] : offs[r1s[i] + 1]]
            for a0, b0, length, ber in matching_spans(
                fa, fb, int(o[p0[i]]), win=win, max_ber=max_ber, min_len=min_len
            ):
                rows.append(
                    (int(a[p0[i]]), int(b[p0[i]]), a0, b0, length, ber)
                )
        if not rows:
            return _SPAN_SCHEMA.empty_table()
        arr = np.array([r[:5] for r in rows], dtype=np.int64)
        _, keep = np.unique(arr, axis=0, return_index=True)
        keep = np.sort(keep)
        return pa.table(
            {
                "clip_a": pa.array(
                    [rows[i][0] for i in keep], pa.uint64()
                ),
                "clip_b": pa.array(
                    [rows[i][1] for i in keep], pa.uint64()
                ),
                "a_start": pa.array([rows[i][2] for i in keep], pa.int64()),
                "b_start": pa.array([rows[i][3] for i in keep], pa.int64()),
                "n_frames": pa.array([rows[i][4] for i in keep], pa.int64()),
                "ber": pa.array([rows[i][5] for i in keep], pa.float64()),
            },
            schema=_SPAN_SCHEMA,
        )

    tagged = fps.map_batches(
        tag_fps, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        candidates.map_batches(
            tag_requests, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    resolved = tagged.groupby("bucket").map_groups(
        resolve, batch_format="pyarrow"
    )
    return (
        resolved.map_batches(
            pair_bucket, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bucket")
        .map_groups(score, batch_format="pyarrow")
    )


def audio_common_spans(
    clips: ray.data.Dataset,
    g: int = 1,
    cap: int = 512,
    win: int = 8,
    max_ber: float = 0.2,
    min_len: int = 12,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Full chain: decode -> subfingerprints -> shingle LSH (UNBOUNDED
    offset: a shared segment sits anywhere) -> windowed-BER span verify.
    Returns (clip_a, clip_b, a_start, b_start, n_frames, ber) per maximal
    shared span, clip ids as uint64 doc ids."""
    fps = audio_fingerprints(clips).materialize()
    cands = audio_candidates(
        fps, g=g, cap=cap, num_buckets=num_buckets, max_offset=None
    )
    return verify_audio_spans(
        cands,
        fps,
        win=win,
        max_ber=max_ber,
        min_len=min_len,
        num_buckets=num_buckets,
    )


_CLEAN_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("doc_id", pa.uint64()),
        ("bytes", pa.binary()),
        ("sr_hz", pa.int32()),
        ("codec", pa.string()),
        ("n_frames_removed", pa.int64()),
        ("n_samples", pa.int64()),
    ]
)


def merge_frame_intervals(iv: np.ndarray) -> np.ndarray:
    """Merge overlapping/touching (start, end) frame intervals — sorted
    2-col int64 array in, disjoint sorted intervals out."""
    if len(iv) == 0:
        return iv.reshape(0, 2)
    iv = iv[np.lexsort((iv[:, 1], iv[:, 0]))]
    out = [iv[0].copy()]
    for s, e in iv[1:]:
        if s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append(np.array([s, e]))
    return np.array(out, dtype=np.int64)


def remove_audio_spans(
    clips: ray.data.Dataset,
    spans: ray.data.Dataset,
    num_cpus: float = 1,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Cut every shared span from the HIGHER-id clip of each span pair
    (keep-first policy — content survives on the lower id) and rewrite
    the cut clips as canonical pcm_s16le; untouched clips pass through
    byte-identical.  The audio analogue of
    ``substring.remove_duplicate_spans``.

    Scale shape: the span graph is dup-content-proportional (the
    ``source_dup_report`` broadcast justification), so the merged
    per-clip cut lists are built on the driver and ``ray.put`` once; the
    corpus side is one streaming pass in which ONLY flagged clips decode
    and re-encode — pass-through rows never touch their payload.  If the
    span graph ever outgrew the driver, the doc-hash bucketed co-group
    of (clips x spans) is the fallback (the `invariant_report` shape).

    Frame -> native-sample mapping: analysis frame f covers samples
    [f*HOP*sr/8000, (f+1)*HOP*sr/8000) of the ORIGINAL rate (the
    fingerprint grid is defined on the 8 kHz resample); cuts land on
    those boundaries.
    """
    from intertext_ray.functions.audio import decode_clip
    from intertext_ray.functions.audio_fp import HOP, TARGET_SR

    cut_lists: dict[int, list[tuple[int, int]]] = {}
    for b in spans.select_columns(
        ["clip_b", "a_start", "b_start", "n_frames"]
    ).iter_batches(batch_size=1 << 18, batch_format="pyarrow"):
        cb = b["clip_b"].to_numpy(zero_copy_only=False)
        b0 = b["b_start"].to_numpy(zero_copy_only=False)
        nf = b["n_frames"].to_numpy(zero_copy_only=False)
        for i in range(len(cb)):
            cut_lists.setdefault(int(cb[i]), []).append(
                (int(b0[i]), int(b0[i] + nf[i]))
            )
    cut_map = {
        d: merge_frame_intervals(np.array(v, dtype=np.int64).reshape(-1, 2))
        for d, v in cut_lists.items()
    }
    ref = ray.put(cut_map)

    def rewrite(batch: pa.Table) -> pa.Table:
        cmap = ray.get(ref)
        docs = doc_ids_for_clip_ids(batch["clip_id"])
        blobs = batch["bytes"].to_pylist()
        srs = batch["sr_hz"].to_numpy(zero_copy_only=False)
        codecs = batch["codec"].to_pylist()
        cids = batch["clip_id"].to_pylist()
        out = {k: [] for k in (
            "clip_id", "doc_id", "bytes", "sr_hz", "codec",
            "n_frames_removed", "n_samples",
        )}
        for i in range(len(batch)):
            d = int(docs[i])
            sr = int(srs[i])
            iv = cmap.get(d)
            if iv is None or len(iv) == 0:
                out["clip_id"].append(cids[i])
                out["doc_id"].append(d)
                out["bytes"].append(blobs[i])
                out["sr_hz"].append(sr)
                out["codec"].append(codecs[i])
                out["n_frames_removed"].append(0)
                out["n_samples"].append(-1)  # payload untouched, not decoded
                continue
            pcm = decode_clip(blobs[i], sr, codecs[i])
            keep = np.ones(len(pcm), dtype=bool)
            removed = 0
            for f0, f1 in iv:
                s0 = f0 * HOP * sr // TARGET_SR
                s1 = f1 * HOP * sr // TARGET_SR
                keep[s0 : min(s1, len(pcm))] = False
                removed += int(f1 - f0)
            y = pcm[keep]
            out["clip_id"].append(cids[i])
            out["doc_id"].append(d)
            out["bytes"].append(y.astype("<i2").tobytes())
            out["sr_hz"].append(sr)
            out["codec"].append("pcm_s16le")
            out["n_frames_removed"].append(removed)
            out["n_samples"].append(int(len(y)))
        return pa.table(
            {
                "clip_id": pa.array(out["clip_id"], pa.string()),
                "doc_id": pa.array(out["doc_id"], pa.uint64()),
                "bytes": pa.array(out["bytes"], pa.binary()),
                "sr_hz": pa.array(out["sr_hz"], pa.int32()),
                "codec": pa.array(out["codec"], pa.string()),
                "n_frames_removed": pa.array(
                    out["n_frames_removed"], pa.int64()
                ),
                "n_samples": pa.array(out["n_samples"], pa.int64()),
            },
            schema=_CLEAN_SCHEMA,
        )

    return clips.map_batches(
        rewrite,
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=num_cpus,
        zero_copy_batch=True,
    )
