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
