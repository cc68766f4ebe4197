"""Silence-based clip segmentation — the audio analogue of the text
windowizer: one long recording row -> N trainable segment rows.

A speech/audio training pipeline rarely consumes raw recordings; it wants
utterance-sized segments with silence trimmed (think VAD-lite).  The
operator is a flat-map-shaped ``map_batches`` over byte-bounded batches
(same sizing rationale as ``stages/audio.py``): decode -> 20 ms frame RMS
-> silent-frame mask -> split on silence runs >= ``min_gap_ms`` -> emit
each kept span re-encoded as pcm_s16le with (start_ms, end_ms) lineage
back to the parent clip.  Segment payloads are byte-exact slices of the
decoded PCM (test-pinned), so every downstream invariant (SNR, fingerprint
determinism) survives segmentation.

No SQL twin (decoding is not DuckDB-expressible); the scalar reference
:func:`segment_spans` is the test oracle, exercised against planted
tone/silence layouts and against the batch path frame-for-frame.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.functions.audio import decode_clip, encode_pcm_s16le
from intertext_ray.sources.clips import doc_ids_for_clip_ids

_EPS = 1e-12


def segment_spans(
    pcm: np.ndarray,
    sr_hz: int,
    silence_db: float = -40.0,
    min_gap_ms: int = 200,
    min_seg_ms: int = 100,
) -> list[tuple[int, int]]:
    """Sample-index (start, end) spans for one clip (pure function — the
    unit-test oracle and the per-clip kernel of :func:`segment_clips`).

    Frames are 20 ms, non-overlapping; a frame is silent when its RMS is
    below ``silence_db`` dBFS.  Voiced frame runs separated by fewer than
    ``min_gap_ms`` of silence merge into one span; spans shorter than
    ``min_seg_ms`` are dropped.  Span bounds snap to frame boundaries
    (the trailing partial frame counts as voiced context of the last
    span, mirroring how the reference keeps trailing partial windows,
    ``/root/reference/intertext/intertext.py:1180-1189``)."""
    n = len(pcm)
    if n == 0 or sr_hz <= 0:
        return []
    frame = max(1, sr_hz // 50)  # 20 ms
    n_frames = n // frame
    if n_frames == 0:
        x = pcm.astype(np.float64) / 32768.0
        rms = float(np.sqrt(np.mean(x * x)))
        voiced = 20.0 * np.log10(rms + _EPS) >= silence_db
        return [(0, n)] if voiced and n * 1000 >= min_seg_ms * sr_hz else []
    x = (pcm[: n_frames * frame].astype(np.float64) / 32768.0).reshape(
        n_frames, frame
    )
    frms = np.sqrt(np.mean(x * x, axis=1))
    voiced = 20.0 * np.log10(frms + _EPS) >= silence_db
    # trailing partial frame inherits the last full frame's voicing
    if not voiced.any():
        return []
    idx = np.nonzero(voiced)[0]
    gap_frames = max(1, int(round(min_gap_ms * sr_hz / 1000.0 / frame)))
    breaks = np.nonzero(np.diff(idx) > gap_frames)[0]
    span_starts = np.concatenate([[idx[0]], idx[breaks + 1]])
    span_ends = np.concatenate([idx[breaks] + 1, [idx[-1] + 1]])
    out: list[tuple[int, int]] = []
    for fs, fe in zip(span_starts, span_ends):
        s = int(fs) * frame
        e = n if fe == n_frames else int(fe) * frame
        if (e - s) * 1000 >= min_seg_ms * sr_hz:
            out.append((s, e))
    return out


def segment_clips(
    clips: ray.data.Dataset,
    silence_db: float = -40.0,
    min_gap_ms: int = 200,
    min_seg_ms: int = 100,
    with_payload: bool = True,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """(clip_id, doc_id, seg_idx, start_ms, end_ms, dur_ms, n_samples,
    sr_hz[, codec, bytes]) — one row per kept segment; undecodable clips
    emit zero rows (the validate stage is where decode failures are
    reported, ``stages/audio.py``)."""

    def fn(batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        srs = batch["sr_hz"].to_numpy(zero_copy_only=False)
        codecs = batch["codec"].to_pylist()
        doc = doc_ids_for_clip_ids(batch["clip_id"])
        cids = batch["clip_id"].to_pylist()
        cols: dict[str, list] = {
            "clip_id": [], "doc_id": [], "seg_idx": [], "start_ms": [],
            "end_ms": [], "dur_ms": [], "n_samples": [], "sr_hz": [],
        }
        payloads: list[bytes] = []
        for i in range(len(batch)):
            sr = int(srs[i])
            try:
                pcm = decode_clip(blobs[i], sr, codecs[i])
            except Exception:
                continue
            for j, (s, e) in enumerate(
                segment_spans(pcm, sr, silence_db, min_gap_ms, min_seg_ms)
            ):
                cols["clip_id"].append(cids[i])
                cols["doc_id"].append(int(doc[i]))
                cols["seg_idx"].append(j)
                start_ms = s * 1000 // sr
                end_ms = e * 1000 // sr
                cols["start_ms"].append(start_ms)
                cols["end_ms"].append(end_ms)
                # derived, not independently floored: end_ms - start_ms can
                # differ from floor((e-s)*1000/sr) by 1 ms, and downstream
                # consumers recompute duration from the boundaries
                cols["dur_ms"].append(end_ms - start_ms)
                cols["n_samples"].append(e - s)
                cols["sr_hz"].append(sr)
                if with_payload:
                    payloads.append(encode_pcm_s16le(pcm[s:e]))
        out = {
            "clip_id": pa.array(cols["clip_id"], pa.string()),
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "seg_idx": pa.array(cols["seg_idx"], pa.int32()),
            "start_ms": pa.array(cols["start_ms"], pa.int64()),
            "end_ms": pa.array(cols["end_ms"], pa.int64()),
            "dur_ms": pa.array(cols["dur_ms"], pa.int64()),
            "n_samples": pa.array(cols["n_samples"], pa.int64()),
            "sr_hz": pa.array(cols["sr_hz"], pa.int32()),
        }
        if with_payload:
            out["codec"] = pa.array(
                ["pcm_s16le"] * len(payloads), pa.string()
            )
            out["bytes"] = pa.array(payloads, pa.binary())
        return pa.table(out)

    return clips.map_batches(
        fn,
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
        zero_copy_batch=True,
    )
