"""Energy-threshold voice-activity detection (VAD) over audio payloads —
integer-exact, so it carries a full SQL twin (the FOURTH driver-checked
audio face after pcm-stats / resample / gain).

A training-data audio pipeline segments clips into speech/non-speech
before transcription or fingerprinting (silence wastes ASR compute and
dilutes fingerprints).  The classic first-stage detector is frame energy:

    frame f is ACTIVE  iff  sum(s[i]^2 over the frame) >= thr_msq * flen

i.e. the frame's MEAN SQUARE is at least ``thr_msq`` — all in int64, no
floats, so numpy and DuckDB agree bit-for-bit.  The default
``thr_msq=107374`` is floor((0.01 * 32768)^2), i.e. -40 dBFS mean-square,
matching the dBFS silence gate of `ops/audio_stats.clip_stats`.

Frames are fixed ``frame_ms`` windows (``flen = sr_hz * frame_ms // 1000``
samples); the incomplete tail frame is excluded (documented contract —
the SQL twin applies the same ``count(*) = flen`` filter).  Consecutive
active frames merge into segments; segments closer than ``merge_gap``
frames are bridged (hangover), then segments shorter than ``min_len``
frames are dropped.

Reference parity note: intertext has no audio stage (transcript-only,
`intertext.py` windowing); this op is part of the additive audio family
required by BASELINE.json's input_hint (audio clip + transcript rows).

Scale: stateless row-local ``map_batches`` over byte-bounded batches —
no exchange at any corpus size; output is one row per segment, ~10^2-10^3x
smaller than the payload.  Same decode task-pool sizing rationale as
`stages/audio.py`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.functions.audio import decode_clip, encode_pcm_s16le

_SQL_CODECS = ("pcm_s16le", "wav", "ulaw", "alaw")

# floor((0.01 * 32768)^2): -40 dBFS mean-square threshold.
DEFAULT_THR_MSQ = 107374


def frame_energies(pcm: np.ndarray, flen: int) -> np.ndarray:
    """int64 energy (sum of squares) per complete ``flen``-sample frame;
    the incomplete tail frame is dropped."""
    n_frames = len(pcm) // flen
    if n_frames == 0:
        return np.zeros(0, np.int64)
    f = pcm[: n_frames * flen].astype(np.int64).reshape(n_frames, flen)
    return (f * f).sum(axis=1)


def vad_segments_pcm(
    pcm: np.ndarray,
    sr_hz: int,
    frame_ms: int = 20,
    thr_msq: int = DEFAULT_THR_MSQ,
    merge_gap: int = 0,
    min_len: int = 1,
) -> list[tuple[int, int, int, int]]:
    """Active segments of one int16 PCM clip as
    ``(start_frame, end_frame_inclusive, n_active_frames, energy)`` tuples
    (pure function, reused by the test oracle).  ``n_active_frames`` counts
    only frames above threshold (bridged gap frames are not counted and
    their energy is not summed); ``energy`` is the int64 sum over those
    active frames."""
    flen = max(1, sr_hz * frame_ms // 1000)
    e = frame_energies(pcm, flen)
    active = e >= np.int64(thr_msq) * flen
    idx = np.flatnonzero(active)
    if len(idx) == 0:
        return []
    # split where the gap between consecutive active frames exceeds the
    # bridgeable hangover
    brk = np.flatnonzero(np.diff(idx) > merge_gap + 1)
    starts = np.concatenate([[0], brk + 1])
    ends = np.concatenate([brk, [len(idx) - 1]])
    out = []
    for s, t in zip(starts, ends):
        frames = idx[s : t + 1]
        if len(frames) < min_len:
            continue
        out.append(
            (
                int(frames[0]),
                int(frames[-1]),
                int(len(frames)),
                int(e[frames].sum()),
            )
        )
    return out


def vad_segments(
    clips: ray.data.Dataset,
    frame_ms: int = 20,
    thr_msq: int = DEFAULT_THR_MSQ,
    merge_gap: int = 0,
    min_len: int = 1,
    codecs: tuple[str, ...] = _SQL_CODECS,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """The driver-checkable face: one row per active segment —
    (clip_id, seg_idx, start_frame, end_frame, n_frames, energy), all
    exact integers.  ``seg_idx`` is 0-based in start order within the
    clip; ``end_frame`` is INCLUSIVE."""
    keep = set(codecs)

    def fn(batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        srs = batch["sr_hz"].to_numpy(zero_copy_only=False)
        cod = batch["codec"].to_pylist()
        ids = batch["clip_id"].to_pylist()
        out = {k: [] for k in (
            "clip_id", "seg_idx", "start_frame", "end_frame",
            "n_frames", "energy",
        )}
        for i in range(len(batch)):
            if cod[i] not in keep:
                continue
            pcm = decode_clip(blobs[i], int(srs[i]), cod[i])
            segs = vad_segments_pcm(
                pcm, int(srs[i]), frame_ms, thr_msq, merge_gap, min_len
            )
            for j, (a, b, n, e) in enumerate(segs):
                out["clip_id"].append(ids[i])
                out["seg_idx"].append(j)
                out["start_frame"].append(a)
                out["end_frame"].append(b)
                out["n_frames"].append(n)
                out["energy"].append(e)
        return pa.table(
            {
                "clip_id": pa.array(out["clip_id"], pa.string()),
                "seg_idx": pa.array(out["seg_idx"], pa.int64()),
                "start_frame": pa.array(out["start_frame"], pa.int64()),
                "end_frame": pa.array(out["end_frame"], pa.int64()),
                "n_frames": pa.array(out["n_frames"], pa.int64()),
                "energy": pa.array(out["energy"], pa.int64()),
            }
        )

    return clips.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, num_cpus=1
    )


def trim_silence_clips(
    clips: ray.data.Dataset,
    frame_ms: int = 20,
    thr_msq: int = DEFAULT_THR_MSQ,
    merge_gap: int = 0,
    min_len: int = 1,
    codecs: tuple[str, ...] = _SQL_CODECS,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Payload rewrite: keep only the samples of kept VAD segments
    (start..end frames INCLUSIVE of each segment — bridged gap frames
    between them ride along, preserving intra-segment timing), re-encoded
    as pcm_s16le.  All other input columns pass through untouched
    (drop-in clips table, same contract as `audio_gain.normalize_clips`);
    ``dur_ms`` is recomputed from the kept sample count.  Fully silent
    clips come out with an empty payload (filter on dur_ms downstream)."""
    keep = set(codecs)

    def fn(batch: pa.Table) -> pa.Table:
        mask = pa.array([c in keep for c in batch["codec"].to_pylist()])
        sub = batch.filter(mask)
        blobs = sub["bytes"].to_pylist()
        srs = sub["sr_hz"].to_numpy(zero_copy_only=False)
        cod = sub["codec"].to_pylist()
        out_b, out_dur = [], []
        for i in range(len(sub)):
            sr = int(srs[i])
            pcm = decode_clip(blobs[i], sr, cod[i])
            flen = max(1, sr * frame_ms // 1000)
            segs = vad_segments_pcm(
                pcm, sr, frame_ms, thr_msq, merge_gap, min_len
            )
            if segs:
                kept = np.concatenate(
                    [pcm[a * flen : (b + 1) * flen] for a, b, _, _ in segs]
                )
            else:
                kept = np.zeros(0, np.int16)
            out_b.append(encode_pcm_s16le(kept))
            out_dur.append(len(kept) * 1000 // sr)
        names = sub.column_names
        sub = sub.set_column(
            names.index("bytes"), "bytes", pa.array(out_b, pa.binary())
        )
        sub = sub.set_column(
            names.index("codec"), "codec", pa.array(["pcm_s16le"] * len(sub))
        )
        return sub.set_column(
            names.index("dur_ms"), "dur_ms",
            pa.array(np.asarray(out_dur, np.int32), pa.int32()),
        )

    return clips.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, num_cpus=1
    )
