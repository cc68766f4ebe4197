"""Leading/trailing silence trim for audio payloads — integer-exact.

The cheap hygiene sibling of `ops/audio_vad` / `ops/audio_segment`: a
curation pipeline trims dead air off clip edges before packing or
transcription (edge silence wastes window budget and ASR compute) without
paying full segmentation.  Same integer framing contract as the VAD op —
``flen = sr_hz * frame_ms // 1000`` samples per frame, incomplete tail
frame excluded, frame ACTIVE iff its energy >= ``thr_msq * flen`` (mean
square at least ``thr_msq``; the shared -40 dBFS default).  The kept
range is the complete-frame span from the first through the last active
frame:

    keep samples [f0 * flen, (f1 + 1) * flen)

All-silent clips (no active frame, or too short for one complete frame)
trim to EMPTY — the face marks them first_active = last_active = -1 so a
downstream gate can drop or quarantine them.

Everything is int64 arithmetic, so the DuckDB twin replays the framing,
the gate, the bounds and the kept-range energy hash-exactly.

Scale: stateless row-local ``map_batches`` over byte-bounded batches —
no exchange at any size; the rewrite face only re-encodes clips whose
edges actually shrink (pass-through otherwise).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.functions.audio import decode_clip, encode_pcm_s16le
from intertext_ray.ops.audio_vad import DEFAULT_THR_MSQ, frame_energies

_SQL_CODECS = ("pcm_s16le", "wav", "ulaw", "alaw")


def trim_bounds_pcm(
    pcm: np.ndarray,
    sr_hz: int,
    frame_ms: int = 20,
    thr_msq: int = DEFAULT_THR_MSQ,
) -> tuple[int, int, int, int]:
    """(flen, n_frames, first_active, last_active) for one int16 clip;
    first/last are -1 when no complete frame is active."""
    flen = max(1, sr_hz * frame_ms // 1000)
    e = frame_energies(pcm, flen)
    idx = np.flatnonzero(e >= np.int64(thr_msq) * flen)
    if len(idx) == 0:
        return flen, len(e), -1, -1
    return flen, len(e), int(idx[0]), int(idx[-1])


def trim_silence_pcm(
    pcm: np.ndarray,
    sr_hz: int,
    frame_ms: int = 20,
    thr_msq: int = DEFAULT_THR_MSQ,
) -> np.ndarray:
    """The trimmed signal (empty when all-silent) — pure function, reused
    by the test oracle."""
    flen, _, f0, f1 = trim_bounds_pcm(pcm, sr_hz, frame_ms, thr_msq)
    if f0 < 0:
        return np.zeros(0, np.int16)
    return pcm[f0 * flen : (f1 + 1) * flen].astype(np.int16, copy=True)


def trim_stats(
    clips: ray.data.Dataset,
    frame_ms: int = 20,
    thr_msq: int = DEFAULT_THR_MSQ,
    codecs: tuple[str, ...] = _SQL_CODECS,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """The driver-checkable face: (clip_id, n_frames, first_active,
    last_active, n_out, energy_out) — exact integers over the trimmed
    signal (n_out/energy_out are 0 for all-silent clips)."""
    keep = set(codecs)

    def fn(batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        srs = batch["sr_hz"].to_numpy(zero_copy_only=False)
        cod = batch["codec"].to_pylist()
        ids = batch["clip_id"].to_pylist()
        out = {k: [] for k in (
            "clip_id", "n_frames", "first_active", "last_active",
            "n_out", "energy_out",
        )}
        for i in range(len(batch)):
            if cod[i] not in keep:
                continue
            pcm = decode_clip(blobs[i], int(srs[i]), cod[i])
            _, nf, f0, f1 = trim_bounds_pcm(
                pcm, int(srs[i]), frame_ms, thr_msq
            )
            y = trim_silence_pcm(
                pcm, int(srs[i]), frame_ms, thr_msq
            ).astype(np.int64)
            out["clip_id"].append(ids[i])
            out["n_frames"].append(nf)
            out["first_active"].append(f0)
            out["last_active"].append(f1)
            out["n_out"].append(len(y))
            out["energy_out"].append(int(np.sum(y * y)))
        return pa.table(
            {
                "clip_id": pa.array(out["clip_id"], pa.string()),
                "n_frames": pa.array(out["n_frames"], pa.int64()),
                "first_active": pa.array(out["first_active"], pa.int64()),
                "last_active": pa.array(out["last_active"], pa.int64()),
                "n_out": pa.array(out["n_out"], pa.int64()),
                "energy_out": pa.array(out["energy_out"], pa.int64()),
            }
        )

    return clips.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, num_cpus=1
    )


def trim_clips(
    clips: ray.data.Dataset,
    frame_ms: int = 20,
    thr_msq: int = DEFAULT_THR_MSQ,
    codecs: tuple[str, ...] = _SQL_CODECS,
    batch_size: int = 64,
    drop_silent: bool = True,
) -> ray.data.Dataset:
    """Payload edge-trimmed and rewritten to pcm_s16le (dur_ms updated);
    all-silent clips are dropped when ``drop_silent`` (quarantine them
    via `trim_stats` first if you need the ids).  Row-local."""
    keep = set(codecs)

    def fn(batch: pa.Table) -> pa.Table:
        mask = pa.array([c in keep for c in batch["codec"].to_pylist()])
        sub = batch.filter(mask)
        blobs = sub["bytes"].to_pylist()
        srs = sub["sr_hz"].to_numpy(zero_copy_only=False)
        cod = sub["codec"].to_pylist()
        out_b, out_dur, keep_rows = [], [], []
        for i in range(len(sub)):
            pcm = decode_clip(blobs[i], int(srs[i]), cod[i])
            y = trim_silence_pcm(pcm, int(srs[i]), frame_ms, thr_msq)
            if len(y) == 0 and drop_silent:
                continue
            keep_rows.append(i)
            out_b.append(encode_pcm_s16le(y))
            out_dur.append(len(y) * 1000 // max(1, int(srs[i])))
        sub = sub.take(pa.array(keep_rows, pa.int64()))
        names = sub.column_names
        sub = sub.set_column(
            names.index("bytes"), "bytes", pa.array(out_b, pa.binary())
        )
        sub = sub.set_column(
            names.index("dur_ms"), "dur_ms",
            pa.array(np.array(out_dur, np.int32), pa.int32()),
        )
        return sub.set_column(
            names.index("codec"), "codec",
            pa.array(["pcm_s16le"] * len(sub)),
        )

    return clips.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, num_cpus=1
    )
