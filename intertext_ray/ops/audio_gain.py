"""Peak gain normalization for audio payloads — integer-exact.

Audio curation normalizes levels before featurization (a -40 dBFS clip and
a full-scale clip should not produce differently-scaled features).  This
is the deterministic PEAK normalizer: scale every sample so the clip peak
lands on ``target_peak``, all in integer arithmetic —

    y[i] = floor(s[i] * target_peak / peak),  peak = max|s|

clamped to int16 (amplification of an already-asymmetric signal can push
-32768 * T / P below range by one).  Sign-safe floor via a
``+32768 * target_peak`` offset (numerator >= -32768 * T, so shifting by
32768 * T * P keeps it non-negative and truncation == floor on both numpy
and DuckDB).  Silent clips (peak 0) pass through unchanged.

The twin reuses the shared SQL payload decode (`_audio_decode_ctes`) and
re-runs the exact scaling — the THIRD driver-checked audio face.  Loudness
(RMS) normalization is the sibling in `ops/audio_loudnorm`, made
integer-exact (and hence twin-checkable) via the isqrt reference level;
float LUFS-style measures stay in `ops/audio_stats` dBFS territory.

Scale: stateless row-local ``map_batches`` — no exchange at any size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.functions.audio import decode_clip, encode_pcm_s16le

_SQL_CODECS = ("pcm_s16le", "wav", "ulaw", "alaw")


def normalize_peak_pcm(pcm: np.ndarray, target_peak: int = 30000) -> np.ndarray:
    """Integer-exact peak normalization of int16 PCM (see module doc)."""
    if len(pcm) == 0:
        return np.zeros(0, np.int16)
    s = pcm.astype(np.int64)
    peak = int(np.max(np.abs(s)))
    if peak == 0:
        return pcm.astype(np.int16, copy=True)
    t = int(target_peak)
    y = (s * t + 32768 * t * peak) // peak - 32768 * t
    return np.clip(y, -32768, 32767).astype(np.int16)


def normalize_clips(
    clips: ray.data.Dataset,
    target_peak: int = 30000,
    codecs: tuple[str, ...] = _SQL_CODECS,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Payload peak-normalized and rewritten to pcm_s16le; all other input
    columns pass through untouched (drop-in clips table, same contract as
    `audio_resample.resample_clips`).  Row-local."""
    keep = set(codecs)

    def fn(batch: pa.Table) -> pa.Table:
        mask = pa.array([c in keep for c in batch["codec"].to_pylist()])
        sub = batch.filter(mask)
        blobs = sub["bytes"].to_pylist()
        srs = sub["sr_hz"].to_numpy(zero_copy_only=False)
        cod = sub["codec"].to_pylist()
        out_b = [
            encode_pcm_s16le(
                normalize_peak_pcm(
                    decode_clip(blobs[i], int(srs[i]), cod[i]), target_peak
                )
            )
            for i in range(len(sub))
        ]
        names = sub.column_names
        sub = sub.set_column(
            names.index("bytes"), "bytes", pa.array(out_b, pa.binary())
        )
        return sub.set_column(
            names.index("codec"), "codec", pa.array(["pcm_s16le"] * len(sub))
        )

    return clips.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, num_cpus=1
    )


def normalize_stats(
    clips: ray.data.Dataset,
    target_peak: int = 30000,
    codecs: tuple[str, ...] = _SQL_CODECS,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """The driver-checkable face: (clip_id, peak_in, n_samples, energy_out,
    peak_out) — exact integers over the normalized signal."""
    keep = set(codecs)

    def fn(batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        srs = batch["sr_hz"].to_numpy(zero_copy_only=False)
        cod = batch["codec"].to_pylist()
        ids = batch["clip_id"].to_pylist()
        out = {k: [] for k in (
            "clip_id", "peak_in", "n_samples", "energy_out", "peak_out",
        )}
        for i in range(len(batch)):
            if cod[i] not in keep:
                continue
            pcm = decode_clip(blobs[i], int(srs[i]), cod[i])
            y = normalize_peak_pcm(pcm, target_peak).astype(np.int64)
            out["clip_id"].append(ids[i])
            out["peak_in"].append(
                int(np.max(np.abs(pcm.astype(np.int64)))) if len(pcm) else 0
            )
            out["n_samples"].append(len(y))
            out["energy_out"].append(int(np.sum(y * y)))
            out["peak_out"].append(int(np.max(np.abs(y))) if len(y) else 0)
        return pa.table(
            {
                "clip_id": pa.array(out["clip_id"], pa.string()),
                "peak_in": pa.array(out["peak_in"], pa.int64()),
                "n_samples": pa.array(out["n_samples"], pa.int64()),
                "energy_out": pa.array(out["energy_out"], pa.int64()),
                "peak_out": pa.array(out["peak_out"], pa.int64()),
            }
        )

    return clips.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, num_cpus=1
    )
