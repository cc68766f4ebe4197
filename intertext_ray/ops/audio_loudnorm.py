"""RMS (loudness) gain normalization for audio payloads — integer-exact.

`ops/audio_gain` is the PEAK normalizer; training-data curation usually
wants the LOUDNESS form (a clip with one stray full-scale click should not
be attenuated into silence).  The classic objection — RMS involves a
square root, so the gain is irrational and the op can't be twin-checked
bit-exactly — dissolves once the reference level is defined as the
*integer* RMS floor:

    ms  = floor(sum(s^2) / n)          (exact int arithmetic)
    r   = isqrt(ms)                    (integer square root, floor)
    y_i = floor(s_i * target_rms / r)  (sign-safe offset floor)

clamped to int16 (amplifying a quiet clip with outlier samples clips — the
clamp is part of the contract and the twin replays it).  Near-silent clips
(r == 0, i.e. mean square < 1) pass through unchanged, mirroring the
peak-normalizer's silent-clip rule.

The DuckDB twin recomputes ``r`` as ``floor(sqrt(ms::DOUBLE))``: for
``ms < 2^50`` that equals ``isqrt(ms)`` exactly — IEEE sqrt is correctly
rounded, and for ms = k^2 - d (d >= 1, k <= 2^25) the true root k - d/(2k)
sits at least 2^-26 below k, more than half an ulp (2^-28) at that
magnitude, so the rounded result never crosses up to k.  Here
``ms <= 32768^2 = 2^30``, far inside the bound.  The engine side uses
``math.isqrt`` (exact at any size) so the kernel itself has no such limit.

The sign-safe floor is the `audio_gain` offset trick: adding
``32768 * t * r`` makes every ``//`` numerator non-negative (s >= -32768,
r >= 1), so truncating division == floor on numpy, Python and DuckDB.
Worst-case numerator magnitude is ``32768 * t * (r + 1) <= 2^30 * t`` —
int64-safe for any sane target.

Scale: stateless row-local ``map_batches`` (two passes over each clip's
samples: one reduction for ms, one scale) — no exchange at any size; the
same shape as `audio_gain.normalize_clips` and drop-in for the clips
table contract.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.functions.audio import decode_clip, encode_pcm_s16le

_SQL_CODECS = ("pcm_s16le", "wav", "ulaw", "alaw")


def normalize_rms_pcm(pcm: np.ndarray, target_rms: int = 8000) -> np.ndarray:
    """Integer-exact RMS normalization of int16 PCM (see module doc)."""
    if len(pcm) == 0:
        return np.zeros(0, np.int16)
    s = pcm.astype(np.int64)
    ms = int(np.sum(s * s)) // len(s)
    r = math.isqrt(ms)
    if r == 0:
        return pcm.astype(np.int16, copy=True)
    t = int(target_rms)
    y = (s * t + 32768 * t * r) // r - 32768 * t
    return np.clip(y, -32768, 32767).astype(np.int16)


def rms_normalize_clips(
    clips: ray.data.Dataset,
    target_rms: int = 8000,
    codecs: tuple[str, ...] = _SQL_CODECS,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Payload RMS-normalized and rewritten to pcm_s16le; all other input
    columns pass through untouched (drop-in clips table, same contract as
    `audio_gain.normalize_clips`).  Row-local."""
    keep = set(codecs)

    def fn(batch: pa.Table) -> pa.Table:
        mask = pa.array([c in keep for c in batch["codec"].to_pylist()])
        sub = batch.filter(mask)
        blobs = sub["bytes"].to_pylist()
        srs = sub["sr_hz"].to_numpy(zero_copy_only=False)
        cod = sub["codec"].to_pylist()
        out_b = [
            encode_pcm_s16le(
                normalize_rms_pcm(
                    decode_clip(blobs[i], int(srs[i]), cod[i]), target_rms
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


def rms_normalize_stats(
    clips: ray.data.Dataset,
    target_rms: int = 8000,
    codecs: tuple[str, ...] = _SQL_CODECS,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """The driver-checkable face: (clip_id, rms_in, n_samples, energy_out,
    peak_out) — exact integers over the normalized signal.  ``rms_in`` is
    the integer RMS floor the gain was derived from."""
    keep = set(codecs)

    def fn(batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        srs = batch["sr_hz"].to_numpy(zero_copy_only=False)
        cod = batch["codec"].to_pylist()
        ids = batch["clip_id"].to_pylist()
        out = {k: [] for k in (
            "clip_id", "rms_in", "n_samples", "energy_out", "peak_out",
        )}
        for i in range(len(batch)):
            if cod[i] not in keep:
                continue
            pcm = decode_clip(blobs[i], int(srs[i]), cod[i])
            s = pcm.astype(np.int64)
            r = math.isqrt(int(np.sum(s * s)) // len(s)) if len(s) else 0
            y = normalize_rms_pcm(pcm, target_rms).astype(np.int64)
            out["clip_id"].append(ids[i])
            out["rms_in"].append(r)
            out["n_samples"].append(len(y))
            out["energy_out"].append(int(np.sum(y * y)))
            out["peak_out"].append(int(np.max(np.abs(y))) if len(y) else 0)
        return pa.table(
            {
                "clip_id": pa.array(out["clip_id"], pa.string()),
                "rms_in": pa.array(out["rms_in"], pa.int64()),
                "n_samples": pa.array(out["n_samples"], pa.int64()),
                "energy_out": pa.array(out["energy_out"], pa.int64()),
                "peak_out": pa.array(out["peak_out"], pa.int64()),
            }
        )

    return clips.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, num_cpus=1
    )
