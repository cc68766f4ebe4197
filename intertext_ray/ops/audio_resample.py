"""Sample-rate conversion for audio payloads — integer-exact linear SRC.

A training-data audio pipeline normalizes heterogeneous clip rates (8 k /
16 k / 22.05 k / 44.1 k...) to one model rate before featurization.  This
operator is the DETERMINISTIC baseline resampler: linear interpolation on
an exact integer phase grid —

    output n  maps to input position  n * sr_in / sr_out  (exact rational)
    idx = (n * sr_in) // sr_out ,  f = (n * sr_in) % sr_out
    y[n] = floor( (pcm[idx] * (sr_out - f) + pcm[idx+1] * f) / sr_out )
    n_out = (n_in - 1) * sr_out // sr_in + 1      (idx never overruns)

Every quantity is integer arithmetic, so the DuckDB twin re-derives the
resampled signal FROM THE PAYLOAD BYTES (the `audio_pcm_stats` SQL decode
reused) and hash-compares exact stats — the second driver-checked audio
face.  Quality caveat (documented, inherent to the baseline): linear SRC
does not low-pass before decimation, so downsampling aliases; the
production-quality path is a windowed-sinc polyphase kernel, which slots
into the same per-clip map (the phase grid is identical) but has no
integer-exact twin.

Scale: stateless task-pool ``map_batches`` over byte-bounded batches,
row-local — no exchange at any corpus size (same posture as
`ops/audio_transcode`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.functions.audio import decode_clip, encode_pcm_s16le

_SQL_CODECS = ("pcm_s16le", "wav", "ulaw", "alaw")


def resample_pcm(pcm: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Integer-exact linear resample of int16 PCM (see module docstring).
    ``sr_in == sr_out`` is the identity (the formula reduces to it)."""
    n_in = len(pcm)
    if n_in == 0:
        return np.zeros(0, np.int16)
    if sr_in == sr_out:
        return pcm.astype(np.int16, copy=True)
    n_out = (n_in - 1) * sr_out // sr_in + 1
    n = np.arange(n_out, dtype=np.int64)
    num = n * sr_in
    idx = num // sr_out
    f = num - idx * sr_out
    s0 = pcm[idx].astype(np.int64)
    s1 = pcm[np.minimum(idx + 1, n_in - 1)].astype(np.int64)
    y_num = s0 * (sr_out - f) + s1 * f
    # exact floor division for possibly-negative numerators via a +32768
    # offset (numerator >= -32768*sr_out, so the shifted value is >= 0 and
    # truncation == floor on BOTH numpy and DuckDB)
    y = (y_num + 32768 * sr_out) // sr_out - 32768
    return y.astype(np.int16)


def resample_clips(
    clips: ray.data.Dataset,
    target_hz: int = 16000,
    codecs: tuple[str, ...] = _SQL_CODECS,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """(clip_id, bytes, sr_hz, codec): payload rewritten to pcm_s16le at
    ``target_hz`` via the exact linear SRC.  Row-local; clips whose codec
    cannot be decoded here are dropped (count them upstream via
    `audio_stats` if needed)."""
    keep = set(codecs)

    def fn(batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        srs = batch["sr_hz"].to_numpy(zero_copy_only=False)
        cod = batch["codec"].to_pylist()
        ids = batch["clip_id"].to_pylist()
        out_id, out_b = [], []
        for i in range(len(batch)):
            if cod[i] not in keep:
                continue
            pcm = decode_clip(blobs[i], int(srs[i]), cod[i])
            out_id.append(ids[i])
            out_b.append(encode_pcm_s16le(resample_pcm(pcm, int(srs[i]), target_hz)))
        n = len(out_id)
        return pa.table(
            {
                "clip_id": pa.array(out_id, pa.string()),
                "bytes": pa.array(out_b, pa.binary()),
                "sr_hz": pa.array([target_hz] * n, pa.int32()),
                "codec": pa.array(["pcm_s16le"] * n, pa.string()),
            }
        )

    return clips.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, num_cpus=1
    )


def resample_stats(
    clips: ray.data.Dataset,
    target_hz: int = 16000,
    codecs: tuple[str, ...] = _SQL_CODECS,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """The driver-checkable face: integer-exact per-clip stats of the
    RESAMPLED signal — (clip_id, sr_hz_in, n_in, n_out, energy_out,
    peak_abs_out).  The twin re-decodes the payload and re-runs the exact
    phase arithmetic in SQL."""
    keep = set(codecs)

    def fn(batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        srs = batch["sr_hz"].to_numpy(zero_copy_only=False)
        cod = batch["codec"].to_pylist()
        ids = batch["clip_id"].to_pylist()
        out = {k: [] for k in (
            "clip_id", "sr_hz_in", "n_in", "n_out", "energy_out",
            "peak_abs_out",
        )}
        for i in range(len(batch)):
            if cod[i] not in keep:
                continue
            pcm = decode_clip(blobs[i], int(srs[i]), cod[i])
            y = resample_pcm(pcm, int(srs[i]), target_hz).astype(np.int64)
            out["clip_id"].append(ids[i])
            out["sr_hz_in"].append(int(srs[i]))
            out["n_in"].append(len(pcm))
            out["n_out"].append(len(y))
            out["energy_out"].append(int(np.sum(y * y)))
            out["peak_abs_out"].append(int(np.max(np.abs(y))) if len(y) else 0)
        return pa.table(
            {
                "clip_id": pa.array(out["clip_id"], pa.string()),
                "sr_hz_in": pa.array(out["sr_hz_in"], pa.int64()),
                "n_in": pa.array(out["n_in"], pa.int64()),
                "n_out": pa.array(out["n_out"], pa.int64()),
                "energy_out": pa.array(out["energy_out"], pa.int64()),
                "peak_abs_out": pa.array(out["peak_abs_out"], pa.int64()),
            }
        )

    return clips.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, num_cpus=1
    )
