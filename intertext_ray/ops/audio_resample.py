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
face.  Quality caveat (inherent to the baseline): linear SRC does not
low-pass before decimation, so downsampling aliases;
:func:`resample_pcm_sinc` is the production-quality Kaiser-windowed-sinc
kernel on the identical phase grid (float weights, so no integer-exact
twin — pinned by a scalar convolution reference and a measured
aliasing-attenuation test instead), selected via
``resample_clips(quality='sinc')``.

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


def resample_pcm_sinc(
    pcm: np.ndarray,
    sr_in: int,
    sr_out: int,
    taps: int = 32,
    beta: float = 8.6,
) -> np.ndarray:
    """Kaiser-windowed-sinc resampler — the anti-aliasing QUALITY path
    (linear SRC aliases on downsampling; this one low-passes at the
    output Nyquist via the kernel cutoff).  Same exact rational phase
    grid as :func:`resample_pcm`; the kernel is float, so there is no
    SQL twin — parity is pinned against a direct per-sample convolution
    reference and an aliasing-attenuation test.

    Per output sample: ``y[n] = round(sum_k x[idx+k] h(k - frac) /
    sum_k h(k - frac))`` over ``taps`` neighbors (edge-clamped), with
    ``h(x) = c sinc(c x) kaiser(x / half; beta)`` and
    ``c = min(1, sr_out / sr_in)``.  The per-sample weight normalization
    removes DC droop from kernel truncation.  The kernel interpolates
    (``h(0)=1, h(k)=0`` at nonzero integers), so equal rates pass
    samples through unchanged."""
    n_in = len(pcm)
    if n_in == 0:
        return np.zeros(0, np.int16)
    half = taps // 2
    c = min(1.0, sr_out / sr_in)
    i0b = float(np.i0(beta))
    n_out = (n_in - 1) * sr_out // sr_in + 1
    n = np.arange(n_out, dtype=np.int64)
    num_pos = n * sr_in
    idx = num_pos // sr_out
    frac = (num_pos - idx * sr_out) / sr_out
    x = pcm.astype(np.float64)
    acc = np.zeros(n_out, np.float64)
    den = np.zeros(n_out, np.float64)
    for k in range(-half + 1, half + 1):
        d = k - frac
        w = c * np.sinc(c * d)
        z = d / half
        w = w * np.where(
            np.abs(z) <= 1.0, np.i0(beta * np.sqrt(np.maximum(0.0, 1 - z * z))) / i0b, 0.0
        )
        src = np.clip(idx + k, 0, n_in - 1)
        acc += x[src] * w
        den += w
    y = np.rint(acc / den)
    return np.clip(y, -32768, 32767).astype(np.int16)


def resample_clips(
    clips: ray.data.Dataset,
    target_hz: int = 16000,
    codecs: tuple[str, ...] = _SQL_CODECS,
    batch_size: int = 64,
    quality: str = "linear",
) -> ray.data.Dataset:
    """Payload rewritten to pcm_s16le at ``target_hz``; ALL other input
    columns (transcript, metadata...) pass through untouched, and
    ``dur_ms`` — if present — is recomputed from the output sample count,
    so the result is a drop-in clips table.  ``quality='linear'`` is the
    integer-exact twin-checked baseline; ``'sinc'`` is the anti-aliasing
    Kaiser kernel.  Row-local; clips whose codec cannot be decoded here
    are dropped (count them upstream via `audio_stats` if needed)."""
    keep = set(codecs)
    src_fn = resample_pcm if quality == "linear" else resample_pcm_sinc

    def fn(batch: pa.Table) -> pa.Table:
        mask = pa.array([c in keep for c in batch["codec"].to_pylist()])
        sub = batch.filter(mask)
        blobs = sub["bytes"].to_pylist()
        srs = sub["sr_hz"].to_numpy(zero_copy_only=False)
        cod = sub["codec"].to_pylist()
        out_b, n_out = [], []
        for i in range(len(sub)):
            pcm = decode_clip(blobs[i], int(srs[i]), cod[i])
            y = src_fn(pcm, int(srs[i]), target_hz)
            out_b.append(encode_pcm_s16le(y))
            n_out.append(len(y))
        n = len(sub)
        names = sub.column_names
        sub = sub.set_column(
            names.index("bytes"), "bytes", pa.array(out_b, pa.binary())
        )
        sub = sub.set_column(
            names.index("sr_hz"),
            "sr_hz",
            pa.array([target_hz] * n, sub["sr_hz"].type),
        )
        sub = sub.set_column(
            names.index("codec"), "codec", pa.array(["pcm_s16le"] * n)
        )
        if "dur_ms" in names:
            sub = sub.set_column(
                names.index("dur_ms"),
                "dur_ms",
                pa.array(
                    [m * 1000 // target_hz for m in n_out], sub["dur_ms"].type
                ),
            )
        return sub

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
