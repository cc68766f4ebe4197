"""DC-offset removal for audio payloads — integer-exact.

A constant bias in the PCM (cheap ADCs, bad trims after concatenation)
breaks every downstream zero-mean assumption: energy-VAD thresholds read
silence as speech, the Haitsma–Kalker band energies pick up a spurious
0 Hz component, and peak/RMS normalization amplify the bias along with
the signal.  Curation removes it first:

    m   = floor(sum(s) / n)            (floor mean, exact int)
    y_i = clamp_int16(s_i - m)

The floor mean uses the repo's sign-safe offset idiom — ``sum(s)`` can be
negative and DuckDB/numpy/Python disagree on negative integer division,
so ``m = (sum + 32768*n) // n - 32768`` keeps the numerator non-negative
(s >= -32768) and truncation == floor on all three.  Subtracting a
negative mean can push +32767 out of range by |m|, hence the clamp (part
of the contract; the twin replays it).  After removal the residual sum is
in [0, n) when nothing clamps — the face exposes ``sum_out`` so the twin
pins exactly that.

Scale: stateless row-local ``map_batches``, no exchange at any size;
drop-in for the clips table contract like `audio_gain` / `audio_loudnorm`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.functions.audio import decode_clip, encode_pcm_s16le

_SQL_CODECS = ("pcm_s16le", "wav", "ulaw", "alaw")


def remove_dc_pcm(pcm: np.ndarray) -> np.ndarray:
    """Integer-exact DC removal from int16 PCM (see module doc)."""
    if len(pcm) == 0:
        return np.zeros(0, np.int16)
    s = pcm.astype(np.int64)
    n = len(s)
    m = (int(np.sum(s)) + 32768 * n) // n - 32768
    return np.clip(s - m, -32768, 32767).astype(np.int16)


def dc_mean(pcm: np.ndarray) -> int:
    """The floor mean the removal subtracts (exposed for the stats face)."""
    if len(pcm) == 0:
        return 0
    s = pcm.astype(np.int64)
    n = len(s)
    return (int(np.sum(s)) + 32768 * n) // n - 32768


def dc_remove_clips(
    clips: ray.data.Dataset,
    codecs: tuple[str, ...] = _SQL_CODECS,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Payload DC-removed and rewritten to pcm_s16le; all other input
    columns pass through untouched.  Row-local."""
    keep = set(codecs)

    def fn(batch: pa.Table) -> pa.Table:
        mask = pa.array([c in keep for c in batch["codec"].to_pylist()])
        sub = batch.filter(mask)
        blobs = sub["bytes"].to_pylist()
        srs = sub["sr_hz"].to_numpy(zero_copy_only=False)
        cod = sub["codec"].to_pylist()
        out_b = [
            encode_pcm_s16le(
                remove_dc_pcm(decode_clip(blobs[i], int(srs[i]), cod[i]))
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


def dc_offset_stats(
    clips: ray.data.Dataset,
    codecs: tuple[str, ...] = _SQL_CODECS,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """The driver-checkable face: (clip_id, dc_in, n_samples, sum_out,
    energy_out, peak_out) — exact integers over the DC-removed signal."""
    keep = set(codecs)

    def fn(batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        srs = batch["sr_hz"].to_numpy(zero_copy_only=False)
        cod = batch["codec"].to_pylist()
        ids = batch["clip_id"].to_pylist()
        out = {k: [] for k in (
            "clip_id", "dc_in", "n_samples", "sum_out", "energy_out",
            "peak_out",
        )}
        for i in range(len(batch)):
            if cod[i] not in keep:
                continue
            pcm = decode_clip(blobs[i], int(srs[i]), cod[i])
            y = remove_dc_pcm(pcm).astype(np.int64)
            out["clip_id"].append(ids[i])
            out["dc_in"].append(dc_mean(pcm))
            out["n_samples"].append(len(y))
            out["sum_out"].append(int(np.sum(y)))
            out["energy_out"].append(int(np.sum(y * y)))
            out["peak_out"].append(int(np.max(np.abs(y))) if len(y) else 0)
        return pa.table(
            {
                "clip_id": pa.array(out["clip_id"], pa.string()),
                "dc_in": pa.array(out["dc_in"], pa.int64()),
                "n_samples": pa.array(out["n_samples"], pa.int64()),
                "sum_out": pa.array(out["sum_out"], pa.int64()),
                "energy_out": pa.array(out["energy_out"], pa.int64()),
                "peak_out": pa.array(out["peak_out"], pa.int64()),
            }
        )

    return clips.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, num_cpus=1
    )
