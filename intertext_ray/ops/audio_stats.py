"""Per-clip audio quality/hygiene statistics — the audio analog of
`ops/text_stats.quality_scores` (a training-data pipeline filters clips on
these before fingerprinting/transcribing: silence, clipping, loudness).

Task-pool ``map_batches`` over byte-bounded batches (same sizing rationale
as `stages/audio.py`); all math is vectorized numpy over the decoded PCM.
No SQL twin (decoding is not DuckDB-expressible); a local test pins each
statistic against a direct single-process computation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.functions.audio import decode_clip
from intertext_ray.sources.clips import doc_ids_for_clip_ids

_EPS = 1e-12


def clip_stats(pcm: np.ndarray, sr_hz: int, silence_db: float = -40.0) -> dict:
    """Statistics for one int16 PCM clip (pure function, reused by the
    test oracle): RMS/peak in dBFS, zero-crossing rate per second,
    fraction of 20 ms frames below ``silence_db`` dBFS, clipping rate."""
    x = np.asarray(pcm, dtype=np.float64) / 32768.0
    n = len(x)
    if n == 0:
        return {
            "n_samples": 0, "rms_dbfs": -np.inf, "peak_dbfs": -np.inf,
            "zcr_per_sec": 0.0, "silence_frac": 1.0, "clip_frac": 0.0,
        }
    rms = float(np.sqrt(np.mean(x * x)))
    peak = float(np.max(np.abs(x)))
    zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    frame = max(1, sr_hz // 50)  # 20 ms
    n_frames = n // frame
    if n_frames:
        f = x[: n_frames * frame].reshape(n_frames, frame)
        frms = np.sqrt(np.mean(f * f, axis=1))
        silence = float(
            np.mean(20.0 * np.log10(frms + _EPS) < silence_db)
        )
    else:
        silence = float(20.0 * np.log10(rms + _EPS) < silence_db)
    clip_frac = float(np.mean(np.abs(pcm) >= 32767))
    return {
        "n_samples": n,
        "rms_dbfs": 20.0 * np.log10(rms + _EPS),
        "peak_dbfs": 20.0 * np.log10(peak + _EPS),
        "zcr_per_sec": zc * sr_hz / n,
        "silence_frac": silence,
        "clip_frac": clip_frac,
    }


def audio_stats(
    clips: ray.data.Dataset,
    silence_db: float = -40.0,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """(clip_id, doc_id, n_samples, rms_dbfs, peak_dbfs, zcr_per_sec,
    silence_frac, clip_frac, decode_ok) per clip; undecodable clips emit
    decode_ok=false with zeroed stats."""

    def fn(batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        srs = batch["sr_hz"].to_numpy(zero_copy_only=False)
        codecs = batch["codec"].to_pylist()
        doc = doc_ids_for_clip_ids(batch["clip_id"])
        cols = {
            "n_samples": [], "rms_dbfs": [], "peak_dbfs": [],
            "zcr_per_sec": [], "silence_frac": [], "clip_frac": [],
        }
        ok = np.zeros(len(batch), dtype=bool)
        for i in range(len(batch)):
            try:
                pcm = decode_clip(blobs[i], int(srs[i]), codecs[i])
                s = clip_stats(pcm, int(srs[i]), silence_db)
                ok[i] = True
            except Exception:
                s = {k: 0.0 for k in cols} | {"n_samples": 0}
            for k in cols:
                cols[k].append(s[k])
        return pa.table(
            {
                "clip_id": batch["clip_id"],
                "doc_id": pa.array(doc, pa.uint64()),
                "n_samples": pa.array(
                    np.asarray(cols["n_samples"], np.int64), pa.int64()
                ),
                "rms_dbfs": pa.array(cols["rms_dbfs"], pa.float64()),
                "peak_dbfs": pa.array(cols["peak_dbfs"], pa.float64()),
                "zcr_per_sec": pa.array(cols["zcr_per_sec"], pa.float64()),
                "silence_frac": pa.array(cols["silence_frac"], pa.float64()),
                "clip_frac": pa.array(cols["clip_frac"], pa.float64()),
                "decode_ok": pa.array(ok),
            }
        )

    return clips.map_batches(
        fn,
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
        zero_copy_batch=True,
    )


def audio_pcm_stats(
    clips: ray.data.Dataset,
    codecs: tuple[str, ...] = ("pcm_s16le", "wav", "ulaw", "alaw"),
    batch_size: int = 64,
) -> ray.data.Dataset:
    """INTEGER-exact per-clip loudness/activity stats over the losslessly
    SQL-decodable codecs — the driver-checkable face of the audio family.

    Unlike :func:`audio_stats` (dBFS floats, rows-only check), every output
    here is an exact integer, so a DuckDB twin can re-decode the payload
    bytes (hex-pair arithmetic for s16le / canonical-header WAV, 256-entry
    table literals for G.711 u-law/A-law — tables generated FROM the engine
    decoder, parity by construction) and hash-compare:

    - ``n_samples``     decoded sample count
    - ``energy``        sum of squared samples (< 2^46 at 2 s / 44.1 kHz)
    - ``peak_abs``      max |sample|
    - ``n_zero_cross``  count of strict sign flips (s[i-1] * s[i] < 0)
    - ``n_clipped``     samples at full scale (32767 / -32768)
    """
    keep = set(codecs)

    def fn(batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        srs = batch["sr_hz"].to_numpy(zero_copy_only=False)
        cod = batch["codec"].to_pylist()
        ids = batch["clip_id"].to_pylist()
        out = {
            "clip_id": [], "n_samples": [], "energy": [],
            "peak_abs": [], "n_zero_cross": [], "n_clipped": [],
        }
        for i in range(len(batch)):
            if cod[i] not in keep:
                continue
            pcm = decode_clip(blobs[i], int(srs[i]), cod[i])
            s = pcm.astype(np.int64)
            out["clip_id"].append(ids[i])
            out["n_samples"].append(len(s))
            out["energy"].append(int(np.sum(s * s)))
            out["peak_abs"].append(int(np.max(np.abs(s))) if len(s) else 0)
            out["n_zero_cross"].append(
                int(np.sum(s[:-1] * s[1:] < 0)) if len(s) > 1 else 0
            )
            out["n_clipped"].append(
                int(np.sum((pcm == 32767) | (pcm == -32768)))
            )
        return pa.table(
            {
                "clip_id": pa.array(out["clip_id"], pa.string()),
                "n_samples": pa.array(out["n_samples"], pa.int64()),
                "energy": pa.array(out["energy"], pa.int64()),
                "peak_abs": pa.array(out["peak_abs"], pa.int64()),
                "n_zero_cross": pa.array(out["n_zero_cross"], pa.int64()),
                "n_clipped": pa.array(out["n_clipped"], pa.int64()),
            }
        )

    return clips.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def audio_payload_report(
    clips: ray.data.Dataset,
) -> ray.data.Dataset:
    """(doc_id, codec, payload_bytes, n_samples_est, dur_ms_est,
    dur_ms, est_known, dur_consistent) — the DECODE-FREE integrity gate:
    at 10^12-clip scale the first corruption sweep must not touch sample
    data, so this derives the expected sample count from byte length
    alone (pcm_s16le: len/2; G.711 u/A-law: len; canonical 44-byte-header
    WAV: (len-44)/2 — the container this repo's encoder writes) and
    flags rows whose declared ``dur_ms`` disagrees by more than the 1 ms
    floor slop.  Codecs whose frame structure needs a real parse (flac,
    opus stubs) report ``est_known = false``.

    Zero payload reads: ``binary_length`` touches the Arrow offsets
    buffer only.  Row-local, no shuffle.  The DuckDB twin replicates the
    identical arithmetic over ``octet_length``.
    """
    import pyarrow.compute as pc

    from intertext_ray.sources.clips import doc_ids_for_clip_ids

    def report(batch: pa.Table) -> pa.Table:
        doc = doc_ids_for_clip_ids(batch["clip_id"])
        blen = pc.binary_length(batch["bytes"]).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        codec = np.asarray(batch["codec"].to_pylist())
        sr = batch["sr_hz"].to_numpy(zero_copy_only=False).astype(np.int64)
        dur = batch["dur_ms"].to_numpy(zero_copy_only=False).astype(np.int64)
        est = np.full(len(blen), -1, dtype=np.int64)
        est[codec == "pcm_s16le"] = blen[codec == "pcm_s16le"] // 2
        for c in ("ulaw", "alaw"):
            est[codec == c] = blen[codec == c]
        wav = codec == "wav"
        est[wav] = np.maximum(blen[wav] - 44, 0) // 2
        known = est >= 0
        dur_est = np.where(known, est * 1000 // np.maximum(sr, 1), -1)
        ok = known & (np.abs(dur_est - dur) <= 1)
        return pa.table(
            {
                "doc_id": pa.array(
                    np.asarray(doc, dtype=np.uint64).astype(np.int64),
                    pa.int64(),
                ),
                "codec": pa.array(codec.tolist(), pa.string()),
                "payload_bytes": pa.array(blen, pa.int64()),
                "n_samples_est": pa.array(est, pa.int64()),
                "dur_ms_est": pa.array(dur_est, pa.int64()),
                "dur_ms": pa.array(dur, pa.int64()),
                "est_known": pa.array(known),
                "dur_consistent": pa.array(ok),
            }
        )

    return clips.map_batches(report, batch_format="pyarrow")


def crest_report(
    clips: ray.data.Dataset,
    flat_milli: int = 1414,
    peaky_milli: int = 6000,
    codecs: tuple[str, ...] = ("pcm_s16le", "wav", "ulaw", "alaw"),
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Per-clip crest factor (peak / RMS, the dynamic-range signal) —
    integer-exact via the `ops/audio_loudnorm` isqrt idiom:

        ms          = floor(energy / n)
        rms_floor   = isqrt(ms)                (== floor(sqrt) exactly)
        crest_milli = peak * 1000 // rms_floor

    Wave-curation reads crest directly: a crest near 1000 is a flat-topped
    (clipped / brutally compressed) signal, a sine sits near sqrt(2) ≈
    1414, speech lives ~3000–5000, and a very high crest means impulsive
    clicks over near-silence.  ``dr_class`` buckets it: ``silent``
    (rms_floor == 0), ``flat`` (< flat_milli), ``normal``, ``peaky``
    (>= peaky_milli).

    The DuckDB twin re-decodes the payload (shared hex-pair/G.711 CTEs)
    and recomputes rms_floor as floor(sqrt(ms::DOUBLE)) — exact for
    ms <= 2^30 here (argument in `ops/audio_loudnorm`'s module doc).

    Scale: stateless row-local map_batches — no exchange at any size.
    """
    import math

    keep = set(codecs)
    fm, pm = int(flat_milli), int(peaky_milli)

    def fn(batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        srs = batch["sr_hz"].to_numpy(zero_copy_only=False)
        cod = batch["codec"].to_pylist()
        ids = batch["clip_id"].to_pylist()
        out = {
            "clip_id": [], "n_samples": [], "peak_abs": [],
            "rms_floor": [], "crest_milli": [], "dr_class": [],
        }
        for i in range(len(batch)):
            if cod[i] not in keep:
                continue
            pcm = decode_clip(blobs[i], int(srs[i]), cod[i])
            s = pcm.astype(np.int64)
            n = len(s)
            peak = int(np.max(np.abs(s))) if n else 0
            ms = (int(np.sum(s * s)) // n) if n else 0
            r = math.isqrt(ms)
            crest = (peak * 1000 // r) if r > 0 else 0
            if r == 0:
                klass = "silent"
            elif crest < fm:
                klass = "flat"
            elif crest >= pm:
                klass = "peaky"
            else:
                klass = "normal"
            out["clip_id"].append(ids[i])
            out["n_samples"].append(n)
            out["peak_abs"].append(peak)
            out["rms_floor"].append(r)
            out["crest_milli"].append(crest)
            out["dr_class"].append(klass)
        return pa.table(
            {
                "clip_id": pa.array(out["clip_id"], pa.string()),
                "n_samples": pa.array(out["n_samples"], pa.int64()),
                "peak_abs": pa.array(out["peak_abs"], pa.int64()),
                "rms_floor": pa.array(out["rms_floor"], pa.int64()),
                "crest_milli": pa.array(out["crest_milli"], pa.int64()),
                "dr_class": pa.array(out["dr_class"], pa.string()),
            }
        )

    return clips.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def audio_corpus_profile(
    clips: ray.data.Dataset,
) -> ray.data.Dataset:
    """Corpus-shape rollup per (codec, sr_hz): clip count, payload bytes,
    total / min / max / median duration — the "what is actually in this
    bucket" profiling pass a 100 TB ingest runs BEFORE committing to a
    decode plan (it reads ONLY metadata columns; payload bytes never
    leave storage when the caller pruned them at the read).

    The median is the DISCRETE lower median — ``sorted(x)[(n-1)//2]`` ==
    DuckDB ``quantile_disc(0.5)`` — so every output column is an exact
    integer (same contract as `ops/curate.length_outliers`).

    Scale: ships (codec, sr_hz, dur_ms, n_bytes) int/short-string rows
    into a low-cardinality groupby (codec x rate combos ~tens); one
    group task holds one combo's durations as int64 — same partitioning
    note as length_outliers."""

    def rollup(tbl: pa.Table) -> pa.Table:
        d = np.sort(
            tbl["dur_ms"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        nb = tbl["n_bytes"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "codec": pa.array([tbl["codec"][0].as_py()], pa.string()),
                "sr_hz": pa.array(
                    [int(tbl["sr_hz"][0].as_py())], pa.int64()
                ),
                "n_clips": pa.array([len(d)], pa.int64()),
                "total_bytes": pa.array([int(nb.sum())], pa.int64()),
                "total_dur_ms": pa.array([int(d.sum())], pa.int64()),
                "min_dur_ms": pa.array([int(d[0])], pa.int64()),
                "med_dur_ms": pa.array(
                    [int(d[(len(d) - 1) // 2])], pa.int64()
                ),
                "max_dur_ms": pa.array([int(d[-1])], pa.int64()),
            }
        )

    def slim(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "codec": b["codec"],
                "sr_hz": pc.cast(b["sr_hz"], pa.int64()),
                "dur_ms": pc.cast(b["dur_ms"], pa.int64()),
                "n_bytes": pc.cast(
                    pc.binary_length(b["bytes"]), pa.int64()
                ),
            }
        )

    return (
        clips.map_batches(slim, batch_format="pyarrow")
        .groupby(["codec", "sr_hz"])
        .map_groups(rollup, batch_format="pyarrow")
    )
