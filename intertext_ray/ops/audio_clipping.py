"""Clipping (rail-hit) detection for audio payloads — integer-exact.

Digital clipping — samples pinned at the int16 rails (+32767 / −32768)
because some upstream gain stage overdrove the signal — is the classic
"hot recording" defect a wave-curation pipeline gates on before training:
a clipped waveform carries harmonic distortion no later normalization can
undo.  Two ops:

- ``amplify_clips``: the preamp stage itself — integer gain
  ``y = clamp(floor(s * num / den))`` applied to the decoded PCM and
  rewritten as pcm_s16le (sign-safe floor via the ``+32768 * num``
  offset, same idiom as `ops/audio_gain.normalize_peak_pcm`).  This is
  what CREATES clipping when mis-set, so it doubles as the deterministic
  fixture for the detector's driver face.
- ``clipping_report``: the detector — per clip, the number of rail
  samples, their parts-per-million ratio (``n_clipped * 10^6 //
  n_samples``), the longest CONSECUTIVE rail run (sustained flat-tops are
  the audible defect; isolated rail hits occur in healthy loud audio),
  and the boolean gate ``is_clipped = clipped_ppm >= thr_ppm OR max_run
  >= thr_run``.

All arithmetic is integer, so the DuckDB twin re-decodes the payload
(shared `_audio_decode_ctes` hex-pair/G.711 SQL decode), replays the gain
clamp, and recomputes counts exactly; the max-run recomputation is the
standard gaps-and-islands (``i − row_number()``) over rail rows only.

Reference tie-in: the reference engine has no audio path; this extends
its junk-window gating idea (`reference/intertext/intertext.py` junk
filtering) to the wave domain.

Scale: both ops are stateless row-local ``map_batches`` — no exchange at
any corpus size; the decode loop is per-payload (variable-length codecs),
each iteration a numpy kernel, the repo-wide audio idiom.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.functions.audio import decode_clip, encode_pcm_s16le

_SQL_CODECS = ("pcm_s16le", "wav", "ulaw", "alaw")

_REPORT_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("n_samples", pa.int64()),
        ("n_clipped", pa.int64()),
        ("clipped_ppm", pa.int64()),
        ("max_run", pa.int64()),
        ("is_clipped", pa.bool_()),
    ]
)


def amplify_pcm(pcm: np.ndarray, num: int, den: int = 1) -> np.ndarray:
    """Integer gain with int16 clamp: ``clamp(floor(s * num / den))``.
    Floor (not truncation) for negative samples via the non-negative
    offset trick, so numpy, Python and DuckDB ``//`` all agree."""
    if len(pcm) == 0:
        return np.zeros(0, np.int16)
    s = pcm.astype(np.int64)
    num, den = int(num), int(den)
    # offset rounded UP to a multiple of den so the shift cancels exactly:
    # (a + C)//den - C//den == floor(a/den) requires C % den == 0
    c = ((32768 * num + den - 1) // den) * den
    y = (s * num + c) // den - c // den
    return np.clip(y, -32768, 32767).astype(np.int16)


def rail_stats(pcm: np.ndarray) -> tuple[int, int]:
    """(n_clipped, max_consecutive_run) at the int16 rails, vectorized:
    run boundaries from the padded mask diff."""
    if len(pcm) == 0:
        return 0, 0
    m = (pcm >= 32767) | (pcm <= -32768)
    n_clipped = int(np.count_nonzero(m))
    if n_clipped == 0:
        return 0, 0
    d = np.diff(np.concatenate([[0], m.astype(np.int8), [0]]))
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)
    return n_clipped, int(np.max(ends - starts))


def amplify_clips(
    clips: ray.data.Dataset,
    gain_num: int,
    gain_den: int = 1,
    codecs: tuple[str, ...] = _SQL_CODECS,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Payload re-gained and rewritten to pcm_s16le; all other columns
    pass through (drop-in clips table, same contract as
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
                amplify_pcm(
                    decode_clip(blobs[i], int(srs[i]), cod[i]),
                    gain_num,
                    gain_den,
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


def clipping_report(
    clips: ray.data.Dataset,
    thr_ppm: int = 500,
    thr_run: int = 3,
    codecs: tuple[str, ...] = _SQL_CODECS,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Per-clip rail report (schema above).  ``thr_ppm`` gates on overall
    rail density (default 0.05%), ``thr_run`` on sustained flat-tops —
    either trips the gate."""
    keep = set(codecs)
    thr_ppm, thr_run = int(thr_ppm), int(thr_run)

    def fn(batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        srs = batch["sr_hz"].to_numpy(zero_copy_only=False)
        cod = batch["codec"].to_pylist()
        ids = batch["clip_id"].to_pylist()
        out: dict[str, list] = {k.name: [] for k in _REPORT_SCHEMA}
        for i in range(len(batch)):
            if cod[i] not in keep:
                continue
            pcm = decode_clip(blobs[i], int(srs[i]), cod[i])
            n = len(pcm)
            nc, mr = rail_stats(pcm)
            ppm = (nc * 1_000_000 // n) if n else 0
            out["clip_id"].append(ids[i])
            out["n_samples"].append(n)
            out["n_clipped"].append(nc)
            out["clipped_ppm"].append(ppm)
            out["max_run"].append(mr)
            out["is_clipped"].append(ppm >= thr_ppm or mr >= thr_run)
        return pa.table(out, schema=_REPORT_SCHEMA)

    return clips.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, num_cpus=1
    )
