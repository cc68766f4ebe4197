"""Transcript ↔ audio consistency gate: speaking-rate outlier detection.

Paired speech+text corpora accumulate misaligned rows — a transcript
attached to the wrong clip, a truncated recording under a full transcript,
boilerplate text on a jingle.  A cheap, decode-free tripwire is the
implied speaking rate: ``words per minute = n_tokens / (dur_ms / 60000)``.
Real speech sits around 100–200 wpm; rows far outside generous bounds are
almost always pairing bugs, and a 10^12-clip pipeline wants them flagged
BEFORE any decode-shaped stage spends cycles on them (same placement
argument as `audio_stats.audio_payload_report`).

Everything is integer-exact so the DuckDB twin is hash-exact:

    wpm_milli = n_tokens * 60_000_000 // dur_ms        (floor, milli-wpm)
    class     = cross-multiplied comparison            (no division)

      dur_ms <= 0                      -> 'invalid'
      n_tokens == 0                    -> 'empty'
      n_tokens * 60000 <  lo * dur_ms  -> 'too_slow'
      n_tokens * 60000 >  hi * dur_ms  -> 'too_fast'
      otherwise                        -> 'ok'

Token contract: Python ``str.split()`` semantics via the shared
vectorized Arrow splitter (`ops/text_stats._flat_tokens`); the twin uses
``regexp_split_to_array`` with empty tokens filtered, robust to the full
whitespace class (the `ops/curate` ADVICE lesson).

Scale: one row-local streaming pass over (clip_id, dur_ms, transcript) —
columns pruned at the read, payload bytes never touched, no exchange at
any size.  The stricter variant (rate over VAD-active milliseconds
instead of wall duration) is the composition
``audio_vad.vad_segments |> sum(dur per clip) |> this gate`` and
inherits `audio_vad`'s decode-batch shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.ops.text_stats import _flat_tokens


def speech_rate_report(
    clips: ray.data.Dataset,
    wpm_lo: int = 30,
    wpm_hi: int = 400,
) -> ray.data.Dataset:
    """(clip_id, n_tokens, dur_ms, wpm_milli, rate_class) per clip —
    exact integers / enum strings (see module doc for the contract)."""
    lo, hi = int(wpm_lo), int(wpm_hi)

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["transcript"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        _, _, n_tok = _flat_tokens(texts)
        dur = batch["dur_ms"].to_numpy(zero_copy_only=False).astype(np.int64)
        safe_dur = np.maximum(dur, 1)
        wpm_milli = np.where(dur > 0, n_tok * 60_000_000 // safe_dur, 0)
        lhs = n_tok * 60_000
        cls = np.full(len(dur), "ok", dtype=object)
        cls[lhs > hi * dur] = "too_fast"
        cls[lhs < lo * dur] = "too_slow"
        cls[n_tok == 0] = "empty"
        cls[dur <= 0] = "invalid"
        return pa.table(
            {
                "clip_id": batch["clip_id"],
                "n_tokens": pa.array(n_tok, pa.int64()),
                "dur_ms": pa.array(dur, pa.int64()),
                "wpm_milli": pa.array(wpm_milli, pa.int64()),
                "rate_class": pa.array(cls.tolist(), pa.string()),
            }
        )

    return clips.select_columns(
        ["clip_id", "dur_ms", "transcript"]
    ).map_batches(fn, batch_format="pyarrow")


def rate_gate(
    clips: ray.data.Dataset,
    wpm_lo: int = 30,
    wpm_hi: int = 400,
) -> ray.data.Dataset:
    """The purge face: clips whose rate_class is 'ok', full rows
    preserved.  Row-local gate (broadcast nothing, shuffle nothing)."""
    lo, hi = int(wpm_lo), int(wpm_hi)

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["transcript"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        _, _, n_tok = _flat_tokens(texts)
        dur = batch["dur_ms"].to_numpy(zero_copy_only=False).astype(np.int64)
        lhs = n_tok * 60_000
        ok = (dur > 0) & (n_tok > 0) & (lhs >= lo * dur) & (lhs <= hi * dur)
        return batch.filter(pa.array(ok))

    return clips.map_batches(fn, batch_format="pyarrow")
