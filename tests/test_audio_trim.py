"""Silence edge-trim: bounds/kernel parity vs a scalar reference, the
all-silent and no-complete-frame contracts, and the Dataset faces."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _mk(sr, sil_ms_lead, speech_ms, sil_ms_trail, amp=8000, seed=0):
    rng = np.random.default_rng(seed)
    lead = np.zeros(sr * sil_ms_lead // 1000, np.int16)
    mid = rng.integers(-amp, amp, size=sr * speech_ms // 1000).astype(
        np.int16
    )
    trail = np.zeros(sr * sil_ms_trail // 1000, np.int16)
    return np.concatenate([lead, mid, trail]), len(lead), len(mid)


def test_trim_bounds_and_signal():
    from intertext_ray.ops.audio_trim import (
        trim_bounds_pcm,
        trim_silence_pcm,
    )

    sr = 16000
    flen = sr * 20 // 1000  # 320
    pcm, n_lead, n_mid = _mk(sr, 100, 200, 60)
    fl, nf, f0, f1 = trim_bounds_pcm(pcm, sr)
    assert fl == flen
    assert nf == len(pcm) // flen
    # leading silence is 5 complete frames -> first active frame is 5
    assert f0 == n_lead // flen
    assert f1 == (n_lead + n_mid - 1) // flen
    y = trim_silence_pcm(pcm, sr)
    assert y.tolist() == pcm[f0 * flen : (f1 + 1) * flen].tolist()
    # the speech content is fully inside the kept range
    assert len(y) >= n_mid


def test_trim_silent_and_short_contracts():
    from intertext_ray.ops.audio_trim import (
        trim_bounds_pcm,
        trim_silence_pcm,
    )

    sr = 16000
    # all-silent
    fl, nf, f0, f1 = trim_bounds_pcm(np.zeros(5 * 320, np.int16), sr)
    assert (f0, f1) == (-1, -1) and nf == 5
    assert len(trim_silence_pcm(np.zeros(5 * 320, np.int16), sr)) == 0
    # shorter than one complete frame: no frames -> all-silent contract
    loud_short = np.full(100, 20000, np.int16)
    fl, nf, f0, f1 = trim_bounds_pcm(loud_short, sr)
    assert (nf, f0, f1) == (0, -1, -1)
    assert len(trim_silence_pcm(loud_short, sr)) == 0


def test_trim_dataset_faces(ray_session):
    from intertext_ray.functions.audio import decode_pcm_s16le, encode_clip
    from intertext_ray.ops.audio_trim import (
        trim_clips,
        trim_silence_pcm,
        trim_stats,
    )

    sr = 16000
    pcm0, _, _ = _mk(sr, 80, 160, 40, seed=1)
    silent = np.zeros(sr // 2, np.int16)
    tbl = pa.table(
        {
            "clip_id": ["c0", "c1"],
            "bytes": [
                encode_clip(pcm0, sr, "pcm_s16le"),
                encode_clip(silent, sr, "pcm_s16le"),
            ],
            "sr_hz": pa.array([sr, sr], pa.int32()),
            "dur_ms": pa.array(
                [len(pcm0) * 1000 // sr, 500], pa.int32()
            ),
            "codec": ["pcm_s16le", "pcm_s16le"],
            "transcript": ["a", ""],
        }
    )
    ds = rd.from_arrow(tbl)

    stats = trim_stats(ds).to_pandas().set_index("clip_id")
    y0 = trim_silence_pcm(pcm0, sr).astype(np.int64)
    assert int(stats.loc["c0", "n_out"]) == len(y0)
    assert int(stats.loc["c0", "energy_out"]) == int(np.sum(y0 * y0))
    assert int(stats.loc["c1", "first_active"]) == -1
    assert int(stats.loc["c1", "n_out"]) == 0

    out = trim_clips(ds).to_pandas()
    assert out["clip_id"].tolist() == ["c0"]  # silent clip dropped
    got = decode_pcm_s16le(out.iloc[0]["bytes"])
    assert got.tolist() == trim_silence_pcm(pcm0, sr).tolist()
    assert int(out.iloc[0]["dur_ms"]) == len(got) * 1000 // sr
