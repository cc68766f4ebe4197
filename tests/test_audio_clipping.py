"""Clipping detection: gain floor parity vs a scalar reference, run-length
stats, and the Dataset faces (amplify -> detect composition)."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _scalar_amp(pcm, num, den):
    c = ((32768 * num + den - 1) // den) * den
    out = []
    for x in pcm:
        y = (int(x) * num + c) // den - c // den
        out.append(min(32767, max(-32768, y)))
    return out


def _floor_ref(pcm, num, den):
    import math

    return [
        min(32767, max(-32768, math.floor(int(x) * num / den))) for x in pcm
    ]


def test_amplify_matches_scalar_and_floor():
    from intertext_ray.ops.audio_clipping import amplify_pcm

    rng = np.random.default_rng(17)
    for num, den in ((4, 1), (3, 2), (1, 3), (7, 5)):
        pcm = rng.integers(-32768, 32768, size=511).astype(np.int16)
        got = amplify_pcm(pcm, num, den).tolist()
        assert got == _scalar_amp(pcm, num, den)
        assert got == _floor_ref(pcm, num, den)
    assert amplify_pcm(np.zeros(0, np.int16), 4).tolist() == []


def test_rail_stats_runs():
    from intertext_ray.ops.audio_clipping import rail_stats

    hi, lo = 32767, -32768
    assert rail_stats(np.array([], np.int16)) == (0, 0)
    assert rail_stats(np.array([0, 100, -5], np.int16)) == (0, 0)
    assert rail_stats(np.array([hi], np.int16)) == (1, 1)
    # runs: [hi hi] . [lo] . [hi hi hi] -> n=6, max_run=3
    pcm = np.array([hi, hi, 0, lo, 0, hi, hi, hi], np.int16)
    assert rail_stats(pcm) == (6, 3)
    # rail run at the very end counts
    assert rail_stats(np.array([0, lo, lo], np.int16)) == (2, 2)
    # mixed-rail adjacency is ONE run (both ends pinned)
    assert rail_stats(np.array([hi, lo, hi], np.int16)) == (3, 3)


def _clips_table(rows):
    from intertext_ray.functions.audio import encode_clip

    return pa.table(
        {
            "clip_id": pa.array([r[0] for r in rows], pa.string()),
            "bytes": pa.array(
                [encode_clip(r[1], r[2], r[3]) for r in rows], pa.binary()
            ),
            "sr_hz": pa.array([r[2] for r in rows], pa.int32()),
            "dur_ms": pa.array(
                [len(r[1]) * 1000 // r[2] for r in rows], pa.int32()
            ),
            "codec": pa.array([r[3] for r in rows], pa.string()),
        }
    )


def test_report_and_amplify_faces(ray_session):
    from intertext_ray.functions.audio import decode_pcm_s16le
    from intertext_ray.ops.audio_clipping import (
        amplify_clips,
        amplify_pcm,
        clipping_report,
    )

    sr = 8000
    t = np.arange(sr) / sr
    sine = (10000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    quiet = (200 * np.sin(2 * np.pi * 200 * t)).astype(np.int16)
    rows = [
        ("clean0", sine, sr, "pcm_s16le"),
        ("clean1", quiet, sr, "ulaw"),
    ]
    ds = rd.from_arrow(_clips_table(rows))

    rep = clipping_report(ds).to_pandas().set_index("clip_id")
    assert not rep["is_clipped"].any()
    assert (rep["n_clipped"] == 0).all()

    # x4 drives the 10k sine into the rails; the quiet clip survives
    hot = amplify_clips(ds, gain_num=4)
    rep2 = clipping_report(hot).to_pandas().set_index("clip_id")
    assert bool(rep2.loc["clean0", "is_clipped"])
    assert rep2.loc["clean0", "max_run"] >= 3
    assert not bool(rep2.loc["clean1", "is_clipped"])

    # amplified payload decodes to exactly the scalar-gain signal
    out = hot.to_pandas().set_index("clip_id")
    got = decode_pcm_s16le(out.loc["clean0", "bytes"])
    assert got.tolist() == amplify_pcm(sine, 4).tolist()
    assert (out["codec"] == "pcm_s16le").all()


def test_ppm_gate_without_runs(ray_session):
    """Isolated rail hits trip the ppm gate only at sufficient density."""
    from intertext_ray.ops.audio_clipping import clipping_report

    base = np.zeros(10_000, np.int16)
    base[::97] = 32767  # 104 isolated hits -> 10400 ppm, max_run 1
    sparse = np.zeros(100_000, np.int16)
    sparse[5] = -32768  # 10 ppm, max_run 1
    rows = [
        ("dense", base, 8000, "pcm_s16le"),
        ("sparse", sparse, 8000, "pcm_s16le"),
    ]
    ds = rd.from_arrow(_clips_table(rows))
    rep = (
        clipping_report(ds, thr_ppm=500, thr_run=3)
        .to_pandas()
        .set_index("clip_id")
    )
    assert bool(rep.loc["dense", "is_clipped"])
    assert not bool(rep.loc["sparse", "is_clipped"])
    assert rep.loc["sparse", "clipped_ppm"] == 10
