"""Integer-exact RMS (loudness) normalization: scalar parity, the
isqrt == floor(sqrt(double)) twin equivalence, near-silent pass-through,
clamp behavior, and the Dataset faces."""

import math

import numpy as np
import pyarrow as pa
import ray.data as rd


def _scalar_norm(pcm, t):
    if not len(pcm):
        return []
    ms = sum(int(x) * int(x) for x in pcm) // len(pcm)
    r = math.isqrt(ms)
    if r == 0:
        return [int(x) for x in pcm]
    out = []
    for x in pcm:
        y = (int(x) * t + 32768 * t * r) // r - 32768 * t
        out.append(min(32767, max(-32768, y)))
    return out


def test_rms_normalize_matches_scalar_reference():
    from intertext_ray.ops.audio_loudnorm import normalize_rms_pcm

    rng = np.random.default_rng(47)
    for _ in range(5):
        pcm = rng.integers(-32768, 32768, size=257).astype(np.int16)
        got = normalize_rms_pcm(pcm, 8000)
        assert got.tolist() == _scalar_norm(pcm, 8000)


def test_rms_normalize_edges():
    from intertext_ray.ops.audio_loudnorm import normalize_rms_pcm

    # silent and near-silent (mean square < 1 -> r == 0) pass through
    assert normalize_rms_pcm(np.zeros(5, np.int16), 8000).tolist() == [0] * 5
    assert normalize_rms_pcm(np.zeros(0, np.int16), 8000).tolist() == []
    near = np.array([1, 0, 0, 0], np.int16)  # ms = 1//4 = 0
    assert normalize_rms_pcm(near, 8000).tolist() == [1, 0, 0, 0]
    # constant-amplitude clip: rms == peak, lands exactly on target
    const = np.array([1000, -1000, 1000, -1000], np.int16)
    assert normalize_rms_pcm(const, 8000).tolist() == [
        8000, -8000, 8000, -8000,
    ]
    # quiet clip with an outlier sample: amplification clamps the outlier
    quiet = np.full(100, 100, np.int16)
    quiet[0] = 20000  # ms = (100*99*10^4 + 4*10^8)//100 -> r = 2049
    got = normalize_rms_pcm(quiet, 8000)
    r = math.isqrt((99 * 100 * 100 + 20000 * 20000) // 100)
    assert got[0] == min(32767, 20000 * 8000 // r)
    assert got[1] == 100 * 8000 // r
    # achieved integer RMS floor is near target when nothing clamps
    rng = np.random.default_rng(3)
    pcm = rng.integers(-2000, 2000, size=4096).astype(np.int16)
    y = normalize_rms_pcm(pcm, 8000).astype(np.int64)
    r_out = math.isqrt(int(np.sum(y * y)) // len(y))
    assert abs(r_out - 8000) <= 16  # floor error is < 1 LSB per sample


def test_isqrt_equals_floor_sqrt_double_in_range():
    # the twin's floor(sqrt(ms::DOUBLE)) must equal math.isqrt for every
    # reachable mean square (<= 32768^2); probe the adversarial band just
    # below perfect squares across the whole range plus a random sweep
    rng = np.random.default_rng(11)
    for k in list(range(1, 2000)) + [2**15, 32767, 32768]:
        for ms in (k * k, k * k - 1, k * k + 1):
            if ms < 0:
                continue
            assert math.floor(math.sqrt(float(ms))) == math.isqrt(ms), ms
    for ms in rng.integers(0, 2**30 + 1, size=20000):
        ms = int(ms)
        assert math.floor(math.sqrt(float(ms))) == math.isqrt(ms), ms


def test_rms_normalize_dataset_faces(ray_session):
    from intertext_ray.functions.audio import decode_pcm_s16le, encode_clip
    from intertext_ray.ops.audio_loudnorm import (
        normalize_rms_pcm,
        rms_normalize_clips,
        rms_normalize_stats,
    )

    rng = np.random.default_rng(9)
    pcm0 = rng.integers(-5000, 5000, size=800).astype(np.int16)
    pcm1 = rng.integers(-32000, 32000, size=1600).astype(np.int16)
    tbl = pa.table(
        {
            "clip_id": ["c0", "c1", "c2"],
            "bytes": [
                encode_clip(pcm0, 16000, "pcm_s16le"),
                encode_clip(pcm1, 8000, "ulaw"),
                b"\x00\x01",  # opus-ish payload, filtered out by codec
            ],
            "sr_hz": pa.array([16000, 8000, 48000], pa.int32()),
            "dur_ms": pa.array([50, 200, 10], pa.int32()),
            "codec": ["pcm_s16le", "ulaw", "opus"],
            "transcript": ["a", "b", "c"],
        }
    )
    ds = rd.from_arrow(tbl)

    stats = rms_normalize_stats(ds, target_rms=8000).to_pandas()
    assert sorted(stats["clip_id"]) == ["c0", "c1"]
    row0 = stats[stats.clip_id == "c0"].iloc[0]
    y0 = np.array(_scalar_norm(pcm0, 8000), np.int64)
    assert int(row0.n_samples) == len(pcm0)
    assert int(row0.energy_out) == int(np.sum(y0 * y0))
    assert int(row0.peak_out) == int(np.max(np.abs(y0)))
    s0 = pcm0.astype(np.int64)
    assert int(row0.rms_in) == math.isqrt(int(np.sum(s0 * s0)) // len(s0))

    out = rms_normalize_clips(ds, target_rms=8000).to_pandas()
    assert sorted(out["clip_id"]) == ["c0", "c1"]
    assert set(out["codec"]) == {"pcm_s16le"}
    got0 = decode_pcm_s16le(out[out.clip_id == "c0"].iloc[0]["bytes"])
    assert got0.tolist() == normalize_rms_pcm(pcm0, 8000).tolist()
    # non-payload columns ride through
    assert set(out.columns) >= {
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript",
    }
