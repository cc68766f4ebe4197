"""Integer-exact DC-offset removal: scalar parity, negative-division
floor semantics, clamp behavior, and the Dataset faces."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _scalar_dc(pcm):
    if not len(pcm):
        return [], 0
    n = len(pcm)
    m = (sum(int(x) for x in pcm) + 32768 * n) // n - 32768
    return [min(32767, max(-32768, int(x) - m)) for x in pcm], m


def test_dc_matches_scalar_reference():
    from intertext_ray.ops.audio_dc import dc_mean, remove_dc_pcm

    rng = np.random.default_rng(13)
    for bias in (0, 500, -500, 12345, -12345):
        pcm = np.clip(
            rng.integers(-8000, 8000, size=301) + bias, -32768, 32767
        ).astype(np.int16)
        want, m = _scalar_dc(pcm)
        assert remove_dc_pcm(pcm).tolist() == want
        assert dc_mean(pcm) == m
        # residual floor-mean sum lands in [0, n) when nothing clamps
        y = remove_dc_pcm(pcm).astype(np.int64)
        if int(np.max(np.abs(y))) < 32767:
            assert 0 <= int(np.sum(y)) < len(y)


def test_dc_floor_semantics_and_edges():
    from intertext_ray.ops.audio_dc import dc_mean, remove_dc_pcm

    assert remove_dc_pcm(np.zeros(0, np.int16)).tolist() == []
    assert remove_dc_pcm(np.zeros(4, np.int16)).tolist() == [0] * 4
    # negative sum: mean must FLOOR (toward -inf), not truncate toward 0
    pcm = np.array([-3, -4], np.int16)  # sum -7, n 2 -> floor mean -4
    assert dc_mean(pcm) == -4
    assert remove_dc_pcm(pcm).tolist() == [1, 0]
    # clamp: near-full-scale positive samples with a negative bias
    pcm = np.array([32767, 32767, -32768], np.int16)  # mean floor = 10922
    y = remove_dc_pcm(pcm)
    assert y.tolist() == [32767 - 10922, 32767 - 10922, -32768]
    pcm = np.array([32767, -100, -100], np.int16)  # mean 10822 -> no clamp
    m = dc_mean(pcm)
    assert remove_dc_pcm(pcm).tolist() == [32767 - m, -100 - m, -100 - m]


def test_dc_dataset_faces(ray_session):
    from intertext_ray.functions.audio import decode_pcm_s16le, encode_clip
    from intertext_ray.ops.audio_dc import (
        dc_mean,
        dc_offset_stats,
        dc_remove_clips,
        remove_dc_pcm,
    )

    rng = np.random.default_rng(29)
    pcm0 = (rng.integers(-4000, 4000, size=640) + 700).astype(np.int16)
    pcm1 = rng.integers(-30000, 30000, size=320).astype(np.int16)
    tbl = pa.table(
        {
            "clip_id": ["c0", "c1", "c2"],
            "bytes": [
                encode_clip(pcm0, 16000, "pcm_s16le"),
                encode_clip(pcm1, 8000, "alaw"),
                b"\x00",
            ],
            "sr_hz": pa.array([16000, 8000, 48000], pa.int32()),
            "dur_ms": pa.array([40, 40, 10], pa.int32()),
            "codec": ["pcm_s16le", "alaw", "opus"],
            "transcript": ["a", "b", "c"],
        }
    )
    ds = rd.from_arrow(tbl)

    stats = dc_offset_stats(ds).to_pandas()
    assert sorted(stats["clip_id"]) == ["c0", "c1"]
    row0 = stats[stats.clip_id == "c0"].iloc[0]
    y0 = remove_dc_pcm(pcm0).astype(np.int64)
    assert int(row0.dc_in) == dc_mean(pcm0)
    assert int(row0.sum_out) == int(np.sum(y0))
    assert int(row0.energy_out) == int(np.sum(y0 * y0))
    assert int(row0.peak_out) == int(np.max(np.abs(y0)))

    out = dc_remove_clips(ds).to_pandas()
    assert set(out["codec"]) == {"pcm_s16le"}
    got0 = decode_pcm_s16le(out[out.clip_id == "c0"].iloc[0]["bytes"])
    assert got0.tolist() == remove_dc_pcm(pcm0).tolist()
