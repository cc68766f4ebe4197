"""Integer-exact linear SRC: scalar-reference parity, identity, floor
semantics on negative samples, and the Dataset faces."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _scalar_resample(pcm, sr_in, sr_out):
    n_in = len(pcm)
    if n_in == 0:
        return []
    n_out = (n_in - 1) * sr_out // sr_in + 1
    out = []
    for n in range(n_out):
        num = n * sr_in
        idx = num // sr_out
        f = num % sr_out
        s0 = int(pcm[idx])
        s1 = int(pcm[min(idx + 1, n_in - 1)])
        out.append((s0 * (sr_out - f) + s1 * f + 32768 * sr_out) // sr_out - 32768)
    return out


def test_resample_matches_scalar_reference_all_rate_pairs():
    from intertext_ray.ops.audio_resample import resample_pcm

    rng = np.random.default_rng(5)
    pcm = rng.integers(-32768, 32768, size=997).astype(np.int16)
    for sr_in in (8000, 16000, 22050, 44100):
        for sr_out in (8000, 16000):
            got = resample_pcm(pcm, sr_in, sr_out)
            ref = _scalar_resample(pcm, sr_in, sr_out)
            assert got.tolist() == ref, (sr_in, sr_out)
            assert len(got) == (len(pcm) - 1) * sr_out // sr_in + 1


def test_resample_identity_and_edges():
    from intertext_ray.ops.audio_resample import resample_pcm

    pcm = np.array([100, -200, 300], np.int16)
    assert resample_pcm(pcm, 16000, 16000).tolist() == [100, -200, 300]
    assert resample_pcm(np.zeros(0, np.int16), 8000, 16000).tolist() == []
    one = np.array([-32768], np.int16)
    assert resample_pcm(one, 8000, 16000).tolist() == [-32768]
    # exact 2x upsample of a ramp inserts exact midpoints
    ramp = np.array([0, 100, 200], np.int16)
    assert resample_pcm(ramp, 8000, 16000).tolist() == [0, 50, 100, 150, 200]
    # floor (not truncate-toward-zero) on negative midpoints
    neg = np.array([0, -101], np.int16)
    assert resample_pcm(neg, 8000, 16000).tolist() == [0, -51, -101]


def test_resample_clips_dataset_roundtrip(ray_session):
    from intertext_ray.functions.audio import (
        decode_pcm_s16le,
        encode_clip,
    )
    from intertext_ray.ops.audio_resample import (
        resample_clips,
        resample_pcm,
        resample_stats,
    )

    rng = np.random.default_rng(9)
    rows = []
    for i, (sr, codec) in enumerate(
        [(8000, "pcm_s16le"), (16000, "wav"), (44100, "pcm_s16le")]
    ):
        pcm = rng.integers(-30000, 30000, size=sr // 10).astype(np.int16)
        rows.append(
            {
                "clip_id": f"clip-{i}",
                "bytes": encode_clip(pcm, sr, codec),
                "sr_hz": sr,
                "codec": codec,
                "pcm": pcm,
            }
        )
    tbl = pa.table(
        {
            "clip_id": pa.array([r["clip_id"] for r in rows]),
            "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
            "sr_hz": pa.array([r["sr_hz"] for r in rows], pa.int32()),
            "codec": pa.array([r["codec"] for r in rows]),
        }
    )
    ds = rd.from_arrow(tbl)
    out = resample_clips(ds, target_hz=16000).to_pandas().set_index("clip_id")
    assert set(out["codec"]) == {"pcm_s16le"} and set(out["sr_hz"]) == {16000}
    for r in rows:
        got = decode_pcm_s16le(out.loc[r["clip_id"], "bytes"])
        ref = resample_pcm(r["pcm"], r["sr_hz"], 16000)
        assert got.tolist() == ref.tolist()

    st = resample_stats(ds, target_hz=16000).to_pandas().set_index("clip_id")
    for r in rows:
        y = resample_pcm(r["pcm"], r["sr_hz"], 16000).astype(np.int64)
        assert st.loc[r["clip_id"], "n_out"] == len(y)
        assert st.loc[r["clip_id"], "energy_out"] == int(np.sum(y * y))
        assert st.loc[r["clip_id"], "peak_abs_out"] == int(np.max(np.abs(y)))
