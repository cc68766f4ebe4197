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


def test_sinc_matches_scalar_convolution_reference():
    from intertext_ray.ops.audio_resample import resample_pcm_sinc

    rng = np.random.default_rng(21)
    pcm = rng.integers(-30000, 30000, size=401).astype(np.int16)
    sr_in, sr_out, taps, beta = 22050, 16000, 32, 8.6
    half = taps // 2
    c = min(1.0, sr_out / sr_in)
    i0b = float(np.i0(beta))
    n_in = len(pcm)
    n_out = (n_in - 1) * sr_out // sr_in + 1
    ref = []
    for n in range(n_out):
        num = n * sr_in
        idx = num // sr_out
        frac = (num - idx * sr_out) / sr_out
        acc = den = 0.0
        for k in range(-half + 1, half + 1):
            d = k - frac
            w = c * np.sinc(c * d)
            z = d / half
            w *= (
                np.i0(beta * np.sqrt(max(0.0, 1 - z * z))) / i0b
                if abs(z) <= 1.0
                else 0.0
            )
            acc += float(pcm[min(max(idx + k, 0), n_in - 1)]) * w
            den += w
        ref.append(int(np.clip(np.rint(acc / den), -32768, 32767)))
    got = resample_pcm_sinc(pcm, sr_in, sr_out, taps=taps, beta=beta)
    assert got.tolist() == ref


def test_sinc_passthrough_and_antialiasing_beats_linear():
    from intertext_ray.ops.audio_resample import resample_pcm, resample_pcm_sinc

    # equal rates: interpolating kernel passes samples through unchanged
    rng = np.random.default_rng(3)
    pcm = rng.integers(-32768, 32768, size=300).astype(np.int16)
    assert resample_pcm_sinc(pcm, 16000, 16000).tolist() == pcm.tolist()

    # a 15 kHz tone at 44.1 kHz is ABOVE the 8 kHz Nyquist of a 16 kHz
    # target: the sinc path must attenuate it, the linear path aliases it
    sr_in, sr_out, f0 = 44100, 16000, 15000
    t = np.arange(4410) / sr_in
    tone = np.rint(20000 * np.sin(2 * np.pi * f0 * t)).astype(np.int16)
    lin = resample_pcm(tone, sr_in, sr_out).astype(np.float64)
    snc = resample_pcm_sinc(tone, sr_in, sr_out).astype(np.float64)
    # trim kernel edge transients
    lin, snc = lin[32:-32], snc[32:-32]
    e_lin = np.mean(lin**2)
    e_snc = np.mean(snc**2)
    assert e_snc < e_lin / 100  # >= 20 dB more alias suppression

    # in-band content survives the sinc path: 1 kHz upsampled 8k -> 16k
    t = np.arange(1600) / 8000
    tone = np.rint(20000 * np.sin(2 * np.pi * 1000 * t)).astype(np.int16)
    up = resample_pcm_sinc(tone, 8000, 16000).astype(np.float64)[32:-32]
    ideal = 20000 * np.sin(2 * np.pi * 1000 * np.arange(len(up) + 64)[32:-32] / 16000)
    err = up - ideal
    snr_db = 10 * np.log10(np.mean(ideal**2) / np.mean(err**2))
    assert snr_db > 40
