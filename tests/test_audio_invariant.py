"""Per-row invariant report (SNR>=30dB + transcript equality): kernel
scalar parity, zero-shuffle vs join shapes agreeing, planted-perturbation
discrimination, summary rollup."""

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.functions.audio import decode_clip, encode_clip
from intertext_ray.ops.audio_invariant import (
    invariant_report,
    invariant_summary,
    invariant_vs_transform,
    pcm_invariant,
    plant_perturbations,
)


def _rand_pcm(seed, n, lo=-20000, hi=20000):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, n).astype(np.int16)


def _clips_table(rows, transcripts=None):
    """rows: list of (clip_id, pcm, sr, codec)."""
    t = pa.table(
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
    if transcripts is not None:
        t = t.append_column(
            "transcript", pa.array(transcripts, pa.string())
        )
    return t


def test_kernel_scalar_parity():
    a = _rand_pcm(0, 3000)
    # identical -> zero noise, ok
    sig, noise, len_ok, ok = pcm_invariant(a, a.copy())
    assert (noise, len_ok, ok) == (0, 1, 1)
    assert sig == int(np.sum(a.astype(np.int64) ** 2))
    # tiny dither (+-1 on 1% of samples) stays well above 30 dB
    b = a.copy()
    idx = np.arange(0, len(a), 100)
    b[idx] = np.clip(b[idx].astype(np.int32) + 1, -32768, 32767).astype(
        np.int16
    )
    sig, noise, len_ok, ok = pcm_invariant(a, b)
    assert noise == len(idx) and ok == 1
    # halved amplitude: noise ~= sig/4 -> far below 30 dB
    sig, noise, _, ok = pcm_invariant(a, (a // 2).astype(np.int16))
    assert ok == 0 and sig < 1000 * noise
    # length mismatch fails even with zero overlap noise
    sig, noise, len_ok, ok = pcm_invariant(a, a[:-1])
    assert (noise, len_ok, ok) == (0, 0, 0)
    # scalar big-int reference on the overlap
    b = _rand_pcm(1, 2999)
    sig, noise, _, _ = pcm_invariant(a, b)
    m = min(len(a), len(b))
    assert sig == sum(int(x) ** 2 for x in a[:m])
    assert noise == sum((int(x) - int(y)) ** 2 for x, y in zip(a, b))


def test_vs_transform_zero_shuffle(ray_session):
    rows = [(f"c{i:03d}", _rand_pcm(i, 2000 + i), 8000, "pcm_s16le")
            for i in range(6)]
    ds = ray.data.from_arrow(
        _clips_table(rows, transcripts=[f"t{i}" for i in range(6)])
    )
    rep = (
        invariant_vs_transform(ds, lambda p, cid: p)
        .to_pandas()
        .set_index("clip_id")
    )
    assert len(rep) == 6
    assert (rep.row_ok == 1).all() and (rep.noise_energy == 0).all()
    # a transform that halves even-indexed clips
    rep2 = invariant_vs_transform(
        ds,
        lambda p, cid: (p // 2).astype(np.int16)
        if int(cid[1:]) % 2 == 0
        else p,
    ).to_pandas().set_index("clip_id")
    assert (rep2.loc[["c000", "c002", "c004"]].pcm_ok == 0).all()
    assert (rep2.loc[["c001", "c003", "c005"]].pcm_ok == 1).all()


def test_report_join_matches_planted_truth(ray_session):
    # ids chosen so %2 (gain), %5 (transcript), %11 (trunc) all hit
    ids = [0, 1, 2, 4, 5, 10, 11, 22, 33, 55]
    codecs = ["pcm_s16le", "wav", "ulaw", "alaw"] * 3
    rows = [
        (f"clip_{i:06d}", _rand_pcm(i + 7, 1500 + i), 8000, codecs[k])
        for k, i in enumerate(ids)
    ]
    trs = [f"words {i}" for i in ids]
    a = ray.data.from_arrow(_clips_table(rows, transcripts=trs))
    b = plant_perturbations(a)
    rep = invariant_report(a, b, num_buckets=4).to_pandas()
    rep = rep.set_index("clip_id").sort_index()
    assert len(rep) == len(ids)
    for k, i in enumerate(ids):
        r = rep.loc[f"clip_{i:06d}"]
        # reference computation straight from the planted semantics
        pcm = decode_clip(
            encode_clip(rows[k][1], 8000, codecs[k]), 8000, codecs[k]
        )
        exp_tr_ok = 0 if i % 5 == 0 else 1
        assert r.transcript_ok == exp_tr_ok, i
        if i % 11 == 0:
            assert r.len_ok == 0 and r.n_b == r.n_a - 1 and r.pcm_ok == 0, i
        else:
            assert r.len_ok == 1, i
        if i % 2 == 0 and i % 11 != 0:
            # gain-scaled: fails 30 dB unless peak was already ~target
            from intertext_ray.ops.audio_gain import normalize_peak_pcm

            y = normalize_peak_pcm(pcm, 30000)
            sig, noise, _, ok = pcm_invariant(pcm, y)
            assert (r.sig_energy, r.noise_energy, r.pcm_ok) == (
                sig,
                noise,
                ok,
            ), i
        if i % 2 != 0 and i % 11 != 0:
            assert r.noise_energy == 0 and r.pcm_ok == 1, i
        assert r.row_ok == int(bool(r.pcm_ok) and bool(r.transcript_ok)), i


def test_summary_rollup(ray_session):
    ids = [1, 2, 3, 4, 5, 10]
    rows = [
        (f"clip_{i:06d}", _rand_pcm(i, 1200), 8000, "pcm_s16le") for i in ids
    ]
    a = ray.data.from_arrow(
        _clips_table(rows, transcripts=["x"] * len(ids))
    )
    b = plant_perturbations(a)
    rep = invariant_report(a, b, num_buckets=2)
    df = rep.to_pandas()
    s = invariant_summary(rep).to_pandas().iloc[0]
    assert s.n_rows == len(df)
    assert s.n_ok == df.row_ok.sum()
    assert s.n_bad_pcm == (1 - df.pcm_ok).sum()
    assert s.n_bad_transcript == (1 - df.transcript_ok).sum()
    assert s.n_bad_len == (1 - df.len_ok).sum()
