"""Integer-exact peak gain normalization: scalar parity, silent clips,
amplification clamp, and the Dataset faces."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _scalar_norm(pcm, t):
    if not len(pcm):
        return []
    peak = max(abs(int(x)) for x in pcm)
    if peak == 0:
        return [int(x) for x in pcm]
    out = []
    for x in pcm:
        y = (int(x) * t + 32768 * t * peak) // peak - 32768 * t
        out.append(min(32767, max(-32768, y)))
    return out


def test_normalize_matches_scalar_reference():
    from intertext_ray.ops.audio_gain import normalize_peak_pcm

    rng = np.random.default_rng(31)
    for _ in range(5):
        pcm = rng.integers(-32768, 32768, size=257).astype(np.int16)
        got = normalize_peak_pcm(pcm, 30000)
        assert got.tolist() == _scalar_norm(pcm, 30000)
        assert int(np.max(np.abs(got.astype(np.int64)))) in (29999, 30000)


def test_normalize_edges():
    from intertext_ray.ops.audio_gain import normalize_peak_pcm

    assert normalize_peak_pcm(np.zeros(5, np.int16), 30000).tolist() == [0] * 5
    assert normalize_peak_pcm(np.zeros(0, np.int16), 30000).tolist() == []
    # attenuation: full-scale down to target exactly
    full = np.array([32767, -32767, 0], np.int16)
    assert normalize_peak_pcm(full, 30000).tolist() == [30000, -30000, 0]
    # amplification with a -32768 asymmetric peak clamps at int16 floor
    quiet = np.array([100, -100, 50], np.int16)
    got = normalize_peak_pcm(quiet, 30000)
    assert got.tolist() == [30000, -30000, 15000]
    asym = np.array([-4, 3], np.int16)  # peak 4; -4 -> -30000, 3 -> 22500
    assert normalize_peak_pcm(asym, 30000).tolist() == [-30000, 22500]


def test_normalize_dataset_faces(ray_session):
    from intertext_ray.functions.audio import decode_pcm_s16le, encode_clip
    from intertext_ray.ops.audio_gain import (
        normalize_clips,
        normalize_peak_pcm,
        normalize_stats,
    )

    rng = np.random.default_rng(8)
    pcm0 = rng.integers(-5000, 5000, size=800).astype(np.int16)
    pcm1 = rng.integers(-32000, 32000, size=1600).astype(np.int16)
    tbl = pa.table(
        {
            "clip_id": pa.array(["a", "b"]),
            "bytes": pa.array(
                [encode_clip(pcm0, 8000, "ulaw"), encode_clip(pcm1, 16000, "wav")],
                pa.binary(),
            ),
            "sr_hz": pa.array([8000, 16000], pa.int32()),
            "codec": pa.array(["ulaw", "wav"]),
        }
    )
    ds = rd.from_arrow(tbl)
    out = normalize_clips(ds, target_peak=30000).to_pandas().set_index("clip_id")
    from intertext_ray.functions.audio import decode_ulaw

    ref0 = normalize_peak_pcm(decode_ulaw(encode_clip(pcm0, 8000, "ulaw")), 30000)
    assert decode_pcm_s16le(out.loc["a", "bytes"]).tolist() == ref0.tolist()
    assert set(out["codec"]) == {"pcm_s16le"}
    assert out.loc["b", "sr_hz"] == 16000  # rate untouched

    st = normalize_stats(ds, target_peak=30000).to_pandas().set_index("clip_id")
    assert st.loc["b", "peak_out"] in (29999, 30000)
    assert st.loc["b", "n_samples"] == 1600


def test_gain_normalized_clips_detected_as_audio_dups(ray_session):
    """Pipeline property: Haitsma-Kalker fingerprints are sign-of-energy-
    difference based, so peak normalization flips only quantization-
    borderline bits (measured BER ~0.002) — a clip and its normalized
    copy MUST verify as an audio dup pair.  Also pins the clip-id
    convention gotcha: doc ids derive from the trailing number, so the
    copies need distinct numeric suffixes."""
    from intertext_ray.functions.audio import encode_clip
    from intertext_ray.ops.audio_dedup import audio_dup_pairs
    from intertext_ray.ops.audio_gain import normalize_clips

    rng = np.random.default_rng(2)
    sr = 8000
    t = np.arange(sr)
    rows = []
    for i in range(4):
        sig = (
            5000 * np.sin(2 * np.pi * (300 + 90 * i) * t / sr)
            + 2000 * np.sin(2 * np.pi * (900 + 130 * i) * t / sr)
            + rng.normal(0, 350, sr)
        ).astype(np.int16)
        rows.append((f"clip-{i}", encode_clip(sig, sr, "pcm_s16le")))
    tbl = pa.table(
        {
            "clip_id": pa.array([r[0] for r in rows]),
            "bytes": pa.array([r[1] for r in rows], pa.binary()),
            "sr_hz": pa.array([sr] * 4, pa.int32()),
            "codec": pa.array(["pcm_s16le"] * 4),
        }
    )
    norm = normalize_clips(rd.from_arrow(tbl), target_peak=30000).to_pandas()
    both = pa.table(
        {
            "clip_id": pa.array(
                [r[0] for r in rows] + [f"clip-{i + 100}" for i in range(4)]
            ),
            "bytes": pa.array(
                [r[1] for r in rows] + norm["bytes"].tolist(), pa.binary()
            ),
            "sr_hz": pa.array([sr] * 8, pa.int32()),
            "codec": pa.array(["pcm_s16le"] * 8),
        }
    )
    pairs = audio_dup_pairs(rd.from_arrow(both), num_buckets=8).to_pandas()
    assert len(pairs) == 4  # each original <-> its normalized copy, no FPs
    assert (pairs["offset"] == 0).all()
    assert (pairs["overlap"] == 29).all()
    assert (pairs["ber"] <= 0.01).all()
