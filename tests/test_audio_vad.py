"""Energy-VAD segmentation: pure-kernel oracle parity, hangover/min-len
semantics, trim rewrite invariants, and the Ray path."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from intertext_ray.functions.audio import decode_clip, encode_clip
from intertext_ray.ops.audio_vad import (
    DEFAULT_THR_MSQ,
    frame_energies,
    trim_silence_clips,
    vad_segments,
    vad_segments_pcm,
)


def _ref_segments(pcm, sr, frame_ms, thr, merge_gap, min_len):
    """Independent scalar reference: per-frame loop + explicit scan."""
    flen = max(1, sr * frame_ms // 1000)
    n_frames = len(pcm) // flen
    act, energy = [], []
    for f in range(n_frames):
        fr = pcm[f * flen : (f + 1) * flen].astype(np.int64)
        e = int((fr * fr).sum())
        energy.append(e)
        act.append(e >= thr * flen)
    segs, cur = [], None
    for f in range(n_frames):
        if act[f]:
            if cur is not None and f - cur[-1][-1] <= merge_gap + 1:
                cur.append([f, f])
            elif cur is None:
                cur = [[f, f]]
            else:
                segs.append(cur)
                cur = [[f, f]]
    if cur is not None:
        segs.append(cur)
    out = []
    for frames in segs:
        fl = [a for a, _ in frames]
        if len(fl) < min_len:
            continue
        out.append((fl[0], fl[-1], len(fl), sum(energy[f] for f in fl)))
    return out


def _mixed_clip(seed, sr=8000, dur_s=1.5):
    """Clip alternating loud tone bursts and near-silence."""
    rng = np.random.default_rng(seed)
    n = int(sr * dur_s)
    t = np.arange(n) / sr
    env = (np.sin(2 * np.pi * 1.7 * t + rng.uniform(0, 6)) > 0).astype(float)
    sig = 0.4 * env * np.sin(2 * np.pi * 440 * t) + rng.normal(0, 0.002, n)
    return np.clip(sig * 8192, -32768, 32767).astype(np.int16)


@pytest.mark.parametrize("merge_gap,min_len", [(0, 1), (0, 2), (2, 1), (3, 2)])
def test_vad_kernel_matches_scalar_reference(merge_gap, min_len):
    for seed in range(6):
        pcm = _mixed_clip(seed)
        got = vad_segments_pcm(
            pcm, 8000, 20, DEFAULT_THR_MSQ, merge_gap, min_len
        )
        ref = _ref_segments(pcm, 8000, 20, DEFAULT_THR_MSQ, merge_gap, min_len)
        assert got == ref
        assert len(got) > 0  # the fixture really alternates


def test_vad_tail_frame_dropped_and_silence_empty():
    flen = 8000 * 20 // 1000
    # only a loud INCOMPLETE tail frame: must be ignored
    pcm = np.zeros(flen + flen // 2, np.int16)
    pcm[flen:] = 20000
    assert vad_segments_pcm(pcm, 8000) == []
    assert vad_segments_pcm(np.zeros(0, np.int16), 8000) == []
    # one full loud frame is found, inclusive bounds
    pcm2 = np.full(flen, 5000, np.int16)
    assert vad_segments_pcm(pcm2, 8000) == [
        (0, 0, 1, int(5000**2) * flen)
    ]


def test_merge_gap_bridges_without_counting_gap_energy():
    flen = 160
    loud = np.full(flen, 10000, np.int16)
    quiet = np.zeros(flen, np.int16)
    pcm = np.concatenate([loud, quiet, loud])
    e = int((10000**2)) * flen
    assert vad_segments_pcm(pcm, 8000, merge_gap=0) == [
        (0, 0, 1, e), (2, 2, 1, e)
    ]
    # bridged: one segment spanning frames 0..2, gap frame NOT counted
    assert vad_segments_pcm(pcm, 8000, merge_gap=1) == [(0, 2, 2, 2 * e)]


def _clips_table(n=8):
    rows = {k: [] for k in
            ("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")}
    codecs = ["pcm_s16le", "wav", "ulaw", "alaw"]
    for i in range(n):
        sr = [8000, 16000][i % 2]
        pcm = _mixed_clip(i, sr=sr)
        rows["clip_id"].append(f"clip_{i}")
        rows["bytes"].append(encode_clip(pcm, sr, codecs[i % 4]))
        rows["sr_hz"].append(sr)
        rows["dur_ms"].append(len(pcm) * 1000 // sr)
        rows["codec"].append(codecs[i % 4])
        rows["transcript"].append("")
    return pa.table(rows).cast(pa.schema({
        "clip_id": pa.string(), "bytes": pa.binary(), "sr_hz": pa.int32(),
        "dur_ms": pa.int32(), "codec": pa.string(),
        "transcript": pa.string(),
    }))


def test_vad_segments_ray_path(ray_session):
    tbl = _clips_table()
    out = vad_segments(
        ray.data.from_arrow(tbl), min_len=2, batch_size=3
    ).to_pandas().sort_values(["clip_id", "seg_idx"]).reset_index(drop=True)
    for i in range(len(tbl)):
        sr = tbl["sr_hz"][i].as_py()
        pcm = decode_clip(
            tbl["bytes"][i].as_py(), sr, tbl["codec"][i].as_py()
        )
        ref = vad_segments_pcm(pcm, sr, min_len=2)
        sub = out[out.clip_id == f"clip_{i}"]
        assert list(sub.seg_idx) == list(range(len(ref)))
        got = list(
            zip(sub.start_frame, sub.end_frame, sub.n_frames, sub.energy)
        )
        assert got == ref


def test_trim_silence_keeps_exactly_segment_spans(ray_session):
    tbl = _clips_table()
    out = trim_silence_clips(
        ray.data.from_arrow(tbl), min_len=1, merge_gap=1, batch_size=3
    ).to_pandas()
    assert list(out.columns) == list(tbl.column_names)
    for _, r in out.iterrows():
        i = int(r.clip_id.split("_")[1])
        sr = tbl["sr_hz"][i].as_py()
        pcm = decode_clip(
            tbl["bytes"][i].as_py(), sr, tbl["codec"][i].as_py()
        )
        flen = sr * 20 // 1000
        segs = vad_segments_pcm(pcm, sr, min_len=1, merge_gap=1)
        want = (
            np.concatenate(
                [pcm[a * flen : (b + 1) * flen] for a, b, _, _ in segs]
            ) if segs else np.zeros(0, np.int16)
        )
        got = np.frombuffer(r["bytes"], dtype="<i2")
        assert np.array_equal(got, want)
        assert r.codec == "pcm_s16le"
        assert r.dur_ms == len(want) * 1000 // sr
        # trimming never keeps sub-threshold-only audio: every kept run of
        # complete frames contains at least one active frame
        if segs:
            e = frame_energies(got.astype(np.int16), flen)
            assert (e >= DEFAULT_THR_MSQ * flen).any()
