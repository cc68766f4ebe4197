"""Silence-based clip segmentation: span oracle on planted layouts,
byte-exact payload slices through the Ray path, gap-merge semantics."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from intertext_ray.functions.audio import decode_clip, encode_clip
from intertext_ray.ops.audio_segment import segment_clips, segment_spans

SR = 8000
FRAME = SR // 50  # 20 ms


def _tone(ms: int, hz: float = 440.0) -> np.ndarray:
    t = np.arange(SR * ms // 1000) / SR
    return (np.sin(2 * np.pi * hz * t) * 8192).astype(np.int16)


def _silence(ms: int) -> np.ndarray:
    return np.zeros(SR * ms // 1000, dtype=np.int16)


def test_segment_spans_splits_on_silence():
    pcm = np.concatenate([_tone(300), _silence(400), _tone(200)])
    spans = segment_spans(pcm, SR, min_gap_ms=200, min_seg_ms=100)
    assert len(spans) == 2
    (s0, e0), (s1, e1) = spans
    # boundaries within one frame of the planted layout
    assert abs(s0 - 0) <= FRAME and abs(e0 - 300 * SR // 1000) <= FRAME
    assert abs(s1 - 700 * SR // 1000) <= FRAME
    assert e1 == len(pcm)  # trailing partial frame attaches to last span


def test_segment_spans_merges_short_gaps_and_drops_short_segs():
    pcm = np.concatenate([_tone(300), _silence(100), _tone(200)])
    # 100 ms gap < min_gap 200 ms -> one merged span
    spans = segment_spans(pcm, SR, min_gap_ms=200, min_seg_ms=100)
    assert len(spans) == 1
    # 60 ms blip below min_seg_ms is dropped
    pcm2 = np.concatenate([_silence(300), _tone(60), _silence(300)])
    assert segment_spans(pcm2, SR, min_gap_ms=200, min_seg_ms=100) == []
    assert segment_spans(np.array([], np.int16), SR) == []
    assert segment_spans(_silence(500), SR) == []


def test_segment_clips_payload_byte_exact(ray_session):
    pcm = np.concatenate(
        [_tone(250), _silence(500), _tone(300, 880.0), _silence(400), _tone(150)]
    )
    clips = rd.from_arrow(
        pa.table(
            {
                "clip_id": pa.array(["clip_0007", "clip_0008"], pa.string()),
                "bytes": pa.array(
                    [encode_clip(pcm, SR, "wav"), encode_clip(pcm, SR, "ulaw")],
                    pa.binary(),
                ),
                "sr_hz": pa.array([SR, SR], pa.int32()),
                "codec": pa.array(["wav", "ulaw"], pa.string()),
            }
        )
    )
    rows = sorted(
        segment_clips(clips, min_gap_ms=200, min_seg_ms=100).take_all(),
        key=lambda r: (r["clip_id"], r["seg_idx"]),
    )
    by_clip = {}
    for r in rows:
        by_clip.setdefault(r["clip_id"], []).append(r)
    assert set(by_clip) == {"clip_0007", "clip_0008"}
    for cid, segs in by_clip.items():
        assert [r["seg_idx"] for r in segs] == list(range(len(segs)))
        assert len(segs) == 3
        codec = "wav" if cid == "clip_0007" else "ulaw"
        decoded = decode_clip(
            encode_clip(pcm, SR, codec), SR, codec
        )
        spans = segment_spans(decoded, SR, min_gap_ms=200, min_seg_ms=100)
        assert len(spans) == len(segs)
        for r, (s, e) in zip(segs, spans):
            got = decode_clip(r["bytes"], SR, r["codec"])
            assert np.array_equal(got, decoded[s:e])  # byte-exact slice
            assert r["n_samples"] == e - s
            assert r["start_ms"] == s * 1000 // SR
            assert r["end_ms"] == e * 1000 // SR
            # dur_ms is derived from the ms boundaries so recomputed
            # durations are internally consistent
            assert r["dur_ms"] == r["end_ms"] - r["start_ms"]


def test_segment_clips_undecodable_emits_no_rows(ray_session):
    clips = rd.from_arrow(
        pa.table(
            {
                "clip_id": pa.array(["clip_0001"], pa.string()),
                "bytes": pa.array([b"\x00bogus"], pa.binary()),
                "sr_hz": pa.array([SR], pa.int32()),
                "codec": pa.array(["flac"], pa.string()),
            }
        )
    )
    assert segment_clips(clips).count() == 0
