"""Codec transcode op: lossless round-trips sample-exact, lossy targets
hold the 30 dB floor, undecodable rows flagged not dropped."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from intertext_ray.functions.audio import decode_clip, encode_clip
from intertext_ray.ops.audio_transcode import transcode_clips

SR = 8000


def _pcm(ms=500, hz=440.0):
    t = np.arange(SR * ms // 1000) / SR
    return (np.sin(2 * np.pi * hz * t) * 8192).astype(np.int16)


def _clips(rows):
    return rd.from_arrow(
        pa.table(
            {
                "clip_id": pa.array([r[0] for r in rows], pa.string()),
                "bytes": pa.array([r[1] for r in rows], pa.binary()),
                "sr_hz": pa.array([SR] * len(rows), pa.int32()),
                "codec": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )


def test_transcode_lossless_and_lossy(ray_session):
    pcm = _pcm()
    rows = [
        ("clip_0001", encode_clip(pcm, SR, "wav"), "wav"),
        ("clip_0002", encode_clip(pcm, SR, "ulaw"), "ulaw"),
        ("clip_0003", b"junk", "flac"),  # undecodable
    ]
    got = {
        r["clip_id"]: r
        for r in transcode_clips(_clips(rows), to_codec="flac").take_all()
    }
    r1 = got["clip_0001"]
    assert r1["transcode_ok"] and r1["lossless"] and r1["snr_db"] == 999.0
    assert np.array_equal(decode_clip(r1["bytes"], SR, "flac"), pcm)
    # ulaw source: its decoded PCM is the reference; flac re-encode of THAT
    # is still lossless
    src2 = decode_clip(rows[1][1], SR, "ulaw")
    r2 = got["clip_0002"]
    assert r2["lossless"]
    assert np.array_equal(decode_clip(r2["bytes"], SR, "flac"), src2)
    r3 = got["clip_0003"]
    assert not r3["transcode_ok"] and r3["bytes"] == b""

    # lossy target: wav -> ulaw holds the 30 dB invariant on sine content
    lossy = transcode_clips(_clips(rows[:1]), to_codec="ulaw").take_all()[0]
    assert lossy["transcode_ok"] and not lossy["lossless"]
    assert lossy["snr_db"] >= 30.0
