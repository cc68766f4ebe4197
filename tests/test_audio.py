"""Audio codec kernels + validator stage (ST4; north_rule invariant)."""

import numpy as np
import pytest

from intertext_ray.functions.audio import (
    UnsupportedCodecError,
    decode_clip,
    decode_wav,
    encode_clip,
    encode_wav,
    snr_db,
)


def test_pcm_roundtrip():
    pcm = (np.sin(np.arange(1000) / 10) * 10000).astype(np.int16)
    assert (decode_clip(encode_clip(pcm, 16000, "pcm_s16le"), 16000, "pcm_s16le") == pcm).all()


def test_wav_roundtrip():
    pcm = (np.sin(np.arange(1234) / 7) * 20000).astype(np.int16)
    blob = encode_clip(pcm, 22050, "wav")
    assert blob[:4] == b"RIFF"
    out, sr = decode_wav(blob)
    assert sr == 22050
    assert (out == pcm).all()


def test_stub_codec_raises():
    with pytest.raises(UnsupportedCodecError):
        encode_clip(np.zeros(4, np.int16), 8000, "flac")
    with pytest.raises(UnsupportedCodecError):
        decode_clip(b"xxxx", 8000, "opus")


def test_snr():
    ref = (np.sin(np.arange(4000) / 5) * 10000).astype(np.int16)
    assert snr_db(ref, ref) == float("inf")
    noisy = ref + np.random.default_rng(0).integers(-50, 50, len(ref)).astype(np.int16)
    s = snr_db(ref, noisy)
    assert 30 < s < 100
    assert snr_db(ref, ref[:10]) == float("-inf")


def test_validator_stage(ray_session):
    import ray.data as rd

    from intertext_ray.fixtures.gen_clips import clip_signal, gen_corpus
    from intertext_ray.stages.audio import audio_validate_stage

    clips, _, _ = gen_corpus(40, seed=7, include_stub_codec=True)
    expected = lambda cid, sr, ns: clip_signal(7, int(cid.split("_")[1]), sr, ns)
    out = audio_validate_stage(
        rd.from_arrow(clips), expected_signal=expected, concurrency=2
    ).to_pandas()
    stubs = out.decode_error.str.contains("unsupported")
    assert stubs.sum() > 0
    assert out.loc[~stubs, "decode_ok"].all()
    # invariant: SNR >= 30 dB on every decodable row
    assert (out.loc[~stubs, "snr_db"] >= 30).all()
    # transcript byte-equality through the stage
    orig = clips.to_pandas().set_index("clip_id")
    got = out.set_index("clip_id")
    assert (orig.loc[got.index, "transcript"] == got["transcript"]).all()
