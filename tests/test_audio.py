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
from intertext_ray.fixtures.gen_clips import clip_signal


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


def test_ulaw_matches_scalar_reference():
    """Vectorized G.711 mu-law encode == the classic segment-table scalar
    definition, on random + boundary samples."""
    from intertext_ray.functions.audio import decode_ulaw, encode_ulaw

    seg_end = [0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF]

    def enc_scalar(x):
        sign = 0x80 if x < 0 else 0
        m = min(abs(int(x)), 32635) + 0x84
        seg = next(i for i, e in enumerate(seg_end) if m <= e)
        return (~(sign | (seg << 4) | ((m >> (seg + 3)) & 0x0F))) & 0xFF

    rng = np.random.default_rng(7)
    xs = np.concatenate(
        [rng.integers(-32768, 32768, 2000),
         np.array([0, 1, -1, 132, -132, 32767, -32768, 32635, -32635])]
    ).astype(np.int16)
    enc = np.frombuffer(encode_ulaw(xs), dtype=np.uint8)
    ref = np.array([enc_scalar(v) for v in xs], dtype=np.uint8)
    assert (enc == ref).all()
    # lossy roundtrip stays within one companding step of the input
    dec = decode_ulaw(enc.tobytes())
    assert dec.dtype == np.int16 and len(dec) == len(xs)


def test_alaw_matches_scalar_reference():
    from intertext_ray.functions.audio import decode_alaw, encode_alaw

    seg_end = [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF]

    def enc_scalar(x):
        x = int(x)
        sign = 0x80 if x >= 0 else 0
        m = min(abs(x), 32767) >> 3
        seg = next(i for i, e in enumerate(seg_end) if m <= e)
        mant = (m >> 1) if seg == 0 else (m >> seg) & 0x0F
        return (sign | (seg << 4) | mant) ^ 0x55

    rng = np.random.default_rng(11)
    xs = np.concatenate(
        [rng.integers(-32768, 32768, 2000),
         np.array([0, 1, -1, 31, -31, 32, 255, 256, 4096, 32767, -32768])]
    ).astype(np.int16)
    enc = np.frombuffer(encode_alaw(xs), dtype=np.uint8)
    ref = np.array([enc_scalar(v) for v in xs], dtype=np.uint8)
    assert (enc == ref).all()
    dec = decode_alaw(enc.tobytes())
    assert dec.dtype == np.int16 and len(dec) == len(xs)


@pytest.mark.parametrize("codec", ["ulaw", "alaw"])
def test_g711_clip_snr_floor(codec):
    """The north-rule invariant holds through the lossy codecs: every
    fixture clip signal reconstructs at SNR >= 30 dB (measured ~36+)."""
    from intertext_ray.fixtures.gen_clips import clip_signal

    worst = float("inf")
    for idx in range(10):
        for sr in (8000, 16000, 22050, 44100):
            sig = clip_signal(42, idx, sr, sr // 2)
            dec = decode_clip(encode_clip(sig, sr, codec), sr, codec)
            worst = min(worst, snr_db(sig, dec))
    assert worst >= 30.0


def test_stub_codec_raises():
    with pytest.raises(UnsupportedCodecError):
        encode_clip(np.zeros(4, np.int16), 8000, "opus")
    with pytest.raises(UnsupportedCodecError):
        decode_clip(b"xxxx", 8000, "opus")


def test_flac_roundtrip_lossless():
    """FLAC is a real codec here: lossless (SNR inf), actually compressed
    on tonal fixture signals, and integrity-checked (CRC-16 + MD5)."""
    from intertext_ray.functions.flac import decode_flac, encode_flac

    rng = np.random.default_rng(3)
    for sig in (
        np.zeros(0, np.int16),
        np.array([32767, -32768, 0, 1], np.int16),
        np.full(9000, -777, np.int16),
        rng.integers(-32768, 32768, size=7001).astype(np.int16),
        clip_signal(42, 5, 16000, 16000),
    ):
        enc = encode_flac(sig, 16000)
        dec, sr = decode_flac(enc)
        assert sr == 16000 and np.array_equal(dec, sig)
    tonal = clip_signal(42, 5, 16000, 16000)
    assert len(encode_flac(tonal, 16000)) < 0.95 * 2 * len(tonal)
    dec = decode_clip(encode_clip(tonal, 16000, "flac"), 16000, "flac")
    assert snr_db(tonal, dec) == float("inf")


def test_flac_corruption_detected():
    from intertext_ray.functions.flac import decode_flac, encode_flac

    enc = bytearray(encode_flac(clip_signal(42, 1, 8000, 8000), 8000))
    enc[len(enc) // 2] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac(bytes(enc))


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

    clips, _, _ = gen_corpus(40, seed=7, include_stub_codec=True, flac_every=9)
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
