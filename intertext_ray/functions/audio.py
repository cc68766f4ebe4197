"""Audio codec kernels for the clips table (pure numpy — no audio libs in
this environment).

The input schema (BASELINE.json ``input_hint``) carries encoded audio as an
opaque ``binary`` column with typed metadata (``sr_hz``, ``dur_ms``,
``codec``).  Supported codecs here:

- ``pcm_s16le`` — raw little-endian int16 PCM frames.
- ``wav``       — RIFF/WAVE container with a 16-bit PCM ``data`` chunk
                  (header built/parsed by hand; canonical 44-byte form).
- anything else (``flac``/``opus``/...) — STUB: raises
  ``UnsupportedCodecError``; the Ray-side plumbing (schema, actor pool,
  batch sizing) is identical, only the decoder body is missing in this
  container.

The per-row invariant (north_rule): decoded PCM must match the expected
signal with SNR >= 30 dB, and the transcript must be byte-equal through every
stage.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedCodecError(NotImplementedError):
    pass


def encode_pcm_s16le(pcm: np.ndarray) -> bytes:
    return np.asarray(pcm, dtype="<i2").tobytes()


def decode_pcm_s16le(data: bytes) -> np.ndarray:
    return np.frombuffer(data, dtype="<i2")


def encode_wav(pcm: np.ndarray, sr_hz: int) -> bytes:
    """Minimal canonical mono 16-bit PCM WAV."""
    raw = encode_pcm_s16le(pcm)
    n = len(raw)
    hdr = b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr_hz, sr_hz * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", n)
    return hdr + raw


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Parse a (possibly multi-chunk) RIFF WAV; return (pcm int16, sr_hz)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    sr_hz = None
    bits = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, _ch, sr_hz, _br, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt != 1 or bits != 16:
                raise UnsupportedCodecError(f"wav fmt={fmt} bits={bits}")
        elif cid == b"data":
            pcm = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)
    if pcm is None or sr_hz is None:
        raise ValueError("missing fmt/data chunk")
    return pcm, sr_hz


def encode_clip(pcm: np.ndarray, sr_hz: int, codec: str) -> bytes:
    if codec == "pcm_s16le":
        return encode_pcm_s16le(pcm)
    if codec == "wav":
        return encode_wav(pcm, sr_hz)
    raise UnsupportedCodecError(codec)


def decode_clip(data: bytes, sr_hz: int, codec: str) -> np.ndarray:
    """Decode to int16 PCM.  Raises UnsupportedCodecError for stub codecs."""
    if codec == "pcm_s16le":
        return decode_pcm_s16le(data)
    if codec == "wav":
        pcm, wav_sr = decode_wav(data)
        if wav_sr != sr_hz:
            raise ValueError(f"wav sr {wav_sr} != metadata sr {sr_hz}")
        return pcm
    raise UnsupportedCodecError(codec)


def snr_db(reference: np.ndarray, decoded: np.ndarray) -> float:
    """SNR of `decoded` against `reference` in dB (inf when identical)."""
    ref = np.asarray(reference, dtype=np.float64)
    dec = np.asarray(decoded, dtype=np.float64)
    if ref.shape != dec.shape:
        return float("-inf")
    noise = ref - dec
    p_sig = float((ref * ref).sum())
    p_noise = float((noise * noise).sum())
    if p_noise == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_noise)
