"""Deterministic synthetic corpus with planted AUDIO near-duplicates.

`gen_clips.gen_corpus` plants *transcript* near-dups (every clip's audio is
unique); this fixture plants dups in the AUDIO payload itself — the input
for the audio-fingerprint dedup family (`ops/audio_dedup.py`).  Same
Lance-shaped schema as BASELINE.json input_hint: (clip_id, bytes, sr_hz,
dur_ms, codec, transcript).

Cluster members share the leader's underlying tone-mixture signal with the
perturbations a real dup corpus shows: re-encode under a different codec,
gain change (x0.92-1.08), low-amplitude additive noise, and a time shift of
a whole analysis hop (so ground-truth frame offsets are integral).  All of
it is a pure function of (seed, n_clips); ground truth (clip_id,
cluster_id, offset_frames) is returned alongside.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from intertext_ray.functions.audio import encode_clip
from intertext_ray.functions.audio_fp import HOP, TARGET_SR
from intertext_ray.functions.hashing import splitmix64

SAMPLE_RATES = [8000, 16000, 22050, 44100]
CODECS = ["pcm_s16le", "wav", "ulaw", "alaw"]


def _rng(seed: int, *streams: int) -> np.random.Generator:
    x = np.uint64(seed)
    for s in streams:
        x = splitmix64(x ^ np.uint64(s))
    return np.random.default_rng(int(x))


def base_signal(seed: int, base_idx: int, sr_hz: int, n_samples: int) -> np.ndarray:
    """Float audio-like signal in [-1,1] for dup-cluster base ``base_idx``
    — re-derivable from (seed, base_idx) alone.

    Deliberately NON-stationary (amplitude-modulated tones plus a slowly
    modulated deterministic broadband bed): the Haitsma-Kalker bits are
    signs of the TIME DERIVATIVE of band-energy slopes, which for a
    stationary tone mixture are numerical noise (measured BER ~0.5 between
    a clip and its own mild perturbation).  The bed also puts real energy
    in every analysis band, so no bit is noise-floor-dominated."""
    rng = _rng(seed, 0xF00D, base_idx)
    t = np.arange(n_samples, dtype=np.float64) / sr_hz
    sig = np.zeros(n_samples)
    for _ in range(int(rng.integers(3, 6))):
        f = float(rng.uniform(120.0, min(3500.0, sr_hz / 2 - 200)))
        ph = float(rng.uniform(0, 2 * np.pi))
        amp = float(rng.uniform(0.1, 0.25))
        mod_f = float(rng.uniform(0.5, 3.0))
        mod_ph = float(rng.uniform(0, 2 * np.pi))
        env = 0.5 * (1.0 + np.sin(2 * np.pi * mod_f * t + mod_ph))
        sig += amp * env * np.sin(2 * np.pi * f * t + ph)
    bed = rng.normal(0, 0.05, n_samples)
    bed_f = float(rng.uniform(0.3, 1.5))
    bed_ph = float(rng.uniform(0, 2 * np.pi))
    bed_env = 0.65 + 0.35 * np.sin(2 * np.pi * bed_f * t + bed_ph)
    return sig + bed * bed_env


def gen_audio_dup_corpus(
    n_clips: int,
    seed: int = 7,
    dup_frac: float = 0.3,
    max_shift_hops: int = 4,
):
    """Return (clips: pa.Table, truth: pa.Table).

    ~``dup_frac`` of clips sit in planted clusters of size 2-4 (cluster_id =
    leader's clip index); the rest are independent background signals.
    truth.offset_frames is the member's shift in 8 kHz analysis hops
    relative to the cluster leader (leader rows have offset 0).
    """
    rng = _rng(seed, 1)
    clip_ids: list[str] = []
    blobs: list[bytes] = []
    srs: list[int] = []
    durs: list[int] = []
    codecs: list[str] = []
    cluster_of: list[int] = []
    offsets: list[int] = []

    i = 0
    while i < n_clips:
        in_cluster = rng.random() < dup_frac
        size = int(rng.integers(2, 5)) if in_cluster else 1
        size = min(size, n_clips - i)
        leader = i
        sr = SAMPLE_RATES[int(rng.integers(len(SAMPLE_RATES)))]
        dur_ms = int(rng.integers(900, 2200))
        n_samp = sr * dur_ms // 1000
        sig = base_signal(seed, leader, sr, n_samp)
        for k in range(size):
            member_rng = _rng(seed, 2, i)
            if k == 0:
                pert, shift_hops = sig, 0
            else:
                gain = float(member_rng.uniform(0.92, 1.08))
                noise = member_rng.normal(0, 0.004, n_samp)
                shift_hops = int(member_rng.integers(0, max_shift_hops + 1))
                # shift by whole 8 kHz hops mapped to this clip's rate
                shift = int(round(shift_hops * HOP * sr / TARGET_SR))
                pert = np.concatenate(
                    [member_rng.normal(0, 0.004, shift), sig * gain + noise]
                )[:n_samp]
            pcm = np.clip(pert * 8192.0, -32768, 32767).astype(np.int16)
            codec = CODECS[int(member_rng.integers(len(CODECS)))]
            clip_ids.append(f"clip_{i}")
            blobs.append(encode_clip(pcm, sr, codec))
            srs.append(sr)
            durs.append(dur_ms)
            codecs.append(codec)
            cluster_of.append(leader if size > 1 else -1)
            offsets.append(shift_hops)
            i += 1

    clips = pa.table(
        {
            "clip_id": pa.array(clip_ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "sr_hz": pa.array(srs, pa.int32()),
            "dur_ms": pa.array(durs, pa.int32()),
            "codec": pa.array(codecs, pa.string()),
            "transcript": pa.array([""] * len(clip_ids), pa.string()),
        }
    )
    truth = pa.table(
        {
            "clip_id": pa.array(clip_ids, pa.string()),
            "cluster_id": pa.array(cluster_of, pa.int64()),
            "offset_frames": pa.array(offsets, pa.int64()),
        }
    )
    return clips, truth


def audio_dup_corpus_for_sf(sf_dir: str, seed: int = 7) -> str:
    """Cache an audio-dup corpus sized to the sf tier (n = documents rows)
    under /tmp, sharded for parallel decode; returns the cache dir."""
    n = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    n = max(120, n)
    cache = f"/tmp/itx_audiodup_v1_n{n}_s{seed}"
    done = os.path.join(cache, "_DONE")
    if not os.path.exists(done):
        clips, truth = gen_audio_dup_corpus(n, seed=seed)
        os.makedirs(os.path.join(cache, "clips"), exist_ok=True)
        shard = max(64, len(clips) // 64 + 1)
        for s in range(0, len(clips), shard):
            pq.write_table(
                clips.slice(s, shard),
                os.path.join(cache, "clips", f"part-{s // shard:05d}.parquet"),
            )
        pq.write_table(truth, os.path.join(cache, "truth.parquet"))
        with open(done, "w") as f:
            f.write("ok")
    return cache


def gen_joint_corpus(n_clips: int, seed: int = 19):
    """Corpus with dup structure planted INDEPENDENTLY in both modalities
    — the input for the joint transcript+audio dup classifier
    (`ops/joint_dedup.py`).  Cluster kinds:

    - ``both``: members share the audio signal AND near-dup transcripts
      (true re-uploads);
    - ``audio_only``: same audio, unrelated transcripts (re-dubbed /
      mis-transcribed);
    - ``text_only``: near-dup transcripts, unrelated audio (same words
      re-recorded);
    - background singletons.

    Returns (clips, truth) with truth columns (clip_id, text_cluster,
    audio_cluster) — cluster id = leader's clip index, -1 = none."""
    from intertext_ray.fixtures.gen_clips import _edit, _rand_words, make_vocab

    vocab = make_vocab(seed)
    rng = _rng(seed, 0x301)
    clip_ids, blobs, srs, durs, codecs, transcripts = [], [], [], [], [], []
    text_cl, audio_cl = [], []

    i = 0
    while i < n_clips:
        r = rng.random()
        if r < 0.15:
            kind, size = "both", int(rng.integers(2, 4))
        elif r < 0.30:
            kind, size = "audio_only", int(rng.integers(2, 4))
        elif r < 0.45:
            kind, size = "text_only", int(rng.integers(2, 4))
        else:
            kind, size = "background", 1
        size = min(size, n_clips - i)
        leader = i
        sr = SAMPLE_RATES[int(rng.integers(len(SAMPLE_RATES)))]
        dur_ms = int(rng.integers(1000, 2000))
        n_samp = sr * dur_ms // 1000
        shared_sig = base_signal(seed, leader, sr, n_samp)
        base_words = _rand_words(rng, vocab, int(rng.integers(80, 130)))
        for k in range(size):
            mrng = _rng(seed, 0x302, i)
            share_audio = kind in ("both", "audio_only") and size > 1
            share_text = kind in ("both", "text_only") and size > 1
            if share_audio:
                m_sr, m_dur, m_n = sr, dur_ms, n_samp
                if k == 0:
                    sig = shared_sig
                else:
                    gain = float(mrng.uniform(0.92, 1.08))
                    sig = shared_sig * gain + mrng.normal(0, 0.004, m_n)
            else:
                m_sr = SAMPLE_RATES[int(mrng.integers(len(SAMPLE_RATES)))]
                m_dur = int(mrng.integers(1000, 2000))
                m_n = m_sr * m_dur // 1000
                sig = base_signal(seed, 1_000_000 + i, m_sr, m_n)
            if share_text:
                words = base_words if k == 0 else _edit(
                    mrng, base_words, vocab, 0.05
                )
            else:
                words = _rand_words(mrng, vocab, int(mrng.integers(80, 130)))
            pcm = np.clip(sig * 8192.0, -32768, 32767).astype(np.int16)
            codec = CODECS[int(mrng.integers(len(CODECS)))]
            clip_ids.append(f"clip_{i}")
            blobs.append(encode_clip(pcm, m_sr, codec))
            srs.append(m_sr)
            durs.append(m_dur)
            codecs.append(codec)
            transcripts.append(" ".join(words))
            text_cl.append(leader if share_text else -1)
            audio_cl.append(leader if share_audio else -1)
            i += 1

    clips = pa.table(
        {
            "clip_id": pa.array(clip_ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "sr_hz": pa.array(srs, pa.int32()),
            "dur_ms": pa.array(durs, pa.int32()),
            "codec": pa.array(codecs, pa.string()),
            "transcript": pa.array(transcripts, pa.string()),
        }
    )
    truth = pa.table(
        {
            "clip_id": pa.array(clip_ids, pa.string()),
            "text_cluster": pa.array(text_cl, pa.int64()),
            "audio_cluster": pa.array(audio_cl, pa.int64()),
        }
    )
    return clips, truth


def joint_corpus_for_sf(sf_dir: str, seed: int = 19) -> str:
    """Cache a joint-modality corpus sized to the sf tier under /tmp."""
    n = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    n = max(120, n)
    cache = f"/tmp/itx_joint_v1_n{n}_s{seed}"
    done = os.path.join(cache, "_DONE")
    if not os.path.exists(done):
        clips, truth = gen_joint_corpus(n, seed=seed)
        os.makedirs(os.path.join(cache, "clips"), exist_ok=True)
        shard = max(64, len(clips) // 64 + 1)
        for s in range(0, len(clips), shard):
            pq.write_table(
                clips.slice(s, shard),
                os.path.join(cache, "clips", f"part-{s // shard:05d}.parquet"),
            )
        pq.write_table(truth, os.path.join(cache, "truth.parquet"))
        with open(done, "w") as f:
            f.write("ok")
    return cache
