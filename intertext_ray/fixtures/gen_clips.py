"""Deterministic synthetic clips corpus (FIXTURES.md §1-2).

Generates the Lance-shaped audio-clip + transcript table from BASELINE.json
``input_hint`` — columns ``(clip_id:string, bytes:binary, sr_hz:int32,
dur_ms:int32, codec:string, transcript:string)`` — with planted near-duplicate
clusters, shared-passage pairs, junk rows, a hot-band stressor, and labeled
banish/exclude subsets, plus a ground-truth side table ``(clip_id,
cluster_id, role)`` and a metadata dict.

Everything is a pure function of ``(seed, n_clips)``: audio signals can be
re-derived per clip for the SNR invariant check without storing them
(FIXTURES.md §4).  No external data.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from intertext_ray.functions.audio import encode_clip
from intertext_ray.functions.hashing import splitmix64

SAMPLE_RATES = [8000, 16000, 22050, 44100]
CODECS = ["pcm_s16le", "wav", "ulaw", "alaw"]
# edit rates planting difflib-similarity bands ~{95, 75, 55, 45}; the last
# deliberately lands below min_sim=50 to exercise the verifier reject path
# while still colliding in LSH (FIXTURES.md §2)
EDIT_RATES = [0.02, 0.10, 0.25, 0.45]


def _rng(seed: int, *streams: int) -> np.random.Generator:
    x = np.uint64(seed)
    for s in streams:
        x = splitmix64(x ^ np.uint64(s))
    return np.random.default_rng(int(x))


def make_vocab(seed: int, size: int = 5000) -> list[str]:
    rng = _rng(seed, 0x0CA5)
    cons = list("bcdfghjklmnprstvwz")
    vows = list("aeiou")
    words = set()
    while len(words) < size:
        n_syl = int(rng.integers(1, 4))
        w = "".join(
            cons[int(rng.integers(len(cons)))] + vows[int(rng.integers(len(vows)))]
            for _ in range(n_syl)
        )
        if int(rng.integers(3)) == 0:
            w += cons[int(rng.integers(len(cons)))]
        words.add(w)
    return sorted(words)


def _rand_words(rng: np.random.Generator, vocab: list[str], n: int) -> list[str]:
    return [vocab[int(i)] for i in rng.integers(0, len(vocab), n)]


def _edit(rng: np.random.Generator, words: list[str], vocab: list[str], rate: float) -> list[str]:
    """Token-level sub/del/ins edits at ``rate`` (the near-dup generator)."""
    out: list[str] = []
    for w in words:
        r = rng.random()
        if r < rate:
            op = rng.random()
            if op < 0.5:  # substitute
                out.append(vocab[int(rng.integers(len(vocab)))])
            elif op < 0.75:  # delete
                pass
            else:  # insert
                out.append(w)
                out.append(vocab[int(rng.integers(len(vocab)))])
        else:
            out.append(w)
    return out


def clip_signal(seed: int, clip_idx: int, sr_hz: int, n_samples: int) -> np.ndarray:
    """The reference PCM16 signal for clip ``clip_idx`` — re-derivable
    anywhere from (seed, idx) alone: 2-4 sine tones + low-amplitude noise."""
    rng = _rng(seed, 0xA0D10, clip_idx)
    t = np.arange(n_samples, dtype=np.float64) / sr_hz
    sig = np.zeros(n_samples)
    for _ in range(int(rng.integers(2, 5))):
        f = float(rng.uniform(80.0, min(4000.0, sr_hz / 2 - 100)))
        ph = float(rng.uniform(0, 2 * np.pi))
        amp = float(rng.uniform(0.1, 0.3))
        sig += amp * np.sin(2 * np.pi * f * t + ph)
    sig += rng.normal(0, 0.01, n_samples)
    return np.clip(sig * 8192.0, -32768, 32767).astype(np.int16)


def gen_corpus(
    n_clips: int,
    seed: int = 42,
    dur_range_ms: tuple[int, int] = (500, 2000),
    include_stub_codec: bool = False,
    with_audio: bool = True,
    flac_every: int = 0,
):
    """Return (clips: pa.Table, truth: pa.Table, metadata: dict).

    Roles (FIXTURES.md §2): ~10% of clips belong to planted dup clusters of
    size 2-8 (cluster_id >= 0); plus shared-passage pairs, a hot-band
    boilerplate group, junk/empty/short/diacritic/exact-dup rows, small
    banished/excluded subsets; the rest is background.
    """
    vocab = make_vocab(seed)
    rng = _rng(seed, 1)

    transcripts: list[str] = [""] * n_clips
    roles = ["background"] * n_clips
    cluster_ids = np.full(n_clips, -1, dtype=np.int64)

    i = 0
    next_cluster = 0
    # --- planted dup clusters (~10% of rows) ---
    n_in_clusters = n_clips // 10
    while i < n_in_clusters:
        size = int(rng.integers(2, 9))
        size = min(size, n_in_clusters - i) or 1
        seed_words = _rand_words(rng, vocab, int(rng.integers(30, 401)))
        for m in range(size):
            if m == 0:
                words, role = seed_words, "seed"
            else:
                rate = EDIT_RATES[int(rng.integers(len(EDIT_RATES)))]
                words, role = _edit(rng, seed_words, vocab, rate), "near_dup"
            transcripts[i] = " ".join(words)
            roles[i] = role
            cluster_ids[i] = next_cluster
            i += 1
        next_cluster += 1

    # --- shared-passage pairs (~2%) ---
    n_pairs = max(1, n_clips // 100)
    for _ in range(n_pairs):
        if i + 1 >= n_clips:
            break
        passage = _rand_words(rng, vocab, int(rng.integers(20, 41)))
        for _ in range(2):
            pre = _rand_words(rng, vocab, int(rng.integers(10, 80)))
            post = _rand_words(rng, vocab, int(rng.integers(10, 80)))
            transcripts[i] = " ".join(pre + passage + post)
            roles[i] = "shared_passage"
            cluster_ids[i] = next_cluster
            i += 1
        next_cluster += 1

    # --- hot-band stressor: boilerplate sentence shared by ~0.5% (min 6) ---
    boiler = _rand_words(rng, vocab, 20)
    n_hot = max(6, n_clips // 200)
    for _ in range(n_hot):
        if i >= n_clips:
            break
        rest = _rand_words(rng, vocab, int(rng.integers(20, 120)))
        cut = int(rng.integers(len(rest) + 1))
        transcripts[i] = " ".join(rest[:cut] + boiler + rest[cut:])
        roles[i] = "hot_band"
        cluster_ids[i] = next_cluster
        i += 1
    next_cluster += 1

    # --- junk / edge rows ---
    edge_specs = [
        ("junk_singles", lambda r: " ".join(
            list("abcdefghijklmnopqrstuvwxyz"[int(x)] for x in r.integers(0, 26, 60)))),
        ("empty", lambda r: ""),
        ("short", lambda r: " ".join(_rand_words(r, vocab, int(r.integers(1, 14))))),
        ("diacritics", lambda r: " ".join(
            w + "é" if int(r.integers(2)) else w for w in _rand_words(r, vocab, 40))),
    ]
    n_edge = max(4, n_clips // 100)
    for k in range(n_edge):
        if i >= n_clips:
            break
        name, fn = edge_specs[k % len(edge_specs)]
        transcripts[i] = fn(_rng(seed, 2, k))
        roles[i] = name
        i += 1

    # --- exact duplicates under distinct clip_ids ---
    n_exact = max(2, n_clips // 200)
    base = _rand_words(rng, vocab, 60)
    for _ in range(n_exact):
        if i >= n_clips:
            break
        transcripts[i] = " ".join(base)
        roles[i] = "exact_dup"
        cluster_ids[i] = next_cluster
        i += 1
    next_cluster += 1

    # --- banished / excluded: near-dups of fresh seeds, labeled ---
    for role in ("banished", "excluded"):
        if i + 1 >= n_clips:
            break
        seed_words = _rand_words(rng, vocab, int(rng.integers(40, 120)))
        for m in range(2):
            words = seed_words if m == 0 else _edit(rng, seed_words, vocab, 0.05)
            transcripts[i] = " ".join(words)
            roles[i] = role if m == 0 else "near_dup"
            cluster_ids[i] = next_cluster
            i += 1
        next_cluster += 1

    # --- background fills the rest ---
    while i < n_clips:
        transcripts[i] = " ".join(_rand_words(rng, vocab, int(rng.integers(20, 200))))
        i += 1

    # --- audio columns (pure function of (seed, idx)) ---
    clip_ids = [f"clip_{k:08d}" for k in range(n_clips)]
    srs = np.array([SAMPLE_RATES[k % len(SAMPLE_RATES)] for k in range(n_clips)],
                   dtype=np.int32)
    dur_rng = _rng(seed, 3)
    durs = dur_rng.integers(dur_range_ms[0], dur_range_ms[1] + 1, n_clips).astype(
        np.int32
    )
    codecs = [CODECS[k % len(CODECS)] for k in range(n_clips)]
    if flac_every > 0:
        # real compressed rows (functions/flac.py); kept OUT of the default
        # rotation so benchmark corpora/caches stay comparable across rounds
        for k in range(1, n_clips, flac_every):
            codecs[k] = "flac"
    if include_stub_codec:
        for k in range(0, n_clips, 17):
            codecs[k] = "opus"
    blobs: list[bytes] = []
    for k in range(n_clips):
        if not with_audio or codecs[k] == "opus":
            blobs.append(b"")
            continue
        n_samp = int(srs[k]) * int(durs[k]) // 1000
        pcm = clip_signal(seed, k, int(srs[k]), n_samp)
        blobs.append(encode_clip(pcm, int(srs[k]), codecs[k]))

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
            "cluster_id": pa.array(cluster_ids, pa.int64()),
            "role": pa.array(roles, pa.string()),
        }
    )
    meta_rng = _rng(seed, 4)
    metadata = {}
    for k in range(n_clips):
        if int(meta_rng.integers(10)) == 0:
            metadata[clip_ids[k]] = {}  # missing entries exercise defaults
        else:
            metadata[clip_ids[k]] = {
                "author": f"author_{int(meta_rng.integers(50))}",
                "title": f"title_{k}",
                "year": int(meta_rng.integers(1700, 2026)),
            }
    return clips, truth, metadata


def write_corpus(
    out_dir: str, n_clips: int, seed: int = 42, shards: int = 64, **kw
) -> dict:
    """Write clips/ (sharded parquet dir — parallel reads + the resumable
    per-shard layout), truth.parquet and metadata.json under out_dir.

    64 shards with small row groups: the parquet DECODE runs one task per
    file (a single big row group cannot split across read tasks), so shard
    count — not SplitBlocks — sets read parallelism."""
    os.makedirs(out_dir, exist_ok=True)
    clips, truth, metadata = gen_corpus(n_clips, seed, **kw)
    clips_dir = os.path.join(out_dir, "clips")
    os.makedirs(clips_dir, exist_ok=True)
    shards = max(1, min(shards, n_clips))
    step = (n_clips + shards - 1) // shards
    for s in range(shards):
        part = clips.slice(s * step, step)
        if len(part):
            pq.write_table(
                part,
                os.path.join(clips_dir, f"part-{s:04d}.parquet"),
                row_group_size=max(64, step // 4),
            )
    pq.write_table(truth, os.path.join(out_dir, "truth.parquet"))
    with open(os.path.join(out_dir, "metadata.json"), "w") as f:
        json.dump(metadata, f)
    return {"n_clips": n_clips, "seed": seed, "dir": out_dir, "shards": shards}


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    print(write_corpus(args.out_dir, args.n, args.seed))
