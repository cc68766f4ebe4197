"""Audio near-duplicate detection — the dedup tier applied to the AUDIO
payload of the (clip_id, bytes, sr_hz, dur_ms, codec, transcript) table.

Same pipeline shape as the transcript engine (`pipelines/dedup.py` — the
reference's shingle→MinHash→LSH→verify chain, `/root/reference/intertext/
intertext.py:420-520`), with audio-native kernels swapped in:

  decode → per-frame 16-bit subfingerprints (Haitsma–Kalker, pure numpy,
  `functions/audio_fp.py`) → g-frame shingle keys → the SAME bucketed
  candidate shuffle with hot-band cap (`stages/candidates.py`) → bucketed
  two-phase hash join pulling both fingerprint sequences → vectorized
  bit-error-rate verification at the candidate frame offset → best-offset
  pair table → union-find clusters.

Scale notes (100 TB): fingerprints are ~30 uint32 per second of audio —
a 10^5x reduction — so everything past the decode stage shuffles slim
rows; the decode stage itself is an elastic task-pool map_batches with
byte-bounded batches (same as `stages/audio.py`); candidate emission
reuses the capped, bucketed band shuffle; verification co-groups by pair
key — no broadcast of the fingerprint table and no driver materialization
anywhere except the final pair list (pairs ≪ corpus, same justification
as the text path's union-find).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.config import IntertextConfig
from intertext_ray.functions.audio import decode_clip
from intertext_ray.functions.audio_fp import (
    ber_at_offset,
    shingle_keys,
    subfingerprints,
)
from intertext_ray.functions.hashing import splitmix64
from intertext_ray.sources.clips import doc_ids_for_clip_ids

_U64 = np.uint64


def _fp_batch(batch: pa.Table) -> pa.Table:
    """clips batch -> (clip_id, doc_id, n_frames, subfps) rows.  Clips that
    fail to decode (stub codecs, malformed payloads) emit empty subfps."""
    blobs = batch["bytes"].to_pylist()
    srs = batch["sr_hz"].to_numpy(zero_copy_only=False)
    codecs = batch["codec"].to_pylist()
    doc = doc_ids_for_clip_ids(batch["clip_id"])
    fps: list[np.ndarray] = []
    nf = np.zeros(len(batch), dtype=np.int64)
    for i in range(len(batch)):
        try:
            pcm = decode_clip(blobs[i], int(srs[i]), codecs[i])
            f = subfingerprints(pcm, int(srs[i]))
        except Exception:
            f = np.zeros(0, dtype=np.uint32)
        nf[i] = len(f)
        fps.append(f)
    # packed uint32 list column straight from the numpy buffers — half the
    # width of int64 and no per-clip Python list materialization
    offsets = np.zeros(len(batch) + 1, dtype=np.int32)
    np.cumsum(nf, out=offsets[1:])
    values = (
        np.concatenate(fps) if fps else np.zeros(0, np.uint32)
    ).astype(np.uint32)
    subfps = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(values, pa.uint32())
    )
    return pa.table(
        {
            "clip_id": batch["clip_id"],
            "doc_id": pa.array(doc, pa.uint64()),
            "n_frames": pa.array(nf, pa.int64()),
            "subfps": subfps,
        }
    )


def audio_fingerprints(clips: ray.data.Dataset, batch_size: int = 64) -> ray.data.Dataset:
    """(clip_id, doc_id, n_frames, subfps:list<uint32>) per clip.  Small
    batch_size: rows carry whole encoded payloads (bytes bound memory, not
    row count), exactly like `stages/audio.py`."""
    return clips.map_batches(
        _fp_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
        zero_copy_batch=True,
    )


def _explode_shingles(g: int, probes: int = 0):
    """Per-clip shingle-key emission.  ``probes=1`` additionally emits
    every Hamming-1 neighbor of each key (16*g extra rows per shingle):
    one-sided probing suffices — if true aligned shingles differ in one
    bit, flipping that bit on either side produces a key collision."""
    n_bits = 16 * g
    flip = np.concatenate(
        [[_U64(0)], (_U64(1) << np.arange(n_bits, dtype=_U64))]
    ) if probes else np.array([0], dtype=_U64)

    def fn(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        subl = batch["subfps"]
        if isinstance(subl, pa.ChunkedArray):
            subl = subl.combine_chunks()
        flat = subl.values.to_numpy(zero_copy_only=False)
        offs = subl.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        bands: list[np.ndarray] = []
        docs: list[np.ndarray] = []
        wins: list[np.ndarray] = []
        for i in range(len(batch)):
            f = flat[offs[i] : offs[i + 1]].astype(np.uint32)
            k = shingle_keys(f, g)
            if len(k) == 0:
                continue
            w = np.arange(len(k), dtype=np.int64)
            if len(flip) > 1:
                k = (k[None, :] ^ flip[:, None]).ravel()
                w = np.tile(w, len(flip))
            bands.append(splitmix64(k))
            docs.append(np.full(len(k), doc[i], dtype=_U64))
            wins.append(w)
        if not bands:
            return pa.table(
                {
                    "band": pa.array([], pa.uint64()),
                    "doc_id": pa.array([], pa.uint64()),
                    "window_id": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "band": pa.array(np.concatenate(bands), pa.uint64()),
                "doc_id": pa.array(np.concatenate(docs), pa.uint64()),
                "window_id": pa.array(np.concatenate(wins), pa.int64()),
            }
        )

    return fn


def audio_candidates(
    fps: ray.data.Dataset,
    g: int = 1,
    cap: int = 512,
    num_buckets: int = 64,
    max_offset: int | None = 8,
    probes: int = 0,
) -> ray.data.Dataset:
    """Exact-shingle LSH: clips sharing any ``g`` consecutive identical
    subfingerprints become candidate pairs, with the capped bucketed band
    shuffle reused verbatim from the text engine.  Output: distinct
    (clip_a, clip_b, offset) with offset = frame_a - frame_b, restricted
    to |offset| <= max_offset (bounded desync; None = unbounded).

    Recall/entropy tradeoff (measured on the planted fixture): g=1
    (16-bit keys) finds every dup pair with aligned BER <= ~0.18 directly
    and the 0.18-0.25 tail transitively through cluster structure; g=2
    (32-bit keys) needs ``probes=1`` (Hamming-1 multi-probe, 33x shingle
    rows) for comparable recall.  At 10^12-clip scale the 16-bit key space
    saturates — raise g (and probes) so key entropy matches corpus size;
    the hot-band cap + verification keep correctness either way."""
    from intertext_ray.stages.candidates import candidates_stage

    shingles = fps.map_batches(
        _explode_shingles(g, probes), batch_format="pyarrow", zero_copy_batch=True
    )
    cfg = IntertextConfig(band_docs_cap=cap)
    cands = candidates_stage(shingles, cfg, num_buckets=num_buckets, dedup=False)

    nb = _U64(num_buckets)

    def to_offsets(t: pa.Table) -> pa.Table:
        da = t["doc_a"].to_numpy(zero_copy_only=False).astype(_U64)
        db = t["doc_b"].to_numpy(zero_copy_only=False).astype(_U64)
        off = t["win_a"].to_numpy(zero_copy_only=False).astype(np.int64) - t[
            "win_b"
        ].to_numpy(zero_copy_only=False).astype(np.int64)
        if max_offset is not None:
            m = np.abs(off) <= max_offset
            da, db, off = da[m], db[m], off[m]
        bucket = (splitmix64(splitmix64(da) ^ db) % nb).astype(np.int64)
        return pa.table(
            {
                "clip_a": pa.array(da, pa.uint64()),
                "clip_b": pa.array(db, pa.uint64()),
                "offset": pa.array(off, pa.int64()),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    def uniq(gtab: pa.Table) -> pa.Table:
        a = gtab["clip_a"].to_numpy(zero_copy_only=False)
        b = gtab["clip_b"].to_numpy(zero_copy_only=False)
        o = gtab["offset"].to_numpy(zero_copy_only=False)
        order = np.lexsort((o, b, a))
        a, b, o = a[order], b[order], o[order]
        keep = np.ones(len(a), dtype=bool)
        if len(a) > 1:
            keep[1:] = ~(
                (a[1:] == a[:-1]) & (b[1:] == b[:-1]) & (o[1:] == o[:-1])
            )
        return pa.table(
            {
                "clip_a": pa.array(a[keep], pa.uint64()),
                "clip_b": pa.array(b[keep], pa.uint64()),
                "offset": pa.array(o[keep], pa.int64()),
            }
        )

    return (
        cands.map_batches(to_offsets, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(uniq, batch_format="pyarrow")
    )


_RESOLVED_SCHEMA = pa.schema(
    [
        ("clip_a", pa.uint64()),
        ("clip_b", pa.uint64()),
        ("offset", pa.int64()),
        ("side", pa.int8()),
        ("fps", pa.list_(pa.uint32())),
    ]
)

_PAIR_SCHEMA = pa.schema(
    [
        ("clip_a", pa.uint64()),
        ("clip_b", pa.uint64()),
        ("offset", pa.int64()),
        ("overlap", pa.int64()),
        ("ber", pa.float64()),
    ]
)


def _join_helpers(nb: np.uint64):
    """The bucketed two-phase hash-join plumbing shared by
    ``verify_audio_pairs`` and ``verify_audio_spans``: tag fingerprint
    rows and candidate requests into clip-hash buckets, resolve each
    request side to its clip's fingerprint list (vectorized searchsorted
    + zero-copy Arrow take), then re-bucket resolved rows by pair hash."""
    def tag_fps(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(_U64)
        return pa.table(
            {
                "bucket": pa.array(
                    (splitmix64(doc) % nb).astype(np.int64), pa.int64()
                ),
                "kind": pa.array(np.zeros(len(t), np.int8), pa.int8()),
                "doc": t["doc_id"],
                "clip_a": pa.array(np.zeros(len(t), _U64), pa.uint64()),
                "clip_b": pa.array(np.zeros(len(t), _U64), pa.uint64()),
                "offset": pa.array(np.zeros(len(t), np.int64), pa.int64()),
                "fps": t["subfps"],
            }
        )

    def tag_requests(t: pa.Table) -> pa.Table:
        a = t["clip_a"].to_numpy(zero_copy_only=False).astype(_U64)
        b = t["clip_b"].to_numpy(zero_copy_only=False).astype(_U64)
        o = t["offset"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.concatenate([a, b])
        return pa.table(
            {
                "bucket": pa.array(
                    (splitmix64(doc) % nb).astype(np.int64), pa.int64()
                ),
                "kind": pa.array(np.ones(2 * len(t), np.int8), pa.int8()),
                "doc": pa.array(doc, pa.uint64()),
                "clip_a": pa.array(np.concatenate([a, a]), pa.uint64()),
                "clip_b": pa.array(np.concatenate([b, b]), pa.uint64()),
                "offset": pa.array(np.concatenate([o, o]), pa.int64()),
                "fps": pa.array([[]] * (2 * len(t)), pa.list_(pa.uint32())),
            }
        )

    def resolve(gtab: pa.Table) -> pa.Table:
        """Vectorized hash-join half: map each request row to its clip's
        fingerprint row via searchsorted, gather the list column with a
        zero-copy Arrow ``take`` — no per-row Python."""
        kind = gtab["kind"].to_numpy(zero_copy_only=False)
        doc = gtab["doc"].to_numpy(zero_copy_only=False)
        fps_col = gtab["fps"]
        if isinstance(fps_col, pa.ChunkedArray):
            fps_col = fps_col.combine_chunks()
        src_rows = np.nonzero(kind == 0)[0]
        req = np.nonzero(kind == 1)[0]
        if len(req) == 0 or len(src_rows) == 0:
            return _RESOLVED_SCHEMA.empty_table()
        src_docs = doc[src_rows]
        order = np.argsort(src_docs, kind="stable")
        src_docs, src_rows = src_docs[order], src_rows[order]
        pos = np.searchsorted(src_docs, doc[req])
        ok = (pos < len(src_docs)) & (
            src_docs[np.minimum(pos, len(src_docs) - 1)] == doc[req]
        )
        req = req[ok]
        gather = src_rows[pos[ok]]
        a = gtab["clip_a"].to_numpy(zero_copy_only=False)[req]
        b = gtab["clip_b"].to_numpy(zero_copy_only=False)[req]
        o = gtab["offset"].to_numpy(zero_copy_only=False)[req]
        side = np.where(doc[req] == a, np.int8(0), np.int8(1))
        return pa.table(
            {
                "clip_a": pa.array(a, pa.uint64()),
                "clip_b": pa.array(b, pa.uint64()),
                "offset": pa.array(o, pa.int64()),
                "side": pa.array(side, pa.int8()),
                "fps": fps_col.take(pa.array(gather, pa.int64())),
            },
            schema=_RESOLVED_SCHEMA,
        )

    def pair_bucket(t: pa.Table) -> pa.Table:
        a = t["clip_a"].to_numpy(zero_copy_only=False).astype(_U64)
        b = t["clip_b"].to_numpy(zero_copy_only=False).astype(_U64)
        return t.append_column(
            "bucket",
            pa.array((splitmix64(splitmix64(a) ^ b) % nb).astype(np.int64)),
        )

    return tag_fps, tag_requests, resolve, pair_bucket


def verify_audio_pairs(
    candidates: ray.data.Dataset,
    fps: ray.data.Dataset,
    max_ber: float = 0.25,
    min_overlap: int = 6,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Bucketed two-phase hash join + BER verification (the audio analog of
    `stages/verify.verify_hash_join`): phase 1 co-locates each candidate
    side with its clip's fingerprint sequence by clip-hash bucket; phase 2
    co-locates the two resolved sides by pair-hash bucket and scores the
    alignment.  Keeps the best (lowest-BER, then smallest |offset|)
    qualifying alignment per (clip_a, clip_b)."""
    nb = _U64(num_buckets)

    tag_fps, tag_requests, resolve, pair_bucket = _join_helpers(nb)

    def score(gtab: pa.Table) -> pa.Table:
        """Pair the two resolved sides (vectorized run detection over the
        sorted rows) and score each pair's BER directly against the list
        column's flat value buffer — the only per-pair step is the BER
        slice, itself a vectorized popcount."""
        a = gtab["clip_a"].to_numpy(zero_copy_only=False)
        b = gtab["clip_b"].to_numpy(zero_copy_only=False)
        o = gtab["offset"].to_numpy(zero_copy_only=False)
        side = gtab["side"].to_numpy(zero_copy_only=False)
        fps_col = gtab["fps"]
        if isinstance(fps_col, pa.ChunkedArray):
            fps_col = fps_col.combine_chunks()
        flat = fps_col.values.to_numpy(zero_copy_only=False).astype(np.uint32)
        offs = fps_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((side, o, b, a))
        a, b, o, side = a[order], b[order], o[order], side[order]
        # consecutive (side0, side1) rows with equal (a, b, o) form a pair
        if len(order) < 2:
            return _PAIR_SCHEMA.empty_table()
        first = (
            (a[:-1] == a[1:])
            & (b[:-1] == b[1:])
            & (o[:-1] == o[1:])
            & (side[:-1] == 0)
            & (side[1:] == 1)
        )
        p0 = np.nonzero(first)[0]
        out = {"clip_a": [], "clip_b": [], "offset": [], "overlap": [], "ber": []}
        r0s, r1s = order[p0], order[p0 + 1]
        for i in range(len(p0)):
            r0, r1 = r0s[i], r1s[i]
            fa = flat[offs[r0] : offs[r0 + 1]]
            fb = flat[offs[r1] : offs[r1 + 1]]
            ov, ber = ber_at_offset(fa, fb, int(o[p0[i]]))
            if ov >= min_overlap and ber <= max_ber:
                out["clip_a"].append(a[p0[i]])
                out["clip_b"].append(b[p0[i]])
                out["offset"].append(o[p0[i]])
                out["overlap"].append(ov)
                out["ber"].append(ber)
        return pa.table(
            {
                "clip_a": pa.array(out["clip_a"], pa.uint64()),
                "clip_b": pa.array(out["clip_b"], pa.uint64()),
                "offset": pa.array(out["offset"], pa.int64()),
                "overlap": pa.array(out["overlap"], pa.int64()),
                "ber": pa.array(out["ber"], pa.float64()),
            },
            schema=_PAIR_SCHEMA,
        )

    def best_per_pair(gtab: pa.Table) -> pa.Table:
        a = gtab["clip_a"].to_numpy(zero_copy_only=False)
        b = gtab["clip_b"].to_numpy(zero_copy_only=False)
        o = gtab["offset"].to_numpy(zero_copy_only=False)
        ov = gtab["overlap"].to_numpy(zero_copy_only=False)
        ber = gtab["ber"].to_numpy(zero_copy_only=False)
        order = np.lexsort((o, np.abs(o), ber, b, a))
        a, b, o, ov, ber = a[order], b[order], o[order], ov[order], ber[order]
        keep = np.ones(len(a), dtype=bool)
        if len(a) > 1:
            keep[1:] = ~((a[1:] == a[:-1]) & (b[1:] == b[:-1]))
        return pa.table(
            {
                "clip_a": pa.array(a[keep], pa.uint64()),
                "clip_b": pa.array(b[keep], pa.uint64()),
                "offset": pa.array(o[keep], pa.int64()),
                "overlap": pa.array(ov[keep], pa.int64()),
                "ber": pa.array(ber[keep], pa.float64()),
            },
            schema=_PAIR_SCHEMA,
        )

    tagged = fps.map_batches(
        tag_fps, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        candidates.map_batches(
            tag_requests, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    resolved = tagged.groupby("bucket").map_groups(
        resolve, batch_format="pyarrow"
    )
    scored = (
        resolved.map_batches(
            pair_bucket, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bucket")
        .map_groups(score, batch_format="pyarrow")
    )
    return (
        scored.map_batches(
            pair_bucket, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bucket")
        .map_groups(best_per_pair, batch_format="pyarrow")
    )


def audio_dup_pairs(
    clips: ray.data.Dataset,
    g: int = 1,
    cap: int = 512,
    max_ber: float = 0.25,
    min_overlap: int = 6,
    num_buckets: int = 64,
    max_offset: int | None = 8,
    probes: int = 0,
    work_dir: str | None = None,
) -> ray.data.Dataset:
    """Full chain: decode → subfingerprints → shingle LSH → BER verify.
    Returns (clip_a, clip_b, offset, overlap, ber), clip ids as the uint64
    doc ids of `sources/clips.doc_ids_for_clip_ids`.

    The fingerprint table feeds BOTH the candidate chain and the verify
    join; it is materialized once so the audio decode (the only stage that
    touches the heavy payload) runs exactly once.  Fingerprints are ~10^5x
    smaller than the audio, so holding them in the object store is the
    designed artifact (the audio analog of the minhash checkpoint).

    ``work_dir`` switches the fingerprint and verified-pair artifacts to
    durable parquet checkpoints (`state/checkpoint.CheckpointStore`, same
    manifest/resume contract as the transcript chain): a resumed run skips
    the decode entirely, and a changed semantic knob recomputes."""
    store = None
    if work_dir is not None:
        import hashlib

        from intertext_ray.state.checkpoint import CheckpointStore

        # fp2: subfps packed as list<uint32> — distinct key so a resumed
        # run never unions stale list<int64> fingerprint checkpoints
        sem = f"audio:fp2:g={g}:cap={cap}:ber={max_ber}:ov={min_overlap}:off={max_offset}:probes={probes}"
        store = CheckpointStore(
            work_dir, hashlib.sha256(sem.encode()).hexdigest()[:16]
        )
        if store.is_complete("audio_dup_pairs"):
            return store.load("audio_dup_pairs")
        fps = store.get_or_compute(
            "audio_fps", lambda: audio_fingerprints(clips), upstream=["clips"]
        )
    else:
        fps = audio_fingerprints(clips).materialize()
    cands = audio_candidates(
        fps,
        g=g,
        cap=cap,
        num_buckets=num_buckets,
        max_offset=max_offset,
        probes=probes,
    )
    pairs = verify_audio_pairs(
        cands,
        fps,
        max_ber=max_ber,
        min_overlap=min_overlap,
        num_buckets=num_buckets,
    )
    if store is not None:
        return store.save("audio_dup_pairs", pairs, upstream=["audio_fps"])
    return pairs


def audio_dup_clusters(pairs: ray.data.Dataset) -> pa.Table:
    """Verified pairs -> (clip_id, audio_cluster_id): connected components
    with min-member labels (driver union-find — pair graph ≪ corpus, same
    justification and escape hatch as the transcript path)."""
    from intertext_ray.stages.cluster import _cc_min_label

    aa, bb = [], []
    for batch in pairs.iter_batches(batch_format="pyarrow"):
        aa.append(batch["clip_a"].to_numpy(zero_copy_only=False))
        bb.append(batch["clip_b"].to_numpy(zero_copy_only=False))
    if not aa or not sum(len(x) for x in aa):
        return pa.table(
            {
                "clip_id": pa.array([], pa.uint64()),
                "audio_cluster_id": pa.array([], pa.uint64()),
            }
        )
    u = np.concatenate(aa)
    v = np.concatenate(bb)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    label = _cc_min_label(inv[: len(u)], inv[len(u) :], len(nodes))
    return pa.table(
        {
            "clip_id": pa.array(nodes, pa.uint64()),
            "audio_cluster_id": pa.array(nodes[label], pa.uint64()),
        }
    )


def audio_cluster_canonicals(
    pairs: ray.data.Dataset,
    clips: ray.data.Dataset,
) -> pa.Table:
    """(audio_cluster_id, survivor_clip_id, n_members, survivor_dur_ms) —
    the POLICY survivor face for the audio chain: per fingerprint dup
    cluster keep the LONGEST member (max dur_ms, tiebreak min numeric
    id).  Speech dedup keeps the longest recording because perturbed
    copies (re-encodes, trims, padded re-uploads) are usually truncations
    of it — the audio analog of `minhash_doc.minhash_doc_canonicals`'s
    longest-text rule.

    Decode-free: the policy reads only (clip_id, dur_ms) metadata — no
    payload bytes move.  Scale shape: cluster membership is
    pair-graph-sized, broadcast once; the clips side streams through a
    row-local searchsorted filter emitting member rows only; the
    per-cluster argmax runs on the driver over pair-graph-sized rows.
    Rows-only driver check (the fingerprint chain is not
    SQL-expressible); the policy itself is pinned in
    tests/test_audio_dedup.py against a pandas argmax reference."""
    cl = audio_dup_clusters(pairs)
    empty = pa.table(
        {
            "audio_cluster_id": pa.array([], pa.int64()),
            "survivor_clip_id": pa.array([], pa.string()),
            "n_members": pa.array([], pa.int64()),
            "survivor_dur_ms": pa.array([], pa.int64()),
        }
    )
    if len(cl) == 0:
        return empty
    mem = cl["clip_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    labels = cl["audio_cluster_id"].to_numpy(zero_copy_only=False).astype(
        np.uint64
    )
    ref = ray.put(np.sort(mem))

    def member_meta(batch: pa.Table) -> pa.Table:
        mm = ray.get(ref)
        num = doc_ids_for_clip_ids(batch["clip_id"])
        pos = np.searchsorted(mm, num)
        hit = (pos < len(mm)) & (mm[np.minimum(pos, len(mm) - 1)] == num)
        sub = batch.filter(pa.array(hit))
        return pa.table(
            {
                "num_id": pa.array(num[hit], pa.uint64()),
                "clip_id": sub["clip_id"],
                "dur_ms": pa.array(
                    sub["dur_ms"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    meta = (
        clips.select_columns(["clip_id", "dur_ms"])
        .map_batches(member_meta, batch_format="pyarrow")
        .to_pandas()
        .set_index("num_id")
    )
    dur = meta["dur_ms"].reindex(mem).to_numpy()
    names = meta["clip_id"].reindex(mem).to_numpy()
    # argmax per cluster: dur_ms DESC, numeric id ASC (lexsort: last key
    # is primary)
    srt = np.lexsort((mem, -dur, labels))
    lab_s = labels[srt]
    first = np.ones(len(lab_s), dtype=bool)
    first[1:] = lab_s[1:] != lab_s[:-1]
    _, member_counts = np.unique(lab_s, return_counts=True)
    return pa.table(
        {
            "audio_cluster_id": pa.array(
                lab_s[first].astype(np.int64), pa.int64()
            ),
            "survivor_clip_id": pa.array(
                [str(x) for x in names[srt][first]], pa.string()
            ),
            "n_members": pa.array(member_counts, pa.int64()),
            "survivor_dur_ms": pa.array(
                dur[srt][first].astype(np.int64), pa.int64()
            ),
        }
    )
