"""Exact audio deduplication by decoded-PCM identity — codec-independent.

A web-scale audio corpus carries byte-level near-copies that no LSH is
needed for: the SAME samples re-containered (raw s16le vs WAV), or
re-uploaded losslessly.  Hashing the *payload bytes* misses those (the
container differs); hashing the *decoded samples* catches them.  This is
the audio analogue of ``ops/exact_dedup.py`` (reference parity note:
intertext has no audio stage — `intertext.py` is transcript-only; this op
is part of the additive audio family required by the input contract).

The content key is an order-sensitive **moment checksum** over the decoded
int16 stream, chosen so a DuckDB twin can recompute it exactly:

    t_i = s_i + 32769                    (1 .. 65537, never zero)
    ck1 = sum_i (i+1)   * t_i   mod 2^64
    ck2 = sum_i (i+1)^2 * t_i   mod 2^64

Equality key = (n_samples, ck1, ck2).  The first-moment weight makes the
sum order-sensitive (transpositions move ck1), the second moment breaks
the remaining linear symmetries; both are ring homomorphisms mod 2^64 so
numpy wraparound and SQL ``% 2^64`` agree bit-for-bit.  It is a checksum,
not a cryptographic hash — an adversarial corpus could engineer a
collision; swap ``pcm_checksum`` for sha1-of-sample-bytes (pattern:
``exact_dedup.add_content_hash``) when that matters.  For dedup of
honest re-encodes the collision odds are ~2^-128 per pair.

Scale: decode + checksum is stateless row-local ``map_batches`` (payload
dropped immediately — only 3 u64 + id leave the worker, ~10^5x smaller
than the audio); the only exchange is ONE bucketed groupby over those slim
rows with a vectorized first-per-key inside each bucket (same physical
plan as ``exact_dedup``).  Decontamination broadcasts the eval-side
checksum set (benchmark-sized by nature) — zero shuffle on the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.functions.audio import decode_clip, encode_pcm_s16le

_SQL_CODECS = ("pcm_s16le", "wav", "ulaw", "alaw")


def pcm_checksum(pcm: np.ndarray) -> tuple[int, int]:
    """(ck1, ck2) moment checksum of one int16 sample array (pure
    function, reused by tests and the decontam broadcast side)."""
    t = (pcm.astype(np.int64) + 32769).astype(np.uint64)
    w = np.arange(1, len(t) + 1, dtype=np.uint64)
    ck1 = int((w * t).sum(dtype=np.uint64))
    ck2 = int((w * w * t).sum(dtype=np.uint64))
    return ck1, ck2


def pcm_checksums(
    clips: ray.data.Dataset,
    codecs: tuple[str, ...] = _SQL_CODECS,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Slim content-key rows: (clip_id, n_samples, ck1, ck2).  Decodes and
    drops the payload inside the batch — nothing heavy leaves the worker."""
    keep = set(codecs)

    def fn(batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        srs = batch["sr_hz"].to_numpy(zero_copy_only=False)
        cod = batch["codec"].to_pylist()
        ids = batch["clip_id"].to_pylist()
        oid, on, o1, o2 = [], [], [], []
        for i in range(len(batch)):
            if cod[i] not in keep:
                continue
            pcm = decode_clip(blobs[i], int(srs[i]), cod[i])
            c1, c2 = pcm_checksum(pcm)
            oid.append(ids[i])
            on.append(len(pcm))
            o1.append(c1)
            o2.append(c2)
        return pa.table(
            {
                "clip_id": pa.array(oid, pa.string()),
                "n_samples": pa.array(on, pa.int64()),
                "ck1": pa.array(np.asarray(o1, np.uint64), pa.uint64()),
                "ck2": pa.array(np.asarray(o2, np.uint64), pa.uint64()),
            }
        )

    return clips.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, num_cpus=1
    )


def _group_summary(group: pa.Table, min_size: int) -> pa.Table:
    """Vectorized per-bucket grouping: sort by (key, clip_id), run masks,
    emit one row per member of every group with >= min_size members."""
    n = len(group)
    empty = pa.table(
        {
            "clip_id": pa.array([], pa.string()),
            "group_id": pa.array([], pa.string()),
            "group_size": pa.array([], pa.int64()),
            "n_samples": pa.array([], pa.int64()),
        }
    )
    if n == 0:
        return empty
    ns = group["n_samples"].to_numpy(zero_copy_only=False)
    c1 = group["ck1"].to_numpy(zero_copy_only=False)
    c2 = group["ck2"].to_numpy(zero_copy_only=False)
    ids = np.asarray(group["clip_id"].to_pylist(), dtype=object)
    order = np.lexsort((ids, c2, c1, ns))
    sn, s1, s2, si = ns[order], c1[order], c2[order], ids[order]
    head = np.ones(n, dtype=bool)
    head[1:] = (sn[1:] != sn[:-1]) | (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])
    starts = np.nonzero(head)[0]
    counts = np.diff(np.concatenate([starts, [n]]))
    keep_g = counts >= min_size
    if not keep_g.any():
        return empty
    starts, counts = starts[keep_g], counts[keep_g]
    gid = np.repeat(si[starts], counts)
    member_idx = np.concatenate(
        [np.arange(s, s + c) for s, c in zip(starts, counts)]
    )
    return pa.table(
        {
            "clip_id": pa.array(list(si[member_idx]), pa.string()),
            "group_id": pa.array(list(gid), pa.string()),
            "group_size": pa.array(
                np.repeat(counts, counts).astype(np.int64), pa.int64()
            ),
            "n_samples": pa.array(sn[member_idx].astype(np.int64), pa.int64()),
        }
    )


def audio_exact_dup_groups(
    clips: ray.data.Dataset,
    num_buckets: int = 32,
    codecs: tuple[str, ...] = _SQL_CODECS,
) -> ray.data.Dataset:
    """(clip_id, group_id, group_size, n_samples) for every clip whose
    decoded PCM is identical to at least one other clip's.  ``group_id`` is
    the lexicographically smallest member id (the canonical keeper)."""
    nb = np.uint64(num_buckets)

    def bucketed(b: pa.Table) -> pa.Table:
        h = b["ck1"].to_numpy(zero_copy_only=False)
        return b.append_column("bucket", pa.array((h % nb).astype(np.int64)))

    return (
        pcm_checksums(clips, codecs=codecs)
        .map_batches(bucketed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: _group_summary(g.drop_columns(["bucket"]), 2),
            batch_format="pyarrow",
        )
    )


def audio_exact_survivor_ids(
    clips: ray.data.Dataset,
    num_buckets: int = 32,
    codecs: tuple[str, ...] = _SQL_CODECS,
) -> ray.data.Dataset:
    """(clip_id, n_samples) of the keeper of every decoded-PCM identity
    group plus all unique clips — the slim id set to semi-join the payload
    table against (the payload never rides this shuffle; rejoin with the
    bucketed-join pattern of ``stages/verify.py`` when the full rows are
    needed downstream)."""
    nb = np.uint64(num_buckets)

    def bucketed(b: pa.Table) -> pa.Table:
        h = b["ck1"].to_numpy(zero_copy_only=False)
        return b.append_column("bucket", pa.array((h % nb).astype(np.int64)))

    def keepers(group: pa.Table) -> pa.Table:
        g = _group_summary(group.drop_columns(["bucket"]), 1)
        mask = pa.compute.equal(g["clip_id"], g["group_id"])
        return g.filter(mask).select(["clip_id", "n_samples"])

    return (
        pcm_checksums(clips, codecs=codecs)
        .map_batches(bucketed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(keepers, batch_format="pyarrow")
    )


def audio_decontam(
    clips: ray.data.Dataset,
    eval_clips: ray.data.Dataset,
    codecs: tuple[str, ...] = _SQL_CODECS,
) -> ray.data.Dataset:
    """Drop corpus clips whose decoded PCM exactly matches any eval-set
    clip (the audio analogue of ``ops/decontam.py``): the eval side is
    benchmark-sized by nature, so its checksum set is collected once and
    broadcast via ``ray.put`` — the corpus side is a stateless row-local
    filter, zero shuffles.  Returns surviving (clip_id, n_samples)."""
    import ray

    eval_keys = set()
    for b in pcm_checksums(eval_clips, codecs=codecs).iter_batches(
        batch_format="pyarrow"
    ):
        eval_keys.update(
            zip(
                b["n_samples"].to_pylist(),
                b["ck1"].to_pylist(),
                b["ck2"].to_pylist(),
            )
        )
    ref = ray.put(eval_keys)

    class Filter:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ns = b["n_samples"].to_pylist()
            c1 = b["ck1"].to_pylist()
            c2 = b["ck2"].to_pylist()
            mask = pa.array(
                [(n, a, b2) not in self.keys for n, a, b2 in zip(ns, c1, c2)]
            )
            return b.filter(mask).select(["clip_id", "n_samples"])

    return pcm_checksums(clips, codecs=codecs).map_batches(
        Filter, batch_format="pyarrow", concurrency=(1, 8)
    )


def plant_pcm_copies(
    clips: ray.data.Dataset,
    mod: int = 3,
    codecs: tuple[str, ...] = _SQL_CODECS,
    suffix: str = "#pcm",
) -> ray.data.Dataset:
    """Fixture helper (used by tests and the driver face): union the input
    with a raw-``pcm_s16le`` re-container of every clip whose numeric id is
    divisible by ``mod`` — each planted copy decodes to EXACTLY the
    original's samples, so it forms a decoded-PCM identity pair with it."""
    from intertext_ray.sources.clips import doc_ids_for_clip_ids

    keep = set(codecs)
    m = np.uint64(mod)

    def fn(batch: pa.Table) -> pa.Table:
        num = doc_ids_for_clip_ids(batch["clip_id"])
        sel = batch.filter(pa.array(num % m == 0))
        blobs = sel["bytes"].to_pylist()
        srs = sel["sr_hz"].to_numpy(zero_copy_only=False)
        cod = sel["codec"].to_pylist()
        ids = sel["clip_id"].to_pylist()
        names = sel.column_names
        ob, oc, oi = [], [], []
        rows = []
        for i in range(len(sel)):
            if cod[i] not in keep:
                continue
            pcm = decode_clip(blobs[i], int(srs[i]), cod[i])
            ob.append(encode_pcm_s16le(pcm))
            oc.append("pcm_s16le")
            oi.append(ids[i] + suffix)
            rows.append(i)
        sub = sel.take(np.asarray(rows, np.int64))
        sub = sub.set_column(
            names.index("clip_id"), "clip_id", pa.array(oi, pa.string())
        )
        sub = sub.set_column(
            names.index("bytes"), "bytes", pa.array(ob, pa.binary())
        )
        sub = sub.set_column(
            names.index("codec"), "codec", pa.array(oc, pa.string())
        )
        return pa.concat_tables([batch, sub]).combine_chunks()

    return clips.map_batches(fn, batch_format="pyarrow", batch_size=64)


def norm_pcm_checksums(
    clips: ray.data.Dataset,
    target_peak: int = 30000,
    codecs: tuple[str, ...] = _SQL_CODECS,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Slim GAIN-INVARIANT content keys: the moment checksum of the
    PEAK-NORMALIZED decoded samples (`ops/audio_gain.normalize_peak_pcm`,
    integer-exact).  Two clips that differ only by a lossless integer
    re-gain normalize to identical sample vectors — the audio analogue of
    the text fold in `ops/norm_dedup` (raw-exact misses them, MinHash is
    overkill for them)."""
    from intertext_ray.ops.audio_gain import normalize_peak_pcm

    keep = set(codecs)
    tp = int(target_peak)

    def fn(batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        srs = batch["sr_hz"].to_numpy(zero_copy_only=False)
        cod = batch["codec"].to_pylist()
        ids = batch["clip_id"].to_pylist()
        oid, on, o1, o2 = [], [], [], []
        for i in range(len(batch)):
            if cod[i] not in keep:
                continue
            pcm = normalize_peak_pcm(
                decode_clip(blobs[i], int(srs[i]), cod[i]), tp
            )
            c1, c2 = pcm_checksum(pcm)
            oid.append(ids[i])
            on.append(len(pcm))
            o1.append(c1)
            o2.append(c2)
        return pa.table(
            {
                "clip_id": pa.array(oid, pa.string()),
                "n_samples": pa.array(on, pa.int64()),
                "ck1": pa.array(np.asarray(o1, np.uint64), pa.uint64()),
                "ck2": pa.array(np.asarray(o2, np.uint64), pa.uint64()),
            }
        )

    return clips.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, num_cpus=1
    )


def audio_norm_exact_dup_groups(
    clips: ray.data.Dataset,
    target_peak: int = 30000,
    num_buckets: int = 32,
    codecs: tuple[str, ...] = _SQL_CODECS,
) -> ray.data.Dataset:
    """(clip_id, group_id, group_size, n_samples) for every clip whose
    PEAK-NORMALIZED PCM is identical to another's — the gain-invariant
    exact tier (raw-exact groups are a subset: identical samples stay
    identical after the same normalization).  Same slim-row bucketed
    groupby plan as :func:`audio_exact_dup_groups`."""
    nb = np.uint64(num_buckets)

    def bucketed(b: pa.Table) -> pa.Table:
        h = b["ck1"].to_numpy(zero_copy_only=False)
        return b.append_column("bucket", pa.array((h % nb).astype(np.int64)))

    return (
        norm_pcm_checksums(clips, target_peak=target_peak, codecs=codecs)
        .map_batches(bucketed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: _group_summary(g.drop_columns(["bucket"]), 2),
            batch_format="pyarrow",
        )
    )


def plant_gain_copies(
    clips: ray.data.Dataset,
    mod: int = 4,
    gain_num: int = 2,
    gain_den: int = 1,
    codecs: tuple[str, ...] = _SQL_CODECS,
    suffix: str = "#gain",
) -> ray.data.Dataset:
    """Fixture helper (tests + driver face): union the input with an
    integer re-GAINED pcm_s16le copy of every clip whose numeric id
    divides ``mod``.  When the gain never clips, original and copy
    peak-normalize to bit-identical vectors (floor(g·s·T/(g·p)) ==
    floor(s·T/p)), so each planted copy forms a NORM-exact pair with its
    source while staying raw-exact-distinct."""
    from intertext_ray.ops.audio_clipping import amplify_pcm
    from intertext_ray.sources.clips import doc_ids_for_clip_ids

    keep = set(codecs)
    m = np.uint64(mod)

    def fn(batch: pa.Table) -> pa.Table:
        num = doc_ids_for_clip_ids(batch["clip_id"])
        sel = batch.filter(pa.array(num % m == 0))
        blobs = sel["bytes"].to_pylist()
        srs = sel["sr_hz"].to_numpy(zero_copy_only=False)
        cod = sel["codec"].to_pylist()
        ids = sel["clip_id"].to_pylist()
        names = sel.column_names
        ob, oc, oi, rows = [], [], [], []
        for i in range(len(sel)):
            if cod[i] not in keep:
                continue
            pcm = decode_clip(blobs[i], int(srs[i]), cod[i])
            ob.append(
                encode_pcm_s16le(amplify_pcm(pcm, gain_num, gain_den))
            )
            oc.append("pcm_s16le")
            oi.append(ids[i] + suffix)
            rows.append(i)
        sub = sel.take(np.asarray(rows, np.int64))
        sub = sub.set_column(
            names.index("clip_id"), "clip_id", pa.array(oi, pa.string())
        )
        sub = sub.set_column(
            names.index("bytes"), "bytes", pa.array(ob, pa.binary())
        )
        sub = sub.set_column(
            names.index("codec"), "codec", pa.array(oc, pa.string())
        )
        return pa.concat_tables([batch, sub]).combine_chunks()

    return clips.map_batches(fn, batch_format="pyarrow", batch_size=64)


def audio_eval_leak_report(
    corpus_clips: ray.data.Dataset,
    eval_clips: ray.data.Dataset,
    codecs: tuple[str, ...] = _SQL_CODECS,
) -> ray.data.Dataset:
    """Per-EVAL-clip leakage report — the audio flip side of
    :func:`audio_decontam` (which drops corpus clips): for each
    benchmark clip, how many corpus clips decode to EXACTLY its PCM
    (``n_corpus_copies``, ``leaked``).  The wave-benchmark owner's
    integrity table.

    Scale shape: eval checksums are collected once on the driver
    (benchmark-sized) and broadcast as sorted key arrays; the corpus
    contributes one streamed checksum pass emitting per-batch PARTIAL
    hit counts (eval-key-indexed, so the exchange is bounded by
    eval_size x n_blocks, never corpus-sized); one small groupby sums
    them.  The corpus payload is decoded once and dropped in-batch."""
    import ray
    import ray.data as rd

    ev_id, ev_n, ev_1, ev_2 = [], [], [], []
    for b in pcm_checksums(eval_clips, codecs=codecs).iter_batches(
        batch_format="pyarrow"
    ):
        ev_id.extend(b["clip_id"].to_pylist())
        ev_n.append(b["n_samples"].to_numpy(zero_copy_only=False))
        ev_1.append(b["ck1"].to_numpy(zero_copy_only=False))
        ev_2.append(b["ck2"].to_numpy(zero_copy_only=False))
    if ev_n:
        ev_n = np.concatenate(ev_n).astype(np.int64)
        ev_1 = np.concatenate(ev_1).astype(np.uint64)
        ev_2 = np.concatenate(ev_2).astype(np.uint64)
    else:
        ev_n = np.empty(0, np.int64)
        ev_1 = np.empty(0, np.uint64)
        ev_2 = np.empty(0, np.uint64)
    order = np.lexsort((ev_2, ev_1, ev_n))
    inv = np.empty(len(order), np.int64)
    inv[order] = np.arange(len(order))
    # composite-key triples as ONE sorted structured array (VERDICT r4
    # #6): lexsort order (n, ck1, ck2) == numpy's lexicographic struct
    # order, so the corpus side resolves collisions with two structured
    # searchsorted calls — no per-row Python loop
    triple_dt = np.dtype(
        [("n", np.int64), ("c1", np.uint64), ("c2", np.uint64)]
    )
    ev_keys = np.empty(len(ev_n), triple_dt)
    ev_keys["n"] = ev_n[order]
    ev_keys["c1"] = ev_1[order]
    ev_keys["c2"] = ev_2[order]
    keys_ref = ray.put(ev_keys)

    def partial_hits(batch: pa.Table) -> pa.Table:
        ev = ray.get(keys_ref)
        ck = pcm_checksums_batch(batch, codecs)
        if len(ev) == 0 or ck is None or len(ck[0]) == 0:
            return pa.table(
                {
                    "key_idx": pa.array([], pa.int64()),
                    "hits": pa.array([], pa.int64()),
                }
            )
        cn, c1, c2 = ck
        q = np.empty(len(cn), ev.dtype)
        q["n"] = np.asarray(cn, np.int64)
        q["c1"] = np.asarray(c1, np.uint64)
        q["c2"] = np.asarray(c2, np.uint64)
        lo = np.searchsorted(ev, q, side="left")
        hi = np.searchsorted(ev, q, side="right")
        hit = hi > lo  # exact triple present (run covers duplicate keys)
        reps = (hi - lo)[hit]
        starts = lo[hit]
        total = int(reps.sum())
        # expand each [lo, hi) run to its member indices, crediting every
        # duplicate eval key exactly as the old per-row walk did
        idx = (
            np.repeat(starts, reps)
            + np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(reps) - reps, reps)
        )
        counts = np.zeros(len(ev), np.int64)
        np.add.at(counts, idx, 1)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "key_idx": pa.array(nz.astype(np.int64), pa.int64()),
                "hits": pa.array(counts[nz], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    parts = corpus_clips.map_batches(
        partial_hits, batch_format="pyarrow", batch_size=64, num_cpus=1
    )
    totals = np.zeros(len(ev_n), np.int64)
    agg = parts.groupby("key_idx").aggregate(Sum("hits"))
    for row in agg.iter_rows():
        totals[int(row["key_idx"])] = int(row["sum(hits)"])
    per_eval = totals[inv]
    return rd.from_arrow(
        pa.table(
            {
                "clip_id": pa.array(ev_id, pa.string()),
                "n_samples": pa.array(ev_n, pa.int64()),
                "n_corpus_copies": pa.array(per_eval, pa.int64()),
                "leaked": pa.array(per_eval > 0),
            }
        )
    )


def pcm_checksums_batch(
    batch: pa.Table, codecs
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """In-batch checksum arrays (n, ck1, ck2) for the supported codecs —
    the kernel of :func:`pcm_checksums` exposed for per-batch callers."""
    keep = set(codecs)
    blobs = batch["bytes"].to_pylist()
    srs = batch["sr_hz"].to_numpy(zero_copy_only=False)
    cod = batch["codec"].to_pylist()
    on, o1, o2 = [], [], []
    for i in range(len(batch)):
        if cod[i] not in keep:
            continue
        pcm = decode_clip(blobs[i], int(srs[i]), cod[i])
        c1, c2 = pcm_checksum(pcm)
        on.append(len(pcm))
        o1.append(c1)
        o2.append(c2)
    return (
        np.asarray(on, np.int64),
        np.asarray(o1, np.uint64),
        np.asarray(o2, np.uint64),
    )


def audio_leakage_safe_split(
    clips: ray.data.Dataset,
    permille_train: int = 900,
    salt: int = 0,
    target_peak: int = 30000,
    num_buckets: int = 32,
    codecs: tuple[str, ...] = _SQL_CODECS,
) -> ray.data.Dataset:
    """(clip_id, split_key, split) — train/val split that can never leak
    a gain-invariant exact duplicate across the boundary: the split is
    decided by ``splitmix64(split_key ^ salt)`` where ``split_key`` is
    the numeric id of the clip's :func:`audio_norm_exact_dup_groups`
    group keeper (min clip id) for grouped clips and the clip's own
    numeric id otherwise — every member of a norm-exact dup group lands
    in the SAME split.  The audio analogue of
    `ops/sampling.leakage_safe_split` (reference semantics: a plain hash
    split leaks ~2·p·(1−p) of each dup pair across the boundary; this
    makes that fraction exactly zero while staying a pure function of
    the keys, so re-runs and resumed partitions agree).

    Scale shape: the dup-group table is dup-proportional (≪ corpus),
    broadcast once as a sorted (clip_id -> keeper id) pair of arrays;
    the split pass is row-local searchsorted + splitmix — no shuffle at
    any corpus size.  Swap the group source for the fingerprint tier's
    clusters for near-dup-safe splits (same key contract)."""
    import ray

    from intertext_ray.functions.hashing import splitmix64
    from intertext_ray.sources.clips import doc_ids_for_clip_ids

    groups = audio_norm_exact_dup_groups(
        clips, target_peak=target_peak, num_buckets=num_buckets,
        codecs=codecs,
    )
    mids: list[str] = []
    keys: list[np.ndarray] = []
    for b in groups.iter_batches(batch_format="pyarrow"):
        mids.extend(b["clip_id"].to_pylist())
        keys.append(doc_ids_for_clip_ids(b["group_id"]).astype(np.int64))
    mid_arr = np.asarray(mids, dtype=object)
    key_arr = (
        np.concatenate(keys) if keys else np.empty(0, np.int64)
    )
    order = np.argsort(mid_arr)
    lut_ref = ray.put((mid_arr[order], key_arr[order]))
    s = np.uint64(salt)
    pt = int(permille_train)

    def fn(b: pa.Table) -> pa.Table:
        mid_s, key_s = ray.get(lut_ref)
        ids = np.asarray(b["clip_id"].to_pylist(), dtype=object)
        key = doc_ids_for_clip_ids(b["clip_id"]).astype(np.int64)
        if len(mid_s):
            pos = np.searchsorted(mid_s, ids)
            safe = np.minimum(pos, len(mid_s) - 1)
            hit = (pos < len(mid_s)) & (mid_s[safe] == ids)
            key[hit] = key_s[safe[hit]]
        h = splitmix64(key.astype(np.uint64) ^ s) % np.uint64(1000)
        split = np.where(h < pt, "train", "val")
        return pa.table(
            {
                "clip_id": b["clip_id"],
                "split_key": pa.array(key, pa.int64()),
                "split": pa.array(split.tolist(), pa.string()),
            }
        )

    return clips.select_columns(["clip_id"]).map_batches(
        fn, batch_format="pyarrow"
    )
