"""Audio sample packing: fixed-duration training windows.

Speech models train on fixed-length windows (e.g. 30 s); short clips are
PACKED — concatenated in a deterministic corpus order until the budget is
full, clip-granular (no clip is split).  This is `ops/packing.assign_chunks`
with milliseconds for tokens plus the audio-specific output: the byte-level
writer needs each clip's OFFSET inside its pack, so the face exposes
``offset_ms = cum_before - pack_id * budget_ms``.

Same distributed two-phase exact prefix scan as the text op (see
`ops/packing.py` module doc): range-partition the slim
(clip_id, dur_ms) projection by numeric id — payload bytes never move —
per-partition totals to the driver (#partitions rows), driver cumsums
into broadcast offsets, each partition adds its offset to a vectorized
within-partition cumsum.  No stage sees more than its partition; the
actual PCM concatenation is then an embarrassingly-parallel
``groupby(pack_id).map_groups`` over only the clips of each pack.

Clips LONGER than the budget get a pack to themselves (the greedy
assignment never splits; the oversized clip spills its pack past the
budget exactly as the text op does — documented, twin replays it).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from intertext_ray.sources.clips import doc_ids_for_clip_ids


def assign_audio_packs(
    clips: ray.data.Dataset,
    budget_ms: int = 30000,
    range_size: int = 1 << 16,
) -> ray.data.Dataset:
    """(clip_id, dur_ms, cum_before, pack_id, offset_ms): exact global
    prefix sum of dur_ms in numeric clip-id order; ``pack_id =
    cum_before // budget_ms``; ``offset_ms`` = position inside the pack."""
    b = int(budget_ms)

    def slim(t: pa.Table) -> pa.Table:
        num = doc_ids_for_clip_ids(t["clip_id"])
        dur = t["dur_ms"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "clip_id": t["clip_id"],
                "num_id": pa.array(num.astype(np.int64), pa.int64()),
                "dur_ms": pa.array(dur, pa.int64()),
                "part": pa.array(
                    (num // np.uint64(range_size)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    parted = clips.select_columns(["clip_id", "dur_ms"]).map_batches(
        slim, batch_format="pyarrow"
    )
    totals = parted.groupby("part").sum("dur_ms").to_pandas()
    totals = totals.sort_values("part")
    parts = totals["part"].to_numpy().astype(np.int64)
    sums = totals["sum(dur_ms)"].to_numpy().astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])
    off_ref = ray.put({int(p): int(o) for p, o in zip(parts, offsets)})

    def scan(group: pa.Table) -> pa.Table:
        num = group["num_id"].to_numpy(zero_copy_only=False)
        dur = group["dur_ms"].to_numpy(zero_copy_only=False)
        order = np.argsort(num, kind="stable")
        num, dur = num[order], dur[order]
        names = group["clip_id"].take(pa.array(order))
        off = ray.get(off_ref)[int(num[0]) // range_size] if len(num) else 0
        cum = off + np.concatenate([[0], np.cumsum(dur)[:-1]])
        pack = cum // b
        return pa.table(
            {
                "clip_id": names,
                "dur_ms": pa.array(dur, pa.int64()),
                "cum_before": pa.array(cum, pa.int64()),
                "pack_id": pa.array(pack, pa.int64()),
                "offset_ms": pa.array(cum - pack * b, pa.int64()),
            }
        )

    return parted.groupby("part").map_groups(scan, batch_format="pyarrow")


def pack_payloads(
    assigned: ray.data.Dataset,
    clips: ray.data.Dataset,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Materialize packed windows: bucketed hash join (the
    `stages/verify.verify_hash_join` union-tag idiom — assignments are
    corpus-row-proportional, NEVER driver-materialized) attaches
    (pack_id, offset_ms) to each payload row, then a pack_id groupby
    concatenates member PCM in offset order — (pack_id, n_clips,
    total_ms, bytes).  The payload crosses two exchanges (id-hash join
    bucket, then pack bucket); because packing is monotone in numeric id,
    a range-partitioned fast path could fuse the two — left as the
    documented optimization, the two-exchange form is already
    bucket-bounded at any scale."""
    from intertext_ray.functions.audio import decode_clip, encode_pcm_s16le

    nb = np.uint64(num_buckets)

    def tag_assign(t: pa.Table) -> pa.Table:
        num = doc_ids_for_clip_ids(t["clip_id"])
        n = len(t)
        return pa.table(
            {
                "bucket": pa.array((num % nb).astype(np.int64), pa.int64()),
                "clip_id": t["clip_id"],
                "pack_id": t["pack_id"],
                "offset_ms": t["offset_ms"],
                "dur_ms": t["dur_ms"],
                "bytes": pa.nulls(n, pa.binary()),
                "sr_hz": pa.nulls(n, pa.int32()),
                "codec": pa.nulls(n, pa.string()),
            }
        )

    def tag_payload(t: pa.Table) -> pa.Table:
        num = doc_ids_for_clip_ids(t["clip_id"])
        n = len(t)
        return pa.table(
            {
                "bucket": pa.array((num % nb).astype(np.int64), pa.int64()),
                "clip_id": t["clip_id"],
                "pack_id": pa.nulls(n, pa.int64()),
                "offset_ms": pa.nulls(n, pa.int64()),
                "dur_ms": pa.array(
                    t["dur_ms"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    pa.int64(),
                ),
                "bytes": t["bytes"],
                "sr_hz": t["sr_hz"],
                "codec": t["codec"],
            }
        )

    unioned = assigned.select_columns(
        ["clip_id", "pack_id", "offset_ms", "dur_ms"]
    ).map_batches(tag_assign, batch_format="pyarrow").union(
        clips.select_columns(
            ["clip_id", "bytes", "sr_hz", "dur_ms", "codec"]
        ).map_batches(tag_payload, batch_format="pyarrow")
    )

    def join(group: pa.Table) -> pa.Table:
        is_assign = np.array(
            [v is not None for v in group["pack_id"].to_pylist()]
        )
        ids = np.array(group["clip_id"].to_pylist(), dtype=object)
        amap = {
            ids[i]: (
                group["pack_id"][int(i)].as_py(),
                group["offset_ms"][int(i)].as_py(),
            )
            for i in np.nonzero(is_assign)[0]
        }
        pay = np.nonzero(~is_assign)[0]
        keep = [int(i) for i in pay if ids[i] in amap]
        sub = group.take(pa.array(keep, pa.int64()))
        pk = [amap[c][0] for c in sub["clip_id"].to_pylist()]
        of = [amap[c][1] for c in sub["clip_id"].to_pylist()]
        return pa.table(
            {
                "clip_id": sub["clip_id"],
                "pack_id": pa.array(pk, pa.int64()),
                "offset_ms": pa.array(of, pa.int64()),
                "dur_ms": sub["dur_ms"],
                "bytes": sub["bytes"],
                "sr_hz": sub["sr_hz"],
                "codec": sub["codec"],
            }
        )

    tagged = unioned.groupby("bucket").map_groups(
        join, batch_format="pyarrow"
    )

    def build(group: pa.Table) -> pa.Table:
        of = group["offset_ms"].to_numpy(zero_copy_only=False)
        order = np.argsort(of, kind="stable")
        pcms = []
        total = 0
        for i in order:
            pcm = decode_clip(
                group["bytes"][int(i)].as_py(),
                int(group["sr_hz"][int(i)].as_py()),
                group["codec"][int(i)].as_py(),
            )
            pcms.append(pcm)
            total += int(group["dur_ms"][int(i)].as_py())
        blob = encode_pcm_s16le(
            np.concatenate(pcms) if pcms else np.zeros(0, np.int16)
        )
        return pa.table(
            {
                "pack_id": pa.array(
                    [int(group["pack_id"][0].as_py())], pa.int64()
                ),
                "n_clips": pa.array([len(group)], pa.int64()),
                "total_ms": pa.array([total], pa.int64()),
                "bytes": pa.array([blob], pa.binary()),
            }
        )

    return tagged.groupby("pack_id").map_groups(build, batch_format="pyarrow")
