"""Incremental ingest dedup for the AUDIO payload — dedupe a NEW wave of
clips against an EXISTING corpus without re-pairing or re-decoding the
old corpus (the audio twin of :mod:`intertext_ray.ops.incremental`).

The 100 TB story: audio corpora arrive in waves and the DECODE is the
expensive stage; re-fingerprinting 10¹² old clips per wave is absurd.
The old corpus therefore persists as two bucket-partitioned parquet
artifacts, built once per corpus version by :func:`build_audio_index`:

  ``index_dir/shingles/sbucket=K/``  (band, doc_id, window_id)
      — shingle LSH keys, bucket = band % num_buckets
  ``index_dir/fps/fbucket=K/``       (doc_id, n_frames, subfps)
      — subfingerprint sequences, bucket = splitmix64(doc_id) % fp_buckets

Each wave then:

  new clips -> decode+fingerprint (new wave ONLY) -> shingle rows ->
  groupby(sbucket): each bucket task reads ONLY its own old shingle
  partition (storage-side pruning, old side never shuffled), drops
  old-only band runs BEFORE pair generation, emits (>=1-new) candidate
  alignments -> BER verify via the standard two-phase fingerprint join,
  where the old side's fingerprints are read from ONLY the fp partitions
  touched by candidate old clips (candidate set is pair-graph-sized, so
  the partition list is driver-safe).

Work per wave scales with the new shard + one columnar scan of the
touched partitions; the old audio itself is NEVER re-read.  After a wave
settles, :func:`append_wave` adds its rows to both artifacts (hive
append — same layout, new files).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.functions.hashing import splitmix64
from intertext_ray.ops.audio_dedup import (
    _explode_shingles,
    audio_fingerprints,
    verify_audio_pairs,
)

_U64 = np.uint64

_CAND_SCHEMA = pa.schema(
    [
        ("clip_a", pa.uint64()),
        ("clip_b", pa.uint64()),
        ("offset", pa.int64()),
        ("new_new", pa.int8()),
    ]
)


def _shingle_rows(fps: ray.data.Dataset, g: int, nb: int) -> ray.data.Dataset:
    def add_bucket(t: pa.Table) -> pa.Table:
        band = t["band"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "sbucket", pa.array((band % _U64(nb)).astype(np.int64))
        )

    return fps.map_batches(
        _explode_shingles(g, 0), batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(add_bucket, batch_format="pyarrow")


def build_audio_index(
    clips: ray.data.Dataset,
    index_dir: str,
    g: int = 1,
    num_buckets: int = 32,
    fp_buckets: int = 32,
) -> str:
    """Materialize the corpus's shingle-key and fingerprint artifacts
    (decode runs exactly once per corpus version)."""
    import json

    meta_path = os.path.join(index_dir, "index_meta.json")
    meta = {"g": g, "num_buckets": num_buckets, "fp_buckets": fp_buckets}
    if os.path.exists(meta_path):
        old = json.load(open(meta_path))
        if old != meta:
            raise ValueError(
                f"audio index {index_dir} was built with {old}; appending "
                f"with {meta} would corrupt it — rebuild or match the knobs"
            )
    elif os.path.isdir(os.path.join(index_dir, "shingles")):
        # artifacts without the meta commit marker = an interrupted build;
        # appending to (or knob-guessing over) partial parquet would read
        # silently wrong, so force a rebuild
        raise ValueError(
            f"audio index {index_dir} has artifacts but no index_meta.json "
            "(interrupted build) — delete the directory and rebuild"
        )
    fps = audio_fingerprints(clips).materialize()
    _shingle_rows(fps, g, num_buckets).write_parquet(
        os.path.join(index_dir, "shingles"), partition_cols=["sbucket"]
    )

    def add_fbucket(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(_U64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_frames": t["n_frames"],
                "subfps": t["subfps"],
                "fbucket": pa.array(
                    (splitmix64(d) % _U64(fp_buckets)).astype(np.int64)
                ),
            }
        )

    fps.map_batches(add_fbucket, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "fps"), partition_cols=["fbucket"]
    )
    os.makedirs(index_dir, exist_ok=True)
    # the meta file is the index's COMMIT MARKER: written atomically
    # (temp + rename) AFTER every parquet artifact, so readers that demand
    # it can never see a half-built index as an empty-but-valid one
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, meta_path)
    return index_dir


def append_wave(
    new_clips: ray.data.Dataset,
    index_dir: str,
    g: int = 1,
    num_buckets: int = 32,
    fp_buckets: int = 32,
) -> None:
    """Fold a settled wave into the index (hive append, same layout)."""
    build_audio_index(
        new_clips, index_dir, g=g, num_buckets=num_buckets, fp_buckets=fp_buckets
    )


def incremental_audio_dup_pairs(
    new_clips: ray.data.Dataset,
    index_dir: str,
    g: int = 1,
    cap: int = 512,
    max_ber: float = 0.25,
    min_overlap: int = 6,
    max_offset: int | None = 8,
    num_buckets: int = 32,
    fp_buckets: int = 32,
    verify_buckets: int = 32,
) -> ray.data.Dataset:
    """(clip_a, clip_b, offset, overlap, ber) for every verified audio
    near-dup pair with at least one NEW side — new-vs-old and new-vs-new;
    old-vs-old is the previous waves' settled result and is never
    recomputed.  ``num_buckets``/``fp_buckets``/``g`` must equal the
    index's build-time values."""
    import json

    meta_path = os.path.join(index_dir, "index_meta.json")
    if not os.path.exists(meta_path):
        # the meta file is written LAST (build_audio_index's commit
        # marker); its absence means no index or an interrupted build —
        # proceeding would silently dedup against nothing / partial data
        raise FileNotFoundError(
            f"audio index {index_dir} has no index_meta.json — build the "
            "index (or rebuild after an interrupted build) first"
        )
    meta = json.load(open(meta_path))
    want = {"g": g, "num_buckets": num_buckets, "fp_buckets": fp_buckets}
    if meta != want:
        raise ValueError(
            f"audio index {index_dir} built with {meta}, wave called "
            f"with {want} — knobs must match the index"
        )
    new_fps = audio_fingerprints(new_clips).materialize()
    shingles = _shingle_rows(new_fps, g, num_buckets)

    def bucket_cands(group: pa.Table) -> pa.Table:
        """One shingle bucket: new rows from the shuffle + the matching
        old partition from storage.  Old-only band runs are dropped
        BEFORE pair generation — the dominant mass in a wave."""
        import pyarrow.parquet as pq

        from intertext_ray.stages.candidates import pairs_within_runs

        bucket = int(group["sbucket"][0].as_py())
        band = group["band"].to_numpy(zero_copy_only=False)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        w = group["window_id"].to_numpy(zero_copy_only=False)
        side = np.ones(len(band), dtype=np.int8)

        part = os.path.join(index_dir, "shingles", f"sbucket={bucket}")
        if os.path.isdir(part):
            old = pq.read_table(
                part, columns=["band", "doc_id", "window_id"]
            )
            band = np.concatenate(
                [band, old["band"].to_numpy(zero_copy_only=False)]
            )
            d = np.concatenate(
                [d, old["doc_id"].to_numpy(zero_copy_only=False)]
            )
            w = np.concatenate(
                [w, old["window_id"].to_numpy(zero_copy_only=False)]
            )
            side = np.concatenate(
                [side, np.zeros(old.num_rows, dtype=np.int8)]
            )

        order = np.lexsort((w, d, band))
        band, d, w, side = band[order], d[order], w[order], side[order]
        n = len(band)
        if n == 0:
            return _CAND_SCHEMA.empty_table()
        starts = np.concatenate([[0], np.nonzero(band[1:] != band[:-1])[0] + 1])
        counts = np.diff(np.concatenate([starts, [n]]))
        new_in_run = np.add.reduceat(side.astype(np.int64), starts)
        keep_runs = (new_in_run > 0) & (counts >= 2) & (counts <= cap)
        keep_rows = np.repeat(keep_runs, counts)
        d, w, side = d[keep_rows], w[keep_rows], side[keep_rows]
        counts = counts[keep_runs]
        ii, jj = pairs_within_runs(counts)
        if len(ii) == 0:
            return _CAND_SCHEMA.empty_table()
        mask = (d[ii] != d[jj]) & ((side[ii] | side[jj]).astype(bool))
        ii, jj = ii[mask], jj[mask]
        if len(ii) == 0:
            return _CAND_SCHEMA.empty_table()
        da, db = d[ii].astype(_U64), d[jj].astype(_U64)
        off = w[ii].astype(np.int64) - w[jj].astype(np.int64)
        nn = (side[ii] & side[jj]).astype(np.int8)
        swap = da > db
        a = np.where(swap, db, da)
        b = np.where(swap, da, db)
        off = np.where(swap, -off, off)
        if max_offset is not None:
            m = np.abs(off) <= max_offset
            a, b, off, nn = a[m], b[m], off[m], nn[m]
        # in-task dedup of (a, b, offset)
        order = np.lexsort((off, b, a))
        a, b, off, nn = a[order], b[order], off[order], nn[order]
        keep = np.ones(len(a), dtype=bool)
        if len(a) > 1:
            keep[1:] = ~(
                (a[1:] == a[:-1]) & (b[1:] == b[:-1]) & (off[1:] == off[:-1])
            )
        return pa.table(
            {
                "clip_a": pa.array(a[keep], pa.uint64()),
                "clip_b": pa.array(b[keep], pa.uint64()),
                "offset": pa.array(off[keep], pa.int64()),
                "new_new": pa.array(nn[keep], pa.int8()),
            },
            schema=_CAND_SCHEMA,
        )

    cands = (
        shingles.groupby("sbucket")
        .map_groups(bucket_cands, batch_format="pyarrow")
        .materialize()
    )

    # candidate old-clip ids (pair-graph-sized) -> touched fp partitions
    new_ids: set[int] = set()
    for b in new_fps.select_columns(["doc_id"]).iter_batches(
        batch_size=1 << 18, batch_format="pyarrow"
    ):
        new_ids.update(b["doc_id"].to_numpy(zero_copy_only=False).tolist())
    cand_ids: set[int] = set()
    for b in cands.select_columns(["clip_a", "clip_b"]).iter_batches(
        batch_size=1 << 18, batch_format="pyarrow"
    ):
        cand_ids.update(b["clip_a"].to_numpy(zero_copy_only=False).tolist())
        cand_ids.update(b["clip_b"].to_numpy(zero_copy_only=False).tolist())
    old_needed = np.array(
        sorted(cand_ids - new_ids), dtype=_U64
    )
    fps_all = new_fps.select_columns(["doc_id", "n_frames", "subfps"])
    if len(old_needed):
        touched = np.unique(
            (splitmix64(old_needed) % _U64(fp_buckets)).astype(np.int64)
        )
        import glob

        parts = []
        for k in touched:
            parts.extend(
                sorted(
                    glob.glob(
                        os.path.join(
                            index_dir, "fps", f"fbucket={int(k)}", "*.parquet"
                        )
                    )
                )
            )
        if parts:
            need_ref = ray.put(old_needed)

            def only_needed(t: pa.Table) -> pa.Table:
                need = ray.get(need_ref)
                d = t["doc_id"].to_numpy(zero_copy_only=False).astype(_U64)
                pos = np.searchsorted(need, d)
                ok = (pos < len(need)) & (
                    need[np.minimum(pos, len(need) - 1)] == d
                )
                return t.filter(pa.array(ok))

            old_fps = (
                ray.data.read_parquet(
                    parts, columns=["doc_id", "n_frames", "subfps"]
                )
                .map_batches(only_needed, batch_format="pyarrow")
            )
            fps_all = fps_all.union(old_fps)

    return verify_audio_pairs(
        cands.select_columns(["clip_a", "clip_b", "offset"]),
        fps_all,
        max_ber=max_ber,
        min_overlap=min_overlap,
        num_buckets=verify_buckets,
    )
