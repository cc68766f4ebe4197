"""Incremental ingest dedup — dedupe a NEW shard against an EXISTING
corpus without ever re-pairing the old corpus against itself.

The 100 TB story: a training corpus is ingested in waves; re-running full
near-dup detection over old+new every wave is O(corpus) per wave.  Instead
the old corpus's distinct-gram rows live in a persistent, BUCKET-PARTITIONED
parquet index (built once per corpus version by :func:`build_gram_index`,
hive layout ``bucket=K/``).  Each ingest then:

  new shard -> gram explode -> bucket -> groupby(bucket) -> each bucket task
  reads ONLY its own old-index partition (storage-side pruning; the old side
  is never shuffled) -> drop gram runs with zero new docs BEFORE pair
  generation -> emit (>=1-new) pairs with sizes riding the rows ->
  global (a, b) sum -> integer Jaccard threshold.

Work per wave scales with the new shard plus one columnar scan of the
touched index partitions — not with |old|², and not with |old| shuffle
traffic.  After a wave passes, its gram rows are appended to the index
(same layout), making the next wave's "old" side current.

Gram identity: 4-byte char grams zero-padded to 8 bytes then splitmix64 —
injective for n <= 8, so hashed-gram intersection counts equal raw-gram
counts and the DuckDB twin can count substr() grams directly.

Reference anchor: this generalizes the reference's resumable hashband cache
(``/root/reference/intertext/intertext.py:328-376``, minhashes reused across
runs) from a per-file cache to a corpus-level partitioned index.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from intertext_ray.ops.ngram_jaccard import gram_rows

_U64 = np.uint64


def build_gram_index(
    docs: ray.data.Dataset,
    index_dir: str,
    text_col: str = "text",
    n: int = 4,
    num_buckets: int = 32,
) -> str:
    """Materialize the old corpus's distinct-gram rows as a hive-partitioned
    parquet index: ``index_dir/bucket=K/*.parquet`` with columns
    (gram:uint64, doc_id, dsize).  Built once; every ingest wave reads only
    the partitions its new grams touch."""
    grams = gram_rows(docs, text_col, n)
    nb = _U64(num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        g = t["gram"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((g % nb).astype(np.int64)))

    grams.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["bucket"]
    )
    return index_dir


def _pairs_partial_table(a, b, sa, sb, inter, both_new) -> pa.Table:
    return pa.table(
        {
            "doc_a": pa.array(np.asarray(a, np.int64), pa.int64()),
            "doc_b": pa.array(np.asarray(b, np.int64), pa.int64()),
            "size_a": pa.array(np.asarray(sa, np.int64), pa.int64()),
            "size_b": pa.array(np.asarray(sb, np.int64), pa.int64()),
            "inter": pa.array(np.asarray(inter, np.int64), pa.int64()),
            "both_new": pa.array(np.asarray(both_new, np.int64), pa.int64()),
        }
    )


def incremental_dup_pairs(
    new_docs: ray.data.Dataset,
    index_dir: str,
    text_col: str = "text",
    n: int = 4,
    min_jaccard: float = 0.5,
    num_buckets: int = 32,
    gram_doc_cap: int = 0,
) -> ray.data.Dataset:
    """(doc_a, doc_b, jaccard_x1000, kind) for every pair with Jaccard >=
    min_jaccard where at least one side is a NEW doc — new-vs-old pairs
    (``kind='new_old'``) and new-vs-new pairs (``'new_new'``); old-vs-old is
    the previous waves' already-settled result and is never recomputed.

    ``num_buckets`` must equal the index's build-time value (bucket = gram
    hash mod num_buckets on both sides).  Wave doc_ids are assumed disjoint
    from the index's (re-ingesting an existing id yields a trivial
    jaccard=1000 self-pair — the SQL twin replicates that, but it means
    "already present", not "near-duplicate")."""
    nb = _U64(num_buckets)
    pct = int(round(min_jaccard * 100))

    grams = gram_rows(new_docs, text_col, n)

    def add_bucket(t: pa.Table) -> pa.Table:
        g = t["gram"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((g % nb).astype(np.int64)))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        """One LSH-style bucket: new-side gram rows (from the shuffle) +
        the matching old-index partition (storage read, no shuffle)."""
        from intertext_ray.stages.candidates import pairs_within_runs

        bucket = int(group["bucket"][0].as_py())
        g = group["gram"].to_numpy(zero_copy_only=False)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        sz = group["dsize"].to_numpy(zero_copy_only=False)
        side = np.ones(len(g), dtype=np.int64)  # 1 = new

        part = os.path.join(index_dir, f"bucket={bucket}")
        if os.path.isdir(part):
            old = pq.read_table(part, columns=["gram", "doc_id", "dsize"])
            g = np.concatenate([g, old["gram"].to_numpy(zero_copy_only=False)])
            d = np.concatenate([d, old["doc_id"].to_numpy(zero_copy_only=False)])
            sz = np.concatenate([sz, old["dsize"].to_numpy(zero_copy_only=False)])
            side = np.concatenate([side, np.zeros(old.num_rows, dtype=np.int64)])

        order = np.lexsort((d, g))
        g, d, sz, side = g[order], d[order], sz[order], side[order]
        nrow = len(g)
        if nrow == 0:
            return _pairs_partial_table([], [], [], [], [], [])
        starts = np.concatenate([[0], np.nonzero(g[1:] != g[:-1])[0] + 1])
        counts = np.diff(np.concatenate([starts, [nrow]]))
        # drop old-only runs BEFORE pair generation — the dominant mass in
        # an incremental wave — and over-frequent grams if capped
        new_in_run = np.add.reduceat(side, starts)
        keep_runs = new_in_run > 0
        if gram_doc_cap:
            keep_runs &= counts <= gram_doc_cap
        keep_rows = np.repeat(keep_runs, counts)
        g, d, sz, side = g[keep_rows], d[keep_rows], sz[keep_rows], side[keep_rows]
        counts = counts[keep_runs]
        ii, jj = pairs_within_runs(counts)
        if len(ii) == 0:
            return _pairs_partial_table([], [], [], [], [], [])
        mask = (side[ii] | side[jj]).astype(bool)  # >=1 new side
        ii, jj = ii[mask], jj[mask]
        da, db, sa, sb = d[ii], d[jj], sz[ii], sz[jj]
        bn = side[ii] & side[jj]
        swap = da > db
        a = np.where(swap, db, da)
        b = np.where(swap, da, db)
        sa2 = np.where(swap, sb, sa)
        sb2 = np.where(swap, sa, sb)
        # per-(a,b) partial intersection counts within this bucket
        order = np.lexsort((b, a))
        a, b, sa2, sb2, bn = a[order], b[order], sa2[order], sb2[order], bn[order]
        head = np.ones(len(a), dtype=bool)
        head[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        hstarts = np.nonzero(head)[0]
        hcounts = np.diff(np.concatenate([hstarts, [len(a)]]))
        return _pairs_partial_table(
            a[hstarts], b[hstarts], sa2[hstarts], sb2[hstarts], hcounts,
            bn[hstarts],
        )

    from ray.data.aggregate import Max, Sum

    partials = (
        grams.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    totals = partials.groupby(["doc_a", "doc_b"]).aggregate(
        Sum("inter", alias_name="inter"),
        Max("size_a", alias_name="size_a"),
        Max("size_b", alias_name="size_b"),
        Max("both_new", alias_name="both_new"),
    )

    def score(batch: pa.Table) -> pa.Table:
        da = batch["doc_a"].to_numpy(zero_copy_only=False)
        db = batch["doc_b"].to_numpy(zero_copy_only=False)
        sa = batch["size_a"].to_numpy(zero_copy_only=False)
        sb = batch["size_b"].to_numpy(zero_copy_only=False)
        inter = batch["inter"].to_numpy(zero_copy_only=False)
        bn = batch["both_new"].to_numpy(zero_copy_only=False)
        union = sa + sb - inter
        keep = (union > 0) & (100 * inter >= pct * union)
        jx = np.zeros(len(da), dtype=np.int64)
        nz = union > 0
        # float64 division + floor — expression-identical to the SQL twin
        jx[nz] = np.floor(1000.0 * inter[nz] / union[nz]).astype(np.int64)
        kind = np.where(bn == 1, "new_new", "new_old")
        t = pa.table(
            {
                "doc_a": pa.array(da, pa.int64()),
                "doc_b": pa.array(db, pa.int64()),
                "jaccard_x1000": pa.array(jx, pa.int64()),
                "kind": pa.array(kind.tolist(), pa.string()),
            }
        )
        return t.filter(pa.array(keep))

    return totals.map_batches(score, batch_format="pyarrow")
