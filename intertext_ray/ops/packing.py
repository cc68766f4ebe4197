"""Sample packing: the distributed prefix-scan operator.

Training pipelines pack documents into fixed token-budget chunks in a
deterministic corpus order.  The core primitive is an exact global
prefix sum over doc_id order — inherently sequential, made distributed
with the classic two-phase scan:

1. range-partition rows by ``doc_id // range_size`` (no shuffle of the
   corpus — the token counts are a slim (doc_id, n_tokens) projection);
2. one small per-partition aggregate (sum of tokens) comes back to the
   driver — ``n_docs / range_size`` rows, thousands at 10^12 docs;
3. the driver cumsums those partition totals into per-partition OFFSETS
   (broadcast via ``ray.put``), and each partition computes its exact
   within-partition prefix sum vectorized and adds its offset.

Wall-clock: two passes over a two-column projection + an O(#partitions)
driver step.  No stage ever sees more than its partition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def assign_chunks(
    docs: ray.data.Dataset,
    budget_tokens: int = 2048,
    text_col: str = "text",
    range_size: int = 1 << 16,
) -> ray.data.Dataset:
    """(doc_id, n_tokens, cum_before, chunk_id): ``cum_before`` = exact
    sum of n_tokens over all docs with smaller doc_id, ``chunk_id`` =
    ``cum_before // budget_tokens`` — the greedy doc-granular packing
    assignment (docs are not split across chunks)."""
    from intertext_ray.ops.text_stats import token_counts

    tc = token_counts(docs, text_col)

    def add_part(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "part", pa.array(d // range_size, pa.int64())
        )

    parted = tc.map_batches(add_part, batch_format="pyarrow")
    # phase 1: per-partition totals (tiny result — one row per partition)
    totals = parted.groupby("part").sum("n_tokens").to_pandas()
    totals = totals.sort_values("part")
    parts = totals["part"].to_numpy().astype(np.int64)
    sums = totals["sum(n_tokens)"].to_numpy().astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])
    off_ref = ray.put({int(p): int(o) for p, o in zip(parts, offsets)})

    # phase 2: exact within-partition prefix + broadcast offset
    def scan(group: pa.Table) -> pa.Table:
        d = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = group["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(d, kind="stable")
        d, n = d[order], n[order]
        off = ray.get(off_ref)[int(d[0]) // range_size] if len(d) else 0
        cum = off + np.concatenate([[0], np.cumsum(n)[:-1]])
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "cum_before": pa.array(cum, pa.int64()),
                "chunk_id": pa.array(cum // budget_tokens, pa.int64()),
            }
        )

    return parted.groupby("part").map_groups(scan, batch_format="pyarrow")


def length_sorted_packs(
    docs: ray.data.Dataset,
    budget_tokens: int = 2048,
    text_col: str = "text",
    range_size: int = 1 << 16,
) -> ray.data.Dataset:
    """(doc_id, n_tokens, cum_before, chunk_id): the LENGTH-SORTED
    packing assignment — docs ordered by (n_tokens DESC, doc_id), then
    the same greedy prefix rule as :func:`assign_chunks`.  This is the
    "sorted batching" idiom training pipelines use to cut padding waste:
    a chunk's docs have near-equal length, so per-chunk max-length
    padding is minimal.

    Same two-phase exact scan as :func:`assign_chunks`, but the
    partition key is COMPOSITE — ``(n_tokens, doc_id // range_size)`` —
    because partitioning by length alone would put every doc of one
    (possibly very hot) length in a single group; the composite bounds
    every group to ``range_size`` rows.  The phase-1 driver table has
    one row per non-empty (length, range) combo — fine through ~10^9
    docs; past that the driver cumsum itself becomes a second-level
    distributed scan over the combo table (a documented follow-up, not
    needed at current scale)."""
    from intertext_ray.ops.text_stats import token_counts

    tc = token_counts(docs, text_col)

    def add_part(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "part", pa.array(n * (1 << 20) + d // range_size, pa.int64())
        )

    parted = tc.map_batches(add_part, batch_format="pyarrow")
    totals = parted.groupby("part").sum("n_tokens").to_pandas()
    parts = totals["part"].to_numpy().astype(np.int64)
    sums = totals["sum(n_tokens)"].to_numpy().astype(np.int64)
    # order: n_tokens DESC, then doc range ASC
    n_of = parts >> 20
    r_of = parts & ((1 << 20) - 1)
    order = np.lexsort((r_of, -n_of))
    parts, sums = parts[order], sums[order]
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])
    off_ref = ray.put({int(p): int(o) for p, o in zip(parts, offsets)})

    def scan(group: pa.Table) -> pa.Table:
        d = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = group["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(d, kind="stable")  # within a part: doc order
        d, n = d[order], n[order]
        off = (
            ray.get(off_ref)[int(group["part"][0].as_py())] if len(d) else 0
        )
        cum = off + np.concatenate([[0], np.cumsum(n)[:-1]])
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "cum_before": pa.array(cum, pa.int64()),
                "chunk_id": pa.array(cum // budget_tokens, pa.int64()),
            }
        )

    return parted.groupby("part").map_groups(scan, batch_format="pyarrow")
