"""Char n-gram Jaccard similarity — exact pairwise dedup metric.

Physical plan: explode docs to distinct (gram, doc_id) rows (vectorized over
the concatenated utf-8 buffer), bucket-groupby gram to count pairwise
intersections, broadcast per-doc gram counts for the union term.  A gram
frequency cap bounds the quadratic blowup of stop-grams — at corpus scale,
grams shared by thousands of docs carry no dedup signal; the cap is a knob
and the dropped mass is measurable (same argument as the LSH hot-band cap).

Output pairs carry ``jaccard_x1000 = floor(1000 * inter / union)`` — an
integer, so the DuckDB oracle twin hashes identically.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import ray
import ray.data

from intertext_ray.functions.hashing import splitmix64

_U64 = np.uint64


def doc_grams(text: str, n: int = 4) -> set[bytes]:
    b = text.encode("utf-8")
    if len(b) < n:
        return {b} if b else set()
    return {b[i : i + n] for i in range(len(b) - n + 1)}


def gram_rows(docs: ray.data.Dataset, text_col: str = "text", n: int = 4):
    """Distinct (gram_hash:uint64, doc_id) rows per doc."""

    def fn(batch: pa.Table) -> pa.Table:
        out_doc, out_g = [], []
        for d, t in zip(
            batch["doc_id"].to_numpy(zero_copy_only=False),
            batch[text_col].to_pylist(),
        ):
            gs = doc_grams(t, n)
            if not gs:
                continue
            arr = np.frombuffer(
                b"".join(g.ljust(8, b"\0") for g in sorted(gs)), dtype=np.uint64
            )
            hs = splitmix64(arr)
            out_doc.extend([int(d)] * len(hs))
            out_g.extend(hs.tolist())
        return pa.table(
            {
                "gram": pa.array(np.array(out_g, dtype=np.uint64), pa.uint64()),
                "doc_id": pa.array(out_doc, pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def ngram_jaccard_pairs(
    docs: ray.data.Dataset,
    text_col: str = "text",
    n: int = 4,
    min_jaccard: float = 0.5,
    num_buckets: int = 32,
    gram_doc_cap: int = 0,
) -> ray.data.Dataset:
    """(doc_a, doc_b, jaccard_x1000) for pairs with Jaccard >= min_jaccard.

    ``gram_doc_cap``: drop grams appearing in more docs (0 = exact, no cap —
    use the cap at scale and account the divergence)."""
    grams = gram_rows(docs, text_col, n).materialize()

    # per-doc gram counts: small table, broadcast for the union term
    sizes = dict(
        (int(r["doc_id"]), int(r["count()"]))
        for r in grams.groupby("doc_id").count().take_all()
    )
    sizes_ref = ray.put(sizes)
    nb = _U64(num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        g = t["gram"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((g % nb).astype(np.int64)))

    def count_pairs(group: pa.Table) -> pa.Table:
        """Within a bucket: per-gram doc lists -> pairwise intersection
        counts (partial; summed across buckets next)."""
        from intertext_ray.stages.candidates import pairs_within_runs

        g = group["gram"].to_numpy(zero_copy_only=False)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, g))
        g, d = g[order], d[order]
        nrow = len(g)
        if nrow == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "inter": pa.array([], pa.int64()),
                }
            )
        starts = np.concatenate([[0], np.nonzero(g[1:] != g[:-1])[0] + 1])
        counts = np.diff(np.concatenate([starts, [nrow]]))
        if gram_doc_cap:
            keep_runs = counts <= gram_doc_cap
            keep_rows = np.repeat(keep_runs, counts)
            g, d = g[keep_rows], d[keep_rows]
            counts = counts[keep_runs]
        ii, jj = pairs_within_runs(counts)
        da, db = d[ii], d[jj]
        swap = da > db
        a = np.where(swap, db, da)
        b = np.where(swap, da, db)
        # partial per-pair intersection counts within the bucket
        c = Counter(zip(a.tolist(), b.tolist()))
        if not c:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "inter": pa.array([], pa.int64()),
                }
            )
        keys, vals = zip(*c.items())
        ka, kb = zip(*keys)
        return pa.table(
            {
                "doc_a": pa.array(ka, pa.int64()),
                "doc_b": pa.array(kb, pa.int64()),
                "inter": pa.array(vals, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    partials = (
        grams.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_pairs, batch_format="pyarrow")
    )
    totals = partials.groupby(["doc_a", "doc_b"]).aggregate(
        Sum("inter", alias_name="inter")
    )

    def score(batch: pa.Table) -> pa.Table:
        s = ray.get(sizes_ref)
        da = batch["doc_a"].to_numpy(zero_copy_only=False)
        db = batch["doc_b"].to_numpy(zero_copy_only=False)
        inter = batch["inter"].to_numpy(zero_copy_only=False)
        jx, keep = [], []
        # integer threshold (pct/100) so the DuckDB oracle's comparison is
        # value-identical (no decimal-vs-double literal mismatch)
        pct = int(round(min_jaccard * 100))
        for i in range(len(da)):
            union = s[int(da[i])] + s[int(db[i])] - int(inter[i])
            keep.append(bool(union) and 100 * int(inter[i]) >= pct * union)
            jx.append(math.floor(1000.0 * int(inter[i]) / union) if union else 0)
        t = pa.table(
            {
                "doc_a": batch["doc_a"],
                "doc_b": batch["doc_b"],
                "jaccard_x1000": pa.array(jx, pa.int64()),
            }
        )
        return t.filter(pa.array(keep))

    return totals.map_batches(score, batch_format="pyarrow")
