"""Char n-gram Jaccard similarity — exact pairwise dedup metric.

Physical plan: explode docs to distinct (gram, doc_id, doc_size) rows
(vectorized over the concatenated utf-8 buffer), bucket-groupby gram to
count pairwise intersections — each emitted pair CARRIES both doc sizes
through the shuffle, so the union term needs no driver-side broadcast (at
10⁹ docs a doc→size dict would be driver-resident state; 16 bytes/row in
the shuffle is not).  A gram frequency cap bounds the quadratic blowup of
stop-grams — at corpus scale, grams shared by thousands of docs carry no
dedup signal; the cap is a knob and the dropped mass is measurable (same
argument as the LSH hot-band cap).

Output pairs carry ``jaccard_x1000 = floor(1000 * inter / union)`` — the
floor of a float64 division, expression-identical to the DuckDB oracle
twin so value-hash comparison is exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.functions.hashing import splitmix64

_U64 = np.uint64


def doc_grams(text: str, n: int = 4) -> set[bytes]:
    b = text.encode("utf-8")
    if len(b) < n:
        return {b} if b else set()
    return {b[i : i + n] for i in range(len(b) - n + 1)}


def gram_rows(docs: ray.data.Dataset, text_col: str = "text", n: int = 4):
    """Distinct (gram_hash:uint64, doc_id, dsize) rows per doc — ``dsize``
    (the doc's distinct-gram count) rides every row so downstream scoring
    never needs a per-doc lookup table."""

    def fn(batch: pa.Table) -> pa.Table:
        out_doc, out_g, out_sz = [], [], []
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
            out_sz.extend([len(gs)] * len(hs))
        return pa.table(
            {
                "gram": pa.array(np.array(out_g, dtype=np.uint64), pa.uint64()),
                "doc_id": pa.array(out_doc, pa.int64()),
                "dsize": pa.array(out_sz, pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def _inter_table(a, b, sa, sb, inter) -> pa.Table:
    return pa.table(
        {
            "doc_a": pa.array(np.asarray(a, np.int64), pa.int64()),
            "doc_b": pa.array(np.asarray(b, np.int64), pa.int64()),
            "size_a": pa.array(np.asarray(sa, np.int64), pa.int64()),
            "size_b": pa.array(np.asarray(sb, np.int64), pa.int64()),
            "inter": pa.array(np.asarray(inter, np.int64), pa.int64()),
        }
    )


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
    grams = gram_rows(docs, text_col, n)
    nb = _U64(num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        g = t["gram"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((g % nb).astype(np.int64)))

    def count_pairs(group: pa.Table) -> pa.Table:
        """Within a bucket: per-gram doc lists -> pairwise intersection
        counts (partial; summed across buckets next) — sizes ride along."""
        from intertext_ray.stages.candidates import pairs_within_runs

        g = group["gram"].to_numpy(zero_copy_only=False)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        sz = group["dsize"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, g))
        g, d, sz = g[order], d[order], sz[order]
        nrow = len(g)
        if nrow == 0:
            return _inter_table([], [], [], [], [])
        starts = np.concatenate([[0], np.nonzero(g[1:] != g[:-1])[0] + 1])
        counts = np.diff(np.concatenate([starts, [nrow]]))
        if gram_doc_cap:
            keep_runs = counts <= gram_doc_cap
            keep_rows = np.repeat(keep_runs, counts)
            g, d, sz = g[keep_rows], d[keep_rows], sz[keep_rows]
            counts = counts[keep_runs]
        ii, jj = pairs_within_runs(counts)
        da, db, sa, sb = d[ii], d[jj], sz[ii], sz[jj]
        swap = da > db
        a = np.where(swap, db, da)
        b = np.where(swap, da, db)
        sa2 = np.where(swap, sb, sa)
        sb2 = np.where(swap, sa, sb)
        if len(a) == 0:
            return _inter_table([], [], [], [], [])
        # vectorized partial per-pair intersection counts within the bucket
        order = np.lexsort((b, a))
        a, b, sa2, sb2 = a[order], b[order], sa2[order], sb2[order]
        head = np.ones(len(a), dtype=bool)
        head[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        hstarts = np.nonzero(head)[0]
        hcounts = np.diff(np.concatenate([hstarts, [len(a)]]))
        return _inter_table(
            a[hstarts], b[hstarts], sa2[hstarts], sb2[hstarts], hcounts
        )

    from ray.data.aggregate import Max, Sum

    partials = (
        grams.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_pairs, batch_format="pyarrow")
    )
    totals = partials.groupby(["doc_a", "doc_b"]).aggregate(
        Sum("inter", alias_name="inter"),
        Max("size_a", alias_name="size_a"),
        Max("size_b", alias_name="size_b"),
    )

    # integer threshold (pct/100) so the DuckDB oracle's comparison is
    # value-identical (no decimal-vs-double literal mismatch)
    pct = int(round(min_jaccard * 100))

    def score(batch: pa.Table) -> pa.Table:
        da = batch["doc_a"].to_numpy(zero_copy_only=False)
        db = batch["doc_b"].to_numpy(zero_copy_only=False)
        sa = batch["size_a"].to_numpy(zero_copy_only=False)
        sb = batch["size_b"].to_numpy(zero_copy_only=False)
        inter = batch["inter"].to_numpy(zero_copy_only=False)
        union = sa + sb - inter
        keep = (union > 0) & (100 * inter >= pct * union)
        # float64 division + floor — expression-identical to the SQL twin
        jx = np.zeros(len(da), dtype=np.int64)
        nz = union > 0
        jx[nz] = np.floor(1000.0 * inter[nz] / union[nz]).astype(np.int64)
        t = pa.table(
            {
                "doc_a": pa.array(da, pa.int64()),
                "doc_b": pa.array(db, pa.int64()),
                "jaccard_x1000": pa.array(jx, pa.int64()),
            }
        )
        return t.filter(pa.array(keep))

    return totals.map_batches(score, batch_format="pyarrow")
