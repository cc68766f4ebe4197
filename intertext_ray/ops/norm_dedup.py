"""Normalization-folded exact deduplication — the "fuzzy-exact" tier.

Production corpora hold documents that differ only in casing, punctuation
or whitespace (re-crawls through different HTML extractors, shouted
reposts, hyphen-vs-space variants).  Raw exact dedup misses them; MinHash
is overkill for them.  The standard middle rung (used by C4/Gopher-style
cleanups between exact-hash and near-dup passes) folds each document
through a cheap canonical form and exact-dedups THAT:

    norm(text) = trim(collapse([^a-z0-9]+ -> ' ', lower(text)))

i.e. ASCII lowercase, every run of non-alphanumeric characters (all
punctuation AND all whitespace) collapsed to one space, edges trimmed.
The fold is a single RE2 pass on both the engine (pyarrow
``replace_substring_regex``) and the DuckDB twin (``regexp_replace`` with
the 'g' flag — also RE2), so the contract is identical by construction.
Caveat (repo-wide ASCII-class idiom): non-ASCII letters are folded OUT by
the ``[^a-z0-9]`` class on both sides; script-aware folding is
``functions/text.fold_diacritics`` territory, composable upstream.

Grouping is by the 128-bit sha1 prefix of the normalized form — the same
hash-partition + in-bucket vectorized run-scan physical plan as
``ops/exact_dedup`` (one exchange, one Python call per BUCKET).  Compared
with the reference engine's raw-text dedup (intertext ``dedup`` over
hashbands, `reference/intertext/intertext.py`), this adds the fold rung
the reference leaves to preprocessing.

Scale: the shuffle ships (bucket, two uint64 hash pairs, doc_id,
norm_len) — no text moves; group state per bucket is O(bucket rows).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_GROUPS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_members", pa.int64()),
        ("n_variants", pa.int64()),
        ("n_chars_norm", pa.int64()),
    ]
)


def normalize_text(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """The canonical fold: lower → collapse ``[^a-z0-9]+`` to ' ' → trim.

    After the collapse the string contains only ``[a-z0-9 ]`` with single
    interior spaces, so a plain ASCII-space trim finishes the job on both
    engine and SQL sides identically."""
    low = pc.utf8_lower(arr)
    folded = pc.replace_substring_regex(low, pattern="[^a-z0-9]+", replacement=" ")
    out = pc.utf8_trim(folded, characters=" ")
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def _sha1_pair(texts: list[str]) -> np.ndarray:
    digs = [hashlib.sha1(t.encode("utf-8")).digest()[:16] for t in texts]
    if not digs:
        return np.empty((0, 2), dtype=np.uint64)
    return np.frombuffer(b"".join(digs), dtype=np.uint64).reshape(-1, 2)


def norm_dedup_groups(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per normalized-form duplicate group (≥2 members):
    (doc_id = min-id canonical, n_members, n_variants = distinct RAW
    texts in the group, n_chars_norm = length of the folded form).

    ``n_variants`` is the payoff metric: a group with n_variants == 1 was
    already caught by raw exact dedup; n_variants > 1 is the mass only
    the fold finds."""
    nb = np.uint64(num_buckets)

    def hash_and_bucket(b: pa.Table) -> pa.Table:
        norm = normalize_text(b[text_col])
        nh = _sha1_pair(norm.to_pylist())
        rh = _sha1_pair(b[text_col].to_pylist())
        ln = pc.utf8_length(norm).cast(pa.int64())
        ids = b[id_col].cast(pa.int64())
        return pa.table(
            {
                "bucket": pa.array((nh[:, 0] % nb).astype(np.int64)),
                "nh1": pa.array(nh[:, 0], pa.uint64()),
                "nh2": pa.array(nh[:, 1], pa.uint64()),
                "rh1": pa.array(rh[:, 0], pa.uint64()),
                "rh2": pa.array(rh[:, 1], pa.uint64()),
                "doc_id": ids,
                "n_chars_norm": ln,
            }
        )

    def summarize(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return _GROUPS_SCHEMA.empty_table()
        nh1 = group["nh1"].to_numpy(zero_copy_only=False)
        nh2 = group["nh2"].to_numpy(zero_copy_only=False)
        rh1 = group["rh1"].to_numpy(zero_copy_only=False)
        rh2 = group["rh2"].to_numpy(zero_copy_only=False)
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        ln = group["n_chars_norm"].to_numpy(zero_copy_only=False)
        order = np.lexsort((rh2, rh1, nh2, nh1))
        s_n1, s_n2 = nh1[order], nh2[order]
        s_r1, s_r2 = rh1[order], rh2[order]
        head = np.ones(n, dtype=bool)
        head[1:] = (s_n1[1:] != s_n1[:-1]) | (s_n2[1:] != s_n2[:-1])
        raw_head = np.ones(n, dtype=bool)
        raw_head[1:] = head[1:] | (s_r1[1:] != s_r1[:-1]) | (s_r2[1:] != s_r2[:-1])
        starts = np.nonzero(head)[0]
        bounds = np.concatenate([starts, [n]])
        counts = np.diff(bounds)
        variants = np.add.reduceat(raw_head.astype(np.int64), starts)
        min_ids = np.minimum.reduceat(ids[order], starts)
        norm_lens = ln[order][starts]
        multi = counts > 1
        return pa.table(
            {
                "doc_id": pa.array(min_ids[multi].astype(np.int64), pa.int64()),
                "n_members": pa.array(counts[multi].astype(np.int64), pa.int64()),
                "n_variants": pa.array(variants[multi].astype(np.int64), pa.int64()),
                "n_chars_norm": pa.array(
                    norm_lens[multi].astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        docs.map_batches(hash_and_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(summarize, batch_format="pyarrow")
    )


def norm_dedup(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Survivor view: keep the minimum-id row per normalized form (the
    raw text of the keeper is preserved — the fold only decides GROUPING,
    never rewrites the surviving document)."""
    nb = np.uint64(num_buckets)

    def hash_and_bucket(b: pa.Table) -> pa.Table:
        norm = normalize_text(b[text_col])
        nh = _sha1_pair(norm.to_pylist())
        b = b.append_column("nh1", pa.array(nh[:, 0], pa.uint64()))
        b = b.append_column("nh2", pa.array(nh[:, 1], pa.uint64()))
        return b.append_column(
            "bucket", pa.array((nh[:, 0] % nb).astype(np.int64))
        )

    def first_per_norm(group: pa.Table) -> pa.Table:
        h1 = group["nh1"].to_numpy(zero_copy_only=False)
        h2 = group["nh2"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h2, h1))
        keep = np.ones(len(order), dtype=bool)
        if len(order) > 1:
            s1, s2 = h1[order], h2[order]
            keep[1:] = (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])
        return group.take(order[keep])

    return (
        docs.map_batches(hash_and_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(first_per_norm, batch_format="pyarrow")
        .drop_columns(["nh1", "nh2", "bucket"])
    )
