"""Content-defined chunking (CDC) dedup — the storage-dedup primitive
(Muthitacharoen et al., LBFS SOSP 2001; FastCDC ATC 2016) applied to
token streams.

A document is split at content-defined cut points: a cut falls AFTER
token ``i + k - 1`` whenever the word k-gram hash starting at token
``i`` is ``0 (mod divisor)``.  Because the rule depends only on a local
k-token window, inserting or deleting a prefix shifts chunk boundaries
only up to the first cut after the edit — every later chunk re-aligns
and hashes identically (the shift-resistance property fixed-size
chunking lacks).  Chunk-level dedup then finds repeated content at
sub-document granularity: boilerplate paragraphs, quoted passages,
mirrored sections — the mass a doc-level MinHash misses when the
containing documents differ.

This is the stateless core rule: production CDC adds min/max chunk
bounds, which introduce a sequential scan dependency (each cut depends
on the previous cut's position) that breaks both batch vectorization
and SQL expressibility; expected chunk length is tuned by ``divisor``
instead (mean ~``divisor`` tokens + k - 1).  An optional ``max_tokens``
post-split (fixed-stride split of oversized chunks) stays deterministic
and twin-replayable.

Scale shape: chunking is row-local (one vectorized pass per batch —
token/gram hashes from the shared ``text_stats.token_and_kgram_hashes``
chain, cut flags + segmented reduceat for chunk hashes; zero shuffles).
The dup report shuffles only the slim (chunk_hash:uint64, doc_id,
n_tokens) projection through one groupby — chunk-table-sized, ~1/divisor
of token volume.  Both kernels are expression-identical to the DuckDB
twins (``__ray_entry__.oracle_sql['cdc_chunks' / 'cdc_dup_chunks']``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_U64 = np.uint64

# weight-family seed for the chunk-content polynomial (distinct from
# rolling_gram_weights' 0xF1A5 gram family)
CDC_WEIGHT_SEED = 0xC0DC


def cdc_pos_weights(maxlen: int) -> np.ndarray:
    """Per-position multipliers for the chunk-content hash: odd 32-bit
    constants (splitmix64 high halves), same overflow-safety argument as
    ``text_stats.rolling_gram_weights`` — a HUGEINT sum of
    (2^64 * 2^32)-bounded products never overflows the twin's INT128."""
    from intertext_ray.functions.hashing import splitmix64

    idx = np.arange(maxlen, dtype=np.uint64) + _U64(CDC_WEIGHT_SEED)
    return (splitmix64(idx) >> _U64(32)) | _U64(1)


def cdc_chunk_batch(
    batch: pa.Table,
    text_col: str = "text",
    k: int = 4,
    divisor: int = 16,
    max_tokens: int = 0,
    with_start: bool = False,
    hex_hash: bool = True,
) -> pa.Table:
    """(doc_id, chunk_idx, n_tokens, chunk_hash_hex) rows: the CDC
    chunks of each doc.  ``chunk_idx`` is 0-based within the doc;
    ``chunk_hash`` is the splitmix-finalized positional polynomial over
    the chunk's token hashes.  ``max_tokens > 0`` splits oversized
    chunks at a fixed stride (deterministic).  ``with_start`` appends
    the chunk's 0-based start token index (used by the removal path;
    off by default so the driver-face schema stays the twin's).
    ``hex_hash=False`` keeps the hash as a raw ``chunk_hash`` uint64
    column — the internal form the dup/purge exchanges ship (16 bytes vs
    a 16-char string, no per-row formatting in the hot path); the hex
    face is only for the twin-checked chunk table."""
    from intertext_ray.functions.hashing import splitmix64
    from intertext_ray.ops.text_stats import token_and_kgram_hashes

    hcol = "chunk_hash_hex" if hex_hash else "chunk_hash"
    cols = {
        "doc_id": pa.array([], pa.int64()),
        "chunk_idx": pa.array([], pa.int64()),
        "n_tokens": pa.array([], pa.int64()),
        hcol: pa.array([], pa.string() if hex_hash else pa.uint64()),
    }
    if with_start:
        cols["start"] = pa.array([], pa.int64())
    empty = pa.table(cols)
    th, dix, fp, _owner = token_and_kgram_hashes(batch, text_col, k)
    n = len(th)
    if n == 0:
        return empty

    # cut AFTER token (gram_start + k - 1) for every boundary gram
    cut_after = np.zeros(n, dtype=bool)
    if len(fp):
        total = n - k + 1
        in_doc = dix[:total] == dix[k - 1 :]
        gstart = np.nonzero(in_doc)[0]  # flat start positions, fp-aligned
        bnd = gstart[fp % _U64(divisor) == 0]
        cut_after[bnd + k - 1] = True

    # chunk id per token = #cuts strictly before it, reset per doc
    doc_head = np.ones(n, dtype=bool)
    doc_head[1:] = dix[1:] != dix[:-1]
    inc = np.zeros(n, dtype=np.int64)
    inc[1:] = cut_after[:-1]
    inc[doc_head] = 0
    cum = np.cumsum(inc)
    # per-doc reset: subtract the cumsum value at each doc head
    head_idx = np.nonzero(doc_head)[0]
    doc_lens = np.diff(np.concatenate([head_idx, [n]]))
    chunk_of = cum - np.repeat(cum[head_idx], doc_lens)

    if max_tokens:
        # fixed-stride split of oversized chunks: sub-chunk = local
        # token offset // max_tokens, folded into a combined chunk key
        new_head = doc_head.copy()
        new_head[1:] |= chunk_of[1:] != chunk_of[:-1]
        starts0 = np.nonzero(new_head)[0]
        lens0 = np.diff(np.concatenate([starts0, [n]]))
        local = np.arange(n, dtype=np.int64) - np.repeat(starts0, lens0)
        sub = local // int(max_tokens)
        # renumber (chunk_of, sub) into a dense per-doc chunk index below
        key_change = np.zeros(n, dtype=bool)
        key_change[1:] = (chunk_of[1:] != chunk_of[:-1]) | (sub[1:] != sub[:-1])
        key_change[doc_head] = False
        chunk_of = np.cumsum(key_change.astype(np.int64))
        chunk_of -= np.repeat(chunk_of[head_idx], doc_lens)

    # segmented chunk hash: positional polynomial in uint64 wraparound
    chead = doc_head.copy()
    chead[1:] |= chunk_of[1:] != chunk_of[:-1]
    cstarts = np.nonzero(chead)[0]
    clens = np.diff(np.concatenate([cstarts, [n]]))
    pos_in_chunk = np.arange(n, dtype=np.int64) - np.repeat(cstarts, clens)
    W = cdc_pos_weights(int(pos_in_chunk.max()) + 1)
    terms = th * W[pos_in_chunk]  # uint64 wraparound, ring-hom to the twin
    sums = np.add.reduceat(terms, cstarts)
    if len(cstarts) == 1:
        sums = np.atleast_1d(sums)
    ch = splitmix64(sums.astype(np.uint64))

    batch_docs = batch["doc_id"].to_numpy(zero_copy_only=False)
    out = {
        "doc_id": pa.array(
            batch_docs[dix[cstarts]].astype(np.int64), pa.int64()
        ),
        "chunk_idx": pa.array(chunk_of[cstarts], pa.int64()),
        "n_tokens": pa.array(clens.astype(np.int64), pa.int64()),
        hcol: (
            pa.array([f"{int(v):016x}" for v in ch], pa.string())
            if hex_hash
            else pa.array(ch, pa.uint64())
        ),
    }
    if with_start:
        doc_start_flat = np.repeat(head_idx, doc_lens)
        out["start"] = pa.array(
            (cstarts - doc_start_flat[cstarts]).astype(np.int64), pa.int64()
        )
    return pa.table(out)


def cdc_chunks(
    docs: ray.data.Dataset,
    text_col: str = "text",
    k: int = 4,
    divisor: int = 16,
    max_tokens: int = 0,
) -> ray.data.Dataset:
    """Dataset wrapper over :func:`cdc_chunk_batch` — row-local, no
    shuffle at any corpus size."""
    return docs.map_batches(
        lambda b: cdc_chunk_batch(b, text_col, k, divisor, max_tokens),
        batch_format="pyarrow",
    )


def cdc_dup_chunks(
    docs: ray.data.Dataset,
    text_col: str = "text",
    k: int = 4,
    divisor: int = 16,
    max_tokens: int = 0,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """(chunk_hash_hex, n_occurrences, n_docs, n_tokens): chunks whose
    content recurs (>1 occurrence corpus-wide) — the duplicated-mass
    report.  One bucketed groupby over the slim chunk projection
    (``hash % num_buckets``, same exchange shape as the other pair/dup
    ops); per-bucket work is one lexsort + run masks — no per-hash
    Python.  Internally the hash travels as a raw uint64 (``hex_hash=
    False``) — hex formatting happens only on the dup-set-sized output
    rows."""
    chunks = docs.map_batches(
        lambda b: cdc_chunk_batch(
            b, text_col, k, divisor, max_tokens, hex_hash=False
        ),
        batch_format="pyarrow",
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        hv = t["chunk_hash"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((hv % _U64(num_buckets)).astype(np.int64))
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        hv = group["chunk_hash"].to_numpy(zero_copy_only=False)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        nt = group["n_tokens"].to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "chunk_hash_hex": pa.array([], pa.string()),
                "n_occurrences": pa.array([], pa.int64()),
                "n_docs": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
        if len(hv) == 0:
            return empty
        order = np.lexsort((d, hv))
        hv, d, nt = hv[order], d[order], nt[order]
        head = np.ones(len(hv), dtype=bool)
        head[1:] = hv[1:] != hv[:-1]
        starts = np.nonzero(head)[0]
        counts = np.diff(np.concatenate([starts, [len(hv)]]))
        dup = counts > 1
        if not dup.any():
            return empty
        # distinct docs per run: doc-change marks within sorted runs
        dhead = head.copy()
        dhead[1:] |= d[1:] != d[:-1]
        ndocs = np.add.reduceat(dhead.astype(np.int64), starts)
        ntmax = np.maximum.reduceat(nt, starts)
        s, c = starts[dup], counts[dup]
        return pa.table(
            {
                "chunk_hash_hex": pa.array(
                    [f"{int(v):016x}" for v in hv[s]], pa.string()
                ),
                "n_occurrences": pa.array(c.astype(np.int64), pa.int64()),
                "n_docs": pa.array(
                    np.atleast_1d(ndocs)[dup].astype(np.int64), pa.int64()
                ),
                "n_tokens": pa.array(
                    np.atleast_1d(ntmax)[dup].astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        chunks.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def remove_dup_chunks(
    docs: ray.data.Dataset,
    text_col: str = "text",
    k: int = 4,
    divisor: int = 16,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """(doc_id, text, n_removed): the CDC REMOVAL step — every
    occurrence of a duplicated chunk EXCEPT the canonical one (smallest
    (doc_id, chunk_idx) corpus-wide, within-doc repeats included) is cut
    and the surviving tokens rejoined with single spaces.  The
    chunk-granular sibling of
    ``ops.substring.remove_duplicate_spans`` — same output contract,
    but the cut unit is the content-defined chunk, so a corpus keeps
    exactly one copy of each repeated block.

    Shape: canonical selection is one bucketed groupby over the slim
    chunk projection (per-bucket lexsort + run head mask — the
    canonical of a hash never leaves its bucket); the cut itself is the
    shared :func:`substring.cut_spans` co-group."""
    from intertext_ray.ops.substring import cut_spans

    chunks = docs.map_batches(
        lambda b: cdc_chunk_batch(
            b, text_col, k, divisor, with_start=True, hex_hash=False
        ),
        batch_format="pyarrow",
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        hv = t["chunk_hash"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((hv % _U64(num_buckets)).astype(np.int64))
        )

    def emit_cuts(group: pa.Table) -> pa.Table:
        """Non-canonical occurrences of duplicated hashes, as 1-based
        inclusive token spans."""
        hv = group["chunk_hash"].to_numpy(zero_copy_only=False)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        ci = group["chunk_idx"].to_numpy(zero_copy_only=False)
        st = group["start"].to_numpy(zero_copy_only=False)
        nt = group["n_tokens"].to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "start_pos": pa.array([], pa.int64()),
                "end_pos": pa.array([], pa.int64()),
            }
        )
        if len(hv) == 0:
            return empty
        order = np.lexsort((ci, d, hv))
        hv, d, ci, st, nt = hv[order], d[order], ci[order], st[order], nt[order]
        head = np.ones(len(hv), dtype=bool)
        head[1:] = hv[1:] != hv[:-1]
        # cut everything that is not the head (canonical) of its run
        cut = ~head
        if not cut.any():
            return empty
        return pa.table(
            {
                "doc_id": pa.array(d[cut].astype(np.int64), pa.int64()),
                "start_pos": pa.array(
                    (st[cut] + 1).astype(np.int64), pa.int64()
                ),
                "end_pos": pa.array(
                    (st[cut] + nt[cut]).astype(np.int64), pa.int64()
                ),
            }
        )

    cuts = (
        chunks.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(emit_cuts, batch_format="pyarrow")
    )
    return cut_spans(docs, cuts, text_col, num_buckets)
