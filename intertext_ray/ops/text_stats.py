"""Text analysis ops for training-data pipelines: token counting, quality
scoring, language-ID (stopword heuristic), document fingerprinting.

All vectorized or single-pass per batch; every op is a stateless
``map_batches`` transform with a DuckDB-expressible twin in
``__ray_entry__.oracle_sql`` (integer outputs chosen so value-hash
comparison is exact).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# marker stopwords per language for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"},
    "es": {"el", "la", "los", "y", "de", "un", "una", "es", "que", "por"},
    "de": {"der", "die", "das", "und", "von", "ein", "eine", "ist", "zu", "mit"},
}
EN_STOPWORDS = STOPWORDS["en"]


def _flat_tokens(texts: pa.Array):
    """Whitespace tokenization over the whole batch at once — semantics of
    Python ``str.split()`` (runs collapse, empties dropped), computed with
    Arrow kernels: no per-row Python, no materialized Python strings.
    Returns (flat token array, doc index per token, token count per doc).
    (Divergence note: exotic control chars 0x1c-0x1f are str.split()
    whitespace but not Unicode whitespace — absent from this data model.)"""
    import pyarrow.compute as pc

    toks = pc.utf8_split_whitespace(texts)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    counts = np.asarray(
        pc.list_value_length(toks).to_numpy(zero_copy_only=False), dtype=np.int64
    )
    lens = np.asarray(
        pc.utf8_length(flat).to_numpy(zero_copy_only=False), dtype=np.int64
    )
    doc_idx = np.repeat(np.arange(len(texts)), counts)
    keep = lens > 0  # leading/trailing-whitespace artifacts
    doc_idx = doc_idx[keep]
    return (
        flat.filter(pa.array(keep)),
        doc_idx,
        np.bincount(doc_idx, minlength=len(texts)).astype(np.int64),
    )


def token_counts(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, n_tokens) — whitespace tokenization (reference N1)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        _, _, n = _flat_tokens(texts)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n, pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def quality_scores_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """The :func:`quality_scores` kernel over one batch (output rows 1:1
    and in input order — callers may zip against the input batch)."""
    import pyarrow.compute as pc

    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    flat, dix, n = _flat_tokens(texts)
    nd = len(texts)
    codes = np.asarray(
        pc.dictionary_encode(flat).indices.to_numpy(zero_copy_only=False),
        dtype=np.int64,
    )
    order = np.lexsort((codes, dix))
    ds, cs = dix[order], codes[order]
    first = np.ones(len(ds), dtype=bool)
    if len(ds) > 1:
        first[1:] = (ds[1:] != ds[:-1]) | (cs[1:] != cs[:-1])
    nu = np.bincount(ds[first], minlength=nd).astype(np.int64)
    sw_mask = np.asarray(
        pc.is_in(flat, value_set=pa.array(sorted(EN_STOPWORDS))).to_numpy(
            zero_copy_only=False
        )
    )
    sw = np.bincount(dix[sw_mask], minlength=nd).astype(np.int64)
    tl = np.bincount(
        dix,
        weights=np.asarray(
            pc.utf8_length(flat).to_numpy(zero_copy_only=False),
            dtype=np.float64,
        ),
        minlength=nd,
    ).astype(np.int64)
    nz = n > 0
    ttr = np.zeros(nd, np.int64)
    swx = np.zeros(nd, np.int64)
    mtl = np.zeros(nd, np.int64)
    ttr[nz] = np.floor(1000.0 * nu[nz] / n[nz]).astype(np.int64)
    swx[nz] = np.floor(1000.0 * sw[nz] / n[nz]).astype(np.int64)
    mtl[nz] = np.floor(100.0 * tl[nz] / n[nz]).astype(np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n, pa.int64()),
            "n_unique_tokens": pa.array(nu, pa.int64()),
            "ttr_x1000": pa.array(ttr, pa.int64()),
            "stopword_x1000": pa.array(swx, pa.int64()),
            "mean_token_len_x100": pa.array(mtl, pa.int64()),
        }
    )


def quality_scores(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, n_tokens, n_unique_tokens, ttr_x1000, stopword_x1000,
    mean_token_len_x100) — integer-scaled quality signals (length, lexical
    diversity, stopword ratio).  Vectorized: distinct-token counts via
    dictionary encoding (exact string identity) + a (doc, code) lexsort;
    stopword membership via ``pc.is_in``; per-doc sums via ``bincount``.
    Kernel factored as :func:`quality_scores_batch` for composed ops."""
    return docs.map_batches(
        lambda b: quality_scores_batch(b, text_col), batch_format="pyarrow"
    )



def lang_id(
    docs: ray.data.Dataset, text_col: str = "text", min_ratio: float = 0.03
) -> ray.data.Dataset:
    """(doc_id, pred_lang) — stopword-marker language heuristic: the
    language whose marker-word ratio is highest wins if >= min_ratio, else
    'und'.  Ties broken by language code order (deterministic).  Vectorized:
    one ``pc.is_in`` + ``bincount`` per language over the flat token array."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        flat, dix, n = _flat_tokens(texts)
        nd = len(texts)
        best_r = np.full(nd, float(min_ratio))
        best = np.full(nd, "und", dtype=object)
        nz = n > 0
        for lang in sorted(STOPWORDS):
            m = np.asarray(
                pc.is_in(
                    flat, value_set=pa.array(sorted(STOPWORDS[lang]))
                ).to_numpy(zero_copy_only=False)
            )
            cnt = np.bincount(dix[m], minlength=nd).astype(np.float64)
            r = np.zeros(nd)
            r[nz] = cnt[nz] / n[nz]
            win = r > best_r
            best[win] = lang
            best_r[win] = r[win]
        return pa.table(
            {"doc_id": batch["doc_id"], "pred_lang": pa.array(list(best), pa.string())}
        )

    return docs.map_batches(fn, batch_format="pyarrow")


# GPT-2-style pretokenizer pattern, lookahead-free so the SAME RE2 engine
# evaluates it in pyarrow (count_substring_regex) and DuckDB
# (regexp_extract_all) — the oracle twin is count-exact by construction
BPE_TOKEN_PATTERN = r"'(?:s|d|m|t|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_counts(
    docs: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """(doc_id, n_bpe_tokens) — BPE-ish pretokenization count (contractions,
    letter runs, digit runs, punctuation runs, whitespace runs), one
    vectorized RE2 scan per batch.  A byte-pair merge step would only lower
    counts further; this is the standard pretokenizer granularity used for
    budget estimates."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch[text_col], BPE_TOKEN_PATTERN)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tokens": pc.cast(n, pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def content_fingerprints(
    docs: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """(doc_id, content_md5) — md5 of the whitespace-normalized, lowercased
    text (SQL-expressible twin: DuckDB md5())."""

    def fn(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch[text_col].to_pylist():
            norm = " ".join(t.split()).lower()
            out.append(hashlib.md5(norm.encode("utf-8")).hexdigest())
        return pa.table(
            {"doc_id": batch["doc_id"], "content_md5": pa.array(out, pa.string())}
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def repetition_scores(
    docs: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """Gopher-style (Rae et al. 2021) within-document repetition signals,
    as exact integer counts (fractions = count/denominator, derivable;
    integers hash-compare exactly against the DuckDB twin):

    (doc_id, n_tokens, dup_word_occ, n_bigrams, top_bigram_count,
    n_trigrams, top_trigram_count) where ``dup_word_occ`` = occurrences of
    words appearing >= 2 times in the doc, ``top_k-gram_count`` = count of
    the doc's most frequent word k-gram (0 when the doc has < k tokens).

    Vectorized: one flat tokenization + chain hash per batch, k-gram ids
    via the pinned polynomial, per-(doc, gram) run counts from a lexsort —
    no per-doc Python."""
    from intertext_ray.ops.simhash import _chain_hash_tokens

    def _per_doc_run_stats(dix, key, n_docs):
        """(dup_occ, top_count) per doc over (doc, key) runs."""
        dup = np.zeros(n_docs, dtype=np.int64)
        top = np.zeros(n_docs, dtype=np.int64)
        if len(key) == 0:
            return dup, top
        order = np.lexsort((key, dix))
        d2, k2 = dix[order], key[order]
        new = np.ones(len(d2), dtype=bool)
        new[1:] = (d2[1:] != d2[:-1]) | (k2[1:] != k2[:-1])
        starts = np.nonzero(new)[0]
        counts = np.diff(np.concatenate([starts, [len(d2)]]))
        run_doc = d2[starts]
        rep = counts >= 2
        np.add.at(dup, run_doc[rep], counts[rep])
        np.maximum.at(top, run_doc, counts)
        return dup, top

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n_docs = len(texts)
        flat, dix, nt = _flat_tokens(texts)
        th = _chain_hash_tokens(flat)
        dup_w, _ = _per_doc_run_stats(dix, th, n_docs)
        out = {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(nt, pa.int64()),
            "dup_word_occ": pa.array(dup_w, pa.int64()),
        }
        for k, name in ((2, "bigram"), (3, "trigram")):
            n = len(th)
            n_grams = np.maximum(nt - k + 1, 0)
            if n >= k:
                P = rolling_gram_weights(k)
                total = n - k + 1
                acc = np.zeros(total, dtype=np.uint64)
                for j in range(k):
                    acc += th[j : j + total] * P[j]
                in_doc = dix[:total] == dix[k - 1 :]
                from intertext_ray.functions.hashing import splitmix64

                g = splitmix64(acc[in_doc])
                gd = dix[:total][in_doc]
                _, top = _per_doc_run_stats(gd, g, n_docs)
            else:
                top = np.zeros(n_docs, dtype=np.int64)
            out[f"n_{name}s"] = pa.array(n_grams, pa.int64())
            out[f"top_{name}_count"] = pa.array(top, pa.int64())
        return pa.table(out)

    return docs.map_batches(fn, batch_format="pyarrow")


def top_ngrams(
    docs: ray.data.Dataset,
    text_col: str = "text",
    n: int = 2,
    top: int = 20,
) -> ray.data.Dataset:
    """Corpus-wide most frequent word ``n``-grams: (gram, n_occ), the
    top ``top`` rows by (count DESC, gram ASC) — a deterministic total
    order, so the result set is stable under any execution plan.

    The scale pattern is pre-aggregation BEFORE the shuffle: each batch
    emits its gram counts via one Arrow hash aggregate (the combiner), so
    the groupby-sum exchanges at most |distinct grams per batch| rows, not
    one row per occurrence; the final sort+limit runs over distinct grams
    only."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        empty = pa.table(
            {
                "gram": pa.array([], pa.string()),
                "partial": pa.array([], pa.int64()),
            }
        )
        if len(texts) == 0:
            return empty
        flat, dix, _ = _flat_tokens(texts)
        total = len(flat) - n + 1
        if total <= 0:
            return empty
        parts = [flat.slice(j, total) for j in range(n)]
        grams = pc.binary_join_element_wise(*parts, " ")
        in_doc = pa.array(dix[:total] == dix[n - 1 :])
        t = pa.table({"gram": grams.filter(in_doc)})
        agg = t.group_by("gram").aggregate([("gram", "count")])
        return pa.table(
            {
                "gram": agg["gram"],
                "partial": pc.cast(agg["gram_count"], pa.int64()),
            }
        )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "gram": b["gram"],
                "n_occ": pc.cast(b["sum(partial)"], pa.int64()),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("gram")
        .sum("partial")
        .map_batches(rename, batch_format="pyarrow")
        .sort(["n_occ", "gram"], descending=[True, False])
        .limit(top)
    )


def rolling_gram_weights(k: int = 8) -> np.ndarray:
    """Pinned per-position multipliers for the k-gram polynomial hash: odd
    32-bit constants derived from the splitmix family (small enough that a
    128-bit product never overflows — the DuckDB oracle twin computes the
    identical sum in HUGEINT arithmetic)."""
    from intertext_ray.functions.hashing import splitmix64

    idx = np.arange(k, dtype=np.uint64) + np.uint64(0xF1A5)
    return (splitmix64(idx) >> np.uint64(32)) | np.uint64(1)


def rolling_fingerprints(
    docs: ray.data.Dataset,
    text_col: str = "text",
    k: int = 8,
    keep_mod: int = 16,
) -> ray.data.Dataset:
    """Winnowing-style document fingerprints: positional polynomial hash
    over word ``k``-grams, keeping hashes ≡ 0 (mod keep_mod) — a
    deterministic sparse sketch usable for containment search.  Output
    (doc_id, fp_hex) rows, one per kept window position.

    Fully vectorized (no per-gram Python): token hashes come from the
    shared splitmix64 byte-chain over the flat Arrow token buffer; the
    k-gram hash is ``splitmix64(sum_j th[i+j] * P[j] mod 2^64)`` computed as
    ``k`` shifted multiply-adds over the whole batch.  The identical value
    is SQL-expressible (``__ray_entry__.oracle_sql['rolling_fingerprints']``).
    """
    def fn(batch: pa.Table) -> pa.Table:
        return rolling_fp_batch(batch, text_col=text_col, k=k, keep_mod=keep_mod)

    return docs.map_batches(fn, batch_format="pyarrow")


def token_and_kgram_hashes(
    batch: pa.Table, text_col: str = "text", k: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Token-level AND k-gram-level hashes for a batch:
    ``(th, dix, fp, owner)`` — ``th[i]`` the splitmix64 byte-chain hash of
    the i-th (non-empty) token, ``dix[i]`` its doc row index, ``fp``/
    ``owner`` the per-position k-gram polynomial hashes as in
    :func:`kgram_hashes`.  Token streams of one doc are contiguous and in
    order (docs arrive whole).  Shared kernel behind rolling / winnowing
    / CDC fingerprinting so every SQL twin pins the identical chain."""
    import pyarrow.compute as pc

    from intertext_ray.functions.hashing import splitmix64
    from intertext_ray.ops.simhash import _chain_hash_tokens

    P = rolling_gram_weights(k)
    e_u64 = np.empty(0, np.uint64)
    e_i64 = np.empty(0, np.int64)

    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    if n_docs == 0:
        return e_u64, e_i64, e_u64, e_i64
    toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(texts))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    counts = np.asarray(counts, dtype=np.int64)
    doc_idx = np.repeat(np.arange(n_docs), counts)
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    valid = np.asarray(lens, dtype=np.int64) > 0
    th = _chain_hash_tokens(flat)[valid]
    dix = doc_idx[valid]
    n = len(th)
    if n < k:
        return th, dix, e_u64, e_i64
    # polynomial over every flat position, then mask windows that span
    # a document boundary
    total = n - k + 1
    acc = np.zeros(total, dtype=np.uint64)
    for j in range(k):
        acc += th[j : j + total] * P[j]
    in_doc = dix[:total] == dix[k - 1 :]
    fp = splitmix64(acc[in_doc])
    owner = dix[:total][in_doc]
    return th, dix, fp, owner


def kgram_hashes(
    batch: pa.Table, text_col: str = "text", k: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """Per-position word k-gram hashes for a batch: ``(fp, owner)`` where
    ``fp[i]`` is the splitmix-finalized positional polynomial hash of the
    k-gram starting at the owner doc's i-th in-doc gram position, and
    ``owner[i]`` indexes into the batch's rows.  See
    :func:`token_and_kgram_hashes`."""
    _, _, fp, owner = token_and_kgram_hashes(batch, text_col, k)
    return fp, owner


def rolling_fp_batch(
    batch: pa.Table, text_col: str = "text", k: int = 8, keep_mod: int = 16
) -> pa.Table:
    """Batch kernel behind :func:`rolling_fingerprints` (module-level so
    driver-side passage fingerprinting reuses the identical code path)."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "fp_hex": pa.array([], pa.string()),
        }
    )
    fp, owner = kgram_hashes(batch, text_col, k)
    if len(fp) == 0:
        return empty
    keep = fp % np.uint64(keep_mod) == 0
    fp, owner = fp[keep], owner[keep]
    batch_docs = batch["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": pa.array(
                batch_docs[owner].astype(np.int64), pa.int64()
            ),
            "fp_hex": pa.array(
                [f"{int(v):016x}" for v in fp], pa.string()
            ),
        }
    )


def containment_search(
    docs: ray.data.Dataset,
    passage: str,
    text_col: str = "text",
    k: int = 8,
    keep_mod: int = 16,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Find documents CONTAINING (sharing k-gram fingerprints with) a query
    passage: (doc_id, n_shared) where n_shared = distinct rolling
    fingerprints of the passage also present in the doc.

    Scale shape: the passage's fingerprint set is tiny (positions/keep_mod)
    and broadcast once; the corpus side streams through the same
    fingerprint kernel, keeps only colliding rows (typically a vanishing
    fraction), and one small bucketed groupby counts distinct shared prints
    per doc — the index side never materializes."""
    import ray

    from intertext_ray.functions.hashing import splitmix64

    qt = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            text_col: pa.array([passage], pa.string()),
        }
    )
    qfps = set(rolling_fp_batch(qt, text_col, k, keep_mod)["fp_hex"].to_pylist())
    qref = ray.put(sorted(qfps))
    nbu = np.uint64(num_buckets)

    def match(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        fps = rolling_fp_batch(batch, text_col, k, keep_mod)
        if fps.num_rows == 0:
            return fps.append_column("bucket", pa.array([], pa.int64()))
        qs = ray.get(qref)
        keep = pc.is_in(fps["fp_hex"], value_set=pa.array(qs, pa.string()))
        fps = fps.filter(keep)
        d = fps["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return fps.append_column(
            "bucket", pa.array((splitmix64(d) % nbu).astype(np.int64))
        )

    def count_distinct(g: pa.Table) -> pa.Table:
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        h = np.asarray(
            [int(x, 16) for x in g["fp_hex"].to_pylist()], dtype=np.uint64
        )
        order = np.lexsort((h, d))
        ds_, hs = d[order], h[order]
        first = np.ones(len(ds_), dtype=bool)
        if len(ds_) > 1:
            first[1:] = (ds_[1:] != ds_[:-1]) | (hs[1:] != hs[:-1])
        seg_doc = ds_[first]
        doc_first = np.ones(len(seg_doc), dtype=bool)
        if len(seg_doc) > 1:
            doc_first[1:] = seg_doc[1:] != seg_doc[:-1]
        seg_ids = np.cumsum(doc_first) - 1
        n = np.bincount(seg_ids)
        return pa.table(
            {
                "doc_id": pa.array(seg_doc[doc_first].astype(np.int64), pa.int64()),
                "n_shared": pa.array(n, pa.int64()),
            }
        )

    return (
        docs.map_batches(match, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_distinct, batch_format="pyarrow")
    )


def doc_top_terms(
    docs: ray.data.Dataset,
    text_col: str = "text",
    top: int = 3,
    broadcast_vocab_limit: int = 4_000_000,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-doc characteristic terms — tf-idf-style ranking in EXACT integer
    arithmetic: per doc, terms ordered by (tf DESC, df ASC, term ASC) and
    the ``top`` kept.  Rarer-overall terms win tf ties, so the ranking is
    the idf ordering without the float log (hash-exact vs the SQL twin).

    Scale shape: two streaming passes over the corpus.  Pass 1 builds the
    global document-frequency table with the combiner-before-shuffle
    pattern (each batch ships its distinct (term, partial-df) rows only);
    the df table stays cluster-resident (``materialize()``, vocab-sized).
    Pass 2 depends on the vocabulary size:

    - vocab <= ``broadcast_vocab_limit``: the df table is broadcast once
      via ``ray.put`` as sorted arrays; tf is recomputed batch-locally
      (docs never shuffle), df mapped with one searchsorted, per-doc
      top-k with one lexsort.
    - vocab above the limit (open web vocab — URLs, typos, code — can
      exceed any broadcast budget): term-bucketed JOIN fallback.  tf rows
      and df rows meet in a hash(term) co-group (df resolved onto tf rows
      via one searchsorted per bucket), then a hash(doc) groupby takes
      the per-doc top-k.  The driver holds NOTHING; both exchanges are
      tf-row-sized, never corpus-text-sized.

    Both paths emit identical rows: (doc_id, term, tf, df, term_rank),
    term_rank 1-based (equality test-pinned).
    """

    def df_partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        empty = pa.table(
            {"term": pa.array([], pa.string()), "partial": pa.array([], pa.int64())}
        )
        if len(texts) == 0:
            return empty
        flat, dix, _ = _flat_tokens(texts)
        if len(flat) == 0:
            return empty
        t = pa.table({"term": flat, "doc": pa.array(dix)})
        dd = t.group_by(["term", "doc"]).aggregate([])  # distinct (term, doc)
        agg = dd.group_by("term").aggregate([("doc", "count")])
        return pa.table(
            {"term": agg["term"], "partial": pc.cast(agg["doc_count"], pa.int64())}
        )

    df_ds = (
        docs.map_batches(df_partial, batch_format="pyarrow")
        .groupby("term")
        .sum("partial")
        .materialize()  # vocab-sized; blocks stay in the object store
    )
    if df_ds.count() > broadcast_vocab_limit:
        return _doc_top_terms_join(
            docs, df_ds, text_col, top, num_buckets
        )
    df_tbl = df_ds.to_pandas()
    terms_sorted = np.sort(df_tbl["term"].to_numpy().astype(str))
    order = np.argsort(df_tbl["term"].to_numpy().astype(str))
    dfs_sorted = df_tbl["sum(partial)"].to_numpy().astype(np.int64)[order]
    ref = ray.put((terms_sorted, dfs_sorted))

    def score(batch: pa.Table) -> pa.Table:
        vocab, dfs = ray.get(ref)
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
                "term_rank": pa.array([], pa.int64()),
            }
        )
        if len(texts) == 0:
            return empty
        flat, dix, _ = _flat_tokens(texts)
        if len(flat) == 0:
            return empty
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        import pandas as pd

        tf = (
            pd.DataFrame({"d": dix, "w": flat.to_pandas()})
            .groupby(["d", "w"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        w = tf["w"].to_numpy().astype(str)
        dfv = dfs[np.searchsorted(vocab, w)]  # every term is in the vocab
        d = tf["d"].to_numpy()
        tfv = tf["tf"].to_numpy().astype(np.int64)
        # per-doc order: tf DESC, df ASC, term ASC  (lexsort keys reversed)
        o = np.lexsort((w, dfv, -tfv, d))
        ds_, tfs_, dfs_, ws_ = d[o], tfv[o], dfv[o], w[o]
        starts = np.ones(len(ds_), dtype=bool)
        starts[1:] = ds_[1:] != ds_[:-1]
        run_start = np.nonzero(starts)[0]
        run_id = np.cumsum(starts) - 1
        rank = np.arange(len(ds_), dtype=np.int64) - run_start[run_id] + 1
        keep = rank <= top
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[ds_[keep]], pa.int64()),
                "term": pa.array(ws_[keep], pa.string()),
                "tf": pa.array(tfs_[keep], pa.int64()),
                "df": pa.array(dfs_[keep], pa.int64()),
                "term_rank": pa.array(rank[keep], pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


_TOP_TERMS_TAGGED = pa.schema(
    [
        ("bucket", pa.int64()),
        ("kind", pa.int8()),
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int64()),
        ("df", pa.int64()),
    ]
)

_TOP_TERMS_SCORED = pa.schema(
    [
        ("dbucket", pa.int64()),
        ("doc_id", pa.int64()),
        ("term", pa.string()),
        ("tf", pa.int64()),
        ("df", pa.int64()),
    ]
)


def _doc_top_terms_join(
    docs: ray.data.Dataset,
    df_ds: ray.data.Dataset,
    text_col: str,
    top: int,
    num_buckets: int,
) -> ray.data.Dataset:
    """The above-broadcast-budget path of :func:`doc_top_terms`: tf rows
    and df rows co-grouped by hash(term) bucket (df resolved onto tf rows
    via one searchsorted per bucket), then per-doc top-k under a
    hash(doc_id) groupby.  No driver-side or broadcast vocabulary state."""
    from intertext_ray.functions.hashing import splitmix64
    from intertext_ray.ops.simhash import _chain_hash_tokens

    nb = np.uint64(num_buckets)

    def tag_df(t: pa.Table) -> pa.Table:
        terms = t["term"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        n = len(terms)
        if n == 0:
            return _TOP_TERMS_TAGGED.empty_table()
        h = _chain_hash_tokens(terms)
        return pa.table(
            {
                "bucket": pa.array((h % nb).astype(np.int64), pa.int64()),
                "kind": pa.array(np.zeros(n, np.int8), pa.int8()),
                "term": pc.cast(terms, pa.string()),
                "doc_id": pa.array(np.zeros(n, np.int64), pa.int64()),
                "tf": pa.array(np.zeros(n, np.int64), pa.int64()),
                "df": pc.cast(t["sum(partial)"], pa.int64()),
            },
            schema=_TOP_TERMS_TAGGED,
        )

    def tag_tf(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if len(texts) == 0:
            return _TOP_TERMS_TAGGED.empty_table()
        flat, dix, _ = _flat_tokens(texts)
        if len(flat) == 0:
            return _TOP_TERMS_TAGGED.empty_table()
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        import pandas as pd

        tf = (
            pd.DataFrame({"d": dix, "w": flat.to_pandas()})
            .groupby(["d", "w"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        terms = pa.array(tf["w"], pa.string())
        h = _chain_hash_tokens(terms)
        n = len(terms)
        return pa.table(
            {
                "bucket": pa.array((h % nb).astype(np.int64), pa.int64()),
                "kind": pa.array(np.ones(n, np.int8), pa.int8()),
                "term": terms,
                "doc_id": pa.array(
                    doc_ids[tf["d"].to_numpy()], pa.int64()
                ),
                "tf": pa.array(tf["tf"].to_numpy().astype(np.int64)),
                "df": pa.array(np.zeros(n, np.int64), pa.int64()),
            },
            schema=_TOP_TERMS_TAGGED,
        )

    def resolve(group: pa.Table) -> pa.Table:
        kind = group["kind"].to_numpy(zero_copy_only=False)
        terms = group["term"].to_numpy(zero_copy_only=False).astype(str)
        src = np.nonzero(kind == 0)[0]
        req = np.nonzero(kind == 1)[0]
        if len(req) == 0 or len(src) == 0:
            return _TOP_TERMS_SCORED.empty_table()
        src_terms = terms[src]
        order = np.argsort(src_terms, kind="stable")
        src_terms = src_terms[order]
        src_df = group["df"].to_numpy(zero_copy_only=False)[src[order]]
        pos = np.searchsorted(src_terms, terms[req])
        # every tf term exists in the df table (built from the same corpus)
        d = group["doc_id"].to_numpy(zero_copy_only=False)[req]
        return pa.table(
            {
                "dbucket": pa.array(
                    (splitmix64(d.astype(np.uint64)) % nb).astype(np.int64)
                ),
                "doc_id": pa.array(d, pa.int64()),
                "term": pa.array(terms[req], pa.string()),
                "tf": pa.array(
                    group["tf"].to_numpy(zero_copy_only=False)[req], pa.int64()
                ),
                "df": pa.array(src_df[pos], pa.int64()),
            },
            schema=_TOP_TERMS_SCORED,
        )

    def topk(group: pa.Table) -> pa.Table:
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        w = group["term"].to_numpy(zero_copy_only=False).astype(str)
        tfv = group["tf"].to_numpy(zero_copy_only=False)
        dfv = group["df"].to_numpy(zero_copy_only=False)
        o = np.lexsort((w, dfv, -tfv, d))
        ds_, tfs_, dfs_, ws_ = d[o], tfv[o], dfv[o], w[o]
        starts = np.ones(len(ds_), dtype=bool)
        starts[1:] = ds_[1:] != ds_[:-1]
        run_start = np.nonzero(starts)[0]
        run_id = np.cumsum(starts) - 1
        rank = np.arange(len(ds_), dtype=np.int64) - run_start[run_id] + 1
        keep = rank <= top
        return pa.table(
            {
                "doc_id": pa.array(ds_[keep], pa.int64()),
                "term": pa.array(ws_[keep], pa.string()),
                "tf": pa.array(tfs_[keep], pa.int64()),
                "df": pa.array(dfs_[keep], pa.int64()),
                "term_rank": pa.array(rank[keep], pa.int64()),
            }
        )

    tagged = df_ds.map_batches(tag_df, batch_format="pyarrow").union(
        docs.map_batches(tag_tf, batch_format="pyarrow")
    )
    scored = tagged.groupby("bucket").map_groups(
        resolve, batch_format="pyarrow"
    )
    return scored.groupby("dbucket").map_groups(topk, batch_format="pyarrow")


def bpe_merge_counts(
    docs: ray.data.Dataset,
    text_col: str = "text",
    top: int = 50,
) -> ray.data.Dataset:
    """First iteration of BPE vocabulary training: corpus-wide adjacent
    character-pair frequencies inside whitespace words — (pair, n_occ),
    the top ``top`` rows by (count DESC, pair ASC), a deterministic total
    order.  The highest row is exactly the first merge a BPE trainer
    (Sennrich et al. 2016, public algorithm) would perform; re-running
    after applying a merge yields the next, so this op is the distributed
    inner loop of tokenizer training.

    Scale shape (same as :func:`top_ngrams`): each batch first collapses
    to DISTINCT words with occurrence counts (one Arrow hash aggregate),
    then pair extraction is ``pc.utf8_slice_codeunits`` per character
    position — vectorized over all distinct words at once, max-word-length
    kernel calls per batch, no per-row Python.  The groupby-sum exchanges
    at most |distinct pairs per batch| rows (alphabet², tiny); the final
    sort+limit runs over distinct pairs only.  Character slicing is
    code-point based, matching DuckDB ``substr``/``length`` exactly."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        empty = pa.table(
            {
                "pair": pa.array([], pa.string()),
                "partial": pa.array([], pa.int64()),
            }
        )
        if len(texts) == 0:
            return empty
        flat, _, _ = _flat_tokens(texts)
        if len(flat) == 0:
            return empty
        wf = pa.table({"w": flat}).group_by("w").aggregate([("w", "count")])
        w = wf["w"]
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        f = pc.cast(wf["w_count"], pa.int64())
        nch = pc.utf8_length(w)
        max_len = int(pc.max(nch).as_py() or 0)
        pieces = []
        for i in range(max_len - 1):
            valid = pc.greater(nch, i + 1)  # needs >= i+2 chars
            pieces.append(
                pa.table(
                    {
                        "pair": pc.utf8_slice_codeunits(
                            w.filter(valid), start=i, stop=i + 2
                        ),
                        "f": f.filter(valid),
                    }
                )
            )
        if not pieces:
            return empty
        agg = (
            pa.concat_tables(pieces)
            .group_by("pair")
            .aggregate([("f", "sum")])
        )
        return pa.table(
            {
                "pair": agg["pair"],
                "partial": pc.cast(agg["f_sum"], pa.int64()),
            }
        )

    def rename(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(partial)" not in b.column_names:
            return pa.table(
                {
                    "pair": pa.array([], pa.string()),
                    "n_occ": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "pair": b["pair"],
                "n_occ": pc.cast(b["sum(partial)"], pa.int64()),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("pair")
        .sum("partial")
        .map_batches(rename, batch_format="pyarrow")
        .sort(["n_occ", "pair"], descending=[True, False])
        .limit(top)
    )
