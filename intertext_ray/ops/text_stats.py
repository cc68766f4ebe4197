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
import ray.data

# marker stopwords per language for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"},
    "es": {"el", "la", "los", "y", "de", "un", "una", "es", "que", "por"},
    "de": {"der", "die", "das", "und", "von", "ein", "eine", "ist", "zu", "mit"},
}
EN_STOPWORDS = STOPWORDS["en"]


def token_counts(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, n_tokens) — whitespace tokenization (reference N1)."""

    def fn(batch: pa.Table) -> pa.Table:
        n = [len(t.split()) for t in batch[text_col].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n, pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def quality_scores(docs: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, n_tokens, n_unique_tokens, ttr_x1000, stopword_x1000,
    mean_token_len_x100) — integer-scaled quality signals (length, lexical
    diversity, stopword ratio)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        nt, nu, ttr, sw, mtl = [], [], [], [], []
        for t in texts:
            toks = t.split()
            n = len(toks)
            u = len(set(toks))
            nt.append(n)
            nu.append(u)
            ttr.append(math.floor(1000.0 * u / n) if n else 0)
            s = sum(1 for w in toks if w in EN_STOPWORDS)
            sw.append(math.floor(1000.0 * s / n) if n else 0)
            total_len = sum(len(w) for w in toks)
            mtl.append(math.floor(100.0 * total_len / n) if n else 0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(nt, pa.int64()),
                "n_unique_tokens": pa.array(nu, pa.int64()),
                "ttr_x1000": pa.array(ttr, pa.int64()),
                "stopword_x1000": pa.array(sw, pa.int64()),
                "mean_token_len_x100": pa.array(mtl, pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def lang_id(
    docs: ray.data.Dataset, text_col: str = "text", min_ratio: float = 0.03
) -> ray.data.Dataset:
    """(doc_id, pred_lang) — stopword-marker language heuristic: the
    language whose marker-word ratio is highest wins if >= min_ratio, else
    'und'.  Ties broken by language code order (deterministic)."""

    def fn(batch: pa.Table) -> pa.Table:
        preds = []
        for t in batch[text_col].to_pylist():
            toks = t.split()
            n = len(toks)
            best, best_r = "und", min_ratio
            if n:
                for lang in sorted(STOPWORDS):
                    r = sum(1 for w in toks if w in STOPWORDS[lang]) / n
                    if r > best_r:
                        best, best_r = lang, r
            preds.append(best)
        return pa.table(
            {"doc_id": batch["doc_id"], "pred_lang": pa.array(preds, pa.string())}
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


def rolling_fingerprints(
    docs: ray.data.Dataset,
    text_col: str = "text",
    k: int = 8,
    keep_mod: int = 16,
) -> ray.data.Dataset:
    """Winnowing-style document fingerprints: rolling hash over word
    ``k``-grams, keeping hashes ≡ 0 (mod keep_mod) — a deterministic sparse
    sketch usable for containment search.  Output (doc_id, fp:uint64) rows."""

    def fn(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_doc, out_fp = [], []
        for d, t in zip(doc_ids, batch[text_col].to_pylist()):
            toks = t.split()
            if len(toks) < k:
                continue
            hs = np.array(
                [
                    int.from_bytes(
                        hashlib.md5(" ".join(toks[i : i + k]).encode()).digest()[:8],
                        "little",
                    )
                    for i in range(len(toks) - k + 1)
                ],
                dtype=np.uint64,
            )
            kept = hs[hs % np.uint64(keep_mod) == 0]
            out_doc.extend([int(d)] * len(kept))
            out_fp.extend(kept.tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "fp": pa.array(np.array(out_fp, dtype=np.uint64), pa.uint64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")
