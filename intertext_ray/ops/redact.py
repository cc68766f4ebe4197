"""PII redaction: scrub emails / phone numbers / IPv4 addresses.

Standard training-data hygiene pass.  Both the engine and the DuckDB
twin evaluate the SAME lookaround-free patterns in RE2 (pyarrow
``replace_substring_regex`` / DuckDB ``regexp_replace(..., 'g')``), with
the same application order, so the redacted text is byte-identical by
construction — the oracle checks the transform, not just the counts.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# (name, RE2 pattern, replacement) — applied in order
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
    ("phone", r"\+?[0-9][0-9()\-\s]{6,}[0-9]\b", "[PHONE]"),
]


def redact_pii(
    docs: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """(doc_id, clean_text, n_email, n_ipv4, n_phone): text with each PII
    class replaced by its tag, plus per-class match counts (counted on
    the text state each pattern actually sees, i.e. after the previous
    replacements — identical nesting in the SQL twin)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        out = {"doc_id": batch["doc_id"]}
        cur = texts
        counts = {}
        for name, pat, repl in PII_PATTERNS:
            counts[name] = pc.cast(
                pc.count_substring_regex(cur, pat), pa.int64()
            )
            cur = pc.replace_substring_regex(cur, pat, repl)
        out["clean_text"] = cur
        for name, _, _ in PII_PATTERNS:
            out[f"n_{name}"] = counts[name]
        return pa.table(out)

    return docs.map_batches(fn, batch_format="pyarrow")
