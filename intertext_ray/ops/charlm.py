"""Character-bigram language-model perplexity scoring — the model-based
quality filter (CCNet's KenLM idea at the smallest honest scale: train a
char-bigram LM on a held split of the corpus, score every doc by average
negative log-likelihood; gibberish/boilerplate scores high, fluent text
low).

Exactness contract — NO floats anywhere, so the DuckDB twin recomputes
the ENTIRE pipeline (counts, logs, scores) independently:

    L(x)   = Q20 fixed-point log2 (:func:`log2_q20`): normalize x to
             [2^30, 2^31), then 20 square-and-shift iterations — pure
             integer ops, identical in numpy and a SQL recursive CTE.
    nll2(a,b) = L(c_a + 256) - L(c_ab + 1)      (add-1 smoothing, V=256)
    score(doc) = sum(nll2 over consecutive byte pairs) // n_pairs

The model is trained on the ``splitmix64(doc_id) % 1000 < permille``
split (the hash_split idiom — membership is a pure function of the id,
resume-invariant).

Scale shape: bigram counting is a per-batch ``np.bincount(65536)``
combiner (fixed-size partial regardless of batch rows) -> one tiny
groupby -> the dense 65536-entry Q20 table (512 KB) broadcast via
``ray.put``; scoring is a row-local lookup + reduceat.  No corpus
shuffle at any size.

Byte caveat (same as every token-chain twin): the engine scores utf-8
BYTES, the twin ``ascii()`` code points — identical on the ASCII
testdata, documented divergence beyond it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from intertext_ray.functions.hashing import splitmix64

_Q = 20
_ONE31 = np.int64(1) << np.int64(31)


def log2_q20(x: np.ndarray) -> np.ndarray:
    """floor-ish Q20 fixed-point log2 of positive int64 (< 2^53), DEFINED
    by this exact algorithm (both engine and twin run it bit-for-bit):
    e = bit_length(x) - 1; y = x normalized to [2^30, 2^31) by shifting
    (truncating); 20 iterations of ``y = (y*y) >> 30; if y >= 2^31:
    bit=1, y >>= 1``.  Returns ``e * 2^20 + frac``; log2_q20(1) == 0."""
    x = np.asarray(x, dtype=np.int64)
    e = (np.frexp(x.astype(np.float64))[1] - 1).astype(np.int64)
    y = np.where(
        e >= 30, x >> np.maximum(e - 30, 0), x << np.maximum(30 - e, 0)
    ).astype(np.int64)
    frac = np.zeros_like(y)
    for _ in range(_Q):
        y = (y * y) >> np.int64(30)
        bit = y >= _ONE31
        frac = (frac << np.int64(1)) | bit.astype(np.int64)
        y = np.where(bit, y >> np.int64(1), y)
    return e * (np.int64(1) << np.int64(_Q)) + frac


def _byte_pairs(batch_texts) -> tuple[np.ndarray, np.ndarray]:
    """(codes, per-doc pair counts): codes = a*256+b over each doc's
    consecutive utf-8 byte pairs, concatenated in doc order."""
    if isinstance(batch_texts, pa.ChunkedArray):
        batch_texts = batch_texts.combine_chunks()
    arr = batch_texts
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    lens = np.diff(offsets)
    n_pairs = np.maximum(lens - 1, 0)
    # drop each doc's LAST byte position from the "first byte" index set
    total = int(offsets[-1] - offsets[0])
    keep = np.ones(total, dtype=bool)
    ends = (offsets[1:] - offsets[0])[lens > 0] - 1
    keep[ends] = False
    base = offsets[0]
    flat = data[base : base + total].astype(np.int64)
    firsts = flat[keep]
    seconds = flat[1:][keep[:-1]] if total else np.empty(0, np.int64)
    return firsts * 256 + seconds, n_pairs


def train_char_bigram(
    docs: ray.data.Dataset,
    text_col: str = "text",
    permille_train: int = 500,
    salt: int = 0,
) -> np.ndarray:
    """Dense int64[65536] Q20 table: nll2_q20[code] for EVERY byte pair,
    smoothed (L(c_a + 256) - L(c_ab + 1)), trained on the hash split."""
    s = np.uint64(salt)

    def partial(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        m = (splitmix64(d ^ s) % np.uint64(1000)) < permille_train
        sub = b.filter(pa.array(m))
        if len(sub) == 0:
            return pa.table(
                {
                    "code": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        codes, _ = _byte_pairs(sub[text_col])
        cnt = np.bincount(codes, minlength=65536).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "code": pa.array(nz.astype(np.int64), pa.int64()),
                "c": pa.array(cnt[nz], pa.int64()),
            }
        )

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("code")
        .sum("c")
        .to_pandas()
    )
    c_ab = np.zeros(65536, np.int64)
    if len(agg):
        c_ab[agg["code"].to_numpy().astype(np.int64)] = (
            agg["sum(c)"].to_numpy().astype(np.int64)
        )
    c_a = c_ab.reshape(256, 256).sum(axis=1)
    l_den = log2_q20(c_a + 256)  # per first byte
    l_num = log2_q20(c_ab + 1)  # per pair (unseen -> L(1) = 0)
    return np.repeat(l_den, 256) - l_num


def perplexity_scores(
    docs: ray.data.Dataset,
    text_col: str = "text",
    permille_train: int = 500,
    salt: int = 0,
) -> ray.data.Dataset:
    """(doc_id, n_pairs, avg_nll2_q20): average negative log2-likelihood
    (Q20) of each doc's byte-pair sequence under the bigram model trained
    on the hash split; docs with < 2 bytes score (0, 0)."""
    model_ref = ray.put(train_char_bigram(docs, text_col, permille_train, salt))

    def score(b: pa.Table) -> pa.Table:
        model = ray.get(model_ref)
        codes, n_pairs = _byte_pairs(b[text_col])
        nll = model[codes]
        starts = np.concatenate([[0], np.cumsum(n_pairs)])[:-1]
        totals = np.zeros(len(n_pairs), np.int64)
        nz = n_pairs > 0
        if nz.any():
            totals[nz] = np.add.reduceat(nll, starts[nz])
        avg = np.where(nz, totals // np.maximum(n_pairs, 1), 0)
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "n_pairs": pa.array(n_pairs, pa.int64()),
                "avg_nll2_q20": pa.array(avg, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def char_entropy_scores(
    docs: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """(doc_id, n_bytes, entropy_q20): per-doc byte-unigram Shannon
    entropy in Q20 fixed point — the classic low-entropy / repetitive-
    junk signal (the integer-exact stand-in for the gzip-compression-
    ratio filter used by web curation pipelines; a doc of one repeated
    char scores 0, uniform bytes score log2(alphabet)).

    Exactness contract (same as :func:`perplexity_scores` — no floats):

        H_q20 = L(n) - (sum_v c_v * L(c_v)) // n

    with ``L`` = :func:`log2_q20`, ``n`` = byte count, ``c_v`` = count of
    byte value ``v``.  Both terms are integers, so the DuckDB twin
    recomputes the identical value from character counts alone.

    Scale shape: one vectorized pass over the batch's flat utf-8 buffer
    (``bincount`` on ``doc_index*256 + byte``); row-local, no shuffle,
    no state.  Empty docs score (0, 0).
    """

    def score(b: pa.Table) -> pa.Table:
        texts = b[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        off_dtype = (
            np.int64 if pa.types.is_large_string(texts.type) else np.int32
        )
        bufs = texts.buffers()
        offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
            texts.offset : texts.offset + len(texts) + 1
        ].astype(np.int64)
        data = (
            np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None
            else np.empty(0, np.uint8)
        )
        lens = np.diff(offsets)
        n_docs = len(lens)
        base = offsets[0]
        flat = data[base : base + int(offsets[-1] - base)].astype(np.int64)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        cnt = np.bincount(
            doc_idx * 256 + flat, minlength=n_docs * 256
        ).reshape(n_docs, 256)
        l_cnt = np.where(cnt > 0, log2_q20(np.maximum(cnt, 1)), 0)
        tot = (cnt * l_cnt).sum(axis=1)
        nz = lens > 0
        ent = np.zeros(n_docs, np.int64)
        ent[nz] = log2_q20(lens[nz]) - tot[nz] // lens[nz]
        return pa.table(
            {
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "n_bytes": pa.array(lens, pa.int64()),
                "entropy_q20": pa.array(ent, pa.int64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def perplexity_quantile_filter(
    docs: ray.data.Dataset,
    keep_permille: int = 900,
    text_col: str = "text",
    permille_train: int = 500,
    salt: int = 0,
) -> ray.data.Dataset:
    """(doc_id, avg_nll2_q20) of the docs KEPT by the CCNet-style
    perplexity gate: score every doc with the char-bigram LM, keep the
    lowest-perplexity ``keep_permille``/1000 of the corpus (ties at the
    threshold all kept — deterministic on both engine and twin).

    Threshold contract (exact integers end to end):
    ``T = min{v : count(score <= v) >= ceil(n * keep_permille / 1000)}``,
    keep ``score <= T``.

    Scale shape: scoring is the zero-shuffle charlm pass; the threshold
    needs one ``groupby(value).count()`` whose cardinality is the number
    of DISTINCT scores (corpus-bounded — same documented caveat and
    sketch upgrade path as ``sampling.exact_int_quantiles``); the final
    gate is a row-local filter against the broadcast threshold.
    """
    scores = perplexity_scores(
        docs, text_col, permille_train, salt
    ).materialize()
    n = scores.count()
    if n == 0:
        return scores.map_batches(
            lambda b: pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "avg_nll2_q20": pa.array([], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    need = (n * keep_permille + 999) // 1000
    hist = scores.groupby("avg_nll2_q20").count().to_pandas()
    hist = hist.sort_values("avg_nll2_q20")
    cum = hist["count()"].cumsum()
    t = int(hist["avg_nll2_q20"].to_numpy()[(cum >= need).argmax()])

    def keep(b: pa.Table) -> pa.Table:
        m = pc.less_equal(b["avg_nll2_q20"], pa.scalar(t, pa.int64()))
        kept = b.filter(m)
        return pa.table(
            {
                "doc_id": pc.cast(kept["doc_id"], pa.int64()),
                "avg_nll2_q20": pc.cast(kept["avg_nll2_q20"], pa.int64()),
            }
        )

    return scores.map_batches(keep, batch_format="pyarrow")
