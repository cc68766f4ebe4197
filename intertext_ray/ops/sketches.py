"""Distributed cardinality sketches: HyperLogLog distinct-count.

Why a sketch at 100 TB: exact ``COUNT(DISTINCT key)`` needs an all-to-all
shuffle of every distinct key; an HLL register table is bounded at
``m = 2^p`` rows *per group* regardless of corpus size.  Per-batch
combiners max into a dense m-register array, so the shuffle moves at most
``groups x m`` tiny rows, and register merge is an associative/commutative
max — partition-order- and resume-invariant by construction (the same
property the reference relies on for its bounter word-count sketch,
``/root/reference/intertext/intertext.py:78,1253`` — this is the exact
analogue for cardinality instead of frequency).

Determinism contract (what makes the DuckDB twin hash-exact):
- value hash = the splitmix64 byte-chain of ``ops/simhash.hash_bytes``;
- register = top ``p`` hash bits, rho = leading-zero count of the
  remaining ``64-p`` bits + 1 (bit_length via exact float64 ``frexp``,
  valid because ``64-p <= 52 < 53`` mantissa bits — hence ``p >= 12``);
- the estimator is integer-only: ``S = sum_j 2^(64 - rho_j)`` over all m
  registers (empty register => rho 0 => 2^64), raw estimate
  ``alpha_x1e9 * m^2 * 2^64 // S // 10^9``, and the standard
  linear-counting correction ``floor(m * ln(m / V))`` when the raw
  estimate is <= 2.5m (ln agreement between libm and DuckDB verified
  exhaustively for every V in 1..m in tests).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.ops.simhash import _chain_hash_tokens

_U64 = np.uint64


def alpha_x1e9(p: int) -> int:
    """HLL bias constant for m = 2^p registers, scaled to an integer so the
    engine and the SQL twin share one literal (p >= 7: 0.7213/(1+1.079/m))."""
    m = 1 << p
    return int(round(1e9 * 0.7213 * m / (m + 1.079)))


def hll_registers(
    ds: ray.data.Dataset,
    group_col: str = "source",
    value_col: str = "text",
    p: int = 12,
) -> ray.data.Dataset:
    """(group, reg, rho) register maxes — the mergeable sketch state.

    Per-batch combiner: hash -> (reg, rho) -> ``np.maximum.at`` into a
    dense ``groups_in_batch x m`` array, emit only non-empty registers.
    The downstream groupby therefore exchanges at most ``groups x m``
    rows per input block — bounded, never corpus-proportional.
    """
    if p < 12 or p > 16:
        # p>=12 keeps the rho remainder under 2^52 (exact float64 /
        # in-range HUGEINT twin); p<=16 bounds the estimator product
        # under HUGEINT max in the SQL twin.
        raise ValueError("hll_registers requires 12 <= p <= 16")
    m = 1 << p
    shift = _U64(64 - p)
    rem_mask = _U64((1 << (64 - p)) - 1)

    def regs(batch: pa.Table) -> pa.Table:
        vals = batch.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        h = _chain_hash_tokens(vals)
        reg = (h >> shift).astype(np.int64)
        rem = (h & rem_mask).astype(np.float64)  # exact: < 2^52
        bl = np.frexp(rem)[1]  # bit_length; frexp(0) -> 0
        rho = ((64 - p) - bl + 1).astype(np.uint8)
        enc = batch.column(group_col)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        enc = enc.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_codes = len(enc.dictionary)
        dense = np.zeros(n_codes * m, dtype=np.uint8)
        np.maximum.at(dense, codes * m + reg, rho)
        nz = np.nonzero(dense)[0]
        return pa.table(
            {
                group_col: enc.dictionary.take(pa.array(nz // m)),
                "reg": pa.array(nz % m, pa.int64()),
                "rho": pa.array(dense[nz].astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Max

    return (
        ds.select_columns([group_col, value_col])
        .map_batches(regs, batch_format="pyarrow")
        .groupby([group_col, "reg"])
        .aggregate(Max("rho", alias_name="rho"))
    )


def hll_estimate(used: int, s_present: int, p: int) -> tuple[int, str]:
    """Integer-exact HLL estimate from per-group register aggregates:
    ``used`` = non-empty registers, ``s_present`` = sum of 2^(64-rho) over
    them.  Returns (estimate, method)."""
    m = 1 << p
    s_total = s_present + (m - used) * (1 << 64)
    raw = (alpha_x1e9(p) * m * m * (1 << 64)) // s_total // 10**9
    if 2 * raw <= 5 * m and used < m:
        return math.floor(m * math.log(m / (m - used))), "linear"
    return raw, "raw"


def cms_salts(depth: int) -> list[int]:
    """Per-row hash salts for the count-min sketch — pinned splitmix64
    values shared with the SQL twin (embedded there as literals)."""
    from intertext_ray.functions.hashing import splitmix64

    return [int(splitmix64(_U64(1_000_003 + i))) for i in range(depth)]


def cms_sketch(
    docs: ray.data.Dataset,
    text_col: str = "text",
    width: int = 8192,
    depth: int = 4,
) -> ray.data.Dataset:
    """Count-min sketch of word frequencies: (cell, cnt) with
    ``cell = row * width + splitmix64(token_hash ^ salt_row) % width``.

    This is the bounded-state analogue of the reference's bounter
    word-count sketch (``/root/reference/intertext/intertext.py:78,1253``):
    the exchanged state is at most ``depth x width`` cells per input block
    (the per-batch combiner sums into a dense array first), merge is
    associative +, and the estimate ``min`` over rows never undercounts.
    """
    from intertext_ray.ops.text_stats import _flat_tokens

    salts = [_U64(s) for s in cms_salts(depth)]
    wmod = _U64(width)

    def partial(batch: pa.Table) -> pa.Table:
        from intertext_ray.functions.hashing import splitmix64

        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        empty = pa.table(
            {
                "cell": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if len(texts) == 0:
            return empty
        flat, _, _ = _flat_tokens(texts)
        if len(flat) == 0:
            return empty
        # one Arrow hash-aggregate first: positions computed per DISTINCT
        # token, counts added once per token, not per occurrence
        agg = pa.table({"w": flat}).group_by("w").aggregate([("w", "count")])
        h = _chain_hash_tokens(agg["w"].combine_chunks())
        c = agg["w_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        dense = np.zeros(depth * width, dtype=np.int64)
        for i, salt in enumerate(salts):
            pos = (splitmix64(h ^ salt) % wmod).astype(np.int64)
            np.add.at(dense, i * width + pos, c)
        nz = np.nonzero(dense)[0]
        return pa.table(
            {
                "cell": pa.array(nz, pa.int64()),
                "cnt": pa.array(dense[nz], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        docs.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def cms_estimate_words(
    docs: ray.data.Dataset,
    text_col: str = "text",
    width: int = 8192,
    depth: int = 4,
) -> ray.data.Dataset:
    """(w, est_count) for every distinct corpus word, estimated FROM THE
    SKETCH (min over its depth cells) — est >= true always; equality unless
    the word collided in all rows.

    Two passes over the corpus (sketch build + probe-key discovery); in a
    real deployment the probe keys are an input, and the broadcast is the
    fixed-size ``depth x width`` cell array via ``ray.put`` — never the
    corpus-proportional vocabulary."""
    import ray

    from intertext_ray.functions.hashing import splitmix64
    from intertext_ray.ops.text_stats import _flat_tokens

    cells = cms_sketch(docs, text_col, width, depth).take_all()
    dense = np.zeros(depth * width, dtype=np.int64)
    for r in cells:
        dense[int(r["cell"])] = int(r["cnt"])
    dense_ref = ray.put(dense)
    salts = [_U64(s) for s in cms_salts(depth)]
    wmod = _U64(width)

    def vocab_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if len(texts) == 0:
            return pa.table({"w": pa.array([], pa.string())})
        flat, _, _ = _flat_tokens(texts)
        return pa.table({"w": pc.unique(flat)})

    def probe(batch: pa.Table) -> pa.Table:
        sk = ray.get(dense_ref)
        w = batch["w"]
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        h = _chain_hash_tokens(w)
        est = np.full(len(w), np.iinfo(np.int64).max, dtype=np.int64)
        for i, salt in enumerate(salts):
            pos = (splitmix64(h ^ salt) % wmod).astype(np.int64)
            est = np.minimum(est, sk[i * width + pos])
        return pa.table({"w": w, "est_count": pa.array(est, pa.int64())})

    vocab = (
        docs.select_columns([text_col])
        .map_batches(vocab_partial, batch_format="pyarrow")
        .groupby("w")
        .count()
        .select_columns(["w"])
    )
    return vocab.map_batches(probe, batch_format="pyarrow")


def log2_quantile_sketch(
    values: ray.data.Dataset,
    value_col: str,
    qs: list[float],
) -> pa.Table:
    """Mergeable quantile sketch over a non-negative integer column:
    power-of-two buckets (``bucket = bit_length(v)``), so the state is at
    most 54 counters regardless of corpus size or distinct-value count —
    the bounded-state upgrade of ``ops.sampling.exact_int_quantiles``
    (whose histogram grows with DISTINCT values).  (q, est_value) with
    ``est_value = 2^bucket - 1``, the bucket's inclusive upper bound: a
    2x-relative-accuracy guarantee (``exact <= est < 2*exact + 1``), the
    gamma=2 instance of the DDSketch idea.

    Same rank convention as the exact op (smallest bucket whose cumulative
    count reaches ``max(1, ceil(q*n))``); integer-only, so the DuckDB twin
    (bit-smear + bit_count bucketing) is hash-exact.  Values must be in
    [0, 2^53) — bit_length via exact float64 frexp, as in the HLL rho."""

    def buckets(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.frexp(v.astype(np.float64))[1]  # bit_length; frexp(0) -> 0
        cnt = np.bincount(b, minlength=1).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "cnt": pa.array(cnt[nz], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    rows = (
        values.select_columns([value_col])
        .map_batches(buckets, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .take_all()
    )
    rows.sort(key=lambda r: r["bucket"])
    b = np.array([r["bucket"] for r in rows], dtype=np.int64)
    cum = np.cumsum([r["cnt"] for r in rows]).astype(np.int64)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        rank = max(1, int(np.ceil(q * n)))
        idx = int(np.searchsorted(cum, rank))
        bb = int(b[min(idx, len(b) - 1)]) if n else 0
        out_q.append(float(q))
        out_v.append((1 << bb) - 1)
    return pa.table(
        {
            "q": pa.array(out_q, pa.float64()),
            "est_value": pa.array(out_v, pa.int64()),
        }
    )


def hll_distinct(
    ds: ray.data.Dataset,
    group_col: str = "source",
    value_col: str = "text",
    p: int = 12,
) -> pa.Table:
    """Approximate distinct ``value_col`` count per ``group_col`` value.

    The register table brought to the driver is bounded by
    ``n_groups x 2^p`` rows (the sketch's whole point); n_groups must be
    driver-small, the VALUE cardinality is unbounded.  Standard error
    ~= 1.04/sqrt(2^p) (~1.6% at p=12) in the raw regime; the
    linear-counting branch covers small cardinalities exactly as in
    Flajolet et al. 2007.
    """
    regs = hll_registers(ds, group_col, value_col, p).take_all()
    per_group: dict[str, list[int]] = {}  # group -> [used, s_present]
    for r in regs:
        st = per_group.setdefault(r[group_col], [0, 0])
        st[0] += 1
        st[1] += 1 << (64 - int(r["rho"]))
    groups = sorted(per_group)
    ests, methods = [], []
    for g in groups:
        used, s_present = per_group[g]
        est, method = hll_estimate(used, s_present, p)
        ests.append(est)
        methods.append(method)
    return pa.table(
        {
            group_col: pa.array(groups, pa.string()),
            "est_distinct": pa.array(ests, pa.int64()),
            "used_regs": pa.array(
                [per_group[g][0] for g in groups], pa.int64()
            ),
            "method": pa.array(methods, pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# Bloom filter — approximate set membership with a FIXED-size bitmap
# ---------------------------------------------------------------------------


def bloom_salts(k: int) -> list[int]:
    """Per-probe-index hash salts — pinned splitmix64 values shared with the
    SQL twin (embedded there as literals)."""
    from intertext_ray.functions.hashing import splitmix64

    return [int(splitmix64(_U64(0xB100F + i))) for i in range(k)]


def _bloom_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions: pos_i = splitmix64(h ^ salt_i) % m_bits."""
    from intertext_ray.functions.hashing import splitmix64

    salts = bloom_salts(k)
    return np.stack(
        [
            (splitmix64(h ^ _U64(s)) % _U64(m_bits)).astype(np.int64)
            for s in salts
        ],
        axis=1,
    )


def bloom_build(
    ds: ray.data.Dataset,
    value_col: str = "text",
    m_bits: int = 1 << 16,
    k: int = 4,
) -> np.ndarray:
    """Build the bitmap (``m_bits/64`` uint64 words) over ``value_col``.

    Why at 100 TB: exact membership needs the full distinct-key set
    co-located somewhere; the bloom bitmap is FIXED-size (m_bits/8 bytes,
    e.g. 128 KiB at 2^20 bits) no matter how many members stream in —
    per-batch combiners OR into a dense local bitmap and emit only the
    non-zero words, the word-indexed groupby exchanges at most
    ``m_bits/64 x blocks`` tiny rows, and bitwise-OR is associative and
    commutative so the merge is partition-order- and resume-invariant.
    Same bounded-state contract as the HLL/CMS sketches above.
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    n_words = m_bits // 64

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        h = _chain_hash_tokens(vals)
        pos = _bloom_positions(h, m_bits, k).ravel()
        words = np.zeros(n_words, dtype=np.uint64)
        np.bitwise_or.at(words, pos // 64, _U64(1) << (pos % 64).astype(np.uint64))
        nz = np.nonzero(words)[0]
        return pa.table(
            {
                "word_idx": pa.array(nz, pa.int64()),
                "bits": pa.array(words[nz], pa.uint64()),
            }
        )

    # distributed OR-reduce: per-block partials (<= n_words rows each) fold
    # through a word-indexed groupby with an associative bitwise-OR
    # aggregate, so the driver receives AT MOST n_words rows no matter how
    # many blocks the corpus has
    from ray.data.aggregate import AggregateFn

    # accumulators stay two's-complement int64: a Python-int accumulator
    # >= 2^63 fails Arrow int64 conversion and silently degrades the
    # aggregate's blocks to pickled python objects — re-signing after every
    # OR keeps the value Arrow-native at identical bit pattern
    def _to_i64(u: int) -> int:
        u &= 0xFFFFFFFFFFFFFFFF
        return u - (1 << 64) if u >= (1 << 63) else u

    or_agg = AggregateFn(
        init=lambda k: 0,
        merge=lambda a, b: _to_i64(a | b),
        accumulate_block=lambda a, blk: _to_i64(
            a
            | int(np.bitwise_or.reduce(np.asarray(blk["bits"], dtype=np.uint64)))
        ),
        name="bits",
    )
    rows = (
        ds.select_columns([value_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("word_idx")
        .aggregate(or_agg)
        .take_all()
    )
    words = np.zeros(n_words, dtype=np.uint64)
    for r in rows:
        words[int(r["word_idx"])] = _U64(r["bits"] & 0xFFFFFFFFFFFFFFFF)
    return words


def bloom_probe(
    ds: ray.data.Dataset,
    words: np.ndarray,
    id_col: str = "doc_id",
    value_col: str = "text",
    m_bits: int = 1 << 16,
    k: int = 4,
) -> ray.data.Dataset:
    """(id, maybe_member) per probe row: member iff ALL k bits are set.

    The bitmap is broadcast ONCE (``ray.put``); each probe batch tests its
    positions vectorized against the shared words array — zero shuffles on
    the probe side, so the corpus streams.  No false negatives by
    construction; false-positive odds ~ (set_bits/m)^k.
    """
    import ray

    ref = ray.put(words)

    class Prober:
        def __init__(self):
            self.words = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vals = batch.column(value_col)
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            h = _chain_hash_tokens(vals)
            pos = _bloom_positions(h, m_bits, k)
            bit = (self.words[pos // 64] >> (pos % 64).astype(np.uint64)) & _U64(1)
            member = bit.all(axis=1)
            return pa.table(
                {
                    id_col: batch[id_col],
                    "maybe_member": pa.array(member),
                }
            )

    return ds.select_columns([id_col, value_col]).map_batches(
        Prober, batch_format="pyarrow", concurrency=(1, 8)
    )


def bloom_membership(
    corpus: ray.data.Dataset,
    members: ray.data.Dataset,
    id_col: str = "doc_id",
    value_col: str = "text",
    m_bits: int = 1 << 13,
    k: int = 3,
) -> ray.data.Dataset:
    """Probe every corpus row against a bloom built from ``members``."""
    words = bloom_build(members, value_col, m_bits, k)
    return bloom_probe(corpus, words, id_col, value_col, m_bits, k)
