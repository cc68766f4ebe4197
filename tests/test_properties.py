"""Property tests (SURVEY.md §5.3) — hypothesis over the pure kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from intertext_ray.config import IntertextConfig
from intertext_ray.functions.hashing import band_keys, minhash_texts, perm_seeds
from intertext_ray.functions.text import get_sequences, tokenize, window_texts
from intertext_ray.stages.candidates import pairs_within_runs

CFG = IntertextConfig()
SEEDS = perm_seeds(CFG.n_half, CFG.hash_seed)

words_st = st.lists(
    st.text(alphabet="abcdefghij", min_size=1, max_size=8), min_size=0, max_size=60
)


@settings(max_examples=50, deadline=None)
@given(words_st)
def test_window_formula_and_content(words):
    ws = window_texts(words, CFG.window_length, CFG.slide_length)
    assert len(ws) == CFG.windows_per_doc(len(words))
    for k, w in enumerate(ws):
        assert w == " ".join(words[k * 4 : k * 4 + 14])


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet="abc \t\n", max_size=200))
def test_tokenize_matches_str_split(text):
    assert tokenize(text) == text.split()


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(alphabet="abcdefgh ", min_size=4, max_size=120), min_size=1, max_size=8))
def test_minhash_batch_equals_singletons(texts):
    batched = minhash_texts(texts, SEEDS, CFG.chargram_length, CFG.mirror)
    for i, t in enumerate(texts):
        single = minhash_texts([t], SEEDS, CFG.chargram_length, CFG.mirror)[0]
        assert (batched[i] == single).all()


@settings(max_examples=25, deadline=None)
@given(st.text(alphabet="abcdefgh ", min_size=4, max_size=120))
def test_equal_sigs_equal_bands(text):
    sig = minhash_texts([text, text], SEEDS, CFG.chargram_length, CFG.mirror)
    bk = band_keys(sig, CFG.hashband_length, CFG.hashband_step, CFG.hash_seed)
    assert (bk[0] == bk[1]).all()
    assert bk.shape[1] == CFG.n_bands


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=8), min_size=0, max_size=10))
def test_pairs_within_runs_matches_bruteforce(counts):
    counts = np.asarray(counts, dtype=np.int64)
    ii, jj = pairs_within_runs(counts)
    got = set(zip(ii.tolist(), jj.tolist()))
    expect = set()
    start = 0
    for c in counts:
        for a in range(start, start + int(c)):
            for b in range(a + 1, start + int(c)):
                expect.add((a, b))
        start += int(c)
    assert got == expect


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=-5, max_value=30), max_size=30))
def test_get_sequences_partitions_input(ids):
    runs = get_sequences(ids)
    flat = [x for r in runs for x in r]
    assert flat == sorted(set(ids))
    for r in runs:
        assert r == list(range(r[0], r[-1] + 1))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**15), max_value=2**15 - 1),
        min_size=0,
        max_size=4000,
    ),
    st.sampled_from([8000, 16000]),
)
def test_segment_spans_well_formed(samples, sr):
    from intertext_ray.ops.audio_segment import segment_spans

    pcm = np.asarray(samples, dtype=np.int16)
    spans = segment_spans(pcm, sr, min_gap_ms=100, min_seg_ms=50)
    prev_end = -1
    for s, e in spans:
        assert 0 <= s < e <= len(pcm)
        assert s > prev_end  # sorted, non-overlapping
        assert (e - s) * 1000 >= 50 * sr  # min length respected
        prev_end = e


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        min_size=1,
        max_size=200,
    )
)
def test_hll_register_merge_is_set_union(values):
    """Registers of a concatenation == elementwise max of the halves'
    registers (the associativity the distributed combiner relies on)."""
    from tests.test_sketches import _ref_registers

    half = len(values) // 2
    a, b = _ref_registers(values[:half]), _ref_registers(values[half:])
    merged = dict(a)
    for r, rho in b.items():
        merged[r] = max(merged.get(r, 0), rho)
    assert merged == _ref_registers(values)


@settings(max_examples=25, deadline=None)
@given(
    st.text(alphabet="abγ é", min_size=1, max_size=40),
    st.text(alphabet="abγ é", min_size=1, max_size=40),
)
def test_difflib_sql_kernel_property(a, b):
    """The recursive Ratcliff/Obershelp SQL kernel equals Python difflib's
    int(ratio*100) on arbitrary strings, including non-ASCII code points
    (substr/length are character-based in DuckDB, matching Python)."""
    from difflib import SequenceMatcher

    import duckdb
    import pandas as pd

    from __ray_entry__ import DIFFLIB_SQL_CTES

    con = duckdb.connect()
    con.register("src", pd.DataFrame([(0, a, b)], columns=["pair_id", "a", "b"]))
    sql = f"""
        WITH RECURSIVE pairs AS (SELECT * FROM src), {DIFFLIB_SQL_CTES}
        SELECT CAST(trunc((2.0 * COALESCE(m.m, 0)
                    / (length(p.a) + length(p.b))) * 100) AS INT) AS sim
        FROM pairs p LEFT JOIN msum m USING (pair_id)
    """
    got = con.execute(sql).fetchone()[0]
    want = int(SequenceMatcher(None, a, b, autojunk=False).ratio() * 100)
    assert got == want, (a, b, got, want)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=200),
    st.sampled_from([8000, 16000, 22050, 44100]),
    st.sampled_from([8000, 16000, 24000]),
)
def test_resample_linear_properties(pcm, sr_in, sr_out):
    """Integer linear SRC: scalar parity, exact endpoint preservation,
    output length formula, identity at equal rates."""
    from intertext_ray.ops.audio_resample import resample_pcm

    x = np.array(pcm, np.int16)
    y = resample_pcm(x, sr_in, sr_out)
    assert len(y) == (len(x) - 1) * sr_out // sr_in + 1
    assert y[0] == x[0]  # phase 0 is exact
    if sr_in == sr_out:
        assert y.tolist() == x.tolist()
    # interpolation never exceeds the local input range
    assert y.max() <= int(x.max()) and y.min() >= int(x.min())


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=200))
def test_normalize_peak_properties(pcm):
    """Peak gain: output peak == target exactly (nonsilent input), silent
    passthrough, sign preservation."""
    from intertext_ray.ops.audio_gain import normalize_peak_pcm

    x = np.array(pcm, np.int16)
    y = normalize_peak_pcm(x, 30000).astype(np.int64)
    if int(np.max(np.abs(x.astype(np.int64)))) == 0:
        assert y.tolist() == x.tolist()
    else:
        assert int(np.max(np.abs(y))) == 30000
    assert (np.sign(y) == np.sign(x.astype(np.int64))).all() or (
        # floor can land an attenuated tiny positive at 0
        (np.sign(y) != np.sign(x.astype(np.int64))).sum()
        == ((y == 0) & (x > 0)).sum()
    )


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=12
    ),
    st.integers(1, 5),
)
def test_break_into_lines_round_trip(ray_session, texts, npl):
    """Joining the derived lines back with spaces reproduces the
    whitespace-canonicalized doc for every tokens_per_line."""
    import pyarrow as pa
    import ray.data as rd

    from intertext_ray.ops.line_dedup import break_into_lines

    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    got = (
        break_into_lines(rd.from_arrow(tbl), tokens_per_line=npl)
        .to_pandas()
        .sort_values("doc_id")["text"]
        .tolist()
    )
    for t, g in zip(texts, got):
        assert g.replace("\n", " ") == " ".join(t.split())
        for ln in g.split("\n"):
            assert ln == "" or len(ln.split()) <= npl


@given(
    na=st.integers(40, 120),
    nb=st.integers(40, 120),
    plant=st.integers(20, 39),
    pa_=st.integers(0, 60),
    pb_=st.integers(0, 60),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_matching_spans_properties(na, nb, plant, pa_, pb_, seed):
    """matching_spans invariants on arbitrary fingerprint streams with a
    planted identical run: (1) every reported span satisfies the span-BER
    bound and lies inside both streams; (2) a planted run of length L is
    recovered at the planted alignment with length within one window of
    L; (3) the reported BER equals the popcount recomputed from the raw
    arrays."""
    from intertext_ray.functions.audio_fp import (
        _POPCOUNT16,
        matching_spans,
    )

    rng = np.random.default_rng(seed)
    fa = rng.integers(0, 1 << 16, na).astype(np.uint32)
    fb = rng.integers(0, 1 << 16, nb).astype(np.uint32)
    pa_ = min(pa_, na - plant)
    pb_ = min(pb_, nb - plant)
    fa[pa_ : pa_ + plant] = fb[pb_ : pb_ + plant]
    off = pa_ - pb_
    win, max_ber, min_len = 8, 0.1, 12
    spans = matching_spans(fa, fb, off, win=win, max_ber=max_ber, min_len=min_len)
    covered = False
    for a0, b0, length, ber in spans:
        assert b0 == a0 - off
        assert 0 <= a0 and a0 + length <= na
        assert 0 <= b0 and b0 + length <= nb
        assert length >= min_len
        x = np.bitwise_xor(fa[a0 : a0 + length], fb[b0 : b0 + length])
        errs = int(_POPCOUNT16[x].sum(dtype=np.int64))
        assert abs(ber - errs / (16.0 * length)) < 1e-12
        # spans are windowed-clean: every full window under the bound
        if a0 <= pa_ and a0 + length >= pa_ + plant - win:
            covered = True
    # the planted run must be recovered (allowing boundary slop of one
    # window on each side)
    assert any(
        a0 <= pa_ + win and a0 + length >= pa_ + plant - win
        for a0, _, length, _ in spans
    ), (spans, pa_, plant)


@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=0,
        max_size=400,
    ),
    st.integers(min_value=1, max_value=30000),
)
def test_rms_normalize_scalar_parity_and_signs(samples, target):
    """normalize_rms_pcm == the pure-python int reference for ANY int16
    input and target; sign is preserved (or zeroed) sample-wise."""
    import math

    from intertext_ray.ops.audio_loudnorm import normalize_rms_pcm

    pcm = np.array(samples, np.int16)
    got = normalize_rms_pcm(pcm, target)
    if len(pcm) == 0:
        assert got.tolist() == []
        return
    ms = sum(int(x) * int(x) for x in samples) // len(samples)
    r = math.isqrt(ms)
    if r == 0:
        assert got.tolist() == [int(x) for x in samples]
        return
    want = [
        min(32767, max(-32768, (int(x) * target + 32768 * target * r)
                       // r - 32768 * target))
        for x in samples
    ]
    assert got.tolist() == want
    for x, y in zip(samples, got.tolist()):
        assert x * y >= 0  # no sign flips (floor may zero small values)


@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=400,
    )
)
def test_dc_removal_residual_and_parity(samples):
    """remove_dc_pcm == scalar floor-mean reference; when nothing clamps
    the residual sum lands in [0, n) — the floor-mean invariant."""
    from intertext_ray.ops.audio_dc import dc_mean, remove_dc_pcm

    pcm = np.array(samples, np.int16)
    n = len(samples)
    m = (sum(int(x) for x in samples) + 32768 * n) // n - 32768
    want = [min(32767, max(-32768, int(x) - m)) for x in samples]
    got = remove_dc_pcm(pcm)
    assert got.tolist() == want
    assert dc_mean(pcm) == m
    if all(-32768 < int(x) - m < 32767 for x in samples):
        assert 0 <= sum(got.astype(np.int64)) < n


docs_st = st.lists(
    st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=4),
        min_size=0,
        max_size=25,
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=40, deadline=None)
@given(docs_st, st.integers(min_value=2, max_value=6))
def test_winnow_batch_split_invariance(doc_tokens, window):
    """Winnowing selections are row-local: splitting the batch at any
    point yields the same (doc_id, pos, fp) set as one batch."""
    import pyarrow as pa

    from intertext_ray.ops.winnow import winnow_fp_batch

    texts = [" ".join(t) for t in doc_tokens]
    full = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": texts,
        }
    )
    whole = winnow_fp_batch(full, k=3, window=window)
    want = set(
        zip(
            whole["doc_id"].to_pylist(),
            whole["pos"].to_pylist(),
            whole["fp_hex"].to_pylist(),
        )
    )
    cut = len(texts) // 2
    got = set()
    for lo, hi in ((0, cut), (cut, len(texts))):
        part = pa.table(
            {
                "doc_id": pa.array(range(lo, hi), pa.int64()),
                "text": texts[lo:hi],
            }
        )
        t = winnow_fp_batch(part, k=3, window=window)
        got |= set(
            zip(
                t["doc_id"].to_pylist(),
                t["pos"].to_pylist(),
                t["fp_hex"].to_pylist(),
            )
        )
    assert got == want


@settings(max_examples=40, deadline=None)
@given(docs_st, st.integers(min_value=2, max_value=32))
def test_cdc_chunks_partition_doc_and_are_layout_invariant(
    doc_tokens, divisor
):
    """CDC chunks of a doc partition its token stream (sum of n_tokens
    == doc token count, chunk_idx dense from 0), and the chunk table is
    independent of which other docs share the batch."""
    import pyarrow as pa

    from intertext_ray.ops.cdc import cdc_chunk_batch

    texts = [" ".join(t) for t in doc_tokens]
    full = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": texts,
        }
    )
    whole = cdc_chunk_batch(full, k=3, divisor=divisor)
    by_doc = {}
    for d, ci, nt, h in zip(
        whole["doc_id"].to_pylist(),
        whole["chunk_idx"].to_pylist(),
        whole["n_tokens"].to_pylist(),
        whole["chunk_hash_hex"].to_pylist(),
    ):
        by_doc.setdefault(d, []).append((ci, nt, h))
    for d, toks in enumerate(doc_tokens):
        rows = sorted(by_doc.get(d, []))
        assert sum(nt for _, nt, _ in rows) == len(toks)
        assert [ci for ci, _, _ in rows] == list(range(len(rows)))
        # singleton batch agrees
        solo = cdc_chunk_batch(
            pa.table(
                {
                    "doc_id": pa.array([d], pa.int64()),
                    "text": [texts[d]],
                }
            ),
            k=3,
            divisor=divisor,
        )
        srows = sorted(
            zip(
                solo["chunk_idx"].to_pylist(),
                solo["n_tokens"].to_pylist(),
                solo["chunk_hash_hex"].to_pylist(),
            )
        )
        assert srows == rows


# ---- fourth-continuation kernels: fold, gain floor, rail runs ----

@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="aBc01 .,;!\t\n-_/", max_size=160))
def test_normalize_text_matches_re_reference(text):
    import re

    import pyarrow as pa

    from intertext_ray.ops.norm_dedup import normalize_text

    got = normalize_text(pa.array([text], pa.string())).to_pylist()[0]
    want = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    assert got == want
    # idempotence: folding a folded string is a no-op
    assert (
        normalize_text(pa.array([got], pa.string())).to_pylist()[0] == got
    )


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), max_size=120),
    st.integers(1, 12),
    st.integers(1, 7),
)
def test_amplify_pcm_is_exact_floor(samples, num, den):
    import math

    from intertext_ray.ops.audio_clipping import amplify_pcm

    pcm = np.asarray(samples, np.int16)
    got = amplify_pcm(pcm, num, den).tolist()
    want = [
        min(32767, max(-32768, math.floor(int(x) * num / den))) for x in pcm
    ]
    assert got == want


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from([32767, -32768, 0, 5, -7]), max_size=80))
def test_rail_stats_matches_brute(samples):
    from intertext_ray.ops.audio_clipping import rail_stats

    pcm = np.asarray(samples, np.int16)
    n, mr = rail_stats(pcm)
    mask = [(x >= 32767 or x <= -32768) for x in samples]
    assert n == sum(mask)
    best = cur = 0
    for m in mask:
        cur = cur + 1 if m else 0
        best = max(best, cur)
    assert mr == best


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(-8000, 8000), min_size=1, max_size=100),
    st.integers(2, 4),
)
def test_gain_invariance_of_normalized_pcm(samples, g):
    """The audio-fold contract: a never-clipping integer re-gain does not
    change the peak-normalized signal."""
    from intertext_ray.ops.audio_clipping import amplify_pcm
    from intertext_ray.ops.audio_gain import normalize_peak_pcm

    pcm = np.asarray(samples, np.int16)
    regained = amplify_pcm(pcm, g, 1)
    assert (
        normalize_peak_pcm(pcm, 30000).tolist()
        == normalize_peak_pcm(regained, 30000).tolist()
    )
