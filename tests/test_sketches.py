"""HyperLogLog distinct-count sketch: register parity vs a scalar
reference, partition invariance, estimator accuracy, and the ln-agreement
pin that makes the DuckDB twin's linear-counting branch hash-exact."""

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

P = 12
M = 1 << P


def _ref_registers(values, p=P):
    """Scalar-reference HLL registers (independent of the engine path)."""
    from intertext_ray.ops.simhash import hash_bytes

    regs = {}
    for v in values:
        h = hash_bytes(v)
        reg = h >> (64 - p)
        rem = h & ((1 << (64 - p)) - 1)
        rho = (64 - p) - rem.bit_length() + 1
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def _tbl(groups, texts):
    return pa.table(
        {
            "source": pa.array(groups, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )


def test_hll_registers_match_scalar_reference(ray_session):
    from intertext_ray.ops.sketches import hll_registers

    texts = [f"value {i} pad" for i in range(300)] + ["", " ", "dup", "dup"]
    groups = ["a" if i % 3 else "b" for i in range(len(texts))]
    ds = rd.from_arrow(_tbl(groups, texts))
    got = {
        (r["source"], r["reg"]): r["rho"]
        for r in hll_registers(ds, "source", "text", P).take_all()
    }
    want = {}
    for g in ("a", "b"):
        vals = [t for t, gg in zip(texts, groups) if gg == g]
        for reg, rho in _ref_registers(vals).items():
            want[(g, reg)] = rho
    assert got == want


def test_hll_partition_invariance(ray_session):
    from intertext_ray.ops.sketches import hll_distinct

    texts = [f"doc {i} text body" for i in range(1000)]
    groups = ["s%d" % (i % 4) for i in range(len(texts))]
    tbl = _tbl(groups, texts)
    one = hll_distinct(rd.from_arrow(tbl), "source", "text", P)
    many = hll_distinct(
        rd.from_arrow(tbl).repartition(17), "source", "text", P
    )
    assert one.equals(many)


def test_hll_estimate_accuracy_raw_regime(ray_session):
    from intertext_ray.ops.sketches import hll_distinct

    n = 60_000  # >> 2.5 * M -> raw-estimator regime
    texts = [f"unique value number {i}" for i in range(n)]
    out = hll_distinct(
        rd.from_arrow(_tbl(["all"] * n, texts)), "source", "text", P
    ).to_pylist()[0]
    assert out["method"] == "raw"
    # std error ~1.04/sqrt(M) ~= 1.6%; allow 3 sigma
    assert abs(out["est_distinct"] - n) / n < 0.05


def test_hll_linear_counting_small_cardinality(ray_session):
    from intertext_ray.ops.sketches import hll_distinct

    n = 500
    texts = [f"small {i}" for i in range(n)] * 3  # duplicates collapse
    out = hll_distinct(
        rd.from_arrow(_tbl(["g"] * len(texts), texts)), "source", "text", P
    ).to_pylist()[0]
    assert out["method"] == "linear"
    # linear counting is near-exact at n << M
    assert abs(out["est_distinct"] - n) / n < 0.05


def test_hll_ln_agreement_duckdb_exhaustive():
    """The ONE float op shared with the SQL twin: floor(m*ln(m/V)) must
    agree between libm (engine) and DuckDB for every possible V."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT v, CAST(floor({M} * ln(CAST({M} AS DOUBLE) / CAST(v AS DOUBLE))) AS BIGINT)"
        f" FROM generate_series(1, {M - 1}) t(v)"
    ).fetchall()
    for v, got in rows:
        assert got == math.floor(M * math.log(M / v))


def test_cms_never_undercounts_and_is_exact_without_collisions(ray_session):
    from collections import Counter

    from intertext_ray.ops.sketches import cms_estimate_words

    texts = [f"alpha beta gamma w{i % 40}" for i in range(400)]
    truth = Counter(w for t in texts for w in t.split())
    docs = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    wide = {
        r["w"]: r["est_count"]
        for r in cms_estimate_words(docs, width=8192, depth=4).take_all()
    }
    assert set(wide) == set(truth)
    # 43 distinct words into 4 rows of 8192 cells: no collisions -> exact
    assert wide == dict(truth)
    # force collisions: estimates may only overcount, never undercount
    tight = {
        r["w"]: r["est_count"]
        for r in cms_estimate_words(docs, width=16, depth=2).take_all()
    }
    assert all(tight[w] >= c for w, c in truth.items())
    assert sum(tight.values()) > sum(truth.values())  # collisions occurred


def test_cms_partition_invariance(ray_session):
    from intertext_ray.ops.sketches import cms_estimate_words

    texts = [f"tok{i % 97} tok{i % 13} filler" for i in range(600)]
    tbl = pa.table({"text": pa.array(texts, pa.string())})
    one = {
        r["w"]: r["est_count"]
        for r in cms_estimate_words(
            rd.from_arrow(tbl), width=64, depth=3
        ).take_all()
    }
    many = {
        r["w"]: r["est_count"]
        for r in cms_estimate_words(
            rd.from_arrow(tbl).repartition(23), width=64, depth=3
        ).take_all()
    }
    assert one == many


def test_hll_estimator_integer_math_matches_float_formula():
    """The integer-scaled raw estimator tracks the textbook float formula
    to within rounding (sanity check on the scaling algebra)."""
    from intertext_ray.ops.sketches import alpha_x1e9, hll_estimate

    rng = np.random.default_rng(7)
    rhos = rng.integers(1, 20, size=M)  # fully-populated register file
    used = M
    s_present = int(sum(1 << (64 - int(r)) for r in rhos))
    est, method = hll_estimate(used, s_present, P)
    assert method == "raw"
    alpha = alpha_x1e9(P) / 1e9
    z = sum(2.0 ** -float(r) for r in rhos)
    want = alpha * M * M / z
    assert abs(est - want) / want < 1e-4  # floor truncation + alpha rounding


def test_log2_quantile_sketch_bounds_and_invariance(ray_session):
    from intertext_ray.ops.sketches import log2_quantile_sketch

    rng = np.random.default_rng(11)
    vals = np.concatenate(
        [rng.integers(0, 5000, 3000), np.zeros(50, np.int64)]
    ).astype(np.int64)
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    tbl = pa.table({"v": pa.array(vals, pa.int64())})
    got = log2_quantile_sketch(rd.from_arrow(tbl), "v", qs).to_pylist()
    svals = np.sort(vals)
    n = len(svals)
    for row in got:
        rank = max(1, int(np.ceil(row["q"] * n)))
        exact = int(svals[rank - 1])
        est = row["est_value"]
        # est is the inclusive upper bound of exact's power-of-two bucket
        assert est == (1 << exact.bit_length()) - 1
        assert exact <= est <= 2 * exact + 1  # 2x relative guarantee
    # partition invariance
    again = log2_quantile_sketch(
        rd.from_arrow(tbl).repartition(13), "v", qs
    ).to_pylist()
    assert again == got


def test_bloom_membership_exact_vs_scalar_reference(ray_session):
    """The distributed bloom build/probe matches a scalar recomputation of
    the bitmap bit-for-bit: no false negatives ever, and the false-positive
    SET (not just its size) is identical.  Also partition-invariant."""
    from intertext_ray.functions.hashing import splitmix64
    from intertext_ray.ops.sketches import (
        _chain_hash_tokens,
        bloom_membership,
        bloom_salts,
    )

    m_bits, k = 256, 3  # tiny bitmap so false positives actually occur
    texts = [f"doc text number {i} with words" for i in range(400)]
    ids = np.arange(400, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})
    corpus = rd.from_arrow(tbl).repartition(7)
    members = rd.from_arrow(tbl.filter(pa.array(ids % 10 == 0)))

    out = (
        bloom_membership(corpus, members, m_bits=m_bits, k=k)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # scalar reference bitmap
    salts = bloom_salts(k)
    h = _chain_hash_tokens(pa.array(texts))
    setbits = set()
    for i in np.nonzero(ids % 10 == 0)[0]:
        for s in salts:
            setbits.add(int(splitmix64(h[i] ^ np.uint64(s)) % np.uint64(m_bits)))
    expect = [
        all(
            int(splitmix64(h[j] ^ np.uint64(s)) % np.uint64(m_bits)) in setbits
            for s in salts
        )
        for j in range(400)
    ]
    assert out["maybe_member"].tolist() == expect
    # no false negatives
    assert out[out.doc_id % 10 == 0]["maybe_member"].all()
    # the tiny bitmap must have produced real false positives (else the
    # parity assertion above is vacuous)
    assert sum(expect) > 40
    # partition invariance
    again = (
        bloom_membership(
            rd.from_arrow(tbl).repartition(13), members, m_bits=m_bits, k=k
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert again["maybe_member"].tolist() == out["maybe_member"].tolist()
