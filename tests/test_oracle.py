"""Oracle self-consistency + reference-quirk model (SURVEY.md §2.11, §5)."""

from intertext_ray.config import IntertextConfig
from intertext_ray.oracle.oracle import (
    candidates_with_ref_quirks,
    doc_windows,
    run_oracle,
)

CFG = IntertextConfig()


def test_identical_docs_fully_match():
    t = " ".join(f"w{i}" for i in range(30))
    res = run_oracle({0: t, 1: t}, CFG)
    n_win = len(doc_windows(t, CFG))
    assert n_win == 5
    # every same-index window pair is a 100-sim match
    for w in range(n_win):
        assert res.matches.get((0, 1, w, w)) == 100
    # one component containing both docs
    assert len(set(res.components.values())) == 1


def test_disjoint_docs_no_matches():
    # disjoint alphabets so no char 4-grams collide and difflib stays low
    a = " ".join("kaba" * (1 + i % 3) for i in range(40))
    b = " ".join("zuzu" * (1 + (i + 1) % 3) for i in range(40))
    res = run_oracle({0: a, 1: b}, CFG)
    assert not res.matches


def test_short_docs_zero_windows():
    res = run_oracle({0: "too short", 1: ""}, CFG)
    assert res.windows[0] == [] and res.windows[1] == []
    assert not res.candidates


def test_quirk_candidates_are_subset(oracle_result):
    """Reference chunked scan output ⊆ exact groupby output (Q1/Q2)."""
    quirk = candidates_with_ref_quirks(oracle_result.hashbands, batch_size=500, n_chunks=3)
    assert quirk <= oracle_result.candidates
    # the quirks genuinely drop something on a corpus this size
    assert len(quirk) < len(oracle_result.candidates)


def test_engine_recall_vs_quirk_reference(oracle_result):
    """Recall accounting: verified pairs derived from the quirk-modelled
    (reference-behavior) candidate set are contained in ours — so dup-pair
    recall vs the reference is 1.0 ≥ 0.99 by construction."""
    from intertext_ray.functions.similarity import verify_pair

    quirk = candidates_with_ref_quirks(oracle_result.hashbands)
    wins = oracle_result.windows
    ref_pairs = set()
    for da, db, wa, wb in quirk:
        if verify_pair(wins[da][wa], wins[db][wb], CFG.min_sim, CFG.window_length) is not None:
            ref_pairs.add((da, db))
    ours = oracle_result.dup_doc_pairs()
    assert ref_pairs <= ours
    recall = len(ref_pairs & ours) / max(1, len(ref_pairs))
    assert recall >= 0.99


def test_banish_prunes_matches():
    t = " ".join(f"w{i}" for i in range(30))
    res_plain = run_oracle({0: t, 1: t, 2: t}, CFG)
    res_ban = run_oracle({0: t, 1: t, 2: t}, CFG, banished_doc_ids={2})
    assert len(res_ban.matches) < len(res_plain.matches)
    # everything is within distance 1 of banished doc-2 nodes -> all killed
    assert not res_ban.matches


def test_max_file_sim_gate():
    t = " ".join(f"w{i}" for i in range(30))
    cfg = IntertextConfig(max_file_sim=0.5)
    res = run_oracle({0: t, 1: t}, cfg)
    # whole-doc duplicate: matches > 0.5 * window count -> pair skipped in
    # formatting (A7 intended semantics), matches themselves remain
    assert res.matches and not res.pair_clusters


def test_truth_clusters_are_recovered(small_corpus, small_docs, oracle_result):
    """Planted near-dup clusters (edit rates below the ~45-sim band) are
    discovered as duplicate doc pairs."""
    clips, truth, _ = small_corpus
    tdf = truth.to_pandas()
    planted = tdf[(tdf.role.isin(["seed", "near_dup"]))]
    by_cluster = planted.groupby("cluster_id").clip_id.apply(list)
    found_pairs = oracle_result.dup_doc_pairs()
    recovered = 0
    total = 0
    for cid, members in by_cluster.items():
        ids = sorted(int(m.split("_")[1]) for m in members)
        seed = ids[0]
        for other in ids[1:]:
            total += 1
            if (seed, other) in found_pairs or (other, seed) in found_pairs:
                recovered += 1
    # the ~45-sim edit band is *designed* to fall below min_sim -> not all
    # planted members verify; but a solid majority must
    assert total > 0
    assert recovered / total > 0.6, (recovered, total)


def test_difflib_sql_kernel_exact():
    """The recursive Ratcliff/Obershelp SQL kernel (DIFFLIB_SQL_CTES, used by
    the dedup_match_sample twin) reproduces Python difflib's
    int(SequenceMatcher(None, a, b, autojunk=False).ratio() * 100) exactly —
    including tie-breaking on equal-length blocks (stressed with a tiny
    alphabet) and the identical/disjoint extremes."""
    import random
    from difflib import SequenceMatcher

    import duckdb
    import pandas as pd

    from __ray_entry__ import DIFFLIB_SQL_CTES

    random.seed(23)
    voc = ["alpha", "beta", "gamma", "x", "y", "the", "of", "b"]
    pairs = []
    pid = 0
    for _ in range(40):  # realistic 14-word windows with edits
        base = " ".join(random.choice(voc) for _ in range(14))
        toks = base.split()
        for _ in range(random.randrange(0, 5)):
            toks[random.randrange(14)] = random.choice(voc)
        pairs.append((pid, base, " ".join(toks)))
        pid += 1
    for _ in range(60):  # tiny-alphabet tie-break stress
        a = "".join(random.choice("abc ") for _ in range(random.randrange(1, 30)))
        b = "".join(random.choice("abc ") for _ in range(random.randrange(1, 30)))
        pairs.append((pid, a, b))
        pid += 1
    pairs.append((pid, "same text here", "same text here"))
    pairs.append((pid + 1, "aaaa", "bbbb"))

    df = pd.DataFrame(pairs, columns=["pair_id", "a", "b"])
    con = duckdb.connect()
    con.register("src", df)
    sql = f"""
        WITH RECURSIVE
        pairs AS (SELECT * FROM src),
        {DIFFLIB_SQL_CTES}
        SELECT p.pair_id,
               CAST(trunc((2.0 * COALESCE(m.m, 0)
                           / (length(p.a) + length(p.b))) * 100) AS INT) AS sim
        FROM pairs p LEFT JOIN msum m USING (pair_id)
        ORDER BY p.pair_id
    """
    got = dict(con.execute(sql).fetchall())
    for i, a, b in pairs:
        exp = int(SequenceMatcher(None, a, b, autojunk=False).ratio() * 100)
        assert got[i] == exp, (i, a, b, got[i], exp)
