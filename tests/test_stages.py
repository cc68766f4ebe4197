"""Ray stages vs oracle — operator-by-operator (SURVEY.md §7.1 steps 4-8)."""

import numpy as np
import pytest
import ray.data as rd

from intertext_ray.config import IntertextConfig
from intertext_ray.sources.clips import clips_to_docs
from intertext_ray.stages.bands import hashbands_stage
from intertext_ray.stages.candidates import candidates_stage, pairs_within_runs
from intertext_ray.stages.cluster import components_from_matches
from intertext_ray.stages.minhash import signatures_stage
from intertext_ray.stages.verify import matches_stage, verify_broadcast
from intertext_ray.stages.windows import windows_stage

CFG = IntertextConfig()


@pytest.fixture(scope="module")
def docs_ds(ray_session, small_corpus):
    clips, _, _ = small_corpus
    return rd.from_arrow(clips_to_docs(clips).select(["doc_id", "text"]))


@pytest.fixture(scope="module")
def windows_ds(docs_ds):
    return windows_stage(docs_ds, CFG).materialize()


def test_windows_stage_equals_oracle(windows_ds, oracle_result):
    df = windows_ds.to_pandas()
    eng = {
        (int(r.doc_id), int(r.window_id)): r.text for r in df.itertuples()
    }
    ora = {
        (d, w): t
        for d, ws in oracle_result.windows.items()
        for w, t in enumerate(ws)
    }
    assert eng == ora


def test_signatures_stage_equals_oracle(windows_ds, oracle_result):
    sigs = signatures_stage(windows_ds, CFG).to_pandas()
    for r in sigs.sample(n=min(200, len(sigs)), random_state=0).itertuples():
        expect = oracle_result.signatures[int(r.doc_id)][int(r.window_id)]
        assert (np.asarray(r.sig, dtype=np.uint32) == expect).all()


def test_hashbands_stage_equals_oracle(windows_ds, oracle_result):
    hb = hashbands_stage(signatures_stage(windows_ds, CFG), CFG).to_pandas()
    eng = set(
        zip(hb.band.astype(np.uint64).tolist(), hb.doc_id.astype(int), hb.window_id.astype(int))
    )
    assert eng == oracle_result.hashbands


def test_pairs_within_runs():
    ii, jj = pairs_within_runs(np.array([3, 1, 2]))
    got = sorted(zip(ii.tolist(), jj.tolist()))
    assert got == [(0, 1), (0, 2), (1, 2), (4, 5)]
    ii, jj = pairs_within_runs(np.array([], dtype=np.int64))
    assert len(ii) == 0


def test_candidates_stage_equals_exact_oracle(windows_ds, oracle_result):
    hb = hashbands_stage(signatures_stage(windows_ds, CFG), CFG)
    cand = candidates_stage(hb, CFG, num_buckets=8).to_pandas()
    eng = set(
        zip(
            cand.doc_a.astype(int),
            cand.doc_b.astype(int),
            cand.win_a.astype(int),
            cand.win_b.astype(int),
        )
    )
    assert eng == oracle_result.candidates
    # and no duplicates survived dedup
    assert len(cand) == len(eng)


def test_matches_stage_both_joins_equal_oracle(windows_ds, oracle_result):
    hb = hashbands_stage(signatures_stage(windows_ds, CFG), CFG)
    cand = candidates_stage(hb, CFG, num_buckets=8).materialize()
    for strategy in ("broadcast", "hash"):
        cfg = IntertextConfig(join_strategy=strategy)
        m = matches_stage(cand, windows_ds, cfg, num_buckets=8).to_pandas()
        eng = {
            (int(r.doc_a), int(r.doc_b), int(r.win_a), int(r.win_b)): int(r.similarity)
            for r in m.itertuples()
        }
        assert eng == oracle_result.matches, strategy


def test_components_equal_oracle(windows_ds, oracle_result):
    hb = hashbands_stage(signatures_stage(windows_ds, CFG), CFG)
    cand = candidates_stage(hb, CFG, num_buckets=8)
    m = matches_stage(cand, windows_ds, IntertextConfig(join_strategy="broadcast"), 8)
    comp = components_from_matches(m.materialize()).to_pandas()
    eng = {}
    for r in comp.itertuples():
        eng.setdefault(int(r.component_id), set()).add((int(r.doc_id), int(r.window_id)))
    ora = {}
    for node, cid in oracle_result.components.items():
        ora.setdefault(cid, set()).add(node)
    assert sorted(map(sorted, eng.values())) == sorted(map(sorted, ora.values()))
