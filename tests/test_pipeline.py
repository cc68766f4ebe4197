"""End-to-end pipeline: parity, recall gate, checkpoint resume, scale
invariance (FIXTURES.md §3-5)."""

import shutil

import pytest
import ray.data as rd

from intertext_ray.config import IntertextConfig
from intertext_ray.pipelines.dedup import run_dedup
from intertext_ray.sources.clips import clips_to_docs

CFG = IntertextConfig()


@pytest.fixture(scope="module")
def pipeline_run(ray_session, small_corpus, tmp_path_factory):
    clips, _, _ = small_corpus
    docs = rd.from_arrow(clips_to_docs(clips).select(["doc_id", "text"]))
    work = str(tmp_path_factory.mktemp("dedup_work"))
    res = run_dedup(docs, CFG, work_dir=work, num_buckets=8)
    return res, docs, work


def test_matches_exact_parity(pipeline_run, oracle_result):
    res, _, _ = pipeline_run
    m = res.matches.to_pandas()
    eng = {
        (int(r.doc_a), int(r.doc_b), int(r.win_a), int(r.win_b)): int(r.similarity)
        for r in m.itertuples()
    }
    assert eng == oracle_result.matches


def test_dup_pair_recall_gate(pipeline_run, oracle_result):
    """BASELINE.json gate: dup-pair recall >= 0.99 vs the (quirk-modelled)
    reference behavior."""
    from intertext_ray.functions.similarity import verify_pair
    from intertext_ray.oracle.oracle import candidates_with_ref_quirks

    res, _, _ = pipeline_run
    m = res.matches.to_pandas()
    ours = set(zip(m.doc_a.astype(int), m.doc_b.astype(int)))
    quirk = candidates_with_ref_quirks(oracle_result.hashbands)
    wins = oracle_result.windows
    ref_pairs = set()
    for da, db, wa, wb in quirk:
        if verify_pair(wins[da][wa], wins[db][wb], CFG.min_sim, CFG.window_length) is not None:
            ref_pairs.add((da, db))
    recall = len(ref_pairs & ours) / max(1, len(ref_pairs))
    assert recall >= 0.99, recall


def test_pair_clusters_parity(pipeline_run, oracle_result):
    res, _, _ = pipeline_run
    pc = res.pair_clusters.to_pandas()
    eng = sorted(
        (int(r.doc_a), int(r.doc_b), tuple(r.a_segments), tuple(r.b_segments), int(r.similarity))
        for r in pc.itertuples()
    )
    ora = sorted(
        (c["doc_a"], c["doc_b"], tuple(c["a_segments"]), tuple(c["b_segments"]), c["similarity"])
        for c in oracle_result.pair_clusters
    )
    assert eng == ora


def test_resume_uses_checkpoints(pipeline_run):
    res, docs, work = pipeline_run
    n = res.matches.count()
    res2 = run_dedup(docs, CFG, work_dir=work, num_buckets=8, with_pair_clusters=False)
    assert res2.store.is_complete("matches")
    assert res2.matches.count() == n


def test_partial_resume_recomputes_only_missing(pipeline_run):
    res, docs, work = pipeline_run
    n = res.matches.count()
    shutil.rmtree(f"{work}/matches")
    res3 = run_dedup(docs, CFG, work_dir=work, num_buckets=8, with_pair_clusters=False)
    assert res3.matches.count() == n
    man = res3.store.all_manifests()
    assert man["matches"]["rows"] == n


def test_config_change_invalidates(pipeline_run, tmp_path):
    _, docs, work = pipeline_run
    cfg2 = IntertextConfig(min_sim=95)
    res = run_dedup(docs, cfg2, work_dir=work + "_cfg2", num_buckets=8, with_pair_clusters=False)
    assert res.store.is_complete("matches")
    # much stricter threshold -> strictly fewer matches
    assert res.matches.count() < resilient_count(pipeline_run)


def resilient_count(pipeline_run):
    res, _, _ = pipeline_run
    return res.matches.count()


def test_partition_invariance(ray_session, small_corpus, oracle_result, tmp_path):
    """Same results regardless of input block structure (FIXTURES.md §5)."""
    clips, _, _ = small_corpus
    docs = rd.from_arrow(clips_to_docs(clips).select(["doc_id", "text"])).repartition(7)
    res = run_dedup(
        docs, CFG, work_dir=str(tmp_path / "p7"), num_buckets=3, with_pair_clusters=False
    )
    m = res.matches.to_pandas()
    eng = {
        (int(r.doc_a), int(r.doc_b), int(r.win_a), int(r.win_b)): int(r.similarity)
        for r in m.itertuples()
    }
    assert eng == oracle_result.matches


def test_banish_pipeline(ray_session, tmp_path):
    t = " ".join(f"w{i}" for i in range(30))
    docs = rd.from_items(
        [{"doc_id": 0, "text": t}, {"doc_id": 1, "text": t}, {"doc_id": 2, "text": t}]
    ).map_batches(lambda b: b, batch_format="pyarrow")
    import pyarrow as pa

    def cast(b: "pa.Table") -> "pa.Table":
        return pa.table({"doc_id": b["doc_id"].cast(pa.uint64()), "text": b["text"]})

    docs = docs.map_batches(cast, batch_format="pyarrow")
    res = run_dedup(
        docs,
        CFG,
        work_dir=str(tmp_path / "ban"),
        num_buckets=2,
        banished_doc_ids={2},
        with_pair_clusters=False,
    )
    assert res.matches.count() == 0


def test_max_file_sim_gate_distributed(ray_session, tmp_path):
    """Engine twin of tests/test_oracle.py::test_max_file_sim_gate — whole-doc
    duplicates exceed max_file_sim x window count, so every pair is blocked in
    pair_clusters (matches themselves remain).  Exercises the distributed
    _blocked_pairs path (no driver dict)."""
    import pyarrow as pa

    t = " ".join(f"w{i}" for i in range(30))

    def mk(docs_dict):
        import ray.data as rd2

        def cast(b: "pa.Table") -> "pa.Table":
            return pa.table(
                {"doc_id": b["doc_id"].cast(pa.uint64()), "text": b["text"]}
            )

        return rd2.from_items(
            [{"doc_id": k, "text": v} for k, v in docs_dict.items()]
        ).map_batches(cast, batch_format="pyarrow")

    cfg = IntertextConfig(max_file_sim=0.5)
    res = run_dedup(
        mk({0: t, 1: t}),
        cfg,
        work_dir=str(tmp_path / "mfs"),
        num_buckets=2,
        with_pair_clusters=True,
    )
    assert res.matches.count() > 0
    assert res.pair_clusters.count() == 0

    # control: gate off -> same corpus yields pair clusters
    res2 = run_dedup(
        mk({0: t, 1: t}),
        CFG,
        work_dir=str(tmp_path / "mfs_off"),
        num_buckets=2,
        with_pair_clusters=True,
    )
    assert res2.pair_clusters.count() > 0


def test_streaming_equals_checkpointed(pipeline_run, oracle_result, tmp_path):
    """checkpoints=False (one pipelined execution, candidate dedup fused
    into the verify join) produces the IDENTICAL match set + similarities
    as the checkpointed path / oracle."""
    _, docs, _ = pipeline_run
    res = run_dedup(
        docs, CFG, work_dir=str(tmp_path / "stream"), num_buckets=8,
        checkpoints=False, with_pair_clusters=False,
    )
    m = res.matches.to_pandas()
    eng = {
        (int(r.doc_a), int(r.doc_b), int(r.win_a), int(r.win_b)): int(r.similarity)
        for r in m.itertuples()
    }
    assert eng == oracle_result.matches
    assert len(m) == len(eng)  # fused dedup left no duplicate match rows


def test_lineage_report_tables(pipeline_run):
    """stage_report/partition_report roll the checkpoint manifests into
    queryable lineage tables: every checkpointed stage appears, row counts
    match the manifests, and partition rows sum to the stage total."""
    from intertext_ray.state.report import partition_report, stage_report

    res, _, _ = pipeline_run
    st = stage_report(res.store).to_pandas().set_index("stage")
    for stage in ("windows", "hashbands", "candidates", "matches"):
        assert stage in st.index
        assert st.loc[stage, "complete"]
    assert st.loc["matches", "rows"] == res.matches.count()
    assert (st["upstream"].loc["matches"]) == "candidates,windows"
    pr = partition_report(res.store).to_pandas()
    sums = pr.groupby("stage")["rows"].sum()
    for stage in ("windows", "hashbands", "candidates", "matches"):
        assert sums[stage] == st.loc[stage, "rows"]


def test_resume_across_num_buckets_change(pipeline_run):
    """num_buckets is a PHYSICAL knob (cluster sizing), not a semantic one:
    re-running against the same work_dir with a different bucket count must
    resume from the finished checkpoints (config hash unchanged), not
    recompute — the real resize-the-cluster-and-resume scenario."""
    res, docs, work = pipeline_run
    n = res.matches.count()
    res2 = run_dedup(
        docs, CFG, work_dir=work, num_buckets=5, with_pair_clusters=False
    )
    assert res2.store.is_complete("matches")
    assert res2.matches.count() == n
