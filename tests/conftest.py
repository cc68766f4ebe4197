import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """120 deterministic clips (no audio payloads — text-path tests)."""
    from intertext_ray.fixtures.gen_clips import gen_corpus

    clips, truth, meta = gen_corpus(120, seed=42, with_audio=False)
    return clips, truth, meta


@pytest.fixture(scope="session")
def small_docs(small_corpus):
    from intertext_ray.sources.clips import clips_to_docs

    clips, _, _ = small_corpus
    tbl = clips_to_docs(clips)
    return {int(r["doc_id"]): r["text"] for r in tbl.select(["doc_id", "text"]).to_pylist()}


@pytest.fixture(scope="session")
def oracle_result(small_docs):
    from intertext_ray.config import IntertextConfig
    from intertext_ray.oracle.oracle import run_oracle

    return run_oracle(small_docs, IntertextConfig())
