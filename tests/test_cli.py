"""CLI entry point (reference's command-line surface, run in-process)."""

import json
import os

import pytest


def test_cli_end_to_end(ray_session, tmp_path, capsys):
    from intertext_ray.cli import main
    from intertext_ray.fixtures.gen_clips import write_corpus

    corpus = str(tmp_path / "corpus")
    write_corpus(corpus, 60, seed=42, with_audio=False, shards=2)
    out = str(tmp_path / "out")
    rc = main(
        [
            "--clips", f"{corpus}/clips",
            "--output", out,
            "--num-buckets", "4",
            "--no-audio-validate",
            "--metadata", f"{corpus}/metadata.json",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["matches"] > 0
    assert os.path.exists(f"{out}/doc_clusters.parquet")
    assert os.path.exists(f"{out}/api/config.json")
    # resume: second invocation loads checkpoints (same counts)
    rc2 = main(
        [
            "--clips", f"{corpus}/clips",
            "--output", out,
            "--num-buckets", "4",
            "--no-audio-validate",
            "--skip-api",
        ]
    )
    assert rc2 == 0
    summary2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary2["matches"] == summary["matches"]


def test_cli_requires_input():
    from intertext_ray.cli import main

    assert main([]) == 2


def test_cli_preprocess_mode(ray_session, tmp_path, capsys):
    """--mode preprocess rewrites payloads (normalize + resample) and
    passes every non-audio column through."""
    import duckdb

    from intertext_ray.cli import main
    from intertext_ray.fixtures.gen_clips import write_corpus

    corpus = str(tmp_path / "corpus")
    write_corpus(corpus, 20, seed=11, with_audio=True, shards=2)
    out = str(tmp_path / "pre")
    rc = main(
        [
            "--clips", f"{corpus}/clips",
            "--output", out,
            "--mode", "preprocess",
            "--target-hz", "16000",
            "--target-peak", "30000",
            "--resampler", "linear",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["clips_out"] > 0
    df = duckdb.sql(
        f"SELECT DISTINCT codec, sr_hz FROM "
        f"read_parquet('{out}/clips_preprocessed/*.parquet')"
    ).df()
    assert df["codec"].tolist() == ["pcm_s16le"]
    assert df["sr_hz"].tolist() == [16000]
    n_tr = duckdb.sql(
        f"SELECT count(transcript) FROM "
        f"read_parquet('{out}/clips_preprocessed/*.parquet')"
    ).fetchone()[0]
    assert n_tr == summary["clips_out"]
