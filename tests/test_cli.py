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


def test_cli_spans_mode(ray_session, tmp_path, capsys):
    """--mode spans detects shared audio spans over the planted-dup
    corpus and writes the despanned clip table (dup clips lose frames;
    pass-through clips keep their payload byte-identical)."""
    import duckdb
    import pyarrow.parquet as pq

    from intertext_ray.cli import main
    from intertext_ray.fixtures.gen_audio import gen_audio_dup_corpus

    clips, truth = gen_audio_dup_corpus(24, seed=5)
    corpus = str(tmp_path / "aclips")
    import os

    os.makedirs(corpus, exist_ok=True)
    pq.write_table(clips, f"{corpus}/part0.parquet")
    out = str(tmp_path / "spans_out")
    rc = main(
        [
            "--clips", corpus,
            "--output", out,
            "--mode", "spans",
            "--num-buckets", "4",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["mode"] == "spans"
    assert summary["clips"] == 24
    assert summary["span_rows"] > 0 and summary["clips_cut"] > 0
    n = duckdb.sql(
        f"SELECT count(*), sum(CASE WHEN n_frames_removed > 0 THEN 1 "
        f"ELSE 0 END) FROM read_parquet('{out}/clips_despanned/*.parquet')"
    ).fetchone()
    assert n[0] == 24 and n[1] == summary["clips_cut"]


def test_cli_pack_mode(ray_session, tmp_path, capsys):
    """--mode pack writes the assignment parquet (+ materialized windows
    with --pack-payloads) and the durations reconcile."""
    import duckdb

    from intertext_ray.cli import main
    from intertext_ray.fixtures.gen_clips import write_corpus

    corpus = str(tmp_path / "corpus")
    write_corpus(corpus, 20, seed=7, with_audio=True, shards=2)
    out = str(tmp_path / "pack")
    rc = main(
        [
            "--clips", f"{corpus}/clips",
            "--output", out,
            "--mode", "pack",
            "--pack-budget-ms", "4000",
            "--pack-payloads",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["clips"] == 20
    assert summary["packs"] >= 1
    assert summary["packs_materialized"] == summary["packs"]
    tot = duckdb.sql(
        f"SELECT sum(dur_ms) FROM "
        f"read_parquet('{out}/pack_assignment/*.parquet')"
    ).fetchone()[0]
    ptot = duckdb.sql(
        f"SELECT sum(total_ms), count(*) FROM "
        f"read_parquet('{out}/packs/*.parquet')"
    ).fetchone()
    assert int(ptot[0]) == int(tot)
    assert int(ptot[1]) == summary["packs"]


def test_cli_preprocess_dc_and_rms(ray_session, tmp_path, capsys):
    """--remove-dc + --target-rms compose in preprocess mode; output is
    DC-free and RMS-leveled (integer-exact kernels verified elsewhere —
    here we pin the wiring end-to-end)."""
    import duckdb
    import numpy as np

    from intertext_ray.cli import main
    from intertext_ray.fixtures.gen_clips import write_corpus
    from intertext_ray.functions.audio import decode_pcm_s16le

    corpus = str(tmp_path / "corpus")
    write_corpus(corpus, 10, seed=3, with_audio=True, shards=1)
    out = str(tmp_path / "pre2")
    rc = main(
        [
            "--clips", f"{corpus}/clips",
            "--output", out,
            "--mode", "preprocess",
            "--remove-dc",
            "--target-rms", "8000",
            "--target-hz", "16000",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["remove_dc"] is True and summary["target_rms"] == 8000
    blobs = duckdb.sql(
        f"SELECT bytes FROM "
        f"read_parquet('{out}/clips_preprocessed/*.parquet')"
    ).fetchall()
    assert len(blobs) == summary["clips_out"] > 0
    for (b,) in blobs:
        pcm = decode_pcm_s16le(bytes(b)).astype(np.int64)
        if not len(pcm):
            continue
        rms = int(np.sum(pcm * pcm)) // len(pcm)
        # leveled near 8000 (resample after normalization shifts it a
        # little; DC residual strictly sub-sample before the gain)
        assert 4000**2 < rms < 12000**2


def test_cli_chunks_mode(ray_session, tmp_path, capsys):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from intertext_ray.cli import main

    rng = np.random.default_rng(13)
    vocab = [f"v{i}" for i in range(30)]
    boiler = " ".join(rng.choice(vocab, size=50))
    texts = []
    for i in range(40):
        t = " ".join(rng.choice(vocab, size=int(rng.integers(10, 60))))
        if i % 2 == 0:
            t = t + " " + boiler  # shared tail -> duplicated chunks
        texts.append(t)
    docs = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": texts,
            }
        ),
        docs,
    )
    out = str(tmp_path / "chunk_out")
    rc = main(
        [
            "--documents", docs,
            "--output", out,
            "--mode", "chunks",
            "--num-buckets", "4",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["docs"] == 40
    assert summary["dup_chunk_hashes"] > 0
    assert 0 < summary["docs_cut"] < 40
    assert summary["tokens_removed"] > 0
    assert os.path.isdir(f"{out}/dup_chunks")
    assert os.path.isdir(f"{out}/docs_dechunked")
    # the purge output re-reads as a documents table, one row per doc
    got = pq.read_table(f"{out}/docs_dechunked")
    assert got.num_rows == 40

    # chunks mode requires --documents
    assert main(["--clips", "x", "--output", out, "--mode", "chunks"]) == 2


def test_cli_tiers_mode(ray_session, tmp_path, capsys):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from intertext_ray.cli import main

    rng = np.random.default_rng(23)
    vocab = [f"v{i}" for i in range(50)]
    base = " ".join(rng.choice(vocab, size=30))
    near = base.split()
    near[4] = "zz"
    texts = [
        base,
        base,                    # exact dup of 0
        base.upper() + "!!",     # fold dup of 0 (raw-distinct)
        " ".join(near),          # near dup of 0
    ] + [
        " ".join(rng.choice(vocab, size=25)) for _ in range(12)
    ]
    docs = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": texts,
            }
        ),
        docs,
    )
    out = str(tmp_path / "tiers_out")
    rc = main(
        [
            "--documents", docs,
            "--output", out,
            "--mode", "tiers",
            "--num-buckets", "4",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["docs"] == len(texts)
    assert summary["dropped_at"].get("exact", 0) >= 1
    assert summary["dropped_at"].get("norm", 0) >= 1
    assert summary["survivors"] == summary["dropped_at"].get("none", 0)
    # survivors parquet has the raw texts of kept docs only
    import glob as _glob

    surv = pa.concat_tables(
        [pq.read_table(f) for f in _glob.glob(f"{out}/survivors/*.parquet")]
    )
    assert surv.num_rows == summary["survivors"]
    assert base in surv["text"].to_pylist()
