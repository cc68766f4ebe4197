"""Mojibake gate and crest-factor report: counting contract, gate
semantics, isqrt parity."""

import math

import numpy as np
import pyarrow as pa
import ray.data as rd


def _docs_ds(ids, texts, blocks=2):
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    return rd.from_arrow(t).repartition(blocks)


def test_mojibake_counts_and_gate(ray_session):
    from intertext_ray.ops.curate import mojibake_report

    e_acute_moji = "Ã©"
    emdash_moji = "â€”"
    texts = [
        "perfectly clean text",
        f"one caf{e_acute_moji} only",  # 1 artifact -> NOT flagged
        f"caf{e_acute_moji} {emdash_moji} twice",  # 2 -> flagged
        "broken � byte",  # replacement -> flagged
        f"{e_acute_moji}{e_acute_moji}{e_acute_moji}",  # 3 adjacent
        "",
    ]
    got = (
        mojibake_report(_docs_ds(list(range(6)), texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_artifacts"].tolist() == [0, 1, 2, 0, 3, 0]
    assert got["n_replacement"].tolist() == [0, 0, 0, 1, 0, 0]
    assert got["is_mojibake"].tolist() == [
        False,
        False,
        True,
        True,
        True,
        False,
    ]
    assert got["n_chars"].tolist() == [len(t) for t in texts]
    # per-kchar: doc 4 is 6 chars, 3 artifacts -> 500
    assert got.loc[4, "artifacts_per_kchar"] == 500


def test_mojibake_replace_delta_equivalence():
    """The engine count equals the SQL replace-length-delta count for
    overlap-prone inputs (non-overlapping left-to-right on both sides)."""
    import duckdb
    import pyarrow.compute as pc

    from intertext_ray.ops.curate import MOJIBAKE_PATTERNS

    probes = [
        "Ã©" * 4,
        "xÃ©xâ€”" * 3,
        "â€™â€™",
        "clean",
    ]
    con = duckdb.connect()
    for p in MOJIBAKE_PATTERNS:
        for t in probes:
            eng = pc.count_substring(
                pa.array([t], pa.string()), p
            ).to_pylist()[0]
            sql = con.execute(
                "SELECT (length(?) - length(replace(?, ?, ''))) // length(?)",
                [t, t, p, p],
            ).fetchone()[0]
            assert eng == sql, (p, t)


def _clip_table(rows):
    from intertext_ray.functions.audio import encode_clip

    return pa.table(
        {
            "clip_id": pa.array([r[0] for r in rows], pa.string()),
            "bytes": pa.array(
                [encode_clip(r[1], r[2], r[3]) for r in rows], pa.binary()
            ),
            "sr_hz": pa.array([r[2] for r in rows], pa.int32()),
            "codec": pa.array([r[3] for r in rows], pa.string()),
        }
    )


def test_crest_classes_and_isqrt(ray_session):
    from intertext_ray.ops.audio_stats import crest_report

    sr = 8000
    t = np.arange(sr) / sr
    sine = (10000 * np.sin(2 * np.pi * 100 * t)).astype(np.int16)
    square = np.where(np.sin(2 * np.pi * 100 * t) >= 0, 20000, -20000).astype(
        np.int16
    )
    click = np.zeros(sr, np.int16)
    click[100] = 30000
    silent = np.zeros(sr, np.int16)
    rows = [
        ("sine", sine, sr, "pcm_s16le"),
        ("square", square, sr, "pcm_s16le"),
        ("click", click, sr, "pcm_s16le"),
        ("silent", silent, sr, "pcm_s16le"),
    ]
    got = (
        crest_report(rd.from_arrow(_clip_table(rows)))
        .to_pandas()
        .set_index("clip_id")
    )
    assert got.loc["square", "dr_class"] == "flat"  # crest == 1000
    assert got.loc["square", "crest_milli"] == 1000
    assert got.loc["sine", "dr_class"] == "normal"  # ~1414
    assert 1410 <= got.loc["sine", "crest_milli"] <= 1420
    assert got.loc["click", "dr_class"] == "peaky"
    assert got.loc["silent", "dr_class"] == "silent"
    assert got.loc["silent", "crest_milli"] == 0
    # isqrt contract replay
    s = sine.astype(np.int64)
    ms = int(np.sum(s * s)) // len(s)
    assert got.loc["sine", "rms_floor"] == math.isqrt(ms)
    assert (
        got.loc["sine", "crest_milli"]
        == got.loc["sine", "peak_abs"] * 1000 // math.isqrt(ms)
    )
