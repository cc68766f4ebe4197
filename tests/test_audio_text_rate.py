"""Speaking-rate consistency gate: classification boundaries (exact
cross-multiplied integer comparisons), wpm_milli floor arithmetic, the
purge face, and the DuckDB-twin token contract on nasty whitespace."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _clips(rows):
    return rd.from_arrow(
        pa.table(
            {
                "clip_id": [r[0] for r in rows],
                "bytes": [b"" for _ in rows],
                "sr_hz": pa.array([16000] * len(rows), pa.int32()),
                "dur_ms": pa.array([r[1] for r in rows], pa.int32()),
                "codec": ["pcm_s16le"] * len(rows),
                "transcript": [r[2] for r in rows],
            }
        )
    )


def test_rate_classes_and_boundaries(ray_session):
    from intertext_ray.ops.audio_text_rate import speech_rate_report

    # 30 wpm lower bound: 1 token in 2000 ms is exactly 30 wpm -> ok;
    # 1 token in 2001 ms is just under -> too_slow.  400 wpm upper:
    # 2 tokens in 300 ms is exactly 400 -> ok; in 299 ms -> too_fast.
    rows = [
        ("lo_ok", 2000, "word"),
        ("lo_bad", 2001, "word"),
        ("hi_ok", 300, "two words"),
        ("hi_bad", 299, "two words"),
        ("empty", 1000, "   "),
        ("invalid", 0, "some words"),
        ("normal", 3000, "five words spoken right here"),
    ]
    got = speech_rate_report(_clips(rows)).to_pandas().set_index("clip_id")
    assert got.loc["lo_ok", "rate_class"] == "ok"
    assert got.loc["lo_bad", "rate_class"] == "too_slow"
    assert got.loc["hi_ok", "rate_class"] == "ok"
    assert got.loc["hi_bad", "rate_class"] == "too_fast"
    assert got.loc["empty", "rate_class"] == "empty"
    assert got.loc["invalid", "rate_class"] == "invalid"
    assert got.loc["normal", "rate_class"] == "ok"
    # wpm_milli floor arithmetic: 1 token / 2001 ms
    assert int(got.loc["lo_bad", "wpm_milli"]) == 60_000_000 // 2001
    assert int(got.loc["normal", "n_tokens"]) == 5
    assert int(got.loc["invalid", "wpm_milli"]) == 0


def test_rate_gate_purges_outliers(ray_session):
    from intertext_ray.ops.audio_text_rate import rate_gate

    rows = [
        ("keep", 3000, "five words spoken right here"),
        ("slow", 60000, "one"),
        ("fast", 100, "way too many words for a tenth of a second"),
        ("empty", 1000, ""),
    ]
    out = rate_gate(_clips(rows)).to_pandas()
    assert sorted(out["clip_id"]) == ["keep"]
    # full rows preserved
    assert set(out.columns) >= {"clip_id", "bytes", "dur_ms", "transcript"}


def test_token_contract_matches_twin_on_whitespace(ray_session):
    import duckdb

    from intertext_ray.ops.audio_text_rate import speech_rate_report

    # tabs / newlines / runs — Python str.split() semantics on the engine
    # side, regexp split + empty filter on the twin side
    rows = [
        ("t0", 60000, "a\tb\nc"),
        ("t1", 60000, "  leading and   runs  "),
        ("t2", 60000, "\t\n "),
    ]
    eng = (
        speech_rate_report(_clips(rows))
        .to_pandas()
        .set_index("clip_id")["n_tokens"]
    )
    sql = duckdb.sql(
        """
        SELECT * FROM (VALUES ('a' || chr(9) || 'b' || chr(10) || 'c'),
                              ('  leading and   runs  '),
                              (chr(9) || chr(10) || ' ')) v(t)
        """
    ).df()
    counts = [
        duckdb.sql(
            "SELECT CAST(len(list_filter(regexp_split_to_array(?, '\\s+'),"
            " w -> w <> '')) AS BIGINT)",
            params=[t],
        ).fetchone()[0]
        for t in sql["t"]
    ]
    assert [int(eng["t0"]), int(eng["t1"]), int(eng["t2"])] == counts == [
        3, 3, 0,
    ]
