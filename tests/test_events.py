"""Event-stream operators: tumbling windows, sessionization, as-of join
(semantics pinned on tiny hand-checked streams; sf-scale parity vs the
DuckDB twins is the driver's contract check)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

US = 1_000_000
HOUR = 3600 * US


def _events(rows):
    """rows: (event_id, ts_us, user_id, event_type, value)"""
    eid, ts, uid, et, val = zip(*rows)
    return rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "ts": pa.array(list(ts), pa.timestamp("us")),
                "user_id": pa.array(uid, pa.int64()),
                "event_type": pa.array(et, pa.string()),
                "value": pa.array(val, pa.float64()),
            }
        )
    )


def test_windowed_event_stats(ray_session):
    from intertext_ray.ops.events import windowed_event_stats

    ev = _events(
        [
            (0, 10 * US, 1, "view", 1.00),
            (1, 20 * US, 1, "view", 2.50),
            (2, HOUR + 5 * US, 1, "view", 4.00),
            (3, 30 * US, 2, "click", 0.10),
        ]
    )
    out = (
        windowed_event_stats(ev, window_hours=1)
        .to_pandas()
        .sort_values(["user_id", "window_start_us"])
        .reset_index(drop=True)
    )
    assert out.values.tolist() == [
        [1, 0, 2, 350],
        [1, HOUR, 1, 400],
        [2, 0, 1, 10],
    ]


def test_sessionize_gap_boundaries(ray_session):
    from intertext_ray.ops.events import sessionize

    gap = 30 * 60 * US
    ev = _events(
        [
            (0, 0, 1, "view", 1.0),
            (1, gap, 1, "view", 1.0),        # exactly the gap: SAME session
            (2, 2 * gap + 1, 1, "view", 1.0),  # gap+1 later: new session
            (3, 5, 2, "view", 2.0),
        ]
    )
    out = (
        sessionize(ev, gap_minutes=30)
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    u1 = out[out.user_id == 1]
    assert list(u1.session_idx) == [0, 1]
    assert list(u1.n_events) == [2, 1]
    assert list(u1.first_ts_us) == [0, 2 * gap + 1]
    assert list(u1.last_ts_us) == [gap, 2 * gap + 1]
    assert list(out[out.user_id == 2].n_events) == [1]


def test_asof_join_ties_and_unmatched(ray_session):
    from intertext_ray.ops.events import asof_join_events

    ev = _events(
        [
            (0, 100, 1, "view", 0.0),
            (1, 100, 1, "view", 0.0),   # same ts: max event_id wins
            (2, 100, 1, "click", 0.0),  # tie at-or-before -> event 1
            (3, 50, 1, "click", 0.0),   # before any view -> unmatched
            (4, 500, 2, "click", 0.0),  # other user, no views -> unmatched
            (5, 200, 1, "view", 0.0),
            (6, 300, 1, "click", 0.0),  # latest view at 200 -> event 5
        ]
    )
    out = (
        asof_join_events(ev, left_type="click", right_type="view")
        .to_pandas()
        .set_index("event_id")
    )
    assert out.loc[2, "matched_event_id"] == 1
    assert out.loc[3, "matched_event_id"] == -1
    assert out.loc[4, "matched_event_id"] == -1
    assert out.loc[6, "matched_event_id"] == 5
    assert out.loc[6, "matched_ts_us"] == 200


def test_windowed_partial_aggregation_invariance(ray_session):
    """Result is independent of batch/block layout (the partial-aggregate
    combiner is exact)."""
    from intertext_ray.ops.events import windowed_event_stats

    rng = np.random.default_rng(3)
    rows = [
        (i, int(rng.integers(0, 5 * HOUR)), int(rng.integers(1, 9)), "view",
         float(rng.integers(0, 10000)) / 100.0)
        for i in range(400)
    ]
    a = windowed_event_stats(_events(rows)).to_pandas()
    b = windowed_event_stats(_events(rows).repartition(13)).to_pandas()
    key = ["user_id", "window_start_us"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )


def test_range_join_boundaries_and_unmatched(ray_session):
    from intertext_ray.ops.events import range_join_events

    ev = _events(
        [
            (0, 100, 1, "view", 0.0),   # inside interval 7 (inclusive start)
            (1, 200, 1, "view", 0.0),   # inclusive end
            (2, 201, 1, "view", 0.0),   # past the end -> unmatched
            (3, 99, 1, "view", 0.0),    # before the start -> unmatched
            (4, 150, 2, "view", 0.0),   # user without intervals -> unmatched
            (5, 300, 1, "view", 0.0),   # inside interval 8
        ]
    )
    iv = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1], pa.int64()),
                "interval_id": pa.array([7, 8], pa.int64()),
                "start_us": pa.array([100, 250], pa.int64()),
                "end_us": pa.array([200, 400], pa.int64()),
            }
        )
    )
    out = range_join_events(ev, iv).to_pandas().set_index("event_id")
    assert out.loc[0, "interval_id"] == 7
    assert out.loc[1, "interval_id"] == 7
    assert out.loc[2, "interval_id"] == -1
    assert out.loc[3, "interval_id"] == -1
    assert out.loc[4, "interval_id"] == -1
    assert out.loc[5, "interval_id"] == 8
    assert len(out) == 6


def test_sliding_window_covers_two_windows(ray_session):
    from intertext_ray.ops.events import sliding_event_stats

    ev = _events([(0, HOUR + 10 * US, 1, "view", 1.00)])
    out = (
        sliding_event_stats(ev, window_hours=2, slide_hours=1)
        .to_pandas()
        .sort_values("window_start_us")
        .reset_index(drop=True)
    )
    # one event at 1h+10s covers windows starting at 0h and 1h
    assert out.values.tolist() == [[1, 0, 1, 100], [1, HOUR, 1, 100]]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sliding_event_stats(ev, window_hours=3, slide_hours=2)


def test_props_int_stats_brute_force_and_nulls(ray_session):
    import json
    import pyarrow as pa
    import ray.data as rd

    from intertext_ray.ops.events import props_int_stats

    rows = []
    for i in range(500):
        et = f"type{i % 3}"
        props = json.dumps({"k": (i * 7) % 100 - 50}) if i % 10 else "{}"
        rows.append((et, props))
    tbl = pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "props": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    got = {
        r["event_type"]: (r["n_events"], r["sum_k"], r["min_k"], r["max_k"])
        for r in props_int_stats(rd.from_arrow(tbl).repartition(7)).take_all()
    }
    want = {}
    for et, props in rows:
        d = json.loads(props)
        if "k" not in d:
            continue  # null-key rows drop out on both sides
        n, s, lo, hi = want.get(et, (0, 0, 10**9, -(10**9)))
        want[et] = (n + 1, s + d["k"], min(lo, d["k"]), max(hi, d["k"]))
    assert got == want


def test_props_int_stats_non_flat_json_matches_duckdb(ray_session):
    """The regex fast path must not diverge from the twin's json_extract
    semantics on non-flat JSON: nested objects, key text inside string
    values, quoted numerics, floats, spaced colons (ADVICE r2)."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from intertext_ray.ops.events import props_int_stats

    props = [
        '{"k": 5}',                      # flat int — kept
        '{"x": {"k": 3}}',               # nested — regex matches, must drop
        '{"a": "\\"k\\": 7"}',           # key inside a string value — drop
        '{"k": "12"}',                   # quoted numeric — drop (not BIGINT)
        '{"k": 3.5}',                    # float — drop (regex would say 3)
        '{"k": 3.0}',                    # integral float — still DOUBLE: drop
        '{"k" : -9}',                    # spaced colon — kept
        '{"k": 1e2}',                    # exponent float — drop
        '{"kk": 11}',                    # different key — drop
        '{"k": -4, "x": [1, 2]}',        # array elsewhere, top-level int — kept
        '{"x": [{"k": 8}]}',             # key inside array object — drop
        '{"k": true}',                   # boolean — drop
        "not json at all",               # unparsable — drop
        '{"k": 5, "note": "says \\"k\\": 99 here"}',  # int + decoy string — kept as 5
    ]
    tbl = pa.table(
        {
            "event_type": pa.array(["t"] * len(props), pa.string()),
            "props": pa.array(props, pa.string()),
        }
    )
    got = props_int_stats(rd.from_arrow(tbl).repartition(3)).take_all()
    con = duckdb.connect()
    con.register("events", tbl)
    want = con.execute(
        """
        WITH x AS (
          SELECT event_type,
                 CAST(json_extract(props, '$.k') AS BIGINT) AS k
          FROM events
          WHERE json_valid(props)
            AND json_type(props, '$.k') IN ('BIGINT','UBIGINT')
        )
        SELECT event_type, CAST(count(*) AS BIGINT) n_events,
               CAST(sum(k) AS BIGINT) sum_k, CAST(min(k) AS BIGINT) min_k,
               CAST(max(k) AS BIGINT) max_k
        FROM x GROUP BY event_type
        """
    ).fetchall()
    con.close()
    assert len(got) == 1 and len(want) == 1
    g = got[0]
    assert (
        g["event_type"], g["n_events"], g["sum_k"], g["min_k"], g["max_k"]
    ) == want[0]
    # kept rows: 5, -9, -4, 5 → n=4, sum=-3, min=-9, max=5
    assert want[0] == ("t", 4, -3, -9, 5)
