"""Event-stream operators over the ``events`` table (ts-ordered telemetry):
tumbling-window aggregates, gap-based sessionization, and an as-of join —
the three "operators Ray Data lacks" expressed as compositions of
``map_batches`` (partial aggregation / vectorized kernels) + one bucketed
``groupby`` each, per the engine-wide pattern.

Scale posture:

- ``windowed_event_stats`` pre-aggregates INSIDE each batch (combiner)
  before the global groupby, so the shuffle carries one row per
  (user, window) per batch — not per event.
- ``sessionize`` / ``asof_join_events`` co-locate each user's events with a
  hash bucket shuffle, then run one vectorized lexsort + boundary scan per
  bucket — no per-user ``map_groups``, no Python loop over rows.  The
  partitioning assumption: one USER's events fit a worker heap (same
  contract as any keyed window operator); hot users would need a
  user+day compound key.

Values are integer cents (``round(value*100)``) so sums are exact integers
— the DuckDB twins in ``__ray_entry__.oracle_sql`` hash-match bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.functions.hashing import splitmix64

_US_PER_HOUR = np.int64(3_600_000_000)


def _ts_us(batch: pa.Table, col: str = "ts") -> np.ndarray:
    """timestamp[us] column -> int64 epoch microseconds."""
    import pyarrow.compute as pc

    return pc.cast(batch[col], pa.int64()).to_numpy(zero_copy_only=False)


def _cents(batch: pa.Table, col: str = "value") -> np.ndarray:
    # floor(x*100 + 0.5), NOT np.round (banker's) — floor+0.5 is the same
    # IEEE expression DuckDB's twin uses, so sums hash-match exactly
    v = batch[col].to_numpy(zero_copy_only=False)
    return np.floor(v * 100.0 + 0.5).astype(np.int64)


def windowed_event_stats(
    events: ray.data.Dataset, window_hours: int = 1
) -> ray.data.Dataset:
    """Tumbling-window aggregate: per (user_id, window_start) -> event count
    and exact integer-cents sum.  Partial aggregation inside every batch,
    then ONE small groupby over the partials (keys ≪ events)."""
    from ray.data.aggregate import Sum

    w_us = np.int64(window_hours) * _US_PER_HOUR

    def partial(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch)
        users = batch["user_id"].to_numpy(zero_copy_only=False)
        cents = _cents(batch)
        win = (ts // w_us) * w_us
        order = np.lexsort((win, users))
        u, w, c = users[order], win[order], cents[order]
        first = np.ones(len(u), dtype=bool)
        if len(u) > 1:
            first[1:] = (u[1:] != u[:-1]) | (w[1:] != w[:-1])
        seg = np.cumsum(first) - 1
        n = np.bincount(seg)
        s = np.bincount(seg, weights=c.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(u[first], pa.int64()),
                "window_start_us": pa.array(w[first], pa.int64()),
                "n_events": pa.array(n, pa.int64()),
                "sum_cents": pa.array(s, pa.int64()),
            }
        )

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "window_start_us"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_cents", alias_name="sum_cents"),
        )
    )


def _add_user_bucket(num_buckets: int):
    nb = np.uint64(num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        # drop parquet/pandas schema metadata: the shuffle's reduce stage
        # hashes schemas for dedup and a metadata dict breaks that (warning
        # noise), and the metadata is dead weight in the exchange
        t = t.replace_schema_metadata(None)
        return t.append_column(
            "bucket", pa.array((splitmix64(u) % nb).astype(np.int64))
        )

    return add_bucket


def sessionize(
    events: ray.data.Dataset,
    gap_minutes: int = 30,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Session windows: a user's events belong to one session until a gap
    > ``gap_minutes`` opens a new one.  Output one row per session:
    (user_id, session_idx, n_events, first_ts_us, last_ts_us, sum_cents);
    ``session_idx`` counts that user's sessions in time order from 0.

    One hash-bucket shuffle on user_id, then a single vectorized
    (user, ts, event_id) lexsort + boundary cumsum per bucket — the classic
    gaps-and-islands computation with no per-user Python."""
    gap_us = np.int64(gap_minutes) * np.int64(60_000_000)

    def per_bucket(g: pa.Table) -> pa.Table:
        ts = _ts_us(g)
        users = g["user_id"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        cents = _cents(g)
        order = np.lexsort((eid, ts, users))
        u, t, c = users[order], ts[order], cents[order]
        n = len(u)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "session_idx": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "first_ts_us": pa.array([], pa.int64()),
                    "last_ts_us": pa.array([], pa.int64()),
                    "sum_cents": pa.array([], pa.int64()),
                }
            )
        new_sess = np.ones(n, dtype=bool)
        if n > 1:
            same_user = u[1:] == u[:-1]
            new_sess[1:] = ~same_user | ((t[1:] - t[:-1]) > gap_us)
        sid = np.cumsum(new_sess) - 1  # global segment id within bucket
        n_ev = np.bincount(sid)
        first_ts = t[new_sess]
        # last ts of each segment = value before each next boundary
        seg_ends = np.concatenate([np.nonzero(new_sess)[0][1:] - 1, [n - 1]])
        last_ts = t[seg_ends]
        s_cents = np.bincount(sid, weights=c.astype(np.float64)).astype(np.int64)
        sess_user = u[new_sess]
        # per-user session index in time order (sessions are emitted in
        # (user, time) order by construction)
        first_of_user = np.ones(len(sess_user), dtype=bool)
        if len(sess_user) > 1:
            first_of_user[1:] = sess_user[1:] != sess_user[:-1]
        run = np.arange(len(sess_user))
        run_start = np.maximum.accumulate(np.where(first_of_user, run, 0))
        sess_idx = run - run_start
        return pa.table(
            {
                "user_id": pa.array(sess_user.astype(np.int64), pa.int64()),
                "session_idx": pa.array(sess_idx, pa.int64()),
                "n_events": pa.array(n_ev, pa.int64()),
                "first_ts_us": pa.array(first_ts, pa.int64()),
                "last_ts_us": pa.array(last_ts, pa.int64()),
                "sum_cents": pa.array(s_cents, pa.int64()),
            }
        )

    return (
        events.map_batches(_add_user_bucket(num_buckets), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def asof_join_events(
    events: ray.data.Dataset,
    left_type: str = "click",
    right_type: str = "view",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """As-of join within the event stream: each ``left_type`` event is
    matched to the LATEST ``right_type`` event of the same user at or
    before its timestamp (ties: the largest event_id — deterministic).
    Output (event_id, user_id, ts_us, matched_event_id, matched_ts_us);
    unmatched left rows get -1.

    Same bucket co-location as :func:`sessionize`; the per-bucket kernel is
    one lexsort + ``np.searchsorted`` per user segment boundary — no
    row-wise Python.  DuckDB twin: ``ASOF JOIN``."""
    import pyarrow.compute as pc

    def per_bucket(g: pa.Table) -> pa.Table:
        types = g["event_type"]
        lmask = pc.equal(types, pa.scalar(left_type)).to_numpy(zero_copy_only=False)
        rmask = pc.equal(types, pa.scalar(right_type)).to_numpy(zero_copy_only=False)
        ts = _ts_us(g)
        users = g["user_id"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)

        lt, lu, le = ts[lmask], users[lmask], eid[lmask]
        rt, ru, re_ = ts[rmask], users[rmask], eid[rmask]
        nl, nr = len(lt), len(rt)
        # vectorized merge: one stream sorted by (user, ts, side, event_id)
        # with right rows BEFORE left rows at equal ts (ties qualify), then
        # a forward-fill of the last right position, reset at user runs
        side = np.concatenate([np.zeros(nr, np.int8), np.ones(nl, np.int8)])
        u_all = np.concatenate([ru, lu])
        t_all = np.concatenate([rt, lt])
        e_all = np.concatenate([re_, le])
        order = np.lexsort((e_all, side, t_all, u_all))
        u_s, t_s, e_s, sd = u_all[order], t_all[order], e_all[order], side[order]
        n = nl + nr
        pos = np.arange(n, dtype=np.int64)
        last_r = np.maximum.accumulate(np.where(sd == 0, pos, -1))
        ustart = np.zeros(n, dtype=np.int64)
        if n > 1:
            ustart[1:] = np.where(u_s[1:] != u_s[:-1], pos[1:], 0)
        ustart = np.maximum.accumulate(ustart)
        valid = (last_r >= ustart) & (last_r >= 0)
        is_l = sd == 1
        m = np.where(valid[is_l], e_s[np.clip(last_r[is_l], 0, None)], -1)
        mt = np.where(valid[is_l], t_s[np.clip(last_r[is_l], 0, None)], -1)
        out = pa.table(
            {
                "event_id": pa.array(e_s[is_l].astype(np.int64), pa.int64()),
                "user_id": pa.array(u_s[is_l].astype(np.int64), pa.int64()),
                "ts_us": pa.array(t_s[is_l], pa.int64()),
                "matched_event_id": pa.array(m.astype(np.int64), pa.int64()),
                "matched_ts_us": pa.array(mt.astype(np.int64), pa.int64()),
            }
        )
        return out

    return (
        events.map_batches(_add_user_bucket(num_buckets), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def range_join_events(
    events: ray.data.Dataset,
    intervals: ray.data.Dataset,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Range (interval) join: each event is matched to the interval of the
    same ``user_id`` whose ``[start_us, end_us]`` contains its timestamp.
    ``intervals``: Dataset(user_id, interval_id, start_us, end_us) with
    non-overlapping intervals per user (the semantics contract — e.g. the
    output of :func:`sessionize`).  Output one row per event:
    (event_id, user_id, ts_us, interval_id) with -1 for no containing
    interval.

    Same user-hash co-location as the other keyed window ops; the kernel
    unions interval-start rows with event rows, sorts once by
    (user, ts, side) and forward-fills the active interval — O(n log n)
    per bucket, no per-row Python."""
    import pyarrow.compute as pc

    def tag_events(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        ts = _ts_us(t)
        return pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "ts_us": pa.array(ts, pa.int64()),
                "eid": pc.cast(t["event_id"], pa.int64()),
                "iid": pa.array(np.full(len(t), -1, np.int64), pa.int64()),
                "end_us": pa.array(np.full(len(t), -1, np.int64), pa.int64()),
                "side": pa.array(np.ones(len(t), np.int8), pa.int8()),
            }
        )

    def tag_intervals(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        return pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "ts_us": pc.cast(t["start_us"], pa.int64()),
                "eid": pa.array(np.full(len(t), -1, np.int64), pa.int64()),
                "iid": pc.cast(t["interval_id"], pa.int64()),
                "end_us": pc.cast(t["end_us"], pa.int64()),
                "side": pa.array(np.zeros(len(t), np.int8), pa.int8()),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        eid = g["eid"].to_numpy(zero_copy_only=False)
        iid = g["iid"].to_numpy(zero_copy_only=False)
        end = g["end_us"].to_numpy(zero_copy_only=False)
        sd = g["side"].to_numpy(zero_copy_only=False)
        # interval-start rows before events at equal ts (containment is
        # inclusive on both ends)
        order = np.lexsort((sd, ts, u))
        u, ts, eid, iid, end, sd = (
            u[order], ts[order], eid[order], iid[order], end[order], sd[order]
        )
        n = len(u)
        pos = np.arange(n, dtype=np.int64)
        last_iv = np.maximum.accumulate(np.where(sd == 0, pos, -1))
        ustart = np.zeros(n, dtype=np.int64)
        if n > 1:
            ustart[1:] = np.where(u[1:] != u[:-1], pos[1:], 0)
        ustart = np.maximum.accumulate(ustart)
        ok = (last_iv >= ustart) & (last_iv >= 0)
        is_ev = sd == 1
        src = np.clip(last_iv[is_ev], 0, None)
        inside = ok[is_ev] & (ts[is_ev] <= end[src])
        out_iid = np.where(inside, iid[src], -1)
        return pa.table(
            {
                "event_id": pa.array(eid[is_ev], pa.int64()),
                "user_id": pa.array(u[is_ev], pa.int64()),
                "ts_us": pa.array(ts[is_ev], pa.int64()),
                "interval_id": pa.array(out_iid.astype(np.int64), pa.int64()),
            }
        )

    tagged = events.map_batches(tag_events, batch_format="pyarrow").union(
        intervals.map_batches(tag_intervals, batch_format="pyarrow")
    )
    return (
        tagged.map_batches(_add_user_bucket(num_buckets), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def sliding_event_stats(
    events: ray.data.Dataset,
    window_hours: int = 2,
    slide_hours: int = 1,
) -> ray.data.Dataset:
    """Sliding-window aggregate: windows of ``window_hours`` starting every
    ``slide_hours`` (window must be a multiple of slide); each event lands
    in window/slide consecutive windows.  Same combiner shape as
    :func:`windowed_event_stats` — the replication factor rides INSIDE the
    batch-local partial aggregation, so the shuffle still carries one row
    per (user, window) per batch."""
    from ray.data.aggregate import Sum

    if window_hours % slide_hours:
        raise ValueError("window_hours must be a multiple of slide_hours")
    nw = window_hours // slide_hours
    s_us = np.int64(slide_hours) * _US_PER_HOUR

    def partial(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch)
        users = batch["user_id"].to_numpy(zero_copy_only=False)
        cents = _cents(batch)
        base = (ts // s_us) * s_us
        # event at t covers window starts base, base-s, ..., base-(nw-1)s
        offs = (np.arange(nw, dtype=np.int64) * s_us)[:, None]
        win = (base[None, :] - offs).reshape(-1)
        u = np.tile(users, nw)
        c = np.tile(cents, nw)
        order = np.lexsort((win, u))
        u, w, c = u[order], win[order], c[order]
        first = np.ones(len(u), dtype=bool)
        if len(u) > 1:
            first[1:] = (u[1:] != u[:-1]) | (w[1:] != w[:-1])
        seg = np.cumsum(first) - 1
        n = np.bincount(seg)
        s = np.bincount(seg, weights=c.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(u[first].astype(np.int64), pa.int64()),
                "window_start_us": pa.array(w[first], pa.int64()),
                "n_events": pa.array(n, pa.int64()),
                "sum_cents": pa.array(s, pa.int64()),
            }
        )

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "window_start_us"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_cents", alias_name="sum_cents"),
        )
    )


def props_int_stats(
    events: ray.data.Dataset,
    key: str = "k",
    props_col: str = "props",
    group_col: str = "event_type",
) -> ray.data.Dataset:
    """Semi-structured extraction + aggregate: pull an integer field out of
    the JSON ``props`` column and report per-``group_col`` (n_events,
    sum_k, min_k, max_k).

    Contract: the extracted field is a TOP-LEVEL integer-typed JSON value
    (the twin guards with ``json_type(props,'$.key') IN ('BIGINT',
    'UBIGINT')``).  Extraction is ``pc.extract_regex`` over the Arrow
    string column — the vectorized fast path — but the regex alone can
    match inside nested objects or string values and can truncate floats,
    so rows where that is POSSIBLE (any escape ``\\``, any nesting, or a
    quoted/float value after the key) are detected vectorized and re-parsed
    with ``json.loads``; only those pay the Python parse.  A key embedded
    in a JSON string value necessarily carries a ``\\"`` escape, so the
    backslash check catches that case.  Rows without a top-level integer
    value drop out on BOTH sides.  Same combiner shape as
    :func:`windowed_event_stats`: per-batch partials, then one groupby
    over ``group_col`` keys (≪ events)."""
    import json

    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    pattern = f'"{key}"\\s*:\\s*(?P<v>-?\\d+)'
    # a regex hit on one of these shapes may not be a top-level integer:
    #   \\            escapes => key text could live inside a string value
    #   {...{ or [    nested containers => key could be non-top-level
    #   "key": " / digits followed by . e E  => quoted or float value
    suspect_pat = (
        '\\\\|\\[|\\{[^{]*\\{'
        f'|"{key}"\\s*:\\s*("|-?\\d+[.eE])'
    )

    def _exact(raw: str) -> int | None:
        try:
            val = json.loads(raw).get(key)
        except Exception:
            return None
        if isinstance(val, bool) or not isinstance(val, int):
            return None
        return val

    def partial(batch: pa.Table) -> pa.Table:
        props = batch[props_col]
        if isinstance(props, pa.ChunkedArray):
            props = props.combine_chunks()
        ext = pc.extract_regex(props, pattern)
        v = pc.cast(pc.struct_field(ext, "v"), pa.int64())
        ok = pc.is_valid(v).to_numpy(zero_copy_only=False)
        suspect = pc.match_substring_regex(props, suspect_pat).to_numpy(
            zero_copy_only=False
        )
        if suspect.any():
            vals_np = v.to_numpy(zero_copy_only=False).copy()
            for i in np.nonzero(suspect)[0]:
                exact = _exact(props[i].as_py())
                ok[i] = exact is not None
                if exact is not None:
                    vals_np[i] = exact
            v = pa.array(
                np.where(ok, vals_np, 0), pa.int64(), mask=~ok
            )
        if not ok.any():
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "n_events": pa.array([], pa.int64()),
                    "sum_k": pa.array([], pa.int64()),
                    "min_k": pa.array([], pa.int64()),
                    "max_k": pa.array([], pa.int64()),
                }
            )
        grp = batch[group_col]
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        enc = grp.filter(pa.array(ok)).dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = v.to_numpy(zero_copy_only=False)[ok]
        order = np.argsort(codes, kind="stable")
        codes, vals = codes[order], vals[order]
        first = np.ones(len(codes), dtype=bool)
        if len(codes) > 1:
            first[1:] = codes[1:] != codes[:-1]
        starts = np.nonzero(first)[0]
        seg = np.cumsum(first) - 1
        return pa.table(
            {
                group_col: enc.dictionary.take(pa.array(codes[starts])),
                "n_events": pa.array(np.bincount(seg), pa.int64()),
                "sum_k": pa.array(
                    np.bincount(seg, weights=vals.astype(np.float64)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
                "min_k": pa.array(
                    np.minimum.reduceat(vals, starts), pa.int64()
                ),
                "max_k": pa.array(
                    np.maximum.reduceat(vals, starts), pa.int64()
                ),
            }
        )

    return (
        events.select_columns([group_col, props_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_k", alias_name="sum_k"),
            Min("min_k", alias_name="min_k"),
            Max("max_k", alias_name="max_k"),
        )
    )
