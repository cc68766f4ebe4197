"""Audio-fingerprint near-dup family: kernel properties, chain vs the
single-process brute-force oracle, and recall on planted clusters."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from intertext_ray.fixtures.gen_audio import (
    base_signal,
    gen_audio_dup_corpus,
)
from intertext_ray.functions.audio import decode_clip, encode_clip
from intertext_ray.functions.audio_fp import (
    HOP,
    TARGET_SR,
    ber_at_offset,
    bruteforce_dup_pairs,
    shingle_keys,
    subfingerprints,
)
from intertext_ray.ops.audio_dedup import (
    audio_candidates,
    audio_dup_clusters,
    audio_dup_pairs,
    audio_fingerprints,
)


def _pcm(sig):
    return np.clip(sig * 8192.0, -32768, 32767).astype(np.int16)


def test_subfingerprints_deterministic_shape():
    sig = base_signal(1, 0, 16000, 16000)
    f1 = subfingerprints(_pcm(sig), 16000)
    f2 = subfingerprints(_pcm(sig), 16000)
    assert np.array_equal(f1, f2)
    # 1s @ 16k -> 8000 samples @ 8k -> 1+(8000-512)//256 = 30 frames -> 29 fps
    assert len(f1) == 30 - 1
    assert f1.dtype == np.uint32
    assert (f1 < (1 << 16)).all()


def test_ber_low_for_perturbed_high_for_unrelated():
    rng = np.random.default_rng(3)
    sig = base_signal(1, 5, 22050, 33075)  # 1.5 s
    fa = subfingerprints(_pcm(sig), 22050)
    # perturb: gain + noise + ulaw round-trip at a different sample rate path
    pert = sig * 1.06 + rng.normal(0, 0.004, len(sig))
    blob = encode_clip(_pcm(pert), 22050, "ulaw")
    fb = subfingerprints(decode_clip(blob, 22050, "ulaw"), 22050)
    ov, ber = ber_at_offset(fa, fb, 0)
    assert ov >= 30
    assert ber < 0.15
    other = base_signal(1, 6, 22050, 33075)
    fc = subfingerprints(_pcm(other), 22050)
    _, ber2 = ber_at_offset(fa, fc, 0)
    assert ber2 > 0.35


def test_ber_alignment_at_shift():
    sig = base_signal(2, 9, 8000, 12000)
    fa = subfingerprints(_pcm(sig), 8000)
    shift = 3 * HOP
    shifted = np.concatenate([np.zeros(shift), sig])[: len(sig)]
    fb = subfingerprints(_pcm(shifted), 8000)
    # b is a delayed by 3 hops: b's frame i ~ a's frame i-3 -> offset a-b=-3
    ov, ber = ber_at_offset(fa, fb, -3)
    assert ov >= 20 and ber < 0.2
    _, ber0 = ber_at_offset(fa, fb, 0)
    assert ber0 > ber


def test_shingle_keys_pack():
    f = np.array([1, 2, 3], dtype=np.uint32)
    k = shingle_keys(f, 2)
    assert list(k) == [1 | (2 << 16), 2 | (3 << 16)]
    assert len(shingle_keys(f, 4)) == 0


def test_fingerprints_stage_and_cross_sr():
    clips, truth = gen_audio_dup_corpus(24, seed=11)
    ds = ray.data.from_arrow(clips)
    fp = audio_fingerprints(ds).to_pandas()
    assert len(fp) == 24
    assert (fp["n_frames"] > 0).all()


def test_chain_matches_bruteforce_and_truth():
    clips, truth = gen_audio_dup_corpus(60, seed=5)
    ds = ray.data.from_arrow(clips)

    pairs = audio_dup_pairs(ds, num_buckets=8).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs.clip_a, pairs.clip_b)}

    # single-process oracle over the same decoded fingerprints
    fps = {}
    for i in range(len(clips)):
        pcm = decode_clip(
            clips["bytes"][i].as_py(),
            clips["sr_hz"][i].as_py(),
            clips["codec"][i].as_py(),
        )
        fps[i] = subfingerprints(pcm, clips["sr_hz"][i].as_py())
    want = bruteforce_dup_pairs(fps)

    # engine precision: every emitted pair passes the oracle's criterion
    assert got <= set(want)
    cl = truth["cluster_id"].to_numpy()
    planted = {
        (i, j)
        for i in range(len(cl))
        for j in range(i + 1, len(cl))
        if cl[i] >= 0 and cl[i] == cl[j]
    }
    # direct pair recall inside the documented envelope (aligned BER<=0.15);
    # the 0.15-0.25 tail is recovered transitively below
    easy = {p for p in planted if want[p][1] <= 0.15}
    assert easy <= got
    # offsets of found planted pairs land near the planted shifts
    # (offset = shift_a - shift_b; periodic content can tie +-couple hops)
    off_truth = truth["offset_frames"].to_numpy()
    by_pair = {
        (int(a), int(b)): int(o)
        for a, b, o in zip(pairs.clip_a, pairs.clip_b, pairs.offset)
    }
    for (i, j) in planted & got:
        want_off = int(off_truth[i] - off_truth[j])
        assert abs(by_pair[(i, j)] - want_off) <= 3

    # cluster-level recall: every planted cluster fully connected
    clusters = audio_dup_clusters(
        ray.data.from_arrow(
            pa.table(
                {
                    "clip_a": pa.array(
                        [a for a, _ in sorted(got)], pa.uint64()
                    ),
                    "clip_b": pa.array(
                        [b for _, b in sorted(got)], pa.uint64()
                    ),
                }
            )
        )
    ).to_pandas()
    lab = {int(r.clip_id): int(r.audio_cluster_id) for r in clusters.itertuples()}
    for (i, j) in planted:
        assert lab[i] == lab[j]


def test_audio_stats_pins_direct_computation():
    from intertext_ray.ops.audio_stats import audio_stats, clip_stats

    clips, _ = gen_audio_dup_corpus(16, seed=21)
    out = audio_stats(ray.data.from_arrow(clips)).to_pandas()
    out = out.sort_values("clip_id", ignore_index=True)
    assert out.decode_ok.all()
    for i in range(len(clips)):
        pcm = decode_clip(
            clips["bytes"][i].as_py(),
            clips["sr_hz"][i].as_py(),
            clips["codec"][i].as_py(),
        )
        want = clip_stats(pcm, clips["sr_hz"][i].as_py())
        row = out[out.clip_id == clips["clip_id"][i].as_py()].iloc[0]
        assert row.n_samples == want["n_samples"]
        assert abs(row.rms_dbfs - want["rms_dbfs"]) < 1e-9
        assert abs(row.silence_frac - want["silence_frac"]) < 1e-9
        assert abs(row.zcr_per_sec - want["zcr_per_sec"]) < 1e-9


def test_candidates_capped_bucket_path():
    clips, _ = gen_audio_dup_corpus(30, seed=13)
    fps = audio_fingerprints(ray.data.from_arrow(clips))
    cands = audio_candidates(fps, g=1, cap=256, num_buckets=4).to_pandas()
    assert (cands.clip_a < cands.clip_b).all()
    assert not cands.duplicated(["clip_a", "clip_b", "offset"]).any()


def test_joint_dup_classification_matches_truth():
    from intertext_ray.fixtures.gen_audio import gen_joint_corpus
    from intertext_ray.ops.joint_dedup import joint_dup_report

    clips, truth = gen_joint_corpus(80, seed=19)
    out = joint_dup_report(
        ray.data.from_arrow(clips), num_buckets=8
    ).to_pandas()
    t = truth.to_pandas()
    t["doc_id"] = [int(c.split("_")[1]) for c in t.clip_id]
    want = {}
    for r in t.itertuples():
        if r.text_cluster >= 0 and r.audio_cluster >= 0:
            c = "both"
        elif r.text_cluster >= 0:
            c = "text_only"
        elif r.audio_cluster >= 0:
            c = "audio_only"
        else:
            c = "unique"
        want[r.doc_id] = (c, r.text_cluster, r.audio_cluster)
    assert len(out) == len(t)
    for r in out.itertuples():
        wc, wt, wa = want[int(r.doc_id)]
        assert r.dup_class == wc, (r.doc_id, r.dup_class, wc)
        # cluster ids are min-member labels == planted leader indices
        assert int(r.text_cluster_id) == wt
        assert int(r.audio_cluster_id) == wa


def test_audio_dup_pairs_checkpoint_resume(tmp_path):
    clips, _ = gen_audio_dup_corpus(40, seed=5)
    ds = ray.data.from_arrow(clips)
    wd = str(tmp_path / "audio_ckpt")
    p1 = audio_dup_pairs(ds, num_buckets=8, work_dir=wd).to_pandas()
    assert (tmp_path / "audio_ckpt" / "audio_fps").exists()
    assert (tmp_path / "audio_ckpt" / "audio_dup_pairs").exists()

    # resume: a poisoned clips dataset proves nothing recomputes
    def boom(b):
        raise RuntimeError("resume must not touch the input")

    poisoned = ds.map_batches(boom)
    p2 = audio_dup_pairs(poisoned, num_buckets=8, work_dir=wd).to_pandas()
    key = ["clip_a", "clip_b", "offset"]
    assert sorted(map(tuple, p1[key].values.tolist())) == sorted(
        map(tuple, p2[key].values.tolist())
    )

    # changed semantic knob recomputes (different config hash, fresh run)
    p3 = audio_dup_pairs(
        ds, num_buckets=8, work_dir=wd, max_ber=0.1
    ).to_pandas()
    assert len(p3) <= len(p1)


def test_containment_short_clip_inside_longer_recording():
    """A 1.2s excerpt cut out of a 3s recording is found when the desync
    bound is lifted (max_offset=None), with the offset recovering the cut
    position — the containment-detection mode of SCALING.md."""
    sr = 16000
    long_sig = base_signal(4, 100, sr, 3 * sr)
    cut = 40 * HOP * (sr // TARGET_SR)  # 40 hops into the recording
    short_sig = long_sig[cut : cut + int(1.2 * sr)]
    clips = pa.table(
        {
            "clip_id": pa.array(["clip_0", "clip_1"]),
            "bytes": pa.array(
                [
                    encode_clip(_pcm(long_sig), sr, "wav"),
                    encode_clip(_pcm(short_sig), sr, "ulaw"),
                ],
                pa.binary(),
            ),
            "sr_hz": pa.array([sr, sr], pa.int32()),
            "dur_ms": pa.array([3000, 1200], pa.int32()),
            "codec": pa.array(["wav", "ulaw"]),
            "transcript": pa.array(["", ""]),
        }
    )
    ds = ray.data.from_arrow(clips)
    # bounded desync misses the pair...
    bounded = audio_dup_pairs(ds, num_buckets=2, max_offset=8).to_pandas()
    assert len(bounded) == 0
    # ...unbounded finds it at the cut offset
    pairs = audio_dup_pairs(ds, num_buckets=2, max_offset=None).to_pandas()
    assert len(pairs) == 1
    assert int(pairs.offset.iloc[0]) == 40
    assert float(pairs.ber.iloc[0]) < 0.1


def test_audio_pcm_stats_integer_exact():
    """audio_pcm_stats matches a direct per-clip scalar computation exactly
    (every output is an integer — this op exists so the SQL twin can
    re-decode the payload and hash-compare with zero float tolerance)."""
    import numpy as np

    from intertext_ray.ops.audio_stats import audio_pcm_stats

    clips, _ = gen_audio_dup_corpus(24, seed=33)
    out = (
        audio_pcm_stats(ray.data.from_arrow(clips))
        .to_pandas()
        .set_index("clip_id")
    )
    n_checked = 0
    for i in range(len(clips)):
        codec = clips["codec"][i].as_py()
        if codec not in ("pcm_s16le", "wav", "ulaw", "alaw"):
            assert clips["clip_id"][i].as_py() not in out.index
            continue
        pcm = decode_clip(
            clips["bytes"][i].as_py(), clips["sr_hz"][i].as_py(), codec
        )
        s = pcm.astype(np.int64)
        row = out.loc[clips["clip_id"][i].as_py()]
        assert row.n_samples == len(s)
        assert row.energy == int(np.sum(s * s))
        assert row.peak_abs == int(np.max(np.abs(s)))
        assert row.n_zero_cross == int(np.sum(s[:-1] * s[1:] < 0))
        assert row.n_clipped == int(np.sum((pcm == 32767) | (pcm == -32768)))
        n_checked += 1
    assert n_checked >= 12


def test_audio_query_search_containment():
    """Query-by-example: a gain-changed, hop-aligned snippet of a corpus
    clip is found in that clip (and only within its dup cluster) at the
    right frame offset; a foreign signal gets zero hits."""
    from intertext_ray.fixtures.gen_audio import base_signal
    from intertext_ray.functions.audio_fp import HOP, TARGET_SR
    from intertext_ray.ops.audio_search import audio_query_search

    clips, truth = gen_audio_dup_corpus(30, seed=11)
    cluster = dict(
        zip(truth["clip_id"].to_pylist(), truth["cluster_id"].to_pylist())
    )

    # pick two clips at hop-friendly sample rates
    q_rows = []
    expected = {}
    qid = 0
    for i in range(len(clips)):
        sr = clips["sr_hz"][i].as_py()
        if sr % TARGET_SR != 0 or len(q_rows) >= 2:
            continue
        pcm = decode_clip(clips["bytes"][i].as_py(), sr, clips["codec"][i].as_py())
        hop_native = HOP * (sr // TARGET_SR)
        start_frames = 6
        n_frames_q = 20
        s0 = start_frames * hop_native
        s1 = s0 + (n_frames_q + 2) * hop_native
        if s1 > len(pcm):
            continue
        snip = np.clip(
            (pcm[s0:s1].astype(np.float64) * 1.05), -32768, 32767
        ).astype(np.int16)
        q_rows.append(
            {
                "query_id": qid,
                "bytes": snip.tobytes(),
                "sr_hz": sr,
                "codec": "pcm_s16le",
            }
        )
        expected[qid] = (i, start_frames)
        qid += 1
    assert len(q_rows) == 2

    # foreign signal: not contained anywhere
    foreign = (base_signal(999, 123, 8000, 8000) * 32000).astype(np.int16)
    q_rows.append(
        {
            "query_id": 99,
            "bytes": foreign.tobytes(),
            "sr_hz": 8000,
            "codec": "pcm_s16le",
        }
    )

    queries = pa.Table.from_pylist(q_rows)
    hits = audio_query_search(
        ray.data.from_arrow(clips), queries, max_ber=0.25
    ).to_pandas()

    assert (hits["query_id"] != 99).all()
    for q, (src_idx, start_frames) in expected.items():
        h = hits[hits.query_id == q]
        src_cid = clips["clip_id"][src_idx].as_py()
        assert src_cid in set(h.clip_id), f"query {q} missed its source"
        # self-hit aligns at the slice offset and is near-exact
        self_row = h[h.clip_id == src_cid].iloc[0]
        assert abs(self_row.offset - start_frames) <= 2
        assert self_row.ber <= 0.12
        # every other hit is a planted dup of the source
        for cid in h.clip_id:
            assert cluster[cid] == cluster[src_cid]


def test_audio_common_spans_partial_overlap():
    """Two unrelated clips sharing only a spliced-in segment are linked
    by a span at the planted frame positions; an unrelated clip yields
    nothing; identical clips yield a near-full-length span."""
    from intertext_ray.fixtures.gen_audio import base_signal
    from intertext_ray.functions.audio_fp import HOP
    from intertext_ray.ops.audio_spans import audio_common_spans
    from intertext_ray.sources.clips import doc_ids_for_clip_ids

    sr = 8000
    n = sr * 4  # 4 s clips
    seg = base_signal(77, 1000, sr, sr * 16 // 10)  # 1.6 s shared bed
    sigs = {
        "c0": base_signal(77, 0, sr, n),
        "c1": base_signal(77, 1, sr, n),
        "c2": base_signal(77, 2, sr, n),
    }
    # splice the shared segment at hop-aligned positions: frame 20 in c0,
    # frame 60 in c1
    pa_f, pb_f = 20, 60
    sigs["c0"][pa_f * HOP : pa_f * HOP + len(seg)] = seg
    sigs["c1"][pb_f * HOP : pb_f * HOP + len(seg)] = seg
    pcm = {
        k: np.clip(v * 32000, -32768, 32767).astype(np.int16)
        for k, v in sigs.items()
    }
    pcm["c3"] = pcm["c2"].copy()  # identical pair control

    tbl = pa.table(
        {
            "clip_id": list(pcm),
            "bytes": [p.tobytes() for p in pcm.values()],
            "sr_hz": [sr] * len(pcm),
            "codec": ["pcm_s16le"] * len(pcm),
        }
    )
    doc_of = dict(
        zip(pcm, (int(d) for d in doc_ids_for_clip_ids(tbl["clip_id"])))
    )
    spans = audio_common_spans(
        ray.data.from_arrow(tbl), max_ber=0.2, min_len=12
    ).to_pandas()

    seg_frames = len(seg) // HOP  # ~50

    def pairs_of(df):
        return {tuple(sorted((int(a), int(b)))) for a, b in zip(df.clip_a, df.clip_b)}

    got_pairs = pairs_of(spans)
    key01 = tuple(sorted((doc_of["c0"], doc_of["c1"])))
    key23 = tuple(sorted((doc_of["c2"], doc_of["c3"])))
    assert key01 in got_pairs
    assert key23 in got_pairs
    # nothing links the unrelated signal c2/c3 to c0/c1
    for cid in ("c0", "c1"):
        for other in ("c2", "c3"):
            assert tuple(sorted((doc_of[cid], doc_of[other]))) not in got_pairs

    s01 = spans[
        (spans.clip_a.isin([doc_of["c0"], doc_of["c1"]]))
        & (spans.clip_b.isin([doc_of["c0"], doc_of["c1"]]))
    ]
    # the planted span: starts within a window of the splice points,
    # length within a window of the segment length
    best = s01.loc[s01.n_frames.idxmax()]
    starts = sorted([int(best.a_start), int(best.b_start)])
    want = sorted([pa_f, pb_f])
    assert abs(starts[0] - want[0]) <= 8 and abs(starts[1] - want[1]) <= 8
    assert abs(int(best.n_frames) - seg_frames) <= 16
    assert best.ber <= 0.2

    s23 = spans[
        (spans.clip_a.isin([doc_of["c2"], doc_of["c3"]]))
        & (spans.clip_b.isin([doc_of["c2"], doc_of["c3"]]))
    ]
    n_total = len(pcm["c2"]) // HOP
    assert s23.n_frames.max() >= n_total - 16  # near-full overlap


def test_remove_audio_spans_rewrite():
    """Cutting the shared spans from the higher-id clip removes the
    planted segment (re-detection finds nothing between the pair);
    untouched clips pass through byte-identical; the cut clip loses
    ~the segment's samples."""
    from intertext_ray.fixtures.gen_audio import base_signal
    from intertext_ray.functions.audio_fp import HOP
    from intertext_ray.ops.audio_spans import (
        audio_common_spans,
        remove_audio_spans,
    )
    from intertext_ray.sources.clips import doc_ids_for_clip_ids

    sr = 8000
    n = sr * 4
    seg = base_signal(78, 1000, sr, sr * 16 // 10)
    s0 = base_signal(78, 0, sr, n)
    s1 = base_signal(78, 1, sr, n)
    s0[20 * HOP : 20 * HOP + len(seg)] = seg
    s1[60 * HOP : 60 * HOP + len(seg)] = seg
    s2 = base_signal(78, 2, sr, n)
    pcm = {
        k: np.clip(v * 32000, -32768, 32767).astype(np.int16)
        for k, v in {"r0": s0, "r1": s1, "r2": s2}.items()
    }
    tbl = pa.table(
        {
            "clip_id": list(pcm),
            "bytes": [p.tobytes() for p in pcm.values()],
            "sr_hz": [sr] * 3,
            "codec": ["pcm_s16le"] * 3,
        }
    )
    doc_of = dict(
        zip(pcm, (int(d) for d in doc_ids_for_clip_ids(tbl["clip_id"])))
    )
    spans = audio_common_spans(ray.data.from_arrow(tbl), num_buckets=8)
    cleaned = remove_audio_spans(
        ray.data.from_arrow(tbl), spans
    ).to_pandas().set_index("clip_id")

    hi = max(("r0", "r1"), key=lambda k: doc_of[k])
    lo = min(("r0", "r1"), key=lambda k: doc_of[k])
    # untouched clips byte-identical
    assert bytes(cleaned.loc[lo, "bytes"]) == pcm[lo].tobytes()
    assert bytes(cleaned.loc["r2", "bytes"]) == pcm["r2"].tobytes()
    assert cleaned.loc[lo, "n_frames_removed"] == 0
    # the cut clip lost about the segment's samples
    cut = cleaned.loc[hi]
    assert cut["n_frames_removed"] >= 40
    n_lost = len(pcm[hi]) - cut["n_samples"]
    assert abs(n_lost - len(seg)) <= 20 * HOP  # boundary slop
    # re-detection over the cleaned corpus: the pair is gone
    tbl2 = pa.table(
        {
            "clip_id": list(cleaned.index),
            "bytes": [bytes(b) for b in cleaned["bytes"]],
            "sr_hz": [sr] * 3,
            "codec": list(cleaned["codec"]),
        }
    )
    spans2 = audio_common_spans(
        ray.data.from_arrow(tbl2), num_buckets=8
    ).to_pandas()
    pair = {doc_of["r0"], doc_of["r1"]}
    if len(spans2):
        for a, b in zip(spans2["clip_a"], spans2["clip_b"]):
            assert {int(a), int(b)} != pair


def test_audio_payload_report_decode_free():
    """Byte-length-derived sample counts match real decode for every
    estimable codec; a corrupted (truncated) payload flags
    dur_consistent=False; unknown codecs report est_known=False."""
    from intertext_ray.ops.audio_stats import audio_payload_report

    clips, _ = gen_audio_dup_corpus(20, seed=13)
    # corrupt one clip: chop 20% of the payload, keep declared dur_ms
    import pyarrow as pa

    rows = clips.to_pylist()
    rows[3]["bytes"] = rows[3]["bytes"][: len(rows[3]["bytes"]) * 8 // 10]
    rows.append(
        {
            "clip_id": "clip_900",
            "bytes": b"\x00" * 100,
            "sr_hz": 8000,
            "dur_ms": 10,
            "codec": "opus",
            "transcript": "",
        }
    )
    tbl = pa.Table.from_pylist(rows)
    out = (
        audio_payload_report(ray.data.from_arrow(tbl))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    for r in rows[:20]:
        d = int(r["clip_id"].split("_")[-1])
        pcm = decode_clip(r["bytes"], r["sr_hz"], r["codec"])
        assert out.loc[d, "n_samples_est"] == len(pcm)
    bad = int(rows[3]["clip_id"].split("_")[-1])
    assert not out.loc[bad, "dur_consistent"]
    ok_rows = out.drop(index=[bad, 900])
    assert ok_rows["dur_consistent"].all()
    assert not out.loc[900, "est_known"]
    assert out.loc[900, "n_samples_est"] == -1


def test_audio_cluster_canonicals_policy(ray_session):
    """Survivor = longest member by dur_ms, tiebreak min numeric id;
    synthetic pair graph + metadata table, pandas argmax reference."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from intertext_ray.ops.audio_dedup import audio_cluster_canonicals

    # two clusters: {0,1,2} (1 is longest) and {5,6} (tie -> min id 5);
    # clip 9 is a singleton and must not appear
    pairs = rd.from_arrow(
        pa.table(
            {
                "clip_a": pa.array([0, 1, 5], pa.uint64()),
                "clip_b": pa.array([1, 2, 6], pa.uint64()),
            }
        )
    )
    clips = rd.from_arrow(
        pa.table(
            {
                "clip_id": [f"clip_{i}" for i in (0, 1, 2, 5, 6, 9)],
                "dur_ms": pa.array(
                    [1000, 5000, 3000, 700, 700, 9000], pa.int32()
                ),
            }
        )
    )
    got = (
        rd.from_arrow(audio_cluster_canonicals(pairs, clips))
        .to_pandas()
        .set_index("audio_cluster_id")
        .sort_index()
    )
    assert list(got.index) == [0, 5]
    assert got.loc[0].survivor_clip_id == "clip_1"  # longest, not min id
    assert int(got.loc[0].n_members) == 3
    assert int(got.loc[0].survivor_dur_ms) == 5000
    assert got.loc[5].survivor_clip_id == "clip_5"  # tie -> min id
    assert int(got.loc[5].n_members) == 2


def test_audio_cluster_canonicals_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from intertext_ray.ops.audio_dedup import audio_cluster_canonicals

    pairs = rd.from_arrow(
        pa.table(
            {
                "clip_a": pa.array([], pa.uint64()),
                "clip_b": pa.array([], pa.uint64()),
            }
        )
    )
    clips = rd.from_arrow(
        pa.table({"clip_id": ["clip_0"], "dur_ms": pa.array([10], pa.int32())})
    )
    assert len(audio_cluster_canonicals(pairs, clips)) == 0
