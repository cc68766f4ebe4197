"""Exact audio dedup by decoded-PCM identity: checksum kernel properties,
cross-codec group detection, survivors, decontam, planted-copy helper."""

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.functions.audio import encode_clip
from intertext_ray.ops.audio_exact import (
    audio_decontam,
    audio_exact_dup_groups,
    audio_exact_survivor_ids,
    pcm_checksum,
    pcm_checksums,
    plant_pcm_copies,
)


def _clips_table(rows):
    """rows: list of (clip_id, pcm int16 array, sr, codec)."""
    return pa.table(
        {
            "clip_id": pa.array([r[0] for r in rows], pa.string()),
            "bytes": pa.array(
                [encode_clip(r[1], r[2], r[3]) for r in rows], pa.binary()
            ),
            "sr_hz": pa.array([r[2] for r in rows], pa.int32()),
            "dur_ms": pa.array(
                [len(r[1]) * 1000 // r[2] for r in rows], pa.int32()
            ),
            "codec": pa.array([r[3] for r in rows], pa.string()),
        }
    )


def _rand_pcm(seed, n):
    rng = np.random.default_rng(seed)
    return rng.integers(-32768, 32768, n).astype(np.int16)


def test_checksum_order_sensitive_and_exact():
    pcm = _rand_pcm(0, 4000)
    c = pcm_checksum(pcm)
    assert c == pcm_checksum(pcm.copy())
    swapped = pcm.copy()
    swapped[10], swapped[11] = swapped[11], swapped[10]
    if swapped[10] != swapped[11]:
        assert pcm_checksum(swapped) != c
    # scalar reference with Python big ints (mod 2^64)
    ck1 = sum((i + 1) * (int(s) + 32769) for i, s in enumerate(pcm)) % 2**64
    ck2 = (
        sum((i + 1) ** 2 * (int(s) + 32769) for i, s in enumerate(pcm))
        % 2**64
    )
    assert c == (ck1, ck2)


def test_cross_codec_identity_groups(ray_session):
    pcm_a = _rand_pcm(1, 6000)
    pcm_b = _rand_pcm(2, 6000)  # same length, different content
    pcm_c = _rand_pcm(3, 5000)
    rows = [
        ("clip_0", pcm_a, 8000, "pcm_s16le"),
        ("clip_1", pcm_a, 8000, "wav"),  # same samples, other container
        ("clip_2", pcm_b, 8000, "wav"),
        ("clip_3", pcm_c, 8000, "pcm_s16le"),
        ("clip_4", pcm_c, 8000, "ulaw"),  # LOSSY: decodes differently
    ]
    ds = ray.data.from_arrow(_clips_table(rows))
    g = audio_exact_dup_groups(ds, num_buckets=4).to_pandas()
    assert set(zip(g.clip_id, g.group_id)) == {
        ("clip_0", "clip_0"),
        ("clip_1", "clip_0"),
    }
    assert (g.group_size == 2).all()

    surv = audio_exact_survivor_ids(ds, num_buckets=4).to_pandas()
    assert set(surv.clip_id) == {"clip_0", "clip_2", "clip_3", "clip_4"}


def test_plant_pcm_copies_and_groups(ray_session):
    rows = [
        (f"clip_{i}", _rand_pcm(10 + i, 3000 + 100 * i), 8000, codec)
        for i, codec in enumerate(["wav", "ulaw", "pcm_s16le", "alaw"])
    ]
    ds = ray.data.from_arrow(_clips_table(rows))
    planted = plant_pcm_copies(ds, mod=3)
    assert planted.count() == 6  # 4 originals + copies of clip_0, clip_3
    g = audio_exact_dup_groups(planted, num_buckets=4).to_pandas()
    got = set(zip(g.clip_id, g.group_id))
    assert got == {
        ("clip_0", "clip_0"),
        ("clip_0#pcm", "clip_0"),
        ("clip_3", "clip_3"),
        ("clip_3#pcm", "clip_3"),
    }
    # the pcm copy of clip_3 re-encodes the ALAW original's decoded samples
    # (re-encode of the decoded stream), so group membership is honest
    assert (g.group_size == 2).all()


def test_audio_decontam(ray_session):
    corpus_rows = [
        (f"clip_{i}", _rand_pcm(20 + i, 4000), 8000, "pcm_s16le")
        for i in range(5)
    ]
    eval_rows = [
        ("eval_0", corpus_rows[1][1], 8000, "wav"),  # matches clip_1
        ("eval_1", _rand_pcm(99, 4000), 8000, "pcm_s16le"),  # matches none
    ]
    corpus = ray.data.from_arrow(_clips_table(corpus_rows))
    ev = ray.data.from_arrow(_clips_table(eval_rows))
    out = audio_decontam(corpus, ev).to_pandas()
    assert set(out.clip_id) == {"clip_0", "clip_2", "clip_3", "clip_4"}


def test_checksums_skip_unsupported_codecs(ray_session):
    rows = [("clip_0", _rand_pcm(0, 1000), 8000, "pcm_s16le")]
    t = _clips_table(rows)
    t = t.set_column(
        t.column_names.index("codec"), "codec", pa.array(["flac"])
    )
    ds = ray.data.from_arrow(t)
    assert pcm_checksums(ds).count() == 0


def test_norm_exact_catches_regained_copies(ray_session):
    """Lossless integer re-gain: invisible to raw-exact, grouped by
    norm-exact; unrelated clips stay ungrouped; exact groups are a
    subset of norm groups."""
    from intertext_ray.ops.audio_exact import (
        audio_norm_exact_dup_groups,
        plant_gain_copies,
    )

    base = (_rand_pcm(3, 4000).astype(np.int64) // 4).astype(np.int16)
    rows = [
        ("clip_0", base, 8000, "pcm_s16le"),
        ("clip_1", _rand_pcm(7, 4000), 8000, "pcm_s16le"),
        ("clip_2", (base.astype(np.int64) * 3).astype(np.int16), 8000, "pcm_s16le"),
        ("clip_3", base, 8000, "wav"),  # raw-exact with clip_0 too
    ]
    ds = ray.data.from_arrow(_clips_table(rows))

    raw = audio_exact_dup_groups(ds, num_buckets=4).to_pandas()
    assert set(raw.clip_id) == {"clip_0", "clip_3"}

    g = audio_norm_exact_dup_groups(ds, num_buckets=4).to_pandas()
    assert set(g.clip_id) == {"clip_0", "clip_2", "clip_3"}
    assert (g.group_id == "clip_0").all() and (g.group_size == 3).all()
    assert set(raw.clip_id) <= set(g.clip_id)


def test_plant_gain_copies_groups_with_sources(ray_session):
    from intertext_ray.ops.audio_exact import (
        audio_norm_exact_dup_groups,
        plant_gain_copies,
    )

    rows = [
        (f"clip_{i}", (_rand_pcm(i, 3000).astype(np.int64) // 4).astype(np.int16), 8000, "pcm_s16le")
        for i in range(6)
    ]
    ds = ray.data.from_arrow(_clips_table(rows))
    planted = plant_gain_copies(ds, mod=2, gain_num=2)
    g = (
        audio_norm_exact_dup_groups(planted, num_buckets=4)
        .to_pandas()
        .sort_values("clip_id")
    )
    # clips 0, 2, 4 gain re-gained copies -> three groups of two
    assert g.clip_id.tolist() == [
        "clip_0", "clip_0#gain", "clip_2", "clip_2#gain",
        "clip_4", "clip_4#gain",
    ]
    assert (g.group_size == 2).all()
    assert g.group_id.tolist() == [
        "clip_0", "clip_0", "clip_2", "clip_2", "clip_4", "clip_4",
    ]
    # and raw-exact sees none of it
    assert audio_exact_dup_groups(planted, num_buckets=4).count() == 0


def test_audio_eval_leak_report(ray_session):
    """Planted PCM copies: eval clips with a corpus copy report exactly
    one; untouched eval clips report zero."""
    from intertext_ray.ops.audio_exact import audio_eval_leak_report

    ev_rows = [
        ("ev_0", _rand_pcm(1, 2000), 8000, "pcm_s16le"),
        ("ev_1", _rand_pcm(2, 2000), 8000, "pcm_s16le"),
        ("ev_2", _rand_pcm(3, 2500), 8000, "ulaw"),
    ]
    corpus_rows = [
        ("c_0", _rand_pcm(10, 2000), 8000, "pcm_s16le"),
        ("c_1", ev_rows[0][1], 8000, "wav"),     # re-container of ev_0
        ("c_2", ev_rows[0][1], 8000, "pcm_s16le"),  # second copy of ev_0
        ("c_3", _rand_pcm(11, 1500), 8000, "pcm_s16le"),
    ]
    got = (
        audio_eval_leak_report(
            ray.data.from_arrow(_clips_table(corpus_rows)).repartition(2),
            ray.data.from_arrow(_clips_table(ev_rows)),
        )
        .to_pandas()
        .set_index("clip_id")
    )
    assert got.loc["ev_0", "n_corpus_copies"] == 2
    assert bool(got.loc["ev_0", "leaked"])
    assert got.loc["ev_1", "n_corpus_copies"] == 0
    assert not bool(got.loc["ev_1", "leaked"])
    # the ulaw eval clip's checksum is over its DECODED (companded)
    # samples — no corpus clip matches
    assert got.loc["ev_2", "n_corpus_copies"] == 0


def test_audio_eval_leak_duplicate_eval_keys(ray_session):
    """Two eval clips with IDENTICAL PCM must EACH be credited with every
    corpus copy (the duplicate-key run in the composite searchsorted)."""
    import ray

    from intertext_ray.ops.audio_exact import audio_eval_leak_report

    shared = _rand_pcm(21, 1800)
    ev_rows = [
        ("ev_a", shared, 8000, "pcm_s16le"),
        ("ev_b", shared, 8000, "pcm_s16le"),  # same PCM as ev_a
        ("ev_c", _rand_pcm(22, 900), 8000, "pcm_s16le"),
    ]
    corpus_rows = [
        ("c_0", shared, 8000, "pcm_s16le"),
        ("c_1", shared, 8000, "wav"),  # re-container, same decoded PCM
        ("c_2", _rand_pcm(23, 1100), 8000, "pcm_s16le"),
    ]
    got = (
        audio_eval_leak_report(
            ray.data.from_arrow(_clips_table(corpus_rows)).repartition(2),
            ray.data.from_arrow(_clips_table(ev_rows)),
        )
        .to_pandas()
        .set_index("clip_id")
    )
    assert got.loc["ev_a", "n_corpus_copies"] == 2
    assert got.loc["ev_b", "n_corpus_copies"] == 2
    assert got.loc["ev_c", "n_corpus_copies"] == 0


def test_audio_leakage_safe_split(ray_session):
    """No gain-invariant dup group may straddle the train/val boundary;
    ungrouped clips split by their own id; the gate is the pinned
    splitmix permille rule."""
    import numpy as np
    import ray

    from intertext_ray.functions.hashing import splitmix64
    from intertext_ray.ops.audio_exact import (
        audio_leakage_safe_split,
        audio_norm_exact_dup_groups,
        plant_gain_copies,
    )

    def quiet_pcm(seed, n):  # x2 gain must never clip -> bit-identical
        rng = np.random.default_rng(seed)  # normalized copies
        return rng.integers(-7000, 7000, n).astype(np.int16)

    rows = [
        (f"clip_{i}", quiet_pcm(100 + i, 1200 + 7 * i), 8000, "pcm_s16le")
        for i in range(12)
    ]
    planted = plant_gain_copies(
        ray.data.from_arrow(_clips_table(rows)), mod=3, gain_num=2
    )
    got = (
        audio_leakage_safe_split(planted, num_buckets=4)
        .to_pandas()
        .set_index("clip_id")
    )
    groups = audio_norm_exact_dup_groups(planted, num_buckets=4).to_pandas()
    assert len(groups) > 0
    # every member of a group shares the keeper's key and split
    for gid, mem in groups.groupby("group_id"):
        keys = {int(got.loc[c, "split_key"]) for c in mem.clip_id}
        splits = {got.loc[c, "split"] for c in mem.clip_id}
        assert keys == {int(gid.split("_")[-1])}
        assert len(splits) == 1
    # ungrouped clips: own id, pinned splitmix gate
    grouped = set(groups.clip_id)
    for cid in got.index:
        if cid in grouped:
            continue
        own = int(cid.split("_")[-1])
        assert int(got.loc[cid, "split_key"]) == own
        h = int(splitmix64(np.uint64(own)) % np.uint64(1000))
        assert got.loc[cid, "split"] == ("train" if h < 900 else "val")
    # the corpus actually exercises both splits across seeds/sizes
    assert set(got["split"]) <= {"train", "val"}


def test_joint_leakage_safe_split_bridges_modalities(ray_session):
    """A text-dup bridge (same transcript, different audio) and an
    audio-dup bridge (same audio, different id) must pull all linked
    clips into ONE split component keyed by the lexicographic min
    member's numeric id."""
    import numpy as np
    import ray

    from intertext_ray.functions.hashing import splitmix64
    from intertext_ray.ops.joint_dedup import joint_leakage_safe_split

    def pcm(seed, n=900):
        rng = np.random.default_rng(seed)
        return rng.integers(-7000, 7000, n).astype(np.int16)

    import pyarrow as pa

    from intertext_ray.functions.audio import encode_pcm_s16le

    rows = [
        # clip_1/clip_2 share PCM but differ in transcript (audio
        # bridge); clip_2/clip_3 share a transcript but differ in PCM
        # (text bridge) => {1,2,3} is ONE joint component, keyed 1
        ("clip_1", pcm(1), "alpha words one"),
        ("clip_2", pcm(1), "bravo words two"),
        ("clip_3", pcm(3), "bravo words two"),
        # isolated clip: own key
        ("clip_4", pcm(4), "delta words four"),
    ]
    tbl = pa.table(
        {
            "clip_id": pa.array([r[0] for r in rows], pa.string()),
            "bytes": pa.array(
                [encode_pcm_s16le(r[1]) for r in rows], pa.binary()
            ),
            "sr_hz": pa.array([8000] * 4, pa.int32()),
            "dur_ms": pa.array([100] * 4, pa.int32()),
            "codec": pa.array(["pcm_s16le"] * 4, pa.string()),
            "transcript": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    got = (
        joint_leakage_safe_split(
            ray.data.from_arrow(tbl), num_buckets=4
        )
        .to_pandas()
        .set_index("clip_id")
    )
    assert int(got.loc["clip_1", "split_key"]) == 1
    assert int(got.loc["clip_2", "split_key"]) == 1
    assert int(got.loc["clip_3", "split_key"]) == 1  # bridged via text
    assert int(got.loc["clip_4", "split_key"]) == 4
    assert len(set(got.loc[["clip_1", "clip_2", "clip_3"], "split"])) == 1
    h = int(splitmix64(np.uint64(4)) % np.uint64(1000))
    assert got.loc["clip_4", "split"] == ("train" if h < 900 else "val")
