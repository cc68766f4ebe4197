"""Audio packing: exact prefix-scan assignment (vs a single-process
cumsum reference), partition invariance, oversized-clip spill, and the
payload materialization join."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _clips_tbl(durs, with_payload=False, sr=16000):
    from intertext_ray.functions.audio import encode_clip

    n = len(durs)
    cols = {
        "clip_id": [f"clip_{i}" for i in range(n)],
        "dur_ms": pa.array(durs, pa.int32()),
    }
    if with_payload:
        rng = np.random.default_rng(5)
        pcms = [
            rng.integers(-1000, 1000, size=max(1, d * sr // 1000)).astype(
                np.int16
            )
            for d in durs
        ]
        cols["bytes"] = [encode_clip(p, sr, "pcm_s16le") for p in pcms]
        cols["sr_hz"] = pa.array([sr] * n, pa.int32())
        cols["codec"] = ["pcm_s16le"] * n
        return pa.table(cols), pcms
    return pa.table(cols), None


def test_assignment_matches_cumsum_reference(ray_session):
    from intertext_ray.ops.audio_pack import assign_audio_packs

    rng = np.random.default_rng(17)
    durs = rng.integers(500, 12000, size=200).tolist()
    tbl, _ = _clips_tbl(durs)
    got = (
        assign_audio_packs(rd.from_arrow(tbl), budget_ms=30000)
        .to_pandas()
        .sort_values("cum_before")
        .reset_index(drop=True)
    )
    cum = np.concatenate([[0], np.cumsum(durs)[:-1]])
    assert got["clip_id"].tolist() == [f"clip_{i}" for i in range(200)]
    assert got["cum_before"].tolist() == cum.tolist()
    assert got["pack_id"].tolist() == (cum // 30000).tolist()
    assert got["offset_ms"].tolist() == (cum % 30000).tolist()


def test_assignment_partition_invariance(ray_session):
    from intertext_ray.ops.audio_pack import assign_audio_packs

    rng = np.random.default_rng(23)
    durs = rng.integers(100, 5000, size=150).tolist()
    tbl, _ = _clips_tbl(durs)
    a = (
        assign_audio_packs(rd.from_arrow(tbl), budget_ms=10000)
        .to_pandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    b = (
        assign_audio_packs(
            rd.from_arrow(tbl).repartition(13), budget_ms=10000
        )
        .to_pandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_oversized_clip_spills_its_pack(ray_session):
    from intertext_ray.ops.audio_pack import assign_audio_packs

    # clip_1 is longer than the whole budget; greedy assignment keeps it
    # whole and the NEXT clip starts in a later pack
    tbl, _ = _clips_tbl([1000, 50000, 1000])
    got = (
        assign_audio_packs(rd.from_arrow(tbl), budget_ms=30000)
        .to_pandas()
        .set_index("clip_id")
    )
    assert int(got.loc["clip_1", "pack_id"]) == 0  # starts at 1000
    assert int(got.loc["clip_2", "pack_id"]) == 51000 // 30000


def test_pack_payloads_concatenates_in_order(ray_session):
    from intertext_ray.functions.audio import decode_pcm_s16le
    from intertext_ray.ops.audio_pack import (
        assign_audio_packs,
        pack_payloads,
    )

    durs = [40, 60, 50, 30]  # tiny clips, one pack at budget 1000
    tbl, pcms = _clips_tbl(durs, with_payload=True)
    clips = rd.from_arrow(tbl)
    assigned = assign_audio_packs(clips, budget_ms=1000)
    packs = pack_payloads(assigned, clips).to_pandas()
    assert len(packs) == 1
    row = packs.iloc[0]
    assert int(row.pack_id) == 0
    assert int(row.n_clips) == 4
    assert int(row.total_ms) == sum(durs)
    got = decode_pcm_s16le(row["bytes"])
    want = np.concatenate(pcms)
    assert got.tolist() == want.tolist()

    # two packs when the budget forces a split
    assigned2 = assign_audio_packs(clips, budget_ms=100)
    packs2 = (
        pack_payloads(assigned2, clips)
        .to_pandas()
        .sort_values("pack_id")
        .reset_index(drop=True)
    )
    assert packs2["n_clips"].sum() == 4
    assert packs2["total_ms"].sum() == sum(durs)
    # every pack's blob is the concat of its members in offset order
    a_df = assigned2.to_pandas().sort_values("cum_before")
    for _, prow in packs2.iterrows():
        members = a_df[a_df.pack_id == prow.pack_id]
        want = np.concatenate(
            [pcms[int(c.split("_")[1])] for c in members.clip_id]
        )
        assert decode_pcm_s16le(prow["bytes"]).tolist() == want.tolist()
