import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.fixtures.gen_audio import gen_audio_dup_corpus
from intertext_ray.functions.audio import decode_clip, encode_clip
from intertext_ray.ops.audio_dedup import audio_dup_pairs
from intertext_ray.ops.audio_incremental import (
    append_wave,
    build_audio_index,
    incremental_audio_dup_pairs,
)
from intertext_ray.sources.clips import doc_ids_for_clip_ids


def _perturb(tbl, i, new_id, codec="wav"):
    pcm = decode_clip(
        tbl["bytes"][i].as_py(), tbl["sr_hz"][i].as_py(), tbl["codec"][i].as_py()
    )
    rng = np.random.default_rng(hash(new_id) % (1 << 32))
    y = np.clip(
        pcm.astype(np.float64) * 1.05 + rng.normal(0, 80, len(pcm)),
        -32768,
        32767,
    ).astype(np.int16)
    sr = tbl["sr_hz"][i].as_py()
    return {
        "clip_id": new_id,
        "bytes": encode_clip(y, sr, codec),
        "sr_hz": sr,
        "codec": codec,
    }


def test_incremental_audio_wave(ray_session, tmp_path):
    old_tbl, _ = gen_audio_dup_corpus(30, seed=31)
    old_tbl = old_tbl.select(["clip_id", "bytes", "sr_hz", "codec"])
    idx = str(tmp_path / "aidx")
    build_audio_index(ray.data.from_arrow(old_tbl), idx)

    # wave: two perturbed copies of old clips (new_old), one new pair
    # (new_new), one unrelated fresh signal
    from intertext_ray.fixtures.gen_audio import base_signal

    rows = [
        _perturb(old_tbl, 0, "w1_dup_of_0"),
        _perturb(old_tbl, 7, "w1_dup_of_7", codec="ulaw"),
    ]
    sig = base_signal(999, 5, 8000, 12000)
    p = np.clip(sig * 32000, -32768, 32767).astype(np.int16)
    rows.append(
        {"clip_id": "w1_pair_a", "bytes": p.tobytes(), "sr_hz": 8000,
         "codec": "pcm_s16le"}
    )
    p2 = np.clip(sig * 30000, -32768, 32767).astype(np.int16)
    rows.append(
        {"clip_id": "w1_pair_b", "bytes": p2.tobytes(), "sr_hz": 8000,
         "codec": "pcm_s16le"}
    )
    fresh = base_signal(999, 6, 8000, 12000)
    rows.append(
        {
            "clip_id": "w1_unique",
            "bytes": np.clip(fresh * 32000, -32768, 32767)
            .astype(np.int16)
            .tobytes(),
            "sr_hz": 8000,
            "codec": "pcm_s16le",
        }
    )
    wave = pa.Table.from_pylist(rows).cast(old_tbl.schema)
    new_ids = {
        int(d) for d in doc_ids_for_clip_ids(wave["clip_id"])
    }
    id_of = dict(zip(wave["clip_id"].to_pylist(),
                     (int(d) for d in doc_ids_for_clip_ids(wave["clip_id"]))))
    old_id_of = dict(zip(old_tbl["clip_id"].to_pylist(),
                         (int(d) for d in doc_ids_for_clip_ids(old_tbl["clip_id"]))))

    inc = incremental_audio_dup_pairs(
        ray.data.from_arrow(wave), idx
    ).to_pandas()
    inc_pairs = {
        tuple(sorted((int(a), int(b))))
        for a, b in zip(inc.clip_a, inc.clip_b)
    }
    # every pair has >= 1 new side
    for a, b in inc_pairs:
        assert a in new_ids or b in new_ids
    # planted links found
    assert tuple(sorted((id_of["w1_dup_of_0"],
                         old_id_of[old_tbl["clip_id"][0].as_py()]))) in inc_pairs
    assert tuple(sorted((id_of["w1_dup_of_7"],
                         old_id_of[old_tbl["clip_id"][7].as_py()]))) in inc_pairs
    assert tuple(sorted((id_of["w1_pair_a"], id_of["w1_pair_b"]))) in inc_pairs
    assert not any(id_of["w1_unique"] in p for p in inc_pairs)

    # equality with the full chain restricted to >=1-new pairs
    both = pa.concat_tables(
        [old_tbl, wave], promote_options="default"
    )
    full = audio_dup_pairs(
        ray.data.from_arrow(both), num_buckets=8
    ).to_pandas()
    full_pairs = {
        tuple(sorted((int(a), int(b))))
        for a, b in zip(full.clip_a, full.clip_b)
        if int(a) in new_ids or int(b) in new_ids
    }
    assert inc_pairs == full_pairs

    # fold wave 1 in; wave 2 dups a WAVE-1 clip -> found via the appended index
    append_wave(ray.data.from_arrow(wave), idx)
    w2 = pa.Table.from_pylist(
        [_perturb(wave, 2, "w2_dup_of_pair_a")]
    ).cast(old_tbl.schema)
    inc2 = incremental_audio_dup_pairs(
        ray.data.from_arrow(w2), idx
    ).to_pandas()
    w2_id = int(doc_ids_for_clip_ids(w2["clip_id"])[0])
    got2 = {
        tuple(sorted((int(a), int(b))))
        for a, b in zip(inc2.clip_a, inc2.clip_b)
    }
    assert tuple(sorted((w2_id, id_of["w1_pair_a"]))) in got2


def test_index_meta_guard(ray_session, tmp_path):
    """A wave with mismatched knobs is rejected instead of silently
    producing wrong candidates against a differently-bucketed index."""
    import pytest

    clips, _ = gen_audio_dup_corpus(8, seed=3)
    clips = clips.select(["clip_id", "bytes", "sr_hz", "codec"])
    idx = str(tmp_path / "guard")
    build_audio_index(ray.data.from_arrow(clips), idx, num_buckets=16)
    with pytest.raises(ValueError, match="knobs must match"):
        incremental_audio_dup_pairs(
            ray.data.from_arrow(clips), idx, num_buckets=8
        )
    with pytest.raises(ValueError, match="rebuild or match"):
        build_audio_index(ray.data.from_arrow(clips), idx, num_buckets=8)


def test_interrupted_index_refused(ray_session, tmp_path):
    """index_meta.json is the commit marker (written atomically LAST): an
    index directory holding artifacts without it — an interrupted build —
    is refused by both the wave reader and a re-build, never read as an
    empty-but-valid index."""
    import os

    import pytest

    clips, _ = gen_audio_dup_corpus(8, seed=5)
    clips = clips.select(["clip_id", "bytes", "sr_hz", "codec"])
    idx = str(tmp_path / "broken")
    build_audio_index(ray.data.from_arrow(clips), idx, num_buckets=16)
    os.remove(os.path.join(idx, "index_meta.json"))  # simulate interruption
    with pytest.raises(FileNotFoundError, match="index_meta.json"):
        incremental_audio_dup_pairs(
            ray.data.from_arrow(clips), idx, num_buckets=16
        )
    with pytest.raises(ValueError, match="interrupted build"):
        build_audio_index(ray.data.from_arrow(clips), idx, num_buckets=16)
