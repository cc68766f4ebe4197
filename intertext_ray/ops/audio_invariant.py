"""Per-row pipeline invariant report: decoded-PCM SNR + transcript equality.

The input contract for this engine (north rule / BASELINE.json) demands a
per-row invariant THROUGH every payload-touching stage: decoded-PCM
"allclose" at SNR >= 30 dB plus transcript byte-equality.  30 dB is a
power ratio of exactly 10^(30/10) = 1000, so the gate is pure integer
arithmetic —

    sig_energy   = sum_{i < min(n_a, n_b)} a_i^2
    noise_energy = sum_{i < min(n_a, n_b)} (a_i - b_i)^2
    pcm_ok       = (n_a == n_b) AND sig_energy >= 1000 * noise_energy

— which makes the whole report hash-exact against a DuckDB twin that
re-decodes both payloads (no float tolerance anywhere).  Reference parity
note: intertext has no audio stage (`intertext.py` is transcript-only);
this op belongs to the additive audio family the input contract requires.

Two shapes, picked by where side B comes from:

- :func:`invariant_vs_transform` — B is re-derived inside the same batch
  by re-running the transform on A.  Row-local, ZERO exchange at any
  corpus size; this is the shape to fuse after a payload-rewrite stage
  (trade one extra transform evaluation for no shuffle).
- :func:`invariant_report` — B is a separately materialized table (e.g. a
  finished preprocess run being audited).  The payloads of both sides
  ride ONE bucketed co-group shuffle keyed on clip_id; cost is
  O(bytes(A) + bytes(B)) exchange, the unavoidable minimum for auditing
  two stored corpora against each other.  Buckets keep any single group
  worker-heap-sized.

Overflow bound: noise per sample <= 65535^2 < 2^32, so int64 sums are
exact for clips up to 2^31 samples (~13 h at 48 kHz) — asserted.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from intertext_ray.functions.audio import decode_clip, encode_pcm_s16le

_SQL_CODECS = ("pcm_s16le", "wav", "ulaw", "alaw")

_REPORT_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("n_a", pa.int64()),
        ("n_b", pa.int64()),
        ("len_ok", pa.int64()),
        ("transcript_ok", pa.int64()),
        ("sig_energy", pa.int64()),
        ("noise_energy", pa.int64()),
        ("pcm_ok", pa.int64()),
        ("row_ok", pa.int64()),
    ]
)


def pcm_invariant(a: np.ndarray, b: np.ndarray) -> tuple[int, int, int, int]:
    """(sig_energy, noise_energy, len_ok, pcm_ok) over the overlap of two
    int16 sample arrays — the pure kernel, reused by tests and both
    Dataset shapes."""
    assert len(a) < 2**31 and len(b) < 2**31, "int64 energy bound"
    m = min(len(a), len(b))
    ao = a[:m].astype(np.int64)
    bo = b[:m].astype(np.int64)
    sig = int(np.sum(ao * ao))
    d = ao - bo
    noise = int(np.sum(d * d))
    len_ok = int(len(a) == len(b))
    pcm_ok = int(len_ok and sig >= 1000 * noise)
    return sig, noise, len_ok, pcm_ok


def _report_rows(
    ids, a_pcm, b_pcm, a_tr, b_tr
) -> pa.Table:
    out = {k: [] for k in _REPORT_SCHEMA.names}
    for cid, pa_, pb_, ta, tb in zip(ids, a_pcm, b_pcm, a_tr, b_tr):
        sig, noise, len_ok, pcm_ok = pcm_invariant(pa_, pb_)
        t_ok = int(ta == tb)
        out["clip_id"].append(cid)
        out["n_a"].append(len(pa_))
        out["n_b"].append(len(pb_))
        out["len_ok"].append(len_ok)
        out["transcript_ok"].append(t_ok)
        out["sig_energy"].append(sig)
        out["noise_energy"].append(noise)
        out["pcm_ok"].append(pcm_ok)
        out["row_ok"].append(int(pcm_ok and t_ok))
    return pa.table(
        {
            n: pa.array(out[n], _REPORT_SCHEMA.field(n).type)
            for n in _REPORT_SCHEMA.names
        }
    )


def invariant_vs_transform(
    clips: ray.data.Dataset,
    pcm_fn,
    transcript_fn=None,
    codecs: tuple[str, ...] = _SQL_CODECS,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Zero-shuffle invariant report: re-runs ``pcm_fn(pcm, clip_id)``
    (and optional ``transcript_fn(transcript, clip_id)``) on each decoded
    clip inside the batch and scores B against A in place.  Use this to
    audit a payload-rewrite stage without materializing its output
    twice."""
    keep = set(codecs)

    def fn(batch: pa.Table) -> pa.Table:
        mask = pa.array([c in keep for c in batch["codec"].to_pylist()])
        sub = batch.filter(mask)
        blobs = sub["bytes"].to_pylist()
        srs = sub["sr_hz"].to_numpy(zero_copy_only=False)
        cod = sub["codec"].to_pylist()
        ids = sub["clip_id"].to_pylist()
        trs = (
            sub["transcript"].to_pylist()
            if "transcript" in sub.column_names
            else [""] * len(sub)
        )
        a_pcm = [
            decode_clip(blobs[i], int(srs[i]), cod[i]) for i in range(len(sub))
        ]
        b_pcm = [pcm_fn(p, cid) for p, cid in zip(a_pcm, ids)]
        b_tr = (
            [transcript_fn(t, cid) for t, cid in zip(trs, ids)]
            if transcript_fn is not None
            else list(trs)
        )
        return _report_rows(ids, a_pcm, b_pcm, trs, b_tr)

    return clips.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, num_cpus=1
    )


def invariant_report(
    clips_a: ray.data.Dataset,
    clips_b: ray.data.Dataset,
    num_buckets: int = 16,
    codecs: tuple[str, ...] = _SQL_CODECS,
) -> ray.data.Dataset:
    """Audit two materialized corpora row-by-row: inner join on clip_id
    via ONE bucketed co-group shuffle (both payloads ride it — the
    unavoidable minimum when B is already on disk; see module doc for the
    fused zero-shuffle alternative)."""
    from intertext_ray.sources.clips import doc_ids_for_clip_ids

    nb = np.uint64(num_buckets)
    keep = set(codecs)

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            mask = pa.array([c in keep for c in b["codec"].to_pylist()])
            sub = b.filter(mask)
            cols = ["clip_id", "bytes", "sr_hz", "codec"]
            tr = (
                sub["transcript"]
                if "transcript" in sub.column_names
                else pa.array([""] * len(sub), pa.string())
            )
            t = sub.select(cols).append_column("transcript", tr)
            num = doc_ids_for_clip_ids(t["clip_id"])
            t = t.append_column(
                "bucket", pa.array((num % nb).astype(np.int64))
            )
            return t.append_column(
                "side", pa.array(np.full(len(t), side, np.int64))
            )

        return fn

    both = clips_a.map_batches(tag(0), batch_format="pyarrow").union(
        clips_b.map_batches(tag(1), batch_format="pyarrow")
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return _REPORT_SCHEMA.empty_table()
        ids = g["clip_id"].to_pylist()
        side = g["side"].to_numpy(zero_copy_only=False)
        blobs = g["bytes"].to_pylist()
        srs = g["sr_hz"].to_numpy(zero_copy_only=False)
        cod = g["codec"].to_pylist()
        trs = g["transcript"].to_pylist()
        a_rows = {ids[i]: i for i in range(len(g)) if side[i] == 0}
        o_ids, a_pcm, b_pcm, a_tr, b_tr = [], [], [], [], []
        for i in range(len(g)):
            if side[i] != 1 or ids[i] not in a_rows:
                continue
            j = a_rows[ids[i]]
            o_ids.append(ids[i])
            a_pcm.append(decode_clip(blobs[j], int(srs[j]), cod[j]))
            b_pcm.append(decode_clip(blobs[i], int(srs[i]), cod[i]))
            a_tr.append(trs[j])
            b_tr.append(trs[i])
        return _report_rows(o_ids, a_pcm, b_pcm, a_tr, b_tr)

    return (
        both.groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def invariant_summary(report: ray.data.Dataset) -> ray.data.Dataset:
    """One-row rollup of a report: totals + violation counts — the
    lineage-metrics face a pipeline run records per stage."""
    from ray.data.aggregate import Count, Sum

    def flip(b: pa.Table) -> pa.Table:
        one = pa.array(np.ones(len(b), np.int64))
        bad_pcm = pa.compute.subtract(one, b["pcm_ok"])
        bad_tr = pa.compute.subtract(one, b["transcript_ok"])
        bad_len = pa.compute.subtract(one, b["len_ok"])
        return pa.table(
            {
                "g": pa.array(np.zeros(len(b), np.int64)),
                "row_ok": b["row_ok"],
                "bad_pcm": bad_pcm,
                "bad_transcript": bad_tr,
                "bad_len": bad_len,
            }
        )

    agg = (
        report.map_batches(flip, batch_format="pyarrow")
        .groupby("g")
        .aggregate(
            Count(alias_name="n_rows"),
            Sum("row_ok", alias_name="n_ok"),
            Sum("bad_pcm", alias_name="n_bad_pcm"),
            Sum("bad_transcript", alias_name="n_bad_transcript"),
            Sum("bad_len", alias_name="n_bad_len"),
        )
    )
    return agg.map_batches(
        lambda t: t.drop_columns(["g"]), batch_format="pyarrow"
    )


def plant_perturbations(
    clips: ray.data.Dataset,
    gain_mod: int = 2,
    transcript_mod: int = 5,
    trunc_mod: int = 11,
    target_peak: int = 30000,
    codecs: tuple[str, ...] = _SQL_CODECS,
) -> ray.data.Dataset:
    """Fixture face (pattern: ``audio_exact.plant_pcm_copies``): a derived
    corpus B with deterministic per-id perturbations so an invariant
    report discriminates —

    - numeric id % ``gain_mod``  == 0: peak-gain-normalized payload
      (re-encoded pcm_s16le) — fails the 30 dB gate unless the clip was
      already near target (or silent: passthrough, passes);
    - numeric id % ``transcript_mod`` == 0: transcript gets ``'!'``
      appended — fails transcript equality;
    - numeric id % ``trunc_mod`` == 0: last sample dropped (re-encoded
      pcm_s16le) — fails the length gate.

    Applied in that order, so composite ids compose (gain THEN truncate).
    """
    from intertext_ray.ops.audio_gain import normalize_peak_pcm
    from intertext_ray.sources.clips import doc_ids_for_clip_ids

    keep = set(codecs)
    gm, tm, cm = np.uint64(gain_mod), np.uint64(transcript_mod), np.uint64(
        trunc_mod
    )

    def fn(batch: pa.Table) -> pa.Table:
        num = doc_ids_for_clip_ids(batch["clip_id"])
        blobs = batch["bytes"].to_pylist()
        srs = batch["sr_hz"].to_numpy(zero_copy_only=False)
        cod = batch["codec"].to_pylist()
        trs = (
            batch["transcript"].to_pylist()
            if "transcript" in batch.column_names
            else [""] * len(batch)
        )
        ob, oc, ot = [], [], []
        for i in range(len(batch)):
            pcm_changed = False
            b, c, t = blobs[i], cod[i], trs[i]
            if c in keep:
                pcm = decode_clip(b, int(srs[i]), c)
                if num[i] % gm == 0:
                    pcm = normalize_peak_pcm(pcm, target_peak)
                    pcm_changed = True
                if num[i] % cm == 0 and len(pcm):
                    pcm = pcm[:-1]
                    pcm_changed = True
                if pcm_changed:
                    b, c = encode_pcm_s16le(pcm), "pcm_s16le"
            if num[i] % tm == 0:
                t = t + "!"
            ob.append(b)
            oc.append(c)
            ot.append(t)
        names = batch.column_names
        out = batch.set_column(
            names.index("bytes"), "bytes", pa.array(ob, pa.binary())
        )
        out = out.set_column(
            names.index("codec"), "codec", pa.array(oc, pa.string())
        )
        if "transcript" in names:
            out = out.set_column(
                names.index("transcript"),
                "transcript",
                pa.array(ot, pa.string()),
            )
        else:
            out = out.append_column("transcript", pa.array(ot, pa.string()))
        return out

    return clips.map_batches(fn, batch_format="pyarrow", batch_size=64)
