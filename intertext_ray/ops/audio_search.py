"""Query-by-example audio containment search — the audio analogue of the
text pipeline's ``containment_search`` (find every corpus clip that
CONTAINS a given snippet, robust to codec change, gain change and
hop-aligned time shift).

Shape (Haitsma & Kalker 2002, the retrieval use-case their fingerprint
was designed for): the query snippets are benchmark-sized by nature, so
their subfingerprint streams are computed ONCE on the driver and
broadcast via ``ray.put`` (same justification as ``decontam``'s eval
grams); the corpus side is one streaming decode+fingerprint pass with a
vectorized sliding-window XOR/popcount per (clip, query) — zero corpus
shuffles at any scale, output rows are hit-proportional.

A hit means the FULL query stream aligns somewhere inside the clip with
bit-error-rate <= ``max_ber`` (unrelated audio sits at BER ~0.5; true
containments of re-encoded/re-gained copies measure ~0.0-0.15).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from intertext_ray.functions.audio import decode_clip
from intertext_ray.functions.audio_fp import _POPCOUNT16, subfingerprints
from intertext_ray.sources.clips import doc_ids_for_clip_ids

_RESULT_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("doc_id", pa.uint64()),
        ("query_id", pa.int64()),
        ("offset", pa.int64()),
        ("n_query_frames", pa.int64()),
        ("ber", pa.float64()),
    ]
)


def query_fingerprints(queries: pa.Table) -> list[tuple[int, np.ndarray]]:
    """Decode + fingerprint the query snippets (driver-side; queries are
    snippet-sized by nature).  Rows: (query_id, bytes, sr_hz, codec)."""
    out: list[tuple[int, np.ndarray]] = []
    qid = queries["query_id"].to_pylist()
    blobs = queries["bytes"].to_pylist()
    srs = queries["sr_hz"].to_pylist()
    codecs = queries["codec"].to_pylist()
    for i in range(len(queries)):
        pcm = decode_clip(blobs[i], int(srs[i]), codecs[i])
        out.append((int(qid[i]), subfingerprints(pcm, int(srs[i]))))
    return out


def audio_query_search(
    clips: ray.data.Dataset,
    queries: pa.Table,
    max_ber: float = 0.25,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """(clip_id, doc_id, query_id, offset, n_query_frames, ber) — one row
    per (clip, query) where the whole query fingerprint stream aligns
    inside the clip's at BER <= max_ber; ``offset`` is the best-aligned
    clip frame index (ties -> smallest offset).  Queries shorter than two
    analysis frames produce no rows."""
    qfps = [(q, f) for q, f in query_fingerprints(queries) if len(f) > 0]
    qref = ray.put(qfps)

    def search(batch: pa.Table) -> pa.Table:
        qlist = ray.get(qref)
        blobs = batch["bytes"].to_pylist()
        srs = batch["sr_hz"].to_numpy(zero_copy_only=False)
        codecs = batch["codec"].to_pylist()
        cids = batch["clip_id"].to_pylist()
        docs = doc_ids_for_clip_ids(batch["clip_id"])
        r_cid: list[str] = []
        r_doc: list[int] = []
        r_qid: list[int] = []
        r_off: list[int] = []
        r_nq: list[int] = []
        r_ber: list[float] = []
        for i in range(len(batch)):
            try:
                pcm = decode_clip(blobs[i], int(srs[i]), codecs[i])
                fa = subfingerprints(pcm, int(srs[i]))
            except Exception:
                continue
            if len(fa) == 0:
                continue
            for qid, fq in qlist:
                m = len(fq)
                if len(fa) < m:
                    continue
                # all alignments at once: (n-m+1, m) window view, XOR
                # against the query, 16-bit popcount lookup
                win = np.lib.stride_tricks.sliding_window_view(fa, m)
                errs = _POPCOUNT16[np.bitwise_xor(win, fq[None, :])].sum(
                    axis=1, dtype=np.int64
                )
                best = int(np.argmin(errs))
                ber = float(errs[best]) / (16.0 * m)
                if ber <= max_ber:
                    r_cid.append(cids[i])
                    r_doc.append(int(docs[i]))
                    r_qid.append(qid)
                    r_off.append(best)
                    r_nq.append(m)
                    r_ber.append(ber)
        return pa.table(
            {
                "clip_id": pa.array(r_cid, pa.string()),
                "doc_id": pa.array(r_doc, pa.uint64()),
                "query_id": pa.array(r_qid, pa.int64()),
                "offset": pa.array(r_off, pa.int64()),
                "n_query_frames": pa.array(r_nq, pa.int64()),
                "ber": pa.array(r_ber, pa.float64()),
            },
            schema=_RESULT_SCHEMA,
        )

    return clips.map_batches(
        search,
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
        zero_copy_batch=True,
    )
