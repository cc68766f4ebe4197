"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by actor-pool ``map_batches`` stages.

The audio path is REAL (pure-numpy WAV/PCM decode + SNR invariant —
``intertext_ray.stages.audio``).  Image/video decode has no codec library in
this container, so those decoders are STUBS behind a deterministic fake
(per driver instruction): the Ray-side plumbing — schema, batch sizing,
actor signature, output layout — is real and tested; swapping in a real
decoder is a one-function change.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data


class ImageFeatureExtractor:
    """Actor stub: binary image -> fixed-size feature vector.

    Real deployment: decode (PIL/opencv) + resize + embed in ``__call__``,
    model loaded in ``__init__``.  Here: a deterministic fake feature (first
    ``dim`` bytes of repeated sha256 of the payload, scaled to [0,1)) so the
    pipeline shape, schema and tests are real.
    """

    def __init__(self, dim: int = 32, real_decoder: bool = False):
        self.dim = dim
        if real_decoder:
            raise NotImplementedError(
                "no image codec library in this environment; "
                "plug a decoder in here (PIL.Image.open etc.)"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.empty((len(batch), self.dim), dtype=np.float32)
        for i, blob in enumerate(batch["bytes"].to_pylist()):
            raw = b""
            h = blob or b"\0"
            while len(raw) < self.dim:
                h = hashlib.sha256(h).digest()
                raw += h
            feats[i] = np.frombuffer(raw[: self.dim], np.uint8) / 256.0
        feat_col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), pa.float32()), self.dim
        )
        return batch.append_column("feature", feat_col)


def image_features_stage(
    ds: ray.data.Dataset, dim: int = 32, concurrency: int = 4, batch_size: int = 64
) -> ray.data.Dataset:
    """Binary-payload feature extraction as an actor pool.  Small
    ``batch_size``: memory is set by payload bytes, not row count."""
    return ds.map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
        zero_copy_batch=True,
    )


def frame_sample_plan(
    ds: ray.data.Dataset, every_ms: int = 1000
) -> ray.data.Dataset:
    """Video frame-sampling plumbing (decode stubbed): emit one row per
    planned frame (clip_id, frame_idx, t_ms) from duration metadata — the
    flat_map shape a real frame extractor slots into."""

    def plan(batch: pa.Table) -> pa.Table:
        ids, fidx, tms = [], [], []
        for cid, dur in zip(
            batch["clip_id"].to_pylist(),
            batch["dur_ms"].to_numpy(zero_copy_only=False),
        ):
            k = max(1, int(dur) // every_ms)
            for f in range(k):
                ids.append(cid)
                fidx.append(f)
                tms.append(f * every_ms)
        return pa.table(
            {
                "clip_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "t_ms": pa.array(tms, pa.int32()),
            }
        )

    return ds.map_batches(plan, batch_format="pyarrow")
