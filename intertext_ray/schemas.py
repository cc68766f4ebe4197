"""Arrow schemas for every logical table (SURVEY.md §1.3)."""

from __future__ import annotations

import pyarrow as pa

N_PERM = 256

CLIPS = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.binary()),
        ("sr_hz", pa.int32()),
        ("dur_ms", pa.int32()),
        ("codec", pa.string()),
        ("transcript", pa.string()),
    ]
)

WINDOWS = pa.schema(
    [
        ("doc_id", pa.uint64()),
        ("window_id", pa.int32()),
        ("text", pa.string()),
    ]
)

SIGNATURES = pa.schema(
    [
        ("doc_id", pa.uint64()),
        ("window_id", pa.int32()),
        ("sig", pa.list_(pa.uint32(), N_PERM)),
    ]
)

HASHBANDS = pa.schema(
    [
        ("band", pa.uint64()),
        ("doc_id", pa.uint64()),
        ("window_id", pa.int32()),
    ]
)

CANDIDATES = pa.schema(
    [
        ("doc_a", pa.uint64()),
        ("doc_b", pa.uint64()),
        ("win_a", pa.int32()),
        ("win_b", pa.int32()),
    ]
)

MATCHES = pa.schema(
    [
        ("doc_a", pa.uint64()),
        ("doc_b", pa.uint64()),
        ("win_a", pa.int32()),
        ("win_b", pa.int32()),
        ("similarity", pa.int32()),
    ]
)

COMPONENTS = pa.schema(
    [
        ("doc_id", pa.uint64()),
        ("window_id", pa.int32()),
        ("component_id", pa.uint64()),
    ]
)

PAIR_CLUSTERS = pa.schema(
    [
        ("doc_a", pa.uint64()),
        ("doc_b", pa.uint64()),
        ("a_segments", pa.list_(pa.int32())),
        ("b_segments", pa.list_(pa.int32())),
        ("similarity", pa.int32()),
    ]
)
