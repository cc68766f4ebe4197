"""Keep-one-per-cluster survivor filter (the dedup deliverable)."""

import pyarrow as pa
import ray.data as rd


def test_survivors_filter(ray_session):
    from intertext_ray.stages.cluster import survivors_filter

    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(list(range(10)), pa.int64()),
                  "text": pa.array([f"t{i}" for i in range(10)])})
    )
    # clusters: {1,4,7} -> keeper 1; {2,9} -> keeper 2
    dc = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 4, 7, 2, 9], pa.uint64()),
                "dup_cluster_id": pa.array([1, 1, 1, 2, 2], pa.uint64()),
            }
        )
    )
    got = sorted(r["doc_id"] for r in survivors_filter(docs, dc, num_buckets=4).take_all())
    assert got == [0, 1, 2, 3, 5, 6, 8]


def test_survivors_filter_no_clusters(ray_session):
    from intertext_ray.stages.cluster import survivors_filter

    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array([3, 1, 2], pa.int64())})
    )
    dc = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.uint64()),
                "dup_cluster_id": pa.array([], pa.uint64()),
            }
        )
    )
    got = sorted(r["doc_id"] for r in survivors_filter(docs, dc).take_all())
    assert got == [1, 2, 3]
