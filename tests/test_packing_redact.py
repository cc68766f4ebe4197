"""Distributed prefix-scan packing + PII redaction."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def test_assign_chunks_exact_prefix(ray_session):
    from intertext_ray.ops.packing import assign_chunks

    rng = np.random.default_rng(4)
    # sparse, shuffled doc ids to exercise range partitioning with gaps
    ids = sorted(rng.choice(10_000, size=300, replace=False).tolist())
    texts = [" ".join(["w"] * int(rng.integers(0, 50))) for _ in ids]
    perm = rng.permutation(len(ids))
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([ids[i] for i in perm], pa.int64()),
                "text": pa.array([texts[i] for i in perm], pa.string()),
            }
        )
    )
    got = {
        r["doc_id"]: r
        for r in assign_chunks(
            docs, budget_tokens=64, range_size=128
        ).take_all()
    }
    cum = 0
    for d, t in zip(ids, texts):
        n = len(t.split())
        row = got[d]
        assert row["n_tokens"] == n
        assert row["cum_before"] == cum
        assert row["chunk_id"] == cum // 64
        cum += n
    assert len(got) == len(ids)


def test_redact_pii(ray_session):
    from intertext_ray.ops.redact import redact_pii

    texts = [
        "contact me at jane.doe+spam@example.co.uk today",
        "server at 192.168.0.1 and 10.0.0.255.",
        "call +1 (555) 123-4567 or 555-0199 now",
        "a@b.io mails 8.8.8.8 then +44 20 7946 0958 done",
        "nothing sensitive here",
        "",
    ]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    got = {r["doc_id"]: r for r in redact_pii(docs).take_all()}
    assert got[0]["clean_text"] == "contact me at [EMAIL] today"
    assert got[0]["n_email"] == 1
    assert got[1]["clean_text"] == "server at [IP] and [IP]."
    assert got[1]["n_ipv4"] == 2
    assert got[2]["n_phone"] == 2
    assert "[PHONE]" in got[2]["clean_text"]
    assert got[3]["n_email"] == 1 and got[3]["n_ipv4"] == 1 and got[3]["n_phone"] == 1
    assert got[3]["clean_text"] == "[EMAIL] mails [IP] then [PHONE] done"
    assert got[4]["clean_text"] == "nothing sensitive here"
    assert got[5]["clean_text"] == ""


def test_length_sorted_packs_matches_brute(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from intertext_ray.ops.packing import length_sorted_packs

    rng = np.random.default_rng(23)
    texts = [
        " ".join(f"w{rng.integers(100)}" for _ in range(int(n)))
        for n in rng.integers(0, 40, 80)
    ]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    got = (
        length_sorted_packs(
            ray.data.from_arrow(tbl).repartition(5),
            budget_tokens=64,
            range_size=8,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # brute: sort by (n DESC, doc_id), exact prefix
    n = np.array([len(t.split()) for t in texts], dtype=np.int64)
    order = np.lexsort((np.arange(len(n)), -n))
    cum = np.zeros(len(n), dtype=np.int64)
    cum[order] = np.concatenate([[0], np.cumsum(n[order])[:-1]])
    assert got.n_tokens.to_numpy().tolist() == n.tolist()
    assert got.cum_before.to_numpy().tolist() == cum.tolist()
    assert got.chunk_id.to_numpy().tolist() == (cum // 64).tolist()
    # the point of the op: within a chunk, lengths are near-uniform
    # (max - min bounded by the budget's doc count, trivially true here;
    # check monotone non-increasing length along the sort order)
    sorted_n = n[order]
    assert all(sorted_n[i] >= sorted_n[i + 1] for i in range(len(n) - 1))
