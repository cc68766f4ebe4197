"""Line-level boilerplate dedup (C4/RefinedWeb-style): df semantics,
occurrence counting, reassembly, and the deterministic multi-line view."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def _docs(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )


def test_line_dedup_hand_case(ray_session):
    from intertext_ray.ops.line_dedup import line_dedup, line_doc_frequencies

    texts = [
        "nav bar\ncontent one\nfooter",
        "nav bar\ncontent two\nfooter",
        "nav bar\nunique text",
        "",
    ]
    df = (
        line_doc_frequencies(_docs(texts))
        .to_pandas()
        .set_index("line")["df"]
        .to_dict()
    )
    assert df == {
        "nav bar": 3,
        "footer": 2,
        "content one": 1,
        "content two": 1,
        "unique text": 1,
    }
    out = line_dedup(_docs(texts), min_df=3).to_pandas().set_index("doc_id")
    assert out.loc[0, "text"] == "content one\nfooter"
    assert out.loc[1, "text"] == "content two\nfooter"
    assert out.loc[2, "text"] == "unique text"
    assert out.loc[3, "text"] == ""
    assert out["n_removed"].tolist() == [1, 1, 1, 0]


def test_df_counts_documents_but_removal_counts_occurrences(ray_session):
    from intertext_ray.ops.line_dedup import line_dedup, line_doc_frequencies

    # "spam" appears 3x in doc 0 but only in 2 DOCUMENTS -> df = 2
    texts = ["spam\nspam\nreal\nspam", "spam\nother", "clean here"]
    df = (
        line_doc_frequencies(_docs(texts))
        .to_pandas()
        .set_index("line")["df"]
        .to_dict()
    )
    assert df["spam"] == 2
    out = line_dedup(_docs(texts), min_df=2).to_pandas().set_index("doc_id")
    assert out.loc[0, "text"] == "real"
    assert out.loc[0, "n_removed"] == 3  # occurrences, not distinct lines
    assert out.loc[1, "text"] == "other" and out.loc[1, "n_removed"] == 1
    assert out.loc[2, "n_removed"] == 0


def test_doc_reduced_to_nothing_and_order_preserved(ray_session):
    from intertext_ray.ops.line_dedup import line_dedup

    texts = ["b\na\nb", "b\nc", "b\nd", "z\na\nz\ny"]
    out = line_dedup(_docs(texts), min_df=3).to_pandas().set_index("doc_id")
    assert out.loc[0, "text"] == "a"  # both b's removed, order kept
    assert out.loc[3, "text"] == "z\na\nz\ny"  # z has df 1 (one document)
    only_b = line_dedup(_docs(["b", "b", "b"]), min_df=3).to_pandas()
    assert only_b["text"].tolist() == ["", "", ""]
    assert only_b["n_removed"].tolist() == [1, 1, 1]


def test_break_into_lines_matches_scalar_reference(ray_session):
    from intertext_ray.ops.line_dedup import break_into_lines

    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(15)]
    texts = [
        " ".join(rng.choice(words, size=int(n)))
        for n in rng.integers(0, 20, size=60)
    ]
    texts += ["", "   ", "one", "a  b   c    d"]  # ragged whitespace
    for npl in (1, 3, 5):
        got = (
            break_into_lines(_docs(texts), tokens_per_line=npl)
            .to_pandas()
            .sort_values("doc_id")["text"]
            .tolist()
        )
        for text, g in zip(texts, got):
            toks = text.split()
            ref = "\n".join(
                " ".join(toks[i : i + npl]) for i in range(0, len(toks), npl)
            )
            assert g == ref
