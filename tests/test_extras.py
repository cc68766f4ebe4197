"""Coverage extras: --only focal filter (N6), XML extraction (S3),
dup_doc_pairs (A4), url passthrough (N9)."""

import pyarrow as pa
import pytest
import ray.data as rd

from intertext_ray.config import IntertextConfig
from intertext_ray.functions.text import extract_xml_text
from intertext_ray.stages.bands import hashbands_stage
from intertext_ray.stages.candidates import candidates_stage
from intertext_ray.stages.cluster import dup_doc_pairs
from intertext_ray.stages.minhash import signatures_stage
from intertext_ray.stages.windows import windows_stage


def _docs(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.uint64()),
                "text": texts,
            }
        )
    )


def test_only_filter(ray_session):
    t = " ".join(f"w{i}" for i in range(30))
    docs = _docs([t, t, t])
    cfg = IntertextConfig(only_doc_id=0)
    w = windows_stage(docs, cfg)
    cand = candidates_stage(
        hashbands_stage(signatures_stage(w, cfg), cfg), cfg, 2
    ).to_pandas()
    assert len(cand) > 0
    assert ((cand.doc_a == 0) | (cand.doc_b == 0)).all()
    # pair (1, 2) exists without the filter
    cfg2 = IntertextConfig()
    cand2 = candidates_stage(
        hashbands_stage(signatures_stage(windows_stage(docs, cfg2), cfg2), cfg2),
        cfg2,
        2,
    ).to_pandas()
    assert ((cand2.doc_a == 1) & (cand2.doc_b == 2)).any()


def test_xml_extraction():
    xml = "<doc><header>skip me</header><body>keep <b>this</b> &amp; that</body></doc>"
    out = extract_xml_text(xml, base_tag="body")
    assert "keep" in out and "this" in out and "&" in out
    assert "skip" not in out
    out2 = extract_xml_text(xml, base_tag="doc", remove_tags=("header",))
    assert "skip" not in out2 and "keep" in out2
    assert extract_xml_text("<a>x</a>", base_tag="missing") == ""


def test_xml_in_windows_stage(ray_session):
    words = " ".join(f"w{i}" for i in range(20))
    docs = _docs([f"<doc><meta>junk junk</meta><body>{words}</body></doc>"])
    cfg = IntertextConfig(xml_base_tag="body")
    w = windows_stage(docs, cfg).to_pandas()
    assert len(w) == 2  # 20 words -> 2 windows
    assert "junk" not in w.text.iloc[0]


def test_dup_doc_pairs(ray_session, tmp_path):
    from intertext_ray.pipelines.dedup import run_dedup

    t = " ".join(f"w{i}" for i in range(30))
    docs = _docs([t, t, "different content entirely " * 10])
    res = run_dedup(docs, IntertextConfig(), work_dir=str(tmp_path / "d"),
                    num_buckets=2, with_pair_clusters=False)
    dp = dup_doc_pairs(res.matches).to_pandas()
    assert len(dp) == 1
    assert (int(dp.doc_a[0]), int(dp.doc_b[0])) == (0, 1)
    assert dp.n_matches[0] == res.matches.count()
