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


def test_window_page_map_attr_and_sequential():
    """N10 (reference get_window_map, intertext.py:1192-1237): page ids from
    an attribute, and sequential ids for bare self-closing tags."""
    from intertext_ray.functions.text import window_page_map

    words_p1 = " ".join(f"w{i}" for i in range(8))
    words_p2 = " ".join(f"v{i}" for i in range(8))
    xml = f'<doc><pb n="iv"/>{words_p1}<pb n="v"/>{words_p2}</doc>'
    m = window_page_map(xml, slide_length=4, xml_page_tag="pb", xml_page_attr="n")
    # 8 words/page, slide 4. Reference quirks preserved exactly
    # (intertext.py:1225-1236): the per-page word index restarts without
    # advancing window_id, so the last window of a page is overwritten by
    # the next page's first words (straddle maps to the LATER page) and one
    # window id is "lost" per boundary -> ids are {0, 1, 2}
    assert m == {0: "iv", 1: "v", 2: "v"}
    # no attr and no closing tag -> sequential page index
    m2 = window_page_map(xml, slide_length=4, xml_page_tag="pb")
    assert m2 == {0: "0", 1: "1", 2: "1"}
    # unset tag -> no map
    assert window_page_map(xml, 4, None) is None


def test_window_page_map_between_tags():
    from intertext_ray.functions.text import window_page_map

    # the reference splits on '<tag ' (attributed open) — a bare '<page>'
    # is NOT a page boundary (intertext.py:1206-1208)
    xml = (
        '<doc><page type="t">12</page> a b c d e f g h '
        '<page type="t">13</page> i j k l</doc>'
    )
    m = window_page_map(xml, slide_length=4, xml_page_tag="page")
    # page text includes the id text itself ("12 a b c ..."), matching the
    # reference's get_text() over the remaining markup
    assert m[0] == "12"
    assert m[max(m)] == "13"
    assert window_page_map("<doc><page>12</page> x</doc>", 4, "page") == {}


def test_substitute_page_url():
    from intertext_ray.functions.text import substitute_page_url

    assert substitute_page_url("u/$PAGE_ID", None, 0) == "u/$PAGE_ID"
    assert substitute_page_url("u/$PAGE_ID", {0: "iv"}, 0) == "u/iv"
    assert substitute_page_url("u/$PAGE_ID", {0: "iv"}, 5) == "u/"
    assert substitute_page_url("u/$PAGE_ID", {0: "iv"}, None) == "u/"


def test_format_clusters_page_url(ray_session, tmp_path):
    """$PAGE_ID flows through the distributed formatter (N9+N10)."""
    import ray.data as rd

    from intertext_ray.config import IntertextConfig
    from intertext_ray.pipelines.dedup import run_dedup
    from intertext_ray.stages.exports import format_clusters

    text = " ".join(f"tok{i % 37}" for i in range(120))
    docs = rd.from_items(
        [{"doc_id": 1, "text": text}, {"doc_id": 2, "text": text}]
    ).map_batches(lambda b: b, batch_format="pyarrow")
    cfg = IntertextConfig()
    res = run_dedup(docs, cfg, work_dir=str(tmp_path / "w"), num_buckets=4)
    meta = {
        1: {"url": "http://x/$PAGE_ID", "title": "a"},
        2: {"url": "http://y/plain", "title": "b"},
    }
    pmaps = {1: {w: f"p{w}" for w in range(64)}}
    df = format_clusters(
        res.pair_clusters, docs, cfg, metadata=meta, page_maps=pmaps
    )
    assert len(df) > 0
    srcs = set()
    for _, row in df.iterrows():
        for url, fid, segs in (
            (row["source_url"], row["source_file_id"], row["source_segment_ids"]),
            (row["target_url"], row["target_file_id"], row["target_segment_ids"]),
        ):
            if fid == 1:
                assert url == f"http://x/p{int(list(segs)[0])}"
                srcs.add(url)
            else:
                assert url == "http://y/plain"
    assert srcs
