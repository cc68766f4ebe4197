"""Output/formatting surface — the reference's S7-S11 sinks re-expressed
columnar-first (SURVEY.md §2.1): formatted match clusters with excerpts
(``format_matches``, ``/root/reference/intertext/intertext.py:577-629``),
word-count table + probability scores (ST2/A9, ``:1249-1271``), scatterplot
aggregates (A6, ``:745-783``), sort indices (SRT1, ``:702-739``), reader
texts (S10, ``:790-796``) and the job config manifest (S11, ``:325-345``).

All heavy steps are Dataset transforms; only the (small) formatted-cluster
table and the final sort indices materialize on the driver.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from intertext_ray.config import IntertextConfig
from intertext_ray.functions.text import display_words, substitute_page_url


def word_counts(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Exact corpus word counts (the reference approximates with a 64 MB
    bounter sketch, ``:1249-1258``; exact groupby-sum is the Ray-native
    equivalent).  Pre-aggregated per batch before the shuffle."""

    def partial_counts(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            c.update(t.split())
        if not c:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        words, ns = zip(*c.items())
        return pa.table({"word": pa.array(words, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    from ray.data.aggregate import Sum

    return (
        docs.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="count"))
    )


def word_counts_dict(docs: ray.data.Dataset) -> tuple[dict[str, int], int]:
    wc = word_counts(docs)
    d: dict[str, int] = {}
    total = 0
    for b in wc.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for w, n in zip(b["word"].to_pylist(), b["count"].to_pylist()):
            d[w] = int(n)
            total += int(n)
    return d, total


def string_prob(text: str, counts: dict[str, int], total: int) -> float:
    """One side of ``get_string_prob`` (``:1266-1271``)."""
    if not counts:
        return -1.0
    return sum(counts.get(w, 0) / total for w in text.split())


def match_strings(words: list[str], window_ids: list[int], cfg: IntertextConfig):
    """``get_match_strings`` (``:659-667``): excerpt strings from word
    offsets."""
    start = min(window_ids) * cfg.slide_length
    end = max(window_ids) * cfg.slide_length + cfg.window_length
    return {
        "prematch": " ".join(words[max(0, start - cfg.window_length) : start]).lstrip(
            "<br/>"
        ),
        "match": " ".join(words[start:end]),
        "postmatch": " ".join(words[end : end + cfg.window_length]).rstrip("<br/>"),
    }


_FORMATTED_COLUMNS = [
    "similarity", "probability", "source_file_id", "target_file_id",
    "source_segment_ids", "target_segment_ids",
    "source_prematch", "source_match", "source_postmatch",
    "target_prematch", "target_match", "target_postmatch",
    "source_author", "target_author", "source_title", "target_title",
    "source_year", "target_year", "source_url", "target_url",
]


def format_clusters_ds(
    pair_clusters: ray.data.Dataset,
    docs: ray.data.Dataset,
    cfg: IntertextConfig,
    metadata: dict[int, dict] | None = None,
    counts: tuple[dict[str, int], int] | None = None,
    num_buckets: int = 64,
    page_maps: dict[int, dict[int, str]] | None = None,
) -> ray.data.Dataset:
    """pair_clusters + doc texts -> formatted match rows as a DATASET
    (``format_matches`` fields, reference ``:577-629``, without ``_id``).

    Fully cluster-resident at corpus-proportional cluster counts: pair rows
    explode to one row per side keyed by that side's doc; ONE bucketed
    co-group with the docs table attaches the excerpt strings (each doc's
    display-word list is built once per bucket); a second co-group on the
    pair key pivots the two sides back together.  Only the small metadata /
    word-count dicts are broadcast.  ``format_clusters`` is the driver-side
    finisher (deterministic sort + ``_id``) for the api/ export.
    """
    from intertext_ray.functions.hashing import splitmix64

    metadata = metadata or {}
    meta_ref = ray.put(metadata)
    counts_ref = ray.put(counts if counts else ({}, 0))
    # N10: per-doc window->page maps (built by functions.text.window_page_map
    # at ingestion for XML corpora); broadcast once, read per bucket task
    pages_ref = ray.put(page_maps or {})
    nb = np.uint64(num_buckets)
    slide, wlen = cfg.slide_length, cfg.window_length

    def orient_and_explode(t: pa.Table) -> pa.Table:
        """Year-order the pair (N8) then emit one row per side keyed by
        that side's doc id."""
        md = ray.get(meta_ref)
        da = t["doc_a"].to_pylist()
        db = t["doc_b"].to_pylist()
        aseg = t["a_segments"].to_pylist()
        bseg = t["b_segments"].to_pylist()
        sims = t["similarity"].to_pylist()
        cols = {k: [] for k in (
            "side", "key", "src_doc", "tgt_doc", "ka", "kb", "seg", "sim")}
        for i in range(len(da)):
            sa, sb = int(da[i]), int(db[i])
            ga, gb = list(aseg[i]), list(bseg[i])
            ma, mb = md.get(sa, {}), md.get(sb, {})
            if ma.get("year") and mb.get("year") and mb["year"] < ma["year"]:
                sa, sb, ga, gb = sb, sa, gb, ga
            ka = ",".join(str(x) for x in ga)
            kb = ",".join(str(x) for x in gb)
            for side, key, seg in ((0, sa, ga), (1, sb, gb)):
                cols["side"].append(side)
                cols["key"].append(key)
                cols["src_doc"].append(sa)
                cols["tgt_doc"].append(sb)
                cols["ka"].append(ka)
                cols["kb"].append(kb)
                cols["seg"].append(seg)
                cols["sim"].append(int(sims[i]))
        return pa.table(
            {
                "side": pa.array(cols["side"], pa.int8()),
                "key": pa.array(cols["key"], pa.uint64()),
                "src_doc": pa.array(cols["src_doc"], pa.uint64()),
                "tgt_doc": pa.array(cols["tgt_doc"], pa.uint64()),
                "ka": pa.array(cols["ka"], pa.string()),
                "kb": pa.array(cols["kb"], pa.string()),
                "seg": pa.array(cols["seg"], pa.list_(pa.int32())),
                "sim": pa.array(cols["sim"], pa.int32()),
                "text": pa.nulls(len(cols["side"]), pa.string()),
            }
        )

    def tag_docs(t: pa.Table) -> pa.Table:
        n = len(t)
        doc = t["doc_id"]
        return pa.table(
            {
                "side": pa.array(np.full(n, -1, np.int8)),
                "key": pc_cast_u64(doc),
                "src_doc": pa.nulls(n, pa.uint64()),
                "tgt_doc": pa.nulls(n, pa.uint64()),
                "ka": pa.nulls(n, pa.string()),
                "kb": pa.nulls(n, pa.string()),
                "seg": pa.nulls(n, pa.list_(pa.int32())),
                "sim": pa.nulls(n, pa.int32()),
                "text": t["text"],
            }
        )

    def add_key_bucket(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((key % nb).astype(np.int64))
        )

    def attach_excerpts(g: pa.Table) -> pa.Table:
        sides = g["side"].to_numpy(zero_copy_only=False)
        is_doc = sides == -1
        dwords: dict[int, list[str]] = {}
        keys = g["key"].to_numpy(zero_copy_only=False)
        texts = g["text"].to_pylist()
        for i in np.nonzero(is_doc)[0]:
            dwords[int(keys[i])] = display_words(texts[i])
        out = {
            "side": [], "src_doc": [], "tgt_doc": [], "ka": [], "kb": [],
            "seg": [], "sim": [], "prematch": [], "match": [], "postmatch": [],
        }
        segs = g["seg"].to_pylist()
        srcs = g["src_doc"].to_pylist()
        tgts = g["tgt_doc"].to_pylist()
        kas = g["ka"].to_pylist()
        kbs = g["kb"].to_pylist()
        sims = g["sim"].to_pylist()
        for i in np.nonzero(~is_doc)[0]:
            words = dwords[int(keys[i])]
            s = match_strings(words, segs[i], cfg)
            out["side"].append(int(sides[i]))
            out["src_doc"].append(int(srcs[i]))
            out["tgt_doc"].append(int(tgts[i]))
            out["ka"].append(kas[i])
            out["kb"].append(kbs[i])
            out["seg"].append(segs[i])
            out["sim"].append(int(sims[i]))
            out["prematch"].append(s["prematch"])
            out["match"].append(s["match"])
            out["postmatch"].append(s["postmatch"])
        return pa.table(
            {
                "side": pa.array(out["side"], pa.int8()),
                "src_doc": pa.array(out["src_doc"], pa.uint64()),
                "tgt_doc": pa.array(out["tgt_doc"], pa.uint64()),
                "ka": pa.array(out["ka"], pa.string()),
                "kb": pa.array(out["kb"], pa.string()),
                "seg": pa.array(out["seg"], pa.list_(pa.int32())),
                "sim": pa.array(out["sim"], pa.int32()),
                "prematch": pa.array(out["prematch"], pa.string()),
                "match": pa.array(out["match"], pa.string()),
                "postmatch": pa.array(out["postmatch"], pa.string()),
            }
        )

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        sd = t["src_doc"].to_numpy(zero_copy_only=False).astype(np.uint64)
        td = t["tgt_doc"].to_numpy(zero_copy_only=False).astype(np.uint64)
        key = splitmix64(splitmix64(sd) ^ td)
        return t.append_column(
            "bucket", pa.array((key % nb).astype(np.int64))
        )

    def pivot_pairs(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        md = ray.get(meta_ref)
        cdict, ctotal = ray.get(counts_ref)
        pmaps = ray.get(pages_ref)
        keys = ["src_doc", "tgt_doc", "ka", "kb", "sim"]
        a = df[df["side"] == 0]
        b = df[df["side"] == 1][keys + ["seg", "prematch", "match", "postmatch"]]
        merged = a.merge(b, on=keys, how="inner", suffixes=("_s", "_t"))
        rows = []
        for r in merged.itertuples(index=False):
            d = r._asdict() if hasattr(r, "_asdict") else dict(zip(merged.columns, r))
            da, db = int(d["src_doc"]), int(d["tgt_doc"])
            ma, mb = md.get(da, {}), md.get(db, {})
            prob = -1.0
            if cdict:
                prob = (
                    round(
                        max(
                            string_prob(d["match_s"], cdict, ctotal),
                            string_prob(d["match_t"], cdict, ctotal),
                        ),
                        3,
                    )
                    * 1000
                )
            rows.append(
                (
                    int(d["sim"]), prob, da, db,
                    list(d["seg_s"]), list(d["seg_t"]),
                    d["prematch_s"], d["match_s"], d["postmatch_s"],
                    d["prematch_t"], d["match_t"], d["postmatch_t"],
                    ma.get("author", "Unknown"), mb.get("author", "Unknown"),
                    ma.get("title", str(da)), mb.get("title", str(db)),
                    str(ma.get("year", "")), str(mb.get("year", "")),
                    # N9 (get_url, :632-635): $PAGE_ID -> page of the
                    # cluster's first window via the N10 page map when one
                    # exists for the doc (XML corpora); plain passthrough
                    # otherwise (transcript rows)
                    substitute_page_url(
                        ma.get("url", ""), pmaps.get(da),
                        list(d["seg_s"])[0] if len(d["seg_s"]) else None),
                    substitute_page_url(
                        mb.get("url", ""), pmaps.get(db),
                        list(d["seg_t"])[0] if len(d["seg_t"]) else None),
                )
            )
        if not rows:
            return _formatted_empty()
        cols = list(zip(*rows))
        return pa.table(
            {
                "similarity": pa.array(cols[0], pa.int64()),
                "probability": pa.array(cols[1], pa.float64()),
                "source_file_id": pa.array(cols[2], pa.int64()),
                "target_file_id": pa.array(cols[3], pa.int64()),
                "source_segment_ids": pa.array(cols[4], pa.list_(pa.int64())),
                "target_segment_ids": pa.array(cols[5], pa.list_(pa.int64())),
                "source_prematch": pa.array(cols[6], pa.string()),
                "source_match": pa.array(cols[7], pa.string()),
                "source_postmatch": pa.array(cols[8], pa.string()),
                "target_prematch": pa.array(cols[9], pa.string()),
                "target_match": pa.array(cols[10], pa.string()),
                "target_postmatch": pa.array(cols[11], pa.string()),
                "source_author": pa.array(cols[12], pa.string()),
                "target_author": pa.array(cols[13], pa.string()),
                "source_title": pa.array(cols[14], pa.string()),
                "target_title": pa.array(cols[15], pa.string()),
                "source_year": pa.array(cols[16], pa.string()),
                "target_year": pa.array(cols[17], pa.string()),
                "source_url": pa.array(cols[18], pa.string()),
                "target_url": pa.array(cols[19], pa.string()),
            }
        )

    unioned = docs.map_batches(tag_docs, batch_format="pyarrow").union(
        pair_clusters.map_batches(orient_and_explode, batch_format="pyarrow")
    )
    resolved = (
        unioned.map_batches(add_key_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(attach_excerpts, batch_format="pyarrow")
    )
    return (
        resolved.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pivot_pairs, batch_format="pyarrow")
    )


def _formatted_empty() -> pa.Table:
    fields = {}
    for c in _FORMATTED_COLUMNS:
        if c in ("similarity", "source_file_id", "target_file_id"):
            fields[c] = pa.array([], pa.int64())
        elif c == "probability":
            fields[c] = pa.array([], pa.float64())
        elif c in ("source_segment_ids", "target_segment_ids"):
            fields[c] = pa.array([], pa.list_(pa.int64()))
        else:
            fields[c] = pa.array([], pa.string())
    return pa.table(fields)


def pc_cast_u64(col):
    import pyarrow.compute as _pc

    return _pc.cast(col, pa.uint64())


def format_clusters(
    pair_clusters: ray.data.Dataset,
    docs: ray.data.Dataset,
    cfg: IntertextConfig,
    metadata: dict[int, dict] | None = None,
    counts: tuple[dict[str, int], int] | None = None,
    page_maps: dict[int, dict[int, str]] | None = None,
) -> pd.DataFrame:
    """Driver-side finisher over :func:`format_clusters_ds`: deterministic
    total sort + ``_id`` row number (the reference's uuid4->int renumber
    collapses to that).  Only the final (small) formatted table and the
    sort indices live on the driver; all excerpt/join work is distributed.
    """
    df = format_clusters_ds(
        pair_clusters, docs, cfg, metadata, counts, page_maps=page_maps
    ).to_pandas()
    if df.empty:
        return pd.DataFrame(columns=["_id"] + _FORMATTED_COLUMNS)
    # deterministic TOTAL order: (source, target, segment-lists) is unique
    # per row, so the row order — and hence `_id` and every downstream
    # groupby-first — is independent of Ray block arrival order
    df["_ka"] = df["source_segment_ids"].map(
        lambda s: ",".join(str(x) for x in s)
    )
    df["_kb"] = df["target_segment_ids"].map(
        lambda s: ",".join(str(x) for x in s)
    )
    df = df.sort_values(
        ["source_file_id", "target_file_id", "similarity", "_ka", "_kb"],
        ignore_index=True,
    ).drop(columns=["_ka", "_kb"])
    df.insert(0, "_id", np.arange(len(df)))
    return df


def scatterplot_aggregates(formatted: pd.DataFrame) -> pd.DataFrame:
    """A6 (``write_scatterplots``, ``:745-783``): for {source,target} ×
    {segment_ids,file_id,author} × {sum,mean}, grouped similarity stats with
    the representative-first row carried."""
    out = []
    for side in ("source", "target"):
        for unit in ("segment_ids", "file_id", "author"):
            if unit == "segment_ids":
                key = pd.Series(
                    [
                        f"{side}.{f}." + ".".join(str(s) for s in segs)
                        for f, segs in zip(
                            formatted[f"{side}_file_id"],
                            formatted[f"{side}_segment_ids"],
                        )
                    ],
                    index=formatted.index,
                ) if len(formatted) else pd.Series(dtype=str)
            else:
                key = formatted[f"{side}_{unit}"].astype(str) if len(formatted) else pd.Series(dtype=str)
            g = formatted.assign(key=key).groupby("key", sort=True)
            for stat in ("sum", "mean"):
                agg = g.similarity.sum() if stat == "sum" else g.similarity.mean()
                first = g.first()
                out.append(
                    pd.DataFrame(
                        {
                            "type": side,
                            "unit": unit,
                            "statistic": stat,
                            "key": agg.index,
                            "similarity": agg.values,
                            "title": first[f"{side}_title"].values,
                            "author": first[f"{side}_author"].values,
                            "match": first[f"{side}_match"].values,
                            "source_year": first["source_year"].values,
                            "target_year": first["target_year"].values,
                        }
                    )
                )
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame()


SORT_HEURISTICS = {
    # label -> (column, descending)  (SRT1, :723-739)
    "length": ("_len", True),
    "probability": ("probability", True),
    "similarity": ("similarity", True),
    "author": ("source_author", False),
    "title": ("source_title", False),
    "year": ("source_year", False),
}


def sort_indices(formatted: pd.DataFrame) -> dict[str, list[list]]:
    """SRT1: per heuristic, the ordered minimal match tuples."""
    if formatted.empty:
        return {k: [] for k in SORT_HEURISTICS}
    df = formatted.copy()
    df["_len"] = df.apply(
        lambda r: min(len(r["source_segment_ids"]), len(r["target_segment_ids"])),
        axis=1,
    )
    out = {}
    for label, (col, desc) in SORT_HEURISTICS.items():
        s = df.sort_values(col, ascending=not desc, kind="mergesort")
        out[label] = (
            s[["_id", "source_file_id", "target_file_id"]]
            .astype("int64")
            .to_numpy()
            .tolist()
        )
    return out


def write_api_outputs(
    out_dir: str,
    formatted: pd.DataFrame,
    docs: ray.data.Dataset,
    cfg: IntertextConfig,
    metadata: dict[int, dict] | None = None,
) -> None:
    """The api/ layout (S7-S11): matches per file, sort indices,
    scatterplots, reader texts, config manifest."""
    os.makedirs(out_dir, exist_ok=True)
    for sub in ("matches", "indices", "scatterplots", "texts"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
    by_file: dict[int, list] = {}
    for r in formatted.to_dict("records"):
        by_file.setdefault(int(r["source_file_id"]), []).append(r)
        by_file.setdefault(int(r["target_file_id"]), []).append(r)
    for fid, rows in by_file.items():
        with open(os.path.join(out_dir, "matches", f"{fid}.json"), "w") as f:
            json.dump(rows, f, default=str)
    for label, ids in sort_indices(formatted).items():
        with open(
            os.path.join(out_dir, "indices", f"match-ids-by-{label}.json"), "w"
        ) as f:
            json.dump(ids, f)
    sp = scatterplot_aggregates(formatted)
    for (side, unit, stat), grp in (
        sp.groupby(["type", "unit", "statistic"]) if len(sp) else []
    ):
        with open(
            os.path.join(out_dir, "scatterplots", f"{side}-{unit}-{stat}.json"), "w"
        ) as f:
            json.dump(grp.drop(columns=["type", "unit", "statistic"]).to_dict("records"), f)
    # reader texts (S10): display word lists per doc
    for b in docs.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for d, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            with open(os.path.join(out_dir, "texts", f"{int(d)}.json"), "w") as f:
                json.dump(display_words(t), f)
    config = {
        "window_length": cfg.window_length,
        "slide_length": cfg.slide_length,
        "min_sim": cfg.min_sim,
        "n_perm": cfg.n_perm,
        "hashband_length": cfg.hashband_length,
        "hashband_step": cfg.hashband_step,
        "semantic_hash": cfg.semantic_hash(),
        "metadata": {str(k): v for k, v in (metadata or {}).items()},
        "files_with_matches": sorted(by_file),
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f)
