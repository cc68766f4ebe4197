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
from intertext_ray.functions.text import display_words


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


def format_clusters(
    pair_clusters: ray.data.Dataset,
    docs: ray.data.Dataset,
    cfg: IntertextConfig,
    metadata: dict[int, dict] | None = None,
    counts: tuple[dict[str, int], int] | None = None,
) -> pd.DataFrame:
    """pair_clusters + doc texts -> the formatted match table
    (``format_matches`` fields, ``:577-629``, minus file paths/urls which
    have no analog for table rows; ``_id`` is a deterministic row number, the
    reference's uuid4->int renumber collapses to that).

    The doc texts needed for excerpts are only those appearing in clusters —
    a small set — fetched via a broadcast semi-join, not a shuffle.
    """
    metadata = metadata or {}
    pc = pair_clusters.to_pandas()
    if pc.empty:
        return pd.DataFrame(
            columns=[
                "_id", "similarity", "probability", "source_file_id",
                "target_file_id", "source_segment_ids", "target_segment_ids",
                "source_prematch", "source_match", "source_postmatch",
                "target_prematch", "target_match", "target_postmatch",
                "source_author", "target_author", "source_title",
                "target_title", "source_year", "target_year",
                "source_url", "target_url",
            ]
        )
    needed = set(pc.doc_a.astype(int)) | set(pc.doc_b.astype(int))
    needed_ref = ray.put(needed)

    def keep_needed(batch: pa.Table) -> pa.Table:
        ids = ray.get(needed_ref)
        m = np.array([int(d) in ids for d in
                      batch["doc_id"].to_numpy(zero_copy_only=False)], bool)
        return batch.filter(pa.array(m))

    texts: dict[int, str] = {}
    for b in docs.map_batches(keep_needed, batch_format="pyarrow").iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        for d, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            texts[int(d)] = t
    dwords = {d: display_words(t) for d, t in texts.items()}
    cdict, ctotal = counts if counts else ({}, 0)

    rows = []
    for r in pc.itertuples():
        da, db = int(r.doc_a), int(r.doc_b)
        a_seg, b_seg, sim = list(r.a_segments), list(r.b_segments), int(r.similarity)
        ma, mb = metadata.get(da, {}), metadata.get(db, {})
        # order_match_pair (N8, :638-656): source = earlier publication
        if ma.get("year") and mb.get("year") and mb["year"] < ma["year"]:
            da, db, a_seg, b_seg, ma, mb = db, da, b_seg, a_seg, mb, ma
        sa = match_strings(dwords[da], a_seg, cfg)
        sb = match_strings(dwords[db], b_seg, cfg)
        prob = -1.0
        if cdict:
            prob = (
                round(
                    max(
                        string_prob(sa["match"], cdict, ctotal),
                        string_prob(sb["match"], cdict, ctotal),
                    ),
                    3,
                )
                * 1000
            )
        rows.append(
            {
                "similarity": sim,
                "probability": prob,
                "source_file_id": da,
                "target_file_id": db,
                "source_segment_ids": a_seg,
                "target_segment_ids": b_seg,
                "source_prematch": sa["prematch"],
                "source_match": sa["match"],
                "source_postmatch": sa["postmatch"],
                "target_prematch": sb["prematch"],
                "target_match": sb["match"],
                "target_postmatch": sb["postmatch"],
                "source_author": ma.get("author", "Unknown"),
                "target_author": mb.get("author", "Unknown"),
                "source_title": ma.get("title", str(da)),
                "target_title": mb.get("title", str(db)),
                "source_year": str(ma.get("year", "")),
                "target_year": str(mb.get("year", "")),
                # N9 (get_url, :632-635): plain url passthrough — the
                # $PAGE_ID substitution needs the XML page map (N10), which
                # has no analog for transcript rows
                "source_url": ma.get("url", ""),
                "target_url": mb.get("url", ""),
            }
        )
    df = pd.DataFrame(rows)
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
                key = formatted.apply(
                    lambda r: f"{side}.{r[side + '_file_id']}."
                    + ".".join(str(s) for s in r[side + "_segment_ids"]),
                    axis=1,
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
