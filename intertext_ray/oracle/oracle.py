"""Single-process oracle implementing the reference pipeline semantics
exactly (SURVEY.md §5) — the golden-fixture generator for the Ray engine.

It reproduces, step by step, the semantics of
``/root/reference/intertext/intertext.py``:

- windows: ``get_windows`` (:1180-1189) — 14-word shingles, keep every 4th;
- signatures: ``get_file_minhashes`` (:376-390) with OUR pinned permutation
  family (the reference's constants are in an unvendored external package);
- hashbands: overlapping bands, per-doc set dedup (:363-372);
- candidates: bands shared by >= 2 distinct docs -> all cross-doc pairs,
  canonical (min,max) doc order, exact-groupby semantics (:427-453; the
  reference's chunking quirks Q1/Q2 make its output a *subset* of this —
  modelled separately by :func:`candidates_with_ref_quirks`);
- matches: difflib verification + junk filter + min_sim (:479-510);
- pair run clustering (:546-568) and connected components (:1084-1125).

The oracle shares the hashing/text/similarity kernels with the engine (they
are deterministic pure functions); what it validates is the *distributed
orchestration* — shuffles, joins, dedup, clustering — against a straight-line
reference implementation.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field
from itertools import combinations

import numpy as np

from intertext_ray.config import IntertextConfig
from intertext_ray.functions.hashing import band_keys, minhash_texts, perm_seeds
from intertext_ray.functions.similarity import verify_pair
from intertext_ray.functions.text import get_sequences, tokenize, window_texts


@dataclass
class OracleResult:
    windows: dict[int, list[str]] = field(default_factory=dict)  # doc -> texts
    signatures: dict[int, np.ndarray] = field(default_factory=dict)
    hashbands: set[tuple[int, int, int]] = field(default_factory=set)  # (band, doc, win) — band as int
    candidates: set[tuple[int, int, int, int]] = field(default_factory=set)
    matches: dict[tuple[int, int, int, int], int] = field(default_factory=dict)
    pair_clusters: list[dict] = field(default_factory=list)
    components: dict[tuple[int, int], int] = field(default_factory=dict)

    def dup_doc_pairs(self) -> set[tuple[int, int]]:
        return {(a, b) for (a, b, _, _) in self.matches}


def doc_windows(text: str, cfg: IntertextConfig) -> list[str]:
    return window_texts(
        tokenize(text, cfg.strip_diacritics), cfg.window_length, cfg.slide_length
    )


def doc_signatures(windows: list[str], cfg: IntertextConfig) -> np.ndarray:
    """(n_windows, n_perm) uint32 — reference lowercases then encodes each
    window before shingle-hashing (``intertext/intertext.py:385``); the
    shared :func:`minhash_texts` kernel pins identical semantics here and in
    the Ray MinHasher actor."""
    seeds = perm_seeds(cfg.n_half, cfg.hash_seed)
    if not windows:
        return np.empty((0, cfg.n_perm), dtype=np.uint32)
    return minhash_texts(windows, seeds, cfg.chargram_length, cfg.mirror)


def run_oracle(
    docs: dict[int, str],
    cfg: IntertextConfig | None = None,
    banished_doc_ids: set[int] | None = None,
    excluded_doc_ids: set[int] | None = None,
) -> OracleResult:
    cfg = cfg or IntertextConfig()
    res = OracleResult()

    # 1. windows + signatures + hashbands
    band_to_docwins: dict[int, set[tuple[int, int]]] = defaultdict(set)
    for doc_id in sorted(docs):
        ws = doc_windows(docs[doc_id], cfg)
        res.windows[doc_id] = ws
        sig = doc_signatures(ws, cfg)
        res.signatures[doc_id] = sig
        if len(ws) == 0:
            continue
        bk = band_keys(sig, cfg.hashband_length, cfg.hashband_step, cfg.hash_seed)
        # per-doc set dedup, as the reference's set() (:363-372)
        triples = {
            (int(bk[w, j]), doc_id, w)
            for w in range(bk.shape[0])
            for j in range(bk.shape[1])
        }
        res.hashbands |= triples
        for band, d, w in triples:
            band_to_docwins[band].add((d, w))

    # 2. candidates: exact groupby semantics (superset of reference, Q1-Q3).
    # The hot-band row cap is mirrored from the engine
    # (``stages/candidates.py _emit_pairs_from_sorted``): bands with more
    # (doc,window) rows than ``band_docs_cap`` emit no pairs, so the oracle
    # stays the engine's golden twin on capped corpora too.
    for band, vals in band_to_docwins.items():
        if cfg.band_docs_cap and len(vals) > cfg.band_docs_cap:
            continue
        if len({d for d, _ in vals}) < 2:
            continue
        for (da, wa), (db, wb) in combinations(sorted(vals), 2):
            if da == db:
                continue
            if da < db:
                res.candidates.add((da, db, wa, wb))
            else:
                res.candidates.add((db, da, wb, wa))

    # 3. verification (difflib + junk filter + min_sim, int-cast)
    for da, db, wa, wb in sorted(res.candidates):
        ta = res.windows[da][wa]
        tb = res.windows[db][wb]
        sim = verify_pair(
            ta, tb, cfg.min_sim, cfg.window_length, cfg.junk_single_char_frac
        )
        if sim is not None:
            res.matches[(da, db, wa, wb)] = sim

    # 3b. banish: remove matches whose window-node is within graph distance
    # < banish_distance of a banished-doc node (:1084-1106) — BFS over the
    # match graph.
    if banished_doc_ids:
        adj: dict[tuple[int, int], set[tuple[int, int]]] = defaultdict(set)
        for da, db, wa, wb in res.matches:
            adj[(da, wa)].add((db, wb))
            adj[(db, wb)].add((da, wa))
        # reference keeps nodes at distance >= banish_distance (strict '<',
        # :1103) — expand BFS only while the child would still be killed
        frontier = [n for n in adj if n[0] in banished_doc_ids]
        dist = {n: 0 for n in frontier}
        while frontier:
            nxt = []
            for n in frontier:
                if dist[n] + 1 >= cfg.banish_distance:
                    continue
                for m in adj[n]:
                    if m not in dist:
                        dist[m] = dist[n] + 1
                        nxt.append(m)
            frontier = nxt
        kill = set(dist)  # all nodes at distance < banish_distance
        res.matches = {
            k: v
            for k, v in res.matches.items()
            if (k[0], k[2]) not in kill and (k[1], k[3]) not in kill
        }

    # 4. per-pair run clustering (:546-568)
    by_pair: dict[tuple[int, int], list[tuple[int, int, int]]] = defaultdict(list)
    for (da, db, wa, wb), sim in res.matches.items():
        by_pair[(da, db)].append((wa, wb, sim))
    excluded = excluded_doc_ids or set()
    win_counts = {d: len(w) for d, w in res.windows.items()}
    for (da, db), rows in sorted(by_pair.items()):
        if da in excluded or db in excluded:
            continue
        if cfg.max_file_sim is not None:
            if len(rows) > win_counts[da] * cfg.max_file_sim or len(
                rows
            ) > win_counts[db] * cfg.max_file_sim:
                continue
        d: dict[int, dict[int, int]] = defaultdict(dict)
        for wa, wb, sim in rows:
            d[wa][wb] = sim
        a_ids = [r[0] for r in rows]
        b_ids = [r[1] for r in rows]
        for a_run in get_sequences(a_ids):
            for b_run in get_sequences(b_ids):
                ca, cb, sims = set(), set(), []
                for ai in a_run:
                    for bi in b_run:
                        if d.get(ai, {}).get(bi):
                            ca.add(ai)
                            cb.add(bi)
                            sims.append(d[ai][bi])
                if ca and cb:
                    sim = int(sum(sims) / len(sims))
                    if sim < cfg.min_sim:
                        continue
                    res.pair_clusters.append(
                        {
                            "doc_a": da,
                            "doc_b": db,
                            "a_segments": sorted(ca),
                            "b_segments": sorted(cb),
                            "similarity": sim,
                        }
                    )

    # 5. connected components over match window-nodes (:1084-1125)
    parent: dict[tuple[int, int], tuple[int, int]] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        for n in (x, y):
            if n not in parent:
                parent[n] = n
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for da, db, wa, wb in res.matches:
        union((da, wa), (db, wb))
    roots: dict[tuple[int, int], int] = {}
    for n in sorted(parent):
        r = find(n)
        if r not in roots:
            roots[r] = len(roots)
        res.components[n] = roots[r]
    return res


def candidates_with_ref_quirks(
    hashbands: set[tuple[int, int, int]], batch_size: int = 10**5, n_chunks: int = 1
) -> set[tuple[int, int, int, int]]:
    """Model the reference's chunked candidate generation including quirks
    Q1/Q2 (``intertext/intertext.py:398-453``): rows sorted by band, paginated
    into ``batch_size`` blocks, each block subdivided into ``n_chunks``; the
    final band group *of every chunk* emits no pairs (Q1), and groups split
    across chunk boundaries emit only intra-fragment pairs (Q2).

    Used for recall accounting: reference output ⊆ this ⊆ exact groupby.
    """
    rows = sorted(hashbands)  # (band, doc, win) ordered by band
    out: set[tuple[int, int, int, int]] = set()

    def process_chunk(chunk):
        if not chunk:
            return
        last = chunk[0][0]
        vals: set[tuple[int, int]] = set()
        for idx, (band, doc, win) in enumerate(chunk):
            if band == last:
                vals.add((doc, win))
            else:  # Q1: the elif-on-last-row branch is unreachable when the
                # final row extends the current group, so that group never
                # emits.
                last = band
                for (da, wa), (db, wb) in combinations(vals, 2):
                    if da == db:
                        continue
                    out.add(
                        (da, db, wa, wb) if da < db else (db, da, wb, wa)
                    )
                vals = {(doc, win)}

    for start in range(0, len(rows), batch_size):
        block = rows[start : start + batch_size]
        size = max(1, len(block) // n_chunks)
        for cstart in range(0, len(block), size):
            process_chunk(block[cstart : cstart + size])
    return out
