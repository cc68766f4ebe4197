"""Clustering — connected components over verified pairs (reference D5,
``/root/reference/intertext/intertext.py:1084-1125``) and per-pair run
clustering (A5/F3, ``:546-568``), plus banish graph pruning (D4) and the
intended ``max_file_sim`` gate (A7; the reference's own path crashes — quirk
Q6).

Components: the verified-match graph is orders of magnitude smaller than the
input (it is the reference's driver-side networkx graph), so union-find runs
on the driver over STREAMED match batches (``iter_batches`` — never
``take_all``).  Scale path: if the pair set ever outgrew driver memory,
swap in iterative min-label propagation (large-star/small-star) over the
same Dataset — the call site is this one function.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from intertext_ray.config import IntertextConfig
from intertext_ray.functions.text import get_sequences


class UnionFind:
    __slots__ = ("parent", "rank")

    def __init__(self):
        self.parent: dict = {}
        self.rank: dict = {}

    def find(self, x):
        p = self.parent
        if x not in p:
            p[x] = x
            self.rank[x] = 0
            return x
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.rank[ra] < self.rank[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        if self.rank[ra] == self.rank[rb]:
            self.rank[ra] += 1


_DOC_ID_LIMIT = 1 << 32


def _check_doc_ids(*arrays) -> None:
    """The packed (doc<<32|win) node-key / component_id representation needs
    doc_id < 2^32.  Ids from the documented splitmix64 fallback
    (``sources/clips.py``) can be full-64-bit — fail LOUDLY instead of
    silently truncating/merging (renumber ids densely at ingestion, e.g.
    ``sources.clips.doc_ids_for_clip_ids`` numeric ids, for this path)."""
    for a in arrays:
        if len(a) and int(np.asarray(a).max()) >= _DOC_ID_LIMIT:
            raise ValueError(
                "components: doc_id >= 2^32 cannot use the packed uint64 "
                "node-key representation — renumber doc ids densely at "
                "ingestion (see sources/clips.py docstring / SCALING.md §ids)"
            )


def _cc_min_label(ui: np.ndarray, vi: np.ndarray, n: int) -> np.ndarray:
    """Vectorized connected components over dense edge index arrays:
    min-label propagation with full pointer-doubling compression per round.
    Labels start as identity and only decrease, so the fixpoint label of a
    component is its minimum node index (proof: labels never exceed their
    node index, so the component's uniform fixpoint label L satisfies
    L <= min and L >= min).  O(log n) rounds, every step a numpy kernel —
    no Python per-edge loop (~50x the dict union-find on 10^6-edge graphs).
    """
    label = np.arange(n, dtype=np.int64)
    if len(ui) == 0:
        return label
    while True:
        m = np.minimum(label[ui], label[vi])
        np.minimum.at(label, ui, m)
        np.minimum.at(label, vi, m)
        while True:
            nl = label[label]
            if np.array_equal(nl, label):
                break
            label = nl
        if np.array_equal(label[ui], label[vi]):
            return label


def components_from_matches(matches: ray.data.Dataset) -> pa.Table:
    """matches -> components table (doc_id, window_id, component_id).

    component_id = the minimum packed (doc<<32|window) node key of the
    component — deterministic, independent of visit order.  doc_id must be
    < 2^32 (checked, loud error) so the packed key is exact; the same
    packing is used by :func:`banish_filter` (Python ints) — the keyspaces
    are value-identical under this check.

    Driver-side but fully vectorized: edges stream in as batches, the
    union-find is :func:`_cc_min_label` over dense-renumbered node keys
    (np.unique) — the serial tail stays milliseconds even at 10^6+ matches.
    """
    us, vs = [], []
    for b in matches.iter_batches(batch_size=65536, batch_format="pyarrow"):
        da = b["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        db = b["doc_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        wa = b["win_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        wb = b["win_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        _check_doc_ids(da, db)
        us.append((da << np.uint64(32)) | wa)
        vs.append((db << np.uint64(32)) | wb)
    if not us:
        return pa.table(
            {
                "doc_id": pa.array([], pa.uint64()),
                "window_id": pa.array([], pa.int32()),
                "component_id": pa.array([], pa.uint64()),
            }
        )
    u = np.concatenate(us)
    v = np.concatenate(vs)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    label = _cc_min_label(inv[: len(u)], inv[len(u) :], len(nodes))
    comp = nodes[label]
    return pa.table(
        {
            "doc_id": pa.array(nodes >> np.uint64(32), pa.uint64()),
            "window_id": pa.array(
                (nodes & np.uint64(0xFFFFFFFF)).astype(np.int32), pa.int32()
            ),
            "component_id": pa.array(comp, pa.uint64()),
        }
    )


def doc_clusters_from_components(components: pa.Table) -> pa.Table:
    """Collapse window-level components to doc-level duplicate clusters
    (north_rule's cluster assignment): doc joins the component of any of its
    windows; transitive doc-level merge via a second (vectorized) union-find
    over the doc–component bipartite graph.  Doc node indices sort below
    component node indices, so the min-label fixpoint per cluster is its
    minimum doc — the cluster id."""
    doc = components["doc_id"].to_numpy(zero_copy_only=False)
    comp = components["component_id"].to_numpy(zero_copy_only=False)
    if len(doc) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.uint64()),
                "dup_cluster_id": pa.array([], pa.uint64()),
            }
        )
    uniq_docs, inv_d = np.unique(doc, return_inverse=True)
    uniq_comps, inv_c = np.unique(comp, return_inverse=True)
    n_d = len(uniq_docs)
    label = _cc_min_label(inv_d, n_d + inv_c, n_d + len(uniq_comps))
    cluster = uniq_docs[label[:n_d]]
    return pa.table(
        {
            "doc_id": pa.array(uniq_docs, pa.uint64()),
            "dup_cluster_id": pa.array(cluster, pa.uint64()),
        }
    )


def survivors_filter(
    docs: ray.data.Dataset,
    doc_clusters: ray.data.Dataset,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """The keep-one-per-cluster deliverable of a training-data dedup: the
    doc_ids that SURVIVE — every doc except non-minimal members of dup
    clusters (``dup_cluster_id`` is the cluster's minimum doc, so the
    keeper is the doc equal to its own cluster id).

    Cluster-resident anti-join: both sides reduce to slim (doc_id, flag)
    rows, one hash-bucketed shuffle co-locates each doc with any drop
    marker, the per-group filter is a vectorized sorted membership test —
    no driver-side drop set, no broadcast proportional to the dup count.
    """
    from intertext_ray.functions.hashing import splitmix64

    nb = np.uint64(num_buckets)

    def doc_side(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "drop": pa.array(np.zeros(len(d), np.int8), pa.int8()),
                "bucket": pa.array(
                    (splitmix64(d.astype(np.uint64)) % nb).astype(np.int64)
                ),
            }
        )

    def drop_side(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b["dup_cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = d[d != c]
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "drop": pa.array(np.ones(len(d), np.int8), pa.int8()),
                "bucket": pa.array(
                    (splitmix64(d.astype(np.uint64)) % nb).astype(np.int64)
                ),
            }
        )

    def keep(group: pa.Table) -> pa.Table:
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        f = group["drop"].to_numpy(zero_copy_only=False)
        dropped = np.unique(d[f == 1])
        src = d[f == 0]
        mask = ~np.isin(src, dropped)
        return pa.table({"doc_id": pa.array(src[mask], pa.int64())})

    tagged = docs.select_columns(["doc_id"]).map_batches(
        doc_side, batch_format="pyarrow"
    ).union(
        doc_clusters.map_batches(drop_side, batch_format="pyarrow")
    )
    return tagged.groupby("bucket").map_groups(keep, batch_format="pyarrow")


def components_distributed(
    matches: ray.data.Dataset,
    num_buckets: int = 32,
    max_iters: int = 200,
) -> pa.Table:
    """Distributed connected components — min-label propagation over the
    verified-pair graph, every step a Ray Data shuffle (the scale path when
    the pair graph outgrows driver memory; :func:`components_from_matches`
    is the driver-side default since the graph is usually tiny relative to
    the corpus).

    Per iteration: co-group (labels ∪ edge-endpoint references) by node
    bucket to resolve each endpoint's current label, emit the label to the
    opposite endpoint, take the per-node min.  Labels only ever decrease, so
    the global label sum is strictly decreasing until fixpoint — a
    convergence test needing no join.  Component id = min packed node key,
    matching :func:`components_from_matches` exactly.
    """
    from intertext_ray.functions.hashing import splitmix64

    nb = np.uint64(num_buckets)

    def pack_edges(b: pa.Table) -> pa.Table:
        da = b["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        db = b["doc_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        wa = b["win_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        wb = b["win_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        _check_doc_ids(da, db)
        u = (da << np.uint64(32)) | wa
        v = (db << np.uint64(32)) | wb
        return pa.table({"u": pa.array(u, pa.uint64()), "v": pa.array(v, pa.uint64())})

    edges = matches.map_batches(pack_edges, batch_format="pyarrow").materialize()

    def init_labels(b: pa.Table) -> pa.Table:
        n = np.concatenate(
            [
                b["u"].to_numpy(zero_copy_only=False),
                b["v"].to_numpy(zero_copy_only=False),
            ]
        )
        n = np.unique(n)
        return pa.table(
            {"node": pa.array(n, pa.uint64()), "label": pa.array(n, pa.uint64())}
        )

    def dedup_nodes(g: pa.Table) -> pa.Table:
        n = g["node"].to_numpy(zero_copy_only=False)
        l = g["label"].to_numpy(zero_copy_only=False)
        order = np.argsort(n, kind="stable")
        n, l = n[order], l[order]
        keep = np.ones(len(n), bool)
        keep[1:] = n[1:] != n[:-1]
        # per-node min label (labels sorted within equal nodes not needed:
        # reduce via minimum.reduceat)
        starts = np.nonzero(keep)[0]
        lmin = np.minimum.reduceat(l, starts) if len(n) else l
        # convergence signal: a node CHANGED this round iff its new min label
        # is below its previous label (the 'own'-tagged row).  Exact and
        # overflow-free, unlike comparing successive Sum(label) values
        # (uint64 sums can wrap / lose precision in lossy accumulators).
        if "own" in g.column_names and len(n):
            own = g["own"].to_numpy(zero_copy_only=False)[order]
            l_own = np.where(own == 1, l, np.uint64(0xFFFFFFFFFFFFFFFF))
            old = np.minimum.reduceat(l_own, starts)
            changed = (lmin < old).astype(np.int64)
        else:
            changed = np.zeros(len(starts), dtype=np.int64)
        return pa.table(
            {
                "node": pa.array(n[keep], pa.uint64()),
                "label": pa.array(lmin, pa.uint64()),
                "changed": pa.array(changed, pa.int64()),
            }
        )

    def add_node_bucket(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((splitmix64(node) % nb).astype(np.int64))
        )

    # keep the label table at a CONSTANT block count: each round unions
    # labels twice with refs, and groupby output inherits input block
    # counts — without the repartition the block count (and per-round task
    # overhead) grows geometrically with the iteration number
    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .map_batches(add_node_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(dedup_nodes, batch_format="pyarrow")
        .repartition(num_buckets)
        .materialize()
    )

    def edge_refs(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        v = b["v"].to_numpy(zero_copy_only=False)
        # one reference row per endpoint: resolve its label, send to peer
        return pa.table(
            {
                "node": pa.array(np.concatenate([u, v]), pa.uint64()),
                "peer": pa.array(np.concatenate([v, u]), pa.uint64()),
                "label": pa.nulls(2 * len(b), pa.uint64()),
                "kind": pa.array(
                    np.ones(2 * len(b), np.int8), pa.int8()
                ),
            }
        )

    refs = edges.map_batches(edge_refs, batch_format="pyarrow").materialize()
    for _ in range(max_iters):
        def tag_labels(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": t["node"],
                    "peer": pa.nulls(len(t), pa.uint64()),
                    "label": t["label"],
                    "kind": pa.array(np.zeros(len(t), np.int8), pa.int8()),
                }
            )

        def resolve(g: pa.Table) -> pa.Table:
            df = g.to_pandas()
            lab = df[df["kind"] == 0][["node", "label"]]
            ref = df[df["kind"] == 1][["node", "peer"]]
            merged = ref.merge(lab, on="node", how="inner")
            # message to the peer + keep own labels in circulation ('own'
            # marks the previous label so the next dedup pass can count
            # changed nodes — the convergence signal)
            out_node = np.concatenate(
                [merged["peer"].to_numpy(np.uint64), lab["node"].to_numpy(np.uint64)]
            )
            out_label = np.concatenate(
                [merged["label"].to_numpy(np.uint64), lab["label"].to_numpy(np.uint64)]
            )
            out_own = np.concatenate(
                [np.zeros(len(merged), np.int8), np.ones(len(lab), np.int8)]
            )
            return pa.table(
                {
                    "node": pa.array(out_node, pa.uint64()),
                    "label": pa.array(out_label, pa.uint64()),
                    "own": pa.array(out_own, pa.int8()),
                }
            )

        # pointer-jump refs: resolve label(label(n)) in the SAME co-group as
        # the edge propagation — contracts chains exponentially (O(log d)
        # rounds) at no extra shuffle
        def jump_refs(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": t["label"],
                    "peer": t["node"],
                    "label": pa.nulls(len(t), pa.uint64()),
                    "kind": pa.array(np.ones(len(t), np.int8), pa.int8()),
                }
            )

        unioned = (
            labels.map_batches(tag_labels, batch_format="pyarrow")
            .union(refs)
            .union(labels.map_batches(jump_refs, batch_format="pyarrow"))
        )
        msgs = (
            unioned.map_batches(add_node_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(resolve, batch_format="pyarrow")
        )
        labels = (
            msgs.map_batches(add_node_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(dedup_nodes, batch_format="pyarrow")
            .repartition(num_buckets)
            .materialize()
        )
        from ray.data.aggregate import Sum

        n_changed = labels.aggregate(Sum("changed", alias_name="n"))["n"]
        if not n_changed:
            break

    tbl = pa.concat_tables(
        [b for b in labels.iter_batches(batch_size=65536, batch_format="pyarrow")]
    )
    node = tbl["node"].to_numpy(zero_copy_only=False)
    label = tbl["label"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": pa.array(node >> np.uint64(32), pa.uint64()),
            "window_id": pa.array(
                (node & np.uint64(0xFFFFFFFF)).astype(np.int32), pa.int32()
            ),
            "component_id": pa.array(label, pa.uint64()),
        }
    )


def dup_doc_pairs(matches: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct (doc_a, doc_b) pairs with >= 1 verified match + match count
    (reference A4 ``SELECT DISTINCT file_id_a, file_id_b``,
    ``intertext/intertext.py:999-1016``; the count doubles as the A7
    file-similarity numerator)."""
    from ray.data.aggregate import Count

    return (
        matches.select_columns(["doc_a", "doc_b"])
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_matches"))
    )


def banish_filter(
    matches: ray.data.Dataset,
    banished_doc_ids: set[int],
    cfg: IntertextConfig,
) -> ray.data.Dataset:
    """Reference banish semantics (D4, ``:1084-1106``): BFS over the match
    graph from banished-doc nodes; delete matches touching any node at
    distance < banish_distance.  Banished docs flow through the WHOLE
    pipeline as ordinary corpus members first — banishing is post-match graph
    pruning, not input filtering (SURVEY.md §3.3)."""
    if not banished_doc_ids:
        return matches
    adj: dict[int, set[int]] = defaultdict(set)
    for b in matches.iter_batches(batch_size=65536, batch_format="pyarrow"):
        da = b["doc_a"].to_numpy(zero_copy_only=False)
        db = b["doc_b"].to_numpy(zero_copy_only=False)
        wa = b["win_a"].to_numpy(zero_copy_only=False)
        wb = b["win_b"].to_numpy(zero_copy_only=False)
        for i in range(len(da)):
            na = (int(da[i]) << 32) | int(wa[i])
            nb = (int(db[i]) << 32) | int(wb[i])
            adj[na].add(nb)
            adj[nb].add(na)
    frontier = [n for n in adj if (n >> 32) in banished_doc_ids]
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
    kill = dist.keys()
    kill_ref = ray.put(set(kill))

    def drop(batch: pa.Table) -> pa.Table:
        ks = ray.get(kill_ref)
        da = batch["doc_a"].to_numpy(zero_copy_only=False)
        db = batch["doc_b"].to_numpy(zero_copy_only=False)
        wa = batch["win_a"].to_numpy(zero_copy_only=False)
        wb = batch["win_b"].to_numpy(zero_copy_only=False)
        keep = np.array(
            [
                ((int(da[i]) << 32) | int(wa[i])) not in ks
                and ((int(db[i]) << 32) | int(wb[i])) not in ks
                for i in range(len(da))
            ],
            dtype=bool,
        )
        return batch.filter(pa.array(keep))

    return matches.map_batches(drop, batch_format="pyarrow")


def _blocked_pairs(
    matches: ray.data.Dataset,
    windows: ray.data.Dataset,
    max_fs: float,
    num_buckets: int,
) -> ray.data.Dataset:
    """Distributed max_file_sim gate (A7): doc pairs whose match count
    exceeds ``max_fs`` × either side's window count, computed without any
    driver-side dict (VERDICT r1 item 7).

    Three small exchanges, each over *aggregated* rows only:

    1. per-pair match counts — per-batch pandas combiner, then a
       pair-bucket groupby sums partials (one row per distinct pair);
    2. per-doc window counts — per-batch combiner over the windows table
       (only ``(doc, n)`` partials enter the shuffle, never window rows);
    3. pair counts explode to one row per side and co-group with the doc
       counts in a doc-bucket exchange, where the threshold comparison
       runs vectorized.

    Returns a Dataset of (doc_a, doc_b) uint64 rows (a pair may appear
    twice when both sides violate — callers treat presence as a flag).
    """
    nb = np.uint64(num_buckets)
    from intertext_ray.functions.hashing import splitmix64

    _long_schema = pa.schema(
        {
            "bucket": pa.int64(),
            "side": pa.int8(),
            "doc": pa.uint64(),
            "doc_a": pa.uint64(),
            "doc_b": pa.uint64(),
            "n": pa.int64(),
        }
    )

    def pair_partials(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _long_schema.empty_table()
        df = (
            t.select(["doc_a", "doc_b"])
            .to_pandas()
            .groupby(["doc_a", "doc_b"], as_index=False, sort=False)
            .size()
        )
        da = df["doc_a"].to_numpy().astype(np.uint64)
        db = df["doc_b"].to_numpy().astype(np.uint64)
        key = splitmix64(splitmix64(da) ^ db)
        return pa.table(
            {
                "bucket": pa.array((key % nb).astype(np.int64)),
                "side": pa.array(np.full(len(df), 2, np.int8)),
                "doc": pa.array(np.zeros(len(df), np.uint64)),
                "doc_a": pa.array(da),
                "doc_b": pa.array(db),
                "n": pa.array(df["size"].to_numpy().astype(np.int64)),
            },
            schema=_long_schema,
        )

    def sum_pairs(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return _long_schema.empty_table()
        df = (
            g.to_pandas()
            .groupby(["doc_a", "doc_b"], as_index=False, sort=False)["n"]
            .sum()
        )
        # explode to one row per side, re-bucketed by that side's doc
        da = df["doc_a"].to_numpy().astype(np.uint64)
        db = df["doc_b"].to_numpy().astype(np.uint64)
        n = df["n"].to_numpy().astype(np.int64)
        doc = np.concatenate([da, db])
        return pa.table(
            {
                "bucket": pa.array((doc % nb).astype(np.int64)),
                "side": pa.array(np.zeros(2 * len(df), np.int8)),
                "doc": pa.array(doc),
                "doc_a": pa.array(np.concatenate([da, da])),
                "doc_b": pa.array(np.concatenate([db, db])),
                "n": pa.array(np.concatenate([n, n])),
            },
            schema=_long_schema,
        )

    def count_partials(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _long_schema.empty_table()
        df = (
            t.select(["doc_id"])
            .to_pandas()
            .groupby("doc_id", as_index=False, sort=False)
            .size()
        )
        doc = df["doc_id"].to_numpy().astype(np.uint64)
        z = np.zeros(len(df), np.uint64)
        return pa.table(
            {
                "bucket": pa.array((doc % nb).astype(np.int64)),
                "side": pa.array(np.ones(len(df), np.int8)),
                "doc": pa.array(doc),
                "doc_a": pa.array(z),
                "doc_b": pa.array(z),
                "n": pa.array(df["size"].to_numpy().astype(np.int64)),
            },
            schema=_long_schema,
        )

    _blocked_schema = pa.schema({"doc_a": pa.uint64(), "doc_b": pa.uint64()})

    def filter_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        wc = df[df["side"] == 1].groupby("doc")["n"].sum()
        pr = df[df["side"] == 0]
        if pr.empty:
            return _blocked_schema.empty_table()
        cnt = pr["doc"].map(wc).fillna(0).to_numpy()
        bad = pr[pr["n"].to_numpy() > cnt * max_fs]
        return pa.table(
            {
                "doc_a": pa.array(bad["doc_a"].to_numpy().astype(np.uint64)),
                "doc_b": pa.array(bad["doc_b"].to_numpy().astype(np.uint64)),
            },
            schema=_blocked_schema,
        )

    pair_long = (
        matches.map_batches(pair_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(sum_pairs, batch_format="pyarrow")
    )
    wc_long = windows.map_batches(
        count_partials, batch_format="pyarrow", zero_copy_batch=True
    )
    return (
        pair_long.union(wc_long)
        .groupby("bucket")
        .map_groups(filter_bucket, batch_format="pyarrow")
    )


def pair_clusters_stage(
    matches: ray.data.Dataset,
    cfg: IntertextConfig,
    windows: ray.data.Dataset | None = None,
    excluded_doc_ids: set[int] | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per doc-pair run clustering (reference ``format_file_matches``
    :546-568): bucketed groupby on (doc_a, doc_b), runs of consecutive
    window ids on each side, cross product of runs keeping cells with actual
    matches, integer-mean similarity re-filtered by min_sim.

    The intended max_file_sim gate (A7) is fully distributed: when
    ``cfg.max_file_sim`` is set, :func:`_blocked_pairs` computes violating
    pairs from the ``windows`` Dataset and they ride the SAME pair-bucket
    exchange as the matches, tagged with a ``win_a = -1`` sentinel — no
    per-doc dict ever touches the driver.  ``excluded_doc_ids`` is the N5
    filter (a small user-provided exclusion list, broadcast by closure).
    """
    excluded = excluded_doc_ids or set()
    max_fs = cfg.max_file_sim
    min_sim = cfg.min_sim
    nb = np.uint64(num_buckets)

    from intertext_ray.functions.hashing import splitmix64

    def add_bucket(t: pa.Table) -> pa.Table:
        da = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        db = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        key = splitmix64(splitmix64(da) ^ db)
        return t.append_column("bucket", pa.array((key % nb).astype(np.int64)))

    def blocked_to_match_rows(t: pa.Table) -> pa.Table:
        n = len(t)
        tbl = pa.table(
            {
                "doc_a": t["doc_a"],
                "doc_b": t["doc_b"],
                "win_a": pa.array(np.full(n, -1, np.int32)),
                "win_b": pa.array(np.full(n, -1, np.int32)),
                "similarity": pa.array(np.zeros(n, np.int32)),
            }
        )
        return add_bucket(tbl)

    def cluster_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        rows = []
        for (da, db), grp in df.groupby(["doc_a", "doc_b"], sort=True):
            da, db = int(da), int(db)
            if da in excluded or db in excluded:
                continue
            if (grp["win_a"].to_numpy() < 0).any():
                continue  # max_file_sim sentinel row present -> pair blocked
            d: dict[int, dict[int, int]] = defaultdict(dict)
            wa = grp["win_a"].to_numpy()
            wb = grp["win_b"].to_numpy()
            sims = grp["similarity"].to_numpy()
            for a, b, s in zip(wa, wb, sims):
                d[int(a)][int(b)] = int(s)
            for a_run in get_sequences(wa):
                for b_run in get_sequences(wb):
                    ca, cb, cs = set(), set(), []
                    for ai in a_run:
                        for bi in b_run:
                            if d.get(ai, {}).get(bi):
                                ca.add(ai)
                                cb.add(bi)
                                cs.append(d[ai][bi])
                    if ca and cb:
                        sim = int(sum(cs) / len(cs))
                        if sim < min_sim:
                            continue
                        rows.append(
                            (da, db, sorted(ca), sorted(cb), sim)
                        )
        if not rows:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.uint64()),
                    "doc_b": pa.array([], pa.uint64()),
                    "a_segments": pa.array([], pa.list_(pa.int32())),
                    "b_segments": pa.array([], pa.list_(pa.int32())),
                    "similarity": pa.array([], pa.int32()),
                }
            )
        da_, db_, aseg, bseg, sim_ = zip(*rows)
        return pa.table(
            {
                "doc_a": pa.array(da_, pa.uint64()),
                "doc_b": pa.array(db_, pa.uint64()),
                "a_segments": pa.array(aseg, pa.list_(pa.int32())),
                "b_segments": pa.array(bseg, pa.list_(pa.int32())),
                "similarity": pa.array(sim_, pa.int32()),
            }
        )

    shuffled = matches.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    if max_fs is not None and windows is not None:
        blocked = _blocked_pairs(matches, windows, max_fs, num_buckets)
        shuffled = shuffled.union(
            blocked.map_batches(
                blocked_to_match_rows, batch_format="pyarrow", zero_copy_batch=True
            )
        )
    return shuffled.groupby("bucket").map_groups(
        cluster_bucket, batch_format="pyarrow"
    )
