"""Union-find connected components (headline algorithm #2).

Reference semantics (``GraphUnionFind.java:57-99``, ``UnionFindProcExec``):
one pass over edges unioning endpoints — optionally only where
``weight >= threshold`` (``GraphUnionFind.java:89-93``) — then per-node
``setId = find(node)``; parallel variants build per-partition structs and
merge them pairwise (``ParallelUnionFindForkJoin.java:97-122``).

Ray-Data-native shape (SURVEY.md §2.2):

1. **block-local contraction** — a stateless ``map_batches`` over edge blocks
   computes each block's components with a *vectorized* min-label +
   pointer-jumping kernel (no Python loop over edges) and emits the block's
   star edges ``{v, root}`` (<= #distinct vertices per block rows; this is
   the spanning information, like the reference's per-partition DSS),
2. **logarithmic tree-reduce** — ``repartition`` the star edges into ``1/fanin``
   as many blocks and contract again, until one block remains (the pairwise
   struct merge of the reference, as a reduction tree),
3. **result assembly** — left-join the vertex table: isolated vertices get
   their own vid; canonical component label = min vid in the component
   (deterministic, unlike the reference's union-order-dependent root —
   compared as partitions, FIXTURES.md §3).

Scale note: the final reduce step sees ~one row per non-isolated vertex.
That is fine up to O(10^8) vertices per task; beyond, pass
``mode='starcontract'`` for the alternating large-star/small-star groupby
algorithm (Kiveris et al., "CC in MapReduce and Beyond") — same min-vid
result contract, no per-task component materialization.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .graph_build import BuiltGraph


def local_components(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized CC over one edge block: returns (vertices, min-vid root)."""
    verts = np.unique(np.concatenate([src, dst]))
    s = np.searchsorted(verts, src)
    d = np.searchsorted(verts, dst)
    label = np.arange(len(verts), dtype=np.int64)
    while True:
        before = label.copy()
        np.minimum.at(label, s, label[d])
        np.minimum.at(label, d, label[s])
        while True:  # pointer jumping to full compression
            nxt = label[label]
            if np.array_equal(nxt, label):
                break
            label = nxt
        if np.array_equal(label, before):
            break
    return verts, verts[label]


def _contract_batch(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return pa.table({"v": pa.array([], pa.int64()), "root": pa.array([], pa.int64())})
    src = t.column(0).to_numpy().astype(np.int64, copy=False)
    dst = t.column(1).to_numpy().astype(np.int64, copy=False)
    verts, roots = local_components(src, dst)
    return pa.table({"v": pa.array(verts), "root": pa.array(roots)})


def _star_contraction(
    graph: BuiltGraph, edges: rd.Dataset, *, max_rounds: int = 64, prog=None
) -> rd.Dataset:
    """Alternating large-star / small-star rounds (Kiveris et al. 2014).

    Every round is two bucketed groupby shuffles over the current edge set;
    per-reduce state is one vertex's neighbor list, so no task ever
    materializes a component — the property that lets this run past the
    tree-reduce path's ~10^8-vertices-per-final-task ceiling.  Convergence:
    the edge multiset stops changing (count + order-free checksum), at which
    point every edge is a (child, min-root) star pointer.
    """
    import pandas as pd

    from ..stages.agg import grouped_map

    n_buckets = 64

    def canon(t: pa.Table) -> pa.Table:
        s = t.column(0).to_numpy().astype(np.int64, copy=False)
        d = t.column(1).to_numpy().astype(np.int64, copy=False)
        keep = s != d
        u = np.minimum(s[keep], d[keep])
        v = np.maximum(s[keep], d[keep])
        m = np.unique(np.stack([u, v], axis=1), axis=0) if len(u) else np.empty((0, 2), np.int64)
        return pa.table({"u": pa.array(m[:, 0]), "v": pa.array(m[:, 1])})

    cur = edges.map_batches(canon, batch_format="pyarrow").materialize()

    def _checksum(ds: rd.Dataset) -> tuple[int, int]:
        """(row count, exact order-independent uint64 checksum).

        A float64 sum of ``u*31+v`` loses exactness past 2^53 — in the
        >10^8-vertex regime this mode exists for, distinct edge sets could
        compare equal (premature stop) and summation-order nondeterminism
        would defeat the early exit.  Instead: wraparound uint64 sum of a
        splitmix-style hash of each (u, v) row; per-block partials fold on
        the driver (one row per block)."""

        def partial(t: pa.Table) -> pa.Table:
            u = t["u"].to_numpy().astype(np.uint64, copy=False)
            v = t["v"].to_numpy().astype(np.uint64, copy=False)
            x = u * np.uint64(0x9E3779B97F4A7C15) ^ (v + np.uint64(0xC2B2AE3D27D4EB4F))
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            x ^= x >> np.uint64(31)
            s = np.uint64(0) if len(x) == 0 else np.add.reduce(x)  # wraps mod 2^64
            return pa.table(
                {
                    "n": pa.array([t.num_rows], pa.int64()),
                    "s": pa.array([int(s.view(np.int64))], pa.int64()),
                }
            )

        n_total = 0
        s_acc = np.zeros(1, dtype=np.uint64)  # array accumulator: silent wraparound
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            n_total += int(b["n"].to_numpy().sum())
            if b.num_rows:
                s_acc += np.add.reduce(b["s"].to_numpy().view(np.uint64))
        return n_total, int(s_acc[0])

    def _star_round(ds: rd.Dataset, large: bool) -> rd.Dataset:
        def emit(t: pa.Table) -> pa.Table:
            u = t["u"].to_numpy()
            v = t["v"].to_numpy()
            if large:  # symmetric: each endpoint sees the other
                key = np.concatenate([u, v])
                val = np.concatenate([v, u])
            else:  # key by the larger endpoint only
                key = v
                val = u
            return pa.table(
                {
                    "key": pa.array(key),
                    "val": pa.array(val),
                    "bucket": pa.array((key % n_buckets).astype(np.int64)),
                }
            )

        is_large = large

        def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
            """Per-key star emission, fully vectorized (segment reductions
            over (key, val)-sorted rows — no Python loop over keys; key
            cardinality scales with V)."""
            empty = pd.DataFrame(
                {"u": pd.Series(dtype=np.int64), "v": pd.Series(dtype=np.int64)}
            )
            if len(g) == 0 or "key" not in g.columns:
                return empty
            key = g["key"].to_numpy()
            val = g["val"].to_numpy()
            order = np.lexsort((val, key))
            key, val = key[order], val[order]
            keep = np.empty(len(key), dtype=bool)  # dedup (key, val) rows
            keep[0] = True
            keep[1:] = (key[1:] != key[:-1]) | (val[1:] != val[:-1])
            key, val = key[keep], val[keep]
            first = np.concatenate([[True], key[1:] != key[:-1]])
            seg_id = np.cumsum(first) - 1
            # per-segment min target = first val (rows sorted by val in-key)
            m_seg = np.minimum(val[first], key[first])
            m_row = m_seg[seg_id]
            if is_large:
                mask = val > key  # neighbors above the key re-point to m
                uu, vv = m_row[mask], val[mask]
            else:
                mask = val != m_row  # all distinct targets except m itself
                uu, vv = m_row[mask], val[mask]
                kk = key[first]
                kmask = kk != m_seg  # the key vertex is a target too
                uu = np.concatenate([uu, m_seg[kmask]])
                vv = np.concatenate([vv, kk[kmask]])
            if not len(uu):
                return empty
            m2 = np.unique(np.stack([np.minimum(uu, vv), np.maximum(uu, vv)], axis=1), axis=0)
            return pd.DataFrame({"u": m2[:, 0], "v": m2[:, 1]})

        out = grouped_map(
            ds.map_batches(emit, batch_format="pyarrow"), "bucket", reduce_bucket
        )
        # cross-bucket dedup via canonicalizing map (cheap page) then return
        return out.map_batches(
            lambda t: canon(pa.table({"src": t["u"], "dst": t["v"]}))
            if t.num_rows
            else pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}),
            batch_format="pyarrow",
        ).materialize()

    prev = _checksum(cur)
    converged = False
    for _round in range(max_rounds):
        cur = _star_round(cur, large=True)
        cur = _star_round(cur, large=False)
        now = _checksum(cur)
        if prog is not None:  # unit = large+small star round pair
            prog.report(_round, edge_rows=int(now[0]))
        if now == prev:
            converged = True
            break
        prev = now
    if not converged:
        # same contract as scc.py's outer loop: an exhausted cap would
        # silently FRAGMENT components (labels assembled from a non-star
        # edge set) — fail loud instead (Kiveris bound is O(log^2 n) rounds)
        raise RuntimeError(
            f"star-contraction still contracting at max_rounds={max_rounds}; "
            "raise max_rounds — truncating here would return fragmented "
            "component labels"
        )

    # final edge set is (root, child) star pointers with root = min vid;
    # lookup_join (not Dataset.join): a sparse label set can leave a hash
    # partition with zero left rows, which Ray's join crashes on
    # (stages/joins.py CAUTION) — default='key' IS the coalesce(label, vid)
    from ..stages.joins import lookup_join

    verts = graph.vertices_ds().select_columns(["vid"])
    star = cur.map_batches(
        lambda t: pa.table({"vid": t["v"], "label": t["u"]}), batch_format="pyarrow"
    )
    return lookup_join(
        verts, star, "vid", "label", default="key", num_partitions=max(1, graph.P)
    )


def mscoloring(graph: "BuiltGraph", cc: "ComponentsResult | None" = None) -> rd.Dataset:
    """MSColoring (``MSColoring.java:96-121``, ``MSColoringProc.java:53``):
    every node converges to the **max** id reachable over either direction —
    component labels with a max-vid canonical root (the kernel's
    bidirectional CAS max-exchange makes it undirected).  Computed from the
    CC labels (pass ``cc`` to reuse an existing run) by a per-component max
    (block-partial combine, driver fold under the cap) + broadcast lookup."""
    from ..stages.joins import lookup_join, small_group_agg

    res = cc if cc is not None else connected_components(graph)
    cmax = small_group_agg(res.labels, "label", "vid", "max", "color")
    return lookup_join(
        res.labels, cmax, "label", "color", default="key", num_partitions=max(1, graph.P)
    ).select_columns(["vid", "color"])


@dataclass
class ComponentsResult:
    labels: rd.Dataset  # {vid: int64, label: int64} for ALL vertices
    nodes: int
    metrics: dict = field(default_factory=dict)

    def set_count(self) -> int:
        """Distinct-label count WITHOUT shipping the label list to the
        driver: ``unique()`` materializes O(#components) Python values —
        gigabytes in the mostly-disconnected starcontract regime — where
        counting the rows of the same bucketed aggregate ``set_sizes``
        uses is one small scalar per bucket."""
        return int(self.set_sizes().count())

    def set_sizes(self) -> rd.Dataset:
        """{label, size} — mirrors DisjointSetStruct.getSetSize (dss/DisjointSetStruct.java:238-244).
        Component cardinality scales with V -> bucketed aggregate (stages/agg.py)."""
        from ..stages.agg import bucketed_agg

        return bucketed_agg(self.labels, "label", {"size": (None, "count")})


# above this many vertices the tree-reduce's final task (one row per
# non-isolated vertex) would not fit a single worker -> auto-select
# star-contraction, which never materializes a component in one task
TREEREDUCE_MAX_V = 100_000_000


def connected_components(
    graph: BuiltGraph,
    *,
    threshold: float | None = None,
    fanin: int = 8,
    max_rounds: int = 64,
    mode: str = "auto",
    on_progress=None,
    progress_interval_s: float = 10.0,
    progress_logger=None,
) -> ComponentsResult:
    """Edge table -> per-vertex component labels (min-vid canonical).

    ``mode='treereduce'``: block-local contraction + logarithmic
    tree-reduce — the final reduce task sees ~one row per non-isolated
    vertex, fine to ~10^8 vertices.  ``mode='starcontract'``: alternating
    large-star/small-star rounds (Kiveris et al., "Connected Components in
    MapReduce and Beyond") where every round is a plain groupby shuffle and
    **no task ever holds more than one vertex's neighborhood row set** —
    the beyond-10^8 path, same output contract.  ``mode='auto'`` (default)
    picks star-contraction when ``n_vertices > TREEREDUCE_MAX_V`` instead of
    silently hitting the tree-reduce ceiling."""
    from ..state.progress import make_reporter

    prog = make_reporter(on_progress, progress_interval_s, "unionFind", progress_logger)
    if mode == "auto":
        mode = "starcontract" if graph.n_vertices > TREEREDUCE_MAX_V else "treereduce"
    cols = ["src", "dst", "weight"] if threshold is not None else ["src", "dst"]
    edges = graph.edges_ds(columns=cols)
    if threshold is not None:
        thr = float(threshold)
        edges = edges.map_batches(
            lambda t: t.filter(pc.greater_equal(t["weight"], thr)).select(["src", "dst"]),
            batch_format="pyarrow",
        )
    if mode == "starcontract":
        labels_ds = _star_contraction(graph, edges, max_rounds=max_rounds, prog=prog)
        if prog is not None:
            prog.report(prog.last["iteration"] if prog.last else 0, final=True)
        return ComponentsResult(
            labels=labels_ds,
            nodes=graph.n_vertices,
            metrics={
                "mode": mode,
                "threshold": threshold,
                **(prog.summary() if prog is not None else {}),
            },
        )

    star = edges.map_batches(_contract_batch, batch_format="pyarrow", batch_size=None).materialize()
    rounds = 1
    while star.num_blocks() > 1 and rounds < max_rounds:
        k = max(1, star.num_blocks() // fanin)
        star = (
            star.repartition(k)
            .map_batches(_contract_batch, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
        rounds += 1
        if prog is not None:  # unit = tree-reduce level
            prog.report(rounds - 1, blocks=int(star.num_blocks()))
    if star.num_blocks() > 1:
        # cap exhausted mid-reduce: per-block partial stars would assemble
        # into FRAGMENTED labels — fail loud (same contract as the
        # star-contraction loop above and scc.py's outer loop)
        raise RuntimeError(
            f"unionFind tree-reduce still at {star.num_blocks()} blocks after "
            f"max_rounds={max_rounds} levels; raise max_rounds or fanin"
        )

    # assembly: all vertices; isolated -> own vid.  The star side holds only
    # non-isolated vertices — broadcast-lookup under the cap, shuffle join
    # above it (stages/joins.py lookup_join)
    from ..stages.joins import lookup_join

    verts = graph.vertices_ds().select_columns(["vid"])
    labels = lookup_join(
        verts,
        star.rename_columns({"v": "vid", "root": "label"}),
        "vid",
        "label",
        default="key",
        num_partitions=max(1, graph.P),
    )
    if prog is not None:
        prog.report(rounds - 1, final=True)
    return ComponentsResult(
        labels=labels,
        nodes=graph.n_vertices,
        metrics={
            "reduce_rounds": rounds,
            "threshold": threshold,
            **(prog.summary() if prog is not None else {}),
        },
    )
