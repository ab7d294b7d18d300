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
That is fine up to O(10^8) vertices per task; beyond, switch to the
alternating large-star/small-star groupby algorithm (Kiveris et al., "CC in
MapReduce"), which this layout supports without changing the result contract.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count

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


def mscoloring(graph: "BuiltGraph") -> rd.Dataset:
    """MSColoring (``MSColoring.java:96-121``, ``MSColoringProc.java:53``):
    every node converges to the **max** id reachable over either direction —
    component labels with a max-vid canonical root (the kernel's
    bidirectional CAS max-exchange makes it undirected).  Computed from the
    CC labels by one small per-component max join: {vid, color}."""
    from ray.data.aggregate import Max

    res = connected_components(graph)
    cmax = res.labels.groupby("label").aggregate(Max("vid", alias_name="color"))
    joined = res.labels.join(cmax, "inner", max(1, graph.P), on=("label",))
    return joined.select_columns(["vid", "color"])


@dataclass
class ComponentsResult:
    labels: rd.Dataset  # {vid: int64, label: int64} for ALL vertices
    nodes: int
    metrics: dict = field(default_factory=dict)

    def set_count(self) -> int:
        return len(self.labels.unique("label"))

    def set_sizes(self) -> rd.Dataset:
        """{label, size} — mirrors DisjointSetStruct.getSetSize (dss/DisjointSetStruct.java:238-244)."""
        return self.labels.groupby("label").aggregate(Count(alias_name="size"))


def connected_components(
    graph: BuiltGraph,
    *,
    threshold: float | None = None,
    fanin: int = 8,
    max_rounds: int = 64,
) -> ComponentsResult:
    """Edge table -> per-vertex component labels (min-vid canonical)."""
    cols = ["src", "dst", "weight"] if threshold is not None else ["src", "dst"]
    edges = graph.edges_ds(columns=cols)
    if threshold is not None:
        thr = float(threshold)
        edges = edges.map_batches(
            lambda t: t.filter(pc.greater_equal(t["weight"], thr)).select(["src", "dst"]),
            batch_format="pyarrow",
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

    # assembly: all vertices; isolated -> own vid
    verts = graph.vertices_ds().select_columns(["vid"])
    joined = verts.join(
        star.rename_columns({"v": "vid", "root": "label"}),
        "left_outer",
        max(1, graph.P),
        on=("vid",),
    )
    labels = joined.map_batches(
        lambda t: pa.table(
            {
                "vid": t["vid"],
                "label": pc.coalesce(t["label"], t["vid"]).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return ComponentsResult(
        labels=labels,
        nodes=graph.n_vertices,
        metrics={"reduce_rounds": rounds, "threshold": threshold},
    )
