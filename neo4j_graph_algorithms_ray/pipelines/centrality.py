"""Closeness / harmonic centrality via multi-source BFS, and SSSP.

Reference semantics:

- closeness: normalized ``(reached - 1) / farness`` with farness accumulated
  from MS-BFS visits (``MSClosenessCentrality.java``; default Wasserman-Faust
  off -> plain component-local normalization ``(n_reachable-1)/farness``),
- harmonic: ``inv_farness / (nodeCount - 1)``
  (``MSHarmonicCentrality.java``), summing ``count/depth`` per visit,
- shortest paths: Dijkstra / delta-stepping
  (``ShortestPathDijkstra.java``, ``ShortestPathDeltaStepping.java``) — here
  a BSP min-relaxation over shard actors (unweighted BFS or weighted
  Bellman-Ford rounds; non-negative weights converge to the same fixpoint
  delta-stepping reaches, traded for simpler rounds).

Sources run in batches of 32 (bitmask MS-BFS, ``MultiSourceBFS.java:52``).
``sample_sources`` bounds the work at scale (RA-Brandes-style source
sampling, ``RandomSelectionStrategy.java``); None = exact (all vertices).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..state.bfs_shards import MsBfsShard, SsspShard
from ..state.shards import make_shard_actors
from .graph_build import BuiltGraph


def _transpose(refs, P):
    if P == 1:
        return [[refs[0]]]
    return [[refs[q][p] for q in range(P)] for p in range(P)]


def _run_batch(actors, P, sources: np.ndarray, max_depth: int):
    ray.get([a.start.remote(sources) for a in actors])
    for _ in range(max_depth):
        outs = [
            a.expand.options(num_returns=P).remote() if P > 1 else a.expand.remote()
            for a in actors
        ]
        new = ray.get(
            [actors[p].absorb.remote(*chunks) for p, chunks in enumerate(_transpose(outs, P))]
        )
        if sum(new) == 0:
            break


@dataclass
class CentralityResult:
    scores: rd.Dataset  # {vid, centrality}
    nodes: int
    metrics: dict = field(default_factory=dict)


def _centrality(
    graph: BuiltGraph,
    kind: str,
    *,
    direction: str = "BOTH",
    sample_sources: int | None = None,
    max_depth: int = 64,
) -> CentralityResult:
    rev = graph.ensure_reverse_layout() if direction in ("INCOMING", "BOTH") else None
    actors = make_shard_actors(
        MsBfsShard, graph, actor_kwargs={"rev_edges_dir": rev, "direction": direction}
    )
    P = graph.P
    ray.get([a.ready.remote() for a in actors])

    n = graph.n_vertices
    sources = np.arange(n if sample_sources is None else min(n, sample_sources), dtype=np.int64)
    batches = [sources[i : i + 32] for i in range(0, len(sources), 32)]

    # accumulate stats across batches on the driver side per shard
    totals = None
    for b in batches:
        _run_batch(actors, P, b, max_depth)
        tabs = ray.get([a.stats_table.remote() for a in actors])
        t = pa.concat_tables(tabs)
        if totals is None:
            totals = {
                "vid": t["vid"].to_numpy().copy(),
                "reached": t["reached"].to_numpy().copy(),
                "farness": t["farness"].to_numpy().copy(),
                "inv": t["inv_farness"].to_numpy().copy(),
            }
        else:
            # shard order (and each shard's arange) is identical every batch,
            # so the vid axis is aligned across batches
            assert np.array_equal(totals["vid"], t["vid"].to_numpy())
            totals["reached"] += t["reached"].to_numpy()
            totals["farness"] += t["farness"].to_numpy()
            totals["inv"] += t["inv_farness"].to_numpy()

    if totals is None:
        empty = pa.table({"vid": pa.array([], pa.int64()), "centrality": pa.array([], pa.float64())})
        return CentralityResult(rd.from_arrow(empty), 0)

    if kind == "closeness":
        with np.errstate(divide="ignore", invalid="ignore"):
            c = np.where(totals["farness"] > 0, totals["reached"] / totals["farness"], 0.0)
    else:  # harmonic
        c = totals["inv"] / max(1, n - 1)
    out = pa.table({"vid": pa.array(totals["vid"]), "centrality": pa.array(c)})
    return CentralityResult(
        rd.from_arrow(out),
        n,
        metrics={"sources": len(sources), "batches": len(batches), "direction": direction},
    )


def closeness_centrality(graph: BuiltGraph, **kw) -> CentralityResult:
    return _centrality(graph, "closeness", **kw)


def harmonic_centrality(graph: BuiltGraph, **kw) -> CentralityResult:
    return _centrality(graph, "harmonic", **kw)


@dataclass
class SsspResult:
    distances: rd.Dataset  # {vid, distance}
    rounds: int
    nodes: int


def shortest_paths(
    graph: BuiltGraph, source: int, *, weighted: bool = False, max_rounds: int = 10_000
) -> SsspResult:
    actors = make_shard_actors(SsspShard, graph, actor_kwargs={"weighted": weighted})
    P = graph.P
    ray.get([a.ready.remote() for a in actors])
    ray.get([a.start.remote(int(source)) for a in actors])
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        outs = [
            a.relax.options(num_returns=P).remote() if P > 1 else a.relax.remote()
            for a in actors
        ]
        improved = ray.get(
            [actors[p].absorb.remote(*chunks) for p, chunks in enumerate(_transpose(outs, P))]
        )
        if sum(improved) == 0:
            break
    dists = rd.from_arrow(pa.concat_tables(ray.get([a.dist_table.remote() for a in actors])))
    return SsspResult(distances=dists, rounds=rounds, nodes=graph.n_vertices)
