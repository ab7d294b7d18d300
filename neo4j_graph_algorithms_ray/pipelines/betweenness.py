"""Betweenness centrality (``algo.betweenness[.sampled][.stream]``,
``BetweennessCentralityProc.java:69-163``) — Brandes over batched sources.

- exact: every vertex is a source (``BetweennessCentrality.java:76-83``),
- sampled (RA-Brandes): k seeded-random sources, result scaled by
  ``nodeCount / k`` (``RABrandesBetweennessCentrality.java:177``,
  ``RandomSelectionStrategy.java``),
- direction OUTGOING default (proc :81); BOTH = undirected traversal with
  the accumulated dependencies halved (each geodesic counted from both
  endpoints; the proc's ``direction:'both'`` fixture expects exactly half).

Execution: ``BrandesShard`` actors (state/brandes_shard.py) — forward
sigma-push BSP rounds, backward per-depth dependency pulls; centrality
accumulates in-actor across batches.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..state.brandes_shard import BrandesShard
from ..state.shards import make_shard_actors
from .centrality import pick_sources
from .graph_build import BuiltGraph


@dataclass
class BetweennessResult:
    scores: rd.Dataset  # {vid, centrality}
    nodes: int
    metrics: dict = field(default_factory=dict)


def _transpose(refs, P):
    if P == 1:
        return [[refs[0]]]
    return [[refs[q][p] for q in range(P)] for p in range(P)]


def betweenness_centrality(
    graph: BuiltGraph,
    *,
    direction: str = "OUTGOING",
    sample_sources: int | None = None,
    max_depth: int = 10_000,
    source_batch: int = 64,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    max_batches: int | None = None,
) -> BetweennessResult:
    """``source_batch`` sources run concurrently per pass (unlike MS-BFS's
    bitmask ω=32, Brandes state carries a plain per-source axis, so the batch
    width trades per-vertex memory — S*18 bytes — against the number of BSP
    wave sequences; wider batches halve driver-visible rounds).

    Checkpointing is per completed source batch (exact mode over a large
    graph is a long accumulation; a killed job resumes at the next batch)."""
    from ..state.checkpoint import CheckpointManager
    t0 = time.perf_counter()
    rev = graph.ensure_reverse_layout() if direction in ("INCOMING", "BOTH") else None
    actors = make_shard_actors(
        BrandesShard, graph, actor_kwargs={"rev_edges_dir": rev, "direction": direction}
    )
    P = graph.P
    ray.get([a.ready.remote() for a in actors])
    if P > 1:
        needs = [a.needed_vids.options(num_returns=P).remote() for a in actors]
        ray.get(
            [actors[q].register_requests.remote(*[needs[p][q] for p in range(P)]) for q in range(P)]
        )
    else:
        ray.get(actors[0].register_requests.remote(actors[0].needed_vids.remote()))
    ray.get([a.begin_pass.remote() for a in actors])

    ckpt = CheckpointManager(checkpoint_dir, "betweenness") if checkpoint_dir else None
    start_batch = 0
    if resume and ckpt is not None:
        m = ckpt.latest()
        if m is not None:
            ckpt.validate_resume(m, algo="betweenness", bounds=graph.bounds)
            files = {int(f.split("part=")[1].split(".")[0]): f for f in m["files"]}
            ray.get([actors[p].load_state.remote(files[p]) for p in range(P)])
            start_batch = m["iteration"] + 1

    n = graph.n_vertices
    sources = pick_sources(n, sample_sources)
    batches = [sources[i : i + source_batch] for i in range(0, len(sources), source_batch)]
    stop = len(batches) if max_batches is None else min(len(batches), start_batch + max_batches)
    for bi in range(start_batch, stop):
        batch = batches[bi]
        ray.get([a.start.remote(batch) for a in actors])
        # forward: BSP sigma push until the frontier dies
        depth = 0
        for depth in range(max_depth):
            outs = [
                a.fwd_push.options(num_returns=P).remote() if P > 1 else a.fwd_push.remote()
                for a in actors
            ]
            new = ray.get(
                [actors[p].fwd_absorb.remote(*chunks) for p, chunks in enumerate(_transpose(outs, P))]
            )
            if sum(new) == 0:
                break
        # backward: dependency accumulation from the deepest level down
        for d in range(depth, -1, -1):
            served = [
                a.serve_bwd.options(num_returns=P).remote() if P > 1 else a.serve_bwd.remote()
                for a in actors
            ]
            ray.get(
                [
                    actors[p].bwd_step.remote(d, *chunks)
                    for p, chunks in enumerate(_transpose(served, P))
                ]
            )
        ray.get([a.finish_batch.remote() for a in actors])
        if ckpt is not None:
            files = ray.get([a.save_state.remote(ckpt.state_dir(), bi) for a in actors])
            ckpt.commit_iteration(
                bi,
                files,
                {"bounds": [int(b) for b in graph.bounds], "algo": "betweenness"},
            )

    scale = 1.0
    if sample_sources is not None and len(sources) < n:
        scale = n / len(sources)  # RA-Brandes extrapolation
    if direction == "BOTH":
        scale *= 0.5  # undirected geodesics counted from both endpoints
    tabs = ray.get([a.centrality_table.remote(scale) for a in actors])
    for a in actors:
        ray.kill(a, no_restart=True)
    out = pa.concat_tables(tabs)
    return BetweennessResult(
        rd.from_arrow(out),
        n,
        metrics={
            "sources": len(sources),
            "direction": direction,
            "elapsed_s": time.perf_counter() - t0,
        },
    )
