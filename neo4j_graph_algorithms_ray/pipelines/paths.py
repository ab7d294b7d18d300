"""Single-pair shortest path with path reconstruction
(``algo.shortestPath[.stream]``, ``ShortestPathProc.java:73,103``;
kernel ``ShortestPathDijkstra.java`` — source-to-target cost plus the actual
node sequence).

Built on the SSSP BSP relaxation (``SsspShard``) extended with deterministic
predecessor tracking (smallest-vid predecessor among equal-cost parents).
The path walk queries the owning shard per hop — path output is inherently
tiny (<= path length actor calls), so a driver-side walk is the right shape
even at cluster scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import ray

from ..state.bfs_shards import SsspShard
from ..state.shards import make_shard_actors
from .graph_build import BuiltGraph


@dataclass
class ShortestPathResult:
    path: pd.DataFrame  # {step, vid, cost_u, cost} — cost is the exact double
    total_cost: float
    node_count: int
    metrics: dict = field(default_factory=dict)


def shortest_path(
    graph: BuiltGraph,
    source: int,
    target: int | None = None,
    *,
    weighted: bool = False,
    max_rounds: int = 10_000,
) -> ShortestPathResult:
    """Shortest path source -> target; ``target=None`` picks the farthest
    reachable vertex (max finite distance, tie -> max vid), which gives the
    driver contract a deterministic single-pair query."""
    from .centrality import run_fused_rounds

    n = graph.n_vertices
    if not (0 <= int(source) < n) or (target is not None and not (0 <= int(target) < n)):
        raise ValueError(
            f"shortest_path: source/target must be vids in [0, {n}); "
            f"got source={source} target={target}"
        )
    actors = make_shard_actors(SsspShard, graph, actor_kwargs={"weighted": weighted})
    try:
        ray.get([a.ready.remote() for a in actors])
        ray.get([a.start.remote(int(source)) for a in actors])
        rounds = run_fused_rounds(actors, "step", max_rounds, on_cap="shortestPath relaxation")

        bounds = graph.bounds

        def owner(vid: int) -> int:
            return int(np.searchsorted(bounds, vid, side="right") - 1)

        if target is None:
            # farthest reachable: max distance then max vid (deterministic)
            import pyarrow as pa

            tabs = ray.get([a.dist_table.remote() for a in actors])
            t = pa.concat_tables(tabs)
            d = t["distance"].to_numpy()
            v = t["vid"].to_numpy()
            finite = np.isfinite(d)
            dv, vv = d[finite], v[finite]
            order = np.lexsort((-vv, -dv))
            target = int(vv[order[0]])

        # walk back through predecessors (per-hop shard lookups)
        hops = []
        cur = int(target)
        total = float("inf")
        while True:
            dcur, pred = ray.get(actors[owner(cur)].path_info.remote(cur))
            if cur == int(target):
                total = dcur  # first hop IS the target — no separate fetch
            if not np.isfinite(dcur):
                hops = []  # unreachable target
                break
            hops.append((cur, dcur))
            if cur == int(source) or pred < 0:
                break
            cur = int(pred)
    finally:
        # any failure (shard error, cancel) must not leak the pool — the
        # sibling pipelines all kill their actors on the error path too
        for a in actors:
            ray.kill(a, no_restart=True)
    hops.reverse()
    costs = np.array([h[1] for h in hops], dtype=np.float64)
    path = pd.DataFrame(
        {
            "step": np.arange(len(hops), dtype=np.int64),
            "vid": np.array([h[0] for h in hops], dtype=np.int64),
            # cost_u is the 1e3-quantized transport the SQL oracle replays;
            # cost is the exact double the stream proc emits
            # (ShortestPathProc.java streams unrounded doubles)
            "cost_u": np.floor(costs * 1000 + 0.5).astype(np.int64),
            "cost": costs,
        }
    )
    return ShortestPathResult(
        path=path,
        total_cost=float(total) if np.isfinite(total) else float("inf"),
        node_count=len(hops),
        metrics={"rounds": rounds, "source": int(source), "target": int(target)},
    )
