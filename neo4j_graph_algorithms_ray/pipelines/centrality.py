"""Closeness / harmonic centrality via multi-source BFS, SSSP, and the
all-shortest-paths stream.

Reference semantics:

- closeness: ``(nodeCount - 1) / farness`` with farness accumulated from
  MS-BFS visits over OUTGOING edges, 0 when unreachable
  (``MSBFSCCAlgorithm.centrality``: ``f > 0 ? k / f : 0``,
  ``MSClosenessCentrality.java:64,76``; proc loads OUTGOING,
  ``ClosenessCentralityProc.java:73``),
- harmonic: ``inv_farness / (nodeCount - 1)`` over BOTH directions
  (``MSHarmonicCentrality.java:59,68``; proc ``HarmonicCentralityProc.java:75``),
- all-shortest-paths stream: ``(source, target, distance)`` rows from MS-BFS
  batches (``MSBFSAllShortestPaths.java``),
- shortest paths: BSP min-relaxation over shard actors (unweighted BFS or
  weighted Bellman-Ford rounds; same fixpoint as the reference's
  delta-stepping for non-negative weights, ``ShortestPathDeltaStepping.java``).

Sources run in batches of 64 (uint64-bitmask MS-BFS; the reference's
``MultiSourceBFS.java:52`` packs 32).
Default is **exact** (every vertex a source, like the reference).
``sample_sources=k`` bounds work at scale by drawing k sources with a seeded
Philox generator (random source sampling in the spirit of RA-Brandes'
``RandomSelectionStrategy.java``; partial sums are an approximation).
Per-vertex stats accumulate inside the shard actors across batches; the
driver fetches one table per shard at the end.
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


def run_fused_rounds(actors, step_method: str, max_rounds: int, *, on_cap: str | None = None) -> int:
    """Drive a fused push-exchange to fixpoint (shared by MS-BFS and SSSP).

    Round r's packed messages are round r+1's args (an ObjectRef chain the
    driver never fetches); the per-round progress counters are read with a
    two-round lag, so fixpoint costs two overshoot rounds (which push empty
    messages) instead of a per-round driver sync.  Returns the last round
    that made progress; all in-flight calls are drained before returning.

    ``max_rounds`` is a runaway safety, not a truncation knob: when
    ``on_cap`` is set and the exchange is still making progress at the cap,
    raise instead of silently returning partial results (same contract as
    ``betweenness._run_batch``)."""
    msgs = [getattr(a, step_method).options(num_returns=2).remote() for a in actors]
    counts: dict[int, list] = {}
    last_progress = 0
    r = 0
    while r < max_rounds:
        r += 1
        refs = [m[0] for m in msgs]
        msgs = [getattr(a, step_method).options(num_returns=2).remote(*refs) for a in actors]
        counts[r] = [m[1] for m in msgs]
        lag = r - 2
        if lag >= 1:
            if sum(ray.get(counts.pop(lag))) == 0:
                break
            last_progress = lag
    tail_alive = False
    for j in sorted(counts):  # drain the ≤2 in-flight tail rounds
        if sum(ray.get(counts[j])) > 0:
            last_progress = j
            tail_alive = j == max(counts)
    if on_cap is not None and r >= max_rounds and tail_alive:
        raise RuntimeError(
            f"{on_cap} still progressing at max_depth={max_rounds}; raise "
            f"maxDepth (graph diameter exceeds the cap) — truncating here "
            f"would silently skew the results"
        )
    return last_progress


def _run_batch(actors, P, sources: np.ndarray, max_depth: int):
    ray.get([a.start.remote(sources) for a in actors])
    run_fused_rounds(actors, "step", max_depth, on_cap="MS-BFS frontier")


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — stable uniform hash for seeded Bernoulli draws."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def pick_sources_degree(degrees: np.ndarray, seed: int = 7) -> np.ndarray:
    """Degree-proportional Bernoulli source selection for RA-Brandes
    (``RandomDegreeSelectionStrategy.java:49-62``: include each node with
    probability ``degree / maxDegree``).  The reference draws from
    SecureRandom; this uses a seeded splitmix64 hash of the vid so the
    selection is deterministic and the SQL oracle can replay the exact same
    source list.  The max-degree vertex is always selected (p = 1), so the
    sample is never empty on a non-empty graph."""
    deg = np.asarray(degrees, dtype=np.float64)
    if len(deg) == 0:
        return np.array([], dtype=np.int64)
    mx = float(deg.max())
    if mx <= 0:
        return np.array([], dtype=np.int64)
    vids = np.arange(len(deg), dtype=np.uint64)
    u01 = _mix64(vids ^ _mix64(np.full(len(deg), np.uint64(seed)))) / np.float64(2**64)
    return np.flatnonzero(u01 <= deg / mx).astype(np.int64)


def graph_out_degrees(graph: BuiltGraph) -> np.ndarray:
    """Dense out-degree array via a streaming partial-bincount pass over the
    edge table (no shuffle; per-block histograms fold on the driver — O(V)
    driver memory, the same budget source batching already needs).  At true
    multi-node scale the Bernoulli filter itself runs inside ``map_batches``
    over the degrees Dataset and only the *selected* vids ship back."""
    n = graph.n_vertices

    def partial(t: pa.Table) -> pa.Table:
        cnt = np.bincount(t["src"].to_numpy(), minlength=n).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table({"vid": pa.array(nz, pa.int64()), "n": pa.array(cnt[nz])})

    deg = np.zeros(n, dtype=np.int64)
    for b in graph.edges_ds(columns=["src"]).map_batches(
        partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        # iter_batches may coalesce blocks, so a batch can repeat a vid —
        # fancy-index += would drop duplicates; bincount folds them exactly
        deg += np.bincount(
            b["vid"].to_numpy(), weights=b["n"].to_numpy(), minlength=n
        ).astype(np.int64)
    return deg


def pick_sources(n: int, sample_sources: int | None, seed: int = 42) -> np.ndarray:
    """All vertices (exact, reference behavior) or a seeded random sample."""
    if sample_sources is None or sample_sources >= n:
        return np.arange(n, dtype=np.int64)
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    return np.sort(rng.choice(n, size=sample_sources, replace=False).astype(np.int64))


@dataclass
class CentralityResult:
    scores: rd.Dataset  # {vid, centrality}
    nodes: int
    metrics: dict = field(default_factory=dict)


def _msbfs_pass(
    graph: BuiltGraph,
    *,
    direction: str,
    sources: np.ndarray,
    max_depth: int = 10_000,
    collect_asp: bool = False,
    termination=None,
    prog=None,
):
    """Run MS-BFS from ``sources`` in batches of 64; stats stay in-actor.

    ``max_depth`` is a SAFETY cap, not a truncation knob: the fused rounds
    stop as soon as a batch's frontier empties, so the default must exceed
    any real diameter (the old default of 64 conflated the 64-source batch
    width with a depth cap and silently truncated closeness / harmonic /
    allShortestPaths on graphs with diameter > 64; the shard's int16 depth
    lanes support up to 2^15).

    Returns (actors, asp_refs): per-vertex stats are fetched by the caller
    via ``stats_table``; when ``collect_asp`` the per-batch
    (source,target,distance) tables are returned as object refs.
    """
    if max_depth > 2**15 - 1:
        # the shard's per-source depth lanes are int16 (state/bfs_shards.py)
        raise ValueError(
            f"maxDepth={max_depth} exceeds the MS-BFS int16 depth-lane limit "
            f"of {2**15 - 1}; any real-world graph diameter fits well below it"
        )
    rev = graph.ensure_reverse_layout() if direction in ("INCOMING", "BOTH") else None

    def _pool():
        pool = make_shard_actors(
            MsBfsShard, graph, actor_kwargs={"rev_edges_dir": rev, "direction": direction}
        )
        ray.get([a.ready.remote() for a in pool])
        ray.get([a.begin_pass.remote() for a in pool])
        return pool

    P = graph.P
    batches = [sources[i : i + 64] for i in range(0, len(sources), 64)]
    # Exact mode is coordination-bound like exact Brandes (betweenness.py):
    # per-vertex stats are additive across source batches, so two pools on
    # alternate batches (driver threads — see the betweenness.py note on why
    # off-driver coordinators are slower) nearly halve the batch critical
    # path.  ASP collection keeps one pool (row refs are ordered per batch).
    n_pools = 2 if (not collect_asp and len(batches) >= 4) else 1
    pools = [_pool() for _ in range(n_pools)]
    asp_refs = []

    def _run_pool(pi: int) -> None:
        for bi in range(pi, len(batches), n_pools):
            if termination is not None:  # cooperative cancel between batches
                termination.assert_running("ms-bfs source batch")
            _run_batch(pools[pi], P, batches[bi], max_depth)
            if prog is not None:  # unit = 64-source MS-BFS batch
                prog.report(bi, batches_total=len(batches))
            if collect_asp:
                asp_refs.extend(a.asp_rows.remote() for a in pools[pi])

    try:
        if n_pools == 1:
            _run_pool(0)
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(n_pools) as ex:
                list(ex.map(_run_pool, range(n_pools)))
    except BaseException:
        for pool in pools:  # cancellation must not leak pool reservations
            for a in pool:
                ray.kill(a, no_restart=True)
        raise
    return pools, asp_refs


def _centrality(
    graph: BuiltGraph,
    kind: str,
    *,
    direction: str,
    sample_sources: int | None = None,
    max_depth: int = 10_000,
    termination=None,
    on_progress=None,
    progress_interval_s: float = 10.0,
    progress_logger=None,
) -> CentralityResult:
    from ..state.progress import make_reporter

    prog = make_reporter(on_progress, progress_interval_s, kind, progress_logger)
    n = graph.n_vertices
    sources = pick_sources(n, sample_sources)
    pools, _ = _msbfs_pass(
        graph, direction=direction, sources=sources, max_depth=max_depth,
        termination=termination, prog=prog,
    )
    if prog is not None:
        prog.report(prog.last["iteration"] if prog.last else 0, final=True)
    tabs = ray.get([a.stats_table.remote() for a in pools[0]])
    for extra in pools[1:]:  # additive per-vid stats: sum aligned shard tables
        tabs2 = ray.get([a.stats_table.remote() for a in extra])
        tabs = [
            pa.table(
                {
                    "vid": t["vid"],
                    "reached": pa.array(t["reached"].to_numpy() + t2["reached"].to_numpy()),
                    "farness": pa.array(t["farness"].to_numpy() + t2["farness"].to_numpy()),
                    "inv_farness": pa.array(
                        t["inv_farness"].to_numpy() + t2["inv_farness"].to_numpy()
                    ),
                }
            )
            for t, t2 in zip(tabs, tabs2)
        ]
    for pool in pools:
        for a in pool:
            ray.kill(a, no_restart=True)
    t = pa.concat_tables(tabs) if tabs else None
    if t is None or t.num_rows == 0:
        empty = pa.table({"vid": pa.array([], pa.int64()), "centrality": pa.array([], pa.float64())})
        return CentralityResult(rd.from_arrow(empty), 0)

    vid = t["vid"].to_numpy()
    if kind == "closeness":
        farness = t["farness"].to_numpy()
        c = np.where(farness > 0, (n - 1) / np.where(farness > 0, farness, 1.0), 0.0)
    else:  # harmonic
        c = t["inv_farness"].to_numpy() / max(1, n - 1)
    out = pa.table({"vid": pa.array(vid), "centrality": pa.array(c)})
    return CentralityResult(
        rd.from_arrow(out),
        n,
        metrics={
            "sources": len(sources),
            "direction": direction,
            **(prog.summary() if prog is not None else {}),
        },
    )


def closeness_centrality(graph: BuiltGraph, *, direction: str = "OUTGOING", **kw) -> CentralityResult:
    return _centrality(graph, "closeness", direction=direction, **kw)


def harmonic_centrality(graph: BuiltGraph, *, direction: str = "BOTH", **kw) -> CentralityResult:
    return _centrality(graph, "harmonic", direction=direction, **kw)


def all_shortest_paths(
    graph: BuiltGraph,
    *,
    direction: str = "OUTGOING",
    n_sources: int | None = None,
    max_depth: int = 10_000,
) -> rd.Dataset:
    """{source, target, distance} rows for every reachable pair (d=0 self rows
    included, matching ``MSBFSAllShortestPaths``'s stream which emits the
    source at distance 0).  ``n_sources`` limits to the first k vids."""
    n = graph.n_vertices
    k = n if n_sources is None else min(n, n_sources)
    sources = np.arange(k, dtype=np.int64)
    pools, asp_refs = _msbfs_pass(
        graph, direction=direction, sources=sources, max_depth=max_depth, collect_asp=True
    )
    ray.wait(asp_refs, num_returns=len(asp_refs), fetch_local=False)
    for pool in pools:
        for a in pool:
            ray.kill(a, no_restart=True)
    return rd.from_arrow_refs(asp_refs)


@dataclass
class SsspResult:
    distances: rd.Dataset  # {vid, distance}
    rounds: int
    nodes: int


def shortest_paths(
    graph: BuiltGraph, source: int, *, weighted: bool = False, max_rounds: int = 10_000
) -> SsspResult:
    actors = make_shard_actors(SsspShard, graph, actor_kwargs={"weighted": weighted})
    ray.get([a.ready.remote() for a in actors])
    ray.get([a.start.remote(int(source)) for a in actors])
    rounds = run_fused_rounds(actors, "step", max_rounds, on_cap="SSSP relaxation")
    dists = rd.from_arrow(pa.concat_tables(ray.get([a.dist_table.remote() for a in actors])))
    for a in actors:
        ray.kill(a, no_restart=True)
    return SsspResult(distances=dists, rounds=rounds, nodes=graph.n_vertices)


def shortest_paths_delta_stepping(
    graph: BuiltGraph, source: int, delta: float, *, max_rounds: int = 10_000
) -> SsspResult:
    """``algo.shortestPath.deltaStepping`` (``ShortestPathDeltaSteppingProc.java:72,104``,
    kernel ``ShortestPathDeltaStepping.java``) — bucketed parallel SSSP.

    ``delta`` is the caller-supplied bucket width exactly as in the proc
    signature.  Buckets are processed in ascending order; each bucket runs
    its light-edge fixpoint through the fused exchange, then one heavy-edge
    exchange.  Distances equal plain weighted SSSP (Dijkstra fixpoint);
    ``rounds`` reports the number of bucket phases."""
    from ..state.bfs_shards import DeltaSsspShard

    actors = make_shard_actors(DeltaSsspShard, graph, actor_kwargs={"delta": float(delta)})
    ray.get([a.ready.remote() for a in actors])
    ray.get([a.start.remote(int(source)) for a in actors])
    last_b = -1
    phases = 0
    while phases < max_rounds:
        bs = [b for b in ray.get([a.next_bucket.remote(last_b) for a in actors]) if b >= 0]
        if not bs:
            break
        b = min(bs)
        ray.get([a.light_begin.remote(b) for a in actors])
        run_fused_rounds(actors, "light_step", max_rounds, on_cap="delta-stepping light-edge fixpoint")
        pushes = [a.heavy_push.remote() for a in actors]
        ray.get([a.heavy_apply.remote(*pushes) for a in actors])
        last_b = b
        phases += 1
    dists = rd.from_arrow(pa.concat_tables(ray.get([a.dist_table.remote() for a in actors])))
    for a in actors:
        ray.kill(a, no_restart=True)
    return SsspResult(distances=dists, rounds=phases, nodes=graph.n_vertices)
