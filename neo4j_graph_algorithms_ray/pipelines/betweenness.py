"""Betweenness centrality (``algo.betweenness[.sampled][.stream]``,
``BetweennessCentralityProc.java:69-163``) — Brandes over batched sources.

- exact: every vertex is a source (``BetweennessCentrality.java:76-83``),
- sampled (RA-Brandes): k seeded-random sources, result scaled by
  ``nodeCount / k`` (``RABrandesBetweennessCentrality.java:177``,
  ``RandomSelectionStrategy.java``),
- direction OUTGOING default (proc :81); BOTH = undirected traversal with
  the accumulated dependencies halved (each geodesic counted from both
  endpoints; the proc's ``direction:'both'`` fixture expects exactly half).

Execution: ``BrandesShard`` actors (state/brandes_shard.py) — both passes are
fused run-ahead push exchanges.  The forward loop submits rounds on ObjectRef
chains and reads the newly-reached counts with a two-round lag (the PageRank
``_run_fused`` pattern), so frontier death costs two overshoot rounds instead
of a per-round driver sync; the backward pass needs no driver data at all and
is submitted as one fire-and-forget chain of ``max_depth`` rounds.
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


def _run_batch(actors, batch, max_depth: int) -> int:
    """One source batch: fused forward rounds until the frontier dies, then a
    fire-and-forget backward chain.  Returns the batch's max BFS depth."""
    ray.get([a.start.remote(batch) for a in actors])

    # forward: round r's messages are round r+1's args; counts[r] (= vertices
    # newly reached at depth r) are read two rounds behind the submissions
    msgs = [a.fwd_step.options(num_returns=2).remote() for a in actors]
    counts: dict[int, list] = {}
    deepest = 0
    r = 0
    while r < max_depth:
        r += 1
        refs = [m[0] for m in msgs]
        msgs = [a.fwd_step.options(num_returns=2).remote(*refs) for a in actors]
        counts[r] = [m[1] for m in msgs]
        lag = r - 2
        if lag >= 1:
            if sum(ray.get(counts.pop(lag))) == 0:
                break
            deepest = lag
    # drain the in-flight tail (≤2 rounds) to pin down the exact max depth
    tail_alive = False
    for j in sorted(counts):
        if sum(ray.get(counts[j])) > 0:
            deepest = j
            tail_alive = j == max(counts)
    if r >= max_depth and tail_alive:
        # the frontier was still alive when the cap bound — truncating the
        # forward pass silently skews every dependency score (the cap is a
        # runaway safety, same contract as centrality._msbfs_pass)
        raise RuntimeError(
            f"betweenness forward BFS still progressing at max_depth="
            f"{max_depth}; raise max_depth (graph diameter exceeds the cap)"
        )

    if deepest > 0:
        ray.get([a.bwd_init.remote(deepest) for a in actors])
        bmsgs = [a.bwd_step.remote() for a in actors]
        for _ in range(deepest - 1):
            bmsgs = [a.bwd_step.remote(*bmsgs) for a in actors]
        ray.wait(bmsgs, num_returns=len(bmsgs), fetch_local=False)
    ray.get([a.finish_batch.remote() for a in actors])
    return deepest


def betweenness_centrality(
    graph: BuiltGraph,
    *,
    direction: str = "OUTGOING",
    sample_sources: int | None = None,
    sources: "np.ndarray | None" = None,
    max_depth: int = 10_000,
    source_batch: int = 64,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    max_batches: int | None = None,
    termination: "TerminationFlag | None" = None,
    on_progress=None,
    progress_interval_s: float = 10.0,
    progress_logger=None,
) -> BetweennessResult:
    """``source_batch`` sources run concurrently per pass (unlike MS-BFS's
    bitmask ω=64, Brandes state carries a plain per-source axis, so the batch
    width trades per-vertex memory — S*18 bytes — against the number of BSP
    wave sequences; wider batches halve driver-visible rounds).

    Checkpointing is per completed source batch (exact mode over a large
    graph is a long accumulation; a killed job resumes at the next batch)."""
    from ..state.checkpoint import CheckpointManager, files_by_part
    from ..state.progress import make_reporter

    if max_depth > 2**15 - 1:
        # BrandesShard.dist is int16 (per-source depth matrix, S*2 bytes per
        # vertex); a deeper cap would silently wrap the depths it stores —
        # the same clamp centrality.py applies for the MS-BFS int16 lanes
        raise ValueError(
            f"maxDepth={max_depth} exceeds the Brandes int16 depth limit of "
            f"{2**15 - 1}; any real-world graph diameter fits well below it"
        )
    prog = make_reporter(on_progress, progress_interval_s, "betweenness", progress_logger)
    t0 = time.perf_counter()
    # the backward dependency push runs over the reverse adjacency, so every
    # direction needs both layouts (BOTH symmetrizes them into one)
    rev = graph.ensure_reverse_layout()
    actors = make_shard_actors(
        BrandesShard, graph, actor_kwargs={"rev_edges_dir": rev, "direction": direction}
    )
    P = graph.P
    ray.get([a.ready.remote() for a in actors])
    ray.get([a.begin_pass.remote() for a in actors])

    ckpt = CheckpointManager(checkpoint_dir, "betweenness") if checkpoint_dir else None
    if ckpt is not None and not resume:
        ckpt.reset()  # fresh run: a stale manifest would be loaded by mid-run rollback
    start_batch = 0
    if resume and ckpt is not None:
        m = ckpt.latest()
        if m is not None:
            ckpt.validate_resume(m, algo="betweenness", bounds=graph.bounds)
            files = files_by_part(m["files"])
            ray.get([actors[p].load_state.remote(files[p]) for p in range(P)])
            start_batch = m["iteration"] + 1

    n = graph.n_vertices
    # explicit sources (e.g. the degree-proportional RA-Brandes strategy,
    # RandomDegreeSelectionStrategy.java) override the uniform sampler
    sources = (
        np.asarray(sources, dtype=np.int64)
        if sources is not None
        else pick_sources(n, sample_sources)
    )
    batches = [sources[i : i + source_batch] for i in range(0, len(sources), source_batch)]
    stop = len(batches) if max_batches is None else min(len(batches), start_batch + max_batches)

    # Exact mode is COORDINATION-bound, not compute-bound (a 47-batch sf0.01
    # run spends ~260 ms/batch on ~25 BSP round trips whose kernels are
    # sub-ms).  Per-source contributions are additive, so a second
    # independent shard pool processes alternate batches concurrently and
    # the per-vid sums merge at the end — near-2x wall time on the exact
    # path.  Checkpointed runs stay single-pool (the per-batch manifest is
    # a sequential contract).
    n_pools = 2 if (ckpt is None and stop - start_batch >= 4) else 1
    pools = [actors]
    if n_pools == 2:
        second = make_shard_actors(
            BrandesShard, graph, actor_kwargs={"rev_edges_dir": rev, "direction": direction}
        )
        ray.get([a.ready.remote() for a in second])
        ray.get([a.begin_pass.remote() for a in second])
        pools.append(second)

    # Both pools are driven from driver threads (ray.get releases the GIL;
    # the residual serialization is the per-round .remote() submission code).
    # Measured at sf0.01 exact: 12.5s single -> 9.8s dual.  Off-driver
    # coordinator tasks were tried and are SLOWER (13.6s): submitting on
    # borrowed actor handles routes ownership lookups through the driver
    # anyway (same class as the nested-ObjectRef gotcha in state/shards.py).
    def _run_pool(pi: int) -> None:
        pool = pools[pi]
        for bi in range(start_batch + pi, stop, n_pools):
            if termination is not None:  # cooperative cancel between batches
                termination.assert_running("betweenness source batch")
            _run_batch(pool, batches[bi], max_depth)
            if prog is not None:  # unit = source batch (CPython-atomic ops;
                # dual-pool races at worst coalesce two events)
                prog.report(bi, batches_total=stop, sources_done=min((bi + 1) * source_batch, len(sources)))
            if ckpt is not None:  # only reachable when n_pools == 1
                files = ray.get([a.save_state.remote(ckpt.state_dir(), bi) for a in pool])
                ckpt.commit_iteration(
                    bi,
                    files,
                    {"bounds": [int(b) for b in graph.bounds], "algo": "betweenness"},
                )

    try:
        if n_pools == 1:
            _run_pool(0)
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(n_pools) as ex:
                list(ex.map(_run_pool, range(n_pools)))
    except BaseException:
        # cancellation must not leak pool reservations; the checkpoint
        # manifest stays at the last committed batch for resume=True
        for pool in pools:
            for a in pool:
                ray.kill(a, no_restart=True)
        raise

    scale = 1.0
    # len(sources) == 0 is reachable (strategy='degree' on an edgeless graph
    # returns no sources): no batches ran, centrality is all-zero — any
    # finite scale is correct, so skip the extrapolation instead of dividing
    if len(sources) and len(sources) < n:
        scale = n / len(sources)  # RA-Brandes extrapolation
    if direction == "BOTH":
        scale *= 0.5  # undirected geodesics counted from both endpoints
    tabs = ray.get([a.centrality_table.remote(scale) for a in pools[0]])
    if n_pools == 2:
        tabs2 = ray.get([a.centrality_table.remote(scale) for a in pools[1]])
        tabs = [
            t.set_column(
                1,
                "centrality",
                pa.array(t["centrality"].to_numpy() + t2["centrality"].to_numpy()),
            )
            for t, t2 in zip(tabs, tabs2)
        ]
    for pool in pools:
        for a in pool:
            ray.kill(a, no_restart=True)
    if prog is not None:
        prog.report(max(0, stop - 1), final=True, batches_total=stop, sources_done=len(sources))
    out = pa.concat_tables(tabs)
    return BetweennessResult(
        rd.from_arrow(out),
        n,
        metrics={
            "sources": len(sources),
            "direction": direction,
            "elapsed_s": time.perf_counter() - t0,
            **(prog.summary() if prog is not None else {}),
        },
    )
