"""Strongly connected components (``algo.scc``,
``StronglyConnectedComponentsProc.java:66-381``) — multistep trim +
forward-backward coloring over ``SccShard`` actors (state/scc_shard.py).

Output contract: {vid, label} with label = **min vid of the SCC**
(deterministic canonical form; the reference's partition values are
execution-order roots).  ``setCount``/``maxSetSize``/``minSetSize`` mirror
the proc's stats row (``SCCTest``: {a,b,c} + {d,e} -> setCount 2, sizes 3/2).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import ray
import ray.data as rd

from ..state.scc_shard import SccShard
from ..state.shards import make_shard_actors
from .graph_build import BuiltGraph


@dataclass
class SccResult:
    labels: rd.Dataset  # {vid, label} min-vid canonical
    nodes: int
    metrics: dict = field(default_factory=dict)

    def set_count(self) -> int:
        return len(self.labels.unique("label"))

    def set_sizes(self) -> rd.Dataset:
        from ..stages.agg import bucketed_agg

        return bucketed_agg(self.labels, "label", {"size": (None, "count")})


def _phase_to_fixpoint(
    actors, begin: str, step: str, begin_args=(), max_rounds=10_000, termination=None
) -> None:
    """Run one BSP phase with the fused run-ahead exchange.

    ``begin`` seeds the phase (returns the seed-frontier size); ``step`` fuses
    apply(previous round's packed messages) + push(next round's) and returns
    ``(packed, n_progress)``.  The driver chains the packed refs straight into
    the next round's calls and reads the *previous* round's counts after
    submitting — a one-round-deep pipeline; the single overshoot round past
    the fixpoint applies empty messages (a no-op by construction)."""
    seeds = sum(ray.get([getattr(a, begin).remote(*begin_args) for a in actors]))
    if seeds == 0:
        return
    msgs = [getattr(a, step).options(num_returns=2).remote() for a in actors]
    prev = [m[1] for m in msgs]
    converged = False
    for _ in range(max_rounds):
        if termination is not None:
            # the documented contract is a check between BSP rounds — a
            # cancel/deadline must not wait out a 10k-wave flood phase
            termination.assert_running("scc phase")
        packed = [m[0] for m in msgs]
        msgs = [getattr(a, step).options(num_returns=2).remote(*packed) for a in actors]
        if sum(ray.get(prev)) == 0:
            converged = True
            break
        prev = [m[1] for m in msgs]
    if not converged:
        # a silently-truncated color/backward flood fragments SCCs into wrong
        # labels (e.g. a >max_rounds-cycle splinters into singletons) — the
        # cap is a runaway safety, not a truncation knob
        raise RuntimeError(
            f"SCC phase {step!r} did not converge within max_bsp_rounds="
            f"{max_rounds}; raise max_bsp_rounds (graph has BFS distances "
            "beyond the cap inside one phase)"
        )
    # drain: the in-flight round must finish before the next phase's begin
    # reads shard state (actor task ordering guarantees it per-actor; the
    # counts are fetched so errors surface here, not in the next phase)
    ray.get([m[1] for m in msgs])


def strongly_connected_components(
    graph: BuiltGraph,
    *,
    max_outer: int = 1_000,
    max_bsp_rounds: int = 10_000,
    termination=None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    max_failovers: int = 2,
    chaos_hook=None,
    on_progress=None,
    progress_interval_s: float = 10.0,
    progress_logger=None,
) -> SccResult:
    """Checkpointing commits at outer FW-BW round boundaries (the reference's
    ``MultistepSCC.java:215`` loop granularity) — every BSP phase is quiesced
    there, so per-shard state is exactly ``{assigned, label, indeg, outdeg}``.
    With a ``checkpoint_dir``, a shard death mid-run rolls the pool back to
    the last committed round and continues (state/failover.py)."""
    t0 = time.perf_counter()
    from ..state.checkpoint import CheckpointManager, files_by_part
    from ..state.progress import make_reporter

    prog = make_reporter(on_progress, progress_interval_s, "scc", progress_logger)
    from ..state.failover import (
        FAILOVER_ERRORS,
        ShardRestartDetected,
        pool_incarnations,
        rollback_pool,
        verify_incarnations,
    )

    rev = graph.ensure_reverse_layout()
    actor_kwargs = {"rev_edges_dir": rev}
    if checkpoint_dir:
        actor_kwargs["ckpt_dir"] = checkpoint_dir
    ckpt = CheckpointManager(checkpoint_dir, "scc") if checkpoint_dir else None
    if ckpt is not None and not resume:
        ckpt.reset()  # BEFORE the pool: shards rehydrate in __init__

    actors = make_shard_actors(
        SccShard, graph, actor_kwargs=actor_kwargs,
        max_restarts=3 if checkpoint_dir else 0,
    )
    ray.get([a.ready.remote() for a in actors])

    start_outer = 0
    if resume and ckpt is not None:
        m = ckpt.latest()
        if m is not None:
            ckpt.validate_resume(m, algo="scc", bounds=graph.bounds)
            files = files_by_part(m["files"])
            ray.get([actors[p].load_state.remote(files[p]) for p in range(graph.P)])
            start_outer = int(m["iteration"]) + 1
    baseline = pool_incarnations(actors) if ckpt is not None else None
    failovers = 0
    outer = 0

    def _commit(it):
        files = ray.get([a.save_state.remote(ckpt.state_dir(), it) for a in actors])
        if baseline is not None:
            verify_incarnations(actors, baseline)  # gate on no silent restart
        ckpt.commit_iteration(
            it, files, {"bounds": [int(b) for b in graph.bounds], "algo": "scc"}
        )

    def _run(so):
        # iteration numbering: manifest iter 0 = post-seed-trim; iter k>=1 =
        # after outer round k's trim (so a resume at k+1 re-enters the loop
        # at the n_unassigned check with all phases quiesced)
        if so == 0:
            _phase_to_fixpoint(actors, "trim_begin", "trim_step", (True,), max_bsp_rounds, termination)
            if ckpt is not None:
                _commit(0)
            so = 1
        it = so - 1
        for it in range(so, max_outer + 1):
            if termination is not None:  # cooperative cancel between FW-BW rounds
                termination.assert_running("scc outer round")
            if chaos_hook is not None:  # fault-injection point (tests)
                chaos_hook(it, actors)
            remaining = sum(ray.get([a.n_unassigned.remote() for a in actors]))
            if remaining == 0:
                break
            _phase_to_fixpoint(actors, "color_begin", "color_step", (), max_bsp_rounds, termination)
            _phase_to_fixpoint(actors, "bwd_begin", "bwd_step", (), max_bsp_rounds, termination)
            assigned = sum(ray.get([a.finalize_sccs.remote() for a in actors]))
            if assigned <= 0:  # plain raise: asserts vanish under python -O
                raise RuntimeError("SCC outer round made no progress")
            if prog is not None:  # unit = outer FW-BW round
                prog.report(it, assigned=int(assigned), remaining=int(remaining - assigned))
            _phase_to_fixpoint(actors, "trim_begin", "trim_step", (False,), max_bsp_rounds, termination)
            if ckpt is not None and it % checkpoint_every == 0:
                _commit(it)
        else:
            # range exhausted without the remaining==0 break — the last
            # round may still have finished the job (the check runs at loop
            # TOP), so gate on the actual count: publishing label=-1 rows
            # as a bogus extra component must fail loud (an adversarial
            # condensation chain can need one round per SCC)
            rem = sum(ray.get([a.n_unassigned.remote() for a in actors]))
            if rem > 0:
                raise RuntimeError(
                    f"SCC FW-BW still has {rem} unassigned vertices after "
                    f"max_outer={max_outer} rounds; raise maxOuter"
                )
        return it

    try:
        while True:
            try:
                outer = _run(start_outer)
                if baseline is not None:
                    verify_incarnations(actors, baseline)  # final gate
                break
            except FAILOVER_ERRORS + (ShardRestartDetected,):
                if ckpt is None or failovers >= max_failovers:
                    raise
                failovers += 1
                start_outer, baseline = rollback_pool(
                    actors, ckpt, algo="scc", bounds=graph.bounds
                )
    except BaseException:
        for a in actors:  # cancellation must not leak pool reservations
            ray.kill(a, no_restart=True)
        raise

    # canonicalize shard-side: label -> min vid of the SCC (root ids are
    # max-vid colors; only multi-member SCCs travel, so the exchange is
    # O(#multi-member SCCs) — no Dataset shuffle join on the O(V) labels)
    try:
        pushes = [a.canon_push.remote() for a in actors]
        canons = [a.canon_reduce.remote(*pushes) for a in actors]
        ray.get([a.canon_apply.remote(*canons) for a in actors])
        label_refs = [a.labels_table.remote() for a in actors]
        ray.wait(label_refs, num_returns=len(label_refs), fetch_local=False)
        if baseline is not None:
            # final gate (triangles.py's post-collection pattern): a silent
            # restart during canonicalization rehydrates an OLDER committed
            # round for that shard — its labels would be stale, undetected
            verify_incarnations(actors, baseline)
    finally:
        # failure anywhere in the exchange/fetch must not leak the pool
        for a in actors:
            ray.kill(a, no_restart=True)
    labels = rd.from_arrow_refs(label_refs)
    if prog is not None:
        prog.report(outer, final=True)
    return SccResult(
        labels=labels,
        nodes=graph.n_vertices,
        metrics={
            "outer_rounds": outer,
            "elapsed_s": time.perf_counter() - t0,
            "failovers": failovers,
            **(prog.summary() if prog is not None else {}),
        },
    )
