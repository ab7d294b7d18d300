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


def _phase_to_fixpoint(actors, begin: str, step: str, begin_args=(), max_rounds=10_000) -> None:
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
) -> SccResult:
    t0 = time.perf_counter()
    rev = graph.ensure_reverse_layout()
    actors = make_shard_actors(SccShard, graph, actor_kwargs={"rev_edges_dir": rev})
    ray.get([a.ready.remote() for a in actors])

    try:
        _phase_to_fixpoint(actors, "trim_begin", "trim_step", (True,), max_bsp_rounds)
        outer = 0
        for outer in range(1, max_outer + 1):
            if termination is not None:  # cooperative cancel between FW-BW rounds
                termination.assert_running("scc outer round")
            remaining = sum(ray.get([a.n_unassigned.remote() for a in actors]))
            if remaining == 0:
                break
            _phase_to_fixpoint(actors, "color_begin", "color_step", (), max_bsp_rounds)
            _phase_to_fixpoint(actors, "bwd_begin", "bwd_step", (), max_bsp_rounds)
            assigned = sum(ray.get([a.finalize_sccs.remote() for a in actors]))
            assert assigned > 0, "SCC outer round made no progress"
            _phase_to_fixpoint(actors, "trim_begin", "trim_step", (False,), max_bsp_rounds)
    except BaseException:
        for a in actors:  # cancellation must not leak pool reservations
            ray.kill(a, no_restart=True)
        raise

    # canonicalize shard-side: label -> min vid of the SCC (root ids are
    # max-vid colors; only multi-member SCCs travel, so the exchange is
    # O(#multi-member SCCs) — no Dataset shuffle join on the O(V) labels)
    pushes = [a.canon_push.remote() for a in actors]
    canons = [a.canon_reduce.remote(*pushes) for a in actors]
    ray.get([a.canon_apply.remote(*canons) for a in actors])
    label_refs = [a.labels_table.remote() for a in actors]
    ray.wait(label_refs, num_returns=len(label_refs), fetch_local=False)
    for a in actors:
        ray.kill(a, no_restart=True)
    labels = rd.from_arrow_refs(label_refs)
    return SccResult(
        labels=labels,
        nodes=graph.n_vertices,
        metrics={"outer_rounds": outer, "elapsed_s": time.perf_counter() - t0},
    )
