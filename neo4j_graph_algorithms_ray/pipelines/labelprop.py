"""Label propagation (headline algorithm #3) — synchronous, deterministic.

Reference: ``LabelPropagation.java`` (async, randomized visit order, weighted
votes ``relWeight(u,t) * nodeWeight(t)``, seeds from a node property with the
node id as default, configurable direction, converged when no label changed).
Distributed here as a driver loop over ``LabelPropShard`` actors
(state/shards.py) with boundary-label exchange per phase; determinism
conventions documented on the shard class.

Seeds/weights ride in on the sidecar node-props table (FIXTURES.md §0):
``node_props_to_vids`` -> ``{vid, partition, weight}`` -> routed to owning
shards by vid range.  Seed routing streams through ``map_batches`` so no
O(V) table ever lands on the driver.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..state.shards import LabelPropShard, make_shard_actors
from .graph_build import BuiltGraph


@dataclass
class LabelPropResult:
    labels: rd.Dataset  # {vid: int64, label: int64}
    ran_iterations: int
    did_converge: bool
    nodes: int
    metrics: dict = field(default_factory=dict)


class _RouteSeeds:
    """map_batches stage: send each seed row to its owning shard."""

    def __init__(self, actors, bounds):
        self.actors = actors
        self.bounds = np.asarray(bounds)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vid = batch["vid"].to_numpy()
        if len(vid) and (vid.min() < self.bounds[0] or vid.max() >= self.bounds[-1]):
            # out-of-range seeds are caller error (stale/foreign vid table):
            # one past the last bound used to IndexError inside the actor
            # call, and a too-small vid wrapped to the LAST shard where the
            # bounds mask silently dropped it — the seed never applied
            raise ValueError(
                f"label propagation seeds: vid outside the graph's range "
                f"[{int(self.bounds[0])}, {int(self.bounds[-1])}) — the seed "
                "table does not match this graph"
            )
        part = np.searchsorted(self.bounds, vid, side="right") - 1
        order = np.argsort(part, kind="stable")
        t = batch.take(pa.array(order))
        ps = part[order]
        acks = []
        for p in np.unique(ps):
            sel = np.flatnonzero(ps == p)
            acks.append(self.actors[p].set_seeds.remote(t.slice(sel[0], len(sel))))
        ray.get(acks)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})


def _transpose_exchange(refs_per_shard, P):
    """[shard q -> tuple of P refs] -> per-receiver lists."""
    if P == 1:
        return [[refs_per_shard[0]]]
    return [[refs_per_shard[q][p] for q in range(P)] for p in range(P)]


def _run_fused_lp(actors, P, max_iterations, termination=None, prog=None):
    """Run-ahead packed exchange (the PageRank ``_run_fused`` pattern).

    Each phase every shard emits ONE packed boundary-label array (the union of
    all peers' request sets) and the driver chains the P packed refs straight
    into the next phase's ``step_fused`` calls — no per-phase ``ray.get``
    barrier, so round latency is the actors' critical path.  Convergence is
    checked with a one-iteration lag every 4 iterations; extra submitted
    phases after convergence are no-ops (a converged labeling is a fixpoint
    of ``_step_core``), and the exact convergence iteration is recovered from
    the per-phase changed counts afterwards.
    """
    served = [a.packed_serve_vids.remote() for a in actors]
    ray.get([a.init_packed.remote(*served) for a in actors])
    packed = [a.serve_packed.remote() for a in actors]
    changed_refs: list[list] = []  # one entry per phase: P refs
    n_sub = 0
    for it in range(max_iterations):
        if termination is not None:  # cooperative cancel between iterations
            termination.assert_running("label propagation")
        for parity in (0, 1):
            outs = [a.step_fused.options(num_returns=2).remote(parity, *packed) for a in actors]
            packed = [o[0] for o in outs]
            changed_refs.append([o[1] for o in outs])
        n_sub = it + 1
        if prog is not None:
            prog.report(it)
        if n_sub % 4 == 0 and n_sub >= 2:
            lag = 2 * (it - 1)  # phases of the previous iteration (already done)
            tot = sum(ray.get(changed_refs[lag])) + sum(ray.get(changed_refs[lag + 1]))
            if prog is not None:  # lagged changed-count at the check point
                prog.report(it, changed=int(tot))
            if tot == 0:
                break
    counts = ray.get([r for pair in changed_refs for r in pair])  # n_phases * P flat
    per_iter = [sum(counts[2 * i * P : (2 * i + 2) * P]) for i in range(n_sub)]
    for i, c in enumerate(per_iter):
        if c == 0:
            return i + 1, True
    return n_sub, False


def label_propagation(
    graph: BuiltGraph,
    *,
    seeds: rd.Dataset | None = None,  # {vid, partition, weight}
    direction: str = "OUTGOING",
    max_iterations: int = 10,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    termination: "TerminationFlag | None" = None,
    on_progress=None,
    progress_interval_s: float = 10.0,
    progress_logger=None,
) -> LabelPropResult:
    from ..state.checkpoint import CheckpointManager, files_by_part
    from ..state.progress import make_reporter

    prog = make_reporter(on_progress, progress_interval_s, "labelPropagation", progress_logger)
    t0 = time.perf_counter()
    rev_dir = None
    if direction in ("INCOMING", "BOTH"):
        rev_dir = graph.ensure_reverse_layout()
    actors = make_shard_actors(
        LabelPropShard,
        graph,
        actor_kwargs={"rev_edges_dir": rev_dir, "direction": direction},
    )
    P = graph.P
    ray.get([a.ready.remote() for a in actors])

    # handshake: who needs whose labels
    if P > 1:
        needs = [a.needed_vids.options(num_returns=P).remote() for a in actors]
        ray.get(
            [actors[q].register_requests.remote(*[needs[p][q] for p in range(P)]) for q in range(P)]
        )
    else:
        ray.get(actors[0].register_requests.remote(actors[0].needed_vids.remote()))

    # seeds (optional; default label=vid, weight=1 set at shard init)
    if seeds is not None:
        from ..stages.agg import route_stage_args

        seeds.map_batches(
            _RouteSeeds(actors, graph.bounds), batch_format="pyarrow", batch_size=65536, **route_stage_args()
        ).count()

    ckpt = CheckpointManager(checkpoint_dir, "labelprop") if checkpoint_dir else None
    if ckpt is not None and not resume:
        ckpt.reset()  # fresh run: a stale manifest would be loaded by mid-run rollback
    start_iter = 0
    if resume and ckpt is not None:
        m = ckpt.latest()
        if m is not None:
            ckpt.validate_resume(m, algo="labelprop", bounds=graph.bounds)
            files = files_by_part(m["files"])
            ray.get([actors[p].load_state.remote(files[p]) for p in range(P)])
            start_iter = m["iteration"] + 1

    # static voter node-weights exchange — after resume, so restored
    # checkpointed node weights (not defaults) feed the voter weights
    wrefs = [
        a.serve_nodeweights.options(num_returns=P).remote() if P > 1 else a.serve_nodeweights.remote()
        for a in actors
    ]
    ray.get(
        [actors[p].set_voter_weights.remote(*chunks) for p, chunks in enumerate(_transpose_exchange(wrefs, P))]
    )
    load_s = time.perf_counter() - t0

    t1 = time.perf_counter()
    ran = 0  # iterations run THIS session (pagerank's resume contract)
    converged = False
    try:
        if ckpt is None and start_iter == 0:
            ran, converged = _run_fused_lp(actors, P, max_iterations, termination, prog)
        else:
            # per-iteration barrier path: checkpointed / resumed runs need
            # exact iteration accounting and a consistent state each round
            for it in range(start_iter, max_iterations):
                if termination is not None:
                    termination.assert_running("label propagation")
                total_changed = 0
                for parity in (0, 1):  # red/black phases; labels re-served between phases
                    lrefs = [
                        a.serve_labels.options(num_returns=P).remote() if P > 1 else a.serve_labels.remote()
                        for a in actors
                    ]
                    changed = ray.get(
                        [
                            actors[p].step.remote(parity, *chunks)
                            for p, chunks in enumerate(_transpose_exchange(lrefs, P))
                        ]
                    )
                    total_changed += sum(changed)
                ran = it - start_iter + 1
                if prog is not None:
                    prog.report(it, changed=int(total_changed))
                if ckpt is not None:
                    files = ray.get([a.save_state.remote(ckpt.state_dir(), it) for a in actors])
                    ckpt.commit_iteration(
                        it,
                        files,
                        {"changed": total_changed, "bounds": [int(b) for b in graph.bounds], "algo": "labelprop"},
                    )
                if total_changed == 0:
                    converged = True
                    break
    except BaseException:
        # cancellation must not leak reservations; last checkpoint resumable
        for a in actors:
            ray.kill(a, no_restart=True)
        raise
    compute_s = time.perf_counter() - t1
    if prog is not None:
        prog.report(max(0, ran - 1), final=True, converged=bool(converged))

    try:
        label_refs = [a.labels_table.remote() for a in actors]
        ray.wait(label_refs, num_returns=len(label_refs), fetch_local=False)
    finally:
        # release the pool eagerly — reservations must not linger for the
        # lifetime of the (lazy) result Dataset in long multi-query
        # sessions; a fetch failure (actor's node died post-loop) must not
        # leak them either
        for a in actors:
            ray.kill(a, no_restart=True)
    labels = rd.from_arrow_refs(label_refs)
    return LabelPropResult(
        labels=labels,
        ran_iterations=ran,
        did_converge=converged,
        nodes=graph.n_vertices,
        metrics={
            "loadMillis": int(load_s * 1000),
            "computeMillis": int(compute_s * 1000),
            "direction": direction,
            "p": P,
            **(prog.summary() if prog is not None else {}),
        },
    )


def labels_with_keys(graph: BuiltGraph, labels: rd.Dataset) -> rd.Dataset:
    return labels.join(graph.vertices_ds(), "inner", max(1, graph.P), on=("vid",))
