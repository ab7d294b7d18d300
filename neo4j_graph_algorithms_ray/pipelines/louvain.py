"""Louvain community detection (``algo.louvain``, LouvainProc.java:65,105).

Single-level modularity sweep like the reference kernel (no coarsening,
``impl/louvain/Louvain.java``); semantics + determinism conventions on
``state/louvain_shard.py``.  Driver loop: per iteration two parity phases,
each = serve-community wave, sTot partial-exchange wave, sTot fetch wave,
local move step.  Converges when a full iteration moves nothing
(``Louvain.java:156-170``).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import ray
import ray.data as rd

from ..state.louvain_shard import LouvainShard
from ..state.shards import make_shard_actors
from .graph_build import BuiltGraph


@dataclass
class LouvainResult:
    communities: rd.Dataset  # {vid, community}
    iterations: int
    community_count: int
    nodes: int
    metrics: dict = field(default_factory=dict)


def _transpose(refs, P):
    if P == 1:
        return [[refs[0]]]
    return [[refs[q][p] for q in range(P)] for p in range(P)]


def louvain(
    graph: BuiltGraph,
    *,
    weighted: bool = False,
    max_iterations: int = 10,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    termination: "TerminationFlag | None" = None,
    on_progress=None,
    progress_interval_s: float = 10.0,
    progress_logger=None,
) -> LouvainResult:
    from ..state.checkpoint import CheckpointManager, files_by_part
    from ..state.progress import make_reporter

    prog = make_reporter(on_progress, progress_interval_s, "louvain", progress_logger)
    t0 = time.perf_counter()
    rev = graph.ensure_reverse_layout()
    actors = make_shard_actors(
        LouvainShard, graph, actor_kwargs={"rev_edges_dir": rev, "weighted": weighted}
    )
    P = graph.P
    ray.get([a.ready.remote() for a in actors])

    # handshake: boundary community requests (fixed sets)
    if P > 1:
        needs = [a.needed_vids.options(num_returns=P).remote() for a in actors]
        ray.get(
            [actors[q].register_requests.remote(*[needs[p][q] for p in range(P)]) for q in range(P)]
        )
    else:
        ray.get(actors[0].register_requests.remote(actors[0].needed_vids.remote()))

    m2 = sum(ray.get([a.deg_sum.remote() for a in actors]))
    ray.get([a.set_m2.remote(m2) for a in actors])

    ckpt = CheckpointManager(checkpoint_dir, "louvain") if checkpoint_dir else None
    if ckpt is not None and not resume:
        ckpt.reset()  # fresh run: a stale manifest would be loaded by mid-run rollback
    start_iter = 0
    if resume and ckpt is not None:
        m = ckpt.latest()
        if m is not None:
            ckpt.validate_resume(m, algo="louvain", bounds=graph.bounds)
            if bool(m.get("weighted", False)) != bool(weighted):
                raise ValueError(
                    "louvain resume: checkpoint was written with weighted="
                    f"{m.get('weighted', False)} but this run passed weighted={weighted}"
                )
            files = files_by_part(m["files"])
            ray.get([actors[p].load_state.remote(files[p]) for p in range(P)])
            start_iter = m["iteration"] + 1
    load_s = time.perf_counter() - t0

    acks: list = []  # intermediate wave acks, drained periodically for errors

    def wave(method, setter):
        """Submit one exchange wave WITHOUT a driver barrier: per-actor task
        ordering + the ref dependencies enforce the phase sequencing, so the
        driver only syncs on the step counts (with a lag).  Ack refs are
        retained — a failed setter must surface at the next drain, not leave
        silently-stale state."""
        refs = [
            getattr(a, method).options(num_returns=P).remote() if P > 1 else getattr(a, method).remote()
            for a in actors
        ]
        acks.extend(
            getattr(actors[p], setter).remote(*chunks) for p, chunks in enumerate(_transpose(refs, P))
        )

    def submit_phase(parity: int):
        wave("serve_comm", "set_voter_comm")
        wave("stot_partials", "reduce_stot")
        # dynamic sTot requests: who needs which community totals
        if P > 1:
            needs = [a.needed_comms.options(num_returns=P).remote() for a in actors]
            served = [
                actors[q].serve_stot.options(num_returns=P).remote(*[needs[p][q] for p in range(P)])
                for q in range(P)
            ]
            acks.extend(
                actors[p].set_stot.remote(*[served[q][p] for q in range(P)]) for p in range(P)
            )
        else:
            need = actors[0].needed_comms.remote()
            acks.append(actors[0].set_stot.remote(actors[0].serve_stot.remote(need)))
        return [a.step.remote(parity) for a in actors]

    t1 = time.perf_counter()
    ran = 0  # iterations run THIS session (pagerank's resume contract)
    try:
        if ckpt is None and start_iter == 0:
            # run-ahead loop: submit iterations back-to-back, read changed
            # counts one iteration behind; overshoot past a fixpoint is a no-op
            step_refs: list[list] = []  # per iteration: 2*P count refs
            n_sub = 0
            for it in range(max_iterations):
                if termination is not None:
                    termination.assert_running("louvain")
                refs = submit_phase(0) + submit_phase(1)
                step_refs.append(refs)
                n_sub = it + 1
                if prog is not None:
                    prog.report(it)
                if it >= 1 and sum(ray.get(step_refs[it - 1])) == 0:
                    break
                if len(acks) > 12 * P:
                    ray.get(acks)
                    acks.clear()
            counts = [sum(ray.get(r)) for r in step_refs]
            ray.get(acks)
            acks.clear()
            ran = n_sub
            for i, c in enumerate(counts):
                if c == 0:
                    ran = i + 1
                    break
        else:
            for it in range(start_iter, max_iterations):
                if termination is not None:
                    termination.assert_running("louvain")
                total_changed = 0
                for parity in (0, 1):
                    refs = submit_phase(parity)
                    ray.get(acks)
                    acks.clear()
                    total_changed += sum(ray.get(refs))
                ran = it - start_iter + 1
                if prog is not None:
                    prog.report(it, changed=int(total_changed))
                if ckpt is not None:
                    files = ray.get([a.save_state.remote(ckpt.state_dir(), it) for a in actors])
                    ckpt.commit_iteration(
                        it,
                        files,
                        {
                            "changed": total_changed,
                            "bounds": [int(b) for b in graph.bounds],
                            "algo": "louvain",
                            "weighted": bool(weighted),
                        },
                    )
                if total_changed == 0:
                    break
    except BaseException:
        # cancellation must not leak reservations; last checkpoint resumable
        for a in actors:
            ray.kill(a, no_restart=True)
        raise
    compute_s = time.perf_counter() - t1
    if prog is not None:
        prog.report(max(0, ran - 1), final=True)

    # result Dataset straight from shard refs (pagerank/labelprop/scc
    # protocol) — the O(V) community table never lands on the driver; the
    # global community count folds per-shard DISTINCT sets (O(#communities
    # x P), not O(V))
    try:
        comm_refs = [a.comm_table.remote() for a in actors]
        distinct = ray.get([a.comm_distinct.remote() for a in actors])
        ray.wait(comm_refs, num_returns=len(comm_refs), fetch_local=False)
    finally:
        # a fetch failure post-loop must not leak the pool reservations
        for a in actors:
            ray.kill(a, no_restart=True)
    n_comm = len(np.unique(np.concatenate(distinct))) if distinct else 0
    return LouvainResult(
        communities=rd.from_arrow_refs(comm_refs),
        iterations=ran,
        community_count=n_comm,
        nodes=graph.n_vertices,
        metrics={
            "loadMillis": int(load_s * 1000),
            "computeMillis": int(compute_s * 1000),
            "p": P,
            **(prog.summary() if prog is not None else {}),
        },
    )
