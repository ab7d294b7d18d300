"""PageRank — unnormalized delta-push power iteration (headline algorithm #1).

Semantics match the reference exactly (``PageRank.java:444-517``; conformance
fixtures FIXTURES.md §1-2):

- init: every score and delta = ``alpha = 1 - damping``,
- per iteration: each vertex with pending delta pushes ``delta / outdeg`` to
  each out-neighbor; receivers sum; ``inc = damping * sum``;
  ``score += inc; delta = inc``,
- no dangling-mass redistribution (pushed mass is absorbed; pr-wiki fixture),
  isolated / no-inlink vertices stay at ``alpha``,
- stop after ``iterations`` rounds (reference: fixed count, no convergence
  test, ``PageRank.java:160-164``) or — our extension per the north rule —
  when the global max delta < ``tol`` (default 1e-6).

Execution: P ``PageRankShard`` actors (state/shards.py).  Two exchange modes:

- ``exchange='direct'`` (default): BSP all-to-all of per-shard pre-aggregated
  Arrow tables via ``num_returns=P`` object refs — P^2 small objects per
  round, each shipped once through the object store, receivers reduce with
  ``np.bincount``.  This is the same data movement as a hash shuffle without
  per-iteration DAG overhead.
- ``exchange='groupby'``: the message tables become a Dataset
  (``from_arrow_refs``, zero-copy) which is combined with a
  ``groupby('dst')`` sum shuffle (stages/agg.py bucketed form — per-dst
  cardinality ~ V) and routed back to shards by a ``map_batches`` stage —
  the literal north-star formulation, kept for parity/benchmarking.

Float64 end-to-end (the reference's x100_000 int fixed-point exists only to
avoid atomic doubles; shard-owned state does not need it).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..pipelines.graph_build import BuiltGraph
from ..state.checkpoint import CheckpointManager, files_by_part
from ..state.shards import PageRankShard, make_shard_actors


@dataclass
class PageRankResult:
    scores: rd.Dataset  # {vid: int64, score: float64}
    ran_iterations: int
    converged: bool
    max_delta: float
    nodes: int
    metrics: dict = field(default_factory=dict)


def _exchange_direct(actors, P):
    if P == 1:
        out = actors[0].push.remote()
        return [ray.get(actors[0].apply.remote(out))]
    outs = [a.push.options(num_returns=P).remote() for a in actors]
    acks = [
        actors[p].apply.remote(*[outs[q][p] for q in range(P)]) for p in range(P)
    ]
    return ray.get(acks)


class _RouteApply:
    """Dataset-exchange apply stage: route aggregated rows to owning shards."""

    def __init__(self, actors, bounds):
        self.actors = actors
        self.bounds = np.asarray(bounds)

    def __call__(self, batch: pa.Table) -> pa.Table:
        dst = batch["dst"].to_numpy()
        part = np.searchsorted(self.bounds, dst, side="right") - 1
        order = np.argsort(part, kind="stable")
        sorted_t = batch.take(pa.array(order))
        part_sorted = part[order]
        cuts = np.searchsorted(part_sorted, np.arange(len(self.bounds) - 1))
        acks = []
        for p in range(len(self.bounds) - 1):
            end = cuts[p + 1] if p + 1 < len(self.bounds) - 1 else len(part_sorted)
            chunk = sorted_t.slice(cuts[p], end - cuts[p])
            if chunk.num_rows:
                acks.append(self.actors[p].apply_block.remote(chunk))
        ray.get(acks)
        return pa.table({"routed": pa.array([batch.num_rows], pa.int64())})


def _exchange_groupby(actors, P, bounds):
    from ..stages.agg import bucketed_agg

    refs = [a.push_all.remote() for a in actors]
    msgs = rd.from_arrow_refs(refs)
    # per-dst cardinality ~ V -> bucketed aggregate (stages/agg.py); the
    # native sort-based Aggregate walks groups in per-key Python
    agg = bucketed_agg(msgs, "dst", {"contrib": ("contrib", "sum")}, types={"contrib": pa.float64()})
    from ..stages.agg import route_stage_args

    routed = agg.map_batches(
        _RouteApply(actors, bounds), batch_format="pyarrow", batch_size=65536, **route_stage_args()
    )
    routed.count()  # drive the pipeline
    return ray.get([a.finish_iteration.remote() for a in actors])


def _run_fused(
    actors, P, n_iter, tol, iterations, ckpt, bounds, checkpoint_every,
    termination=None, baseline=None, chaos_hook=None, prog=None,
):
    """Single-wave pipelined loop: call k applies round k-1 and pushes round k.

    Convergence is checked with a **two-round lag**: at a check point the
    driver reads the max-delta of a round submitted two iterations earlier,
    which has (nearly always) already finished — so the check does not drain
    the run-ahead pipeline.  A round-k barrier every 8 rounds costs a full
    round of latency (~3ms/round amortized at P=8, measured at the 47M-edge
    bench size); the lagged check costs the same deterministic overshoot
    semantics with ~zero stall.  tol-mode therefore runs up to three extra
    applies — extra applies only tighten the scores.  Fixed-iteration mode
    submits exactly ``iterations`` applies.
    """
    import ray as _ray

    check_every = 8 if (iterations is None and tol is not None) else n_iter
    msgs = [a.step.options(num_returns=2).remote() for a in actors]  # initial push
    md_history: dict[int, list] = {}
    max_delta = float("inf")
    converged = False
    ran = 0
    for it in range(n_iter):
        if termination is not None:  # cooperative cancel between BSP rounds
            termination.assert_running("pagerank fused loop")
        if chaos_hook is not None:  # fault-injection point (tests)
            chaos_hook(it, actors)
        msg_refs = [m[0] for m in msgs]
        # spread-ref submission (scheduler resolves the P deps per task); the
        # driver runs ahead without a barrier, so round latency is the
        # actors' critical path, not a per-round sync
        msgs = [a.step.options(num_returns=2).remote(*msg_refs) for a in actors]
        md_history[it] = [m[1] for m in msgs]
        md_history.pop(it - 3, None)
        ran = it + 1
        if prog is not None:  # max_delta is the lagged value (run-ahead loop)
            prog.report(it, max_delta=float(max_delta))
        if ckpt is not None and (it % checkpoint_every == 0 or it == n_iter - 1):
            files = _ray.get([a.save_state.remote(ckpt.state_dir(), it) for a in actors])
            max_delta = max(_ray.get(md_history[it]))
            if baseline is not None:
                # gate the commit: a silently-restarted shard (idle-window
                # kill raises nothing) must not get its fresh-state file
                # committed — raises ShardRestartDetected -> pool rollback
                from ..state.failover import verify_incarnations

                verify_incarnations(actors, baseline)
            ckpt.commit_iteration(
                it,
                files,
                {"max_delta": max_delta, "bounds": [int(b) for b in bounds], "algo": "pagerank"},
            )
            if iterations is None and tol is not None and max_delta < tol:
                converged = True
                break
            continue
        if iterations is None and tol is not None and (it + 1) % check_every == 0:
            lagged = max(it - 2, 0)
            max_delta = max(_ray.get(md_history.get(lagged, md_history[it])))
            if max_delta < tol:
                converged = True
                break
    if not converged and ran:
        # a non-converged exit would otherwise report the LAGGED delta (up
        # to check_every+2 rounds stale) against the final applied scores
        max_delta = max(_ray.get(md_history[ran - 1]))
    return ran, converged, max_delta


def _run_mailbox(
    actors, P, n_iter, tol, iterations, ckpt, bounds, checkpoint_every,
    termination=None, baseline=None, chaos_hook=None, prog=None,
):
    """Block-wise driver for the mailbox exchange: k rounds per actor call.

    Total pushes = applies + 1 (round r applies r-1), so ``n_iter`` applies
    need ``n_iter + 1`` rounds.  Convergence is checked at block boundaries
    (every ``block`` applies) — deterministic overshoot like the fused loop.
    """
    ray.get([a.set_peers.remote(actors) for a in actors])
    block = checkpoint_every if ckpt is not None else (8 if iterations is None else n_iter)
    total_rounds = n_iter + 1
    done = 0
    md = float("inf")
    converged = False
    while done < total_rounds:
        if termination is not None:  # cooperative cancel between blocks
            termination.assert_running("pagerank mailbox loop")
        if chaos_hook is not None:  # fault-injection point (tests)
            chaos_hook(done, actors)
        k = min(block, total_rounds - done)
        mds = ray.get([a.run_rounds.remote(done, k) for a in actors])
        done += k
        md = max(mds)
        applies = done - 1
        if prog is not None:
            prog.report(max(0, applies), max_delta=float(md))
        if ckpt is not None and applies > 0:
            files = ray.get([a.save_state.remote(ckpt.state_dir(), applies - 1) for a in actors])
            if baseline is not None:
                from ..state.failover import verify_incarnations

                verify_incarnations(actors, baseline)
            ckpt.commit_iteration(
                applies - 1,
                files,
                {"max_delta": md, "bounds": [int(b) for b in bounds], "algo": "pagerank"},
            )
        if iterations is None and tol is not None and applies > 0 and md < tol:
            converged = True
            break
    return max(0, done - 1), converged, md


def pagerank(
    graph: BuiltGraph,
    *,
    damping: float = 0.85,
    iterations: int | None = None,
    tol: float | None = 1e-6,
    max_iterations: int = 200,
    exchange: str = "fused",
    threads: int = 1,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    termination: "TerminationFlag | None" = None,
    max_failovers: int = 2,
    chaos_hook=None,
    on_progress=None,
    progress_interval_s: float = 10.0,
    progress_logger=None,
) -> PageRankResult:
    """``max_failovers``: with a ``checkpoint_dir``, shard actors run with
    ``max_restarts`` and a mid-run worker death triggers up to this many
    pool rollbacks to the last committed manifest (state/failover.py) before
    the error propagates.  ``chaos_hook(iteration, actors)`` is a
    fault-injection point called at the top of every driver round (tests).

    ``on_progress(event)`` / ``progress_logger``: throttled per-iteration
    progress (``state/progress.py``; reference ProgressLogger.java parity) —
    at most one event per ``progress_interval_s`` seconds plus a final one."""
    t0 = time.perf_counter()
    from ..state.progress import make_reporter

    prog = make_reporter(on_progress, progress_interval_s, "pagerank", progress_logger)
    from ..state.failover import (
        FAILOVER_ERRORS,
        ShardRestartDetected,
        pool_incarnations,
        rollback_pool,
        verify_incarnations,
    )
    from ..state.shards import MailboxPageRankShard

    if resume and exchange == "mailbox":
        exchange = "fused"  # resumed runs use the driver-loop paths
    cls = MailboxPageRankShard if exchange == "mailbox" else PageRankShard
    actor_kwargs = {"damping": damping, "threads": threads}
    if checkpoint_dir:
        # restarted shards warm-start from the latest manifest in __init__
        actor_kwargs["ckpt_dir"] = checkpoint_dir
    actor_cpus = max(0.25, threads - 0.5)

    def _make_pool(c):
        return make_shard_actors(
            c, graph, actor_kwargs=actor_kwargs, num_cpus=actor_cpus,
            max_restarts=3 if checkpoint_dir else 0,
        )

    ckpt = CheckpointManager(checkpoint_dir, "pagerank") if checkpoint_dir else None
    if ckpt is not None and not resume:
        ckpt.reset()  # BEFORE the pool: shards rehydrate in __init__

    actors = _make_pool(cls)
    ray.get([a.ready.remote() for a in actors])
    P = graph.P

    start_iter = 0
    if resume and ckpt is not None:
        m = ckpt.latest()
        if m is not None:
            ckpt.validate_resume(m, algo="pagerank", bounds=graph.bounds)
            files = files_by_part(m["files"])
            ray.get([actors[p].load_state.remote(files[p]) for p in range(P)])
            start_iter = m["iteration"] + 1
    load_s = time.perf_counter() - t0

    n_iter = iterations if iterations is not None else max_iterations
    max_delta = float("inf")
    converged = False
    ran = 0
    failovers = 0
    baseline = pool_incarnations(actors) if ckpt is not None else None
    t1 = time.perf_counter()

    def _run_segment(seg_start, seg_exchange, seg_baseline):
        if n_iter <= 0:
            # 0 applies: return the initialization scores. The fused loop
            # would KeyError on its empty delta history and the mailbox
            # block loop (block=0) would never advance.
            return 0, False, float("inf")
        if seg_exchange == "mailbox" and seg_start == 0:
            return _run_mailbox(
                actors, P, n_iter, tol, iterations, ckpt, graph.bounds, checkpoint_every,
                termination, seg_baseline, chaos_hook, prog,
            )
        if seg_exchange == "fused" and seg_start == 0:
            return _run_fused(
                actors, P, n_iter, tol, iterations, ckpt, graph.bounds, checkpoint_every,
                termination, seg_baseline, chaos_hook, prog,
            )
        # split/groupby exchanges (and resumed runs, which need exact
        # iteration accounting from a mid-stream start)
        if seg_exchange == "fused":
            seg_exchange = "direct"
        md, conv = float("inf"), False
        it = seg_start - 1
        for it in range(seg_start, n_iter):
            if termination is not None:  # cooperative cancel between rounds
                termination.assert_running("pagerank loop")
            if chaos_hook is not None:  # fault-injection point (tests)
                chaos_hook(it, actors)
            if seg_exchange == "direct":
                deltas = _exchange_direct(actors, P)
            else:
                deltas = _exchange_groupby(actors, P, graph.bounds)
            md = max(deltas) if deltas else 0.0
            if prog is not None:
                prog.report(it, max_delta=float(md))
            if ckpt is not None and (it % checkpoint_every == 0 or it == n_iter - 1):
                files = ray.get([a.save_state.remote(ckpt.state_dir(), it) for a in actors])
                if seg_baseline is not None:
                    verify_incarnations(actors, seg_baseline)
                ckpt.commit_iteration(
                    it, files, {"max_delta": md, "bounds": graph.bounds.tolist(), "algo": "pagerank"}
                )
            if iterations is None and tol is not None and md < tol:
                conv = True
                break
        return it - seg_start + 1, conv, md

    call_start_iter = start_iter  # failover rollbacks move start_iter forward;
    # ran_iterations must still count every apply since THIS call's start
    try:
        while True:
            try:
                ran, converged, max_delta = _run_segment(start_iter, exchange, baseline)
                ran += start_iter - call_start_iter  # checkpointed applies kept across rollback
                if baseline is not None:
                    # final gate: a restart after the last commit must not
                    # leak fresh-state scores into the result
                    verify_incarnations(actors, baseline)
                break
            except FAILOVER_ERRORS + (ShardRestartDetected,):
                if ckpt is None or failovers >= max_failovers:
                    raise
                failovers += 1
                if exchange == "mailbox":
                    # mailbox shards are async actors holding peer handles:
                    # survivors' stalled run_rounds could interleave with a
                    # rollback, so replace the pool wholesale instead
                    for a in actors:
                        ray.kill(a, no_restart=True)
                    actors = _make_pool(PageRankShard)
                    ray.get([a.ready.remote() for a in actors])
                exchange = "direct"
                start_iter, baseline = rollback_pool(
                    actors, ckpt, algo="pagerank", bounds=graph.bounds
                )
    except BaseException:
        # cancellation (or any failure) must not leak actor reservations —
        # the last committed checkpoint stays on disk for resume=True
        for a in actors:
            ray.kill(a, no_restart=True)
        raise
    compute_s = time.perf_counter() - t1
    if prog is not None:  # same convergence semantics as the result below
        prog.report(
            max(0, ran - 1), final=True, max_delta=float(max_delta),
            converged=bool(converged or (iterations is not None)),
        )

    score_refs = [a.scores_table.remote() for a in actors]
    ray.wait(score_refs, num_returns=len(score_refs), fetch_local=False)
    # release the pool explicitly: mailbox shards hold peer handles (a
    # reference cycle Python GC won't break across actors), and reservations
    # must not accumulate across successive runs in one session
    for a in actors:
        ray.kill(a, no_restart=True)
    scores = rd.from_arrow_refs(score_refs)
    return PageRankResult(
        scores=scores,
        ran_iterations=ran,
        converged=converged or (iterations is not None),
        max_delta=max_delta,
        nodes=graph.n_vertices,
        metrics={
            "loadMillis": int(load_s * 1000),
            "computeMillis": int(compute_s * 1000),
            "edges_processed": graph.n_edges * max(0, ran),
            "edges_per_sec": (graph.n_edges * max(0, ran)) / compute_s if compute_s > 0 else 0.0,
            "exchange": exchange,
            "p": P,
            "failovers": failovers,
            **(prog.summary() if prog is not None else {}),
        },
    )


def pagerank_scores_with_keys(graph: BuiltGraph, result: PageRankResult) -> rd.Dataset:
    """Join scores back to (repo, path) keys — the reference's write-back
    (``Exporter.java:112-117``) as a Dataset join + write."""
    verts = graph.vertices_ds()
    joined = result.scores.join(verts, "inner", max(1, graph.P), on=("vid",), right_on=("vid",))
    return joined


def pagerank_oracle(
    n: int, src: np.ndarray, dst: np.ndarray, *, damping=0.85, iterations=None, tol=None, max_iterations=200
) -> np.ndarray:
    """Independent NumPy reference with identical semantics (tests, FIXTURES.md §10.2)."""
    alpha = 1.0 - damping
    score = np.full(n, alpha)
    delta = score.copy()
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    n_iter = iterations if iterations is not None else max_iterations
    for _ in range(n_iter):
        coef = np.divide(delta, outdeg, out=np.zeros_like(delta), where=outdeg > 0)
        sums = np.bincount(dst, weights=coef[src], minlength=n)
        inc = damping * sums
        score += inc
        delta = inc
        if iterations is None and tol is not None and (inc.max(initial=0.0) < tol):
            break
    return score
