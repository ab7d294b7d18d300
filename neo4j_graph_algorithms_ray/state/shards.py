"""Per-partition CSR shard actors — the engine's stateful compute layer.

The reference runs every algorithm as parallel ``ComputeStep``s over node-range
partitions of an in-memory graph, with per-partition score arrays exchanged
between phases (``PageRank.java:383-423,455-517``); its own doc-comment calls
this "writing partition files and transferring them across the network"
(``PageRank.java:45-95``).  Here that design is realized literally: each shard
is a Ray actor owning

- the CSR of the out-edges whose source vid falls in its contiguous range
  ``[lo, hi)`` (loaded from the graph's partitioned Parquet — which makes every
  actor reconstructible after a failure or a resume), and
- the vertex state (scores / deltas / labels) for that same range.

Message exchange is a BSP all-to-all of *pre-aggregated* Arrow tables: a
shard's ``push`` combines contributions per destination locally
(``np.add.reduceat`` over a dst-sorted edge layout, built once at init — the
distributed analogue of ``combineScores``, ``PageRank.java:487-503``) and
returns one table per destination shard via ``num_returns=P``, so each
sub-table ships through the object store directly to its consumer.  This is
exactly the data movement a ``groupby(dst).aggregate(Sum)`` shuffle performs,
minus a per-iteration Dataset DAG — on iterative algorithms the driver loop
runs hundreds of rounds, so exchange latency dominates.  A Dataset-shuffle
exchange mode is provided in ``pipelines/pagerank.py`` for comparison.

Why raw actors and not ``map_batches(Cls, concurrency=P)``: the Dataset API
has no way to address *the shard that owns vid range [lo,hi)* across
iterations — actor-pool map workers are anonymous and fungible.  Iterative
vertex state pinned to a partition is the canonical case for dropping to
``@ray.remote`` actors.
"""

from __future__ import annotations

import glob
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray


def _read_partition(edges_dir: str, part: int, columns: list[str]) -> pa.Table:
    """Read one Hive partition of the edge table (absent dir -> empty)."""
    pdir = os.path.join(edges_dir, f"part={part}")
    files = sorted(glob.glob(os.path.join(pdir, "*.parquet")))
    if not files:
        return pa.table({c: pa.array([], pa.int64() if c != "weight" else pa.float64()) for c in columns})
    return pa.concat_tables([pq.read_table(f, columns=columns) for f in files])


class EdgeShardBase:
    """CSR over one source-partition of the edge table.

    Layout mirrors the reference CSR (``HugeGraphImpl.java:41-79``) minus the
    varint compression (Arrow/NumPy buffers are already compact):
    ``outdeg[v-lo]`` plus a dst-sorted edge list with per-unique-dst segments
    for map-side combining.
    """

    def __init__(
        self, part: int, bounds, edges_dir: str, weighted: bool = False,
        build_layout: bool = True,
    ):
        self.part = int(part)
        self.bounds = np.asarray(bounds, dtype=np.int64)
        self.P = len(self.bounds) - 1
        self.lo = int(self.bounds[part])
        self.hi = int(self.bounds[part + 1])
        self.n_local = self.hi - self.lo
        # per-process token: a Ray actor restart re-runs __init__ in a fresh
        # process, so a changed token is the only reliable signal of an
        # idle-window kill (which raises no exception anywhere) — see
        # state/failover.py
        self.incarnation = uuid.uuid4().hex

        if not build_layout:
            # subclass replaces the whole traversal layout (e.g. MS-BFS with
            # direction=INCOMING reads only the reverse partition) — skip the
            # forward read + O(E log E) sort that would be thrown away.
            # outdeg is None, not zeros: a consumer that needs it should fail
            # loudly rather than read silently-wrong degrees.
            self.n_edges = 0
            self.outdeg = None
            self.esrc_by_dst = np.array([], dtype=np.int32)
            self.w_by_dst = None
            self.uniq_dst = np.array([], dtype=np.int64)
            self.seg_starts = np.array([], dtype=np.int64)
            self.dst_split = np.searchsorted(self.uniq_dst, self.bounds[1:-1])
            return

        cols = ["src", "dst"] + (["weight"] if weighted else [])
        t = _read_partition(edges_dir, part, cols)
        src = t["src"].to_numpy().astype(np.int64, copy=False)
        dst = t["dst"].to_numpy().astype(np.int64, copy=False)
        esrc = src - self.lo
        self.n_edges = len(src)
        self.outdeg = np.bincount(esrc, minlength=self.n_local).astype(np.float64)

        # dst-sorted view for per-destination combining (int32 local ids:
        # n_local < 2^31 by construction, halves the gather's input stream)
        order = np.argsort(dst, kind="stable")
        dst_sorted = dst[order]
        self.esrc_by_dst = esrc[order].astype(np.int32)
        # weights live in dst-sorted order too — the only order any consumer
        # (SSSP relax, delta-stepping light/heavy split) walks edges in
        self.w_by_dst = (
            t["weight"].to_numpy().astype(np.float64, copy=False)[order] if weighted else None
        )
        if self.n_edges:
            self.uniq_dst, self.seg_starts = np.unique(dst_sorted, return_index=True)
        else:
            self.uniq_dst = np.array([], dtype=np.int64)
            self.seg_starts = np.array([], dtype=np.int64)
        # split points of uniq_dst by owning shard (uniq_dst sorted, shards contiguous)
        self.dst_split = np.searchsorted(self.uniq_dst, self.bounds[1:-1])
        # src/dst/esrc/order (24 bytes/edge of int64) are init-only scaffolding
        # — the resident CSR is esrc_by_dst (4 B/edge) + per-uniq-dst arrays;
        # dropping them here cuts steady-state shard memory >2x at 100-TB
        # shard sizes (locals go out of scope at return)

    def ready(self) -> int:
        return self.n_edges

    def whoami(self) -> str:
        return self.incarnation

    def maybe_rehydrate(self, ckpt_dir: str | None, algo: str) -> int:
        """Post-restart hook — see ``checkpoint.rehydrate_shard``."""
        from .checkpoint import rehydrate_shard

        return rehydrate_shard(self, ckpt_dir, algo)

    def _split_by_owner(self, values: np.ndarray):
        """Split a per-uniq-dst vector into P chunks aligned with dst ranges."""
        return np.split(values, self.dst_split)

    def combine_by_dst(self, per_edge: np.ndarray) -> np.ndarray:
        """Sum a per-edge (dst-sorted order) vector into per-unique-dst sums."""
        if len(self.seg_starts) == 0:
            return np.array([], dtype=np.float64)
        return np.add.reduceat(per_edge, self.seg_starts)

    def _dst_per_edge(self) -> np.ndarray:
        """Per-edge dst vids in dst-sorted order, reconstructed from the
        segment arrays (the full int64 dst column is init-only scaffolding)."""
        if not self.n_edges:
            return np.array([], dtype=np.int64)
        seg_lens = np.diff(np.append(self.seg_starts, self.n_edges))
        return np.repeat(self.uniq_dst, seg_lens)


class PageRankShard(EdgeShardBase):
    """Delta-push PageRank state (``PageRank.java:444-517`` semantics, float64).

    Deviation from the reference: no 100_000x int fixed-point — that exists
    only to avoid atomic doubles in shared arrays; shards own their state, so
    float64 end-to-end (documented in SURVEY.md §7.2).
    """

    def __init__(
        self, part, bounds, edges_dir, damping: float = 0.85, threads: int = 1,
        ckpt_dir: str | None = None,
    ):
        super().__init__(part, bounds, edges_dir, weighted=False)
        self.d = float(damping)
        self.alpha = 1.0 - self.d
        self.threads = max(1, int(threads))
        if self.threads > 1 and len(self.seg_starts) > self.threads:
            from concurrent.futures import ThreadPoolExecutor

            # segment-aligned chunk boundaries over the dst-sorted edge list;
            # the gather + reduceat kernel releases the GIL, so a small
            # thread pool scales the per-shard kernel to several cores while
            # keeping P (and the P^2-ish per-round coordination cost) small
            cuts = np.searchsorted(
                self.seg_starts,
                np.linspace(0, self.n_edges, self.threads + 1)[1:-1].astype(np.int64),
            )
            self._seg_bounds = np.concatenate([[0], cuts, [len(self.seg_starts)]])
            self._pool = ThreadPoolExecutor(self.threads)
        else:
            self._pool = None
        # slice of uniq_dst that falls in this shard's own range: the fused
        # exchange applies it in-process instead of round-tripping the (for
        # clustered graphs dominant) self-message through the object store
        self._self_a = int(np.searchsorted(self.uniq_dst, self.lo))
        self._self_b = int(np.searchsorted(self.uniq_dst, self.hi))
        self._self_idx = (self.uniq_dst[self._self_a : self._self_b] - self.lo).astype(np.int64)
        self._self_pending: np.ndarray | None = None
        self.reset()
        self.maybe_rehydrate(ckpt_dir, "pagerank")

    def reset(self):
        self.score = np.full(self.n_local, self.alpha, dtype=np.float64)
        self.delta = np.full(self.n_local, self.alpha, dtype=np.float64)
        self._self_pending = None

    # -- BSP exchange -------------------------------------------------------
    def push(self):
        """One scatter: per-dst pre-aggregated contributions, one table per shard."""
        coef = np.divide(
            self.delta, self.outdeg, out=np.zeros_like(self.delta), where=self.outdeg > 0
        )
        sums = self.combine_by_dst(coef[self.esrc_by_dst])
        out = []
        for dchunk, schunk in zip(self._split_by_owner(self.uniq_dst), self._split_by_owner(sums)):
            out.append(pa.table({"dst": pa.array(dchunk), "contrib": pa.array(schunk)}))
        return tuple(out) if self.P > 1 else out[0]

    def apply(self, *tables) -> float:
        """Gather: sum incoming contributions, update score/delta; return max|delta|."""
        acc = np.zeros(self.n_local, dtype=np.float64)
        for t in tables:
            if t is not None and t.num_rows:
                idx = t["dst"].to_numpy().astype(np.int64, copy=False) - self.lo
                acc += np.bincount(idx, weights=t["contrib"].to_numpy(), minlength=self.n_local)
        inc = self.d * acc
        self.score += inc
        self.delta = inc
        return float(inc.max(initial=0.0))

    # -- fused packed exchange (single-node fast path) ----------------------
    def step(self, *incoming) -> tuple:
        """Fused apply(previous round) + push(next round), packed messages.

        ``incoming`` are the *packed* message tables of every shard from the
        previous call (dst-sorted); this shard takes its slice of each via
        binary search — a zero-copy plasma read of just its range.  First
        call (no args) only pushes the initial deltas.

        One actor call per shard per iteration (vs separate push/apply waves)
        and P objects per round (vs P^2 with the split exchange): at P=32 the
        split exchange spent ~110ms/iteration on object plumbing against a
        16ms kernel.  On a multi-node cluster the packed table would be
        fetched by every node, so there the right grouping is one object per
        destination *node* (P_node << P_shard); ``push``/``apply`` retain the
        fully-split variant.
        """
        if len(incoming) == 1 and isinstance(incoming[0], list):
            # nested-ref form: the driver passed ObjectRefs inside a list so
            # the task schedules immediately and this actor resolves the
            # messages from local plasma itself (cuts scheduler-side
            # dependency tracking of P^2 ref-args per round)
            incoming = ray.get(incoming[0])
        md = 0.0
        if incoming:
            acc = np.zeros(self.n_local, dtype=np.float64)
            if self._self_pending is not None:
                # _self_idx entries are unique (a uniq_dst slice): plain fancy
                # add, not np.add.at (which is ~10x slower)
                acc[self._self_idx] += self._self_pending
            for t in incoming:
                if t is None or t.num_rows == 0:
                    continue
                dst = t["dst"].to_numpy()
                a = np.searchsorted(dst, self.lo)
                b = np.searchsorted(dst, self.hi)
                if a == b:
                    continue
                idx = dst[a:b] - self.lo
                acc += np.bincount(
                    idx, weights=t["contrib"].to_numpy()[a:b], minlength=self.n_local
                )
            inc = self.d * acc
            self.score += inc
            self.delta = inc
            md = float(inc.max(initial=0.0))
        else:
            md = float(self.delta.max(initial=0.0))
        return self.push_all(exclude_self=True), md

    # -- dataset-exchange variant ------------------------------------------
    def push_all(self, exclude_self: bool = False) -> pa.Table:
        """One combined contribution table (dst-sorted).

        ``exclude_self=True`` (fused exchange): contributions to this shard's
        own range are parked in ``_self_pending`` and applied in-process next
        round; only cross-shard rows are emitted — for clustered graphs that
        shrinks the per-round object-store traffic by orders of magnitude.
        """
        coef = np.divide(
            self.delta, self.outdeg, out=np.zeros_like(self.delta), where=self.outdeg > 0
        )
        if self._pool is not None:

            def chunk(i):
                slo, shi = self._seg_bounds[i], self._seg_bounds[i + 1]
                if slo == shi:
                    return np.array([], dtype=np.float64)
                lo = self.seg_starts[slo]
                hi = self.seg_starts[shi] if shi < len(self.seg_starts) else self.n_edges
                return np.add.reduceat(
                    coef[self.esrc_by_dst[lo:hi]], self.seg_starts[slo:shi] - lo
                )

            parts = list(self._pool.map(chunk, range(self.threads)))
            sums = np.concatenate(parts)
        else:
            sums = self.combine_by_dst(coef[self.esrc_by_dst])
        if not exclude_self:
            return pa.table({"dst": pa.array(self.uniq_dst), "contrib": pa.array(sums)})
        a, b = self._self_a, self._self_b
        self._self_pending = sums[a:b].copy()
        dst_x = np.concatenate([self.uniq_dst[:a], self.uniq_dst[b:]])
        sums_x = np.concatenate([sums[:a], sums[b:]])
        return pa.table({"dst": pa.array(dst_x), "contrib": pa.array(sums_x)})

    def apply_block(self, table: pa.Table):
        """Accumulate one aggregated block routed to this shard (dataset mode)."""
        if table.num_rows:
            idx = table["dst"].to_numpy().astype(np.int64, copy=False) - self.lo
            self._pending = getattr(self, "_pending", np.zeros(self.n_local)) + np.bincount(
                idx, weights=table["contrib"].to_numpy(), minlength=self.n_local
            )
        return self.part

    def finish_iteration(self) -> float:
        acc = getattr(self, "_pending", None)
        if acc is None:
            acc = np.zeros(self.n_local, dtype=np.float64)
        self._pending = np.zeros(self.n_local, dtype=np.float64)
        inc = self.d * acc
        self.score += inc
        self.delta = inc
        return float(inc.max(initial=0.0))

    # -- results / checkpoint ----------------------------------------------
    def scores_table(self) -> pa.Table:
        return pa.table(
            {
                "vid": pa.array(np.arange(self.lo, self.hi, dtype=np.int64)),
                "score": pa.array(self.score),
            }
        )

    def state_table(self) -> pa.Table:
        return pa.table(
            {
                "vid": pa.array(np.arange(self.lo, self.hi, dtype=np.int64)),
                "score": pa.array(self.score),
                "delta": pa.array(self.delta),
            }
        )

    def save_state(self, ckpt_dir: str, iteration: int) -> str:
        """Atomic per-partition state checkpoint (write temp, rename)."""
        from .checkpoint import atomic_save_table

        return atomic_save_table(self.state_table(), ckpt_dir, iteration, self.part)

    def load_state(self, path: str):
        t = pq.read_table(path)
        assert t.num_rows == self.n_local
        self.score = t["score"].to_numpy().astype(np.float64, copy=True)
        self.delta = t["delta"].to_numpy().astype(np.float64, copy=True)
        # exchange scratch from an aborted round must not leak into a
        # rolled-back run (the fused loop parks self-contributions here)
        self._self_pending = None
        self._pending = np.zeros(self.n_local, dtype=np.float64)
        return self.part


class MailboxPageRankShard(PageRankShard):
    """BSP PageRank with direct actor->actor message deposits.

    The driver-mediated exchanges put Ray's scheduler on the per-round
    critical path (~12ms/round at P=8 against a ~14ms kernel).  Here each
    shard fire-and-forgets its per-peer cross-contribution chunks straight to
    the owning peers (asyncio actor mailbox keyed by round); chunks are
    kilobyte-scale for clustered graphs, so they travel inline in the actor
    RPC — no object store, no driver, no dependency tracking.  The driver
    only calls ``run_rounds(start, k)`` per convergence-check block and
    collects max-deltas.

    Safety: rounds are strictly numbered; a peer may run ahead a full block —
    deposits buffer in the mailbox until their round is applied, and
    ``run_rounds`` awaits exactly P-1 deposits (every peer always sends,
    empty chunks included) before applying a round.  No cycles: round r
    consumes only round r-1 messages.
    """

    DEPOSIT_TIMEOUT_S = 120.0

    def __init__(
        self, part, bounds, edges_dir, damping: float = 0.85, threads: int = 1,
        ckpt_dir: str | None = None,
    ):
        super().__init__(part, bounds, edges_dir, damping, threads, ckpt_dir)
        import asyncio

        self._cond = asyncio.Condition()
        self._inbox: dict[int, list] = {}
        self._deposit_refs: list = []
        self._expected = self.P - 1
        self.peers = None
        self._peer_slice = []
        for q in range(self.P):
            a = int(np.searchsorted(self.uniq_dst, self.bounds[q]))
            b = int(np.searchsorted(self.uniq_dst, self.bounds[q + 1]))
            self._peer_slice.append((a, b))

    def set_peers(self, peers):
        self.peers = peers
        return self.part

    async def deposit(self, rnd: int, table):
        async with self._cond:
            self._inbox.setdefault(rnd, []).append(table)
            self._cond.notify_all()

    def _apply_round(self, tables) -> float:
        acc = np.zeros(self.n_local, dtype=np.float64)
        if self._self_pending is not None:
            acc[self._self_idx] += self._self_pending
        for t in tables:
            if t is None or t.num_rows == 0:
                continue
            idx = t["dst"].to_numpy().astype(np.int64, copy=False) - self.lo
            acc += np.bincount(idx, weights=t["contrib"].to_numpy(), minlength=self.n_local)
        inc = self.d * acc
        self.score += inc
        self.delta = inc
        return float(inc.max(initial=0.0))

    def _push_round(self, rnd: int):
        coef = np.divide(
            self.delta, self.outdeg, out=np.zeros_like(self.delta), where=self.outdeg > 0
        )
        if self._pool is not None:

            def chunk(i):
                slo, shi = self._seg_bounds[i], self._seg_bounds[i + 1]
                if slo == shi:
                    return np.array([], dtype=np.float64)
                lo = self.seg_starts[slo]
                hi = self.seg_starts[shi] if shi < len(self.seg_starts) else self.n_edges
                return np.add.reduceat(coef[self.esrc_by_dst[lo:hi]], self.seg_starts[slo:shi] - lo)

            sums = np.concatenate(list(self._pool.map(chunk, range(self.threads))))
        else:
            sums = self.combine_by_dst(coef[self.esrc_by_dst])
        a, b = self._self_a, self._self_b
        self._self_pending = sums[a:b].copy() if b > a else None
        for q in range(self.P):
            if q == self.part:
                continue
            qa, qb = self._peer_slice[q]
            t = pa.table(
                {"dst": pa.array(self.uniq_dst[qa:qb]), "contrib": pa.array(sums[qa:qb])}
            )
            # retain the ack ref: a failed deposit RPC (peer death,
            # serialization error) must surface, not vanish — dropped refs
            # made any lost deposit an undiagnosable all-peer deadlock
            self._deposit_refs.append(self.peers[q].deposit.remote(rnd, t))
        if len(self._deposit_refs) > 4 * self.P:
            done, pending = ray.wait(
                list(self._deposit_refs), num_returns=len(self._deposit_refs), timeout=0
            )
            ray.get(done)  # raise if any failed
            self._deposit_refs = list(pending)

    async def run_rounds(self, start: int, count: int) -> float:
        """Execute rounds [start, start+count); round r applies r-1's messages
        then pushes r.  Returns the max-delta of the last apply.

        Deposit waits are bounded: if a peer's round message has not arrived
        within the timeout, raise a descriptive error naming the round and
        the deficit instead of deadlocking every peer's loop."""
        import asyncio

        md = float(self.delta.max(initial=0.0))
        for r in range(start, start + count):
            if r > 0:
                async with self._cond:
                    try:
                        await asyncio.wait_for(
                            self._cond.wait_for(
                                lambda: len(self._inbox.get(r - 1, [])) >= self._expected
                            ),
                            timeout=self.DEPOSIT_TIMEOUT_S,
                        )
                    except asyncio.TimeoutError:
                        got = len(self._inbox.get(r - 1, []))
                        raise RuntimeError(
                            f"shard {self.part}: round {r - 1} mailbox incomplete after "
                            f"{self.DEPOSIT_TIMEOUT_S}s ({got}/{self._expected} deposits) — "
                            "a peer died or a deposit RPC was lost"
                        ) from None
                tables = self._inbox.pop(r - 1, [])
                md = self._apply_round(tables)
            self._push_round(r)
        return md


class LabelPropShard:
    """Synchronous label-propagation state for one vertex range.

    Semantics per the reference ``LabelPropagation.java:260-289``: a vertex
    adopts the argmax-weight label among its neighbors' votes along the
    configured direction, vote weight = ``relWeight(u,t) * nodeWeight(t)``;
    a vertex with no votes keeps its label.  Deviations (pinned for
    determinism; the reference is async + randomized and only its *converged*
    fixtures are asserted, ``LabelPropagation420Test.java:154-158``):

    - ties break to the smallest label (reference: hash-map iteration order),
    - updates are synchronous in two deterministic phases per iteration
      (vertices with even vid, then odd vid — red/black Gauss-Seidel), which
      breaks the two-cycles plain Jacobi iteration oscillates on.

    Voter labels live on remote shards: at init each shard registers which of
    its voters' vids it needs from each peer (fixed sets — the graph does not
    change), then each round ships exactly those boundary labels
    (``serve_labels`` with ``num_returns=P``).
    """

    OUTGOING, INCOMING, BOTH = "OUTGOING", "INCOMING", "BOTH"

    def __init__(self, part, bounds, edges_dir, rev_edges_dir=None, direction="OUTGOING"):
        self.part = int(part)
        self.bounds = np.asarray(bounds, dtype=np.int64)
        self.P = len(self.bounds) - 1
        self.lo = int(self.bounds[part])
        self.hi = int(self.bounds[part + 1])
        self.n_local = self.hi - self.lo
        self.incarnation = uuid.uuid4().hex  # see EdgeShardBase.incarnation

        us, ts, ws = [], [], []
        if direction in (self.OUTGOING, self.BOTH):
            t = _read_partition(edges_dir, part, ["src", "dst", "weight"])
            us.append(t["src"].to_numpy().astype(np.int64, copy=False))
            ts.append(t["dst"].to_numpy().astype(np.int64, copy=False))
            ws.append(t["weight"].to_numpy().astype(np.float64, copy=False))
        if direction in (self.INCOMING, self.BOTH):
            assert rev_edges_dir is not None
            t = _read_partition(rev_edges_dir, part, ["src", "dst", "weight"])
            us.append(t["dst"].to_numpy().astype(np.int64, copy=False))
            ts.append(t["src"].to_numpy().astype(np.int64, copy=False))
            ws.append(t["weight"].to_numpy().astype(np.float64, copy=False))
        u = np.concatenate(us) if us else np.array([], dtype=np.int64)
        t_ = np.concatenate(ts) if ts else np.array([], dtype=np.int64)
        w = np.concatenate(ws) if ws else np.array([], dtype=np.float64)

        self.u_local = u - self.lo
        self.rel_w = w
        self.uniq_t = np.unique(t_)
        self.t_idx = np.searchsorted(self.uniq_t, t_)
        self.t_split = np.searchsorted(self.uniq_t, self.bounds[1:-1])
        # state (seeded later)
        self.labels = np.arange(self.lo, self.hi, dtype=np.int64)
        self.node_w = np.ones(self.n_local, dtype=np.float64)
        self.voter_w = np.ones(len(self.uniq_t), dtype=np.float64)
        self._req_idx: list[np.ndarray] = [np.array([], dtype=np.int64)] * self.P

    def ready(self) -> int:
        return len(self.u_local)

    def whoami(self) -> str:
        return self.incarnation

    # -- handshake ----------------------------------------------------------
    def needed_vids(self):
        """vids of voters this shard reads, split by owning shard."""
        chunks = np.split(self.uniq_t, self.t_split)
        return tuple(chunks) if self.P > 1 else chunks[0]

    def register_requests(self, *per_requester_vids):
        """Store, per requesting shard, the local indices it needs served."""
        self._req_idx = [np.asarray(v, dtype=np.int64) - self.lo for v in per_requester_vids]
        return self.part

    def set_seeds(self, table):
        """Apply ``{vid, partition, weight}`` rows for local vertices.

        Label default = vid (``InitStep`` uses nodeId as the property default,
        ``LabelPropagation.java:196-202``); node weight default 1.0.
        """
        if table is not None and table.num_rows:
            idx = table["vid"].to_numpy().astype(np.int64) - self.lo
            ok = (idx >= 0) & (idx < self.n_local)
            self.labels[idx[ok]] = table["partition"].to_numpy().astype(np.int64)[ok]
            self.node_w[idx[ok]] = table["weight"].to_numpy().astype(np.float64)[ok]
        return self.part

    def serve_nodeweights(self):
        out = [self.node_w[idx] for idx in self._req_idx]
        return tuple(out) if self.P > 1 else out[0]

    def set_voter_weights(self, *chunks):
        # chunks arrive in owner order; uniq_t is sorted and owners are
        # contiguous ranges, so concatenation realigns with uniq_t
        if len(self.uniq_t):
            self.voter_w = np.concatenate([np.asarray(c, dtype=np.float64) for c in chunks])
        return self.part

    # -- packed fused exchange ----------------------------------------------
    def packed_serve_vids(self) -> np.ndarray:
        """Global vids this shard serves packed: the union of every peer's
        request set (each boundary label shipped once per phase, in one
        object, instead of once per requesting peer)."""
        if self._req_idx:
            self._serve_idx = np.unique(np.concatenate(self._req_idx))
        else:
            self._serve_idx = np.array([], dtype=np.int64)
        return self._serve_idx + self.lo

    def init_packed(self, *served_vids):
        """Precompute, per peer, the positions of this shard's needed voter
        vids inside that peer's packed served array (fixed — the graph does
        not change)."""
        chunks = np.split(self.uniq_t, self.t_split)
        self._peer_pos = [None] * self.P
        self._tseg = np.concatenate([[0], self.t_split, [len(self.uniq_t)]]).astype(np.int64)
        for q in range(self.P):
            if q == self.part:
                self._self_take = chunks[q] - self.lo  # live local labels
            else:
                self._peer_pos[q] = np.searchsorted(served_vids[q], chunks[q])
        return self.part

    def serve_packed(self) -> np.ndarray:
        return self.labels[self._serve_idx]

    def step_fused(self, parity: int, *incoming):
        """Fused apply(packed peer labels) + update(parity phase) + serve.

        ``incoming[q]`` is peer q's packed boundary-label array as of the end
        of the previous phase (this shard's own entry is ignored — live local
        labels are read directly).  Returns ``(packed_labels, n_changed)``;
        the driver chains the packed outputs into the next phase's args."""
        if len(self.uniq_t):
            t_labels = np.empty(len(self.uniq_t), dtype=np.int64)
            for q in range(self.P):
                a, b = self._tseg[q], self._tseg[q + 1]
                if a == b:
                    continue
                if q == self.part:
                    t_labels[a:b] = self.labels[self._self_take]
                else:
                    t_labels[a:b] = np.asarray(incoming[q], dtype=np.int64)[self._peer_pos[q]]
        else:
            t_labels = np.array([], dtype=np.int64)
        changed = self._step_core(parity, t_labels)
        return self.serve_packed(), changed

    # -- iteration ----------------------------------------------------------
    def serve_labels(self):
        out = [self.labels[idx] for idx in self._req_idx]
        return tuple(out) if self.P > 1 else out[0]

    def step(self, parity: int, *label_chunks) -> int:
        """Update local vertices with ``vid % 2 == parity``; return #changed."""
        t_labels = (
            np.concatenate([np.asarray(c, dtype=np.int64) for c in label_chunks])
            if label_chunks
            else np.array([], dtype=np.int64)
        )
        return self._step_core(parity, t_labels)

    def _step_core(self, parity: int, t_labels: np.ndarray) -> int:
        if len(self.u_local) == 0:
            return 0
        # votes on edges whose updated endpoint is in this phase
        mask = (self.u_local + self.lo) % 2 == parity
        if not mask.any():
            return 0
        u = self.u_local[mask]
        lab = t_labels[self.t_idx[mask]]
        w = self.rel_w[mask] * self.voter_w[self.t_idx[mask]]
        order = np.lexsort((lab, u))
        u, lab, w = u[order], lab[order], w[order]
        # group by (u, label)
        new_group = np.empty(len(u), dtype=bool)
        new_group[0] = True
        np.not_equal(u[1:], u[:-1], out=new_group[1:])
        new_group[1:] |= lab[1:] != lab[:-1]
        g_starts = np.flatnonzero(new_group)
        g_u = u[g_starts]
        g_lab = lab[g_starts]
        g_w = np.add.reduceat(w, g_starts)
        # per-u argmax, tie -> smallest label (groups are label-ascending per u)
        u_new = np.empty(len(g_u), dtype=bool)
        u_new[0] = True
        np.not_equal(g_u[1:], g_u[:-1], out=u_new[1:])
        u_starts = np.flatnonzero(u_new)
        max_w = np.maximum.reduceat(g_w, u_starts)
        seg_id = np.cumsum(u_new) - 1
        is_winner = g_w == max_w[seg_id]
        first_winner = np.minimum.reduceat(
            np.where(is_winner, np.arange(len(g_w)), len(g_w)), u_starts
        )
        upd_u = g_u[u_starts]
        upd_lab = g_lab[first_winner]
        changed = int(np.count_nonzero(self.labels[upd_u] != upd_lab))
        self.labels[upd_u] = upd_lab
        return changed

    def labels_table(self) -> pa.Table:
        return pa.table(
            {
                "vid": pa.array(np.arange(self.lo, self.hi, dtype=np.int64)),
                "label": pa.array(self.labels),
            }
        )

    def save_state(self, ckpt_dir: str, iteration: int) -> str:
        """Atomic per-partition checkpoint (same protocol as PageRank).

        Persists the seeded node weights alongside the labels: voter weights
        are derived from them at resume, so a weighted-seeded run restores
        identical vote semantics without the caller re-passing seeds."""
        from .checkpoint import atomic_save_table

        state = self.labels_table().append_column("node_w", pa.array(self.node_w))
        return atomic_save_table(state, ckpt_dir, iteration, self.part)

    def load_state(self, path: str):
        t = pq.read_table(path)
        assert t.num_rows == self.n_local
        self.labels = t["label"].to_numpy().astype(np.int64, copy=True)
        if "node_w" in t.column_names:
            self.node_w = t["node_w"].to_numpy().astype(np.float64, copy=True)
        return self.part


def make_shard_actors(cls, graph, *, actor_kwargs=None, num_cpus: float = 0.25, max_restarts: int = 0):
    """Spawn one remote shard per partition of a BuiltGraph.

    ``num_cpus=0.25``: shard actors must never reserve the whole session —
    Ray Data ops issued while the pool is alive (``from_arrow_refs`` spawns a
    1-CPU metadata task per block; any map/write stage needs task slots)
    would pend forever and deadlock the driver.  P = num_cpus shards reserve
    a quarter of the session; during BSP iterations the shards are the only
    runnable work, so real parallelism is unaffected (the OS schedules the
    actor processes across all cores).  On cramped sessions (num_cpus=2) the
    total reservation is additionally clamped to ``cluster_CPU - 1`` so one
    task slot always stays free for concurrent Dataset stages.

    ``max_restarts > 0`` lets Ray revive a dead shard process (``__init__``
    re-runs, rebuilding the CSR from the partitioned Parquet); pass it
    whenever a checkpoint directory is configured — see ``state/failover.py``
    for the consistency protocol that makes a revival safe.
    """
    actor_kwargs = actor_kwargs or {}
    total_cpus = float(ray.cluster_resources().get("CPU", 1.0))
    if graph.P * num_cpus > max(0.0, total_cpus - 1.0):
        num_cpus = max(0.05, (total_cpus - 1.0) / graph.P)
    from ..portability import remote_args

    remote_cls = ray.remote(num_cpus=num_cpus, max_restarts=max_restarts, **remote_args())(cls)
    return [
        remote_cls.remote(p, graph.bounds, graph.edges_dir, **actor_kwargs)
        for p in range(graph.P)
    ]
