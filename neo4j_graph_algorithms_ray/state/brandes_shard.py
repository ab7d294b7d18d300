"""Brandes betweenness-centrality shard (reference
``impl/betweenness/BetweennessCentrality.java:108-146``: per-source BFS with
path counting, then dependency accumulation ``delta[v] += sigma[v]/sigma[w] *
(delta[w]+1)`` walking depths backward; parallel-over-sources
``ParallelBetweennessCentrality.java``; sampled ``RABrandesBetweennessCentrality.java``
scales by ``nodeCount/|sample|``).

Distributed shape — both passes are *fused push exchanges* (the PageRank
``step`` pattern, state/shards.py): one actor call per shard per BSP round
applies the previous round's packed messages and pushes the next round's,
messages to the shard's own vid range are parked in-process, and the driver
runs ahead on ObjectRef chains instead of syncing every round (the split
``num_returns=P`` exchange measured ~110ms/round of pure plumbing at P=32).

- forward: sources run in batches of S with a per-source axis on every state
  array (the MS-BFS trick applied to Brandes).  Each round pushes per-target
  pre-aggregated ``(vids, (k,S) float64)`` sigma sums along the out-edge
  layout; receivers set ``dist=depth`` / ``sigma`` on first touch.
- backward: dependency accumulation as a push over the *reverse* layout —
  the owner of a finalized depth-``c`` vertex ``w`` pushes per-predecessor
  sums of ``(1+delta[w])/sigma[w]``; the receiver applies
  ``delta[u] += sigma[u] * sum`` masked to ``dist[u]==c-1`` (a non-DAG edge
  ``u->w`` has ``dist[u] != dist[w]-1``, so stray contributions drop out).
  No pull handshake, no per-round driver sync at all: the whole backward
  pass is one fire-and-forget ObjectRef chain.

Per-vertex centrality accumulates in-actor across source batches; the driver
fetches one table at the end (no per-batch O(V) driver traffic).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .shards import _read_partition

_EMPTY_VIDS = np.array([], dtype=np.int64)


class _PushLayout:
    """Target-sorted edge layout for per-target combining.

    ``eu`` = local source index of each edge (int32), sorted by global target
    vid ``t_sorted`` — a frontier push masks edges by active source row, then
    ``np.unique`` + ``np.add.reduceat`` combines the masked subset per target
    (the subset preserves target order, so segment starts come free).
    """

    def __init__(self, u_local: np.ndarray, t: np.ndarray):
        order = np.argsort(t, kind="stable")
        self.eu = u_local[order].astype(np.int32)
        self.t_sorted = t[order]
        self.E = len(self.eu)


class BrandesShard:
    def __init__(self, part, bounds, edges_dir, rev_edges_dir=None, direction="OUTGOING"):
        self.part = int(part)
        self.bounds = np.asarray(bounds, dtype=np.int64)
        self.P = len(self.bounds) - 1
        self.lo = int(self.bounds[part])
        self.hi = int(self.bounds[part + 1])
        self.n_local = self.hi - self.lo

        def fwd_part():
            t = _read_partition(edges_dir, part, ["src", "dst"])
            return (
                t["src"].to_numpy().astype(np.int64, copy=False) - self.lo,
                t["dst"].to_numpy().astype(np.int64, copy=False),
            )

        def rev_part():
            assert rev_edges_dir is not None, "this direction needs the reverse layout"
            t = _read_partition(rev_edges_dir, part, ["src", "dst"])
            return (
                t["dst"].to_numpy().astype(np.int64, copy=False) - self.lo,
                t["src"].to_numpy().astype(np.int64, copy=False),
            )

        if direction == "OUTGOING":
            fu, ft = fwd_part()
            bu, bt = rev_part()
        elif direction == "INCOMING":
            fu, ft = rev_part()
            bu, bt = fwd_part()
        else:  # BOTH: undirected traversal over the symmetrized neighbor set
            u1, t1 = fwd_part()
            u2, t2 = rev_part()
            u = np.concatenate([u1, u2])
            t = np.concatenate([t1, t2])
            if len(u):
                pairs = np.unique(np.stack([u, t], axis=1), axis=0)
                u, t = pairs[:, 0], pairs[:, 1]
            # the symmetric graph is its own reverse: one layout serves both
            fu, ft = u, t
            bu, bt = u, t

        self.fwd = _PushLayout(fu, ft)
        self.bwd = self.fwd if (bu is fu) else _PushLayout(bu, bt)
        self.n_edges = self.fwd.E
        self.centrality = np.zeros(self.n_local, dtype=np.float64)

    def ready(self) -> int:
        return self.n_edges

    def begin_pass(self):
        self.centrality[:] = 0.0
        return self.part

    # -- shared push/apply machinery ----------------------------------------
    def _push(self, L: _PushLayout, val_local: np.ndarray):
        """Combine nonzero per-(vertex,source) values along layout ``L``;
        park the own-range slice, return the packed cross-shard message."""
        S = val_local.shape[1]
        empty = (_EMPTY_VIDS, np.zeros((0, S), dtype=np.float64))
        if L.E == 0:
            return None, empty
        fm = val_local.any(axis=1)  # active local rows
        em = fm[L.eu]  # (E,) bool — the only full-E work per round
        if not em.any():
            return None, empty
        eu = L.eu[em]
        ts = L.t_sorted[em]  # subset keeps target order
        uniq_t, seg = np.unique(ts, return_index=True)
        sums = np.add.reduceat(val_local[eu], seg, axis=0)
        a = int(np.searchsorted(uniq_t, self.lo))
        b = int(np.searchsorted(uniq_t, self.hi))
        parked = ((uniq_t[a:b] - self.lo), sums[a:b]) if b > a else None
        if a == 0 and b == len(uniq_t):
            return parked, empty
        vids = np.concatenate([uniq_t[:a], uniq_t[b:]])
        mat = np.concatenate([sums[:a], sums[b:]], axis=0)
        return parked, (vids, mat)

    def _gather(self, parked, incoming) -> np.ndarray | None:
        """Sum parked + incoming packed messages into an (n_local, S) array."""
        acc = None
        if parked is not None:
            acc = np.zeros((self.n_local, self.S), dtype=np.float64)
            idx, mat = parked
            acc[idx] += mat
        for msg in incoming:
            if msg is None:
                continue
            vids, mat = msg
            a = int(np.searchsorted(vids, self.lo))
            b = int(np.searchsorted(vids, self.hi))
            if a == b:
                continue
            if acc is None:
                acc = np.zeros((self.n_local, self.S), dtype=np.float64)
            acc[vids[a:b] - self.lo] += mat[a:b]  # vids unique within a message
        return acc

    # -- forward (sigma push) ----------------------------------------------
    def start(self, sources: np.ndarray):
        self.S = len(sources)
        self.sources = np.asarray(sources, dtype=np.int64)
        self.dist = np.full((self.n_local, self.S), -1, dtype=np.int16)
        self.sigma = np.zeros((self.n_local, self.S), dtype=np.float64)
        self.delta = np.zeros((self.n_local, self.S), dtype=np.float64)
        self.depth = 0
        self._first = True
        self._fwd_parked = None
        for i, s in enumerate(self.sources):
            if self.lo <= s < self.hi:
                self.dist[s - self.lo, i] = 0
                self.sigma[s - self.lo, i] = 1.0
        return self.part

    def fwd_step(self, *incoming):
        """Apply the previous round's sigma messages (first touch sets
        dist/sigma), then push the new frontier's contributions.  Returns
        ``(packed_message, n_newly_reached)``; rounds past frontier death
        push empty messages (harmless driver overshoot)."""
        n_new = 0
        if self._first:
            self._first = False
        else:
            acc = self._gather(self._fwd_parked, incoming)
            self.depth += 1
            if acc is not None:
                newly = (self.dist < 0) & (acc > 0)
                if newly.any():
                    self.dist[newly] = self.depth
                    self.sigma[newly] = acc[newly]
                    n_new = int(np.count_nonzero(newly.any(axis=1)))
        val = np.where(self.dist == self.depth, self.sigma, 0.0)
        self._fwd_parked, packed = self._push(self.fwd, val)
        return packed, n_new

    # -- backward (dependency push over the reverse layout) ------------------
    def bwd_init(self, max_depth: int):
        self._bcur = int(max_depth) + 1
        self._bwd_parked = None
        return self.part

    def bwd_step(self, *incoming):
        """One backward round: finalize local vertices at depth ``c`` with the
        incoming dependency sums, then push their ``(1+delta)/sigma`` to
        predecessors.  ``c`` counts down from the batch's max depth."""
        self._bcur -= 1
        c = self._bcur
        acc = self._gather(self._bwd_parked, incoming)
        if acc is not None:
            at_c = self.dist == c
            self.delta += np.where(at_c, self.sigma * acc, 0.0)
        if c <= 1:  # depth-0 targets are sources; their delta is unused
            self._bwd_parked = None
            return (_EMPTY_VIDS, np.zeros((0, self.S), dtype=np.float64))
        at_c = self.dist == c
        val = np.divide(
            1.0 + self.delta,
            self.sigma,
            out=np.zeros_like(self.delta),
            where=at_c & (self.sigma > 0),
        )
        self._bwd_parked, packed = self._push(self.bwd, val)
        return packed

    def finish_batch(self):
        """Fold the batch's dependencies into the centrality accumulator
        (source rows excluded: ``node != startNode``, BetweennessCentrality.java:142)."""
        dep = self.delta.copy()
        for i, s in enumerate(self.sources):
            if self.lo <= s < self.hi:
                dep[s - self.lo, i] = 0.0
        self.centrality += dep.sum(axis=1)
        return self.part

    def save_state(self, ckpt_dir: str, iteration: int) -> str:
        """Atomic per-partition centrality checkpoint after a source batch
        (``iteration`` = completed batch index; the shared helper owns the
        filename format the manifest pruning and ``part_of`` parse rely on)."""
        from .checkpoint import atomic_save_table

        return atomic_save_table(self.centrality_table(), ckpt_dir, iteration, self.part)

    def load_state(self, path: str):
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        assert t.num_rows == self.n_local
        self.centrality = t["centrality"].to_numpy().astype(np.float64, copy=True)
        return self.part

    def centrality_table(self, scale: float = 1.0) -> pa.Table:
        return pa.table(
            {
                "vid": pa.array(np.arange(self.lo, self.hi, dtype=np.int64)),
                "centrality": pa.array(self.centrality * scale),
            }
        )
