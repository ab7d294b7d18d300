"""Brandes betweenness-centrality shard (reference
``impl/betweenness/BetweennessCentrality.java:108-146``: per-source BFS with
path counting, then dependency accumulation ``delta[v] += sigma[v]/sigma[w] *
(delta[w]+1)`` walking depths backward; parallel-over-sources
``ParallelBetweennessCentrality.java``; sampled ``RABrandesBetweennessCentrality.java``
scales by ``nodeCount/|sample|``).

Distributed shape: sources run in batches of S<=32 with a per-source axis on
every state array (the MS-BFS trick applied to Brandes).  Forward pass = BSP
sigma-push rounds along the traversal edges (per-destination pre-aggregated
(n_uniq_dst, S) float matrices — the groupby(dst).sum shuffle in matrix
form).  Backward pass pulls: each round shards serve (sigma, delta, dist)
for their boundary vertices (fixed request sets, the LabelPropShard
handshake), and owners of depth-d vertices accumulate from depth-d+1
out-neighbors.  Per-vertex centrality accumulates in-actor across batches;
the driver fetches one table at the end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .shards import _read_partition


class BrandesShard:
    def __init__(self, part, bounds, edges_dir, rev_edges_dir=None, direction="OUTGOING"):
        self.part = int(part)
        self.bounds = np.asarray(bounds, dtype=np.int64)
        self.P = len(self.bounds) - 1
        self.lo = int(self.bounds[part])
        self.hi = int(self.bounds[part + 1])
        self.n_local = self.hi - self.lo

        us, ts = [], []
        if direction in ("OUTGOING", "BOTH"):
            t = _read_partition(edges_dir, part, ["src", "dst"])
            us.append(t["src"].to_numpy().astype(np.int64, copy=False) - self.lo)
            ts.append(t["dst"].to_numpy().astype(np.int64, copy=False))
        if direction in ("INCOMING", "BOTH"):
            assert rev_edges_dir is not None
            t = _read_partition(rev_edges_dir, part, ["src", "dst"])
            us.append(t["dst"].to_numpy().astype(np.int64, copy=False) - self.lo)
            ts.append(t["src"].to_numpy().astype(np.int64, copy=False))
        u = np.concatenate(us) if us else np.array([], dtype=np.int64)
        t_ = np.concatenate(ts) if ts else np.array([], dtype=np.int64)
        if direction == "BOTH" and len(u):
            # undirected traversal: dedup a<->b duplicates like an
            # asUndirected load (each neighbor relation once)
            pairs = np.unique(np.stack([u, t_], axis=1), axis=0)
            u, t_ = pairs[:, 0], pairs[:, 1]

        self.n_edges = len(u)
        # dst-sorted layout (forward combining)
        dorder = np.argsort(t_, kind="stable")
        self.esrc_by_dst = u[dorder].astype(np.int64)
        dst_sorted = t_[dorder]
        if self.n_edges:
            self.uniq_dst, self.seg_starts = np.unique(dst_sorted, return_index=True)
        else:
            self.uniq_dst = np.array([], dtype=np.int64)
            self.seg_starts = np.array([], dtype=np.int64)
        self.dst_split = np.searchsorted(self.uniq_dst, self.bounds[1:-1])
        # u-sorted layout (backward per-u accumulation)
        uorder = np.argsort(u, kind="stable")
        self.u_by_u = u[uorder]
        self.tidx_by_u = np.searchsorted(self.uniq_dst, t_[uorder])
        if self.n_edges:
            self.uniq_u, self.useg_starts = np.unique(self.u_by_u, return_index=True)
        else:
            self.uniq_u = np.array([], dtype=np.int64)
            self.useg_starts = np.array([], dtype=np.int64)

        self._req_idx: list[np.ndarray] = [np.array([], dtype=np.int64)] * self.P
        self.centrality = np.zeros(self.n_local, dtype=np.float64)

    def ready(self) -> int:
        return self.n_edges

    # handshake (boundary value serving, LabelPropShard protocol)
    def needed_vids(self):
        chunks = np.split(self.uniq_dst, self.dst_split)
        return tuple(chunks) if self.P > 1 else chunks[0]

    def register_requests(self, *per_requester_vids):
        self._req_idx = [np.asarray(v, dtype=np.int64) - self.lo for v in per_requester_vids]
        return self.part

    def begin_pass(self):
        self.centrality[:] = 0.0
        return self.part

    # -- forward (sigma push) ----------------------------------------------
    def start(self, sources: np.ndarray):
        self.S = len(sources)
        self.sources = np.asarray(sources, dtype=np.int64)
        self.dist = np.full((self.n_local, self.S), -1, dtype=np.int16)
        self.sigma = np.zeros((self.n_local, self.S), dtype=np.float64)
        self.delta = np.zeros((self.n_local, self.S), dtype=np.float64)
        self.depth = 0
        for i, s in enumerate(self.sources):
            if self.lo <= s < self.hi:
                self.dist[s - self.lo, i] = 0
                self.sigma[s - self.lo, i] = 1.0
        return self.part

    def fwd_push(self):
        """Sigma contributions of the depth-`depth` frontier, per dst owner."""
        if self.n_edges == 0:
            empty = (np.array([], dtype=np.int64), np.zeros((0, self.S)))
            return tuple([empty] * self.P) if self.P > 1 else empty
        active = self.dist[self.esrc_by_dst] == self.depth  # (E, S)
        contrib = np.where(active, self.sigma[self.esrc_by_dst], 0.0)
        sums = np.add.reduceat(contrib, self.seg_starts, axis=0)
        nz = sums.any(axis=1)  # ship only touched destinations
        out = []
        prev = 0
        for cut in list(self.dst_split) + [len(self.uniq_dst)]:
            m = nz[prev:cut]
            out.append((self.uniq_dst[prev:cut][m], sums[prev:cut][m]))
            prev = cut
        return tuple(out) if self.P > 1 else out[0]

    def fwd_absorb(self, *chunks) -> int:
        self.depth += 1
        inc = np.zeros((self.n_local, self.S), dtype=np.float64)
        for ch in chunks:
            if ch is None:
                continue
            vids, mat = ch
            if len(vids) == 0:
                continue
            inc[vids - self.lo] += mat
        newly = (self.dist < 0) & (inc > 0)
        rows = newly.any(axis=1)
        self.dist[newly] = self.depth
        self.sigma[newly] += inc[newly]
        return int(np.count_nonzero(rows))

    # -- backward (dependency pull) ----------------------------------------
    def serve_bwd(self):
        """(sigma, delta, dist) of requested local vertices, per requester."""
        out = [
            (self.sigma[idx], self.delta[idx], self.dist[idx]) for idx in self._req_idx
        ]
        return tuple(out) if self.P > 1 else out[0]

    def bwd_step(self, d: int, *chunks) -> int:
        """delta[u] += sigma[u]/sigma[w] * (1+delta[w]) for local u at depth d
        with out-neighbors w at depth d+1 (values served by w's owners)."""
        if self.n_edges == 0:
            return 0
        sig_t = np.concatenate([c[0] for c in chunks]) if self.P > 1 else chunks[0][0]
        del_t = np.concatenate([c[1] for c in chunks]) if self.P > 1 else chunks[0][1]
        dis_t = np.concatenate([c[2] for c in chunks]) if self.P > 1 else chunks[0][2]
        tv = self.tidx_by_u
        valid = (self.dist[self.u_by_u] == d) & (dis_t[tv] == d + 1)
        if not valid.any():
            return 0
        sigw = sig_t[tv]
        contrib = np.where(valid, np.divide(1.0 + del_t[tv], sigw, where=sigw > 0), 0.0)
        sums = np.add.reduceat(contrib, self.useg_starts, axis=0)
        self.delta[self.uniq_u] += self.sigma[self.uniq_u] * sums
        return 1

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
        (``iteration`` = completed batch index)."""
        import os

        import pyarrow.parquet as pq

        os.makedirs(ckpt_dir, exist_ok=True)
        final = os.path.join(ckpt_dir, f"iter={iteration:06d}.part={self.part:05d}.parquet")
        tmp = final + ".tmp"
        pq.write_table(self.centrality_table(), tmp)
        os.replace(tmp, final)
        return final

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
