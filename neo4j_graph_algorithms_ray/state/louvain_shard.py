"""Louvain modularity shard — one vertex range of the single-level parallel
Louvain sweep (reference kernel ``impl/louvain/Louvain.java:123-170``,
proc ``LouvainProc.java:65,135`` loads the graph undirected).

Semantics per the reference, made synchronous + deterministic (the reference
sweeps a shared array under a work queue — order-dependent; its fixture
asserts only the converged community count):

- graph undirected (``asUndirected(true)``), degree = neighbor count —
  or, with ``weighted=True``, the weighted degree / weight-into-community
  sums of ``WeightedLouvain.java:88-101,122-124`` (LouvainProc dispatches to
  the weighted kernel whenever ``weightProperty`` is set,
  ``LouvainProc.java:156``),
- ``m2`` = sum of degrees (the reference's ``2m``, ``Louvain.java:95``),
- gain(u -> C) = w_in(u,C)/m2 - deg(u) * sTot[C] / m2^2
  (``modGain``, ``Louvain.java:123-127``) where w_in counts u's neighbors in
  C and sTot[C] is the summed degree of C's members (``move``, :99-108),
- u adopts the argmax-gain neighbor community; pinned tie-breaks: gain
  desc, then smallest community id; stay when every candidate gain < 0
  (reference: ``bestGain`` starts at 0 with own community, :129-140),
- updates apply in red/black vid-parity phases (same determinism device as
  LabelPropShard; breaks two-cycle oscillation of plain Jacobi sweeps).

Distribution: community ids are vids, so the shard that owns vid range
[lo,hi) also owns sTot for community ids in that range.  Each phase is three
BSP waves: (1) serve boundary community labels, (2) exchange per-community
degree partials so owners hold exact sTot, (3) serve sTot values for the
candidate communities each shard needs.  All messages are pre-aggregated
per-key tables — the same shuffle shape as a ``groupby().aggregate``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .shards import _read_partition


class LouvainShard:
    def __init__(self, part, bounds, edges_dir, rev_edges_dir, weighted: bool = False):
        self.part = int(part)
        self.bounds = np.asarray(bounds, dtype=np.int64)
        self.P = len(self.bounds) - 1
        self.lo = int(self.bounds[part])
        self.hi = int(self.bounds[part + 1])
        self.n_local = self.hi - self.lo

        fwd = _read_partition(edges_dir, part, ["src", "dst", "weight"])
        rev = _read_partition(rev_edges_dir, part, ["src", "dst", "weight"])
        u = np.concatenate(
            [
                fwd["src"].to_numpy().astype(np.int64, copy=False),
                rev["dst"].to_numpy().astype(np.int64, copy=False),
            ]
        )
        t = np.concatenate(
            [
                fwd["dst"].to_numpy().astype(np.int64, copy=False),
                rev["src"].to_numpy().astype(np.int64, copy=False),
            ]
        )
        # weighted variant (WeightedLouvain.java:88-101,122-124): weighted
        # degree w[u] and weight-into-community sums replace neighbor counts
        if weighted:
            w = np.concatenate(
                [
                    fwd["weight"].to_numpy().astype(np.float64, copy=False),
                    rev["weight"].to_numpy().astype(np.float64, copy=False),
                ]
            )
        else:
            w = np.ones(len(u), dtype=np.float64)
        keep = u != t  # self-loops contribute nothing to moves
        u, t, w = u[keep], t[keep], w[keep]
        # undirected dedup: an a<->b pair present in both directions in the
        # edge table must count once (asUndirected load dedups); min weight
        # per pair — symmetric at both endpoints, so modularity stays
        # well-defined even when the table carries direction-dependent weights
        if len(u):
            order = np.lexsort((w, t, u))
            u, t, w = u[order], t[order], w[order]
            first = np.empty(len(u), dtype=bool)
            first[0] = True
            first[1:] = (u[1:] != u[:-1]) | (t[1:] != t[:-1])
            u, t, w = u[first], t[first], w[first]
        self.u_local = u - self.lo
        tt = t
        self.w_edge = w
        self.deg = np.bincount(self.u_local, weights=w, minlength=self.n_local).astype(
            np.float64
        )
        self.uniq_t = np.unique(tt)
        self.t_idx = np.searchsorted(self.uniq_t, tt)
        self.t_split = np.searchsorted(self.uniq_t, self.bounds[1:-1])
        self.comm = np.arange(self.lo, self.hi, dtype=np.int64)
        self.voter_comm = self.uniq_t.copy()  # init: comm == vid
        self.m2 = 1.0  # set after global reduce
        self._req_idx: list[np.ndarray] = [np.array([], dtype=np.int64)] * self.P
        self._sTot_own = np.zeros(self.n_local, dtype=np.float64)

    def ready(self) -> int:
        return len(self.u_local)

    def deg_sum(self) -> float:
        return float(self.deg.sum())

    def set_m2(self, m2: float) -> int:
        self.m2 = float(m2)
        return self.part

    # -- handshake (same fixed-voter-set protocol as LabelPropShard) --------
    def needed_vids(self):
        chunks = np.split(self.uniq_t, self.t_split)
        return tuple(chunks) if self.P > 1 else chunks[0]

    def register_requests(self, *per_requester_vids):
        self._req_idx = [np.asarray(v, dtype=np.int64) - self.lo for v in per_requester_vids]
        return self.part

    def serve_comm(self):
        out = [self.comm[idx] for idx in self._req_idx]
        return tuple(out) if self.P > 1 else out[0]

    def set_voter_comm(self, *chunks):
        if len(self.uniq_t):
            self.voter_comm = np.concatenate([np.asarray(c, dtype=np.int64) for c in chunks])
        return self.part

    # -- sTot exchange ------------------------------------------------------
    def stot_partials(self):
        """Partial (comm, deg-sum) for local members, split by comm owner."""
        order = np.argsort(self.comm, kind="stable")
        cs = self.comm[order]
        ds = self.deg[order]
        uc, starts = (np.unique(cs, return_index=True) if len(cs) else (cs, cs))
        sums = np.add.reduceat(ds, starts) if len(starts) else np.array([], dtype=np.float64)
        cuts = np.searchsorted(uc, self.bounds[1:-1])
        ctab = np.split(uc, cuts)
        stab = np.split(sums, cuts)
        out = [
            pa.table({"comm": pa.array(c), "s": pa.array(s)}) for c, s in zip(ctab, stab)
        ]
        return tuple(out) if self.P > 1 else out[0]

    def reduce_stot(self, *tables) -> int:
        self._sTot_own[:] = 0.0
        for t in tables:
            if t is not None and t.num_rows:
                idx = t["comm"].to_numpy().astype(np.int64) - self.lo
                self._sTot_own += np.bincount(
                    idx, weights=t["s"].to_numpy(), minlength=self.n_local
                )
        return self.part

    def needed_comms(self):
        """Community ids whose sTot this shard needs, split by owner.

        Only CANDIDATE communities (``voter_comm``) are needed: ``step``'s
        sole sTot lookup indexes by ``voter_comm[t_idx]``.  Own communities
        that are nobody's candidate were previously requested, served, and
        shipped every phase without any reader."""
        cands = np.unique(self.voter_comm)
        self._need = cands
        cuts = np.searchsorted(cands, self.bounds[1:-1])
        chunks = np.split(cands, cuts)
        return tuple(chunks) if self.P > 1 else chunks[0]

    def serve_stot(self, *per_requester_comms):
        out = [
            self._sTot_own[np.asarray(c, dtype=np.int64) - self.lo]
            for c in per_requester_comms
        ]
        return tuple(out) if self.P > 1 else out[0]

    def set_stot(self, *chunks) -> int:
        self._stot_need = (
            np.concatenate([np.asarray(c, dtype=np.float64) for c in chunks])
            if len(self._need)
            else np.array([], dtype=np.float64)
        )
        return self.part

    # -- move phase ---------------------------------------------------------
    def step(self, parity: int) -> int:
        """Apply best moves for local vertices with vid % 2 == parity."""
        if len(self.u_local) == 0:
            return 0
        mask = (self.u_local + self.lo) % 2 == parity
        if not mask.any():
            return 0
        u = self.u_local[mask]
        cand = self.voter_comm[self.t_idx[mask]]
        wts = self.w_edge[mask]
        order = np.lexsort((cand, u))
        u, cand, wts = u[order], cand[order], wts[order]
        new_group = np.empty(len(u), dtype=bool)
        new_group[0] = True
        np.not_equal(u[1:], u[:-1], out=new_group[1:])
        new_group[1:] |= cand[1:] != cand[:-1]
        g_starts = np.flatnonzero(new_group)
        g_u = u[g_starts]
        g_c = cand[g_starts]
        w_in = np.add.reduceat(wts, g_starts)
        stot = self._stot_need[np.searchsorted(self._need, g_c)]
        gain = w_in / self.m2 - self.deg[g_u] * stot / (self.m2 * self.m2)
        # per-u argmax: gain desc, then smallest candidate comm (groups are
        # comm-ascending per u, so the first index attaining max wins)
        u_new = np.empty(len(g_u), dtype=bool)
        u_new[0] = True
        np.not_equal(g_u[1:], g_u[:-1], out=u_new[1:])
        u_starts = np.flatnonzero(u_new)
        gmax = np.maximum.reduceat(gain, u_starts)
        seg = np.cumsum(u_new) - 1
        is_best = gain == gmax[seg]
        first_best = np.minimum.reduceat(
            np.where(is_best, np.arange(len(gain)), len(gain)), u_starts
        )
        upd_u = g_u[u_starts]
        upd_c = g_c[first_best]
        ok = gmax >= 0.0  # negative best gain -> stay (reference bestGain=0 floor)
        upd_u, upd_c = upd_u[ok], upd_c[ok]
        changed = int(np.count_nonzero(self.comm[upd_u] != upd_c))
        self.comm[upd_u] = upd_c
        return changed

    def comm_table(self) -> pa.Table:
        return pa.table(
            {
                "vid": pa.array(np.arange(self.lo, self.hi, dtype=np.int64)),
                "community": pa.array(self.comm),
            }
        )

    def comm_distinct(self) -> np.ndarray:
        """Local distinct community ids — O(#communities) per shard, so the
        driver can count globals without pulling the O(V) table."""
        return np.unique(self.comm)

    def save_state(self, ckpt_dir: str, iteration: int) -> str:
        """Atomic per-partition community checkpoint (PageRank protocol —
        the shared helper owns the filename format the manifest pruning and
        ``part_of`` parse depend on)."""
        from .checkpoint import atomic_save_table

        return atomic_save_table(self.comm_table(), ckpt_dir, iteration, self.part)

    def load_state(self, path: str):
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        assert t.num_rows == self.n_local
        self.comm = t["community"].to_numpy().astype(np.int64, copy=True)
        return self.part
