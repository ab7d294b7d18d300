"""Strongly-connected-components shard — distributed multistep SCC
(reference ``StronglyConnectedComponentsProc.java:66-381``; algorithm shape
follows the multistep/coloring family ``impl/multistepscc/MultistepSCC.java``,
``MultiStepTrim.java``, ``MultiStepColoring.java``, ``ForwardBackwardScc.java``
re-expressed as BSP waves):

1. **trim** — iteratively assign vertices whose in- or out-degree within the
   unassigned subgraph is zero (singleton SCCs); push-based: newly-assigned
   vertices send degree decrements along both edge orientations,
2. **color** — remaining vertices propagate max-vid colors forward to
   fixpoint (``MultiStepColoring``-style),
3. **backward flag** — color roots (color == own vid) flood backward within
   their color; flagged set = one SCC per root (``ForwardBackwardScc``),
4. assign flagged, decrement, re-trim, repeat.

Execution uses the *fused run-ahead push exchange* (the PageRank ``step``
pattern, state/shards.py): one actor call per shard per round applies the
previous round's packed messages and pushes the next round's; own-range rows
are parked in-process, and the driver chains ObjectRefs with a one-round-lag
termination read instead of syncing every round.  All pushes are
**frontier-proportional**: edges incident to the changed set are gathered
through local CSR indptrs (O(frontier edges)), never by scanning the whole
edge list.

Labels are canonicalized to the min vid of each SCC by a tiny relabel join
in the pipeline (the reference's root ids are execution-order-dependent; the
driver oracle checks the min-vid contract).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .shards import _read_partition


def _csr(local_src: np.ndarray, n_local: int):
    """(order, indptr) grouping edge indices by local source vertex."""
    order = np.argsort(local_src, kind="stable")
    indptr = np.zeros(n_local + 1, dtype=np.int64)
    np.cumsum(np.bincount(local_src, minlength=n_local), out=indptr[1:])
    return order, indptr


def _expand(indptr: np.ndarray, frontier: np.ndarray):
    """Edge indices (into the CSR-ordered arrays) of all edges whose source
    is in ``frontier``, plus the repeated source for each edge."""
    starts = indptr[frontier]
    counts = indptr[frontier + 1] - starts
    total = int(counts.sum())
    if total == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    cum = np.cumsum(counts)
    eidx = np.repeat(starts - (cum - counts), counts) + np.arange(total)
    return eidx, np.repeat(frontier, counts)


class SccShard:
    def __init__(self, part, bounds, edges_dir, rev_edges_dir, ckpt_dir=None):
        self.part = int(part)
        self.bounds = np.asarray(bounds, dtype=np.int64)
        import uuid

        self.incarnation = uuid.uuid4().hex  # see shards.EdgeShardBase
        self.P = len(self.bounds) - 1
        self.lo = int(self.bounds[part])
        self.hi = int(self.bounds[part + 1])
        self.n_local = self.hi - self.lo

        f = _read_partition(edges_dir, part, ["src", "dst"])
        r = _read_partition(rev_edges_dir, part, ["src", "dst"])
        fu = f["src"].to_numpy().astype(np.int64, copy=False) - self.lo
        fd = f["dst"].to_numpy().astype(np.int64, copy=False)
        ru = r["dst"].to_numpy().astype(np.int64, copy=False) - self.lo
        rs = r["src"].to_numpy().astype(np.int64, copy=False)
        keepf = fu + self.lo != fd
        keepr = ru + self.lo != rs
        fu, fd, ru, rs = fu[keepf], fd[keepf], ru[keepr], rs[keepr]

        # local CSRs for frontier-proportional pushes
        fo, self.f_indptr = _csr(fu, self.n_local)
        self.f_dst = fd[fo]  # out-neighbor global vids grouped by local src
        ro, self.r_indptr = _csr(ru, self.n_local)
        self.r_src = rs[ro]  # in-neighbor global vids grouped by local dst

        self.assigned = np.zeros(self.n_local, dtype=bool)
        self.label = np.full(self.n_local, -1, dtype=np.int64)
        self.outdeg = np.bincount(fu, minlength=self.n_local).astype(np.int64)
        self.indeg = np.bincount(ru, minlength=self.n_local).astype(np.int64)
        self.color = np.full(self.n_local, -1, dtype=np.int64)
        self.flagged = np.zeros(self.n_local, dtype=bool)
        self._newly = np.array([], dtype=np.int64)  # local idx of fresh assignments
        self._changed = np.array([], dtype=np.int64)
        self._frontier = np.array([], dtype=np.int64)
        self._first = True
        self._parked = None  # own-range slice of the last push
        # post-restart warm start (checkpoint.rehydrate_shard semantics)
        from .checkpoint import rehydrate_shard

        rehydrate_shard(self, ckpt_dir, "scc")

    def ready(self) -> int:
        return self.n_local

    def whoami(self) -> str:
        return self.incarnation

    # -- checkpoint / failover ----------------------------------------------
    # Persistent state at an outer-round boundary (every BSP phase quiesced)
    # is exactly {assigned, label, indeg, outdeg}: color/flagged are
    # re-seeded by color_begin/bwd_begin, and the trim fixpoint leaves
    # _newly empty.  Degrees must be saved — trims decrement them.

    def reset(self):
        self.assigned[:] = False
        self.label[:] = -1
        self.outdeg = np.diff(self.f_indptr)
        self.indeg = np.diff(self.r_indptr)
        self.color[:] = -1
        self.flagged[:] = False
        self._newly = np.array([], dtype=np.int64)
        self._changed = np.array([], dtype=np.int64)
        self._frontier = np.array([], dtype=np.int64)
        self._first = True
        self._parked = None
        return self.part

    def state_table(self) -> pa.Table:
        return pa.table(
            {
                "vid": pa.array(np.arange(self.lo, self.hi, dtype=np.int64)),
                "assigned": pa.array(self.assigned),
                "label": pa.array(self.label),
                "indeg": pa.array(self.indeg),
                "outdeg": pa.array(self.outdeg),
            }
        )

    def save_state(self, ckpt_dir: str, iteration: int) -> str:
        from .checkpoint import atomic_save_table

        return atomic_save_table(self.state_table(), ckpt_dir, iteration, self.part)

    def load_state(self, path: str):
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        assert t.num_rows == self.n_local
        self.assigned = t["assigned"].to_numpy().astype(bool, copy=True)
        self.label = t["label"].to_numpy().astype(np.int64, copy=True)
        self.indeg = t["indeg"].to_numpy().astype(np.int64, copy=True)
        self.outdeg = t["outdeg"].to_numpy().astype(np.int64, copy=True)
        # phase scratch from an aborted run must not leak into the resume
        self.color = np.full(self.n_local, -1, dtype=np.int64)
        self.flagged = np.zeros(self.n_local, dtype=bool)
        self._newly = np.array([], dtype=np.int64)
        self._changed = np.array([], dtype=np.int64)
        self._frontier = np.array([], dtype=np.int64)
        self._first = True
        self._parked = None
        return self.part

    def n_unassigned(self) -> int:
        return int(np.count_nonzero(~self.assigned))

    def _pack(self, vids: np.ndarray, cols: dict) -> pa.Table:
        """Park the own-vid-range slice in-process, pack the rest (sorted by
        vid — receivers slice their range by binary search)."""
        a = int(np.searchsorted(vids, self.lo))
        b = int(np.searchsorted(vids, self.hi))
        self._parked = (
            (vids[a:b] - self.lo,) + tuple(c[a:b] for c in cols.values()) if b > a else None
        )
        out = {"vid": pa.array(np.concatenate([vids[:a], vids[b:]]))}
        for name, c in cols.items():
            out[name] = pa.array(np.concatenate([c[:a], c[b:]]))
        return pa.table(out)

    def _local_slices(self, tables):
        """Yield (local idx, *value columns) for parked + own-range rows."""
        if self._parked is not None:
            yield self._parked
            self._parked = None
        for t in tables:
            if t is None or not t.num_rows:
                continue
            vid = t["vid"].to_numpy()
            a = int(np.searchsorted(vid, self.lo))
            b = int(np.searchsorted(vid, self.hi))
            if a == b:
                continue
            yield (vid[a:b] - self.lo,) + tuple(
                t.column(i).to_numpy()[a:b] for i in range(1, t.num_columns)
            )

    # -- trim ---------------------------------------------------------------
    def trim_begin(self, seed: bool) -> int:
        """Start a trim phase.  ``seed=True`` (very first) assigns vertices
        with zero initial in/out degree; otherwise ``_newly`` carries the
        vertices just finalized by the backward pass."""
        self._first = True
        self._parked = None
        if seed:
            nl = np.flatnonzero(~self.assigned & ((self.indeg <= 0) | (self.outdeg <= 0)))
            self.assigned[nl] = True
            self.label[nl] = nl + self.lo
            self._newly = nl
        return int(len(self._newly))

    def trim_step(self, *incoming):
        """Fused apply(decrements) + assign-dead + push(new decrements).

        Message table: ``{vid, din, dout}`` — in/out-degree decrements from
        newly-assigned remote vertices.  Returns ``(packed, n_assigned)``."""
        if self._first:
            self._first = False
            n = len(self._newly)
        else:
            for sl in self._local_slices(incoming):
                idx, din, dout = sl
                self.indeg[idx] -= din
                self.outdeg[idx] -= dout
            nl = np.flatnonzero(~self.assigned & ((self.indeg <= 0) | (self.outdeg <= 0)))
            self.assigned[nl] = True
            self.label[nl] = nl + self.lo
            self._newly = nl
            n = len(nl)
        # push: decrements along both orientations from the newly assigned
        eidx, _ = _expand(self.f_indptr, self._newly)
        w, wc = np.unique(self.f_dst[eidx], return_counts=True)  # indeg decs
        eidx, _ = _expand(self.r_indptr, self._newly)
        u, uc = np.unique(self.r_src[eidx], return_counts=True)  # outdeg decs
        allv = np.union1d(w, u)
        din = np.zeros(len(allv), dtype=np.int64)
        dout = np.zeros(len(allv), dtype=np.int64)
        din[np.searchsorted(allv, w)] = wc
        dout[np.searchsorted(allv, u)] = uc
        return self._pack(allv, {"din": din, "dout": dout}), int(n)

    # -- forward max-color propagation -------------------------------------
    def color_begin(self) -> int:
        un = ~self.assigned
        self.color = np.where(un, np.arange(self.lo, self.hi, dtype=np.int64), -1)
        self._changed = np.flatnonzero(un)
        self._first = True
        self._parked = None
        return int(len(self._changed))

    def color_step(self, *incoming):
        """Fused apply(max-color candidates) + push from the changed set.
        Message table: ``{vid, c}`` (per-dst max already reduced)."""
        if self._first:
            self._first = False
            n = len(self._changed)
        else:
            cand = np.full(self.n_local, -1, dtype=np.int64)
            for idx, c in self._local_slices(incoming):
                m = c > cand[idx]  # idx unique within one message
                cand[idx[m]] = c[m]
            upd = ~self.assigned & (cand > self.color)
            self.color[upd] = cand[upd]
            self._changed = np.flatnonzero(upd)
            n = len(self._changed)
        eidx, srcrep = _expand(self.f_indptr, self._changed)
        dst, val = self.f_dst[eidx], self.color[srcrep]
        o = np.argsort(dst, kind="stable")
        dst, val = dst[o], val[o]
        uniq, seg = (
            np.unique(dst, return_index=True)
            if len(dst)
            else (dst, np.array([], dtype=np.int64))
        )
        mx = np.maximum.reduceat(val, seg) if len(seg) else val
        return self._pack(uniq, {"c": mx}), int(n)

    # -- backward flood within color ---------------------------------------
    def bwd_begin(self) -> int:
        self.flagged[:] = False
        roots = ~self.assigned & (self.color == np.arange(self.lo, self.hi, dtype=np.int64))
        self._frontier = np.flatnonzero(roots)
        self.flagged[self._frontier] = True
        self._first = True
        self._parked = None
        return int(len(self._frontier))

    def bwd_step(self, *incoming):
        """Fused apply(flood candidates) + push along reverse edges.
        Message table: ``{vid, c}`` — vid joins the flood iff its color == c."""
        if self._first:
            self._first = False
            n = len(self._frontier)
        else:
            newly = np.zeros(self.n_local, dtype=bool)
            for idx, c in self._local_slices(incoming):
                ok = ~self.assigned[idx] & ~self.flagged[idx] & (self.color[idx] == c)
                newly[idx[ok]] = True
            self._frontier = np.flatnonzero(newly)
            self.flagged[self._frontier] = True
            n = len(self._frontier)
        eidx, dstrep = _expand(self.r_indptr, self._frontier)
        u, c = self.r_src[eidx], self.color[dstrep]
        if len(u):
            o = np.lexsort((c, u))
            u, c = u[o], c[o]
            keep = np.empty(len(u), dtype=bool)
            keep[0] = True
            keep[1:] = (u[1:] != u[:-1]) | (c[1:] != c[:-1])
            u, c = u[keep], c[keep]
        return self._pack(u, {"c": c}), int(n)

    def finalize_sccs(self) -> int:
        fl = np.flatnonzero(self.flagged)
        self.assigned[fl] = True
        self.label[fl] = self.color[fl]
        self._newly = fl
        self.flagged[:] = False
        return int(len(fl))

    # -- min-vid canonicalization ------------------------------------------
    # Color-phase labels are the SCC's max vid (max-color propagation roots);
    # the output contract is min vid.  Only multi-member SCCs need remapping
    # (trim labels are singleton own-vids, already canonical), so the
    # exchange is O(#multi-member SCCs): shards report (label, local min vid)
    # pairs with min < label to the label's owner, owners fold the global
    # min, and the P owner tables are broadcast back for a searchsorted remap.

    def canon_push(self) -> pa.Table:
        """Distinct (label, local-min-vid) pairs with min < label, sorted by
        label (owners slice their range by binary search)."""
        vids = np.arange(self.lo, self.hi, dtype=np.int64)
        o = np.argsort(self.label, kind="stable")  # stable: vids ascend within label
        ls = self.label[o]
        uniq, seg = (
            np.unique(ls, return_index=True) if len(ls) else (ls, np.array([], dtype=np.int64))
        )
        mins = vids[o][seg]
        keep = mins < uniq
        return pa.table({"label": pa.array(uniq[keep]), "minv": pa.array(mins[keep])})

    def canon_reduce(self, *tables) -> pa.Table:
        """Global min per owned label, folded over every shard's report."""
        lab = np.concatenate(
            [t["label"].to_numpy() for t in tables]
            or [np.array([], dtype=np.int64)]
        )
        mv = np.concatenate(
            [t["minv"].to_numpy() for t in tables] or [np.array([], dtype=np.int64)]
        )
        m = (lab >= self.lo) & (lab < self.hi)
        lab, mv = lab[m], mv[m]
        o = np.lexsort((mv, lab))
        lab, mv = lab[o], mv[o]
        uniq, seg = (
            np.unique(lab, return_index=True) if len(lab) else (lab, np.array([], dtype=np.int64))
        )
        return pa.table({"label": pa.array(uniq), "minv": pa.array(mv[seg])})

    def canon_apply(self, *owner_tables) -> int:
        lab = np.concatenate(
            [t["label"].to_numpy() for t in owner_tables] or [np.array([], dtype=np.int64)]
        )
        mv = np.concatenate(
            [t["minv"].to_numpy() for t in owner_tables] or [np.array([], dtype=np.int64)]
        )
        if len(lab):
            o = np.argsort(lab)
            lab, mv = lab[o], mv[o]
            pos = np.searchsorted(lab, self.label)
            pos = np.minimum(pos, len(lab) - 1)
            hit = lab[pos] == self.label
            self.label[hit] = mv[pos[hit]]
        return self.part

    def labels_table(self) -> pa.Table:
        return pa.table(
            {
                "vid": pa.array(np.arange(self.lo, self.hi, dtype=np.int64)),
                "label": pa.array(self.label),
            }
        )
