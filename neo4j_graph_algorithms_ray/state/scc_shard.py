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

Labels are canonicalized to the min vid of each SCC by a tiny relabel join
in the pipeline (the reference's root ids are execution-order-dependent; the
driver oracle checks the min-vid contract).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .shards import _read_partition


class SccShard:
    def __init__(self, part, bounds, edges_dir, rev_edges_dir):
        self.part = int(part)
        self.bounds = np.asarray(bounds, dtype=np.int64)
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

        fo = np.argsort(fd, kind="stable")
        self.fu_by_dst = fu[fo]
        fds = fd[fo]
        self.f_uniq, self.f_seg = (
            np.unique(fds, return_index=True) if len(fds) else (fds, np.array([], np.int64))
        )
        self.f_split = np.searchsorted(self.f_uniq, self.bounds[1:-1])
        self.fu = fu
        self.fd = fd

        ro = np.argsort(rs, kind="stable")
        self.ru_by_src = ru[ro]
        rss = rs[ro]
        self.r_uniq, self.r_seg = (
            np.unique(rss, return_index=True) if len(rss) else (rss, np.array([], np.int64))
        )
        self.r_split = np.searchsorted(self.r_uniq, self.bounds[1:-1])
        self.ru = ru
        self.rs = rs

        self.assigned = np.zeros(self.n_local, dtype=bool)
        self.label = np.full(self.n_local, -1, dtype=np.int64)
        self.outdeg = np.bincount(fu, minlength=self.n_local).astype(np.int64)
        self.indeg = np.bincount(ru, minlength=self.n_local).astype(np.int64)
        self.color = np.full(self.n_local, -1, dtype=np.int64)
        self.flagged = np.zeros(self.n_local, dtype=bool)
        self._newly = np.array([], dtype=np.int64)  # local idx of fresh assignments
        self._changed = np.array([], dtype=np.int64)
        self._frontier = np.array([], dtype=np.int64)

    def ready(self) -> int:
        return self.n_local

    def n_unassigned(self) -> int:
        return int(np.count_nonzero(~self.assigned))

    # -- trim ---------------------------------------------------------------
    def _split_pairs(self, vids, vals, split_bounds):
        cuts = np.searchsorted(vids, split_bounds)
        vc = np.split(vids, cuts)
        lc = np.split(vals, cuts)
        return list(zip(vc, lc))

    def trim_push(self):
        """Decrement messages from newly-assigned local vertices: per owner a
        pair of (indeg-dec vids/counts, outdeg-dec vids/counts)."""
        nl = self._newly
        out = []
        if len(nl):
            m = np.isin(self.fu, nl)
            w, wc = np.unique(self.fd[m], return_counts=True)  # indeg decs
            m2 = np.isin(self.ru, nl)
            u, uc = np.unique(self.rs[m2], return_counts=True)  # outdeg decs
        else:
            w = wc = u = uc = np.array([], dtype=np.int64)
        wi = self._split_pairs(w, wc, self.bounds[1:-1])
        ui = self._split_pairs(u, uc, self.bounds[1:-1])
        for p in range(self.P):
            out.append((wi[p][0], wi[p][1], ui[p][0], ui[p][1]))
        return tuple(out) if self.P > 1 else out[0]

    def trim_absorb(self, *chunks) -> int:
        for ch in chunks:
            if ch is None:
                continue
            w, wc, u, uc = ch
            if len(w):
                self.indeg[w - self.lo] -= wc
            if len(u):
                self.outdeg[u - self.lo] -= uc
        dead = ~self.assigned & ((self.indeg <= 0) | (self.outdeg <= 0))
        nl = np.flatnonzero(dead)
        self.assigned[nl] = True
        self.label[nl] = nl + self.lo
        self._newly = nl
        return int(len(nl))

    # -- forward max-color propagation -------------------------------------
    def color_init(self) -> int:
        un = ~self.assigned
        self.color = np.where(un, np.arange(self.lo, self.hi, dtype=np.int64), -1)
        self._changed = np.flatnonzero(un)
        return int(len(self._changed))

    def color_push(self):
        ch = self._changed
        if len(ch) and len(self.f_seg):
            mask = np.isin(self.fu_by_dst, ch)
            vals = np.where(mask, self.color[self.fu_by_dst], -1)
            maxes = np.maximum.reduceat(vals, self.f_seg)
            nz = maxes >= 0
            vids, vals = self.f_uniq[nz], maxes[nz]
        else:
            vids = vals = np.array([], dtype=np.int64)
        pairs = self._split_pairs(vids, vals, self.bounds[1:-1])
        return tuple(pairs) if self.P > 1 else pairs[0]

    def color_absorb(self, *chunks) -> int:
        cand = np.full(self.n_local, -1, dtype=np.int64)
        for ch in chunks:
            if ch is None:
                continue
            vids, vals = ch
            if len(vids):
                np.maximum.at(cand, vids - self.lo, vals)
        upd = ~self.assigned & (cand > self.color)
        self.color[upd] = cand[upd]
        self._changed = np.flatnonzero(upd)
        return int(len(self._changed))

    # -- backward flood within color ---------------------------------------
    def roots_start(self) -> int:
        self.flagged[:] = False
        roots = ~self.assigned & (self.color == np.arange(self.lo, self.hi, dtype=np.int64))
        self._frontier = np.flatnonzero(roots)
        self.flagged[self._frontier] = True
        return int(len(self._frontier))

    def bwd_push(self):
        fr = self._frontier
        if len(fr) and len(self.ru):
            m = np.isin(self.ru, fr)
            u = self.rs[m]  # in-neighbor global vids
            c = self.color[self.ru[m]]
            pairs = np.unique(np.stack([u, c], axis=1), axis=0)
            u, c = pairs[:, 0], pairs[:, 1]
        else:
            u = c = np.array([], dtype=np.int64)
        out = self._split_pairs(u, c, self.bounds[1:-1])
        return tuple(out) if self.P > 1 else out[0]

    def bwd_absorb(self, *chunks) -> int:
        newly = np.zeros(self.n_local, dtype=bool)
        for ch in chunks:
            if ch is None:
                continue
            u, c = ch
            if len(u):
                idx = u - self.lo
                ok = ~self.assigned[idx] & ~self.flagged[idx] & (self.color[idx] == c)
                newly[idx[ok]] = True
        self._frontier = np.flatnonzero(newly)
        self.flagged[self._frontier] = True
        return int(len(self._frontier))

    def finalize_sccs(self) -> int:
        fl = np.flatnonzero(self.flagged)
        self.assigned[fl] = True
        self.label[fl] = self.color[fl]
        self._newly = fl
        self.flagged[:] = False
        return int(len(fl))

    def labels_table(self) -> pa.Table:
        return pa.table(
            {
                "vid": pa.array(np.arange(self.lo, self.hi, dtype=np.int64)),
                "label": pa.array(self.label),
            }
        )
