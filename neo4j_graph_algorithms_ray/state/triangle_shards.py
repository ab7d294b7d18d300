"""Triangle-counting shard actors — dedup, degrees, orientation and the
counting phase as BSP exchanges.

Semantics follow the reference (``TriangleProc.java:169-180`` undirected
sorted dedup load; wedge enumeration with an ordering filter and a sorted-
adjacency closing-edge probe, ``TriangleCountQueue.java`` /
``HugeGraphIntersectImpl.intersect:58-89``; per-corner counts and
``2T/(d(d-1))`` coefficients, ``TriangleCountBase.java:93-115``).

Distribution: one Dataset pass writes canonical (min,max) pairs Hive-
partitioned by the min endpoint's owner — global dedup then reduces to a
local ``np.unique`` per shard.  Everything after is direct per-owner
pre-aggregated actor exchanges (the PageRank shard pattern): degree
partials, boundary-degree fetch for (deg, vid) orientation, oriented-edge
routing to wedge owners, wedge chunks, and one final corner-count wave.  On
this Ray build every Dataset groupby/join pays a ~2s shuffle spin-up; the
actor waves move the same bytes with ~10ms coordination each.  No O(V)
array ever lives on the driver — degrees live sliced across shards.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .shards import _read_partition


def _split_pairs(vids: np.ndarray, vals: np.ndarray, inner_bounds: np.ndarray):
    cuts = np.searchsorted(vids, inner_bounds)
    return list(zip(np.split(vids, cuts), np.split(vals, cuts)))


class TriangleShard:
    def __init__(self, part, bounds, raw_dir):
        self.part = int(part)
        self.bounds = np.asarray(bounds, dtype=np.int64)
        import uuid

        self.incarnation = uuid.uuid4().hex  # see shards.EdgeShardBase
        self.P = len(self.bounds) - 1
        self.lo = int(self.bounds[part])
        self.hi = int(self.bounds[part + 1])
        self.n_local = self.hi - self.lo

        t = _read_partition(raw_dir, part, ["u", "v"])
        u = t["u"].to_numpy().astype(np.int64, copy=False)
        v = t["v"].to_numpy().astype(np.int64, copy=False)
        if len(u):
            pairs = np.unique(np.stack([u, v], axis=1), axis=0)  # global dedup is local here
            self.u, self.v = pairs[:, 0], pairs[:, 1]
        else:
            self.u = self.v = np.array([], dtype=np.int64)
        self.deg = np.zeros(self.n_local, dtype=np.int64)
        # filled by the build waves:
        self.ga = self.gb = self.gdeg_b = np.array([], dtype=np.int64)
        self._recv_oriented: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        self.corner_counts = np.zeros(self.n_local, dtype=np.int64)
        self._foreign: list[tuple[np.ndarray, np.ndarray]] = []
        self._triples: list[pa.Table] = []

    def ready(self) -> int:
        return len(self.u)

    def whoami(self) -> str:
        return self.incarnation

    # -- checkpoint / failover ----------------------------------------------
    # The build phases (degree waves, orientation, adjacency) are cross-actor
    # exchanges, so a revived shard cannot self-heal locally: recovery resets
    # EVERY shard's build + counting state, re-runs the (deterministic) build
    # waves, then reloads the accumulated counting state of the last
    # committed wedge round.  No __init__ rehydration for this shard type.

    def reset_build(self):
        """Back to post-__init__ state: zero degrees/adjacency AND the
        accumulated counting state (deg_push is += — re-running the build
        waves on un-reset survivors would double-count degrees)."""
        self.deg = np.zeros(self.n_local, dtype=np.int64)
        self.ga = self.gb = self.gdeg_b = np.array([], dtype=np.int64)
        self._recv_oriented = []
        self.corner_counts = np.zeros(self.n_local, dtype=np.int64)
        self._foreign = []
        self._triples = []
        return self.part

    def state_table(self) -> pa.Table:
        """Counting state accumulated across wedge rounds, one table with a
        section column: 0 = triangle triples (a,b,c), 1 = nonzero corner
        counts (a=vid, b=count), 2 = pending foreign increments (a=vid,
        b=count)."""
        tri = self.triples_table()
        sect = [np.zeros(tri.num_rows, dtype=np.int8)]
        a = [tri["a"].to_numpy().astype(np.int64, copy=False)]
        b = [tri["b"].to_numpy().astype(np.int64, copy=False)]
        c = [tri["c"].to_numpy().astype(np.int64, copy=False)]
        nz = np.flatnonzero(self.corner_counts)
        sect.append(np.ones(len(nz), dtype=np.int8))
        a.append(nz + self.lo)
        b.append(self.corner_counts[nz])
        c.append(np.zeros(len(nz), dtype=np.int64))
        if self._foreign:
            ids = np.concatenate([f[0] for f in self._foreign])
            cnt = np.concatenate([f[1] for f in self._foreign]).astype(np.int64)
        else:
            ids = cnt = np.array([], dtype=np.int64)
        sect.append(np.full(len(ids), 2, dtype=np.int8))
        a.append(ids)
        b.append(cnt)
        c.append(np.zeros(len(ids), dtype=np.int64))
        return pa.table(
            {
                "sect": pa.array(np.concatenate(sect)),
                "a": pa.array(np.concatenate(a)),
                "b": pa.array(np.concatenate(b)),
                "c": pa.array(np.concatenate(c)),
            }
        )

    def save_state(self, ckpt_dir: str, iteration: int) -> str:
        from .checkpoint import atomic_save_table

        return atomic_save_table(self.state_table(), ckpt_dir, iteration, self.part)

    def load_state(self, path: str):
        """Restore counting state (leaves degrees/adjacency alone — the
        caller re-runs the build waves first)."""
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        sect = t["sect"].to_numpy()
        a = t["a"].to_numpy().astype(np.int64, copy=False)
        b = t["b"].to_numpy().astype(np.int64, copy=False)
        c = t["c"].to_numpy().astype(np.int64, copy=False)
        m0, m1, m2 = sect == 0, sect == 1, sect == 2
        self._triples = (
            [pa.table({"a": pa.array(a[m0]), "b": pa.array(b[m0]), "c": pa.array(c[m0])})]
            if m0.any()
            else []
        )
        self.corner_counts = np.zeros(self.n_local, dtype=np.int64)
        if m1.any():
            self.corner_counts[a[m1] - self.lo] = b[m1]
        self._foreign = [(a[m2].copy(), b[m2].copy())] if m2.any() else []
        return self.part

    # -- wave 1: undirected degrees -----------------------------------------
    def deg_push(self):
        """v-side degree partials split by owner (u-side counts are local)."""
        self.deg += np.bincount(self.u - self.lo, minlength=self.n_local)
        if len(self.v):
            ids, cnt = np.unique(self.v, return_counts=True)
        else:
            ids = cnt = np.array([], dtype=np.int64)
        out = _split_pairs(ids, cnt, self.bounds[1:-1])
        return tuple(out) if self.P > 1 else out[0]

    def deg_absorb(self, *chunks) -> int:
        for ch in chunks:
            if ch is None:
                continue
            ids, cnt = ch
            if len(ids):
                self.deg += np.bincount(ids - self.lo, weights=cnt, minlength=self.n_local).astype(
                    np.int64
                )
        return self.part

    # -- wave 2: boundary-degree fetch + orientation -------------------------
    def need_degs(self):
        """Unique v endpoints whose degree this shard must fetch, per owner."""
        self._need = np.unique(self.v)
        chunks = np.split(self._need, np.searchsorted(self._need, self.bounds[1:-1]))
        return tuple(chunks) if self.P > 1 else chunks[0]

    def serve_degs(self, *per_requester):
        out = [self.deg[np.asarray(c, dtype=np.int64) - self.lo] for c in per_requester]
        return tuple(out) if self.P > 1 else out[0]

    def orient_push(self, *deg_chunks):
        """Orient by (deg, vid) and route (a, b, deg_b) to a's owner."""
        vdeg_vals = (
            np.concatenate([np.asarray(c, dtype=np.int64) for c in deg_chunks])
            if len(self._need)
            else np.array([], dtype=np.int64)
        )
        dv = vdeg_vals[np.searchsorted(self._need, self.v)] if len(self.v) else np.array([], np.int64)
        du = self.deg[self.u - self.lo]
        u_first = (du < dv) | ((du == dv) & (self.u < self.v))
        a = np.where(u_first, self.u, self.v)
        b = np.where(u_first, self.v, self.u)
        deg_b = np.where(u_first, dv, du)
        owner = np.searchsorted(self.bounds, a, side="right") - 1
        order = np.argsort(owner, kind="stable")
        a, b, deg_b, owner = a[order], b[order], deg_b[order], owner[order]
        cuts = np.searchsorted(owner, np.arange(1, self.P))
        out = [
            (ac, bc, dc)
            for ac, bc, dc in zip(np.split(a, cuts), np.split(b, cuts), np.split(deg_b, cuts))
        ]
        return tuple(out) if self.P > 1 else out[0]

    def orient_absorb(self, *chunks) -> int:
        for ch in chunks:
            if ch is None:
                continue
            if len(ch[0]):
                self._recv_oriented.append(ch)
        return self.part

    def build_adjacency(self) -> int:
        """Finalize wedge-gen + membership structures from routed edges."""
        if self._recv_oriented:
            a = np.concatenate([c[0] for c in self._recv_oriented])
            b = np.concatenate([c[1] for c in self._recv_oriented])
            deg_b = np.concatenate([c[2] for c in self._recv_oriented])
        else:
            a = b = deg_b = np.array([], dtype=np.int64)
        self._recv_oriented = []
        order = np.lexsort((b, deg_b, a))  # per-a neighbors in (deg, vid) rank order
        self.ga, self.gb = a[order], b[order]
        morder = np.lexsort((b, a))
        a_s, b_s = a[morder], b[morder]
        counts = (
            np.bincount(a_s - self.lo, minlength=self.n_local)
            if len(a_s)
            else np.zeros(self.n_local, np.int64)
        )
        self.m_indptr = np.concatenate([[0], np.cumsum(counts)])
        self.m_adj = b_s
        return len(self.ga)

    # -- counting rounds ------------------------------------------------------
    def gen(self, k: int, K: int):
        """Wedges of the k-th contiguous source slice, split by owner of v."""
        n = len(self.ga)
        empty = (np.array([], dtype=np.int64),) * 3
        if n == 0:
            return tuple([empty] * self.P) if self.P > 1 else empty
        cuts = np.linspace(0, n, K + 1).astype(np.int64)
        sl = np.searchsorted(self.ga, self.ga[min(cuts[k], n - 1)]) if cuts[k] < n else n
        sr = np.searchsorted(self.ga, self.ga[min(cuts[k + 1], n - 1)]) if cuts[k + 1] < n else n
        if sr <= sl:
            return tuple([empty] * self.P) if self.P > 1 else empty
        aa, bb = self.ga[sl:sr], self.gb[sl:sr]
        firsts, seconds = [], []
        d = 1
        m = len(aa)
        while d < m:
            same = aa[: m - d] == aa[d:]
            if not same.any():
                break
            idx = np.flatnonzero(same)
            firsts.append(idx)
            seconds.append(idx + d)
            d += 1
        if not firsts:
            return tuple([empty] * self.P) if self.P > 1 else empty
        i = np.concatenate(firsts)
        j = np.concatenate(seconds)
        u, v, w = aa[i], bb[i], bb[j]
        owner = np.searchsorted(self.bounds, v, side="right") - 1
        oorder = np.argsort(owner, kind="stable")
        u, v, w, owner = u[oorder], v[oorder], w[oorder], owner[oorder]
        cuts2 = np.searchsorted(owner, np.arange(1, self.P))
        out = [
            (uc, vc, wc)
            for uc, vc, wc in zip(np.split(u, cuts2), np.split(v, cuts2), np.split(w, cuts2))
        ]
        return tuple(out) if self.P > 1 else out[0]

    def absorb(self, *chunks) -> int:
        """Check received wedges against local adjacency; record triangles."""
        found = 0
        for ch in chunks:
            if ch is None:
                continue
            u, v, w = ch
            if len(u) == 0:
                continue
            vloc = v - self.lo
            res = np.zeros(len(v), dtype=bool)
            qorder = np.argsort(vloc, kind="stable")
            vs = vloc[qorder]
            ws = w[qorder]
            starts = np.flatnonzero(np.concatenate([[True], vs[1:] != vs[:-1]]))
            for si, ei in zip(starts, np.concatenate([starts[1:], [len(vs)]])):
                row = self.m_adj[self.m_indptr[vs[si]] : self.m_indptr[vs[si] + 1]]
                if len(row):
                    pos = np.searchsorted(row, ws[si:ei])
                    pos = np.minimum(pos, len(row) - 1)
                    res[si:ei] = row[pos] == ws[si:ei]
            hit = np.zeros(len(v), dtype=bool)
            hit[qorder] = res
            if not hit.any():
                continue
            ta, tv, tw = u[hit], v[hit], w[hit]
            found += len(ta)
            self._triples.append(
                pa.table({"a": pa.array(ta), "b": pa.array(tv), "c": pa.array(tw)})
            )
            # corner increments: v is local; a and w may be foreign
            self.corner_counts += np.bincount(tv - self.lo, minlength=self.n_local)
            for arr in (ta, tw):
                local = (arr >= self.lo) & (arr < self.hi)
                if local.any():
                    self.corner_counts += np.bincount(
                        arr[local] - self.lo, minlength=self.n_local
                    )
                if (~local).any():
                    ids, cnt = np.unique(arr[~local], return_counts=True)
                    self._foreign.append((ids, cnt))
        return found

    def corner_push(self):
        """Foreign corner increments, split by owner — one final exchange."""
        if self._foreign:
            ids = np.concatenate([f[0] for f in self._foreign])
            cnt = np.concatenate([f[1] for f in self._foreign])
            order = np.argsort(ids, kind="stable")
            ids, cnt = ids[order], cnt[order]
            uids, starts = np.unique(ids, return_index=True)
            sums = np.add.reduceat(cnt, starts)
        else:
            uids = np.array([], dtype=np.int64)
            sums = np.array([], dtype=np.int64)
        out = _split_pairs(uids, sums, self.bounds[1:-1])
        return tuple(out) if self.P > 1 else out[0]

    def corner_absorb(self, *chunks) -> int:
        for ch in chunks:
            if ch is None:
                continue
            ids, cnt = ch
            if len(ids):
                self.corner_counts += np.bincount(
                    ids - self.lo, weights=cnt, minlength=self.n_local
                ).astype(np.int64)
        return self.part

    # -- results --------------------------------------------------------------
    def counts_table(self) -> pa.Table:
        vid = np.arange(self.lo, self.hi, dtype=np.int64)
        d = self.deg.astype(np.float64)
        coef = np.where(d >= 2, 2.0 * self.corner_counts / np.maximum(d * (d - 1), 1.0), 0.0)
        return pa.table(
            {
                "vid": pa.array(vid),
                "triangles": pa.array(self.corner_counts),
                "coefficient": pa.array(coef),
            }
        )

    def coef_partial(self) -> tuple[float, int]:
        """(sum of coefficients, n_local) — driver combines for the average."""
        d = self.deg.astype(np.float64)
        coef = np.where(d >= 2, 2.0 * self.corner_counts / np.maximum(d * (d - 1), 1.0), 0.0)
        return float(coef.sum()), self.n_local

    def triples_table(self) -> pa.Table:
        if not self._triples:
            e = pa.array([], pa.int64())
            return pa.table({"a": e, "b": e, "c": e})
        return pa.concat_tables(self._triples)

    def n_triangles(self) -> int:
        return int(sum(t.num_rows for t in self._triples))
