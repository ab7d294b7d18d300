"""Multi-source BFS shard actors (reference: ``MultiSourceBFS.java`` —
concurrent BFS traversals encoded as per-vertex bitmasks, aggregated
neighbor processing; the reference packs ω=32 per long-half, here ω=64 in a
uint64 word — double the sources per wave sequence at the same wave count).

Shard-local state per batch of <=64 sources: ``visited``/``new`` uint64 masks
for the shard's vertex range.  One BSP round = expand the newly-visited
frontier along local out-edges with per-destination bitwise-OR combining
(``np.bitwise_or.reduceat`` over the dst-sorted CSR — same layout as the
PageRank combiner), route masks to owning shards, absorb, report how many
new bits were set.  Distance-dependent statistics (closeness farness,
harmonic inverse-farness, BFS depth) are accumulated as bits first turn on.

Both shard kinds use the *fused run-ahead push exchange* (the PageRank
``step`` pattern, state/shards.py): one actor call per shard per round
applies the previous round's packed messages and pushes the next round's;
contributions to the shard's own vid range are parked in-process instead of
round-tripping through the object store, and the driver chains ObjectRefs
with a two-round-lagged termination read instead of syncing every round.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .shards import EdgeShardBase, _read_partition


class MsBfsShard(EdgeShardBase):
    """One vertex range of an (up to) 64-source concurrent BFS."""

    def __init__(self, part, bounds, edges_dir, rev_edges_dir=None, direction="OUTGOING"):
        # build the traversal edge list according to direction (like LP);
        # INCOMING replaces the layout wholesale, so skip the forward
        # read+sort the base would throw away
        super().__init__(
            part, bounds, edges_dir, weighted=False,
            build_layout=(direction != "INCOMING"),
        )
        if direction in ("INCOMING", "BOTH"):
            assert rev_edges_dir is not None
            t = _read_partition(rev_edges_dir, part, ["src", "dst"])
            rsrc = t["dst"].to_numpy().astype(np.int64, copy=False) - self.lo  # local u
            rdst = t["src"].to_numpy().astype(np.int64, copy=False)
            if direction == "INCOMING":
                esrc, dst = rsrc, rdst
            else:
                esrc = np.concatenate([self.esrc_by_dst.astype(np.int64), rsrc])
                dst = np.concatenate([self._dst_per_edge(), rdst])
            order = np.argsort(dst, kind="stable")
            self.esrc_by_dst = esrc[order].astype(np.int32)
            dst_sorted = dst[order]
            self.n_edges = len(dst_sorted)
            if len(dst_sorted):
                self.uniq_dst, self.seg_starts = np.unique(dst_sorted, return_index=True)
            else:
                self.uniq_dst = np.array([], dtype=np.int64)
                self.seg_starts = np.array([], dtype=np.int64)
            self.dst_split = np.searchsorted(self.uniq_dst, self.bounds[1:-1])

    def begin_pass(self):
        """Zero the cross-batch stat accumulators (once per centrality run).

        Stats accumulate in-actor across all source batches so the driver
        fetches one O(n_local) table per shard at the end — not per batch
        (per-batch fetches made exact mode O(V^2/32) driver traffic)."""
        self.farness = np.zeros(self.n_local, dtype=np.float64)
        self.inv_farness = np.zeros(self.n_local, dtype=np.float64)
        self.reached = np.zeros(self.n_local, dtype=np.int64)
        return self.part

    def start(self, sources: np.ndarray):
        """Begin a batch: sources are global vids (<=64); bit i = sources[i]."""
        self.n_sources = len(sources)
        self.visited = np.zeros(self.n_local, dtype=np.uint64)
        self.new = np.zeros(self.n_local, dtype=np.uint64)
        self.depth = 0
        if not hasattr(self, "farness"):
            self.begin_pass()
        # per-batch per-bit depth matrix for all-shortest-paths streaming
        # (int16: depths < 2^15; 64 KiB per 1k local vertices per batch)
        self.bit_depth = np.full((self.n_local, len(sources)), -1, dtype=np.int16)
        self.batch_sources = np.asarray(sources, dtype=np.int64)
        self._first = True
        self._parked = None  # (local idx, masks) contributions to own range
        for i, s in enumerate(sources):
            if self.lo <= s < self.hi:
                bit = np.uint64(1) << np.uint64(i)
                self.visited[s - self.lo] |= bit
                self.new[s - self.lo] |= bit
                self.bit_depth[s - self.lo, i] = 0
        return self.part

    def step(self, *incoming):
        """Fused apply(previous round's packed masks) + push(next round's).

        ``incoming`` are packed ``{dst, mask}`` tables (dst-sorted, one per
        peer shard); this shard slices its own vid range out of each via
        binary search.  Own-range contributions were parked in-process by the
        previous push.  First call (after ``start``) only pushes the seeded
        frontier.  Returns ``(packed_message, n_newly_visited)``; rounds past
        frontier death push empty messages (harmless driver overshoot)."""
        n_new = 0
        if self._first:
            self._first = False
        else:
            n_new = self._apply_round(incoming)
        # push: frontier ORs per unique destination along the dst-sorted CSR
        if len(self.seg_starts):
            ors = np.bitwise_or.reduceat(self.new[self.esrc_by_dst], self.seg_starts)
        else:
            ors = np.array([], dtype=np.uint64)
        nz = ors != 0
        vids, m = self.uniq_dst[nz], ors[nz]
        a = int(np.searchsorted(vids, self.lo))
        b = int(np.searchsorted(vids, self.hi))
        self._parked = (vids[a:b] - self.lo, m[a:b]) if b > a else None
        packed = pa.table(
            {
                "dst": pa.array(np.concatenate([vids[:a], vids[b:]])),
                "mask": pa.array(np.concatenate([m[:a], m[b:]]).astype(np.uint64)),
            }
        )
        return packed, n_new

    def _apply_round(self, tables) -> int:
        """Absorb parked + incoming frontier masks at depth+1; #new bits set."""
        self.depth += 1
        inc = np.zeros(self.n_local, dtype=np.uint64)
        if self._parked is not None:
            idx, m = self._parked
            inc[idx] |= m  # idx entries unique (a uniq_dst slice)
            self._parked = None
        for t in tables:
            if t is not None and t.num_rows:
                dst = t["dst"].to_numpy()
                a = int(np.searchsorted(dst, self.lo))
                b = int(np.searchsorted(dst, self.hi))
                if a == b:
                    continue
                idx = dst[a:b] - self.lo
                # dsts unique within one packed message: fancy |= is exact
                inc[idx] |= t["mask"].to_numpy().astype(np.uint64)[a:b]
        new = inc & ~self.visited
        self.visited |= new
        self.new = new
        nz = np.flatnonzero(new)
        if len(nz):
            # vectorized popcount of the newly-set source bits
            unpacked = np.unpackbits(
                new[nz].view(np.uint8).reshape(len(nz), 8), axis=1, bitorder="little"
            )
            counts = unpacked.sum(axis=1).astype(np.int64)
            self.reached[nz] += counts
            self.farness[nz] += counts * float(self.depth)
            self.inv_farness[nz] += counts / float(self.depth)
            # record per-bit first-visit depth (little-endian byte order: column i = bit i)
            nb = unpacked[:, : self.n_sources].astype(bool)
            rows, cols = np.nonzero(nb)
            self.bit_depth[nz[rows], cols] = self.depth
        return int(len(nz))

    def asp_rows(self) -> pa.Table:
        """(source, target, distance) rows for the finished batch, d >= 0
        (self-distance 0 included — AllShortestPathsProc streams it)."""
        rows, cols = np.nonzero(self.bit_depth >= 0)
        return pa.table(
            {
                "source": pa.array(self.batch_sources[cols]),
                "target": pa.array(rows.astype(np.int64) + self.lo),
                "distance": pa.array(self.bit_depth[rows, cols].astype(np.int64)),
            }
        )

    def stats_table(self) -> pa.Table:
        return pa.table(
            {
                "vid": pa.array(np.arange(self.lo, self.hi, dtype=np.int64)),
                "reached": pa.array(self.reached),
                "farness": pa.array(self.farness),
                "inv_farness": pa.array(self.inv_farness),
            }
        )

    def distances_table(self, source_index: int) -> pa.Table:
        """Depths for one source bit — note only final depths of *visited*;
        kept simple: distance = depth at which the bit turned on is not stored
        per-bit, so this is only exposed for single-source batches (bit 0)."""
        raise NotImplementedError("use SsspShard for per-vertex distances")


class SsspShard(EdgeShardBase):
    """Single-source shortest paths state (unweighted BFS or weighted
    Bellman-Ford-style relaxation — the distributed analogue of the
    reference's delta-stepping relaxations, ``ShortestPathDeltaStepping.java``,
    without the bucket ordering: each round relaxes the whole active set,
    message = min distance per destination)."""

    def __init__(self, part, bounds, edges_dir, weighted=False):
        super().__init__(part, bounds, edges_dir, weighted=weighted)
        self.weighted = weighted
        # per-edge relax targets, dst-sorted — runtime state for every step()
        self.dst_vals = self._dst_per_edge()

    def start(self, source: int):
        self.dist = np.full(self.n_local, np.inf)
        self.active = np.zeros(self.n_local, dtype=bool)
        self.pred = np.full(self.n_local, -1, dtype=np.int64)
        self._first = True
        self._parked = None  # (idx, d, pred) own-range rows from the last push
        if self.lo <= source < self.hi:
            self.dist[source - self.lo] = 0.0
            self.active[source - self.lo] = True
        return self.part

    def step(self, *incoming):
        """Fused apply(previous round's min-distance messages) + relax(push).

        Each destination's message is its best (distance, predecessor) pair,
        predecessor tie-break = smallest source vid among equal distances —
        the deterministic convention path reconstruction (pipelines/paths.py)
        and its SQL oracle rely on.  ``incoming`` are packed dst-sorted
        ``{dst, d, pred}`` tables; own-range rows were parked in-process by
        the previous push.  Returns ``(packed_message, n_improved)``."""
        n_improved = 0
        if self._first:
            self._first = False
        else:
            n_improved = self._apply_round(incoming)
        # relax: push tentative distances along out-edges of active vertices
        cand = self.dist[self.esrc_by_dst] + (self.w_by_dst if self.weighted else 1.0)
        act = self.active[self.esrc_by_dst]
        cand = np.where(act, cand, np.inf)
        uglob = self.esrc_by_dst.astype(np.int64) + self.lo
        if len(self.seg_starts):
            dst_vals = self.dst_vals
            order = np.lexsort((uglob, cand, dst_vals))
            ds = dst_vals[order]
            first = np.unique(ds, return_index=True)[1]
            win = order[first]
            dsts, dmin, pred = ds[first], cand[win], uglob[win]
        else:
            dsts = np.array([], dtype=np.int64)
            dmin = np.array([])
            pred = np.array([], dtype=np.int64)
        ok = np.isfinite(dmin)
        dsts, dmin, pred = dsts[ok], dmin[ok], pred[ok]
        a = int(np.searchsorted(dsts, self.lo))
        b = int(np.searchsorted(dsts, self.hi))
        self._parked = (dsts[a:b] - self.lo, dmin[a:b], pred[a:b]) if b > a else None
        packed = pa.table(
            {
                "dst": pa.array(np.concatenate([dsts[:a], dsts[b:]])),
                "d": pa.array(np.concatenate([dmin[:a], dmin[b:]])),
                "pred": pa.array(np.concatenate([pred[:a], pred[b:]])),
            }
        )
        return packed, n_improved

    def _apply_round(self, tables) -> int:
        cand = np.full(self.n_local, np.inf)
        cpred = np.full(self.n_local, -1, dtype=np.int64)

        def fold(idx, d, p):
            better = (d < cand[idx]) | ((d == cand[idx]) & (p < cpred[idx]))
            bi = idx[better]
            cand[bi] = d[better]
            cpred[bi] = p[better]

        if self._parked is not None:
            fold(*self._parked)
            self._parked = None
        for t in tables:
            if t is not None and t.num_rows:
                dst = t["dst"].to_numpy()
                a = int(np.searchsorted(dst, self.lo))
                b = int(np.searchsorted(dst, self.hi))
                if a == b:
                    continue
                fold(dst[a:b] - self.lo, t["d"].to_numpy()[a:b], t["pred"].to_numpy()[a:b])
        improved = cand < self.dist
        # the min-vid tie-break must hold ACROSS rounds too: an equal-cost
        # path can arrive a round later than the first one (weighted
        # relaxation), and the documented convention is smallest pred vid
        # among ALL equal-distance parents.  Pred-only updates don't
        # propagate (messages carry distance, not pred), so they neither
        # reactivate the vertex nor count as progress.
        tie = (cand == self.dist) & (cpred >= 0) & (cpred < self.pred)
        self.dist = np.where(improved, cand, self.dist)
        self.pred = np.where(improved | tie, cpred, self.pred)
        self.active = improved
        return int(np.count_nonzero(improved))

    def path_info(self, vid: int):
        """(distance, predecessor) of one local vertex — the per-hop lookup
        path reconstruction walks (paths are small by nature)."""
        i = int(vid) - self.lo
        return float(self.dist[i]), int(self.pred[i])

    def dist_table(self) -> pa.Table:
        return pa.table(
            {
                "vid": pa.array(np.arange(self.lo, self.hi, dtype=np.int64)),
                "distance": pa.array(self.dist),
            }
        )


class DeltaSsspShard(EdgeShardBase):
    """Bucketed delta-stepping SSSP (``ShortestPathDeltaStepping.java``).

    Buckets partition tentative distances into width-``delta`` ranges; the
    driver processes buckets in ascending order.  Within bucket ``b``, light
    edges (weight <= delta) are relaxed to a BSP fixpoint (improvements that
    stay in bucket ``b`` re-activate their vertex), then heavy edges
    (weight > delta) of every vertex settled in the phase are relaxed once —
    heavy targets always land in later buckets.  Deviation from the
    reference's loop (which re-runs light+heavy on reinsertion into the same
    bucket, ``ShortestPathDeltaStepping.java:130-152``): this is the
    textbook Meyer-Sanders phase split; distances are the same Dijkstra
    fixpoint for non-negative weights.  Float64 distances (the reference's
    x100_000 int scaling exists only to enable CAS on ints).

    Light rounds use the fused run-ahead exchange; pushes expand only edges
    incident to the active set through per-kind local CSRs.
    """

    def __init__(self, part, bounds, edges_dir, delta):
        super().__init__(part, bounds, edges_dir, weighted=True)
        self.delta = float(delta)
        from .scc_shard import _csr

        # per-kind local CSRs built from the resident dst-sorted view (edge
        # order within a source differs from file order; per-dst min folds
        # with the lexsort tie-break are order-independent)
        esrc = self.esrc_by_dst.astype(np.int64, copy=False)
        dst = self._dst_per_edge()
        w = self.w_by_dst
        light = w <= self.delta
        lo_, self.l_indptr = _csr(esrc[light], self.n_local)
        self.l_dst = dst[light][lo_]
        self.l_w = w[light][lo_]
        hv = ~light
        ho, self.h_indptr = _csr(esrc[hv], self.n_local)
        self.h_dst = dst[hv][ho]
        self.h_w = w[hv][ho]

    def start(self, source: int):
        self.dist = np.full(self.n_local, np.inf)
        self.pred = np.full(self.n_local, -1, dtype=np.int64)
        self._active = np.array([], dtype=np.int64)
        self._in_r = np.zeros(self.n_local, dtype=bool)
        self._parked = None
        self._first = True
        if self.lo <= source < self.hi:
            self.dist[source - self.lo] = 0.0
        return self.part

    def next_bucket(self, after_b: int) -> int:
        """Min bucket index > ``after_b`` among local tentative distances
        (-1 when none) — buckets <= ``after_b`` are settled."""
        fin = np.isfinite(self.dist)
        b = np.floor_divide(self.dist[fin], self.delta)
        m = b > after_b
        return int(b[m].min()) if m.any() else -1

    def light_begin(self, b: int) -> int:
        self.cur = int(b)
        fin = np.flatnonzero(np.isfinite(self.dist))
        bk = np.floor_divide(self.dist[fin], self.delta)
        self._active = fin[bk == self.cur]
        self._in_r = np.zeros(self.n_local, dtype=bool)
        self._in_r[self._active] = True
        self._first = True
        self._parked = None
        return int(len(self._active))

    def _push(self, frontier, indptr, e_dst, e_w) -> pa.Table:
        """Per-dst min (distance, smallest-pred tie-break) relaxations over
        the edges incident to ``frontier``; own-range rows parked."""
        from .scc_shard import _expand

        eidx, srcrep = _expand(indptr, frontier)
        dst = e_dst[eidx]
        d = self.dist[srcrep] + e_w[eidx]
        pred = srcrep.astype(np.int64) + self.lo
        if len(dst):
            o = np.lexsort((pred, d, dst))
            dst, d, pred = dst[o], d[o], pred[o]
            first = np.unique(dst, return_index=True)[1]
            dst, d, pred = dst[first], d[first], pred[first]
        a = int(np.searchsorted(dst, self.lo))
        b = int(np.searchsorted(dst, self.hi))
        self._parked = (dst[a:b] - self.lo, d[a:b], pred[a:b]) if b > a else None
        return pa.table(
            {
                "dst": pa.array(np.concatenate([dst[:a], dst[b:]])),
                "d": pa.array(np.concatenate([d[:a], d[b:]])),
                "pred": pa.array(np.concatenate([pred[:a], pred[b:]])),
            }
        )

    def _fold_apply(self, tables) -> np.ndarray:
        """Fold parked + incoming min-candidates; returns improved local idx."""
        cand = np.full(self.n_local, np.inf)
        cpred = np.full(self.n_local, -1, dtype=np.int64)

        def fold(idx, d, p):
            better = (d < cand[idx]) | ((d == cand[idx]) & (p < cpred[idx]))
            bi = idx[better]
            cand[bi] = d[better]
            cpred[bi] = p[better]

        if self._parked is not None:
            fold(*self._parked)
            self._parked = None
        for t in tables:
            if t is not None and t.num_rows:
                dst = t["dst"].to_numpy()
                a = int(np.searchsorted(dst, self.lo))
                b = int(np.searchsorted(dst, self.hi))
                if a == b:
                    continue
                fold(dst[a:b] - self.lo, t["d"].to_numpy()[a:b], t["pred"].to_numpy()[a:b])
        improved = cand < self.dist
        self.dist = np.where(improved, cand, self.dist)
        self.pred = np.where(improved, cpred, self.pred)
        return np.flatnonzero(improved)

    def light_step(self, *incoming):
        """Fused apply + light-edge push for the current bucket.  Progress =
        size of the re-activated (current-bucket) set."""
        if self._first:
            self._first = False
            n = len(self._active)
        else:
            imp = self._fold_apply(incoming)
            bk = np.floor_divide(self.dist[imp], self.delta)
            self._active = imp[bk == self.cur]
            self._in_r[self._active] = True
            n = len(self._active)
        return self._push(self._active, self.l_indptr, self.l_dst, self.l_w), int(n)

    def heavy_push(self) -> pa.Table:
        return self._push(np.flatnonzero(self._in_r), self.h_indptr, self.h_dst, self.h_w)

    def heavy_apply(self, *tables) -> int:
        return int(len(self._fold_apply(tables)))

    def dist_table(self) -> pa.Table:
        return pa.table(
            {
                "vid": pa.array(np.arange(self.lo, self.hi, dtype=np.int64)),
                "distance": pa.array(self.dist),
            }
        )
