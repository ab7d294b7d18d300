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

    def __init__(self, part: int, bounds, edges_dir: str, weighted: bool = False):
        self.part = int(part)
        self.bounds = np.asarray(bounds, dtype=np.int64)
        self.P = len(self.bounds) - 1
        self.lo = int(self.bounds[part])
        self.hi = int(self.bounds[part + 1])
        self.n_local = self.hi - self.lo

        cols = ["src", "dst"] + (["weight"] if weighted else [])
        t = _read_partition(edges_dir, part, cols)
        src = t["src"].to_numpy().astype(np.int64, copy=False)
        self.dst = t["dst"].to_numpy().astype(np.int64, copy=False)
        self.esrc = src - self.lo
        self.weight = t["weight"].to_numpy().astype(np.float64, copy=False) if weighted else None
        self.n_edges = len(src)
        self.outdeg = np.bincount(self.esrc, minlength=self.n_local).astype(np.float64)

        # dst-sorted view for per-destination combining
        order = np.argsort(self.dst, kind="stable")
        self.dorder = order
        dst_sorted = self.dst[order]
        self.esrc_by_dst = self.esrc[order]
        if self.n_edges:
            self.uniq_dst, self.seg_starts = np.unique(dst_sorted, return_index=True)
        else:
            self.uniq_dst = np.array([], dtype=np.int64)
            self.seg_starts = np.array([], dtype=np.int64)
        # split points of uniq_dst by owning shard (uniq_dst sorted, shards contiguous)
        self.dst_split = np.searchsorted(self.uniq_dst, self.bounds[1:-1])

    def ready(self) -> int:
        return self.n_edges

    def _split_by_owner(self, values: np.ndarray):
        """Split a per-uniq-dst vector into P chunks aligned with dst ranges."""
        return np.split(values, self.dst_split)

    def combine_by_dst(self, per_edge: np.ndarray) -> np.ndarray:
        """Sum a per-edge (dst-sorted order) vector into per-unique-dst sums."""
        if len(self.seg_starts) == 0:
            return np.array([], dtype=np.float64)
        return np.add.reduceat(per_edge, self.seg_starts)


class PageRankShard(EdgeShardBase):
    """Delta-push PageRank state (``PageRank.java:444-517`` semantics, float64).

    Deviation from the reference: no 100_000x int fixed-point — that exists
    only to avoid atomic doubles in shared arrays; shards own their state, so
    float64 end-to-end (documented in SURVEY.md §7.2).
    """

    def __init__(self, part, bounds, edges_dir, damping: float = 0.85):
        super().__init__(part, bounds, edges_dir, weighted=False)
        self.d = float(damping)
        self.alpha = 1.0 - self.d
        self.reset()

    def reset(self):
        self.score = np.full(self.n_local, self.alpha, dtype=np.float64)
        self.delta = np.full(self.n_local, self.alpha, dtype=np.float64)

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

    # -- dataset-exchange variant ------------------------------------------
    def push_all(self) -> pa.Table:
        """Like push() but one combined table (input to a Dataset groupby shuffle)."""
        coef = np.divide(
            self.delta, self.outdeg, out=np.zeros_like(self.delta), where=self.outdeg > 0
        )
        sums = self.combine_by_dst(coef[self.esrc_by_dst])
        return pa.table({"dst": pa.array(self.uniq_dst), "contrib": pa.array(sums)})

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
        os.makedirs(ckpt_dir, exist_ok=True)
        final = os.path.join(ckpt_dir, f"iter={iteration:06d}.part={self.part:05d}.parquet")
        tmp = final + ".tmp"
        pq.write_table(self.state_table(), tmp)
        os.replace(tmp, final)
        return final

    def load_state(self, path: str):
        t = pq.read_table(path)
        assert t.num_rows == self.n_local
        self.score = t["score"].to_numpy().astype(np.float64, copy=True)
        self.delta = t["delta"].to_numpy().astype(np.float64, copy=True)
        return self.part


def make_shard_actors(cls, graph, *, actor_kwargs=None, num_cpus: float = 1.0):
    """Spawn one remote shard per partition of a BuiltGraph."""
    actor_kwargs = actor_kwargs or {}
    remote_cls = ray.remote(num_cpus=num_cpus)(cls)
    return [
        remote_cls.remote(p, graph.bounds, graph.edges_dir, **actor_kwargs)
        for p in range(graph.P)
    ]
