"""Triangle counting + clustering coefficients (headline algorithm #4).

Reference semantics (``TriangleCountBase.java``, ``TriangleCountQueue.java``):
load undirected + deduped (``TriangleProc.java:169-180``), enumerate each
triangle ``u<v<w`` once via neighbor iteration with an ordering filter, test
the closing edge with a sorted-adjacency membership probe / intersection
(``HugeGraphIntersectImpl.intersect:58-89``), bump all three corners, compute
``coefficient = 2T(v) / (deg(v) * (deg(v)-1))`` and the average over all
nodes (``TriangleCountBase.java:106-115``).

Distributed shape (SURVEY.md §2.2 "Triangle count"):

1. **canonicalize** — ``(min,max)`` endpoint normalization, self-loop drop,
   exact dedup via ``groupby`` (mirrors ``RawValues.combineSorted``),
2. **degrees** — per-batch partial ``bincount`` then a small ``groupby.sum``,
3. **orient** by ``(degree, vid)`` rank, low -> high.  The reference filters
   by plain id order (``t > u``); degree-first ordering is the standard skew
   armor: a high-degree hub keeps few *out*-neighbors, bounding per-vertex
   wedge counts by O(sqrt(m)),
4. **partition** oriented edges by source range (same bounds as the graph) —
   each partition holds complete adjacency for its vertex range,
5. **count** — wedge rows stream out of P*K generation tasks (vectorized
   stride enumeration over source-range splits) and shuffle by
   ``(owner(v), hash(w))`` bucket to a co-partitioned local membership
   check (vectorized binary search over that partition's sorted adjacency),
   yielding triangle triples ``{a,b,c}`` (the reference's
   ``TriangleStream``) — no cross-actor probes on the critical path,
6. **aggregate** — per-corner counts (partial bincount + groupby.sum),
   coefficients via a degree join, global count / average as tiny aggregates.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .graph_build import BuiltGraph, partition_edges
from ..stages.agg import grouped_map
import os

# vertex count above which degree orientation switches from a broadcast
# array to Dataset hash joins (tests lower it to exercise the join path)
from ..stages.joins import BROADCAST_MAX_V  # one engine-wide broadcast ceiling


# ---------------------------------------------------------------------------
# membership shards
# ---------------------------------------------------------------------------


def _load_tri_partition(tri_dir: str, part: int):
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(tri_dir, f"part={part}", "*.parquet")))
    if not files:
        empty = np.array([], dtype=np.int64)
        return empty, empty, empty
    t = pa.concat_tables([pq.read_table(f, columns=["a", "b", "deg_b"]) for f in files])
    return (
        t["a"].to_numpy().astype(np.int64, copy=False),
        t["b"].to_numpy().astype(np.int64, copy=False),
        t["deg_b"].to_numpy().astype(np.int64, copy=False),
    )


# ---------------------------------------------------------------------------
# wedge generation + co-partitioned closing-edge check
#
# The closing-edge test is the reference's sorted-adjacency membership probe
# (``AdjacencyMatrix.hasOutgoing:144-154`` / ``HugeGraphIntersectImpl``),
# distributed as a *shuffle*, not as cross-actor RPCs: wedge rows (v, w | a)
# are routed to the partition that owns v's oriented adjacency and checked
# there with one vectorized binary search per group.  No actor round-trips
# on the critical path, and both stages fan out to many more work items
# than P (source-range splits for generation, (owner, w-hash) buckets for
# checking), so all cores stay busy.
# ---------------------------------------------------------------------------


def _wedge_pairs(seg_id: np.ndarray):
    """All index pairs (i, j), i<j, within equal-seg_id runs — vectorized by stride."""
    n = len(seg_id)
    firsts, seconds = [], []
    d = 1
    while d < n:
        same = seg_id[: n - d] == seg_id[d:]
        if not same.any():
            break
        idx = np.flatnonzero(same)
        firsts.append(idx)
        seconds.append(idx + d)
        d += 1
    if not firsts:
        e = np.array([], dtype=np.int64)
        return e, e
    return np.concatenate(firsts), np.concatenate(seconds)


def _membership_mask(lo: int, hi: int, a: np.ndarray, b: np.ndarray, vs: np.ndarray, ws: np.ndarray):
    """Vectorized (v,w)-in-oriented-edges test against partition [lo,hi)."""
    order = np.lexsort((b, a))
    a_s, b_s = a[order], b[order]
    counts = np.bincount(a_s - lo, minlength=hi - lo)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    out = np.zeros(len(vs), dtype=bool)
    vloc = vs - lo
    qorder = np.argsort(vloc, kind="stable")
    vs_s = vloc[qorder]
    ws_s = ws[qorder]
    starts = np.flatnonzero(np.concatenate([[True], vs_s[1:] != vs_s[:-1]]))
    res = np.zeros(len(vs), dtype=bool)
    for si, ei in zip(starts, np.concatenate([starts[1:], [len(vs_s)]])):
        v = vs_s[si]
        row = b_s[indptr[v] : indptr[v + 1]]
        if len(row):
            pos = np.searchsorted(row, ws_s[si:ei])
            pos = np.minimum(pos, len(row) - 1)
            res[si:ei] = row[pos] == ws_s[si:ei]
    out[qorder] = res
    return out


class WedgeGen:
    """map_batches stage over (part, k, K) work items: yields wedge rows.

    Each item covers the k-th of K contiguous source-vid chunks of one
    oriented-edge partition, so generation parallelism is P*K tasks.  Output
    rows {a, v, w, bucket} stream out with backpressure; ``bucket`` routes
    each wedge to the checker that holds v's adjacency.
    """

    def __init__(self, tri_dir: str, bounds, sub: int, chunk: int = 1 << 20):
        self.tri_dir = tri_dir
        self.bounds = np.asarray(bounds)
        self.sub = sub
        self.chunk = chunk

    def __call__(self, batch: pa.Table):
        yielded = False
        for part, k, K in zip(
            batch["part"].to_pylist(), batch["k"].to_pylist(), batch["K"].to_pylist()
        ):
            a, b, deg_b = _load_tri_partition(self.tri_dir, int(part))
            if len(a) == 0:
                continue
            order = np.lexsort((b, deg_b, a))  # per-a neighbors in rank order
            a, b = a[order], b[order]
            # k-th contiguous source chunk (a is sorted): equal-row slices
            cuts = np.linspace(0, len(a), K + 1).astype(np.int64)
            # align slice starts to source boundaries so no run is split
            sl = np.searchsorted(a, a[np.minimum(cuts[k], len(a) - 1)]) if cuts[k] < len(a) else len(a)
            sr = np.searchsorted(a, a[np.minimum(cuts[k + 1], len(a) - 1)]) if cuts[k + 1] < len(a) else len(a)
            if sr <= sl:
                continue
            aa, bb = a[sl:sr], b[sl:sr]
            i, j = _wedge_pairs(aa)
            for s in range(0, len(i), self.chunk):
                ii, jj = i[s : s + self.chunk], j[s : s + self.chunk]
                u, v, w = aa[ii], bb[ii], bb[jj]
                owner = np.searchsorted(self.bounds, v, side="right") - 1
                bucket = owner * self.sub + (w % self.sub)
                yielded = True
                yield pa.table(
                    {
                        "a": pa.array(u),
                        "v": pa.array(v),
                        "w": pa.array(w),
                        "bucket": pa.array(bucket.astype(np.int64)),
                    }
                )
        if not yielded:
            e = pa.array([], pa.int64())
            yield pa.table({"a": e, "v": e, "w": e, "bucket": e})


class WedgeCheck:
    """map_groups stage per (owner, w-hash) bucket: local membership check.

    Loads the owning partition's oriented adjacency once per group call and
    emits the closing triangles {a, b, c}.  Stateless w.r.t. Ray (tasks);
    partition reads are small (E/P rows) and amortized over the whole group.
    """

    def __init__(self, tri_dir: str, bounds, sub: int):
        self.tri_dir = tri_dir
        self.bounds = np.asarray(bounds)
        self.sub = sub
        self._cache: dict[int, tuple] = {}

    def __call__(self, g: pa.Table) -> pa.Table:
        e = pa.array([], pa.int64())
        if g.num_rows == 0:
            return pa.table({"a": e, "b": e, "c": e})
        part = int(g["bucket"][0].as_py()) // self.sub
        if part not in self._cache:
            pa_, pb_, _ = _load_tri_partition(self.tri_dir, part)
            self._cache = {part: (pa_, pb_)}  # keep one partition resident
        ea, eb = self._cache[part]
        if len(ea) == 0:
            return pa.table({"a": e, "b": e, "c": e})
        vs = g["v"].to_numpy()
        ws = g["w"].to_numpy()
        hit = _membership_mask(
            int(self.bounds[part]), int(self.bounds[part + 1]), ea, eb, vs, ws
        )
        return pa.table(
            {
                "a": pa.array(g["a"].to_numpy()[hit]),
                "b": pa.array(vs[hit]),
                "c": pa.array(ws[hit]),
            }
        )


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------


@dataclass
class TriangleResult:
    triangles: rd.Dataset  # {a, b, c} vid triples, each triangle once
    counts: rd.Dataset  # {vid, triangles} for ALL vertices
    coefficients: rd.Dataset  # {vid, coefficient}
    triangle_count: int
    node_count: int
    average_coefficient: float
    metrics: dict = field(default_factory=dict)


def _canon_kernel(t: pa.Table, bounds) -> pa.Table:
    """Canonical undirected edges: drop self-loops, (min,max) order, batch-level
    np.unique combine, owner-of-min partition tag.  Shared by the actor-mode
    edge feed and the dataset-mode raw write (one kernel — the two paths must
    canonicalize identically or their triangle counts diverge)."""
    s = t["src"].to_numpy()
    d = t["dst"].to_numpy()
    keep = s != d
    s, d = s[keep], d[keep]
    u = np.minimum(s, d)
    v = np.maximum(s, d)
    packed = (
        np.unique(np.stack([u, v], axis=1), axis=0)  # map-side combine
        if len(u)
        else np.empty((0, 2), np.int64)
    )
    part = np.searchsorted(bounds, packed[:, 0], side="right") - 1
    return pa.table(
        {"u": pa.array(packed[:, 0]), "v": pa.array(packed[:, 1]), "part": pa.array(part)}
    )


def _canonical_edges(graph: BuiltGraph) -> rd.Dataset:
    """Undirected dedup: {u,v} with u<v, distinct (asUndirected+sort load).

    Shuffle shape: one single-int-key groupby into P buckets (by the min
    endpoint's owning shard) with a vectorized ``np.unique`` per bucket —
    ~10x cheaper than a multi-key row groupby over all edges.
    """
    bounds = graph.bounds

    def canon(t: pa.Table) -> pa.Table:
        return _canon_kernel(t, bounds)

    def dedup_bucket(g: pa.Table) -> pa.Table:
        m = np.stack([g["u"].to_numpy(), g["v"].to_numpy()], axis=1)
        m = np.unique(m, axis=0)
        return pa.table({"u": pa.array(m[:, 0]), "v": pa.array(m[:, 1])})

    e = graph.edges_ds(columns=["src", "dst"]).map_batches(canon, batch_format="pyarrow")
    return grouped_map(e, "part", dedup_bucket, batch_format="pyarrow")


def _degrees(canon: rd.Dataset) -> rd.Dataset:
    def partial(t: pa.Table) -> pa.Table:
        vals, counts = np.unique(
            np.concatenate([t["u"].to_numpy(), t["v"].to_numpy()]), return_counts=True
        )
        return pa.table({"vid": pa.array(vals), "n": pa.array(counts.astype(np.int64))})

    from ..stages.agg import bucketed_agg

    # per-vertex cardinality -> bucketed aggregate (stages/agg.py)
    return bucketed_agg(
        canon.map_batches(partial, batch_format="pyarrow"), "vid", {"deg": ("n", "sum")}
    )


def triangle_count(
    graph: BuiltGraph,
    *,
    chunk: int = 1 << 18,
    mode: str = "auto",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    max_failovers: int = 2,
    chaos_hook=None,
    wedge_rounds: int | None = None,
) -> TriangleResult:
    """mode='auto' resolves to 'actor': the counting phase runs as a BSP
    exchange over ``TriangleShard`` actors — identical bytes moved as the
    Dataset shuffle, none of the per-groupby shuffle spin-up that dominated
    bench wall-time — and it is scale-safe as-is because per-vertex degree
    and count arrays are SHARDED across the actor pool (no single node holds
    a full-V array; the broadcast-vs-join split below applies only to the
    explicit 'dataset' mode's orientation stage).  mode='dataset' keeps the
    groupby-bucket shuffle formulation as the actor-free alternative."""
    workdir = graph.workdir
    if mode == "auto":
        mode = "actor"
    if mode == "actor":
        raw_dir = os.path.join(workdir, "edges_tri_raw")
        marker = os.path.join(raw_dir, "_DONE")
        if not os.path.exists(marker):
            import shutil

            shutil.rmtree(raw_dir, ignore_errors=True)
            _write_canonical_raw(graph, raw_dir)
            with open(marker, "w") as f:
                f.write("ok")
        return _count_actor_exchange(
            graph, raw_dir,
            checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
            resume=resume, max_failovers=max_failovers, chaos_hook=chaos_hook,
            wedge_rounds=wedge_rounds,
        )
    if checkpoint_dir:
        raise ValueError("triangle_count checkpointing requires mode='actor'")
    canon = _canonical_edges(graph).materialize()
    degrees = _degrees(canon).materialize()

    # orientation by (deg, vid).  Small-V path: broadcast the degree table
    # once (ray.put) and index it per batch.  Above the broadcast threshold
    # the same columns come from two Dataset hash joins instead — the same
    # auto-fallback contract as stages/joins.lookup_vids.
    def _orient_cols(u, v, du, dv):
        u_first = (du < dv) | ((du == dv) & (u < v))
        return pa.table(
            {
                "a": pa.array(np.where(u_first, u, v)),
                "b": pa.array(np.where(u_first, v, u)),
                "deg_b": pa.array(np.where(u_first, dv, du)),
            }
        )

    if graph.n_vertices <= BROADCAST_MAX_V:
        deg_pdf = degrees.to_pandas()
        deg_ref = ray.put(deg_pdf)

        class Orient:
            def __init__(self):
                d = ray.get(deg_ref)
                n = int(graph.n_vertices)
                self.deg = np.zeros(n, dtype=np.int64)
                if len(d):
                    self.deg[d["vid"].to_numpy()] = d["deg"].to_numpy()

            def __call__(self, t: pa.Table) -> pa.Table:
                u = t["u"].to_numpy()
                v = t["v"].to_numpy()
                return _orient_cols(u, v, self.deg[u], self.deg[v])

        from ..stages.agg import actor_pool_args

        oriented = canon.map_batches(Orient, batch_format="pyarrow", **actor_pool_args(4))
    else:
        npart = max(2, graph.P)
        du_t = degrees.rename_columns({"vid": "u", "deg": "du"})
        dv_t = degrees.rename_columns({"vid": "v", "deg": "dv"})
        joined = canon.join(du_t, "inner", npart, on=("u",)).join(dv_t, "inner", npart, on=("v",))
        oriented = joined.map_batches(
            lambda t: _orient_cols(
                t["u"].to_numpy(), t["v"].to_numpy(), t["du"].to_numpy(), t["dv"].to_numpy()
            ),
            batch_format="pyarrow",
        )
    tri_dir = os.path.join(workdir, "edges_tri")
    # write_parquet appends uniquely-named files: a re-run into a dirty dir
    # would duplicate every oriented edge (and square the wedge count) —
    # rebuild from scratch unless a completed layout exists
    marker = os.path.join(tri_dir, "_DONE")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(tri_dir, ignore_errors=True)
        partition_edges(oriented, graph.bounds, tri_dir, key="a")
        with open(marker, "w") as f:
            f.write("ok")

    return _count_dataset_shuffle(graph, tri_dir, canon, degrees, chunk)


def _write_canonical_raw(graph: BuiltGraph, raw_dir: str):
    """One Dataset pass: canonical (min,max) pairs, batch-level dedup combine,
    Hive-partitioned by the min endpoint's owner (global dedup then happens
    locally inside each TriangleShard)."""
    bounds = graph.bounds

    def canon(t: pa.Table) -> pa.Table:
        return _canon_kernel(t, bounds)

    os.makedirs(raw_dir, exist_ok=True)
    graph.edges_ds(columns=["src", "dst"]).map_batches(
        canon, batch_format="pyarrow"
    ).write_parquet(raw_dir, partition_cols=["part"])


def _count_actor_exchange(
    graph: BuiltGraph,
    raw_dir: str,
    *,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    max_failovers: int = 2,
    chaos_hook=None,
    wedge_rounds: int | None = None,
) -> TriangleResult:
    """Full triangle pipeline over TriangleShard actors (state/triangle_shards.py):
    degree waves, boundary-degree fetch, orientation routing, wedge rounds,
    corner exchange — every step a direct pre-aggregated actor exchange.

    Checkpointing commits after each wedge round (the only long-running,
    accumulating phase).  Recovery differs from PageRank/SCC because the
    build phases are cross-actor: a revived shard cannot self-heal, so a
    rollback resets EVERY shard, re-runs the deterministic build waves, and
    reloads the last committed wedge round's counting state."""
    from ..portability import remote_args as _remote_args
    from ..state.checkpoint import CheckpointManager, files_by_part
    from ..state.failover import (
        FAILOVER_ERRORS,
        ShardRestartDetected,
        pool_incarnations,
        verify_incarnations,
    )
    from ..state.triangle_shards import TriangleShard

    P = graph.P
    actors = [
        ray.remote(num_cpus=0.25, max_restarts=3 if checkpoint_dir else 0, **_remote_args())(
            TriangleShard
        ).remote(p, graph.bounds, raw_dir)
        for p in range(P)
    ]
    ray.get([a.ready.remote() for a in actors])
    ckpt = CheckpointManager(checkpoint_dir, "triangles") if checkpoint_dir else None
    if ckpt is not None and not resume:
        ckpt.reset()  # fresh run: a stale manifest would be loaded by mid-run rollback
    baseline = pool_incarnations(actors) if ckpt is not None else None

    def wave(push_m, absorb_m, push_args=(), per_actor_push_args=None):
        if P > 1:
            if per_actor_push_args is None:
                outs = [getattr(a, push_m).options(num_returns=P).remote(*push_args) for a in actors]
            else:
                outs = [
                    getattr(a, push_m).options(num_returns=P).remote(*per_actor_push_args[i])
                    for i, a in enumerate(actors)
                ]
            return ray.get(
                [
                    getattr(actors[p], absorb_m).remote(*[outs[q][p] for q in range(P)])
                    for p in range(P)
                ]
            )
        args = push_args if per_actor_push_args is None else per_actor_push_args[0]
        return [ray.get(getattr(actors[0], absorb_m).remote(getattr(actors[0], push_m).remote(*args)))]

    def _build():
        """Deterministic build phases (degrees -> orientation -> adjacency);
        requires pristine build state on every shard."""
        wave("deg_push", "deg_absorb")
        if P > 1:
            needs = [a.need_degs.options(num_returns=P).remote() for a in actors]
            served = [
                actors[q].serve_degs.options(num_returns=P).remote(*[needs[p][q] for p in range(P)])
                for q in range(P)
            ]
            per_actor_args = [[served[q][p] for q in range(P)] for p in range(P)]
        else:
            need = actors[0].need_degs.remote()
            per_actor_args = [[actors[0].serve_degs.remote(need)]]
        wave("orient_push", "orient_absorb", per_actor_push_args=per_actor_args)
        return ray.get([a.build_adjacency.remote() for a in actors])

    def _restore(from_manifest):
        """Reset all shards (deg_push is +=, survivors must not double),
        rebuild adjacency, then reload the last committed counting state."""
        ray.get([a.reset_build.remote() for a in actors])
        edge_counts = _build()
        k0, mK = 0, None
        if from_manifest and ckpt is not None:
            m = ckpt.latest()
            if m is not None:
                ckpt.validate_resume(m, algo="triangles", bounds=graph.bounds)
                files = files_by_part(m["files"])
                ray.get([actors[p].load_state.remote(files[p]) for p in range(P)])
                k0 = int(m["iteration"]) + 1
                mK = int(m["K"])
        return edge_counts, k0, mK

    failovers = 0
    try:
        while True:
            try:
                if failovers == 0 and not resume:
                    edge_counts, k0, mK = _build(), 0, None
                else:
                    edge_counts, k0, mK = _restore(True)
                # wedge rounds: source-slice K bounds in-flight wedge volume
                # (wedge_rounds overrides — tuning / checkpoint-cadence tests)
                K = wedge_rounds or (
                    int(max(1, min(16, (max(edge_counts) // (1 << 21)) + 1))) if edge_counts else 1
                )
                if mK is not None and mK != K:
                    raise ValueError(
                        f"resume manifest was written with K={mK} wedge rounds, "
                        f"this run computes K={K} — pass the same wedge_rounds"
                    )
                for k in range(k0, K):
                    if chaos_hook is not None:  # fault-injection point (tests)
                        chaos_hook(k, actors)
                    wave("gen", "absorb", push_args=(k, K))
                    if ckpt is not None and (k % checkpoint_every == 0 or k == K - 1):
                        files = ray.get(
                            [a.save_state.remote(ckpt.state_dir(), k) for a in actors]
                        )
                        if baseline is not None:
                            verify_incarnations(actors, baseline)
                        ckpt.commit_iteration(
                            k, files,
                            {"bounds": [int(b) for b in graph.bounds], "algo": "triangles", "K": K},
                        )
                # one corner-count exchange
                wave("corner_push", "corner_absorb")

                count_refs = [a.counts_table.remote() for a in actors]
                triple_refs = [a.triples_table.remote() for a in actors]
                partials = ray.get([a.coef_partial.remote() for a in actors])
                n_triangles = sum(ray.get([a.n_triangles.remote() for a in actors]))
                ray.wait(
                    count_refs + triple_refs,
                    num_returns=len(count_refs) + len(triple_refs),
                    fetch_local=False,
                )
                if baseline is not None:
                    # final gate: the collected tables were produced on these
                    # incarnations (actor tasks serialize), so a match proves
                    # no fresh-state shard contributed
                    verify_incarnations(actors, baseline)
                break
            except FAILOVER_ERRORS + (ShardRestartDetected,):
                if ckpt is None or failovers >= max_failovers:
                    raise
                failovers += 1
                baseline = pool_incarnations(actors)  # waits out restart windows
    except BaseException:
        for a in actors:  # failure must not leak pool reservations
            ray.kill(a, no_restart=True)
        raise
    for a in actors:
        ray.kill(a, no_restart=True)
    full = rd.from_arrow_refs(count_refs)
    counts = full.select_columns(["vid", "triangles"])
    coeffs = full.select_columns(["vid", "coefficient"])
    triangles = rd.from_arrow_refs(triple_refs)
    csum = sum(s for s, _ in partials)
    n = sum(n for _, n in partials)
    return TriangleResult(
        triangles=triangles,
        counts=counts,
        coefficients=coeffs,
        triangle_count=n_triangles,
        node_count=graph.n_vertices,
        average_coefficient=(csum / n) if n else 0.0,
        metrics={"p": P, "mode": "actor", "rounds": K, "failovers": failovers},
    )


def _count_dataset_shuffle(
    graph: BuiltGraph, tri_dir: str, canon: rd.Dataset, degrees: rd.Dataset, chunk: int
) -> TriangleResult:
    # wedge-gen parallelism: P partitions x K source splits; check-stage
    # parallelism: P owners x `sub` w-hash buckets — both exceed the core
    # count so neither stage is bounded by P
    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", 8))
    K = max(1, (2 * ncpu) // max(1, graph.P))
    sub = max(1, (2 * ncpu) // max(1, graph.P))
    items = [{"part": p, "k": k, "K": K} for p in range(graph.P) for k in range(K)]
    parts = rd.from_items(items)
    from ..stages.agg import actor_pool_args

    wedges = parts.map_batches(
        WedgeGen,
        fn_constructor_kwargs={"tri_dir": tri_dir, "bounds": graph.bounds, "sub": sub, "chunk": chunk},
        batch_format="pyarrow",
        batch_size=1,
        **actor_pool_args(max(2, ncpu // 2)),
    )
    checker = WedgeCheck(tri_dir, graph.bounds, sub)

    def check_group(g: pa.Table) -> pa.Table:
        return checker(g)

    triangles = grouped_map(
        wedges, "bucket", check_group, batch_format="pyarrow"
    ).materialize()
    n_triangles = triangles.count()

    # per-corner counts: partial bincount -> groupby.sum -> left join all vertices
    def corner_partial(t: pa.Table) -> pa.Table:
        allv = np.concatenate([t["a"].to_numpy(), t["b"].to_numpy(), t["c"].to_numpy()])
        vals, counts = np.unique(allv, return_counts=True)
        return pa.table({"vid": pa.array(vals), "n": pa.array(counts.astype(np.int64))})

    from ..stages.agg import bucketed_agg

    per_corner = bucketed_agg(
        triangles.map_batches(corner_partial, batch_format="pyarrow"), "vid", {"t": ("n", "sum")}
    )
    verts = graph.vertices_ds().select_columns(["vid"])
    counts = verts.join(per_corner, "left_outer", max(1, graph.P), on=("vid",)).map_batches(
        lambda t: pa.table(
            {"vid": t["vid"], "triangles": pc.coalesce(t["t"], pa.scalar(0)).cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )

    # coefficient = 2T / (d(d-1)); deg<2 -> 0  (TriangleCountBase.java:106-115)
    coeffs = counts.join(degrees, "left_outer", max(1, graph.P), on=("vid",)).map_batches(
        lambda t: pa.table(
            {
                "vid": t["vid"],
                "coefficient": pa.array(
                    np.where(
                        (d := pc.coalesce(t["deg"], pa.scalar(0)).to_numpy().astype(np.float64)) >= 2,
                        2.0 * t["triangles"].to_numpy() / np.maximum(d * (d - 1), 1.0),
                        0.0,
                    )
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    from ray.data.aggregate import Mean

    avg = coeffs.aggregate(Mean("coefficient", alias_name="avg"))["avg"] if graph.n_vertices else 0.0

    return TriangleResult(
        triangles=triangles,
        counts=counts,
        coefficients=coeffs,
        triangle_count=n_triangles,
        node_count=graph.n_vertices,
        average_coefficient=float(avg or 0.0),
        metrics={"p": graph.P, "mode": "dataset"},
    )
