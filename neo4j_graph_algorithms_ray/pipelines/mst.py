"""Minimum spanning tree / forest (``algo.mst``, ``MSTPrimProc.java:65``,
kernel ``impl/MSTPrim.java``).

The reference runs sequential Prim from a start node over the undirected
weighted graph.  The distributed analogue is **Borůvka rounds** (SURVEY.md
§2.2 row 14): every component picks its minimum outgoing edge, selected
edges merge components, repeat — O(log V) rounds.  Ties break on the
(weight, u, v) total order, making the forest unique and cycle-free even
with equal weights; with distinct weights the result equals Prim's MST per
component (MST uniqueness) — ``MSTPrimProcIntegrationTest``: weightSum 12,
min 1, max 5, 4 edges.

Two execution shapes (auto-selected by vertex count):

- **actor fast path** (<= 5M vertices): edge partitions pinned in shard
  actors; component labels are a driver array shipped once per round
  (the engine's standard small-side broadcast contract), shards return
  tiny per-component min-edge partials — whole forest in ~log V * 10ms
  waves instead of ~7 Dataset shuffles per round,
- **Dataset rounds** (beyond): label joins keyed on vid, bucketed
  per-component min, CC tree-reduce contraction — no O(V) state anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum

from .components import _contract_batch
from .graph_build import BuiltGraph


@dataclass
class MstResult:
    edges: rd.Dataset  # {u, v, weight} selected forest edges
    weight_sum: float
    weight_min: float
    weight_max: float
    relationship_count: int
    metrics: dict = field(default_factory=dict)


def _canon_edges(graph: BuiltGraph) -> rd.Dataset:
    """Undirected dedup to (u < v) with min weight per pair (pair cardinality
    ~ #edges -> bucketed aggregate, stages/agg.py)."""
    from ..stages.agg import bucketed_agg

    def canon(t: pa.Table) -> pa.Table:
        u = pc.min_element_wise(t["src"], t["dst"])
        v = pc.max_element_wise(t["src"], t["dst"])
        keep = pc.not_equal(u, v)
        return pa.table({"u": u, "v": v, "w": t["weight"]}).filter(keep)

    return bucketed_agg(
        graph.edges_ds(columns=["src", "dst", "weight"]).map_batches(
            canon, batch_format="pyarrow"
        ),
        ["u", "v"],
        {"w": ("w", "min")},
        types={"w": pa.float64()},
    )


def _contract(sel: rd.Dataset, fanin: int = 8) -> rd.Dataset:
    """CC over selected (lu, lv) component-id pairs -> {v, root} mapping."""
    star = sel.map_batches(_contract_batch, batch_format="pyarrow", batch_size=None).materialize()
    while star.num_blocks() > 1:
        k = max(1, star.num_blocks() // fanin)
        star = (
            star.repartition(k)
            .map_batches(_contract_batch, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
    return star


# vertex count above which Borůvka switches from the actor-exchange fast
# path (component labels broadcast per round) to the all-Dataset rounds
from ..stages.joins import BROADCAST_MAX_V  # one engine-wide broadcast ceiling


class _MstShard:
    """One edge partition of the Borůvka rounds: holds canonical (u,v,w)
    rows; per round receives the component-label array and returns its
    per-component minimum cross edges under the (w,u,v) total order."""

    def __init__(self, part, bounds, edges_dir):
        import uuid

        self.part = int(part)
        self.incarnation = uuid.uuid4().hex  # see shards.EdgeShardBase
        t = _read_partition_mst(edges_dir, part)
        s = t["src"].to_numpy().astype(np.int64, copy=False)
        d = t["dst"].to_numpy().astype(np.int64, copy=False)
        w = t["weight"].to_numpy().astype(np.float64, copy=False)
        keep = s != d
        self.u = np.minimum(s[keep], d[keep])
        self.v = np.maximum(s[keep], d[keep])
        self.w = w[keep]

    def ready(self) -> int:
        return len(self.u)

    def whoami(self) -> str:
        return self.incarnation

    def round_mins(self, comp_ref):
        import ray

        comp = ray.get(comp_ref) if isinstance(comp_ref, ray.ObjectRef) else comp_ref
        cu = comp[self.u]
        cv = comp[self.v]
        cross = cu != cv
        if not cross.any():
            return None
        u, v, w = self.u[cross], self.v[cross], self.w[cross]
        cu, cv = cu[cross], cv[cross]
        comp_key = np.concatenate([cu, cv])
        ww = np.tile(w, 2)
        uu = np.tile(u, 2)
        vv = np.tile(v, 2)
        order = np.lexsort((vv, uu, ww, comp_key))
        ck, ww, uu, vv = comp_key[order], ww[order], uu[order], vv[order]
        first = np.unique(ck, return_index=True)[1]
        return ck[first], ww[first], uu[first], vv[first]


def _read_partition_mst(edges_dir, part):
    from ..state.shards import _read_partition

    return _read_partition(edges_dir, part, ["src", "dst", "weight"])


def _boruvka_actor(
    graph: BuiltGraph,
    max_rounds: int,
    *,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    max_failovers: int = 2,
    chaos_hook=None,
    prog=None,
) -> MstResult:
    """Fast path: component labels live on the driver (O(V), under the same
    broadcast threshold as every other small-side path) and ship to shards
    once per round; shards return tiny per-component min-edge partials.

    Checkpointing is driver-side (the algorithm state — component labels +
    selected forest edges — lives on the driver; shards hold only the
    immutable edge partition): per committed round, two state files
    (part 0 = comp labels, part 1 = forest so far) under a ``mst``
    manifest.  Failover is therefore a plain retry: ``round_mins`` is pure
    given ``comp``, so after a shard death the driver just waits out the
    ``max_restarts`` revival and re-issues the same round — no rollback."""
    import ray

    from ..portability import remote_args as _remote_args
    from ..state.checkpoint import CheckpointManager, atomic_save_table, files_by_part
    from ..state.failover import FAILOVER_ERRORS, pool_incarnations
    from .components import local_components

    actors = [
        ray.remote(num_cpus=0.25, max_restarts=3 if checkpoint_dir else 0, **_remote_args())(
            _MstShard
        ).remote(p, graph.bounds, graph.edges_dir)
        for p in range(graph.P)
    ]
    try:
        ray.get([a.ready.remote() for a in actors])
        ckpt = CheckpointManager(checkpoint_dir, "mst") if checkpoint_dir else None
        if ckpt is not None and not resume:
            ckpt.reset()  # fresh run: a stale manifest would be loaded by mid-run rollback
        n = graph.n_vertices
        comp = np.arange(n, dtype=np.int64)
        sel_u, sel_v, sel_w = [], [], []
        start_round = 1
        failovers = 0
        if resume and ckpt is not None:
            m = ckpt.latest()
            if m is not None:
                ckpt.validate_resume(m, algo="mst", bounds=graph.bounds)
                files = files_by_part(m["files"])
                comp = pq.read_table(files[0])["comp"].to_numpy().astype(np.int64, copy=True)
                sel = pq.read_table(files[1])
                sel_u = [sel["u"].to_numpy().astype(np.int64, copy=True)]
                sel_v = [sel["v"].to_numpy().astype(np.int64, copy=True)]
                sel_w = [sel["weight"].to_numpy().astype(np.float64, copy=True)]
                start_round = int(m["iteration"]) + 1

        def _commit(rnd):
            f0 = atomic_save_table(pa.table({"comp": pa.array(comp)}), ckpt.state_dir(), rnd, 0)
            f1 = atomic_save_table(
                pa.table(
                    {
                        "u": pa.array(np.concatenate(sel_u) if sel_u else np.array([], np.int64)),
                        "v": pa.array(np.concatenate(sel_v) if sel_v else np.array([], np.int64)),
                        "weight": pa.array(
                            np.concatenate(sel_w) if sel_w else np.array([], np.float64)
                        ),
                    }
                ),
                ckpt.state_dir(), rnd, 1,
            )
            ckpt.commit_iteration(
                rnd, [f0, f1], {"bounds": [int(b) for b in graph.bounds], "algo": "mst"}
            )

        rounds = start_round - 1
        for rounds in range(start_round, max_rounds + 1):
            if chaos_hook is not None:  # fault-injection point (tests)
                chaos_hook(rounds, actors)
            cref = ray.put(comp)
            while True:
                try:
                    parts = ray.get([a.round_mins.remote(cref) for a in actors])
                    break
                except FAILOVER_ERRORS:
                    if ckpt is None or failovers >= max_failovers:
                        raise
                    failovers += 1
                    pool_incarnations(actors)  # waits out the restart window
            parts = [p for p in parts if p is not None]
            if not parts:
                rounds -= 1
                break
            ck = np.concatenate([p[0] for p in parts])
            ww = np.concatenate([p[1] for p in parts])
            uu = np.concatenate([p[2] for p in parts])
            vv = np.concatenate([p[3] for p in parts])
            order = np.lexsort((vv, uu, ww, ck))
            ck, ww, uu, vv = ck[order], ww[order], uu[order], vv[order]
            first = np.unique(ck, return_index=True)[1]
            uu, vv, ww = uu[first], vv[first], ww[first]
            # an edge may win for both of its components: dedup by packed key
            key = uu * (n + 1) + vv
            korder = np.argsort(key, kind="stable")
            kfirst = korder[np.unique(key[korder], return_index=True)[1]]
            uu, vv, ww = uu[kfirst], vv[kfirst], ww[kfirst]
            sel_u.append(uu)
            sel_v.append(vv)
            sel_w.append(ww)
            if prog is not None:  # unit = Boruvka round
                prog.report(rounds, edges_added=int(len(uu)))
            verts, roots = local_components(comp[uu], comp[vv])
            mapping = np.arange(n, dtype=np.int64)
            mapping[verts] = roots
            comp = mapping[comp]
            if ckpt is not None and rounds % checkpoint_every == 0:
                _commit(rounds)
    finally:
        # any exit — normal, failover exhaustion, validate_resume mismatch,
        # chaos/cancel — must not leak the auto-restart pool reservations
        for a in actors:
            ray.kill(a, no_restart=True)

    if sel_u:
        u = np.concatenate(sel_u)
        v = np.concatenate(sel_v)
        w = np.concatenate(sel_w)
        order = np.lexsort((v, u))
        u, v, w = u[order], v[order], w[order]
    else:
        u = v = np.array([], dtype=np.int64)
        w = np.array([], dtype=np.float64)
    forest = rd.from_arrow(
        pa.table({"u": pa.array(u), "v": pa.array(v), "weight": pa.array(w)})
    )
    if prog is not None:
        prog.report(max(0, rounds), final=True, edges_total=int(len(w)))
    return MstResult(
        edges=forest,
        weight_sum=float(w.sum()),
        weight_min=float(w.min()) if len(w) else 0.0,
        weight_max=float(w.max()) if len(w) else 0.0,
        relationship_count=int(len(w)),
        metrics={
            "rounds": rounds,
            "mode": "actor",
            "failovers": failovers,
            **(prog.summary() if prog is not None else {}),
        },
    )


def minimum_spanning_forest(
    graph: BuiltGraph,
    *,
    max_rounds: int = 64,
    mode: str = "auto",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    max_failovers: int = 2,
    chaos_hook=None,
    on_progress=None,
    progress_interval_s: float = 10.0,
    progress_logger=None,
) -> MstResult:
    from ..state.progress import make_reporter

    prog = make_reporter(on_progress, progress_interval_s, "mst", progress_logger)
    if mode == "auto":
        mode = "actor" if graph.n_vertices <= BROADCAST_MAX_V else "dataset"
    if checkpoint_dir and mode != "actor":
        raise ValueError("minimum_spanning_forest checkpointing requires mode='actor'")
    if mode == "actor":
        return _boruvka_actor(
            graph, max_rounds,
            checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
            resume=resume, max_failovers=max_failovers, chaos_hook=chaos_hook,
            prog=prog,
        )
    return _boruvka_dataset(graph, max_rounds, prog=prog)


def _boruvka_dataset(graph: BuiltGraph, max_rounds: int = 64, prog=None) -> MstResult:
    n_buckets = 64
    npart = max(2, graph.P)
    edges = _canon_edges(graph).materialize()  # {u, v, w}
    # labels live as a Dataset keyed by vid (only vertices touching edges matter)
    from ..stages.agg import bucketed_agg, grouped_map

    labels = bucketed_agg(
        edges.map_batches(
            lambda t: pa.table(
                {"vid": pa.concat_arrays([t["u"].combine_chunks(), t["v"].combine_chunks()])}
            ),
            batch_format="pyarrow",
        ),
        "vid",
        {"_n": (None, "count")},
    ).map_batches(
        lambda t: pa.table({"vid": t["vid"], "comp": t["vid"]}), batch_format="pyarrow"
    ).materialize()

    chosen: list[rd.Dataset] = []
    for _round in range(max_rounds):
        if prog is not None:  # unit = Boruvka round (Dataset mode)
            prog.report(_round)
        lab_u = labels.rename_columns({"vid": "u", "comp": "cu"})
        lab_v = labels.rename_columns({"vid": "v", "comp": "cv"})
        tagged = edges.join(lab_u, "inner", npart, on=("u",)).join(
            lab_v, "inner", npart, on=("v",)
        )
        cross = tagged.map_batches(
            lambda t: t.filter(pc.not_equal(t["cu"], t["cv"])), batch_format="pyarrow"
        ).materialize()
        if cross.count() == 0:
            break

        # per-component min edge under (w, u, v): key each edge to both sides,
        # coarse-bucket the comp keys, exact argmin in a pandas kernel
        def two_sided(t: pa.Table) -> pa.Table:
            def dup(col):
                return pa.concat_arrays([t[col].combine_chunks()] * 2)

            return pa.table(
                {
                    "comp": pa.concat_arrays(
                        [t["cu"].combine_chunks(), t["cv"].combine_chunks()]
                    ),
                    "w": dup("w"),
                    "u": dup("u"),
                    "v": dup("v"),
                    "cu": dup("cu"),
                    "cv": dup("cv"),
                    "bucket": pa.concat_arrays(
                        [
                            pc.cast(
                                pc.bit_wise_and(t["cu"], n_buckets - 1), pa.int64()
                            ).combine_chunks(),
                            pc.cast(
                                pc.bit_wise_and(t["cv"], n_buckets - 1), pa.int64()
                            ).combine_chunks(),
                        ]
                    ),
                }
            )

        def bucket_min(g: pd.DataFrame) -> pd.DataFrame:
            best = g.sort_values(["comp", "w", "u", "v"], kind="mergesort").drop_duplicates(
                "comp"
            )
            return best[["u", "v", "w", "cu", "cv"]].drop_duplicates(["u", "v"])

        def normalize(b: pd.DataFrame) -> pa.Table:
            # map_groups emits schema-less empty pandas blocks for padding
            # partitions; pin an explicit arrow schema so downstream joins
            # and groupbys always see the same schema
            cols = ["u", "v", "w", "cu", "cv"]
            types = [pa.int64(), pa.int64(), pa.float64(), pa.int64(), pa.int64()]
            if len(b) == 0 or "u" not in b.columns:
                return pa.table({c: pa.array([], ty) for c, ty in zip(cols, types)})
            return pa.table(
                {c: pa.array(b[c].to_numpy()).cast(ty) for c, ty in zip(cols, types)}
            )

        sel = bucketed_agg(
            grouped_map(
                cross.map_batches(two_sided, batch_format="pyarrow"), "bucket", bucket_min
            ).map_batches(normalize, batch_format="pandas"),
            ["u", "v"],  # an edge may win for both endpoints
            {"w": ("w", "min"), "cu": ("cu", "min"), "cv": ("cv", "min")},
            types={"w": pa.float64()},
        ).materialize()
        chosen.append(sel.select_columns(["u", "v", "w"]).materialize())

        # contract the merged components and fold the mapping into labels
        sel_pairs = sel.select_columns(["cu", "cv"])
        mapping = _contract(sel_pairs).rename_columns({"v": "comp", "root": "newc"})
        joined = labels.join(mapping, "left_outer", npart, on=("comp",))
        labels = joined.map_batches(
            lambda t: pa.table(
                {
                    "vid": t["vid"],
                    "comp": pc.coalesce(t["newc"], t["comp"]).cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    if chosen:
        forest = chosen[0]
        for s in chosen[1:]:
            forest = forest.union(s)
        forest = forest.materialize()
        stats = forest.aggregate(Sum("w"), Min("w"), Max("w"))
        wsum, wmin, wmax = stats["sum(w)"], stats["min(w)"], stats["max(w)"]
        cnt = forest.count()
    else:
        forest = rd.from_arrow(
            pa.table(
                {
                    "u": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                    "w": pa.array([], pa.float64()),
                }
            )
        )
        wsum = wmin = wmax = 0.0
        cnt = 0
    forest = forest.map_batches(
        lambda t: pa.table(
            {
                "u": t["u"].combine_chunks().cast(pa.int64()),
                "v": t["v"].combine_chunks().cast(pa.int64()),
                "weight": t["w"].combine_chunks().cast(pa.float64()),
            }
        ),
        batch_format="pyarrow",
    )
    return MstResult(
        edges=forest,
        weight_sum=float(wsum),
        weight_min=float(wmin),
        weight_max=float(wmax),
        relationship_count=int(cnt),
        metrics={
            "rounds": len(chosen),
            **(prog.summary() if prog is not None else {}),
        },
    )


def mst_summary(graph: BuiltGraph, cc_labels: rd.Dataset | None = None) -> pd.DataFrame:
    """Per-component forest invariant {label, n_edges, weight_u} (label =
    min vid of the component) — the SQL-checkable face of the MST.  All wide
    steps are Dataset shuffles; only the per-component summary (~#components
    rows) reaches the driver.  ``cc_labels`` lets callers reuse an already-
    computed component labeling."""
    res = minimum_spanning_forest(graph)
    if cc_labels is None:
        from .components import connected_components

        cc_labels = connected_components(graph).labels
    npart = max(2, graph.P)
    from ..stages.agg import bucketed_agg

    lab_u = cc_labels.rename_columns({"vid": "u"})
    tagged = res.edges.join(lab_u, "inner", npart, on=("u",))
    agg = bucketed_agg(
        tagged,
        "label",
        {"n_edges": (None, "count"), "ws": ("weight", "sum")},
        types={"ws": pa.float64()},
    )
    df = agg.to_pandas()
    df["weight_u"] = np.floor(df["ws"].to_numpy(dtype=np.float64) * 1000 + 0.5).astype(np.int64)
    return (
        df[["label", "n_edges", "weight_u"]].sort_values("label").reset_index(drop=True)
    )
