"""Minimum spanning tree / forest (``algo.mst``, ``MSTPrimProc.java:65``,
kernel ``impl/MSTPrim.java``).

The reference runs sequential Prim from a start node over the undirected
weighted graph.  The distributed analogue is **Borůvka rounds** (SURVEY.md
§2.2 row 14): every component picks its minimum outgoing edge, selected
edges merge components, repeat — O(log V) rounds.  Each round is Dataset
shuffles end-to-end (two label joins keyed on vid, a bucketed per-component
min, a CC tree-reduce contraction of the selected edges); no O(V) state
lives on the driver.  Ties break on the (weight, u, v) total order, making
the forest unique and cycle-free even with equal weights; with distinct
weights the result equals Prim's MST per component (MST uniqueness) —
``MSTPrimProcIntegrationTest``: weightSum 12, min 1, max 5, 4 edges.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

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
    """Undirected dedup to (u < v) with min weight per pair."""
    from ray.data.aggregate import Min

    def canon(t: pa.Table) -> pa.Table:
        u = pc.min_element_wise(t["src"], t["dst"])
        v = pc.max_element_wise(t["src"], t["dst"])
        keep = pc.not_equal(u, v)
        return pa.table({"u": u, "v": v, "w": t["weight"]}).filter(keep)

    return (
        graph.edges_ds(columns=["src", "dst", "weight"])
        .map_batches(canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Min("w", alias_name="w"))
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


def minimum_spanning_forest(graph: BuiltGraph, *, max_rounds: int = 64) -> MstResult:
    n_buckets = 64
    npart = max(2, graph.P)
    edges = _canon_edges(graph).materialize()  # {u, v, w}
    # labels live as a Dataset keyed by vid (only vertices touching edges matter)
    labels = edges.map_batches(
        lambda t: pa.table(
            {"vid": pa.concat_arrays([t["u"].combine_chunks(), t["v"].combine_chunks()])}
        ),
        batch_format="pyarrow",
    ).groupby("vid").count().map_batches(
        lambda t: pa.table({"vid": t["vid"], "comp": t["vid"]}), batch_format="pyarrow"
    ).materialize()

    chosen: list[rd.Dataset] = []
    for _ in range(max_rounds):
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

        sel = (
            cross.map_batches(two_sided, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_min, batch_format="pandas")
            .map_batches(normalize, batch_format="pandas")
            .groupby(["u", "v"])  # an edge may win for both endpoints
            .aggregate(
                Min("w", alias_name="w"),
                Min("cu", alias_name="cu"),
                Min("cv", alias_name="cv"),
            )
            .materialize()
        )
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
        metrics={"rounds": len(chosen)},
    )


def mst_summary(graph: BuiltGraph) -> pd.DataFrame:
    """Per-component forest invariant {label, n_edges, weight_u} (label =
    min vid of the component) — the SQL-checkable face of the MST.  All wide
    steps are Dataset shuffles; only the per-component summary (~#components
    rows) reaches the driver."""
    from .components import connected_components

    res = minimum_spanning_forest(graph)
    cc = connected_components(graph)
    npart = max(2, graph.P)
    lab_u = cc.labels.rename_columns({"vid": "u"})
    tagged = res.edges.join(lab_u, "inner", npart, on=("u",))
    agg = tagged.groupby("label").aggregate(
        Count(alias_name="n_edges"), Sum("weight", alias_name="ws")
    )
    df = agg.to_pandas()
    df["weight_u"] = np.floor(df["ws"].to_numpy(dtype=np.float64) * 1000 + 0.5).astype(np.int64)
    return (
        df[["label", "n_edges", "weight_u"]].sort_values("label").reset_index(drop=True)
    )
