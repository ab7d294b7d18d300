"""Strongly connected components (``algo.scc``,
``StronglyConnectedComponentsProc.java:66-381``) — multistep trim +
forward-backward coloring over ``SccShard`` actors (state/scc_shard.py).

Output contract: {vid, label} with label = **min vid of the SCC**
(deterministic canonical form; the reference's partition values are
execution-order roots).  ``setCount``/``maxSetSize``/``minSetSize`` mirror
the proc's stats row (``SCCTest``: {a,b,c} + {d,e} -> setCount 2, sizes 3/2).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

from ..state.scc_shard import SccShard
from ..state.shards import make_shard_actors
from .graph_build import BuiltGraph


@dataclass
class SccResult:
    labels: rd.Dataset  # {vid, label} min-vid canonical
    nodes: int
    metrics: dict = field(default_factory=dict)

    def set_count(self) -> int:
        return len(self.labels.unique("label"))

    def set_sizes(self) -> rd.Dataset:
        return self.labels.groupby("label").aggregate(Count(alias_name="size"))


def _transpose(refs, P):
    if P == 1:
        return [[refs[0]]]
    return [[refs[q][p] for q in range(P)] for p in range(P)]


def strongly_connected_components(
    graph: BuiltGraph, *, max_outer: int = 1_000, max_bsp_rounds: int = 10_000
) -> SccResult:
    t0 = time.perf_counter()
    rev = graph.ensure_reverse_layout()
    actors = make_shard_actors(SccShard, graph, actor_kwargs={"rev_edges_dir": rev})
    P = graph.P
    ray.get([a.ready.remote() for a in actors])

    def wave(push_m, absorb_m, *args) -> int:
        refs = [
            getattr(a, push_m).options(num_returns=P).remote() if P > 1 else getattr(a, push_m).remote()
            for a in actors
        ]
        return sum(
            ray.get(
                [
                    getattr(actors[p], absorb_m).remote(*args, *chunks)
                    for p, chunks in enumerate(_transpose(refs, P))
                ]
            )
        )

    def trim_to_fixpoint(first: bool):
        if first:  # seed: zero-degree vertices, no decrements yet
            n = sum(ray.get([a.trim_absorb.remote() for a in actors]))
            if n == 0:
                return
        for _ in range(max_bsp_rounds):
            if wave("trim_push", "trim_absorb") == 0:
                break

    trim_to_fixpoint(first=True)
    outer = 0
    for outer in range(1, max_outer + 1):
        remaining = sum(ray.get([a.n_unassigned.remote() for a in actors]))
        if remaining == 0:
            break
        # forward max-color propagation to fixpoint
        sum(ray.get([a.color_init.remote() for a in actors]))
        for _ in range(max_bsp_rounds):
            if wave("color_push", "color_absorb") == 0:
                break
        # backward flood from color roots
        sum(ray.get([a.roots_start.remote() for a in actors]))
        for _ in range(max_bsp_rounds):
            if wave("bwd_push", "bwd_absorb") == 0:
                break
        assigned = sum(ray.get([a.finalize_sccs.remote() for a in actors]))
        assert assigned > 0, "SCC outer round made no progress"
        trim_to_fixpoint(first=False)

    tabs = ray.get([a.labels_table.remote() for a in actors])
    for a in actors:
        ray.kill(a, no_restart=True)
    raw = rd.from_arrow(pa.concat_tables(tabs))
    # canonicalize: label -> min vid of the SCC (root ids are max-vid colors)
    canon = raw.groupby("label").aggregate(Min("vid", alias_name="canon"))
    labels = (
        raw.join(canon, "inner", max(1, graph.P), on=("label",))
        .select_columns(["vid", "canon"])
        .rename_columns({"canon": "label"})
    )
    return SccResult(
        labels=labels,
        nodes=graph.n_vertices,
        metrics={"outer_rounds": outer, "elapsed_s": time.perf_counter() - t0},
    )
