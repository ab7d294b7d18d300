"""sf-tier graph cache + query-shaped wrappers for the driver contract.

The driver calls ``queries()[name](sf_dir)``; graph inputs are the
deterministic synthetic corpus for that tier (sources/corpus.py), built once
per tier under ``/tmp/graft_graphs/<tier>`` and reused by every graph query
(the expensive one-time id-assignment + partitioning is an immutable input to
all four algorithms — SURVEY.md §7.5).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray.data as rd

from ..sources.corpus import corpus_path_for
from ..sources.readers import read_parquet_clean
from .graph_build import BuiltGraph, build_graph

GRAPH_CACHE_ROOT = "/tmp/graft_graphs"
_DEFAULT_P = 8

# per-process memo of expensive shared results (triangle_count backs three
# queries, connected_components backs two; the driver calls each separately)
_MEMO: dict = {}


def _memo_get(key, fn):
    if key not in _MEMO:
        _MEMO[key] = fn()
    return _MEMO[key]


def graph_for_sf(sf_dir: str, P: int = _DEFAULT_P) -> BuiltGraph:
    base = os.path.basename(os.path.normpath(sf_dir))
    workdir = os.path.join(GRAPH_CACHE_ROOT, f"{base}.P{P}")
    marker = os.path.join(workdir, "_DONE")
    if os.path.exists(marker):
        return BuiltGraph.load(workdir)
    corpus = read_parquet_clean(corpus_path_for(sf_dir))
    g = build_graph(corpus, workdir, P=P)
    with open(marker, "w") as f:
        f.write("ok")
    return g


def weighted_graph_for_sf(sf_dir: str, P: int = _DEFAULT_P) -> BuiltGraph:
    """Synthetically-reweighted view of the tier graph: ``weight(src, dst) =
    1 + (src + 2*dst) % 5`` — a deterministic integer formula both the engine
    and the SQL oracle compute identically.  Built once per tier through the
    edge-table projection source (``build_graph_from_edges``), exercising the
    weighted code paths (weighted LP votes, unionFind threshold) the
    unit-weight corpus cannot."""
    import pyarrow as pa

    from .graph_build import build_graph_from_edges

    g = graph_for_sf(sf_dir, P)
    workdir = g.workdir + ".synw"
    marker = os.path.join(workdir, "_DONE")
    if os.path.exists(marker):
        return BuiltGraph.load(workdir)

    def reweight(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        w = (1 + (src + 2 * dst) % 5).astype(np.float64)
        return pa.table({"src": t["src"], "dst": t["dst"], "weight": pa.array(w)})

    e = g.edges_ds(columns=["src", "dst"]).map_batches(reweight, batch_format="pyarrow")
    g2 = build_graph_from_edges(e, g.n_vertices, workdir, P=P)
    # share the tier's vertex table (same vids; needed for isolated-vertex
    # assembly and key joins)
    vlink = os.path.join(workdir, "vertices")
    if not os.path.exists(vlink):
        os.symlink(os.path.join(g.workdir, "vertices"), vlink)
    with open(marker, "w") as f:
        f.write("ok")
    return g2


# -- query wrappers (return small pandas results; see __ray_entry__) --------


def q_edge_extract(sf_dir: str):
    from ..stages.extract import extract_edges

    corpus = read_parquet_clean(corpus_path_for(sf_dir))
    return extract_edges(corpus).select_columns(["src_key", "dst_key"])


def q_vertices(sf_dir: str):
    return graph_for_sf(sf_dir).vertices_ds()


def q_degrees(sf_dir: str):
    """Out-degree per vertex (Degrees api / AdjacencyMatrix.degree:189-198).

    Block-partial counts folded on the driver under the broadcast cap
    (all-to-all fallback above it), then a broadcast lookup over the vertex
    table for the zero-degree fill."""
    from ..stages.joins import lookup_join, small_group_agg

    g = graph_for_sf(sf_dir)
    deg = small_group_agg(g.edges_ds(columns=["src"]), "src", None, "count", "out_deg")
    deg = (
        deg.rename(columns={"src": "vid"})
        if isinstance(deg, pd.DataFrame)
        else deg.rename_columns({"src": "vid"})
    )
    verts = g.vertices_ds().select_columns(["vid"])
    return lookup_join(verts, deg, "vid", "out_deg", default=0, num_partitions=max(1, g.P))


def q_degree_histogram(sf_dir: str):
    """Log2-bucketed out-degree distribution {bucket, n_vertices} — the
    standard first diagnostic of a link graph's skew (bucket = floor(log2(
    deg)) for deg >= 1, -1 for isolated vertices).  Buckets are O(log V), so
    the partial histogram folds block-locally and the shuffle carries a few
    dozen rows per block."""
    import numpy as np
    import pyarrow as pa

    g = graph_for_sf(sf_dir)
    deg = q_degrees(sf_dir)  # {vid, out_deg} Dataset

    def partial(t: pa.Table) -> pa.Table:
        d = t["out_deg"].to_numpy()
        b = np.where(d >= 1, np.floor(np.log2(np.maximum(d, 1))), -1).astype(np.int64)
        vals, counts = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(vals), "n": pa.array(counts.astype(np.int64))})

    from ..stages.agg import bucketed_agg

    out = bucketed_agg(deg.map_batches(partial, batch_format="pyarrow"), "bucket", {"n_vertices": ("n", "sum")})
    return out.to_pandas().sort_values("bucket").reset_index(drop=True)


PAGERANK_ORACLE_ITERS = 40  # fixed count shared with oracles.pagerank_sql


def q_pagerank(sf_dir: str) -> pd.DataFrame:
    """Fixed-iteration PageRank (reference runs fixed counts too,
    PageRank.java:160-164); scores quantized at 1e6 for the DuckDB oracle."""
    from .pagerank import pagerank

    g = graph_for_sf(sf_dir)
    res = pagerank(g, iterations=PAGERANK_ORACLE_ITERS)
    df = res.scores.to_pandas().sort_values("vid").reset_index(drop=True)
    df["score_u"] = np.floor(df["score"].to_numpy() * 1e6 + 0.5).astype("int64")
    return df[["vid", "score_u"]]


def _cc(sf_dir: str):
    from .components import connected_components

    g = graph_for_sf(sf_dir)
    return _memo_get(("cc", sf_dir), lambda: connected_components(g))


def q_connected_components(sf_dir: str) -> pd.DataFrame:
    return _cc(sf_dir).labels.to_pandas().sort_values("vid").reset_index(drop=True)


def q_cc_set_sizes(sf_dir: str) -> pd.DataFrame:
    from ..stages.joins import small_group_agg

    r = small_group_agg(_cc(sf_dir).labels, "label", None, "count", "size")
    df = r if isinstance(r, pd.DataFrame) else r.to_pandas()
    return df.sort_values("label").reset_index(drop=True)


def q_label_propagation(sf_dir: str) -> pd.DataFrame:
    from .labelprop import label_propagation

    g = graph_for_sf(sf_dir)
    res = label_propagation(g, direction="BOTH", max_iterations=20)
    return res.labels.to_pandas().sort_values("vid").reset_index(drop=True)


def q_label_propagation_weighted(sf_dir: str) -> pd.DataFrame:
    """Weighted LP votes: ``relWeight(u,t) * nodeWeight(t)`` with the
    synthetic integer rel weights (``LabelPropagation.java:280-289``)."""
    from .labelprop import label_propagation

    g = weighted_graph_for_sf(sf_dir)
    res = label_propagation(g, direction="BOTH", max_iterations=20)
    return res.labels.to_pandas().sort_values("vid").reset_index(drop=True)


def q_cc_threshold(sf_dir: str) -> pd.DataFrame:
    """unionFind with a weight threshold (``GraphUnionFind.java:82-99``,
    ``UnionFindProcExec.java:161``): union only edges with weight >= 3."""
    from .components import connected_components

    g = weighted_graph_for_sf(sf_dir)
    res = connected_components(g, threshold=3.0)
    return res.labels.to_pandas().sort_values("vid").reset_index(drop=True)


def _tri(sf_dir: str):
    from .triangles import triangle_count

    g = graph_for_sf(sf_dir)
    return _memo_get(("tri", sf_dir), lambda: triangle_count(g))


def q_triangle_counts(sf_dir: str) -> pd.DataFrame:
    return _tri(sf_dir).counts.to_pandas().sort_values("vid").reset_index(drop=True)


def q_triangle_global(sf_dir: str) -> pd.DataFrame:
    return pd.DataFrame({"triangle_count": [_tri(sf_dir).triangle_count]})


def q_clustering_coefficients(sf_dir: str) -> pd.DataFrame:
    return (
        _tri(sf_dir)
        .coefficients.select_columns(["vid", "coefficient"])
        .to_pandas()
        .sort_values("vid")
        .reset_index(drop=True)
    )


def q_sssp(sf_dir: str) -> pd.DataFrame:
    """Unweighted shortest paths from vid 0 (finite distances only)."""
    from .centrality import shortest_paths

    g = graph_for_sf(sf_dir)
    df = shortest_paths(g, source=0).distances.to_pandas()
    df = df[np.isfinite(df["distance"])].copy()
    df["distance"] = df["distance"].astype("int64")
    return df.sort_values("vid").reset_index(drop=True)


def q_sssp_delta(sf_dir: str) -> pd.DataFrame:
    """Bucketed delta-stepping SSSP from vid 0 (finite distances only).

    ``algo.shortestPath.deltaStepping`` (``ShortestPathDeltaSteppingProc.java:72``).
    Unit edge weights + delta=2.0 -> two BFS levels per bucket; distances
    equal the plain SSSP fixpoint, so the sssp SQL oracle applies."""
    from .centrality import shortest_paths_delta_stepping

    g = graph_for_sf(sf_dir)
    df = shortest_paths_delta_stepping(g, source=0, delta=2.0).distances.to_pandas()
    df = df[np.isfinite(df["distance"])].copy()
    df["distance"] = df["distance"].astype("int64")
    return df.sort_values("vid").reset_index(drop=True)


def _quantize_centrality(res) -> pd.DataFrame:
    df = res.scores.to_pandas().sort_values("vid").reset_index(drop=True)
    df["cent_u"] = np.floor(df["centrality"].to_numpy() * 1e6 + 0.5).astype("int64")
    return df[["vid", "cent_u"]]


def q_harmonic(sf_dir: str) -> pd.DataFrame:
    """Exact harmonic centrality, BOTH directions (HarmonicCentralityProc)."""
    from .centrality import harmonic_centrality

    g = graph_for_sf(sf_dir)
    return _quantize_centrality(harmonic_centrality(g, direction="BOTH"))


def q_closeness(sf_dir: str) -> pd.DataFrame:
    """Exact closeness, OUTGOING (ClosenessCentralityProc.java:73)."""
    from .centrality import closeness_centrality

    g = graph_for_sf(sf_dir)
    return _quantize_centrality(closeness_centrality(g, direction="OUTGOING"))


def q_mscoloring(sf_dir: str) -> pd.DataFrame:
    """Max-vid component colors (MSColoringProc.java:53); reuses the
    memoized CC labels."""
    from .components import mscoloring

    g = graph_for_sf(sf_dir)
    return mscoloring(g, cc=_cc(sf_dir)).to_pandas().sort_values("vid").reset_index(drop=True)


def q_all_shortest_paths(sf_dir: str) -> pd.DataFrame:
    """(source, target, distance) stream from the first 64 sources
    (AllShortestPathsProc.java:59 streams all pairs; sampled here)."""
    from .centrality import all_shortest_paths

    g = graph_for_sf(sf_dir)
    df = all_shortest_paths(g, direction="OUTGOING", n_sources=64).to_pandas()
    return df.sort_values(["source", "target"]).reset_index(drop=True)


def q_scc(sf_dir: str) -> pd.DataFrame:
    """Strongly connected components, min-vid canonical labels."""
    from .scc import strongly_connected_components

    g = graph_for_sf(sf_dir)
    res = _memo_get(("scc", sf_dir), lambda: strongly_connected_components(g))
    return res.labels.to_pandas().sort_values("vid").reset_index(drop=True)


def q_louvain(sf_dir: str) -> pd.DataFrame:
    """Louvain communities — deterministic red/black sweep, verified against
    the unrolled-CTE oracle (oracles.louvain_sql, same 10-iteration budget;
    a converged state is a fixpoint so early convergence still matches)."""
    from .louvain import louvain

    g = graph_for_sf(sf_dir)
    res = louvain(g, max_iterations=10)
    return res.communities.to_pandas().sort_values("vid").reset_index(drop=True)


def q_louvain_weighted(sf_dir: str) -> pd.DataFrame:
    """Weighted Louvain (``WeightedLouvain.java:88-124``): weighted degrees /
    weight-into-community gains over the synthetic integer edge weights."""
    from .louvain import louvain

    g = weighted_graph_for_sf(sf_dir)
    res = louvain(g, weighted=True, max_iterations=10)
    return res.communities.to_pandas().sort_values("vid").reset_index(drop=True)


def q_betweenness(sf_dir: str) -> pd.DataFrame:
    """Exact Brandes betweenness over OUTGOING edges, 1e6-quantized."""
    from .betweenness import betweenness_centrality

    g = graph_for_sf(sf_dir)
    res = betweenness_centrality(g, direction="OUTGOING")
    return _quantize_centrality(res)


def q_betweenness_sampled(sf_dir: str) -> pd.DataFrame:
    """RA-Brandes sampled betweenness (64 seeded-random sources, scaled by
    n/64 — RABrandesBetweennessCentrality.java:177); 1e6-quantized."""
    from .betweenness import betweenness_centrality

    g = graph_for_sf(sf_dir)
    res = betweenness_centrality(g, direction="OUTGOING", sample_sources=64)
    return _quantize_centrality(res)


def q_triangle_stream(sf_dir: str) -> pd.DataFrame:
    """The enumerated triangle triples (algo.triangle.stream,
    TriangleProc.java:58 / TriangleStream.java:145-151)."""
    return (
        _tri(sf_dir)
        .triangles.to_pandas()
        .sort_values(["a", "b", "c"])
        .reset_index(drop=True)
    )


def q_shortest_path(sf_dir: str) -> pd.DataFrame:
    """Single-pair shortest path (vid 0 -> farthest reachable), path rows."""
    from .paths import shortest_path

    g = graph_for_sf(sf_dir)
    res = shortest_path(g, source=0, target=None)
    return res.path


def q_mst(sf_dir: str) -> pd.DataFrame:
    """Per-component spanning-forest summary {label, n_edges, weight_u}."""
    from .mst import mst_summary

    g = graph_for_sf(sf_dir)
    return mst_summary(g, cc_labels=_cc(sf_dir).labels)


# -- merged (variant-tagged) driver queries ---------------------------------
# The driver records CORRECTNESS rows for at most 50 queries() entries per
# round (r02: exactly the first 50 of 60 in insertion order got rows).  To
# keep EVERY operator driver-checked in a single run, algorithm variants that
# share a schema are merged into one query with a tag column; the oracle is
# the UNION ALL of the per-variant SQL.  The untagged single-variant
# functions above remain the library API.


def q_sssp_merged(sf_dir: str) -> pd.DataFrame:
    """Dijkstra-BFS and delta-stepping SSSP, tagged ``algo`` — same fixpoint,
    two kernels (ShortestPathProc / ShortestPathDeltaSteppingProc.java:72)."""
    a = q_sssp(sf_dir).assign(algo="dijkstra")
    b = q_sssp_delta(sf_dir).assign(algo="delta")
    return pd.concat([a, b], ignore_index=True)


def q_label_propagation_merged(sf_dir: str) -> pd.DataFrame:
    """Uniform and weighted LP (LabelPropagation.java:280-289), tagged
    ``variant``."""
    a = q_label_propagation(sf_dir).assign(variant="uniform")
    b = q_label_propagation_weighted(sf_dir).assign(variant="weighted")
    return pd.concat([a, b], ignore_index=True)


def q_louvain_merged(sf_dir: str) -> pd.DataFrame:
    """Unweighted and weighted Louvain (WeightedLouvain.java:88-124), tagged
    ``variant``."""
    a = q_louvain(sf_dir).assign(variant="uniform")
    b = q_louvain_weighted(sf_dir).assign(variant="weighted")
    return pd.concat([a, b], ignore_index=True)


def q_closeness_harmonic(sf_dir: str) -> pd.DataFrame:
    """Exact closeness (OUTGOING) and harmonic (BOTH) centralities, tagged
    ``metric`` — both are MS-BFS farness aggregations."""
    a = q_closeness(sf_dir).assign(metric="closeness")
    b = q_harmonic(sf_dir).assign(metric="harmonic")
    return pd.concat([a, b], ignore_index=True)


def q_betweenness_sampled_merged(sf_dir: str) -> pd.DataFrame:
    """RA-Brandes with BOTH source-selection strategies, tagged ``strategy``:
    ``uniform`` (RandomSelectionStrategy) and ``degree`` (per-node Bernoulli
    with p = deg/maxDeg, RandomDegreeSelectionStrategy.java:49-62)."""
    from .betweenness import betweenness_centrality
    from .centrality import graph_out_degrees, pick_sources_degree

    a = q_betweenness_sampled(sf_dir).assign(strategy="uniform")

    g = graph_for_sf(sf_dir)
    srcs = pick_sources_degree(graph_out_degrees(g), seed=7)
    res = betweenness_centrality(g, direction="OUTGOING", sources=srcs)
    b = _quantize_centrality(res).assign(strategy="degree")
    return pd.concat([a, b], ignore_index=True)


def q_triangle_counts_with_global(sf_dir: str) -> pd.DataFrame:
    """Per-vertex triangle counts plus the global total as a ``vid = -1``
    row (algo.triangleCount's summary value)."""
    t = _tri(sf_dir)
    df = t.counts.to_pandas().sort_values("vid").reset_index(drop=True)
    return pd.concat(
        [df, pd.DataFrame({"vid": [-1], "triangles": [int(t.triangle_count)]})],
        ignore_index=True,
    )


def q_sha256_invariance(sf_dir: str):
    """Corpus rows routed through a map_batches pass-through; per-row sha256
    must equal the oracle's (FIXTURES.md §10.1)."""
    import hashlib

    import pyarrow as pa

    corpus = read_parquet_clean(corpus_path_for(sf_dir))

    def sha(t: pa.Table) -> pa.Table:
        hs = [hashlib.sha256(c.encode("utf-8")).hexdigest() for c in t["content"].to_pylist()]
        return pa.table(
            {
                "key": pa.compute.binary_join_element_wise(t["repo"], t["path"], "/"),
                "sha": pa.array(hs),
            }
        )

    return corpus.map_batches(sha, batch_format="pyarrow")
