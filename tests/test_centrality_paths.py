"""MS-BFS centrality + SSSP tests (NumPy BFS oracles)."""

import numpy as np
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray.pipelines.centrality import (
    closeness_centrality,
    harmonic_centrality,
    shortest_paths,
)
from neo4j_graph_algorithms_ray.pipelines.graph_build import build_graph
from neo4j_graph_algorithms_ray.sources.corpus import fixture_corpus, powerlaw_corpus_table


def _bfs_dists(n, src_arr, dst_arr, s, undirected):
    adj = {}
    for a, b in zip(src_arr, dst_arr):
        adj.setdefault(a, []).append(b)
        if undirected:
            adj.setdefault(b, []).append(a)
    dist = np.full(n, np.inf)
    dist[s] = 0
    frontier = [s]
    d = 0
    while frontier:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj.get(u, []):
                if dist[v] == np.inf:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    return dist


@pytest.fixture(scope="module")
def line_graph(tmp_path_factory):
    corpus, _ = fixture_corpus("uf-lines")  # 16 disjoint 10-node lines
    return build_graph(rd.from_arrow(corpus), str(tmp_path_factory.mktemp("lines")), P=3)


def test_sssp_unweighted_line(line_graph):
    res = shortest_paths(line_graph, source=0)
    df = res.distances.to_pandas().sort_values("vid")
    d = df["distance"].to_numpy()
    # first line graph: vids 0..9 at distances 0..9; other components inf
    assert np.array_equal(d[:10], np.arange(10, dtype=float))
    assert np.isinf(d[10:]).all()


def test_sssp_weighted(tmp_workdir):
    corpus, _ = fixture_corpus("uf1")  # weighted chain A..G, H-I, J
    g = build_graph(rd.from_arrow(corpus), tmp_workdir, P=2)
    res = shortest_paths(g, source=0, weighted=True)
    df = res.distances.to_pandas().sort_values("vid")
    d = dict(zip(df["vid"], df["distance"]))
    # A->B->C->D = 30.0; D->E edge 4.2 -> A..E = 34.2
    assert d[1] == pytest.approx(10.0)
    assert d[3] == pytest.approx(30.0)
    assert d[4] == pytest.approx(34.2)
    assert np.isinf(d[9])  # J unreachable


@pytest.mark.parametrize("P", [1, 4])
def test_harmonic_matches_bfs_oracle(tmp_workdir, P):
    corpus = powerlaw_corpus_table(n_files=120, n_repos=4, avg_out=4.0, seed=11)
    g = build_graph(rd.from_arrow(corpus), tmp_workdir + f"/p{P}", P=P)
    res = harmonic_centrality(g, direction="BOTH")
    got = res.scores.to_pandas().sort_values("vid")["centrality"].to_numpy()
    df = g.edges_ds().to_pandas()
    n = g.n_vertices
    inv = np.zeros(n)
    for s in range(n):
        dist = _bfs_dists(n, df.src.to_numpy(), df.dst.to_numpy(), s, undirected=True)
        ok = np.isfinite(dist) & (dist > 0)
        inv[ok] += 1.0 / dist[ok]
    want = inv / (n - 1)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_closeness_line(line_graph):
    res = closeness_centrality(line_graph, direction="BOTH")
    df = res.scores.to_pandas().sort_values("vid")
    c = df["centrality"].to_numpy()
    n = line_graph.n_vertices  # 160
    # MSBFSCCAlgorithm.centrality: (nodeCount-1)/farness, component-blind.
    # 10-node path: end farness 45, middle (vid 4) farness 25.
    assert c[0] == pytest.approx((n - 1) / 45)
    assert c[4] == pytest.approx((n - 1) / 25)


# ---------------------------------------------------------------------------
# Delta-stepping (ShortestPathDeltaSteppingProcTest fixture)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("P,delta", [(1, 3.0), (3, 3.0), (3, 1.0), (3, 100.0)])
def test_delta_stepping_fixture(tmp_workdir, P, delta):
    from neo4j_graph_algorithms_ray.pipelines.centrality import shortest_paths_delta_stepping

    corpus, _ = fixture_corpus("ds1")
    g = build_graph(rd.from_arrow(corpus), tmp_workdir + f"/p{P}d{delta}", P=P)
    # vids by sorted key: a..i = 0..8, s = 9, x = 10
    res = shortest_paths_delta_stepping(g, source=9, delta=delta)
    df = res.distances.to_pandas().sort_values("vid")
    got = df["distance"].to_numpy()
    want = np.array([5, 10, 15, 3, 6, 9, 2, 4, 6, 0, 8], dtype=float)
    np.testing.assert_allclose(got, want)


def test_delta_stepping_matches_sssp(tmp_workdir):
    from neo4j_graph_algorithms_ray.pipelines.centrality import shortest_paths_delta_stepping

    corpus = powerlaw_corpus_table(n_files=300, n_repos=6, avg_out=3.0, seed=7)
    g = build_graph(rd.from_arrow(corpus), tmp_workdir, P=4)
    base = shortest_paths(g, source=0, weighted=True).distances.to_pandas().sort_values("vid")
    ds = (
        shortest_paths_delta_stepping(g, source=0, delta=0.5)
        .distances.to_pandas()
        .sort_values("vid")
    )
    np.testing.assert_allclose(
        ds["distance"].to_numpy(), base["distance"].to_numpy(), rtol=0, atol=1e-12
    )
