"""Round-2 algorithm families: Louvain, betweenness (Brandes), SCC, MST,
single-pair shortest path, all-shortest-paths, MSColoring — reference
fixtures + independent NumPy oracles."""

import numpy as np
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray.pipelines.betweenness import betweenness_centrality
from neo4j_graph_algorithms_ray.pipelines.components import mscoloring
from neo4j_graph_algorithms_ray.pipelines.graph_build import build_graph
from neo4j_graph_algorithms_ray.pipelines.louvain import louvain
from neo4j_graph_algorithms_ray.pipelines.mst import minimum_spanning_forest
from neo4j_graph_algorithms_ray.pipelines.paths import shortest_path
from neo4j_graph_algorithms_ray.pipelines.scc import strongly_connected_components
from neo4j_graph_algorithms_ray.sources.corpus import fixture_corpus, powerlaw_corpus_table


def _graph(name, tmp_workdir, P=2):
    corpus, _ = fixture_corpus(name)
    return build_graph(rd.from_arrow(corpus), tmp_workdir, P=P)


# ---------------------------------------------------------------------------
# Louvain — LouvainClusteringIntegrationTest: communityCount == 3
# ---------------------------------------------------------------------------


def test_louvain_fixture_three_communities(tmp_workdir):
    g = _graph("louvain", tmp_workdir)
    res = louvain(g)
    assert res.community_count == 3
    df = res.communities.to_pandas().sort_values("vid")
    comm = df["community"].to_numpy()
    # the two 4-cliques {a,b,c,d}=vids 0-3 and {e,f,g,h}=vids 4-7 are intact,
    # the isolate z (vid 8) is alone
    assert len(set(comm[0:4])) == 1
    assert len(set(comm[4:8])) == 1
    assert comm[0] != comm[4] and comm[8] not in (comm[0], comm[4])


def test_louvain_weighted_heavy_bridge(tmp_workdir):
    """WeightedLouvain semantics (WeightedLouvain.java:88-124): a heavy
    bridge edge overrides clique topology; unit weights must reproduce the
    unweighted kernel exactly."""
    import itertools

    import pyarrow as pa

    from neo4j_graph_algorithms_ray.pipelines.graph_build import build_graph_from_edges

    edges = []
    for base in (0, 4):  # two 4-cliques
        for a, b in itertools.combinations(range(base, base + 4), 2):
            edges.append((a, b, 1.0))
    edges.append((3, 4, 50.0))  # heavy bridge
    tbl = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
            "weight": pa.array([e[2] for e in edges], pa.float64()),
        }
    )
    g = build_graph_from_edges(rd.from_arrow(tbl), 8, tmp_workdir, P=2)
    unw = louvain(g).communities.to_pandas().sort_values("vid")["community"].to_numpy()
    w = louvain(g, weighted=True).communities.to_pandas().sort_values("vid")["community"].to_numpy()
    assert unw[3] != unw[4]  # unweighted: bridge is just one edge of six
    assert w[3] == w[4]  # weighted: the 50x bridge dominates both gains

    # unit weights == unweighted kernel, element for element
    ones = tbl.set_column(2, "weight", pa.array([1.0] * len(edges), pa.float64()))
    g1 = build_graph_from_edges(rd.from_arrow(ones), 8, tmp_workdir + "/u1", P=2)
    a = louvain(g1).communities.to_pandas().sort_values("vid")["community"].to_numpy()
    b = louvain(g1, weighted=True).communities.to_pandas().sort_values("vid")["community"].to_numpy()
    np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# Betweenness — BetweennessCentralityIntegrationTest ring fixture
# ---------------------------------------------------------------------------


def test_betweenness_rings_directed(tmp_workdir):
    g = _graph("bc-rings", tmp_workdir, P=3)
    res = betweenness_centrality(g, direction="OUTGOING")
    c = res.scores.to_pandas().sort_values("vid")["centrality"].to_numpy()
    # vids: 0-4 ring A, 5 center, 6-10 ring B
    np.testing.assert_allclose(c[5], 25.0, atol=1e-9)
    np.testing.assert_allclose(np.delete(c, 5), np.full(10, 6.0), atol=1e-9)


def test_betweenness_rings_undirected(tmp_workdir):
    g = _graph("bc-rings", tmp_workdir, P=3)
    res = betweenness_centrality(g, direction="BOTH")
    c = res.scores.to_pandas().sort_values("vid")["centrality"].to_numpy()
    # proc fixture with direction '<>': sum 35, max 30 (center), min 0.5
    np.testing.assert_allclose(c.sum(), 35.0, atol=1e-9)
    np.testing.assert_allclose(c.max(), 30.0, atol=1e-9)
    np.testing.assert_allclose(c.min(), 0.5, atol=1e-9)


def _brandes_oracle(n, src, dst):
    """Plain NumPy/BFS Brandes (directed, unweighted)."""
    from collections import deque

    adj = [[] for _ in range(n)]
    for a, b in zip(src, dst):
        adj[a].append(b)
    cent = np.zeros(n)
    for s in range(n):
        dist = np.full(n, -1)
        sigma = np.zeros(n)
        dist[s], sigma[s] = 0, 1
        order, q = [], deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = np.zeros(n)
        for v in reversed(order):
            for w in adj[v]:
                if dist[w] == dist[v] + 1:
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if v != s:
                cent[v] += delta[v]
    return cent


@pytest.mark.parametrize("P", [1, 4])
def test_betweenness_matches_numpy_oracle(tmp_workdir, P):
    corpus = powerlaw_corpus_table(n_files=90, n_repos=3, avg_out=4.0, seed=23)
    g = build_graph(rd.from_arrow(corpus), tmp_workdir + f"/p{P}", P=P)
    res = betweenness_centrality(g, direction="OUTGOING")
    got = res.scores.to_pandas().sort_values("vid")["centrality"].to_numpy()
    e = g.edges_ds().to_pandas()
    want = _brandes_oracle(g.n_vertices, e["src"].to_numpy(), e["dst"].to_numpy())
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_betweenness_sampled_scales(tmp_workdir):
    corpus = powerlaw_corpus_table(n_files=90, n_repos=3, avg_out=4.0, seed=23)
    g = build_graph(rd.from_arrow(corpus), tmp_workdir, P=2)
    res = betweenness_centrality(g, direction="OUTGOING", sample_sources=30)
    assert res.metrics["sources"] == 30
    got = res.scores.to_pandas()["centrality"].to_numpy()
    assert (got >= 0).all() and got.sum() > 0


# ---------------------------------------------------------------------------
# SCC — StronglyConnectedComponentsProcIntegrationTest fixture + oracle
# ---------------------------------------------------------------------------


def test_scc_fixture(tmp_workdir):
    g = _graph("scc1", tmp_workdir)
    res = strongly_connected_components(g)
    df = res.labels.to_pandas().sort_values("vid")
    lab = df["label"].to_numpy()
    # {a,b,c}=vids 0-2 one SCC, {d,e}=vids 3-4 another; min-vid labels
    np.testing.assert_array_equal(lab, [0, 0, 0, 3, 3])
    assert res.set_count() == 2
    sizes = sorted(res.set_sizes().to_pandas()["size"])
    assert sizes == [2, 3]


def _scc_oracle(n, src, dst):
    """Iterative Tarjan (NumPy-free reference), min-vid labels."""
    import sys

    adj = [[] for _ in range(n)]
    for a, b in zip(src, dst):
        adj[a].append(b)
    index = [-1] * n
    low = [0] * n
    on = [False] * n
    stack = []
    comp = [-1] * n
    counter = [0]
    labels = {}
    for root in range(n):
        if index[root] >= 0:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on[v] = True
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if index[w] < 0:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif on[w]:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                grp = []
                while True:
                    w = stack.pop()
                    on[w] = False
                    grp.append(w)
                    if w == v:
                        break
                m = min(grp)
                for w in grp:
                    comp[w] = m
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
    return np.array(comp)


@pytest.mark.parametrize("P", [1, 3])
def test_scc_matches_tarjan_oracle(tmp_workdir, P):
    corpus = powerlaw_corpus_table(n_files=150, n_repos=5, avg_out=4.0, seed=31)
    g = build_graph(rd.from_arrow(corpus), tmp_workdir + f"/p{P}", P=P)
    res = strongly_connected_components(g)
    got = res.labels.to_pandas().sort_values("vid")["label"].to_numpy()
    e = g.edges_ds().to_pandas()
    want = _scc_oracle(g.n_vertices, e["src"].to_numpy(), e["dst"].to_numpy())
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# MST — MSTPrimProcIntegrationTest fixture + Kruskal oracle
# ---------------------------------------------------------------------------


def test_mst_fixture(tmp_workdir):
    g = _graph("mst1", tmp_workdir)
    res = minimum_spanning_forest(g)
    assert res.relationship_count == 4
    np.testing.assert_allclose(res.weight_sum, 12.0)
    np.testing.assert_allclose(res.weight_min, 1.0)
    np.testing.assert_allclose(res.weight_max, 5.0)


def test_mst_matches_kruskal_oracle(tmp_workdir):
    corpus, _ = fixture_corpus("uf1")  # weighted chains
    g = build_graph(rd.from_arrow(corpus), tmp_workdir, P=2)
    res = minimum_spanning_forest(g)
    # Kruskal with (w, u, v) tie order
    e = g.edges_ds().to_pandas()
    u = np.minimum(e["src"], e["dst"]).to_numpy()
    v = np.maximum(e["src"], e["dst"]).to_numpy()
    w = e["weight"].to_numpy()
    order = np.lexsort((v, u, w))
    parent = list(range(g.n_vertices))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    total = 0.0
    cnt = 0
    for i in order:
        ru, rv = find(int(u[i])), find(int(v[i]))
        if ru != rv:
            parent[ru] = rv
            total += w[i]
            cnt += 1
    np.testing.assert_allclose(res.weight_sum, total)
    assert res.relationship_count == cnt


# ---------------------------------------------------------------------------
# single-pair shortest path — ShortestPathIntegrationTest fixture
# ---------------------------------------------------------------------------


def test_shortest_path_weighted_fixture(tmp_workdir):
    g = _graph("sp1", tmp_workdir)
    # vids: nA=0 nB=1 nC=2 nD=3 nX=4
    res = shortest_path(g, source=0, target=4, weighted=True)
    np.testing.assert_allclose(res.total_cost, 3.0)
    assert res.node_count == 4
    np.testing.assert_array_equal(res.path["vid"].to_numpy(), [0, 2, 3, 4])
    np.testing.assert_array_equal(res.path["cost_u"].to_numpy(), [0, 1000, 2000, 3000])


def test_shortest_path_unreachable(tmp_workdir):
    g = _graph("uf1", tmp_workdir)  # J (vid 9) unreachable from A (vid 0)
    res = shortest_path(g, source=0, target=9)
    assert res.node_count == 0
    assert np.isinf(res.total_cost)


# ---------------------------------------------------------------------------
# MSColoring — max-vid component colors
# ---------------------------------------------------------------------------


def test_mscoloring_line_fixture(tmp_workdir):
    corpus, _ = fixture_corpus("uf-lines")  # 16 disjoint 10-node lines
    g = build_graph(rd.from_arrow(corpus), tmp_workdir, P=3)
    df = mscoloring(g).to_pandas().sort_values("vid")
    colors = df["color"].to_numpy()
    want = np.repeat(np.arange(16) * 10 + 9, 10)  # max vid of each line
    np.testing.assert_array_equal(colors, want)


def test_mst_dataset_mode_matches(tmp_workdir):
    g = _graph("mst1", tmp_workdir)
    res = minimum_spanning_forest(g, mode="dataset")
    assert res.relationship_count == 4
    np.testing.assert_allclose(res.weight_sum, 12.0)


# ---------------------------------------------------------------------------
# checkpoint / resume for the round-2 iterative algorithms
# ---------------------------------------------------------------------------


def test_louvain_checkpoint_resume(tmp_workdir, tmp_path):
    g = _graph("louvain", tmp_workdir)
    full = louvain(g, max_iterations=10)
    # phase 1: stop after 1 iteration (checkpointed)
    ck = str(tmp_path / "ck")
    part1 = louvain(g, max_iterations=1, checkpoint_dir=ck)
    assert part1.iterations == 1
    # phase 2: resume and run to convergence — identical communities
    part2 = louvain(g, max_iterations=10, checkpoint_dir=ck, resume=True)
    a = full.communities.to_pandas().sort_values("vid")["community"].to_numpy()
    b = part2.communities.to_pandas().sort_values("vid")["community"].to_numpy()
    np.testing.assert_array_equal(a, b)


def test_betweenness_checkpoint_resume(tmp_workdir, tmp_path):
    corpus = powerlaw_corpus_table(n_files=90, n_repos=3, avg_out=4.0, seed=23)
    g = build_graph(rd.from_arrow(corpus), tmp_workdir, P=2)
    full = betweenness_centrality(g, direction="OUTGOING", source_batch=32)
    ck = str(tmp_path / "ck")
    # phase 1: first batch only (simulated interrupt after batch 0)
    from neo4j_graph_algorithms_ray.pipelines.centrality import pick_sources
    from neo4j_graph_algorithms_ray.state.checkpoint import CheckpointManager

    r1 = betweenness_centrality(
        g, direction="OUTGOING", source_batch=32, max_batches=1, checkpoint_dir=ck
    )
    # phase 2: resume with the full source set — batches 1.. complete the sum
    r2 = betweenness_centrality(
        g, direction="OUTGOING", source_batch=32, checkpoint_dir=ck, resume=True
    )
    a = full.scores.to_pandas().sort_values("vid")["centrality"].to_numpy()
    b = r2.scores.to_pandas().sort_values("vid")["centrality"].to_numpy()
    np.testing.assert_allclose(a, b, atol=1e-9)


def test_resume_rejects_other_graph_checkpoint(tmp_workdir, tmp_path):
    g = _graph("louvain", tmp_workdir)
    ck = str(tmp_path / "ck")
    louvain(g, max_iterations=1, checkpoint_dir=ck)
    g2 = _graph("scc1", tmp_workdir + "/other", P=3)
    with pytest.raises(ValueError, match="bounds"):
        louvain(g2, max_iterations=2, checkpoint_dir=ck, resume=True)


def test_betweenness_cancellation_leaves_resumable_checkpoint(tmp_workdir, tmp_path):
    """Cancelling a checkpointed exact-betweenness run between source batches
    raises TerminatedError, kills the pools, and resume=True finishes with
    scores identical to the uninterrupted run."""
    from neo4j_graph_algorithms_ray.state.checkpoint import CheckpointManager
    from neo4j_graph_algorithms_ray.state.termination import (
        TerminatedError,
        TerminationFlag,
    )

    g = _graph("bc-rings", tmp_workdir, P=3)
    full = betweenness_centrality(g, direction="OUTGOING", source_batch=4)
    ck = str(tmp_path / "ck")
    with pytest.raises(TerminatedError):
        betweenness_centrality(
            g,
            direction="OUTGOING",
            source_batch=4,
            checkpoint_dir=ck,
            termination=TerminationFlag(auto_after_checks=1),
        )
    m = CheckpointManager(ck, "betweenness").latest()
    assert m is not None  # at least one batch committed before the cancel
    res = betweenness_centrality(
        g, direction="OUTGOING", source_batch=4, checkpoint_dir=ck, resume=True
    )
    a = full.scores.to_pandas().sort_values("vid")["centrality"].to_numpy()
    b = res.scores.to_pandas().sort_values("vid")["centrality"].to_numpy()
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)


def test_betweenness_empty_source_list(tmp_workdir):
    """An explicit empty source list (what strategy='degree' yields on an
    edgeless graph) returns all-zero scores instead of ZeroDivisionError
    (ADVICE r03)."""
    g = _graph("bc-rings", tmp_workdir, P=2)
    res = betweenness_centrality(g, sources=np.array([], dtype=np.int64))
    c = res.scores.to_pandas()["centrality"].to_numpy()
    assert len(c) == g.n_vertices and (c == 0).all()
