"""Union-find CC conformance: FIXTURES.md §3-4 (UnionFindProcIntegrationTest, UnionFindsTest)."""

import numpy as np
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray.pipelines.components import (
    connected_components,
    local_components,
)
from neo4j_graph_algorithms_ray.pipelines.graph_build import build_graph
from neo4j_graph_algorithms_ray.sources.corpus import fixture_corpus


def _sizes(res):
    df = res.set_sizes().to_pandas()
    return sorted(df["size"].tolist())


@pytest.fixture(scope="module")
def uf1_graph(tmp_path_factory):
    corpus, _ = fixture_corpus("uf1")
    return build_graph(rd.from_arrow(corpus), str(tmp_path_factory.mktemp("uf1")), P=3)


def test_uf1_no_threshold(uf1_graph):
    res = connected_components(uf1_graph)
    assert res.set_count() == 3
    assert _sizes(res) == [1, 2, 7]  # {A..G}, {H,I}, {J}


def test_uf1_threshold_5(uf1_graph):
    # bridge D->E has weight 4.2 < 5.0 -> cut (GraphUnionFind.java:89-93)
    res = connected_components(uf1_graph, threshold=5.0)
    assert res.set_count() == 4
    assert _sizes(res) == [1, 2, 3, 4]


def test_uf1_threshold_314(uf1_graph):
    res = connected_components(uf1_graph, threshold=3.14)
    assert res.set_count() == 3
    assert _sizes(res) == [1, 2, 7]


def test_uf1_comembership(uf1_graph):
    """Partition equality, not label equality (reference roots are order-dependent)."""
    res = connected_components(uf1_graph)
    vt = uf1_graph.vertices_ds().to_pandas()
    name = {v: k.split("/")[-1][:-3] for k, v in zip(vt["key"], vt["vid"])}
    lab = {name[v]: l for v, l in res.labels.to_pandas().itertuples(index=False)}
    comp = {}
    for n, l in lab.items():
        comp.setdefault(l, set()).add(n)
    groups = sorted(tuple(sorted(g)) for g in comp.values())
    assert groups == [
        tuple("ABCDEFG"),
        ("H", "I"),
        ("J",),
    ]
    # canonical label = min vid in component
    for l, members in comp.items():
        vids = [v for v, nm in name.items() if nm in members]
        assert l == min(vids)


def test_uf_lines_16_components(tmp_workdir):
    corpus, _ = fixture_corpus("uf-lines")
    g = build_graph(rd.from_arrow(corpus), tmp_workdir, P=4)
    assert g.n_vertices == 160 and g.n_edges == 144
    res = connected_components(g)
    assert res.set_count() == 16
    assert _sizes(res) == [10] * 16


def test_local_components_kernel():
    # two triangles + isolated pair, global min labels
    src = np.array([5, 6, 7, 1, 2, 3, 9])
    dst = np.array([6, 7, 5, 2, 3, 1, 8])
    verts, roots = local_components(src, dst)
    assert verts.tolist() == [1, 2, 3, 5, 6, 7, 8, 9]
    assert roots.tolist() == [1, 1, 1, 5, 5, 5, 8, 8]


def test_star_contraction_matches_treereduce(tmp_workdir):
    """Kiveris alternating large-star/small-star rounds give identical
    min-vid labels to the tree-reduce contraction."""
    import ray.data as rd

    from neo4j_graph_algorithms_ray.pipelines.components import connected_components
    from neo4j_graph_algorithms_ray.pipelines.graph_build import build_graph
    from neo4j_graph_algorithms_ray.sources.corpus import powerlaw_corpus_table

    corpus = powerlaw_corpus_table(n_files=200, n_repos=6, avg_out=4.0, seed=17)
    g = build_graph(rd.from_arrow(corpus), tmp_workdir, P=3)
    a = (
        connected_components(g)
        .labels.to_pandas()
        .sort_values("vid")["label"]
        .to_numpy()
    )
    b = (
        connected_components(g, mode="starcontract")
        .labels.to_pandas()
        .sort_values("vid")["label"]
        .to_numpy()
    )
    import numpy as np

    np.testing.assert_array_equal(a, b)


def test_auto_mode_picks_starcontract_above_ceiling(uf1_graph, monkeypatch):
    """mode='auto' (default) must switch to star-contraction when the vertex
    count exceeds the tree-reduce per-task ceiling — and both modes agree."""
    import neo4j_graph_algorithms_ray.pipelines.components as C

    r_tree = connected_components(uf1_graph, mode="treereduce")
    monkeypatch.setattr(C, "TREEREDUCE_MAX_V", 5)  # uf1 has 10 vertices
    r_auto = connected_components(uf1_graph)  # default mode='auto'
    assert r_auto.metrics["mode"] == "starcontract"
    a = r_tree.labels.to_pandas().sort_values("vid")["label"].to_numpy()
    b = r_auto.labels.to_pandas().sort_values("vid")["label"].to_numpy()
    np.testing.assert_array_equal(a, b)
