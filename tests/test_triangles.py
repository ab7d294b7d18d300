"""Triangle counting conformance: FIXTURES.md §7-8 (TriangleProcTest, ClusteringCoefficientWikiTest)."""

import numpy as np
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray.pipelines.graph_build import build_graph
from neo4j_graph_algorithms_ray.pipelines.triangles import triangle_count
from neo4j_graph_algorithms_ray.sources.corpus import fixture_corpus


def _names(graph):
    vt = graph.vertices_ds().to_pandas()
    return {v: k.split("/")[-1][:-3] for k, v in zip(vt["key"], vt["vid"])}


@pytest.mark.parametrize("P", [1, 3])
def test_tri1(tmp_workdir, P):
    corpus, _ = fixture_corpus("tri1")
    g = build_graph(rd.from_arrow(corpus), tmp_workdir, P=P)
    res = triangle_count(g)
    assert res.triangle_count == 3  # abc, def, ghi (TriangleProcTest.java:139)
    assert res.node_count == 9
    cdf = res.counts.to_pandas()
    assert (cdf["triangles"] == 1).all()  # every node in exactly one triangle (:189)
    # triple stream yields exactly the three vertex sets (:219-222)
    name = _names(g)
    triples = {
        frozenset((name[a], name[b], name[c]))
        for a, b, c in res.triangles.to_pandas().itertuples(index=False)
    }
    assert triples == {frozenset("abc"), frozenset("def"), frozenset("ghi")}


def test_tri_wiki_coefficients(tmp_workdir):
    corpus, _ = fixture_corpus("tri-wiki")
    g = build_graph(rd.from_arrow(corpus), tmp_workdir, P=2)
    res = triangle_count(g)
    name = _names(g)
    coeff = {name[v]: c for v, c in res.coefficients.select_columns(["vid", "coefficient"]).to_pandas().itertuples(index=False)}
    assert coeff["a"] == pytest.approx(1 / 3, abs=1e-9)
    assert coeff["b"] == pytest.approx(1.0)
    assert coeff["c"] == pytest.approx(0.0)
    assert coeff["d"] == pytest.approx(1.0)
    assert res.average_coefficient == pytest.approx(0.5833333, abs=1e-6)
    assert res.triangle_count == 1


def test_duplicate_and_bidirectional_edges_deduped(tmp_workdir):
    """tri1 has c->a plus a->b b->c; undirected canonicalization must not
    double-count when both directions exist (b>c and c>b in pr1)."""
    corpus, _ = fixture_corpus("pr1")  # contains b->c AND c->b
    g = build_graph(rd.from_arrow(corpus), tmp_workdir, P=2)
    res = triangle_count(g)
    # pr1 graph: edges b-c, d-a, d-b, e-b, e-d, e-f, f-b, f-e -> triangles: b-e-f? b-f, f-e, e-b yes; d-e-a? no
    # undirected edge set: {bc, da, db, eb, ed, ef, fb, fe}
    # triangles: (b,e,f): eb, ef, fb all present -> 1; (b,d,e): db, ed, eb -> 1
    assert res.triangle_count == 2


def test_tri1_dataset_mode_and_join_orientation(tmp_workdir, monkeypatch):
    """The Dataset-shuffle counting path with the >5M-vertex join-orientation
    fallback gives identical results to the actor-exchange default."""
    from neo4j_graph_algorithms_ray.pipelines import triangles as T

    monkeypatch.setattr(T, "BROADCAST_MAX_V", 0)
    corpus, _ = fixture_corpus("tri1")
    g = build_graph(rd.from_arrow(corpus), tmp_workdir, P=2)
    res = T.triangle_count(g, mode="dataset")
    assert res.triangle_count == 3
    counts = res.counts.to_pandas().sort_values("vid")["triangles"].to_numpy()
    assert (counts == 1).all()


def test_triangle_cache_invalidated_on_workdir_reuse(tmp_workdir):
    """ADVICE r02: rebuilding a graph into a reused workdir must invalidate
    the edges_tri_raw cache — otherwise triangle_count trusts the stale
    _DONE marker and counts the OLD graph's triangles."""
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.pipelines.graph_build import build_graph_from_edges

    def etbl(edges):
        return pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
                "weight": pa.array([1.0] * len(edges), pa.float64()),
            }
        )

    tri = [(0, 1), (1, 2), (2, 0)]  # one triangle
    g1 = build_graph_from_edges(rd.from_arrow(etbl(tri)), 4, tmp_workdir, P=2)
    assert triangle_count(g1).triangle_count == 1
    line = [(0, 1), (1, 2), (2, 3)]  # no triangles, same workdir
    g2 = build_graph_from_edges(rd.from_arrow(etbl(line)), 4, tmp_workdir, P=2)
    assert triangle_count(g2).triangle_count == 0
