"""``algo.*`` proc facade — reference call-surface parity.

Checks that every proc returns the reference's exact YIELD column names
(``algo/.../results/*.java``) and that the stats/stream values agree with the
underlying pipelines on the reference fixtures."""

import math
import os

import numpy as np
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray.pipelines.graph_build import build_graph
from neo4j_graph_algorithms_ray.procs import algo
from neo4j_graph_algorithms_ray.sources.corpus import fixture_corpus


@pytest.fixture(scope="module")
def pr_graph(tmp_path_factory):
    corpus, _ = fixture_corpus("pr1")
    return build_graph(rd.from_arrow(corpus), str(tmp_path_factory.mktemp("prg")), P=2)


@pytest.fixture(scope="module")
def uf_graph(tmp_path_factory):
    corpus, _ = fixture_corpus("uf1")
    return build_graph(rd.from_arrow(corpus), str(tmp_path_factory.mktemp("ufg")), P=2)


def test_pagerank_stats_columns_and_write(pr_graph):
    stats = algo.pageRank(pr_graph, {"iterations": 20})
    assert list(stats.columns) == [
        "nodes", "iterations", "loadMillis", "computeMillis", "writeMillis",
        "dampingFactor", "write", "writeProperty",
    ]  # PageRankScore.Stats (PageRankScore.java:38-41)
    row = stats.iloc[0]
    assert row["iterations"] == 20 and row["dampingFactor"] == 0.85
    assert row["write"] and row["writeProperty"] == "pagerank"
    out = os.path.join(pr_graph.workdir, "write", "pagerank")
    back = rd.read_parquet(out)
    assert back.count() == pr_graph.n_vertices
    assert sorted(back.columns()) == ["nodeId", "score"]


def test_pagerank_stream_matches_pipeline(pr_graph):
    from neo4j_graph_algorithms_ray.pipelines.pagerank import pagerank

    got = algo.pageRank.stream(pr_graph, iterations=20).to_pandas().sort_values("nodeId")
    want = pagerank(pr_graph, iterations=20).scores.to_pandas().sort_values("vid")
    assert list(got.columns) == ["nodeId", "score"]
    np.testing.assert_allclose(got["score"].to_numpy(), want["score"].to_numpy(), atol=1e-12)


def test_pagerank_write_false_sentinel(pr_graph):
    stats = algo.pageRank(pr_graph, {"iterations": 5, "write": False})
    assert stats.iloc[0]["writeMillis"] == -1 and not stats.iloc[0]["write"]


def test_pagerank_from_raw_edge_table(pr_graph, tmp_path):
    # the Cypher-projection path: plain pyarrow edge table in, same scores out
    edges = pr_graph.edges_ds().to_arrow_refs()
    import pyarrow as pa
    import ray

    tbl = pa.concat_tables(ray.get(edges)).select(["src", "dst"])
    got = (
        algo.pageRank.stream(
            tbl,
            {
                "workdir": str(tmp_path),
                "concurrency": 2,
                "iterations": 20,
                "nodeCount": pr_graph.n_vertices,  # isolated vertices aren't in the edge table
            },
        )
        .to_pandas()
        .sort_values("nodeId")
    )
    want = algo.pageRank.stream(pr_graph, iterations=20).to_pandas().sort_values("nodeId")
    np.testing.assert_allclose(got["score"].to_numpy(), want["score"].to_numpy(), atol=1e-12)


def test_unionfind_stats_and_variants(uf_graph):
    stats = algo.unionFind(uf_graph, write=False)
    assert list(stats.columns) == [
        "loadMillis", "computeMillis", "postProcessingMillis", "writeMillis",
        "nodes", "setCount", "write", "partitionProperty",
    ]
    assert stats.iloc[0]["setCount"] == 3  # UnionFindProcIntegrationTest
    # scheduling-variant aliases dispatch to the same implementation AND
    # record which variant was requested in the stats row
    for proc, name in (
        (algo.unionFind.queue, "queue"),
        (algo.unionFind.forkJoin, "forkJoin"),
        (algo.unionFind.forkJoinMerge, "forkJoinMerge"),
    ):
        row = proc(uf_graph, write=False).iloc[0]
        assert row["setCount"] == 3 and row["variant"] == name
    stream = algo.unionFind.stream(uf_graph).to_pandas()
    assert sorted(stream.columns) == ["nodeId", "setId"]
    assert stream["setId"].nunique() == 3


def test_mscoloring_alias(uf_graph):
    stats = algo.unionFind.mscoloring(uf_graph, write=False)
    assert stats.iloc[0]["setCount"] == 3
    stream = algo.unionFind.mscoloring.stream(uf_graph).to_pandas()
    assert sorted(stream.columns) == ["color", "nodeId"]
    # MSColoring takes the max reachable id as the color (MSColoring.java:96-121)
    grp = stream.groupby("color")["nodeId"].max()
    assert (grp.index == grp.to_numpy()).all()


def test_labelpropagation_stats(uf_graph):
    stats = algo.labelPropagation(uf_graph, {"iterations": 10, "write": False})
    assert list(stats.columns) == [
        "nodes", "iterations", "didConverge", "loadMillis", "computeMillis",
        "writeMillis", "write", "weightProperty", "partitionProperty",
    ]  # LabelPropagationStats.java:23-25
    assert stats.iloc[0]["didConverge"]


def test_triangle_procs(tmp_path_factory):
    corpus, _ = fixture_corpus("tri1")
    g = build_graph(rd.from_arrow(corpus), str(tmp_path_factory.mktemp("tri")), P=2)
    stats = algo.triangleCount(g, write=False)
    assert list(stats.columns) == [
        "loadMillis", "computeMillis", "writeMillis", "nodeCount",
        "triangleCount", "averageClusteringCoefficient",
    ]  # TriangleProc.Result (TriangleProc.java:304-311)
    per_node = algo.triangleCount.stream(g).to_pandas()
    assert sorted(per_node.columns) == ["coefficient", "nodeId", "triangles"]
    assert per_node["triangles"].sum() == 3 * stats.iloc[0]["triangleCount"]
    triples = algo.triangle.stream(g).to_pandas()
    assert sorted(triples.columns) == ["nodeA", "nodeB", "nodeC"]
    assert len(triples) == stats.iloc[0]["triangleCount"]
    # forkJoin alias (TriangleProc.java:224,117): same counts, variant recorded
    fj = algo.triangleCount.forkJoin(g, write=False).iloc[0]
    assert fj["triangleCount"] == stats.iloc[0]["triangleCount"]
    assert fj["variant"] == "forkJoin"
    fj_stream = algo.triangleCount.forkJoin.stream(g).to_pandas().sort_values("nodeId")
    assert fj_stream["triangles"].tolist() == per_node.sort_values("nodeId")["triangles"].tolist()


def test_louvain_proc(tmp_path_factory):
    corpus, _ = fixture_corpus("louvain")
    g = build_graph(rd.from_arrow(corpus), str(tmp_path_factory.mktemp("lv")), P=2)
    stats = algo.louvain(g, write=False)
    assert list(stats.columns) == [
        "loadMillis", "computeMillis", "writeMillis", "nodes", "iterations",
        "communityCount",
    ]  # LouvainResult.java:26-31
    assert stats.iloc[0]["communityCount"] == 3
    stream = algo.louvain.stream(g).to_pandas()
    assert sorted(stream.columns) == ["community", "nodeId"]


def test_betweenness_procs(tmp_path_factory):
    corpus, _ = fixture_corpus("bc-rings")
    g = build_graph(rd.from_arrow(corpus), str(tmp_path_factory.mktemp("bc")), P=2)
    stats = algo.betweenness(g, write=False)
    assert list(stats.columns) == [
        "loadMillis", "computeMillis", "writeMillis", "nodes",
        "minCentrality", "maxCentrality", "sumCentrality",
    ]  # BetweennessCentralityProcResult.java:26-32
    assert stats.iloc[0]["maxCentrality"] == 25.0
    sampled = algo.betweenness.sampled.stream(g, {"probability": 1.0})
    c = sampled.to_pandas().sort_values("nodeId")["centrality"].to_numpy()
    assert c[5] == 25.0  # probability 1.0 == exact

    # strategy:'degree' (RandomDegreeSelectionStrategy.java): deterministic
    # seeded Bernoulli p=deg/maxDeg — same sources as the library picker
    from neo4j_graph_algorithms_ray.pipelines.betweenness import betweenness_centrality
    from neo4j_graph_algorithms_ray.pipelines.centrality import (
        graph_out_degrees,
        pick_sources_degree,
    )

    deg_stream = algo.betweenness.sampled.stream(g, {"strategy": "degree"})
    want = betweenness_centrality(
        g, direction="OUTGOING", sources=pick_sources_degree(graph_out_degrees(g), seed=7)
    )
    a = deg_stream.to_pandas().sort_values("nodeId")["centrality"].to_numpy()
    b = want.scores.to_pandas().sort_values("vid")["centrality"].to_numpy()
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)


def test_closeness_harmonic_procs(uf_graph):
    for proc in (algo.closeness, algo.harmonic):
        stats = proc(uf_graph, write=False)
        assert list(stats.columns) == ["loadMillis", "computeMillis", "writeMillis", "nodes"]
        stream = proc.stream(uf_graph).to_pandas()
        assert sorted(stream.columns) == ["centrality", "nodeId"]
        assert len(stream) == uf_graph.n_vertices


def test_scc_procs(tmp_path_factory):
    corpus, _ = fixture_corpus("scc1")
    g = build_graph(rd.from_arrow(corpus), str(tmp_path_factory.mktemp("scc")), P=2)
    stats = algo.scc(g, write=False)
    assert list(stats.columns) == [
        "loadMillis", "computeMillis", "writeMillis", "setCount",
        "minSetSize", "maxSetSize",
    ]  # SCCResult.java:26-31
    # variant aliases (StronglyConnectedComponentsProc.java:66-381) agree
    ms = algo.scc.multistep(g, write=False).iloc[0]
    tj = algo.scc.recursive.tarjan(g, write=False).iloc[0]
    assert ms["setCount"] == tj["setCount"] == stats.iloc[0]["setCount"]
    assert ms["variant"] == "multistep" and tj["variant"] == "recursive.tarjan"
    assert (
        algo.scc.iterative(g, write=False).iloc[0]["variant"] == "iterative"
        and algo.scc.recursive.tunedTarjan(g, write=False).iloc[0]["variant"]
        == "recursive.tunedTarjan"
    )
    stream = algo.scc.stream(g).to_pandas()
    assert sorted(stream.columns) == ["nodeId", "partition"]
    # forwardBackward.stream: exactly the SCC containing the start node
    member = algo.scc.forwardBackward.stream(g, 0).to_pandas()
    lab0 = stream.loc[stream["nodeId"] == 0, "partition"].iloc[0]
    want = set(stream.loc[stream["partition"] == lab0, "nodeId"])
    assert set(member["nodeId"]) == want


def test_shortest_path_procs(tmp_path_factory):
    corpus, _ = fixture_corpus("sp1")
    g = build_graph(rd.from_arrow(corpus), str(tmp_path_factory.mktemp("sp")), P=2)
    path = algo.shortestPath.stream(g, 0).to_pandas()
    assert list(path.columns) == ["nodeId", "cost"]
    assert path.iloc[0]["nodeId"] == 0 and path.iloc[0]["cost"] == 0.0
    stats = algo.shortestPath(g, 0, write=False)
    assert list(stats.columns) == [
        "loadMillis", "evalMillis", "writeMillis", "nodeCount", "totalCost",
    ]  # DijkstraResult.java:26-30
    assert stats.iloc[0]["nodeCount"] == len(path)

    sssp = algo.shortestPaths.stream(g, 0).to_pandas()
    assert sorted(sssp.columns) == ["distance", "nodeId"]
    dstats = algo.shortestPath.deltaStepping(g, 0, 2.0, write=False)
    assert list(dstats.columns) == [
        "loadDuration", "evalDuration", "writeDuration", "nodeCount",
    ]  # DeltaSteppingProcResult.java:28-31
    delta = algo.shortestPath.deltaStepping.stream(g, 0, 2.0).to_pandas()
    merged = sssp.merge(delta, on="nodeId", suffixes=("_b", "_d"))
    np.testing.assert_allclose(merged["distance_b"], merged["distance_d"])

    asp = algo.allShortestPaths.stream(g).to_pandas()
    assert sorted(asp.columns) == ["distance", "sourceNodeId", "targetNodeId"]
    assert (asp[asp["sourceNodeId"] == asp["targetNodeId"]]["distance"] == 0).all()


def test_mst_proc(tmp_path_factory):
    corpus, _ = fixture_corpus("mst1")
    g = build_graph(rd.from_arrow(corpus), str(tmp_path_factory.mktemp("mst")), P=2)
    stats = algo.mst(g, write=False)
    assert list(stats.columns) == [
        "loadMillis", "computeMillis", "writeMillis", "weightSum",
        "weightMin", "weightMax", "relationshipCount",
    ]  # MSTPrimResult.java:26-32


def test_mst_relationship_writeback_roundtrip(tmp_path_factory, tmp_path):
    """MSTPrimProc.java:65 parity: the forest is persisted as a resumable
    relationship Parquet (per-shard _DONE markers) and reads back as the
    identical edge set (VERDICT r03 #9)."""
    import os as _os

    from neo4j_graph_algorithms_ray.pipelines.mst import minimum_spanning_forest
    from neo4j_graph_algorithms_ray.stages.sink import read_partitioned, write_relationships

    corpus, _ = fixture_corpus("mst1")
    g = build_graph(rd.from_arrow(corpus), str(tmp_path_factory.mktemp("mstw")), P=2)
    path = str(tmp_path / "forest")
    algo.mst(g, writePath=path)
    back = read_partitioned(path).to_pandas().sort_values(["u", "v"]).reset_index(drop=True)
    want = (
        minimum_spanning_forest(g).edges.to_pandas()
        .sort_values(["u", "v"]).reset_index(drop=True)
    )
    assert back[["u", "v"]].values.tolist() == want[["u", "v"]].values.tolist()
    np.testing.assert_allclose(back["weight"].to_numpy(), want["weight"].to_numpy())
    # every shard partition carries a completion marker; a second write-back
    # call into the same layout is a no-op (resume contract)
    for p in range(g.P):
        assert _os.path.exists(_os.path.join(path, f"part={p}", "_DONE"))
    assert write_relationships(minimum_spanning_forest(g).edges, path, g.bounds) == []


def test_list_and_scalars():
    cat = algo.list()
    assert len(cat) > 25 and "name" in cat.columns
    # the per-variant reference aliases are catalogued (VERDICT r03 #6)
    names = set(cat["name"])
    for alias in (
        "unionfind.queue", "unionfind.forkjoin", "unionfind.forkjoinmerge",
        "scc.recursive.tarjan", "scc.recursive.tunedtarjan", "scc.iterative",
        "scc.multistep", "scc.forwardbackward.stream", "trianglecount.forkjoin",
    ):
        assert alias in names, alias
    assert math.isinf(algo.Infinity()) and math.isnan(algo.NaN())
    import pyarrow as pa

    got = algo.isFinite(pa.array([1.0, float("inf"), float("nan"), None]))
    assert got.to_pylist() == [True, False, False, False]


def test_register_custom_procedure(pr_graph):
    """extension.register_procedure: the @Procedure + Algorithm<Self> analogue
    (SURVEY.md §2.12) — a user algorithm lands at algo.<name>, honors the open
    config map, and shows up in algo.list()."""
    import pandas as pd

    from neo4j_graph_algorithms_ray.extension import GraphContext, register_procedure
    from neo4j_graph_algorithms_ray.stages.agg import bucketed_agg

    def degree_stream(ctx: GraphContext):
        col = "dst" if str(ctx.get("direction", "OUTGOING")).upper() == "INCOMING" else "src"
        deg = bucketed_agg(ctx.edges_ds(columns=[col]), col, {"degree": (None, "count")})
        return deg.map_batches(
            lambda t: t.rename_columns(["nodeId", "degree"]), batch_format="pyarrow"
        )

    def degree_write(ctx: GraphContext):
        return pd.DataFrame(
            [{"nodes": ctx.n_vertices, "loadMillis": ctx.load_millis, "writeProperty":
              ctx.get("writeProperty", "degree")}]
        )

    register_procedure("degree", write=degree_write, stream=degree_stream)

    got = algo.degree.stream(pr_graph).to_pandas().sort_values("nodeId").reset_index(drop=True)
    # (cleanup at the end keeps the catalog pristine for the contract tests,
    # whose catalog oracle is a snapshot of the same rows)
    exp = (
        pr_graph.edges_ds(columns=["src"]).to_pandas().groupby("src", as_index=False).size()
        .rename(columns={"src": "nodeId", "size": "degree"}).sort_values("nodeId")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    got_in = algo.degree.stream(pr_graph, direction="INCOMING").to_pandas()
    exp_in = pr_graph.edges_ds(columns=["dst"]).to_pandas()["dst"].value_counts()
    assert got_in["degree"].sum() == exp_in.sum()

    stats = algo.degree(pr_graph, writeProperty="deg")
    assert stats.iloc[0]["nodes"] == pr_graph.n_vertices
    assert stats.iloc[0]["writeProperty"] == "deg"

    cat = algo.list()
    assert "degree" in set(cat["name"])

    from neo4j_graph_algorithms_ray.catalog import unregister_operator

    unregister_operator("degree")
    assert "degree" not in set(algo.list()["name"])


def test_register_procedure_builtin_collision_raises():
    """A user extension must not silently shadow a builtin catalog row or an
    algo.* procedure attribute (ADVICE r04) — catalog names are lowercase
    while proc attrs are camelCase, so both paths are guarded."""
    import pytest

    from neo4j_graph_algorithms_ray.catalog import unregister_operator
    from neo4j_graph_algorithms_ray.extension import register_procedure

    for bad in ("pageRank", "pagerank", "unionFind.forkJoin", "scc"):
        with pytest.raises(ValueError, match="collides|shadow"):
            register_procedure(bad, stream=lambda ctx: None)

    # extension lifecycle stays latest-wins: register, re-register, and
    # re-register after unregister are all allowed for OUR names
    register_procedure("collisionProbe", stream=lambda ctx: None)
    register_procedure("collisionProbe", stream=lambda ctx: None)
    unregister_operator("collisionProbe")
    register_procedure("collisionProbe", stream=lambda ctx: None)
    unregister_operator("collisionProbe")


def test_unionfind_from_raw_edge_table():
    """Edge-table projections carry no vertex key table; result assembly must
    synthesize dense ids instead of failing (regression: FileNotFoundError
    on <workdir>/vertices)."""
    import pandas as pd

    edges = pd.DataFrame({"src": [0, 1, 3], "dst": [1, 2, 4]})
    out = algo.unionFind.stream(edges).to_pandas().sort_values("nodeId")
    assert out["setId"].tolist() == [0, 0, 0, 3, 3]
    # triangle counting exercises the same vertex-table assembly path
    tri_edges = pd.DataFrame({"src": [0, 1, 2, 0], "dst": [1, 2, 0, 3]})
    tri = algo.triangleCount.stream(tri_edges).to_pandas().sort_values("nodeId")
    assert tri["triangles"].tolist() == [1, 1, 1, 0]


def test_procedure_configuration_matrix(uf_graph, tmp_path):
    """ProcedureConfiguration key contract (ProcedureConfiguration.java:
    114-406): honored keys take effect, no-op keys are accepted, unknown
    keys raise instead of being silently dropped (VERDICT r03 #7)."""
    import pyarrow as pa

    # unknown / typo'd key -> loud error
    with pytest.raises(ValueError, match="unrecognized config key"):
        algo.unionFind(uf_graph, {"batchSiz": 100})
    with pytest.raises(ValueError, match="unrecognized config key"):
        algo.pageRank.stream(uf_graph, iteratons=5)

    # graph:'cypher'-style impl selector accepted (one impl -> no-op)
    assert algo.unionFind(uf_graph, {"graph": "huge", "write": False}).iloc[0]["setCount"] == 3

    # batchSize flows to the betweenness source-batch width: a width-1
    # batching must give identical centralities to the default
    a = algo.betweenness.stream(uf_graph, batchSize=1).to_pandas().sort_values("nodeId")
    b = algo.betweenness.stream(uf_graph).to_pandas().sort_values("nodeId")
    np.testing.assert_allclose(a["centrality"].to_numpy(), b["centrality"].to_numpy(), atol=1e-12)

    # concurrency -> P and defaultValue -> weight fill on edge-table projections
    edges = pa.table(
        {"src": pa.array([0, 1, 2], pa.int64()), "dst": pa.array([1, 2, 3], pa.int64())}
    )
    wd = str(tmp_path / "cfg_proj")
    algo.unionFind(edges, {"workdir": wd, "concurrency": 3, "defaultValue": 2.5, "write": False})
    from neo4j_graph_algorithms_ray.pipelines.graph_build import BuiltGraph

    g2 = BuiltGraph.load(wd)
    assert g2.P == 3
    w = g2.edges_ds(columns=["weight"]).to_pandas()["weight"].to_numpy()
    assert (w == 2.5).all()
