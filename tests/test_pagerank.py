"""PageRank conformance: FIXTURES.md §1-2 goldens + NumPy oracle at 1e-6."""

import numpy as np
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray.pipelines.graph_build import build_graph
from neo4j_graph_algorithms_ray.pipelines.pagerank import (
    pagerank,
    pagerank_oracle,
    pagerank_scores_with_keys,
)
from neo4j_graph_algorithms_ray.sources.corpus import fixture_corpus

GOLD_PR1 = {  # PageRankTest.java:133-142 (reference tol 1e-2)
    "a": 0.243007, "b": 1.9183995, "c": 1.7806315, "d": 0.21885,
    "e": 0.243007, "f": 0.21885, "g": 0.15, "h": 0.15, "i": 0.15, "j": 0.15,
}
GOLD_WIKI = {  # PageRankWikiTest.java:131-141
    "a": 0.3040965, "b": 3.5658695, "c": 3.180981, "d": 0.3625935,
    "e": 0.7503465, "f": 0.3625935, "g": 0.15, "h": 0.15, "i": 0.15,
    "j": 0.15, "k": 0.15,
}


def _build(tmp_workdir, name, P):
    corpus, _ = fixture_corpus(name)
    return build_graph(rd.from_arrow(corpus), tmp_workdir, P=P)


def _scores_by_node(graph, res):
    df = pagerank_scores_with_keys(graph, res).to_pandas()
    return {k.split("/")[-1][:-3]: s for k, s in zip(df["key"], df["score"])}


def _edges_np(graph):
    df = graph.edges_ds().to_pandas()
    return df["src"].to_numpy(), df["dst"].to_numpy()


@pytest.mark.parametrize("P", [1, 3])
@pytest.mark.parametrize("name,gold", [("pr1", GOLD_PR1), ("pr-wiki", GOLD_WIKI)])
def test_pagerank_goldens_40_iters(tmp_workdir, name, gold, P):
    g = _build(tmp_workdir, name, P)
    res = pagerank(g, iterations=40)
    got = _scores_by_node(g, res)
    assert res.ran_iterations == 40
    # vs reference goldens at the reference's own tolerance
    for node, want in gold.items():
        assert got[node] == pytest.approx(want, abs=1e-2), node
    # vs independent NumPy oracle at 1e-6 (identical semantics)
    src, dst = _edges_np(g)
    oracle = pagerank_oracle(g.n_vertices, src, dst, iterations=40)
    vt = g.vertices_ds().to_pandas().sort_values("vid")
    for vid, key in zip(vt["vid"], vt["key"]):
        node = key.split("/")[-1][:-3]
        assert got[node] == pytest.approx(oracle[vid], abs=1e-6), node


def test_pagerank_convergence_tol(tmp_workdir):
    g = _build(tmp_workdir, "pr1", 2)
    res = pagerank(g, tol=1e-6)
    assert res.converged
    assert res.max_delta < 1e-6
    src, dst = _edges_np(g)
    # engine may apply a few extra rounds past the stop check (deterministic
    # block overshoot) — compare against the fixpoint: residual after a
    # max-delta < tol stop is bounded by tol * d / (1 - d)
    fixpoint = pagerank_oracle(g.n_vertices, src, dst, tol=1e-12, max_iterations=500)
    df = res.scores.to_pandas().sort_values("vid")
    np.testing.assert_allclose(df["score"].to_numpy(), fixpoint, atol=1e-6 * 0.85 / 0.15)


def test_pagerank_exchange_modes_agree(tmp_workdir):
    g = _build(tmp_workdir, "pr1", 3)
    res_d = pagerank(g, iterations=10, exchange="direct")
    res_g = pagerank(g, iterations=10, exchange="groupby")
    res_f = pagerank(g, iterations=10, exchange="fused")
    a = res_d.scores.to_pandas().sort_values("vid")["score"].to_numpy()
    b = res_g.scores.to_pandas().sort_values("vid")["score"].to_numpy()
    c = res_f.scores.to_pandas().sort_values("vid")["score"].to_numpy()
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)
    np.testing.assert_allclose(a, c, rtol=0, atol=1e-12)


def test_pagerank_checkpoint_resume(tmp_workdir, tmp_path):
    """FIXTURES.md §10.5: stop after k iterations, resume -> identical output."""
    g = _build(tmp_workdir, "pr-wiki", 3)
    ck = str(tmp_path / "ckpt")
    full = pagerank(g, iterations=40)
    # run 1: only 15 iterations, checkpointing
    pagerank(g, iterations=15, checkpoint_dir=ck)
    # run 2: fresh actors resume from the manifest and finish to 40
    res2 = pagerank(g, iterations=40, checkpoint_dir=ck, resume=True)
    a = full.scores.to_pandas().sort_values("vid")["score"].to_numpy()
    b = res2.scores.to_pandas().sort_values("vid")["score"].to_numpy()
    np.testing.assert_allclose(a, b, rtol=0, atol=0)  # byte-identical
    assert res2.ran_iterations == 25  # iterations 15..39


def test_pagerank_cooperative_cancellation_resumes(tmp_workdir, tmp_path):
    """TerminationFlag analogue (TerminationFlag.java; PageRank.java:347):
    cancelling mid-run raises, leaves the last committed checkpoint, and a
    resume=True run completes byte-identically to an uninterrupted run."""
    from neo4j_graph_algorithms_ray.state.termination import (
        TerminatedError,
        TerminationFlag,
    )

    g = _build(tmp_workdir, "pr-wiki", 3)
    full = pagerank(g, iterations=40)
    flag = TerminationFlag(auto_after_checks=6)  # cancel on round 7's check
    ck = str(tmp_path / "ckpt")
    with pytest.raises(TerminatedError):
        pagerank(g, iterations=40, checkpoint_dir=ck, checkpoint_every=1, termination=flag)
    # the aborted run left a resumable manifest strictly before iteration 40
    from neo4j_graph_algorithms_ray.state.checkpoint import CheckpointManager

    m = CheckpointManager(ck, "pagerank").latest()
    assert m is not None and m["iteration"] < 39
    res2 = pagerank(g, iterations=40, checkpoint_dir=ck, resume=True)
    a = full.scores.to_pandas().sort_values("vid")["score"].to_numpy()
    b = res2.scores.to_pandas().sort_values("vid")["score"].to_numpy()
    np.testing.assert_allclose(a, b, rtol=0, atol=0)
