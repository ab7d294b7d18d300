"""Mid-run shard-actor death: Ray ``max_restarts`` revival + pool rollback.

SURVEY.md §4.2's open design row ("actor-held CSR/vertex state must be
reconstructible"): a worker process dying mid-algorithm must not kill the
run when checkpointing is on — the pool rolls back to the last committed
manifest and continues WITHOUT a driver restart, producing output identical
to an unkilled run (state/failover.py).
"""

import time

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray
import ray.data as rd

from neo4j_graph_algorithms_ray.pipelines.graph_build import build_graph
from neo4j_graph_algorithms_ray.pipelines.pagerank import pagerank
from neo4j_graph_algorithms_ray.sources.corpus import fixture_corpus
from neo4j_graph_algorithms_ray.state.checkpoint import CheckpointManager
from neo4j_graph_algorithms_ray.state.shards import PageRankShard


def _build(tmp_workdir, name, P):
    corpus, _ = fixture_corpus(name)
    return build_graph(rd.from_arrow(corpus), tmp_workdir, P=P)


def _scores(res):
    return res.scores.to_pandas().sort_values("vid")["score"].to_numpy()


class _KillOnce:
    """Chaos hook: kill shard ``part``'s process at driver round ``at``.

    ``no_restart=False`` simulates a worker death that Ray's max_restarts
    policy revives (a plain process crash, not an intentional teardown)."""

    def __init__(self, at: int, part: int = 0, wait_for_revival: bool = False):
        self.at, self.part, self.wait = at, part, wait_for_revival
        self.fired = False

    def __call__(self, it, actors):
        if self.fired or it < self.at:
            return
        self.fired = True
        ray.kill(actors[self.part], no_restart=False)
        if self.wait:
            # drain the restart window so subsequent calls land on the
            # revived instance and raise NOTHING — the silent-kill case the
            # incarnation gate exists for
            deadline = time.monotonic() + 60
            while time.monotonic() < deadline:
                try:
                    ray.get(actors[self.part].whoami.remote())
                    return
                except ray.exceptions.RayActorError:
                    time.sleep(0.2)
            raise AssertionError("killed shard never revived")


@pytest.mark.parametrize("exchange", ["fused", "direct"])
def test_pagerank_survives_shard_kill(tmp_workdir, tmp_path, exchange):
    """Kill one shard mid-run -> rollback to the last manifest -> scores
    identical to an unkilled run, no driver restart."""
    g = _build(tmp_workdir, "pr-wiki", 3)
    full = pagerank(g, iterations=40, exchange=exchange)
    res = pagerank(
        g, iterations=40, exchange=exchange,
        checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_every=5,
        chaos_hook=_KillOnce(at=7),
    )
    np.testing.assert_allclose(_scores(full), _scores(res), rtol=0, atol=0)
    assert res.metrics["failovers"] == 1


def test_pagerank_silent_idle_window_kill_detected(tmp_workdir, tmp_path):
    """A kill landing between BSP waves raises NO exception anywhere (Ray
    silently revives the actor); only the incarnation gate at the next
    checkpoint commit catches it.  The wrong-state rounds run between kill
    and gate must be fully discarded by the rollback."""
    g = _build(tmp_workdir, "pr-wiki", 3)
    full = pagerank(g, iterations=30, exchange="direct")
    res = pagerank(
        g, iterations=30, exchange="direct",
        checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_every=3,
        chaos_hook=_KillOnce(at=7, wait_for_revival=True),
    )
    np.testing.assert_allclose(_scores(full), _scores(res), rtol=0, atol=0)
    assert res.metrics["failovers"] >= 1


def test_pagerank_kill_before_first_commit_resets(tmp_workdir, tmp_path):
    """No manifest committed yet -> rollback resets every shard to pristine
    state and the run starts over from iteration 0."""
    g = _build(tmp_workdir, "pr1", 2)
    full = pagerank(g, iterations=20)
    res = pagerank(
        g, iterations=20, checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=50,  # first commit would be at it=0 -- kill beats it
        chaos_hook=_KillOnce(at=0),
    )
    np.testing.assert_allclose(_scores(full), _scores(res), rtol=0, atol=0)


def test_pagerank_kill_without_checkpoint_raises(tmp_workdir):
    """No checkpoint dir -> no max_restarts, no failover: the death
    propagates (and the pool is torn down by the cleanup path)."""
    g = _build(tmp_workdir, "pr1", 2)
    with pytest.raises(ray.exceptions.RayActorError):
        pagerank(g, iterations=40, chaos_hook=_KillOnce(at=5))


def test_shard_init_rehydrates_from_manifest(tmp_workdir, tmp_path):
    """The restart hook itself: a fresh __init__ with ckpt_dir loads the
    partitioned-edge CSR AND the latest committed vertex state."""
    g = _build(tmp_workdir, "pr1", 2)
    ck = str(tmp_path / "ckpt")
    pagerank(g, iterations=15, checkpoint_dir=ck)
    m = CheckpointManager(ck, "pagerank").latest()
    assert m is not None and m["iteration"] == 14
    # local (non-remote) construction exercises exactly what a Ray restart re-runs
    s = PageRankShard(0, g.bounds, g.edges_dir, ckpt_dir=ck)
    f = next(f for f in m["files"] if "part=00000" in f)
    want = pq.read_table(f)
    np.testing.assert_array_equal(s.score, want["score"].to_numpy())
    np.testing.assert_array_equal(s.delta, want["delta"].to_numpy())
    # and without a manifest the hook is a no-op
    s2 = PageRankShard(0, g.bounds, g.edges_dir, ckpt_dir=str(tmp_path / "empty"))
    assert s2.score.min() == s2.score.max() == 1.0 - 0.85


# ---------------------------------------------------------------------------
# SCC — outer-round checkpoints (reference MultistepSCC.java:215 granularity)
# ---------------------------------------------------------------------------


def _chained_cycles_graph(tmp_workdir, n_cycles=3, cyc=4, P=3):
    """n_cycles 4-cycles whose condensation is a path: FW-BW discovers one
    SCC per outer round (single color root per round), so the outer loop is
    guaranteed to run n_cycles rounds — enough to checkpoint mid-stream."""
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.pipelines.graph_build import build_graph_from_edges

    edges = []
    for c in range(n_cycles):
        base = c * cyc
        for i in range(cyc):
            edges.append((base + i, base + (i + 1) % cyc))
        if c + 1 < n_cycles:
            edges.append((base, base + cyc))  # condensation edge
    src, dst = zip(*edges)
    t = pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "weight": pa.array([1.0] * len(src)),
        }
    )
    return build_graph_from_edges(rd.from_arrow(t), n_cycles * cyc, tmp_workdir, P=P)


def test_scc_checkpoint_resume(tmp_workdir, tmp_path):
    from neo4j_graph_algorithms_ray.pipelines.scc import strongly_connected_components

    g = _chained_cycles_graph(tmp_workdir)
    full = strongly_connected_components(g)
    want = full.labels.to_pandas().sort_values("vid")["label"].to_numpy()
    ck = str(tmp_path / "ckpt")
    # partial run: stop after 1 outer round, checkpointing
    strongly_connected_components(g, max_outer=1, checkpoint_dir=ck)
    m = CheckpointManager(ck, "scc").latest()
    assert m is not None and m["iteration"] >= 1
    # fresh actors resume from the manifest and finish
    res = strongly_connected_components(g, checkpoint_dir=ck, resume=True)
    got = res.labels.to_pandas().sort_values("vid")["label"].to_numpy()
    np.testing.assert_array_equal(want, got)
    # the fixture takes multiple outer rounds, so the resume genuinely
    # entered mid-stream (manifest iteration >= 1, asserted above) and the
    # continued numbering lands on the same final round
    assert full.metrics["outer_rounds"] >= 2
    assert res.metrics["outer_rounds"] <= full.metrics["outer_rounds"]


def test_scc_survives_shard_kill(tmp_workdir, tmp_path):
    from neo4j_graph_algorithms_ray.pipelines.scc import strongly_connected_components

    g = _chained_cycles_graph(tmp_workdir)
    full = strongly_connected_components(g)
    want = full.labels.to_pandas().sort_values("vid")["label"].to_numpy()
    res = strongly_connected_components(
        g, checkpoint_dir=str(tmp_path / "ckpt"), chaos_hook=_KillOnce(at=2)
    )
    got = res.labels.to_pandas().sort_values("vid")["label"].to_numpy()
    np.testing.assert_array_equal(want, got)
    assert res.metrics["failovers"] == 1


# ---------------------------------------------------------------------------
# Triangles — wedge-round checkpoints
# ---------------------------------------------------------------------------


def _tri_graph(tmp_workdir, P=3):
    from neo4j_graph_algorithms_ray.sources.corpus import powerlaw_corpus_table

    corpus = powerlaw_corpus_table(n_files=200, n_repos=5, avg_out=5.0, seed=7)
    return build_graph(rd.from_arrow(corpus), tmp_workdir, P=P)


def test_triangles_checkpoint_resume(tmp_workdir, tmp_path):
    from neo4j_graph_algorithms_ray.pipelines.triangles import triangle_count

    g = _tri_graph(tmp_workdir)
    full = triangle_count(g, wedge_rounds=4)
    ck = str(tmp_path / "ckpt")
    # run 1 commits every wedge round; chaos aborts the run after round 1 by
    # raising (simulating a driver death between rounds)
    class _Abort:
        def __call__(self, k, actors):
            if k == 2:
                raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        triangle_count(g, wedge_rounds=4, checkpoint_dir=ck, chaos_hook=_Abort())
    m = CheckpointManager(ck, "triangles").latest()
    assert m is not None and m["iteration"] == 1 and m["K"] == 4
    res = triangle_count(g, wedge_rounds=4, checkpoint_dir=ck, resume=True)
    assert res.triangle_count == full.triangle_count
    a = full.counts.to_pandas().sort_values("vid").reset_index(drop=True)
    b = res.counts.to_pandas().sort_values("vid").reset_index(drop=True)
    np.testing.assert_array_equal(a["triangles"], b["triangles"])
    # mismatched round count must refuse, not silently miscount
    with pytest.raises(ValueError):
        triangle_count(g, wedge_rounds=5, checkpoint_dir=ck, resume=True)


def test_triangles_survive_shard_kill(tmp_workdir, tmp_path):
    from neo4j_graph_algorithms_ray.pipelines.triangles import triangle_count

    g = _tri_graph(tmp_workdir)
    full = triangle_count(g, wedge_rounds=4)
    res = triangle_count(
        g, wedge_rounds=4, checkpoint_dir=str(tmp_path / "ckpt"),
        chaos_hook=_KillOnce(at=2, part=1),
    )
    assert res.metrics["failovers"] == 1
    assert res.triangle_count == full.triangle_count
    a = full.counts.to_pandas().sort_values("vid").reset_index(drop=True)
    b = res.counts.to_pandas().sort_values("vid").reset_index(drop=True)
    np.testing.assert_array_equal(a["triangles"], b["triangles"])
    ca = full.coefficients.to_pandas().sort_values("vid")["coefficient"].to_numpy()
    cb = res.coefficients.to_pandas().sort_values("vid")["coefficient"].to_numpy()
    np.testing.assert_allclose(ca, cb, rtol=0, atol=0)


# ---------------------------------------------------------------------------
# MST — per-round driver-side checkpoints (comp labels + forest so far)
# ---------------------------------------------------------------------------


def test_mst_checkpoint_resume(tmp_workdir, tmp_path):
    from neo4j_graph_algorithms_ray.pipelines.mst import minimum_spanning_forest

    corpus, _ = fixture_corpus("uf1")  # weighted chains: multiple rounds
    g = build_graph(rd.from_arrow(corpus), tmp_workdir, P=2)
    full = minimum_spanning_forest(g)
    assert full.metrics["rounds"] >= 2, "fixture must need multiple rounds"
    ck = str(tmp_path / "ckpt")
    minimum_spanning_forest(g, max_rounds=1, checkpoint_dir=ck)
    res = minimum_spanning_forest(g, checkpoint_dir=ck, resume=True)
    a = full.edges.to_pandas().sort_values(["u", "v"]).reset_index(drop=True)
    b = res.edges.to_pandas().sort_values(["u", "v"]).reset_index(drop=True)
    np.testing.assert_array_equal(a["u"], b["u"])
    np.testing.assert_array_equal(a["v"], b["v"])
    np.testing.assert_allclose(a["weight"], b["weight"], rtol=0, atol=0)
    assert res.weight_sum == full.weight_sum


def test_mst_survives_shard_kill(tmp_workdir, tmp_path):
    from neo4j_graph_algorithms_ray.pipelines.mst import minimum_spanning_forest

    corpus, _ = fixture_corpus("uf1")
    g = build_graph(rd.from_arrow(corpus), tmp_workdir, P=2)
    full = minimum_spanning_forest(g)
    res = minimum_spanning_forest(
        g, checkpoint_dir=str(tmp_path / "ckpt"), chaos_hook=_KillOnce(at=2, part=1)
    )
    assert res.metrics["failovers"] >= 1
    assert res.weight_sum == full.weight_sum
    assert res.relationship_count == full.relationship_count
