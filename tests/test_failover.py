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
