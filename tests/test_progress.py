"""Progress-reporting cadence (state/progress.py; ProgressLogger.java parity).

Contract under test:
- ``interval_s=0`` delivers one event per driver round plus the final event;
  iterations are monotone and fields are present.
- A large ``interval_s`` throttles to exactly {first, final} events.
- No callback / logger => pipelines build NO reporter (zero overhead) and
  result metrics carry no progress keys.
"""

import numpy as np
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray.pipelines.graph_build import build_graph
from neo4j_graph_algorithms_ray.sources.corpus import fixture_corpus
from neo4j_graph_algorithms_ray.state.progress import ProgressReporter, make_reporter


def _build(tmp_workdir, name="pr1", P=2):
    corpus, _ = fixture_corpus(name)
    return build_graph(rd.from_arrow(corpus), tmp_workdir, P=P)


# ---------------------------------------------------------------------------
# unit: the reporter itself (no Ray)
# ---------------------------------------------------------------------------


def test_reporter_unthrottled_delivers_every_report():
    got = []
    r = ProgressReporter(got.append, interval_s=0.0, algo="x")
    for i in range(5):
        r.report(i, val=i * 2)
    r.report(5, final=True)
    assert [e["iteration"] for e in got] == [0, 1, 2, 3, 4, 5]
    assert got[0] == {"algo": "x", "iteration": 0, "val": 0}
    assert r.reports == 6 and r.events == 6


def test_reporter_throttle_first_and_final_always_fire():
    got = []
    r = ProgressReporter(got.append, interval_s=3600.0, algo="x")
    for i in range(50):
        r.report(i)
    r.report(50, final=True)
    assert [e["iteration"] for e in got] == [0, 50]  # first + final only
    assert r.reports == 51 and r.events == 2
    assert r.last["iteration"] == 50  # last tracks every report


def test_reporter_logger_only(caplog):
    import logging

    lg = logging.getLogger("test_progress_lg")
    r = make_reporter(None, 0.0, "pagerank", logger=lg)
    assert r is not None
    with caplog.at_level(logging.INFO, logger="test_progress_lg"):
        r.report(3, max_delta=0.5)
    assert any("pagerank" in m and "iteration=3" in m for m in caplog.messages)


def test_make_reporter_none_when_unused():
    assert make_reporter(None, 10.0, "x") is None


# ---------------------------------------------------------------------------
# integration: pipelines emit per-round events
# ---------------------------------------------------------------------------


def test_pagerank_progress_cadence(ray_session, tmp_workdir):
    from neo4j_graph_algorithms_ray.pipelines.pagerank import pagerank

    g = _build(tmp_workdir)
    got = []
    res = pagerank(g, iterations=7, on_progress=got.append, progress_interval_s=0.0)
    # one event per submitted iteration + the final event
    its = [e["iteration"] for e in got]
    assert its == sorted(its)
    assert len(got) == 7 + 1
    assert all(e["algo"] == "pagerank" for e in got)
    assert "max_delta" in got[-1] and got[-1]["converged"] is True
    assert res.metrics["progress_events"] == len(got)
    # throttled run: first + final only, same scores
    got2 = []
    pagerank(g, iterations=7, on_progress=got2.append, progress_interval_s=3600.0)
    assert len(got2) == 2

    # no callback => no progress keys in metrics (reporter not built)
    res3 = pagerank(g, iterations=3)
    assert "progress_events" not in res3.metrics


def test_labelprop_progress_cadence(ray_session, tmp_workdir):
    from neo4j_graph_algorithms_ray.pipelines.labelprop import label_propagation

    g = _build(tmp_workdir, name="lp1")
    got = []
    res = label_propagation(g, max_iterations=5, on_progress=got.append, progress_interval_s=0.0)
    assert len(got) >= 2  # at least one per-iteration + final
    assert got[-1]["converged"] in (True, False)
    assert all(e["algo"] == "labelPropagation" for e in got)
    assert res.metrics["progress_events"] == len(got)


def test_unionfind_progress_both_modes(ray_session, tmp_workdir):
    from neo4j_graph_algorithms_ray.pipelines.components import connected_components

    g = _build(tmp_workdir, name="uf1")
    for mode in ("treereduce", "starcontract"):
        got = []
        res = connected_components(
            g, mode=mode, on_progress=got.append, progress_interval_s=0.0
        )
        assert got, mode
        assert got[-1]["algo"] == "unionFind"
        assert res.metrics["progress_events"] == len(got)


def test_betweenness_progress_per_batch(ray_session, tmp_workdir):
    from neo4j_graph_algorithms_ray.pipelines.betweenness import betweenness_centrality

    g = _build(tmp_workdir, name="uf1")
    got = []
    res = betweenness_centrality(
        g, source_batch=2, on_progress=got.append, progress_interval_s=0.0
    )
    # one event per source batch + final
    n_batches = got[-1]["batches_total"]
    assert len(got) == n_batches + 1
    assert got[-1]["sources_done"] == res.metrics["sources"]


def test_mst_progress_rounds(ray_session, tmp_workdir):
    from neo4j_graph_algorithms_ray.pipelines.mst import minimum_spanning_forest

    g = _build(tmp_workdir, name="mst1")
    got = []
    res = minimum_spanning_forest(g, on_progress=got.append, progress_interval_s=0.0)
    assert got[-1]["edges_total"] == res.relationship_count
    assert res.metrics["progress_events"] == len(got)


def test_scc_progress_outer_rounds(ray_session, tmp_workdir):
    from neo4j_graph_algorithms_ray.pipelines.scc import strongly_connected_components

    g = _build(tmp_workdir, name="scc1")
    got = []
    res = strongly_connected_components(
        g, on_progress=got.append, progress_interval_s=0.0
    )
    assert got and got[-1]["algo"] == "scc"
    # every non-final event carries the per-round assignment counters
    for e in got[:-1]:
        assert "assigned" in e and e["assigned"] > 0
    assert res.metrics["progress_events"] == len(got)
