"""Label propagation conformance: FIXTURES.md §5-6."""

import pyarrow as pa
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray.pipelines.graph_build import build_graph, node_props_to_vids
from neo4j_graph_algorithms_ray.pipelines.labelprop import label_propagation
from neo4j_graph_algorithms_ray.sources.corpus import fixture_corpus


def _lab_by_name(graph, res):
    vt = graph.vertices_ds().to_pandas()
    name = {v: k.split("/")[-1][:-3] for k, v in zip(vt["key"], vt["vid"])}
    return {name[v]: l for v, l in res.labels.to_pandas().itertuples(index=False)}


def _build(tmp, name, P=3):
    corpus, props = fixture_corpus(name)
    g = build_graph(rd.from_arrow(corpus), tmp, P=P)
    seeds = node_props_to_vids(rd.from_arrow(props), g)
    return g, seeds


def test_lp1_outgoing_one_iteration(tmp_workdir):
    """Weight-8 leaf (partition 2) outvotes the 1+2+1+1 partition-1 leaves."""
    g, seeds = _build(tmp_workdir, "lp1")
    res = label_propagation(g, seeds=seeds, direction="OUTGOING", max_iterations=1)
    lab = _lab_by_name(g, res)
    assert lab["a"] == 2 and lab["b"] == 2
    assert res.ran_iterations == 1


def test_lp1_incoming(tmp_workdir):
    """INCOMING propagates the centers' seed 42 to the leaves."""
    g, seeds = _build(tmp_workdir, "lp1")
    res = label_propagation(g, seeds=seeds, direction="INCOMING", max_iterations=1)
    lab = _lab_by_name(g, res)
    for i in range(2, 12):
        assert lab[f"n{i:02d}"] == 42, i
    assert lab["a"] == 42 and lab["b"] == 42  # centers have no in-edges: keep seed


def test_lp1_seed_property_missing(tmp_workdir):
    """No seeds -> labels fall back to dense vids; argmax picks the w8 leaf's vid.

    Analog of the reference's foobar run (a.foobar = id of n6, b.foobar = id
    of n11; LabelPropagationProcIntegrationTest.java:140-151), but weights
    default to 1.0 without the sidecar, so votes tie and the smallest voter
    vid wins: a -> vid(n02)=1, b -> vid(n07)=7.
    """
    corpus, props = fixture_corpus("lp1")
    g = build_graph(rd.from_arrow(corpus), tmp_workdir, P=3)
    # weights but no partitions: partition column = vid fallback is the shard
    # default; ship only the weight column by seeding with partition=vid
    vt = g.vertices_ds().to_pandas()
    pr = rd.from_arrow(props).to_pandas()
    pr["key"] = pr["repo"] + "/" + pr["path"]
    m = pr.merge(vt, on="key")
    seeds = rd.from_arrow(
        pa.table(
            {
                "vid": pa.array(m["vid"], pa.int64()),
                "partition": pa.array(m["vid"], pa.int64()),  # missing property -> vid
                "weight": pa.array(m["weight"], pa.float64()),
            }
        )
    )
    res = label_propagation(g, seeds=seeds, direction="OUTGOING", max_iterations=1)
    lab = _lab_by_name(g, res)
    # a's voters: n02..n06 with labels=vids 1..5, weights 1,2,1,1,8 -> n06 (vid 5)
    assert lab["a"] == 5
    # b's voters: n07..n11 labels 7..11, weights 1,2,1,1,8 -> n11 (vid 11)
    assert lab["b"] == 11


def test_lp1_label_filter_subgraph(tmp_workdir):
    """Reference label-filter run -> vertex predicate on repo (star A only)."""
    corpus, props = fixture_corpus("lp1")
    mask = pa.compute.equal(corpus["repo"], "fixture-lp1-A")
    sub = corpus.filter(mask)
    g = build_graph(rd.from_arrow(sub), tmp_workdir, P=2)
    seeds = node_props_to_vids(rd.from_arrow(props.filter(mask)), g)
    res = label_propagation(g, seeds=seeds, direction="OUTGOING", max_iterations=1)
    lab = _lab_by_name(g, res)
    assert lab["a"] == 2
    assert "b" not in lab  # b outside the filtered graph keeps its seed trivially


def test_lp_checkpoint_resume(tmp_workdir, tmp_path):
    """Kill after k iterations, resume from the manifest -> identical labels."""
    g, seeds = _build(tmp_workdir, "lp420", P=3)
    full = label_propagation(g, seeds=seeds, direction="OUTGOING", max_iterations=10)
    ck = str(tmp_path / "ck")
    label_propagation(g, seeds=seeds, direction="OUTGOING", max_iterations=2, checkpoint_dir=ck)
    res = label_propagation(
        g, seeds=seeds, direction="OUTGOING", max_iterations=10, checkpoint_dir=ck, resume=True
    )
    a = full.labels.to_pandas().sort_values("vid")["label"].to_numpy()
    b = res.labels.to_pandas().sort_values("vid")["label"].to_numpy()
    assert (a == b).all()
    assert res.did_converge


@pytest.mark.parametrize("P", [1, 3])
def test_lp420_converges_to_golden_clusters(tmp_workdir, P):
    g, seeds = _build(tmp_workdir, "lp420", P=P)
    res = label_propagation(g, seeds=seeds, direction="OUTGOING", max_iterations=10)
    assert res.did_converge
    lab = _lab_by_name(g, res)
    # golden converged clusters (LabelPropagation420Test.java:158-170)
    assert lab["Alice"] == lab["Bridget"] == lab["Michael"]
    assert lab["Charles"] == lab["Doug"] == lab["Mark"]
    assert lab["Alice"] != lab["Charles"]


def test_labelprop_cancellation(tmp_workdir):
    """TerminationFlag cancels LP between iterations; a rerun on the same
    session is clean (pools were killed, no leaked reservations)."""
    import numpy as np

    from neo4j_graph_algorithms_ray.state.termination import (
        TerminatedError,
        TerminationFlag,
    )

    g, seeds = _build(tmp_workdir, "lp1")
    full = label_propagation(g, seeds=seeds, direction="BOTH", max_iterations=10)
    with pytest.raises(TerminatedError):
        label_propagation(
            g,
            seeds=seeds,
            direction="BOTH",
            max_iterations=10,
            termination=TerminationFlag(auto_after_checks=1),
        )
    res = label_propagation(g, seeds=seeds, direction="BOTH", max_iterations=10)
    a = full.labels.to_pandas().sort_values("vid")["label"].to_numpy()
    b = res.labels.to_pandas().sort_values("vid")["label"].to_numpy()
    np.testing.assert_array_equal(a, b)


def test_node_props_join_fallback_matches_broadcast(tmp_workdir):
    """node_props_to_vids above the broadcast cap (cap=1 forces the
    hash-join path) resolves the identical {vid, partition, weight} seed
    rows, and LP converges to the same labels (VERDICT r03 #2: the
    uncapped vertex-table broadcast was a driver OOM at scale)."""
    corpus, props = fixture_corpus("lp1")
    g = build_graph(rd.from_arrow(corpus), tmp_workdir, P=3)
    bcast = (
        node_props_to_vids(rd.from_arrow(props), g)
        .to_pandas().sort_values("vid").reset_index(drop=True)
    )
    joined = (
        node_props_to_vids(rd.from_arrow(props), g, cap=1)
        .to_pandas().sort_values("vid").reset_index(drop=True)
    )
    assert len(bcast) > 0
    import pandas as pd

    pd.testing.assert_frame_equal(joined[["vid", "partition", "weight"]].astype("int64"),
                                  bcast[["vid", "partition", "weight"]].astype("int64"))
    a = label_propagation(g, seeds=node_props_to_vids(rd.from_arrow(props), g, cap=1),
                          direction="OUTGOING", max_iterations=1)
    b = label_propagation(g, seeds=node_props_to_vids(rd.from_arrow(props), g),
                          direction="OUTGOING", max_iterations=1)
    la = a.labels.to_pandas().sort_values("vid")["label"].tolist()
    lb = b.labels.to_pandas().sort_values("vid")["label"].tolist()
    assert la == lb
