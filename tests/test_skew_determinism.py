"""Skew armor + cross-partitioning determinism (FIXTURES.md §9-10)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray.pipelines.components import connected_components
from neo4j_graph_algorithms_ray.pipelines.graph_build import build_graph
from neo4j_graph_algorithms_ray.pipelines.pagerank import pagerank, pagerank_oracle
from neo4j_graph_algorithms_ray.pipelines.triangles import triangle_count
from neo4j_graph_algorithms_ray.sources.corpus import (
    CORPUS_SCHEMA,
    _ZERO_COMMIT,
    powerlaw_corpus_table,
)


def skew_star_corpus(n_spokes: int = 2000, n_background: int = 100) -> pa.Table:
    """One hub imported by every spoke + a few background edges (FIXTURES §9)."""
    rng = np.random.default_rng(99)
    rows = {c: [] for c in CORPUS_SCHEMA.names}

    def add(path, content):
        rows["repo"].append("skew")
        rows["path"].append(path)
        rows["commit"].append(_ZERO_COMMIT)
        rows["lang"].append("py")
        rows["content"].append(content)

    add("hub.py", '"""hub"""\nX = 0\n')
    for i in range(n_spokes):
        extra = ""
        if i < n_background:
            j = int(rng.integers(n_spokes))
            if j != i:
                extra = f"\nimport s{j:05d}"
        add(f"s{i:05d}.py", f'"""s"""\nimport hub{extra}\n')
    return pa.table(rows, schema=CORPUS_SCHEMA)


def test_skew_star_pagerank_and_cc(tmp_workdir):
    corpus = skew_star_corpus()
    g = build_graph(rd.from_arrow(corpus), tmp_workdir, P=4)
    res = pagerank(g, iterations=20)
    df = res.scores.to_pandas().sort_values("vid")
    e = g.edges_ds().to_pandas()
    oracle = pagerank_oracle(g.n_vertices, e.src.to_numpy(), e.dst.to_numpy(), iterations=20)
    np.testing.assert_allclose(df["score"].to_numpy(), oracle, atol=1e-9)
    # the hub absorbs ~all mass
    vt = g.vertices_ds().to_pandas()
    hub_vid = int(vt[vt["key"] == "skew/hub.py"]["vid"].iloc[0])
    assert df.set_index("vid").loc[hub_vid, "score"] == df["score"].max()
    cc = connected_components(g)
    assert cc.set_count() == 1  # star connects everything


@pytest.mark.parametrize("algo", ["pagerank", "cc", "triangles"])
def test_identical_results_across_partitionings(tmp_path, algo):
    """FIXTURES §10.4 analogue: results must not depend on P (the in-session
    proxy for 'identical outputs at num_cpus=8 vs 32')."""
    corpus = powerlaw_corpus_table(n_files=300, n_repos=6, avg_out=5.0, seed=21)
    outs = []
    for P in (1, 5):
        g = build_graph(rd.from_arrow(corpus), str(tmp_path / f"p{P}"), P=P)
        if algo == "pagerank":
            df = pagerank(g, iterations=30).scores.to_pandas().sort_values("vid")
            outs.append(df["score"].to_numpy())
        elif algo == "cc":
            df = connected_components(g).labels.to_pandas().sort_values("vid")
            outs.append(df["label"].to_numpy())
        else:
            res = triangle_count(g)
            df = res.counts.to_pandas().sort_values("vid")
            outs.append(df["triangles"].to_numpy())
    if algo == "pagerank":
        np.testing.assert_allclose(outs[0], outs[1], rtol=0, atol=1e-12)
    else:
        assert np.array_equal(outs[0], outs[1])
