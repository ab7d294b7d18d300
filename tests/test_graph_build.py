"""Corpus -> edge table conformance (FIXTURES.md §0 encoding + §10 invariants)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray.pipelines.graph_build import BuiltGraph, build_graph
from neo4j_graph_algorithms_ray.sources.corpus import (
    fixture_corpus,
    powerlaw_corpus_table,
)
from neo4j_graph_algorithms_ray.stages.extract import ImportExtractor


def edge_set(graph: BuiltGraph, key_by_vid: dict[int, str]) -> set[tuple[str, str, float]]:
    df = graph.edges_ds().to_pandas()
    return {
        (key_by_vid[s].split("/")[-1][:-3], key_by_vid[d].split("/")[-1][:-3], w)
        for s, d, w in zip(df["src"], df["dst"], df["weight"])
    }


def vid_keys(graph: BuiltGraph) -> dict[int, str]:
    vt = graph.vertices_ds().to_pandas()
    return dict(zip(vt["vid"], vt["key"]))


def test_pr1_edges(tmp_workdir):
    corpus, _ = fixture_corpus("pr1")
    g = build_graph(rd.from_arrow(corpus), tmp_workdir, P=3)
    assert g.n_vertices == 10
    assert g.n_edges == 9
    kv = vid_keys(g)
    # dense ids sorted by key: a..j -> 0..9 (IdMap ascending contract)
    assert kv[0].endswith("/a.py") and kv[9].endswith("/j.py")
    expect = {
        ("b", "c"), ("c", "b"), ("d", "a"), ("d", "b"),
        ("e", "b"), ("e", "d"), ("e", "f"), ("f", "b"), ("f", "e"),
    }
    assert {(s, d) for s, d, _ in edge_set(g, kv)} == expect


def test_uf1_weighted_edges(tmp_workdir):
    corpus, _ = fixture_corpus("uf1")
    g = build_graph(rd.from_arrow(corpus), tmp_workdir, P=2)
    es = edge_set(g, vid_keys(g))
    assert ("D", "E", 4.2) in es
    assert ("A", "B", 10.0) in es
    assert len(es) == 7
    assert g.weighted


def test_unresolved_imports_dropped(tmp_workdir):
    corpus = powerlaw_corpus_table(n_files=50, n_repos=5, avg_out=3.0, seed=7)
    g = build_graph(rd.from_arrow(corpus), tmp_workdir, P=2)
    kv = vid_keys(g)
    assert g.n_vertices == 50
    # every edge endpoint resolves to a real file; stdlib imports are gone
    df = g.edges_ds().to_pandas()
    assert df["src"].between(0, 49).all() and df["dst"].between(0, 49).all()
    assert (df["src"] != df["dst"]).all()


def test_sha256_content_invariance(tmp_workdir):
    """FIXTURES.md §10.1: pipeline-visible content hashes equal the input's."""
    corpus = powerlaw_corpus_table(n_files=30, n_repos=3, avg_out=3.0, seed=9)
    in_hashes = {
        (r, p): hashlib.sha256(c.encode()).hexdigest()
        for r, p, c in zip(
            corpus["repo"].to_pylist(), corpus["path"].to_pylist(), corpus["content"].to_pylist()
        )
    }
    ds = rd.from_arrow(corpus)

    def sha_batch(t: pa.Table) -> pa.Table:
        hs = [hashlib.sha256(c.encode()).hexdigest() for c in t["content"].to_pylist()]
        return pa.table({"repo": t["repo"], "path": t["path"], "sha": pa.array(hs)})

    out = ds.map_batches(sha_batch, batch_format="pyarrow").to_pandas()
    out_hashes = {(r, p): s for r, p, s in zip(out["repo"], out["path"], out["sha"])}
    assert out_hashes == in_hashes


def test_extractor_other_langs():
    ex = ImportExtractor()
    batch = pa.table(
        {
            "repo": ["r"] * 4,
            "path": ["x.js", "A.java", "m.c", "p.go"],
            "lang": ["js", "java", "c", "go"],
            "content": [
                "import {f} from './util'\n",
                "import com.acme.Widget;\n",
                '#include "lib/core.h"\n',
                'import "pkg/tool"\n',
            ],
        }
    )
    out = ex(batch).to_pydict()
    assert out["dst_key"] == ["r/util.js", "r/com/acme/Widget.java", "r/lib/core.h", "r/pkg/tool.go"]


def test_bounds_cover_and_balance(tmp_workdir):
    corpus = powerlaw_corpus_table(n_files=400, n_repos=4, avg_out=6.0, seed=3)
    g = build_graph(rd.from_arrow(corpus), tmp_workdir, P=4)
    assert g.bounds[0] == 0 and g.bounds[-1] == g.n_vertices
    assert np.all(np.diff(g.bounds) > 0)
    df = g.edges_ds().to_pandas()
    parts = g.shard_of(df["src"].to_numpy())
    counts = np.bincount(parts, minlength=g.P)
    # degree-balanced: no shard has more than 2.5x the mean edge count
    assert counts.max() <= 2.5 * counts.mean()


def test_read_corpus_csv_jsonl_parquet_equivalent(tmp_workdir, tmp_path):
    """Generic-format ingest (sources/readers.py): the same corpus via CSV,
    JSON-lines, and Parquet builds identical graphs."""
    import json as _json

    import pyarrow.parquet as _pq

    from neo4j_graph_algorithms_ray.sources.corpus import fixture_corpus
    from neo4j_graph_algorithms_ray.sources.readers import read_corpus

    corpus, _ = fixture_corpus("pr1")
    pdf = corpus.to_pandas()
    pq_path = str(tmp_path / "c.parquet")
    _pq.write_table(corpus, pq_path)
    csv_path = str(tmp_path / "c.csv")
    pdf.to_csv(csv_path, index=False)
    jl_path = str(tmp_path / "c.jsonl")
    with open(jl_path, "w") as f:
        for rec in pdf.to_dict(orient="records"):
            f.write(_json.dumps(rec) + "\n")

    def edge_set(ds, wd):
        g = build_graph(ds, wd, P=2)
        e = g.edges_ds(columns=["src", "dst"]).to_pandas()
        return sorted(zip(e["src"], e["dst"])), g.n_vertices

    e_pq, n_pq = edge_set(read_corpus(pq_path), tmp_workdir + "/pq")
    e_csv, n_csv = edge_set(read_corpus(csv_path), tmp_workdir + "/csv")
    e_jl, n_jl = edge_set(read_corpus(jl_path), tmp_workdir + "/jl")
    assert n_pq == n_csv == n_jl and len(e_pq) > 0
    assert e_pq == e_csv == e_jl


def test_read_corpus_json_array_vs_jsonl_sniffed(tmp_path):
    """A '.json' file is sniffed: '[' means a top-level array, anything else
    JSON-lines — both parse to the same rows (ADVICE r03: the blind
    '.json'->JSONL mapping misparsed array files)."""
    import json as _json

    from neo4j_graph_algorithms_ray.sources.corpus import fixture_corpus
    from neo4j_graph_algorithms_ray.sources.readers import read_corpus

    corpus, _ = fixture_corpus("pr1")
    pdf = corpus.to_pandas()
    arr_path = str(tmp_path / "arr.json")
    with open(arr_path, "w") as f:
        _json.dump(pdf.to_dict(orient="records"), f, indent=1)
    jl_path = str(tmp_path / "lines.json")
    with open(jl_path, "w") as f:
        for rec in pdf.to_dict(orient="records"):
            f.write(_json.dumps(rec) + "\n")

    def rows(ds):
        d = ds.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
        return d[["repo", "path", "commit", "lang", "content"]]

    expected = rows(read_corpus(str(tmp_path / "arr.json"), format="json_array"))
    pd.testing.assert_frame_equal(rows(read_corpus(arr_path)), expected)
    pd.testing.assert_frame_equal(rows(read_corpus(jl_path)), expected)
    assert len(expected) == len(pdf)


def test_read_corpus_preserves_numeric_looking_text(tmp_path):
    """CSV type inference must not corrupt numeric-looking values: a commit
    '123e45' read as a double round-trips as '1.23e+47', '000123' loses its
    zeros, '2.0' reformats — the corpus columns are forced to string at
    parse.  The parquet path must apply the same all-string normalization
    (an int64 commit column arrives as canonical string)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neo4j_graph_algorithms_ray.sources.readers import read_corpus

    rows = {
        "repo": ["r", "r", "r"],
        "path": ["a.py", "b.py", "c.py"],
        "commit": ["123e45", "000123", "2.0"],
        "lang": ["py", "py", "py"],
        "content": ["1.50", "007", "plain text"],
    }
    csv_path = str(tmp_path / "corpus.csv")
    with open(csv_path, "w") as f:
        f.write(",".join(rows) + "\n")
        for i in range(3):
            f.write(",".join(rows[c][i] for c in rows) + "\n")
    got = read_corpus(csv_path).to_pandas().sort_values("path").reset_index(drop=True)
    assert list(got["commit"]) == ["123e45", "000123", "2.0"]
    assert list(got["content"]) == ["1.50", "007", "plain text"]

    # parquet with a non-string column: normalized to string, not passed through
    pq_path = str(tmp_path / "corpus.parquet")
    t = pa.table({**{k: v for k, v in rows.items() if k != "commit"}, "commit": pa.array([123, 456, 789], pa.int64())})
    pq.write_table(t, pq_path)
    got = read_corpus(pq_path).to_pandas()
    assert got["commit"].dtype == object and set(got["commit"]) == {"123", "456", "789"}
