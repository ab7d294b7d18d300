"""Regression tests for the round-4 code-review findings:

1. __ray_entry__ must be loadable by file path from outside the repo (the
   sys.path guard must run before any package import).
2. coshuffle_lookup must not corrupt user columns named 'bucket'/'side'
   (internal transport names are now __-prefixed and collisions raise).
3. read_parquet_clean on a hive-partitioned dir must not pin the footer
   schema (which would drop the partition column from the declared schema).
4. The footer-schema cache evicts stale mtimes instead of growing forever.
5. asof_join refuses null payload values loudly (the numpy transport would
   crash or NaN-corrupt them).
6. Pair-dedup packing guards reject/bypass NEGATIVE int64 ids (two's
   complement sets every high bit, collapsing distinct pairs to one key).
7. grouped_map's size probe (limit-count, no full materialize) keeps both
   paths correct.
"""

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from neo4j_graph_algorithms_ray.sources.readers import (
    from_pandas_clean,
    read_parquet_clean,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_module_loads_from_outside_repo():
    # load /root/repo/__ray_entry__.py by path with cwd elsewhere and the
    # repo stripped from sys.path — the driver's situation
    code = (
        "import sys, importlib.util\n"
        f"sys.path = [p for p in sys.path if p != {REPO!r} and p != '']\n"
        f"spec = importlib.util.spec_from_file_location('__ray_entry__', {REPO!r} + '/__ray_entry__.py')\n"
        "m = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(m)\n"
        "assert callable(m.entry) and callable(m.queries) and callable(m.oracle_sql)\n"
        "print('OK')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], cwd="/tmp", capture_output=True, text=True
    )
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_coshuffle_lookup_preserves_user_bucket_column(ray_session):
    from neo4j_graph_algorithms_ray.stages.joins import coshuffle_lookup

    big = from_pandas_clean(
        pd.DataFrame({"k": [1, 2, 3, 4], "bucket": [10, 20, 30, 40]})
    )
    small = from_pandas_clean(pd.DataFrame({"k": [1, 2, 3, 4], "v": [5, 6, 7, 8]}))
    out = (
        coshuffle_lookup(big, small, "k", "k", "v", "val", fan=4)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(out["bucket"]) == [10, 20, 30, 40]  # was corrupted pre-fix
    assert list(out["val"]) == [5, 6, 7, 8]


def test_coshuffle_lookup_reserved_names_raise(ray_session):
    from neo4j_graph_algorithms_ray.stages.joins import coshuffle_lookup

    small = from_pandas_clean(pd.DataFrame({"k": [1], "v": [5]}))
    big = from_pandas_clean(pd.DataFrame({"k": [1], "__bucket": [9]}))
    with pytest.raises(ValueError, match="reserved"):
        coshuffle_lookup(big, small, "k", "k", "v", "val", fan=2)
    big2 = from_pandas_clean(pd.DataFrame({"k": [1], "val": [9]}))
    with pytest.raises(ValueError, match="already exists"):
        coshuffle_lookup(big2, small, "k", "k", "v", "val", fan=2)


def test_read_parquet_clean_hive_keeps_partition_column(ray_session, tmp_path):
    base = str(tmp_path / "hive")
    for part in (0, 1):
        d = os.path.join(base, f"part={part}")
        os.makedirs(d)
        # pandas to_parquet embeds b'pandas' metadata — the strip path used
        # to pin the footer schema here, hiding 'part' from ds.schema()
        pd.DataFrame({"v": [part * 10, part * 10 + 1]}).to_parquet(
            os.path.join(d, "f.parquet"), index=False
        )
    ds = read_parquet_clean(base)
    assert "part" in ds.schema().names
    out = ds.to_pandas()
    assert sorted(out.columns) == ["part", "v"]
    assert sorted(out["part"].astype(int)) == [0, 0, 1, 1]


def test_footer_schema_cache_evicts_stale_mtime(tmp_path):
    from neo4j_graph_algorithms_ray.sources import readers as R

    p = str(tmp_path / "t.parquet")
    pd.DataFrame({"a": [1]}).to_parquet(p, index=False)
    os.utime(p, (1_000_000, 1_000_000))
    s1, _ = R._footer_schema(p)
    assert s1.names == ["a"]
    pd.DataFrame({"b": [1.5]}).to_parquet(p, index=False)
    os.utime(p, (2_000_000, 2_000_000))
    s2, _ = R._footer_schema(p)
    assert s2.names == ["b"]
    # one live entry per file, not one per (file, mtime)
    assert len([k for k in R._SCHEMA_CACHE if k == p]) == 1


def test_asof_join_null_payload_raises_loudly(ray_session):
    from neo4j_graph_algorithms_ray.pipelines.temporal import asof_join

    left = from_pandas_clean(
        pd.DataFrame(
            {
                "user_id": [1, 1, 2],
                "ts": [10, 20, 30],
                "event_id": pd.array([100, None, 102], dtype="Int64"),
            }
        )
    )
    right = from_pandas_clean(
        pd.DataFrame({"o_custkey": [1, 2], "o_orderdate": [5, 6], "o_orderkey": [7, 8]})
    )
    with pytest.raises(Exception, match="null"):
        asof_join(
            left,
            right,
            left_key="user_id",
            left_ts="ts",
            right_key="o_custkey",
            right_ts="o_orderdate",
            left_cols={"event_id": ("event_id", "int64")},
            right_cols={"o_orderkey": ("o_orderkey", "int64")},
            right_tiebreak="o_orderkey",
        ).materialize()


def test_sessionize_null_value_raises_loudly(ray_session):
    from neo4j_graph_algorithms_ray.pipelines.temporal import sessionize

    ev = from_pandas_clean(
        pd.DataFrame(
            {
                "user_id": [1, 1],
                "ts": [10, 20],
                "value": pd.array([1.0, None], dtype="Float64"),
            }
        )
    )
    with pytest.raises(Exception, match="null"):
        sessionize(ev).materialize()


def _texts():
    # two exact near-dup pairs plus singletons
    base = "the quick brown fox jumps over the lazy dog again and again "
    return [
        base * 4,
        base * 4 + "extra tail words here",
        "completely different content about ray data pipelines " * 5,
        "completely different content about ray data pipelines " * 5 + "plus more",
        "a lone unique document with its own words entirely",
    ]


def test_minhash_pairs_negative_ids_match_shifted_positive(ray_session):
    from neo4j_graph_algorithms_ray.pipelines.docs import minhash_dedup_pairs

    texts = _texts()
    pos_ids = [10, 11, 12, 13, 14]
    neg_ids = [i - 12 for i in pos_ids]  # includes negatives
    d_pos = from_pandas_clean(pd.DataFrame({"doc_id": pos_ids, "text": texts}))
    d_neg = from_pandas_clean(pd.DataFrame({"doc_id": neg_ids, "text": texts}))
    p_pos = minhash_dedup_pairs(d_pos, threshold=0.5).to_pandas()
    p_neg = minhash_dedup_pairs(d_neg, threshold=0.5).to_pandas()
    assert len(p_pos) > 0

    def canon(df, shift):
        pairs = {
            tuple(sorted((int(a) + shift, int(b) + shift)))
            for a, b in zip(df["id_a"], df["id_b"])
        }
        return pairs

    assert canon(p_pos, 0) == canon(p_neg, 12)


def test_ngram_jaccard_negative_ids_raise(ray_session):
    from neo4j_graph_algorithms_ray.pipelines.docs import ngram_jaccard_pairs

    d = from_pandas_clean(
        pd.DataFrame({"doc_id": [-1, 2, 3, 4, 5], "text": _texts()})
    )
    with pytest.raises(Exception, match="doc_id"):
        ngram_jaccard_pairs(d, threshold=0.3).materialize()


def test_grouped_map_probe_both_paths(ray_session):
    from neo4j_graph_algorithms_ray.stages.agg import grouped_map

    df = pd.DataFrame({"g": [1, 1, 2, 2, 3], "v": [1, 2, 3, 4, 5]})

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"g": [b["g"].iloc[0]], "s": [int(b["v"].sum())]})

    expect = {1: 3, 2: 7, 3: 5}
    for small_rows in (100_000, 2, None):  # small path, forced big path, off
        out = grouped_map(
            from_pandas_clean(df), "g", fold, num_partitions=2, small_rows=small_rows
        ).to_pandas()
        assert dict(zip(out["g"].astype(int), out["s"].astype(int))) == expect


def test_is_infinite_not_finite_or_null():
    # IsFiniteFunc.java:36-38: isInfinite(x) == (x == null || !Double.isFinite(x)),
    # so null, NaN and ±Inf are ALL true.
    from neo4j_graph_algorithms_ray.functions.scalars import is_finite, is_infinite

    arr = pa.chunked_array([[1.0, None, float("inf"), float("-inf"), float("nan")]])
    assert is_infinite(arr).to_pylist() == [False, True, True, True, True]
    assert is_finite(arr).to_pylist() == [True, False, False, False, False]


def test_count_matches_null_text_is_zero():
    from neo4j_graph_algorithms_ray.functions import text as T

    s = pd.Series(["a b c", None, ""])
    out = T.count_matches(s, T.WORD_RE)
    assert list(out) == [3, 0, 0]  # NaN used to wrap to INT64_MIN


def test_hamming64_matches_bin_popcount():
    from neo4j_graph_algorithms_ray.functions.text import hamming64

    rng = np.random.default_rng(7)
    a = rng.integers(0, 2**63, size=257, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, 2**63, size=257, dtype=np.int64).astype(np.uint64)
    got = hamming64(a, b)
    want = [bin(int(x) ^ int(y)).count("1") for x, y in zip(a, b)]
    assert list(got) == want
    assert list(hamming64(np.array([], np.uint64), np.array([], np.uint64))) == []


def test_msbfs_depth_beyond_64(ray_session, tmp_path):
    """A 100-vertex directed chain has diameter 99 — the old default
    max_depth=64 silently truncated closeness/harmonic past depth 64."""
    import ray.data as rd

    from neo4j_graph_algorithms_ray.pipelines.centrality import (
        closeness_centrality,
        harmonic_centrality,
    )
    from neo4j_graph_algorithms_ray.pipelines.graph_build import build_graph_from_edges

    n = 100
    edges = from_pandas_clean(
        pd.DataFrame(
            {
                "src": np.arange(n - 1, dtype=np.int64),
                "dst": np.arange(1, n, dtype=np.int64),
                "weight": np.ones(n - 1),
            }
        )
    )
    g = build_graph_from_edges(edges, n, str(tmp_path / "chain"), P=2)
    c = (
        closeness_centrality(g, direction="OUTGOING")
        .scores.to_pandas()
        .sort_values("vid")["centrality"]
        .to_numpy()
    )
    # MS-BFS accumulates farness AT the visited vertex (sum of distances
    # from all sources that reach it — MSClosenessCentrality semantics):
    # with OUTGOING edges the chain's LAST vertex collects 1+2+...+99 = 4950
    # (only if BFS runs past depth 64; the old cap stopped at 64)
    assert c[n - 1] == pytest.approx((n - 1) / 4950)
    # INCOMING exercises the reverse-only layout (build_layout=False path):
    # now the FIRST vertex collects all 99 distances
    ci = (
        closeness_centrality(g, direction="INCOMING")
        .scores.to_pandas()
        .sort_values("vid")["centrality"]
        .to_numpy()
    )
    assert ci[0] == pytest.approx((n - 1) / 4950)
    h = (
        harmonic_centrality(g, direction="OUTGOING")
        .scores.to_pandas()
        .sort_values("vid")["centrality"]
        .to_numpy()
    )
    want_h = sum(1.0 / d for d in range(1, n)) / (n - 1)
    assert h[n - 1] == pytest.approx(want_h)


def test_write_relationships_out_of_bounds_raises(ray_session, tmp_path):
    from neo4j_graph_algorithms_ray.stages.sink import write_relationships

    edges = from_pandas_clean(pd.DataFrame({"u": [1, 50], "v": [2, 3]}))
    with pytest.raises(Exception, match="bounds"):
        write_relationships(edges, str(tmp_path / "rels"), [0, 5, 10])


@pytest.fixture(scope="module")
def chain_graph(ray_session, tmp_path_factory):
    """10-vertex directed chain used by the truncation/degenerate-arg tests."""
    from neo4j_graph_algorithms_ray.pipelines.graph_build import build_graph_from_edges

    n = 10
    edges = from_pandas_clean(
        pd.DataFrame(
            {
                "src": np.arange(n - 1, dtype=np.int64),
                "dst": np.arange(1, n, dtype=np.int64),
                "weight": np.ones(n - 1),
            }
        )
    )
    return build_graph_from_edges(
        edges, n, str(tmp_path_factory.mktemp("chain10")), P=2
    )


def test_pagerank_zero_iterations(chain_graph):
    """iterations=0 used to KeyError (fused) / hang forever (mailbox)."""
    from neo4j_graph_algorithms_ray.pipelines.pagerank import pagerank

    for exchange in ("fused", "mailbox"):
        res = pagerank(chain_graph, iterations=0, exchange=exchange)
        assert res.ran_iterations == 0
        df = res.scores.to_pandas()
        assert len(df) == chain_graph.n_vertices


def test_scc_raises_on_bsp_round_cap(ray_session, tmp_path):
    """A directed cycle needs ~n color rounds; a binding cap must raise, not
    silently fragment the SCC into singletons."""
    from neo4j_graph_algorithms_ray.pipelines.graph_build import build_graph_from_edges
    from neo4j_graph_algorithms_ray.pipelines.scc import strongly_connected_components

    n = 12
    edges = from_pandas_clean(
        pd.DataFrame(
            {
                "src": np.arange(n, dtype=np.int64),
                "dst": (np.arange(n, dtype=np.int64) + 1) % n,
                "weight": np.ones(n),
            }
        )
    )
    g = build_graph_from_edges(edges, n, str(tmp_path / "cycle"), P=2)
    with pytest.raises(RuntimeError, match="max_bsp_rounds"):
        strongly_connected_components(g, max_bsp_rounds=3)
    res = strongly_connected_components(g)  # default cap: one SCC
    assert res.labels.to_pandas()["label"].nunique() == 1


def test_betweenness_raises_when_depth_cap_binds(chain_graph):
    from neo4j_graph_algorithms_ray.pipelines.betweenness import betweenness_centrality

    with pytest.raises(RuntimeError, match="max_depth"):
        betweenness_centrality(chain_graph, max_depth=3)


def test_shortest_path_out_of_range_raises(chain_graph):
    from neo4j_graph_algorithms_ray.pipelines.paths import shortest_path

    with pytest.raises(ValueError, match="vids"):
        shortest_path(chain_graph, source=0, target=chain_graph.n_vertices + 5)
    with pytest.raises(ValueError, match="vids"):
        shortest_path(chain_graph, source=-1)
    res = shortest_path(chain_graph, 0, chain_graph.n_vertices - 1)
    assert res.node_count == chain_graph.n_vertices  # path covers the chain


def test_triangle_stream_fractional_coefficients(ray_session, tmp_path):
    """lookup_join used to floor coefficients to int64 (0/1)."""
    from neo4j_graph_algorithms_ray.pipelines.graph_build import build_graph_from_edges
    from neo4j_graph_algorithms_ray.procs import algo

    # triangle 0-1-2 plus a pendant 2-3: node 2 has coefficient 1/3
    e = pd.DataFrame(
        {"src": [0, 1, 0, 2], "dst": [1, 2, 2, 3], "weight": [1.0] * 4}
    )
    g = build_graph_from_edges(
        from_pandas_clean(e), 4, str(tmp_path / "tri"), P=2
    )
    out = algo.triangleCount.stream(g).to_pandas().sort_values("nodeId")
    coef = dict(zip(out["nodeId"].astype(int), out["coefficient"]))
    assert coef[2] == pytest.approx(1 / 3)
    assert coef[0] == pytest.approx(1.0)


def test_shortest_path_stream_real_cost(chain_graph):
    """The stream proc used to emit the 1e3-quantized cost_u as 'cost'."""
    from neo4j_graph_algorithms_ray.procs import algo

    out = algo.shortestPath.stream(chain_graph, 0, 3).to_pandas()
    assert list(out["cost"]) == [0.0, 1.0, 2.0, 3.0]


def test_pagerank_proc_honors_tol(chain_graph):
    from neo4j_graph_algorithms_ray.procs import algo

    stats = algo.pageRank(chain_graph, {"tol": 1e-3, "write": False})
    # tol mode: ran-to-convergence count, not the fixed default of 20
    assert int(stats["iterations"].iloc[0]) != 20
    fixed = algo.pageRank(chain_graph, {"write": False})
    assert int(fixed["iterations"].iloc[0]) == 20


def test_partition_property_precedence(chain_graph, tmp_path):
    from neo4j_graph_algorithms_ray.procs import algo

    stats = algo.unionFind(
        chain_graph,
        {"partitionProperty": "community", "writeProperty": "x",
         "writePath": str(tmp_path / "wb")},
    )
    assert stats["partitionProperty"].iloc[0] == "community"


def test_extract_edges_crlf_content(ray_session):
    from neo4j_graph_algorithms_ray.stages.extract import ImportExtractor

    t = pa.table(
        {
            "repo": ["r", "r"],
            "path": ["a.py", "b.py"],
            "commit": ["c", "c"],
            "lang": ["py", "py"],
            "content": ["import b\n", "import a\r\nprint(1)\r\n"],  # CRLF file
        }
    )
    out = ImportExtractor()(t)
    assert out.num_rows == 2  # the CRLF import used to match nothing


def test_corpus_rebuild_cleans_stale_dir(tmp_path, monkeypatch):
    from neo4j_graph_algorithms_ray.sources import corpus as C

    monkeypatch.setattr(C, "CORPUS_CACHE_ROOT", str(tmp_path))
    monkeypatch.setattr(C, "_SF_PARAMS", {"sfx": (50, 5, 3.0), "sf0.01": (50, 5, 3.0)})
    p1 = C.corpus_path_for("/data/sfx")
    import pyarrow.parquet as pq

    n1 = pq.read_table(p1).num_rows
    # simulate a crash before the marker: stale files, no _DONE
    os.remove(os.path.join(p1, "_DONE"))
    p2 = C.corpus_path_for("/data/sfx")
    assert pq.read_table(p2).num_rows == n1  # rebuilt clean, no duplicated rows


def test_sketch_ops_tolerate_null_text(ray_session):
    from neo4j_graph_algorithms_ray.pipelines.docs import (
        minhash_dedup_pairs,
        simhash_signatures,
        tfidf,
    )

    texts = _texts() + [None]
    d = from_pandas_clean(
        pd.DataFrame({"doc_id": range(len(texts)), "text": pd.array(texts, dtype="string")})
    )
    pairs = minhash_dedup_pairs(d, threshold=0.5).to_pandas()  # used to TypeError
    assert len(pairs) > 0 and 5 not in set(pairs["id_a"]) | set(pairs["id_b"])
    sh = simhash_signatures(d).to_pandas()
    assert len(sh) == len(texts)  # null doc participates as empty
    tf = tfidf(d).to_pandas()
    assert 5 not in set(tf["doc_id"])  # no terms from the null doc


def test_prepared_corpus_sparse_survivors(ray_session):
    """A harsh quality gate leaves few rows on the join's left side — the
    old Dataset.join crashed on zero-left-row partitions (Ray 2.49)."""
    from neo4j_graph_algorithms_ray.pipelines.docs import prepared_corpus

    texts = _texts()
    d = from_pandas_clean(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    out = prepared_corpus(d, min_quality=0).to_pandas()
    assert len(out) > 0
    assert sorted(out.columns) == ["clean", "doc_id", "n_tokens"]


def test_weighted_flag_exact_not_sampled(ray_session, tmp_path):
    """One non-default weight among many must flip weighted=True even when
    the bounds sample would almost surely miss it."""
    from neo4j_graph_algorithms_ray.pipelines.graph_build import build_graph_from_edges

    n = 5000
    w = np.ones(n)
    w[4321] = 2.5
    edges = from_pandas_clean(
        pd.DataFrame(
            {
                "src": np.arange(n, dtype=np.int64) % 100,
                "dst": (np.arange(n, dtype=np.int64) + 1) % 100,
                "weight": w,
            }
        )
    )
    g = build_graph_from_edges(
        edges, 100, str(tmp_path / "wg"), P=2, sample_cap=10
    )
    assert g.weighted is True
