"""Round-5 adversarial-review regression tests.

Covers the confirmed findings from the round-5 diff review:
1. fresh (resume=False) runs must NOT warm-start from a stale checkpoint
   left by a previous run in the same checkpoint_dir (shards rehydrate in
   __init__ for the max_restarts failover path; CheckpointManager.reset()
   clears the manifest before the pool spawns),
2. ran_iterations counts every apply since the CALL's start, including
   iterations retained across a mid-run failover rollback,
3. register_procedure at a namespace node a dotted extension created is a
   legitimate registration, not a builtin shadow.
"""

import numpy as np
import pytest
import ray
import ray.data as rd

from neo4j_graph_algorithms_ray.pipelines.graph_build import build_graph
from neo4j_graph_algorithms_ray.pipelines.pagerank import pagerank
from neo4j_graph_algorithms_ray.sources.corpus import fixture_corpus


def _build(tmp_workdir, name, P):
    corpus, _ = fixture_corpus(name)
    return build_graph(rd.from_arrow(corpus), tmp_workdir, P=P)


def _scores(res):
    return res.scores.to_pandas().sort_values("vid")["score"].to_numpy()


def test_fresh_run_ignores_stale_checkpoint(tmp_workdir, tmp_path):
    """Two successive resume=False runs into the SAME checkpoint_dir must be
    identical: the second run's shards must start pristine, not rehydrate the
    first run's committed iteration (which would compound 2x iterations)."""
    g = _build(tmp_workdir, "pr-wiki", 3)
    ckpt = str(tmp_path / "ckpt")
    clean = pagerank(g, iterations=12)
    first = pagerank(g, iterations=12, checkpoint_dir=ckpt, checkpoint_every=3)
    # manifest from `first` is now on disk; a fresh run must not load it
    second = pagerank(g, iterations=12, checkpoint_dir=ckpt, checkpoint_every=3)
    np.testing.assert_allclose(_scores(clean), _scores(first), rtol=0, atol=0)
    np.testing.assert_allclose(_scores(clean), _scores(second), rtol=0, atol=0)
    assert second.ran_iterations == 12


def test_fresh_scc_ignores_stale_checkpoint(tmp_workdir, tmp_path):
    from neo4j_graph_algorithms_ray.pipelines.scc import strongly_connected_components as scc

    g = _build(tmp_workdir, "scc1", 2)
    ckpt = str(tmp_path / "ckpt")
    clean = scc(g).labels.to_pandas().sort_values("vid")["label"].to_numpy()
    scc(g, checkpoint_dir=ckpt, checkpoint_every=1)
    again = (
        scc(g, checkpoint_dir=ckpt, checkpoint_every=1)
        .labels.to_pandas()
        .sort_values("vid")["label"]
        .to_numpy()
    )
    np.testing.assert_array_equal(clean, again)


def test_failover_ran_iterations_counts_kept_applies(tmp_workdir, tmp_path):
    """After a rollback the retried segment starts at manifest+1; the result
    must still report the full apply count for this call, not the segment's."""
    from tests.test_failover import _KillOnce

    g = _build(tmp_workdir, "pr-wiki", 3)
    res = pagerank(
        g, iterations=20, exchange="direct",
        checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_every=4,
        chaos_hook=_KillOnce(at=7),
    )
    assert res.metrics["failovers"] == 1
    assert res.ran_iterations == 20


def test_register_procedure_namespace_parent_allowed():
    """'myextns.sub' creates algo.myextns; registering 'myextns' afterwards is
    an extension registration (merge), not a builtin shadow."""
    import pandas as pd

    from neo4j_graph_algorithms_ray import procs
    from neo4j_graph_algorithms_ray.extension import register_procedure

    register_procedure("myextns.sub", stream=lambda ctx: pd.DataFrame({"x": [1]}))
    # must not raise "would shadow the builtin algo.myextns procedure"
    register_procedure("myextns", write=lambda ctx: pd.DataFrame({"y": [2]}))
    # both remain reachable: the parent write proc carries the child namespace
    assert callable(procs.algo.myextns)
    assert hasattr(procs.algo.myextns, "sub")


def test_checkpoint_reset_clears_manifest(tmp_path):
    import os

    import pyarrow as pa

    from neo4j_graph_algorithms_ray.state.checkpoint import (
        CheckpointManager,
        atomic_save_table,
    )

    cm = CheckpointManager(str(tmp_path), "pagerank")
    f = atomic_save_table(pa.table({"v": [1]}), cm.state_dir(), 3, 0)
    cm.commit_iteration(3, [f], {"algo": "pagerank", "bounds": [0, 1]})
    assert cm.latest() is not None
    cm.reset()
    assert cm.latest() is None
    assert not os.path.exists(f)


def test_part_parse_survives_partlike_checkpoint_dir(tmp_workdir, tmp_path):
    """Session-3 review finding: the state-file part-number parse split the
    FULL path on 'part=', so a checkpoint dir whose own path contains
    'part=' (e.g. a Hive-partitioned data tree) crashed every resume and
    rehydrate.  part_of() must parse the basename only — and an end-to-end
    checkpoint+resume into such a directory must work."""
    from neo4j_graph_algorithms_ray.state.checkpoint import files_by_part, part_of

    hostile = "/data/part=3/ckpt/scc/iter=000001.part=00002.parquet"
    assert part_of(hostile) == 2
    assert files_by_part([hostile]) == {2: hostile}

    # end-to-end: checkpoint + resume under a part= directory
    g = _build(tmp_workdir, "pr-wiki", 3)
    ckpt = str(tmp_path / "part=3" / "ckpt")
    clean = pagerank(g, iterations=12)
    pagerank(g, iterations=12, checkpoint_dir=ckpt, checkpoint_every=3)
    resumed = pagerank(g, iterations=12, checkpoint_dir=ckpt, resume=True)
    np.testing.assert_allclose(_scores(resumed), _scores(clean), rtol=0, atol=1e-12)


def test_shortest_path_raises_at_round_cap(tmp_workdir):
    """shortest_path must raise (not silently truncate) when the relaxation
    is still progressing at max_rounds — same contract as the other fused
    BSP call sites."""
    from neo4j_graph_algorithms_ray.pipelines.paths import shortest_path

    g = _build(tmp_workdir, "uf-lines", 2)  # 10-node directed line from vid 0
    with pytest.raises(RuntimeError, match="still progressing"):
        shortest_path(g, 0, max_rounds=2)
    # same call with room converges fine
    res = shortest_path(g, 0, max_rounds=100)
    assert res.node_count >= 2


def _mini_corpus(files: dict) -> "object":
    """files: name -> [(target, weight)] import list; returns a corpus table."""
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.sources.corpus import CORPUS_SCHEMA

    names = sorted(files)
    rows = {c: [] for c in ("repo", "path", "commit", "lang", "content")}
    for n in names:
        lines = [f'"""module {n}"""']
        lines += [f"import {m}  # w={w}" for m, w in files[n]]
        lines.append(f"X_{n} = 1")
        rows["repo"].append("r")
        rows["path"].append(f"{n}.py")
        rows["commit"].append("0" * 40)
        rows["lang"].append("py")
        rows["content"].append("\n".join(lines) + "\n")
    return pa.table(rows, schema=CORPUS_SCHEMA)


def test_sssp_pred_tie_break_across_rounds(tmp_workdir):
    """Two equal-cost paths into b (cost 2.0): direct from c (pred vid 2,
    arrives round 1) and via a (pred vid 0, arrives round 2).  The documented
    convention — smallest pred vid among equal distances — must hold ACROSS
    rounds, not just within one fold."""
    from neo4j_graph_algorithms_ray.pipelines.graph_build import build_graph
    from neo4j_graph_algorithms_ray.pipelines.paths import shortest_path

    corpus = _mini_corpus(
        {"a": [("b", 1.0)], "b": [], "c": [("b", 2.0), ("a", 1.0)]}
    )  # vids: a=0 b=1 c=2
    g = build_graph(rd.from_arrow(corpus), tmp_workdir, P=2)
    res = shortest_path(g, source=2, target=1, weighted=True)
    assert res.total_cost == pytest.approx(2.0)
    assert list(res.path["vid"]) == [2, 0, 1]  # walks the min-pred parent (a)


def test_range_join_selfjoin_requires_distinct_out_names():
    from neo4j_graph_algorithms_ray.pipelines.temporal import range_join

    ev = rd.from_pandas(
        __import__("pandas").DataFrame(
            {"k": [1], "ts": [__import__("pandas").Timestamp("2024-01-01")], "eid": [1]}
        )
    )
    with pytest.raises(ValueError, match="distinct output names"):
        range_join(
            ev, ev, left_key="k", left_ts="ts", right_key="k", right_ts="ts",
            left_id="eid", right_id="eid", lookback_us=10,
        )


def test_lookup_join_broadcast_string_payload():
    """The broadcast (<= cap) route must carry string payloads like the
    coshuffle (> cap) route — no behavior cliff at the row cap."""
    import pandas as pd

    from neo4j_graph_algorithms_ray.stages.joins import lookup_join

    big = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2, 3]}))
    small = pd.DataFrame({"doc_id": [1, 3], "text": ["one", "three"]})
    out = (
        lookup_join(big, small, "doc_id", "text", default=None)
        .to_pandas().sort_values("doc_id")
    )
    assert list(out["text"]) == ["one", None, "three"]


def test_coarse_centroids_sparse_ids_train_full_codebook():
    """vec_ids sparser than the sample window (stride > sample) used to
    silently train ~1 centroid (every vector -> one bucket -> corpus-wide
    O(n^2) verify); the positional fallback must yield the full codebook."""
    import pandas as pd

    from neo4j_graph_algorithms_ray.pipelines.similarity import coarse_centroids

    rng = np.random.default_rng(3)
    n, dim = 32, 8
    emb = rd.from_pandas(
        pd.DataFrame(
            {
                "vec_id": (np.arange(n, dtype=np.int64) + 1) * 10**9,
                "embedding": list(rng.standard_normal((n, dim)).astype(np.float32)),
            }
        )
    )
    C = coarse_centroids(emb, n_centroids=4, iters=1, sample=16)
    assert C.shape == (4, dim)


def test_star_contraction_raises_at_round_cap(tmp_workdir):
    """An exhausted star-contraction cap must raise, not silently assemble
    fragmented labels from a non-star edge set (verified: max_rounds=1 on a
    path graph used to return ~n/2 labels for ONE component)."""
    from neo4j_graph_algorithms_ray.pipelines.components import connected_components

    g = _build(tmp_workdir, "uf-lines", 2)  # 16 ten-vertex paths
    with pytest.raises(RuntimeError, match="star-contraction"):
        connected_components(g, mode="starcontract", max_rounds=1)
    ok = connected_components(g, mode="starcontract", max_rounds=64)
    assert ok.set_count() == 16  # one component per line


def test_resumable_write_string_partitions_no_duplication(tmp_path):
    """Marker/cleanup dirs must use Ray's URI-encoded hive names: with a raw
    f-string, a crash-resume on a value like 'a b' rmtree'd the wrong dir
    and appended duplicate rows."""
    import os

    import pandas as pd

    from neo4j_graph_algorithms_ray.stages.sink import (
        read_partitioned,
        resumable_write,
    )

    df = pd.DataFrame({"grp": ["a b", "a b", "plain"], "x": [1, 2, 3]})
    out = str(tmp_path / "sink")
    wrote = resumable_write(rd.from_pandas(df), out, partition_col="grp")
    assert sorted(wrote) == ["a b", "plain"]
    # the marker must live in the SAME dir write_parquet created
    assert os.path.exists(os.path.join(out, "grp=a%20b", "_DONE"))
    # simulate a crash before the marker: delete it, resume — the half
    # partition must be cleaned and rewritten whole, not appended to
    os.remove(os.path.join(out, "grp=a%20b", "_DONE"))
    wrote2 = resumable_write(rd.from_pandas(df), out, partition_col="grp")
    assert wrote2 == ["a b"]
    back = read_partitioned(out).to_pandas()
    assert len(back) == 3  # no duplicated rows
    done = resumable_write(rd.from_pandas(df), out, partition_col="grp")
    assert done == []  # everything marked


def test_betweenness_rejects_int16_overflow_depth(tmp_workdir):
    from neo4j_graph_algorithms_ray.pipelines.betweenness import betweenness_centrality

    g = _build(tmp_workdir, "pr1", 2)
    with pytest.raises(ValueError, match="int16 depth"):
        betweenness_centrality(g, max_depth=50_000)


def test_labelprop_rejects_out_of_range_seeds(tmp_workdir):
    """A foreign/stale seed vid used to IndexError (one past the bound) or be
    SILENTLY dropped (below it); both now raise with a clear message."""
    import pandas as pd

    from neo4j_graph_algorithms_ray.pipelines.labelprop import label_propagation

    g = _build(tmp_workdir, "lp420", 2)
    bad = rd.from_pandas(pd.DataFrame({"vid": [g.n_vertices], "seed": [7]}))
    with pytest.raises(Exception, match="outside the graph's range"):
        label_propagation(g, seeds=bad, max_iterations=2)


def test_simhash_memory_kernel_matches_bit_formula():
    """The unpackbits kernel must be bit-identical to the definitional
    (hv >> k) & 1 vote sum (the SQL oracle replays the same rule)."""
    from neo4j_graph_algorithms_ray.functions import text as T

    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "ee", "ff"]
    texts = [" ".join(rng.choice(words, size=int(k))) if k else ""
             for k in rng.integers(0, 300, size=100)] + [None, "", "one"]
    got = T.batch_simhash64(texts)
    toks_all, counts = [], []
    for t in texts:
        toks = T.WS_TOKEN_RE.findall(t.lower()) if isinstance(t, str) else []
        toks_all.extend(toks)
        counts.append(len(toks))
    counts = np.array(counts, dtype=np.int64)
    exp = np.zeros(len(counts), dtype=np.uint64)
    if toks_all:
        hv = T.hash_strings(toks_all)
        bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int32)
        signed = 2 * bits - 1
        starts = np.cumsum(counts) - counts
        nz = counts > 0
        acc = np.add.reduceat(signed, starts[nz], axis=0)
        exp[nz] = ((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)
    np.testing.assert_array_equal(got, exp)


def test_band_keys_rejects_bands_over_num_perm():
    from neo4j_graph_algorithms_ray.functions import text as T

    with pytest.raises(ValueError, match="exceeds num_perm"):
        T.band_keys(np.zeros((2, 64), dtype=np.uint64), bands=128)


def test_hash_strings_null_deterministic():
    """Nulls hash as the empty string in both the DuckDB and hashlib paths
    (md5_number_lower(NULL) used to flow out as NaN->uint64 garbage)."""
    import hashlib

    from neo4j_graph_algorithms_ray.functions import text as T

    h = T.hash_strings(["a", None, ""])
    exp = int.from_bytes(hashlib.md5(b"").digest()[8:16], "little")
    assert h[1] == h[2] == exp


def test_multimodal_empty_batch_keeps_string_schema():
    """A zero-row block must keep media_type/kind typed string — untyped
    pa.array([]) infers null and breaks block-schema unification."""
    import pandas as pd

    from neo4j_graph_algorithms_ray.pipelines.multimodal import attach_binary_payload

    pa = __import__("pyarrow")
    t_empty = pa.table({"doc_id": pa.array([], "int64"), "text": pa.array([], "string")})
    t_full = pa.table({"doc_id": pa.array([1], "int64"), "text": pa.array(["hello world"], "string")})
    # an empty block next to a full one: untyped pa.array([]) made the empty
    # block's media_type null and block-schema unification degraded/crashed
    out = attach_binary_payload(rd.from_arrow(t_empty).union(rd.from_arrow(t_full))).materialize()
    sch = out.schema()
    assert str(dict(zip(sch.names, sch.types))["media_type"]) == "string"
    assert out.count() == 1


def test_grouped_map_arrow_null_keys_one_group():
    """The Arrow small path must group adjacent NaN/null keys into ONE group
    (pandas dropna=False semantics), not one group per row."""
    import pandas as pd
    import pyarrow as pa

    from neo4j_graph_algorithms_ray.stages.agg import grouped_map

    t = pa.table({"k": pa.array([1.0, None, float("nan"), 1.0], pa.float64()),
                  "v": pa.array([1, 2, 3, 4], pa.int64())})

    def agg_one(g: pa.Table) -> pa.Table:
        return pa.table({"k": g["k"].slice(0, 1),
                         "n": pa.array([g.num_rows], pa.int64())})

    out = grouped_map(rd.from_arrow(t), "k", agg_one, batch_format="pyarrow").to_pandas()
    # two groups: k=1.0 (n=2) and the null/NaN group (n=2)
    assert sorted(out["n"]) == [2, 2]


def test_powerlaw_corpus_exact_repo_count_non_divisible():
    """Non-divisible n_files/n_repos folds the remainder into the last repo:
    exactly n_repos repos, every import target resolvable."""
    from neo4j_graph_algorithms_ray.sources.corpus import powerlaw_corpus_table

    t = powerlaw_corpus_table(n_files=110, n_repos=4, avg_out=3.0, seed=9)
    repos = sorted(set(t["repo"].to_pylist()))
    assert len(repos) == 4
    # the last repo holds the remainder: 27 + (110 - 4*27) = 37? fpr=27 -> 3*27=81, last=29
    import collections
    cnt = collections.Counter(t["repo"].to_pylist())
    fpr = 110 // 4
    assert cnt[repos[-1]] == fpr + (110 - 4 * fpr)


def test_scc_raises_on_exhausted_outer_cap(tmp_workdir):
    """Two 2-cycles in one weak component (the max-vid cycle peels first, the
    other needs round 2): max_outer=1 must RAISE, not publish label=-1 rows
    as a bogus extra component; enough rounds assigns everything."""
    from neo4j_graph_algorithms_ray.pipelines.graph_build import build_graph
    from neo4j_graph_algorithms_ray.pipelines.scc import strongly_connected_components as scc

    corpus = _mini_corpus(
        {"a": [("b", 1.0)], "b": [("a", 1.0)],
         "c": [("d", 1.0), ("a", 1.0)], "d": [("c", 1.0)]}
    )  # cycle {c,d} feeds cycle {a,b}: probed to need 2 working rounds
    g = build_graph(rd.from_arrow(corpus), tmp_workdir, P=2)
    with pytest.raises(RuntimeError, match="unassigned vertices"):
        scc(g, max_outer=1)
    res = scc(g)
    sizes = res.labels.to_pandas().groupby("label").size().tolist()
    assert sorted(sizes) == [2, 2]
