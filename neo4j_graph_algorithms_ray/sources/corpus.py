"""Deterministic synthetic source-code corpora.

Every pipeline input in this engine is a Parquet table with schema
``(repo: string, path: string, commit: string, lang: string, content: string)``
(the BASELINE.json input_hint).  This module synthesises such corpora:

- the conformance fixtures from FIXTURES.md, re-encoding the reference's
  hand-built test graphs (``/root/reference/tests/.../PageRankTest.java:64-103``
  etc.) as tiny repos whose ``import`` lines are the graph's edges, and
- a seeded power-law corpus for benchmarks and scale tests (skewed in-degree,
  a per-repo "stdlib" module imported by many files — the skew shape called
  out in the reference's partitioning rationale, ``PageRank.java:86-91``).

Encoding rule (FIXTURES.md §0): node *X* of a graph is file ``<X>.py`` in some
repo; a directed edge X→Y with weight w is the line ``import <Y>  # w=<w>``
(weight suffix optional) in X's content.  Vertex key = ``repo + '/' + path``.
Generation is fully deterministic: the power-law generator derives every
file's RNG from a counter-based Philox stream keyed by ``(seed, file_id)``,
so output is independent of batch boundaries and parallelism.
"""

from __future__ import annotations

import os
from typing import Iterable

import numpy as np
import pyarrow as pa

CORPUS_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)

NODEPROPS_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("partition", pa.int64()),
        ("weight", pa.float64()),
    ]
)

_ZERO_COMMIT = "0" * 40

# ---------------------------------------------------------------------------
# Fixture graphs (FIXTURES.md §1-§8)
# ---------------------------------------------------------------------------


def _edges(spec: str) -> list[tuple[str, str, float | None]]:
    """Parse ``'a>b a>c:4.2'`` into (src, dst, weight|None) triples."""
    out = []
    for tok in spec.split():
        pair, _, w = tok.partition(":")
        s, _, d = pair.partition(">")
        out.append((s, d, float(w) if w else None))
    return out


# name -> (node->repo mapping or single repo, node list, edge spec,
#          optional node props {node: (partition, weight)})
_FIX: dict[str, dict] = {
    # FIXTURES.md §1 / reference PageRankTest.java:64-103
    "pr1": dict(
        repo="fixture-pr1",
        nodes=list("abcdefghij"),
        edges="b>c c>b d>a d>b e>b e>d e>f f>b f>e",
    ),
    # FIXTURES.md §2 / reference PageRankWikiTest.java:61-141 (a is dangling)
    "pr-wiki": dict(
        repo="fixture-prwiki",
        nodes=list("abcdefghijk"),
        edges="b>c c>b d>a d>b e>b e>d e>f f>b f>e "
        "g>b g>e h>b h>e i>b i>e j>e k>e",
    ),
    # FIXTURES.md §3 / reference UnionFindProcIntegrationTest.java:54-79
    "uf1": dict(
        repo="fixture-uf1",
        nodes=list("ABCDEFGHIJ"),
        edges="A>B:10.0 B>C:10.0 C>D:10.0 D>E:4.2 E>F:10.0 F>G:10.0 H>I:10.0",
    ),
    # FIXTURES.md §6 / reference LabelPropagation420Test.java:84-100
    "lp420": dict(
        repo="fixture-lp420",
        nodes=["Alice", "Bridget", "Charles", "Doug", "Mark", "Michael"],
        edges="Alice>Bridget Alice>Charles Mark>Doug Bridget>Michael "
        "Doug>Mark Michael>Alice Alice>Michael Bridget>Alice "
        "Michael>Bridget Charles>Doug",
        props={
            "Alice": (2, 1.0),
            "Bridget": (3, 1.0),
            "Charles": (4, 1.0),
            "Doug": (3, 1.0),
            "Mark": (4, 1.0),
            "Michael": (2, 1.0),
        },
    ),
    # FIXTURES.md §7 / reference TriangleProcTest.java:44-51
    "tri1": dict(
        repo="fixture-tri1",
        nodes=list("abcdefghi"),
        edges="a>b b>c c>a c>h d>e e>f f>d b>d g>h h>i i>g",
    ),
    # FIXTURES.md §8 / reference ClusteringCoefficientWikiTest.java:44-102
    "tri-wiki": dict(
        repo="fixture-triwiki",
        nodes=list("abcd"),
        edges="a>b a>c a>d b>d",
    ),
    # reference LouvainClusteringIntegrationTest.java:60-88 — two 4-cliques
    # bridged by b-e plus isolated z; converged communityCount = 3
    "louvain": dict(
        repo="fixture-louvain",
        nodes=list("abcdefghz"),
        edges="a>b a>c a>d c>d b>c b>d f>e e>g e>h f>h f>g g>h b>e",
    ),
    # reference BetweennessCentralityIntegrationTest.java:77-97 — directed
    # ring A -> center -> ring B; ring nodes 6.0, center 25.0
    "bc-rings": dict(
        repo="fixture-bcrings",
        nodes=[f"a{i}" for i in range(5)] + ["center"] + [f"z{i}" for i in range(5)],
        edges=" ".join(
            [f"a{i}>a{(i + 1) % 5}" for i in range(5)]
            + [f"a{i}>center" for i in range(5)]
            + [f"center>z{i}" for i in range(5)]
            + [f"z{i}>z{(i + 1) % 5}" for i in range(5)]
        ),
    ),
    # reference StronglyConnectedComponentsProcIntegrationTest.java:52-66 —
    # SCCs {a,b,c} and {d,e}
    "scc1": dict(
        repo="fixture-scc1",
        nodes=list("abcde"),
        edges="a>b b>a a>c c>a b>c c>b d>e e>d",
    ),
    # reference MSTPrimProcIntegrationTest.java:61-71 — weightSum 12,
    # min 1, max 5, 4 relationships
    "mst1": dict(
        repo="fixture-mst1",
        nodes=list("abcde"),
        edges="a>b:1.0 a>c:2.0 b>c:3.0 b>d:4.0 c>e:5.0 d>e:6.0",
    ),
    # reference ShortestPathIntegrationTest.java:60-75 — nA->nX direct 5.0,
    # via nB 4.0, via nC,nD 3.0 (the shortest, 4 nodes)
    "sp1": dict(
        repo="fixture-sp1",
        nodes=["nA", "nB", "nC", "nD", "nX"],
        edges="nA>nX:5.0 nA>nB:2.0 nB>nX:2.0 nA>nC:1.0 nC>nD:1.0 nD>nX:1.0",
    ),
    # reference ShortestPathDeltaSteppingProcTest.java:45-95 — three s->x
    # lines of cost 5/3/2 per hop plus the x->s back-edge; dists from s:
    # a/b/c = 5/10/15, d/e/f = 3/6/9, g/h/i = 2/4/6, x = 8
    "ds1": dict(
        repo="fixture-ds1",
        nodes=list("sabcdefghix"),
        edges="x>s:5.0 s>a:5.0 a>b:5.0 b>c:5.0 c>x:5.0 "
        "s>d:3.0 d>e:3.0 e>f:3.0 f>x:3.0 "
        "s>g:2.0 g>h:2.0 h>i:2.0 i>x:2.0",
    ),
}


def _lp1_fixture() -> dict:
    """FIXTURES.md §5 / LabelPropagationProcIntegrationTest.java:49-63.

    Two stars in two repos (repo = the reference's node label A/B, enabling
    the label-filter scenario as a vertex predicate on ``repo``).  Dense ids
    after lexicographic key sort: a=0, n02..n06=1..5, b=6, n07..n11=7..11 —
    same insertion-order numbering as the reference test.
    """
    repos = {}
    nodes = ["a"] + [f"n{i:02d}" for i in range(2, 7)]
    for n in nodes:
        repos[n] = "fixture-lp1-A"
    nodes_b = ["b"] + [f"n{i:02d}" for i in range(7, 12)]
    for n in nodes_b:
        repos[n] = "fixture-lp1-B"
    props = {"a": (42, 1.0), "b": (42, 1.0)}
    leaf_w = {2: 1.0, 3: 2.0, 4: 1.0, 5: 1.0, 6: 8.0, 7: 1.0, 8: 2.0, 9: 1.0, 10: 1.0, 11: 8.0}
    leaf_p = {2: 1, 3: 1, 4: 1, 5: 1, 6: 2, 7: 1, 8: 1, 9: 1, 10: 1, 11: 2}
    for i in range(2, 12):
        props[f"n{i:02d}"] = (leaf_p[i], leaf_w[i])
    edges = " ".join([f"a>n{i:02d}" for i in range(2, 7)] + [f"b>n{i:02d}" for i in range(7, 12)])
    return dict(repo=repos, nodes=nodes + nodes_b, edges=edges, props=props)


def _uf_lines_fixture() -> dict:
    """FIXTURES.md §4 / UnionFindsTest.java:54-77 — 16 disjoint 10-node lines."""
    nodes, edges = [], []
    for line in range(16):
        names = [f"l{line:02d}n{i:02d}" for i in range(10)]
        nodes += names
        edges += [f"{a}>{b}" for a, b in zip(names, names[1:])]
    return dict(repo="fixture-uflines", nodes=nodes, edges=" ".join(edges))


_FIX["lp1"] = _lp1_fixture()
_FIX["uf-lines"] = _uf_lines_fixture()


def fixture_names() -> list[str]:
    return sorted(_FIX)


def _render(path_mod: str, imports: Iterable[tuple[str, float | None]], filler: str) -> str:
    lines = [f'"""module {path_mod}"""']
    for mod, w in imports:
        lines.append(f"import {mod}" + (f"  # w={w}" if w is not None else ""))
    lines.append(filler)
    return "\n".join(lines) + "\n"


def fixture_corpus(name: str) -> tuple[pa.Table, pa.Table]:
    """Return ``(corpus, node_props)`` Arrow tables for a FIXTURES.md graph."""
    fx = _FIX[name]
    repo_of = fx["repo"]
    if isinstance(repo_of, str):
        repo_of = {n: fx["repo"] for n in fx["nodes"]}
    out_edges: dict[str, list[tuple[str, float | None]]] = {n: [] for n in fx["nodes"]}
    for s, d, w in _edges(fx["edges"]):
        out_edges[s].append((d, w))
    rows = {c: [] for c in ("repo", "path", "commit", "lang", "content")}
    for n in fx["nodes"]:
        rows["repo"].append(repo_of[n])
        rows["path"].append(f"{n}.py")
        rows["commit"].append(_ZERO_COMMIT)
        rows["lang"].append("py")
        rows["content"].append(_render(n, out_edges[n], f"X_{n} = 1"))
    corpus = pa.table(rows, schema=CORPUS_SCHEMA)

    props = fx.get("props", {})
    prows = {c: [] for c in ("repo", "path", "partition", "weight")}
    for n in fx["nodes"]:
        p, w = props.get(n, (0, 1.0))
        prows["repo"].append(repo_of[n])
        prows["path"].append(f"{n}.py")
        prows["partition"].append(int(p))
        prows["weight"].append(float(w))
    return corpus, pa.table(prows, schema=NODEPROPS_SCHEMA)


# ---------------------------------------------------------------------------
# Power-law corpus (bench / scale / skew tests)
# ---------------------------------------------------------------------------

_STDLIB = ["os", "sys", "json", "math", "re"]  # never resolve to files -> dropped edges


class RenderFiles:
    """``map_batches`` callable: file ids -> corpus rows (deterministic).

    Stateless w.r.t. batching: every file's imports come from a Philox stream
    keyed by ``(seed, file_id)``.  Target choice is ``u**3``-skewed toward
    low module indices, making module 0 of each repo a hub ("stdlib path
    imported by everything") — the skew the engine must survive.
    """

    def __init__(self, n_files: int, n_repos: int, avg_out: float, seed: int):
        self.n_files = n_files
        self.n_repos = n_repos
        self.fpr = max(2, n_files // n_repos)
        self.avg_out = avg_out
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        fids = batch["id"].to_numpy()
        rows = {c: [] for c in ("repo", "path", "commit", "lang", "content")}
        for fid in fids:
            fid = int(fid)
            repo_id, local = divmod(fid, self.fpr)
            if repo_id >= self.n_repos:
                # non-divisible n_files/n_repos: fold the remainder files
                # into the LAST repo instead of minting an extra runt repo
                # whose imports (drawn from range(fpr)) mostly resolve to
                # nothing — exactly n_repos repos, all import targets valid
                local += (repo_id - self.n_repos + 1) * self.fpr
                repo_id = self.n_repos - 1
            rng = np.random.Generator(np.random.Philox(key=[self.seed, fid]))
            k = 1 + int(rng.pareto(2.0) * max(0.0, self.avg_out - 1))
            k = min(k, self.fpr - 1)
            u = rng.random(k)
            tgt = np.unique((u**3 * self.fpr).astype(np.int64))
            tgt = tgt[tgt != local]
            imports = [(f"m{t:05d}", None) for t in tgt]
            if rng.random() < 0.25:
                imports.append((_STDLIB[int(rng.integers(len(_STDLIB)))], None))
            filler = f"VALUE_{fid} = {int(rng.integers(1 << 30))}"
            rows["repo"].append(f"repo{repo_id:04d}")
            rows["path"].append(f"m{local:05d}.py")
            rows["commit"].append(f"{fid:040x}")
            rows["lang"].append("py")
            rows["content"].append(_render(f"repo{repo_id:04d}/m{local:05d}", imports, filler))
        return pa.table(rows, schema=CORPUS_SCHEMA)


def powerlaw_corpus_table(n_files: int, n_repos: int, avg_out: float, seed: int) -> pa.Table:
    """Small-scale, driver-side variant (tests)."""
    render = RenderFiles(n_files, n_repos, avg_out, seed)
    return render(pa.table({"id": np.arange(n_files, dtype=np.int64)}))


def write_powerlaw_corpus(
    out_dir: str, n_files: int, n_repos: int, avg_out: float, seed: int
) -> str:
    """Generate a corpus in parallel with Ray Data and write partitioned Parquet."""
    import ray.data as rd

    ds = rd.range(n_files).map_batches(
        RenderFiles(n_files, n_repos, avg_out, seed),
        batch_format="pyarrow",
        batch_size=8192,
    )
    ds.write_parquet(out_dir)
    return out_dir


# ---------------------------------------------------------------------------
# sf-keyed cached corpora (driver correctness / bench inputs)
# ---------------------------------------------------------------------------

_SF_PARAMS = {
    # basename -> (n_files, n_repos, avg_out)
    "sf0.001": (600, 40, 5.0),
    "sf0.01": (3000, 100, 5.0),
    "sf0.1": (20000, 200, 8.0),
    # 10x bench tier; tables synthesised by scripts/gen_sf.py (the driver
    # ships read-only parquet only up to sf0.1)
    "sf1": (200000, 600, 8.0),
    # 100x bench tier (2M vertices, ~16M edges)
    "sf10": (2_000_000, 2000, 8.0),
}
_CORPUS_SEED = 1001
CORPUS_CACHE_ROOT = "/tmp/graft_corpus"


def corpus_params_for(sf_dir: str) -> tuple[int, int, float]:
    return _SF_PARAMS.get(os.path.basename(os.path.normpath(sf_dir)), _SF_PARAMS["sf0.01"])


def corpus_path_for(sf_dir: str) -> str:
    """Materialise (once) and return the corpus Parquet dir for an sf tier.

    Deterministic given ``sf_dir`` — queries() callables and their DuckDB
    oracles both read this same path.
    """
    base = os.path.basename(os.path.normpath(sf_dir))
    n_files, n_repos, avg_out = corpus_params_for(sf_dir)
    out = os.path.join(CORPUS_CACHE_ROOT, base)
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        # build into a fresh temp dir and rename atomically: write_parquet
        # APPENDS uniquely-named files, so rebuilding into a half-written
        # dir (crash before the marker, or an engine/oracle race) would
        # silently duplicate every (repo, path) row.  The whole
        # check+cleanup+build+publish runs under a per-tier flock: without
        # it, builder A's stale-dir rmtree could race builder B's publish
        # and delete a corpus B's caller is already reading (TOCTOU).
        import fcntl
        import shutil
        import tempfile

        os.makedirs(CORPUS_CACHE_ROOT, exist_ok=True)
        with open(os.path.join(CORPUS_CACHE_ROOT, f".{base}.lock"), "w") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            try:
                if os.path.exists(marker):
                    return out  # another builder published while we waited
                tmp = tempfile.mkdtemp(prefix=f".{base}_build_", dir=CORPUS_CACHE_ROOT)
                try:
                    write_powerlaw_corpus(tmp, n_files, n_repos, avg_out, _CORPUS_SEED)
                    with open(os.path.join(tmp, "_DONE"), "w") as f:
                        f.write("ok")
                    if os.path.isdir(out):
                        shutil.rmtree(out)  # stale half-write from an old crash
                    os.rename(tmp, out)  # atomic publish
                except BaseException:
                    shutil.rmtree(tmp, ignore_errors=True)
                    raise
            finally:
                fcntl.flock(lockf, fcntl.LOCK_UN)
    return out
