"""Graph construction: corpus Dataset -> partitioned edge table + vertex table.

The distributed analogue of the reference's ``GraphLoader`` /
``HeavyGraphFactory.importGraph`` (``HeavyGraphFactory.java:58-108``): scan the
store in parallel, assign dense ids, and lay out adjacency partitioned by
source vertex.  Differences by design (Ray-Data-first, SURVEY.md §7):

- the "store" is a Parquet corpus; edges come from import extraction,
- the adjacency layout is partitioned Parquet under ``workdir/edges`` with one
  Hive partition per shard (``part=<p>``), which is simultaneously the
  **resume substrate**: shard actors rebuild their CSR from their partition
  alone, so a killed job restarts without rescanning the corpus,
- shard boundaries are **degree-balanced contiguous vid ranges** picked from
  a sample of edge sources (same rationale as the reference partitioning by
  accumulated degree to "avoid having one partition with super nodes",
  ``PageRank.java:86-91,281-308``) — balanced *edges per shard*, and
  vertex->shard resolution is an O(log P) ``searchsorted`` against a tiny
  boundary array that broadcasts everywhere.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd
from ..stages.agg import bucketed_agg
from ..stages.extract import extract_edges
from ..stages.ids import vertex_table_from_corpus
from ..stages.joins import lookup_vids
from ..sources.readers import read_parquet_clean


@dataclass
class BuiltGraph:
    """Handle to a constructed graph on disk + its partitioning metadata."""

    workdir: str
    n_vertices: int
    n_edges: int
    bounds: np.ndarray  # P+1 int64 vid boundaries; shard p owns [bounds[p], bounds[p+1])
    weighted: bool = False
    _vertices_cache: object = field(default=None, repr=False)

    @property
    def P(self) -> int:
        return len(self.bounds) - 1

    @property
    def edges_dir(self) -> str:
        return os.path.join(self.workdir, "edges")

    @property
    def vertices_dir(self) -> str:
        return os.path.join(self.workdir, "vertices")

    def vertices_ds(self) -> rd.Dataset:
        if not os.path.exists(self.vertices_dir):
            # edge-table projections (build_graph_from_edges — the Cypher
            # projection analogue) carry no key table; ids are already dense,
            # so synthesize {key: str(vid), vid} lazily instead of failing
            n = int(self.n_vertices)
            return rd.range(n).map_batches(
                lambda t: pa.table(
                    {"key": t["id"].cast(pa.string()), "vid": t["id"].cast(pa.int64())}
                ),
                batch_format="pyarrow",
            )
        return read_parquet_clean(self.vertices_dir)

    @property
    def edges_rev_dir(self) -> str:
        return os.path.join(self.workdir, "edges_rev")

    def ensure_reverse_layout(self) -> str:
        """Write (once) the edge table re-partitioned by *destination* vid.

        Same shard ownership (identical ``bounds``) so a shard's forward and
        reverse partitions cover the same local vertex range — needed by
        pull-direction algorithms (label propagation INCOMING/BOTH, reverse
        CSR of SURVEY.md §7.2 step C).
        """
        marker = os.path.join(self.edges_rev_dir, "_DONE")
        if not os.path.exists(marker):
            partition_edges(self.edges_ds(), self.bounds, self.edges_rev_dir, key="dst")
            with open(marker, "w") as f:
                f.write("ok")
        return self.edges_rev_dir

    def edges_ds(self, columns=None) -> rd.Dataset:
        # default: hide the Hive partition column (string-typed on read-back)
        if columns is None:
            columns = ["src", "dst", "weight"]
        return read_parquet_clean(self.edges_dir, columns=columns)

    def shard_of(self, vids: np.ndarray) -> np.ndarray:
        return np.searchsorted(self.bounds, vids, side="right") - 1

    def save_manifest(self):
        with open(os.path.join(self.workdir, "graph.json"), "w") as f:
            json.dump(
                {
                    "n_vertices": self.n_vertices,
                    "n_edges": self.n_edges,
                    "bounds": self.bounds.tolist(),
                    "weighted": self.weighted,
                },
                f,
            )

    @staticmethod
    def load(workdir: str) -> "BuiltGraph":
        with open(os.path.join(workdir, "graph.json")) as f:
            m = json.load(f)
        return BuiltGraph(
            workdir=workdir,
            n_vertices=m["n_vertices"],
            n_edges=m["n_edges"],
            bounds=np.asarray(m["bounds"], dtype=np.int64),
            weighted=m["weighted"],
        )


def degree_balanced_bounds(src_sample: np.ndarray, n_vertices: int, P: int) -> np.ndarray:
    """Contiguous vid ranges with ~equal edge counts, from a source-id sample."""
    P = max(1, P)
    if n_vertices <= 0:
        return np.array([0, 0], dtype=np.int64)
    if len(src_sample) == 0 or P == 1:
        cuts = np.linspace(0, n_vertices, P + 1).astype(np.int64)
    else:
        qs = np.quantile(src_sample, np.linspace(0, 1, P + 1)[1:-1])
        cuts = np.concatenate([[0], np.ceil(qs).astype(np.int64), [n_vertices]])
    cuts = np.unique(np.clip(cuts, 0, n_vertices))
    if cuts[0] != 0:
        cuts = np.concatenate([[0], cuts])
    if cuts[-1] != n_vertices:
        cuts = np.concatenate([cuts, [n_vertices]])
    return cuts.astype(np.int64)


def partition_edges(edges: rd.Dataset, bounds: np.ndarray, out_dir: str, key: str = "src"):
    """Tag each edge with its owning shard (by ``key`` endpoint) and write
    Hive-partitioned Parquet."""
    b = bounds  # captured; tiny array, serialized with the task closure

    def tag(t: pa.Table) -> pa.Table:
        part = np.searchsorted(b, t[key].to_numpy(), side="right") - 1
        return t.append_column("part", pa.array(part.astype(np.int64)))

    if edges.count() == 0:
        os.makedirs(out_dir, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "weight": pa.array([], pa.float64()),
                }
            ),
            os.path.join(out_dir, "empty.parquet"),
        )
        return
    edges.map_batches(tag, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["part"]
    )


def build_graph(
    corpus_ds: rd.Dataset,
    workdir: str,
    *,
    P: int = 8,
    default_weight: float = 1.0,
    dedup: str = "none",  # 'none' | 'first' | 'sum'  (sum = accumulateWeights, HeavyCypherGraphFactory.java:142-151)
    sample_cap: int = 400_000,
) -> BuiltGraph:
    """corpus -> BuiltGraph (vertex table + degree-balanced partitioned edges)."""
    import shutil

    os.makedirs(workdir, exist_ok=True)
    # clean slate: write_parquet appends uniquely-named files, so rebuilding
    # into a dirty dir (e.g. after an interrupted build) would duplicate rows;
    # edges_tri_raw is triangle_count's derived cache — stale copies would be
    # trusted via their _DONE marker and count the OLD graph's triangles
    for sub in ("vertices", "edges", "edges_rev", "edges_tri", "edges_tri_raw"):
        shutil.rmtree(os.path.join(workdir, sub), ignore_errors=True)
    vertices, n_vertices = vertex_table_from_corpus(corpus_ds)
    vdir = os.path.join(workdir, "vertices")
    if n_vertices:
        vertices.write_parquet(vdir)
    else:  # write_parquet of an empty Dataset writes no files
        os.makedirs(vdir, exist_ok=True)
        pq.write_table(
            pa.table({"key": pa.array([], pa.string()), "vid": pa.array([], pa.int64())}),
            os.path.join(vdir, "empty.parquet"),
        )
    vertices = read_parquet_clean(vdir)

    edges_str = extract_edges(corpus_ds, default_weight=default_weight)
    edges = lookup_vids(edges_str, vertices, n_vertices)
    # parallel-edge dedup: key cardinality ~ #edges -> bucketed aggregate
    if dedup == "first":
        edges = bucketed_agg(
            edges, ["src", "dst"], {"weight": ("weight", "min")}, types={"weight": pa.float64()}
        )
    elif dedup == "sum":
        edges = bucketed_agg(
            edges, ["src", "dst"], {"weight": ("weight", "sum")}, types={"weight": pa.float64()}
        )
    return _partition_and_manifest(edges, n_vertices, workdir, P, default_weight, sample_cap)


def build_graph_from_edges(
    edges: rd.Dataset,
    n_vertices: int,
    workdir: str,
    *,
    P: int = 8,
    default_weight: float = 1.0,
    sample_cap: int = 400_000,
) -> BuiltGraph:
    """Integer edge table ``{src, dst, weight}`` -> BuiltGraph.

    The projection analogue of the reference's Cypher-projection source
    (``HeavyCypherGraphFactory.java:91-169``): the caller supplies any edge
    Dataset with dense vids already assigned (e.g. a reweighted or filtered
    view of an existing graph's edges); only partitioning happens here.
    The workdir holds edges only — key joins need the originating graph's
    vertex table."""
    import shutil

    os.makedirs(workdir, exist_ok=True)
    # edges_tri_raw included: triangle_count trusts its _DONE marker, so a
    # stale copy from a previous graph in a reused workdir would silently
    # count the OLD graph's triangles (ADVICE r02)
    for sub in ("edges", "edges_rev", "edges_tri", "edges_tri_raw"):
        shutil.rmtree(os.path.join(workdir, sub), ignore_errors=True)
    return _partition_and_manifest(edges, n_vertices, workdir, P, default_weight, sample_cap)


def _partition_and_manifest(edges, n_vertices, workdir, P, default_weight, sample_cap) -> BuiltGraph:
    edges = edges.materialize()
    n_edges = edges.count()
    weighted = False
    if n_edges:
        frac = min(1.0, sample_cap / n_edges)
        samp = edges.select_columns(["src", "weight"]).random_sample(frac, seed=7).to_pandas()
        src_sample = samp["src"].to_numpy()
        # weighted is decided EXACTLY (min/max aggregates), not from the
        # sample: a 10^8-edge graph with a handful of non-default weights
        # would otherwise be classified unweighted with high probability and
        # silently run its algorithms on weight=1.0.  (The sample still
        # drives the degree-balance bounds — a heuristic, where sampling is
        # fine.)
        from ray.data.aggregate import Max, Min

        ext = edges.aggregate(Min("weight"), Max("weight"))  # one pass, not two
        wmin, wmax = ext["min(weight)"], ext["max(weight)"]
        weighted = not (wmin == wmax == default_weight)
    else:
        src_sample = np.array([], dtype=np.int64)
    bounds = degree_balanced_bounds(src_sample, n_vertices, P)
    partition_edges(edges, bounds, os.path.join(workdir, "edges"))

    g = BuiltGraph(
        workdir=workdir,
        n_vertices=n_vertices,
        n_edges=n_edges,
        bounds=bounds,
        weighted=weighted,
    )
    g.save_manifest()
    return g


def node_props_to_vids(
    props_ds: rd.Dataset, graph: BuiltGraph, *, cap: int | None = None
) -> rd.Dataset:
    """Sidecar ``{repo, path, partition, weight}`` -> ``{vid, partition, weight}``.

    Mirrors ``GraphLoader.withOptionalNodeProperty`` (seed labels) and node
    weights (``LabelPropagationProc.java:128-134``).  Same auto contract as
    ``stages.joins.lookup_vids``: the vertex table is broadcast (one
    ``ray.put``, read from local plasma by every mapper) only while it fits
    under ``cap`` rows; above that a side-tagged co-shuffle runs instead (the
    ``coshuffle_lookup`` shape on the string key — NOT ``Dataset.join``,
    whose hash aggregator crashes on partitions with zero left rows, the
    routine case for a sparse seed sidecar) — an uncapped driver
    ``to_pandas`` of the whole vertex table is a guaranteed OOM at the
    10^12-file scale.
    """
    import ray

    from ..stages.joins import BROADCAST_MAX_ROWS

    cap = BROADCAST_MAX_ROWS if cap is None else int(cap)
    if graph.n_vertices <= cap:
        vt = graph.vertices_ds().to_pandas()
        ref = ray.put(vt)

        class MapProps:
            def __init__(self):
                import pandas as pd

                v = ray.get(ref)
                self.index = pd.Index(v["key"]) if "key" in v.columns else pd.Index([])
                self.vids = (
                    v["vid"].to_numpy() if "vid" in v.columns else np.array([], dtype=np.int64)
                )

            def __call__(self, batch: pa.Table) -> pa.Table:
                keys = (
                    batch["repo"].to_pandas() + "/" + batch["path"].to_pandas()
                )
                idx = self.index.get_indexer(keys)
                ok = idx >= 0
                return pa.table(
                    {
                        "vid": pa.array(self.vids[idx[ok]], pa.int64()),
                        "partition": batch["partition"].filter(pa.array(ok)),
                        "weight": batch["weight"].filter(pa.array(ok)),
                    }
                )

        from ..stages.agg import actor_pool_args

        return props_ds.map_batches(MapProps, batch_format="pyarrow", **actor_pool_args(4))

    # large-vertex-table path: side-tagged co-shuffle on the string key.
    # Both sides land in one coarse bucket space (vectorized uint64 string
    # hash — raw prefix bytes would skew, repo paths share prefixes); the
    # per-bucket kernel merges on the FULL key string, so matches are exact.
    import pandas as pd
    import pyarrow.compute as pc

    from ..stages.agg import grouped_map

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    npart = max(2, min(16, ncpu // 2))
    nb = 4 * npart

    def _bkt(keys: pa.ChunkedArray | pa.Array) -> pa.Array:
        h = pd.util.hash_array(np.asarray(keys.to_pandas(), dtype=object))
        return pa.array((h % np.uint64(nb)).astype(np.int64))

    empty = pa.table(
        {
            "vid": pa.array([], pa.int64()),
            "partition": pa.array([], pa.int64()),
            "weight": pa.array([], pa.float64()),
        }
    )

    def tag_props(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(batch["repo"], batch["path"], "/")
        n = batch.num_rows
        return pa.table(
            {
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "key": key.cast(pa.string()),
                "partition": batch["partition"].cast(pa.int64()),
                "weight": batch["weight"].cast(pa.float64()),
                "vid": pa.nulls(n, pa.int64()),
                "bucket": _bkt(key),
            }
        )

    def tag_verts(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "key": batch["key"].cast(pa.string()),
                "partition": pa.nulls(n, pa.int64()),
                "weight": pa.nulls(n, pa.float64()),
                "vid": batch["vid"].cast(pa.int64()),
                "bucket": _bkt(batch["key"]),
            }
        )

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "side" not in g.column_names:
            return empty
        side = g["side"].to_numpy(zero_copy_only=False)
        L = g.filter(pa.array(side == 0))
        R = g.filter(pa.array(side == 1))
        if L.num_rows == 0 or R.num_rows == 0:
            return empty
        lt = pd.DataFrame(
            {
                "key": L["key"].to_pandas(),
                "partition": L["partition"].to_numpy(zero_copy_only=False),
                "weight": L["weight"].to_numpy(zero_copy_only=False),
            }
        )
        rt = pd.DataFrame({"key": R["key"].to_pandas(), "vid": R["vid"].to_numpy(zero_copy_only=False)})
        mg = lt.merge(rt, on="key")  # inner: unmatched props drop
        return pa.table(
            {
                "vid": pa.array(mg["vid"].to_numpy(dtype=np.int64), pa.int64()),
                "partition": pa.array(mg["partition"].to_numpy(dtype=np.int64), pa.int64()),
                "weight": pa.array(mg["weight"].to_numpy(dtype=np.float64), pa.float64()),
            }
        )

    both = props_ds.map_batches(tag_props, batch_format="pyarrow").union(
        graph.vertices_ds().map_batches(tag_verts, batch_format="pyarrow")
    )
    return grouped_map(both, "bucket", kernel, num_partitions=npart, batch_format="pyarrow")
