"""Key lookup / join stages.

The reference has no relational joins — its "joins" are O(1) array lookups by
dense id (SURVEY.md §2.6: ``labels[targetNodeId]``, weight lookup by combined
long key).  Distributed, those become either

- **broadcast lookup** — the small side (vertex table, degree table, seed
  props) is ``ray.put`` ONCE on the driver and read by every actor from the
  local object store (never re-shipped per batch); lookups are vectorized
  ``pd.Index.get_indexer`` calls per batch, or
- **hash-partitioned join** — ``Dataset.join`` (Ray's hash shuffle join) when
  both sides are too large to broadcast.

``lookup_vids`` auto-selects: broadcast below ``BROADCAST_MAX_ROWS``
(one object holding the vertex table; at 5M rows ~ a few hundred MB), the
shuffle join above it.  Both paths drop edges with unresolved endpoints
(inner semantics — the reference only loads relationships between scanned
nodes, ``RelationshipImporter``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

BROADCAST_MAX_ROWS = 5_000_000


class _BroadcastVidMapper:
    """map_batches actor: resolve src_key/dst_key -> vids via a broadcast table."""

    def __init__(self, vmap_ref):
        vt = ray.get(vmap_ref)  # pandas DataFrame {key, vid}
        if "key" not in vt.columns:  # to_pandas() of an empty Dataset has no columns
            self.index = pd.Index([], dtype=object)
            self.vids = np.array([], dtype=np.int64)
        else:
            self.index = pd.Index(vt["key"])
            self.vids = vt["vid"].to_numpy()

    def __call__(self, batch: pa.Table) -> pa.Table:
        sk = batch["src_key"].to_pandas()
        dk = batch["dst_key"].to_pandas()
        si = self.index.get_indexer(sk)
        di = self.index.get_indexer(dk)
        ok = (si >= 0) & (di >= 0)
        return pa.table(
            {
                "src": pa.array(self.vids[si[ok]], pa.int64()),
                "dst": pa.array(self.vids[di[ok]], pa.int64()),
                "weight": batch["weight"].filter(pa.array(ok)),
            }
        )


def lookup_vids(
    edges_ds: rd.Dataset,
    vertices_ds: rd.Dataset,
    n_vertices: int,
    *,
    method: str = "auto",
    num_partitions: int = 64,
) -> rd.Dataset:
    """String edge table -> int edge table ``{src: i64, dst: i64, weight: f64}``."""
    if method == "auto":
        method = "broadcast" if n_vertices <= BROADCAST_MAX_ROWS else "join"
    if method == "broadcast":
        ref = ray.put(vertices_ds.to_pandas())
        return edges_ds.map_batches(
            _BroadcastVidMapper,
            fn_constructor_kwargs={"vmap_ref": ref},
            batch_format="pyarrow",
            batch_size=65536,
            concurrency=(1, 8),
        )
    # shuffle-join path: two hash joins on the string key
    j = edges_ds.join(
        vertices_ds, "inner", num_partitions, on=("src_key",), right_on=("key",)
    ).rename_columns({"vid": "src"})
    j = j.join(
        vertices_ds, "inner", num_partitions, on=("dst_key",), right_on=("key",)
    ).rename_columns({"vid": "dst"})
    return j.select_columns(["src", "dst", "weight"])
