"""Dense id assignment: vertex keys -> contiguous int64 ids [0, n).

Mirrors the reference's ``IdMap`` contract — external ids sorted ascending so
the max dense id equals nodeCount (``IdMap.java:37-39``) — as a distributed
two-pass over a sorted Dataset:

1. ``ds.sort(key)`` — Ray Data's range-partitioning sort (the one global
   shuffle of graph construction; done once, result persisted/reused).
2. per-block ``(min_key, row_count)`` via tiny Ray tasks on the block refs,
   blocks ordered by ``min_key`` on the driver (sorted blocks hold disjoint
   key ranges), exclusive-prefix-sum of counts = each block's id offset,
3. per-block offset add producing ``{key, vid}`` blocks, re-assembled with
   ``ray.data.from_arrow_refs`` (zero-copy).

Only the key column travels; the driver holds O(#blocks) metadata, never rows
— this is the scalable shape for 10^12 keys (SURVEY.md §7.5 "Id assignment at
scale": one expensive global sort, persisted, treated as immutable input).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


@ray.remote
def _block_meta(block: pa.Table, key: str):
    if block.num_rows == 0:
        return None, 0
    col = block.column(key)
    return col[0].as_py(), block.num_rows


@ray.remote
def _with_vids(block: pa.Table, key: str, offset: int) -> pa.Table:
    vids = pa.array(np.arange(offset, offset + block.num_rows, dtype=np.int64))
    return pa.table({"key": block.column(key), "vid": vids})


def assign_dense_ids(keys_ds: rd.Dataset, key: str = "key") -> tuple[rd.Dataset, int]:
    """Unique-key Dataset -> (``{key, vid}`` Dataset sorted by key, n_vertices)."""
    sorted_ds = keys_ds.sort(key)
    refs = sorted_ds.to_arrow_refs()
    metas = ray.get([_block_meta.remote(r, key) for r in refs])
    live = [(m[0], m[1], r) for m, r in zip(metas, refs) if m[1] > 0]
    live.sort(key=lambda t: t[0])
    offsets = np.concatenate([[0], np.cumsum([c for _, c, _ in live])])
    n = int(offsets[-1])
    out_refs = [_with_vids.remote(r, key, int(off)) for (_, _, r), off in zip(live, offsets[:-1])]
    return rd.from_arrow_refs(out_refs), n


def vertex_table_from_corpus(corpus_ds: rd.Dataset) -> tuple[rd.Dataset, int]:
    """Corpus -> vertex table ``{key, vid}`` (key = repo + '/' + path).

    Corpus rows are unique per (repo, path) by contract; the graph's vertex
    set is exactly the file set (imports resolving to no file are dropped at
    the edge/vid join, like the reference only loading scanned nodes).
    """
    keys = corpus_ds.map_batches(
        lambda t: pa.table(
            {"key": pa.compute.binary_join_element_wise(t["repo"], t["path"], "/")}
        ),
        batch_format="pyarrow",
    )
    return assign_dense_ids(keys)
