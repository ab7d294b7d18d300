"""Resumable partitioned-Parquet sink.

The north rule requires output a failed run can resume: one directory per
partition with a completion marker, so a rerun skips finished partitions and
rebuilds only unfinished ones.  ``write_parquet`` APPENDS uniquely-named
files into a dirty directory (silent row duplication — see graph_build.py),
so the unfinished-partition contract is clean-then-rewrite, never append.

This generalizes the ad-hoc ``_DONE`` markers already used by the graph
layouts (graph_build.py, triangles.py) into one sink any pipeline output can
use — the per-partition analogue of the reference Exporter's batched
write-back (``core/.../write/Exporter.java:49-50``).
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..sources.readers import read_parquet_clean

_MARKER = "_DONE"


def _part_dir(path: str, partition_col: str, value) -> str:
    """The hive directory ``write_parquet`` will actually create: Ray
    URI-encodes partition VALUES (``'a b'`` -> ``a%20b``, probed identical
    to ``quote(v, safe='')``), so the marker/cleanup dirs must encode the
    same way — a raw f-string diverges on any special character, and then
    clean-then-rewrite removes the WRONG directory and a crash-resume
    appends duplicate rows."""
    from urllib.parse import quote

    return os.path.join(path, f"{partition_col}={quote(str(value), safe='')}")


def resumable_write(
    ds: rd.Dataset,
    path: str,
    *,
    partition_col: str,
    partitions: "list | None" = None,
) -> list:
    """Write ``ds`` under ``path`` as Hive dirs ``<partition_col>=<value>/``
    with a per-partition ``_DONE`` marker.  Partitions whose marker already
    exists are SKIPPED (their rows are filtered out before the write);
    unfinished partition dirs are removed and rewritten whole.  Returns the
    list of partition values written this call (empty = everything was
    already done).

    ``partitions`` is the full expected value list; pass it when known
    (bucket ids, shard ranges) to avoid a discovery pass over ``ds``.
    """
    os.makedirs(path, exist_ok=True)
    if partitions is None:
        partitions = sorted(ds.unique(partition_col))
    done = {
        v for v in partitions if os.path.exists(os.path.join(_part_dir(path, partition_col, v), _MARKER))
    }
    missing = [v for v in partitions if v not in done]
    if not missing:
        return []
    for v in missing:  # clean-then-rewrite: append would duplicate rows
        shutil.rmtree(_part_dir(path, partition_col, v), ignore_errors=True)
    miss_arr = pa.array(missing)
    sub = ds.map_batches(
        lambda t: t.filter(pc.is_in(t[partition_col], value_set=miss_arr)),
        batch_format="pyarrow",
    )
    sub.write_parquet(path, partition_cols=[partition_col])
    for v in missing:
        d = _part_dir(path, partition_col, v)
        os.makedirs(d, exist_ok=True)  # empty partitions still get a marker
        with open(os.path.join(d, _MARKER), "w") as f:
            f.write("ok")
    return missing


def read_partitioned(path: str, **kwargs) -> rd.Dataset:
    """Read back a ``resumable_write`` layout (markers are not parquet files,
    so point the reader at the parquet files only)."""
    return read_parquet_clean(path, file_extensions=["parquet"], **kwargs)


def write_relationships(edges: rd.Dataset, path: str, bounds) -> list:
    """Relationship write-back (``MSTPrimProc.java:65`` writes the spanning
    tree back as typed relationships; the Parquet analogue is an edge table
    on disk).  The edge Dataset (``u``/``v`` endpoints + any payload columns)
    is persisted through ``resumable_write``, Hive-partitioned by the owning
    shard of ``u`` (the graph's ``bounds`` ranges) — so a failed write-back
    resumes per shard, and a later ``read_partitioned`` can prune by owner.
    Returns the partition ids written this call."""
    import numpy as np

    b = np.asarray(bounds, dtype=np.int64)

    def tag(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy()
        # a u outside the graph's vid range would land in a partition id not
        # in the write list and be SILENTLY dropped by resumable_write's
        # filter — refuse loudly instead (edge table from a different graph)
        if len(u) and (u.min() < b[0] or u.max() >= b[-1]):
            raise ValueError(
                f"write_relationships: u endpoints outside graph bounds "
                f"[{b[0]}, {b[-1]}) — edge table does not match this graph"
            )
        part = (np.searchsorted(b, u, side="right") - 1).astype(np.int64)
        return t.append_column("part", pa.array(part))

    tagged = edges.map_batches(tag, batch_format="pyarrow")
    return resumable_write(tagged, path, partition_col="part", partitions=list(range(len(b) - 1)))
