"""Corpus ingest from generic file formats.

The reference ships several graph loaders (store scan, Cypher projection,
``HeavyCypherGraphFactory.java``); this engine's equivalents are the Parquet
corpus reader, the edge-table projection (``build_graph_from_edges``), and —
here — generic text-format ingest (CSV / JSON-lines) through Ray Data's
native readers, normalized to the corpus schema contract
``(repo, path, commit, lang, content)`` so every downstream pipeline is
format-agnostic.

Scale shape: ``read_csv`` / ``read_json`` / ``read_parquet`` all stream
file-sharded blocks; normalization is one zero-copy column projection/cast
per batch.  Column pruning is applied at the read where the format supports
it (Parquet) and post-read otherwise.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".jsonl": "jsonl",
    ".json": "jsonl",
    ".ndjson": "jsonl",
}


def _infer_format(path: str) -> str:
    # a directory: infer from the first recognized file extension inside
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            ext = os.path.splitext(f)[1].lower()
            if ext in _EXT_FORMAT:
                return _EXT_FORMAT[ext]
        raise ValueError(f"cannot infer corpus format from directory {path!r}")
    ext = os.path.splitext(path)[1].lower()
    if ext not in _EXT_FORMAT:
        raise ValueError(f"unrecognized corpus extension {ext!r} ({path!r})")
    return _EXT_FORMAT[ext]


def read_corpus(path: str, *, format: str | None = None, columns: list[str] | None = None) -> rd.Dataset:
    """Read a corpus from Parquet, CSV, or JSON-lines into the canonical
    ``(repo, path, commit, lang, content)`` string schema.

    ``columns`` prunes the projection (at the read for Parquet, post-read
    for text formats, which are row-oriented on disk anyway)."""
    fmt = format or _infer_format(path)
    cols = columns or CORPUS_COLUMNS
    if fmt == "parquet":
        return rd.read_parquet(path, columns=cols)
    if fmt == "csv":
        ds = rd.read_csv(path)
    elif fmt == "jsonl":
        ds = rd.read_json(path)
    else:
        raise ValueError(f"unsupported corpus format {fmt!r}")

    def normalize(t: pa.Table) -> pa.Table:
        out = {}
        for c in cols:
            if c not in t.column_names:
                raise ValueError(f"corpus file missing column {c!r}")
            col = t[c]
            if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
                col = col.cast(pa.string())
            out[c] = col
        return pa.table(out)

    return ds.map_batches(normalize, batch_format="pyarrow")
