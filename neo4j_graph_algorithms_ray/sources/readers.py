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


def _first_parquet_file(path: str) -> str | None:
    if os.path.isfile(path):
        return path
    if not os.path.isdir(path):
        return None  # glob/remote URI: let ray.data resolve it
    for root, dirs, files in os.walk(path):
        dirs.sort()
        for f in sorted(files):
            if f.endswith(".parquet"):
                return os.path.join(root, f)
    return None


_SCHEMA_CACHE: dict = {}


def _footer_schema(path: str):
    """Driver-side footer schema + hive-layout flag, cached per file with the
    mtime as the staleness check (a rewrite evicts the old entry instead of
    shadowing it forever) — repeated reads of the same tier tables (every
    query re-reads its inputs) skip the footer IO.

    The second return value is True when the file sits under a ``col=value``
    directory (hive partitioning): the dataset schema then carries partition
    columns the footer does not, so the caller must NOT pin the read to the
    footer schema."""
    f = _first_parquet_file(path)
    if f is None:
        return None, False
    hive = "=" in os.path.dirname(os.path.relpath(f, path if os.path.isdir(path) else os.path.dirname(path)))
    mtime = os.path.getmtime(f)
    hit = _SCHEMA_CACHE.get(f)
    if hit is None or hit[0] != mtime:
        import pyarrow.parquet as pq

        _SCHEMA_CACHE[f] = hit = (mtime, pq.read_schema(f))
    return hit[1], hive


def read_parquet_clean(path, *, columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    """``ray.data.read_parquet`` with the file's schema *metadata stripped*.

    Parquet written through pandas (incl. DuckDB COPY and pandas.to_parquet)
    embeds ``b'pandas'`` schema metadata in every file.  A ``pyarrow.Schema``
    carrying metadata is UNHASHABLE (``hash(schema)`` raises ``unhashable
    type: 'dict'``), which silently defeats Ray Data's block-schema
    deduplication fast path (`transform_pyarrow.unify_schemas` hashes the
    schema set before unifying) on EVERY downstream block merge — each
    shuffle-aggregator output pays a full N-way schema unification and logs
    ``Failed to hash the schemas (for deduplication)``.  Stripping costs one
    footer read on the driver and nothing per block.

    Falls back to a plain ``read_parquet`` when the first file's schema is
    already metadata-free (our own sinks) or can't be inspected (globs).
    """
    if "schema" in kwargs:
        return rd.read_parquet(path, columns=columns, **kwargs)
    try:
        sch, hive = _footer_schema(path)
    except Exception:
        sch, hive = None, False
    if sch is None or not sch.metadata or hive:
        # hive layouts: partition columns live in the path, not the footer —
        # pinning the footer schema would silently drop them from the
        # Dataset's declared schema (blocks still carry them)
        return rd.read_parquet(path, columns=columns, **kwargs)
    sch = sch.remove_metadata()
    if columns is not None:
        if not all(sch.get_field_index(c) >= 0 for c in columns):
            return rd.read_parquet(path, columns=columns, **kwargs)
        sch = pa.schema([sch.field(c) for c in columns])
    return rd.read_parquet(path, columns=columns, schema=sch, **kwargs)


def from_pandas_clean(df) -> rd.Dataset:
    """``ray.data.from_pandas`` that lands as an Arrow block with no pandas
    schema metadata (see ``read_parquet_clean`` for why metadata is toxic)."""
    t = pa.Table.from_pandas(df, preserve_index=False)
    return rd.from_arrow(t.replace_schema_metadata(None))

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".jsonl": "jsonl",
    ".json": "sniff_json",  # ambiguous: JSON-lines or a top-level array
    ".ndjson": "jsonl",
}


def _sniff_json(path: str) -> str:
    """Disambiguate a ``.json`` file: first non-whitespace byte ``[`` means a
    top-level array (one document holding all rows), anything else is treated
    as JSON-lines.  Guessing wrong used to misparse silently (ADVICE r03)."""
    with open(path, "rb") as f:
        while True:
            chunk = f.read(4096)
            if not chunk:
                return "jsonl"  # empty file: either reader yields no rows
            stripped = chunk.lstrip()
            if stripped:
                return "json_array" if stripped[:1] == b"[" else "jsonl"


def _infer_format(path: str) -> str:
    # a directory: infer from the first recognized file extension inside
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            ext = os.path.splitext(f)[1].lower()
            if ext in _EXT_FORMAT:
                fmt = _EXT_FORMAT[ext]
                return _sniff_json(os.path.join(path, f)) if fmt == "sniff_json" else fmt
        raise ValueError(f"cannot infer corpus format from directory {path!r}")
    ext = os.path.splitext(path)[1].lower()
    if ext not in _EXT_FORMAT:
        raise ValueError(f"unrecognized corpus extension {ext!r} ({path!r})")
    fmt = _EXT_FORMAT[ext]
    return _sniff_json(path) if fmt == "sniff_json" else fmt


def read_corpus(path: str, *, format: str | None = None, columns: list[str] | None = None) -> rd.Dataset:
    """Read a corpus from Parquet, CSV, or JSON-lines into the canonical
    ``(repo, path, commit, lang, content)`` string schema.

    ``columns`` prunes the projection (at the read for Parquet, post-read
    for text formats, which are row-oriented on disk anyway)."""
    fmt = format or _infer_format(path)
    cols = columns or CORPUS_COLUMNS
    if fmt == "parquet":
        # same normalize as the text formats: the canonical all-string
        # contract must not depend on the on-disk format (a parquet corpus
        # with e.g. an int64 commit column gets the same cast + missing-
        # column validation CSV/JSON get)
        ds = read_parquet_clean(path, columns=cols)
    elif fmt == "csv":
        # force the corpus columns to string AT PARSE: type inference would
        # read a numeric-looking commit/content value ('123e45', '000123',
        # '2.0') as a number and the cast back to string would reformat it
        # ('1.23e+47', '123', '2') — silent corruption of hashes and text
        from pyarrow import csv as _pacsv

        ds = rd.read_csv(
            path,
            convert_options=_pacsv.ConvertOptions(
                column_types={c: pa.string() for c in CORPUS_COLUMNS}
            ),
        )
    elif fmt == "jsonl":
        ds = rd.read_json(path)
    elif fmt == "json_array":
        # top-level-array JSON: one document per file (inherently
        # non-splittable) — parse file-parallel via read_binary_files so a
        # directory of array files still streams one task per file
        import json as _json

        def parse_array(t: pa.Table) -> pa.Table:
            rows = []
            for payload in t["bytes"].to_pylist():
                doc = _json.loads(payload)
                if not isinstance(doc, list):
                    raise ValueError("json_array corpus file is not a top-level array")
                rows.extend(doc)
            if not rows:
                return pa.table({c: pa.array([], pa.string()) for c in cols})
            return pa.Table.from_pylist(rows)

        ds = rd.read_binary_files(path).map_batches(parse_array, batch_format="pyarrow")
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
