"""Block schemas must be hashable: parquet written through pandas embeds
b'pandas' schema metadata, and a pyarrow.Schema with metadata is UNHASHABLE —
which silently defeats Ray Data's block-schema dedup fast path
(transform_pyarrow.unify_schemas) on every downstream merge and spams
'Failed to hash the schemas (for deduplication)' warnings.  The readers strip
it at the source (sources/readers.py:read_parquet_clean / from_pandas_clean).
"""

import os

import pandas as pd
import pyarrow as pa
import pytest
import ray

from neo4j_graph_algorithms_ray.sources.readers import (
    from_pandas_clean,
    read_parquet_clean,
)


@pytest.fixture()
def pandas_parquet(tmp_path):
    df = pd.DataFrame({"a": [3, 1, 2], "b": ["x", "y", "z"]})
    p = os.path.join(tmp_path, "t.parquet")
    df.to_parquet(p, index=False)  # embeds b'pandas' schema metadata
    return p, df


def _block_schemas(ds):
    return [ray.get(r).schema for r in ds.get_internal_block_refs()]


def test_pandas_metadata_is_unhashable():
    s = pa.schema([("a", pa.int64())], metadata={b"pandas": b"{}"})
    with pytest.raises(TypeError):
        hash(s)


def test_read_parquet_clean_strips_metadata(pandas_parquet):
    p, df = pandas_parquet
    ds = read_parquet_clean(p)
    for s in _block_schemas(ds):
        assert s.metadata is None
        hash(s)  # the point: dedup fast path works
    out = ds.to_pandas().sort_values("a").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, df.sort_values("a").reset_index(drop=True))


def test_read_parquet_clean_columns_subset(pandas_parquet):
    p, df = pandas_parquet
    ds = read_parquet_clean(p, columns=["a"])
    for s in _block_schemas(ds):
        assert s.names == ["a"] and s.metadata is None
    assert sorted(ds.to_pandas()["a"]) == [1, 2, 3]


def test_read_parquet_clean_unknown_column_falls_back(pandas_parquet):
    # a column missing from the footer (e.g. a hive partition key) must not
    # break the read — the helper falls back to the plain reader
    p, _ = pandas_parquet
    with pytest.raises(Exception):
        read_parquet_clean(p, columns=["a", "not_there"]).materialize()


def test_from_pandas_clean(pandas_parquet):
    _, df = pandas_parquet
    ds = from_pandas_clean(df)
    for s in _block_schemas(ds):
        assert s.metadata is None
        hash(s)
    out = ds.to_pandas().sort_values("a").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, df.sort_values("a").reset_index(drop=True))
