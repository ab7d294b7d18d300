"""Scalar functions — the reference's only scalar-function surface is
``algo.isFinite / isInfinite / Infinity / NaN`` (``IsFiniteFunc.java:27-46``)
plus the numeric coercion rules of ``RawValues.extractValue:95-114``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def infinity() -> float:
    return float("inf")


def nan() -> float:
    return float("nan")


def is_finite(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """isFinite(x): finite and not null (IsFiniteFunc.java:27-31)."""
    return pc.and_kleene(pc.is_finite(arr), pc.is_valid(arr))


def is_infinite(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """isInfinite(x): NOT finite, i.e. true for ±Infinity, NaN, AND null
    (IsFiniteFunc.java:36-38: ``value == null || !Double.isFinite(...)``)."""
    return pc.or_kleene(pc.invert(pc.is_finite(arr)), pc.is_null(arr))


def coerce_to_double(arr: pa.ChunkedArray | pa.Array, default: float = 0.0) -> pa.Array:
    """RawValues.extractValue semantics: numbers pass through, numeric strings
    parse, booleans -> 0/1, everything else -> default."""
    t = arr.type
    if pa.types.is_floating(t) or pa.types.is_integer(t):
        return pc.cast(arr, pa.float64())
    if pa.types.is_boolean(t):
        return pc.cast(pc.cast(arr, pa.int8()), pa.float64())
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        vals = arr.to_pandas()
        import pandas as pd

        num = pd.to_numeric(vals, errors="coerce").fillna(default)
        return pa.array(num.to_numpy(dtype=np.float64))
    return pa.array(np.full(len(arr), default))
