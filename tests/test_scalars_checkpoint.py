"""Scalar functions (IsFiniteFunc.java / RawValues.extractValue) and the
checkpoint-resume validation guard."""

import math

import numpy as np
import pyarrow as pa
import pytest

from neo4j_graph_algorithms_ray.functions import scalars as S
from neo4j_graph_algorithms_ray.state.checkpoint import CheckpointManager


def test_infinity_nan_constants():
    assert math.isinf(S.infinity()) and S.infinity() > 0
    assert math.isnan(S.nan())


def test_is_finite_is_infinite():
    arr = pa.array([1.0, float("inf"), float("-inf"), float("nan"), None])
    fin = S.is_finite(arr).to_pylist()
    assert fin == [True, False, False, False, False]
    inf = S.is_infinite(arr).to_pylist()
    # Reference semantics: true for ±Inf, NaN AND null (IsFiniteFunc.java:36-38).
    assert inf == [False, True, True, True, True]


def test_coerce_to_double_rawvalues_semantics():
    # numbers pass through
    assert S.coerce_to_double(pa.array([1, 2, 3])).to_pylist() == [1.0, 2.0, 3.0]
    # numeric strings parse, non-numeric -> default (RawValues.extractValue:104-109)
    got = S.coerce_to_double(pa.array(["2.5", "x", "7"]), default=-1.0).to_pylist()
    assert got == [2.5, -1.0, 7.0]
    # booleans -> 0/1 (:110-112)
    assert S.coerce_to_double(pa.array([True, False])).to_pylist() == [1.0, 0.0]
    # unsupported types -> default
    assert S.coerce_to_double(pa.array([[1], [2]]), default=0.5).to_pylist() == [0.5, 0.5]


def test_checkpoint_resume_validation(tmp_path):
    ckpt = CheckpointManager(str(tmp_path), "pagerank")
    ckpt.commit_iteration(3, [], {"algo": "pagerank", "bounds": [0, 10, 20]})
    m = ckpt.latest()
    # matching graph resumes fine
    ckpt.validate_resume(m, algo="pagerank", bounds=np.array([0, 10, 20]))
    # wrong algorithm refused
    with pytest.raises(ValueError, match="algo"):
        ckpt.validate_resume(m, algo="labelprop", bounds=np.array([0, 10, 20]))
    # wrong partitioning (different graph) refused
    with pytest.raises(ValueError, match="bounds"):
        ckpt.validate_resume(m, algo="pagerank", bounds=np.array([0, 12, 20]))
