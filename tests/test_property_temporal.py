"""Property-based checks (hypothesis): sessionize / asof_join vs brute-force
pandas references on randomized small inputs.

The planted-fixture tests in test_temporal.py pin the documented edge cases;
these sweep the input space around them (duplicate timestamps, exact-gap
boundaries, all-miss joins, single-key pileups).  Values are small integers
cast to float so sums compare exactly regardless of accumulation order.
"""

import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from neo4j_graph_algorithms_ray.pipelines.temporal import asof_join, sessionize

US = 1_000_000
GAP_S = 100

_events = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 1000), st.integers(-50, 50)),
    min_size=0,
    max_size=60,
)

_left_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 500), st.integers(0, 10_000)),
    min_size=0,
    max_size=40,
)
_right_rows = st.lists(
    st.tuples(
        st.integers(0, 3), st.integers(0, 500), st.integers(0, 10_000), st.integers(-20, 20)
    ),
    min_size=0,
    max_size=40,
)


def _ts(seconds):
    return pd.to_datetime(np.asarray(seconds, dtype=np.int64) * US, unit="us")


def _ref_sessionize(rows, gap_s):
    out = []
    df = pd.DataFrame(rows, columns=["k", "t", "v"])
    for k, g in df.groupby("k"):
        g = g.sort_values("t")
        t = g["t"].to_numpy()
        v = g["v"].to_numpy()
        start = 0
        for i in range(1, len(t) + 1):
            if i == len(t) or (t[i] - t[i - 1]) > gap_s:
                out.append((k, int(t[start]) * US, i - start, float(v[start:i].sum())))
                start = i
    return (
        pd.DataFrame(out, columns=["user_id", "session_start_us", "n_events", "sum_value"])
        .sort_values(["user_id", "session_start_us"])
        .reset_index(drop=True)
    )


@settings(max_examples=12, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(rows=_events)
def test_sessionize_matches_bruteforce(ray_session, rows):
    ev = pd.DataFrame(
        {
            "user_id": pd.Series([r[0] for r in rows], dtype=np.int64),
            "ts": _ts([r[1] for r in rows]),
            "value": pd.Series([float(r[2]) for r in rows], dtype=np.float64),
        }
    )
    got = sessionize(rd.from_pandas(ev), gap_us=GAP_S * US).to_pandas()
    want = _ref_sessionize(rows, GAP_S)
    if len(want) == 0:
        assert len(got) == 0
        return
    got = got.sort_values(["user_id", "session_start_us"]).reset_index(drop=True)
    for c in want.columns:
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy(), err_msg=c)


def _ref_asof(lrows, rrows):
    # per right (k, t): keep the row with the max tiebreak value
    out = []
    for k, t, eid in lrows:
        cand = [(rt, tb, price) for rk, rt, tb, price in rrows if rk == k and rt <= t]
        if cand:
            rt, tb, price = max(cand, key=lambda c: (c[0], c[1]))
            out.append((k, t * US, eid, tb, float(price)))
        else:
            out.append((k, t * US, eid, -1, 0.0))
    return (
        pd.DataFrame(out, columns=["user_id", "t_us", "event_id", "okey", "price"])
        .sort_values(["user_id", "t_us", "event_id", "okey", "price"])
        .reset_index(drop=True)
    )


@settings(max_examples=12, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(lrows=_left_rows, rrows=_right_rows)
def test_asof_join_matches_bruteforce(ray_session, lrows, rrows):
    left = pd.DataFrame(
        {
            "user_id": pd.Series([r[0] for r in lrows], dtype=np.int64),
            "ts": _ts([r[1] for r in lrows]),
            "event_id": pd.Series([r[2] for r in lrows], dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k": pd.Series([r[0] for r in rrows], dtype=np.int64),
            "ts": _ts([r[1] for r in rrows]),
            "okey": pd.Series([r[2] for r in rrows], dtype=np.int64),
            "price": pd.Series([float(r[3]) for r in rrows], dtype=np.float64),
        }
    )
    got = asof_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        left_key="user_id",
        left_ts="ts",
        right_key="k",
        right_ts="ts",
        left_cols={"event_id": ("event_id", "int64")},
        right_cols={"okey": ("okey", "int64"), "price": ("price", "float64")},
        right_tiebreak="okey",
    ).to_pandas()
    want = _ref_asof(lrows, rrows)
    if len(want) == 0:
        assert len(got) == 0
        return
    got = got.sort_values(["user_id", "t_us", "event_id", "okey", "price"]).reset_index(drop=True)
    assert len(got) == len(want)
    for c in want.columns:
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy(), err_msg=c)


@settings(max_examples=12, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(rows=_events, chunk_s=st.integers(20, 400))
def test_sessionize_chunked_matches_bruteforce(ray_session, rows, chunk_s):
    """Hot-key time split vs brute force at DRAWN chunk sizes — including
    chunks smaller than the gap (every session boundary-heavy) and chunks
    larger than the whole span (single chunk, stitch is a no-op)."""
    ev = pd.DataFrame(
        {
            "user_id": pd.Series([r[0] for r in rows], dtype=np.int64),
            "ts": _ts([r[1] for r in rows]),
            "value": pd.Series([float(r[2]) for r in rows], dtype=np.float64),
        }
    )
    got = sessionize(
        rd.from_pandas(ev), gap_us=GAP_S * US, time_chunk_us=chunk_s * US
    ).to_pandas()
    want = _ref_sessionize(rows, GAP_S)
    if len(want) == 0:
        assert len(got) == 0
        return
    got = got.sort_values(["user_id", "session_start_us"]).reset_index(drop=True)
    assert len(got) == len(want)
    for c in want.columns:
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy(), err_msg=c)


@settings(max_examples=12, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(lrows=_left_rows, rrows=_right_rows, chunk_s=st.integers(30, 600))
def test_asof_join_chunked_matches_bruteforce(ray_session, lrows, rrows, chunk_s):
    """Carry-in cascade vs brute force at drawn chunk sizes (sparse rights,
    duplicate timestamps, all-miss keys)."""
    left = pd.DataFrame(
        {
            "user_id": pd.Series([r[0] for r in lrows], dtype=np.int64),
            "ts": _ts([r[1] for r in lrows]),
            "event_id": pd.Series([r[2] for r in lrows], dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k": pd.Series([r[0] for r in rrows], dtype=np.int64),
            "ts": _ts([r[1] for r in rrows]),
            "okey": pd.Series([r[2] for r in rrows], dtype=np.int64),
            "price": pd.Series([float(r[3]) for r in rrows], dtype=np.float64),
        }
    )
    got = asof_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        left_key="user_id",
        left_ts="ts",
        right_key="k",
        right_ts="ts",
        left_cols={"event_id": ("event_id", "int64")},
        right_cols={"okey": ("okey", "int64"), "price": ("price", "float64")},
        right_tiebreak="okey",
        time_chunk_us=chunk_s * US,
    ).to_pandas()
    want = _ref_asof(lrows, rrows)
    if len(want) == 0:
        assert len(got) == 0
        return
    got = got.sort_values(["user_id", "t_us", "event_id", "okey", "price"]).reset_index(drop=True)
    assert len(got) == len(want)
    for c in want.columns:
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy(), err_msg=c)
