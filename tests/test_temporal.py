"""Temporal operators (pipelines/temporal.py): sessionize + asof_join vs
hand-computed pandas oracles on planted fixtures."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray.pipelines.temporal import (
    asof_join,
    range_join,
    sessionize,
    sliding_window_agg,
)

US = 1_000_000


def _ts(seconds):
    return pd.to_datetime(np.asarray(seconds, dtype=np.int64) * US, unit="us")


def test_sessionize_gap_windows(ray_session):
    # user 1: events at 0s, 10s, 2000s (gap > 30min? no - 30min = 1800s; 1990s gap > 1800 -> new session)
    # user 2: single event
    ev = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "ts": _ts([0, 10, 2000, 5]),
            "value": [1.0, 2.0, 4.0, 8.0],
        }
    )
    out = (
        sessionize(rd.from_pandas(ev), gap_us=1800 * US)
        .to_pandas()
        .sort_values(["user_id", "session_start_us"])
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1, 1, 2]
    assert out["session_start_us"].tolist() == [0, 2000 * US, 5 * US]
    assert out["n_events"].tolist() == [2, 1, 1]
    np.testing.assert_allclose(out["sum_value"], [3.0, 4.0, 8.0])


def test_sessionize_exact_gap_is_same_session(ray_session):
    ev = pd.DataFrame({"user_id": [7, 7], "ts": _ts([0, 1800]), "value": [1.0, 1.0]})
    out = sessionize(rd.from_pandas(ev), gap_us=1800 * US).to_pandas()
    assert len(out) == 1 and out.iloc[0]["n_events"] == 2  # gap must EXCEED


def test_asof_join_backward_with_ties(ray_session):
    left = pd.DataFrame({"eid": [10, 11, 12, 13], "k": [1, 1, 1, 2], "ts": _ts([5, 15, 2, 5])})
    # key 1: orders at t=3 (okey 100) and DUPLICATE t=10 rows (okeys 200, 201
    # -> max wins); key 3 never matches key 2's event
    right = pd.DataFrame(
        {
            "okey": [100, 200, 201, 300],
            "k": [1, 1, 1, 3],
            "ts": _ts([3, 10, 10, 1]),
            "price": [1.5, 2.5, 3.5, 9.9],
        }
    )
    out = (
        asof_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            left_key="k",
            left_ts="ts",
            right_key="k",
            right_ts="ts",
            left_cols={"eid": ("event_id", "int64")},
            right_cols={"okey": ("o_orderkey", "int64"), "price": ("o_price", "float64")},
            right_tiebreak="o_orderkey",
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["event_id"].tolist() == [10, 11, 12, 13]
    # t=5 -> order@3; t=15 -> tie at t=10 resolved to okey 201; t=2 -> no
    # match (-1 / 0.0); key 2 -> no match
    assert out["o_orderkey"].tolist() == [100, 201, -1, -1]
    np.testing.assert_allclose(out["o_price"], [1.5, 3.5, 0.0, 0.0])


def test_asof_join_preserves_int_payloads_beyond_2_53(ray_session):
    """int64 payloads used to ride a float64 union (lossy above 2^53, caught
    by a loud guard — ADVICE r02).  The typed transport (per-side null
    columns + position-indirected merge) must now round-trip any int64
    EXACTLY on both sides."""
    big_l = 2**53 + 1
    big_r = 2**62 + 7
    left = pd.DataFrame({"eid": [big_l, big_l + 2], "k": [1, 1], "ts": _ts([5, 1])})
    right = pd.DataFrame({"okey": [big_r, 100], "k": [1, 1], "ts": _ts([3, 4])})
    out = (
        asof_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            left_key="k",
            left_ts="ts",
            right_key="k",
            right_ts="ts",
            left_cols={"eid": ("event_id", "int64")},
            right_cols={"okey": ("o_orderkey", "int64")},
            right_tiebreak="o_orderkey",
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # t=5 matches the latest right at t=4 (okey 100); t=1 has no match (-1)
    assert out["event_id"].tolist() == [big_l, big_l + 2]
    assert out["o_orderkey"].tolist() == [100, -1]
    # and a left row that picks the huge right id gets it bit-exactly
    out2 = (
        asof_join(
            rd.from_pandas(pd.DataFrame({"eid": [1], "k": [1], "ts": _ts([3])})),
            rd.from_pandas(right),
            left_key="k", left_ts="ts", right_key="k", right_ts="ts",
            left_cols={"eid": ("event_id", "int64")},
            right_cols={"okey": ("o_orderkey", "int64")},
            right_tiebreak="o_orderkey",
        ).to_pandas()
    )
    assert out2["o_orderkey"].tolist() == [big_r]


def test_range_join_matches_bruteforce(ray_session):
    from neo4j_graph_algorithms_ray.pipelines.temporal import range_join

    rng = np.random.default_rng(11)
    nl, nr = 300, 200
    left = pd.DataFrame(
        {
            "eid": np.arange(nl, dtype=np.int64),
            "k": rng.integers(0, 12, nl).astype(np.int64),
            "ts": _ts(rng.integers(0, 500, nl)),
        }
    )
    right = pd.DataFrame(
        {
            "oid": np.arange(nr, dtype=np.int64) + 1000,
            "k": rng.integers(0, 15, nr).astype(np.int64),  # some keys absent on left
            "ts": _ts(rng.integers(0, 500, nr)),
        }
    )
    W = 40 * US
    got = (
        range_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            left_key="k",
            left_ts="ts",
            right_key="k",
            right_ts="ts",
            left_id="eid",
            right_id="oid",
            lookback_us=W,
        )
        .to_pandas()
        .sort_values(["eid", "oid"])
        .reset_index(drop=True)
    )
    lb = left.assign(t=left["ts"].astype("datetime64[us]").astype("int64"))
    rb = right.assign(rt=right["ts"].astype("datetime64[us]").astype("int64"))
    exp = lb.merge(rb, on="k")
    exp = exp[(exp["rt"] >= exp["t"] - W) & (exp["rt"] <= exp["t"])]
    exp = exp[["k", "eid", "oid", "t", "rt"]].rename(columns={"t": "t_us", "rt": "rt_us"})
    exp = exp.sort_values(["eid", "oid"]).reset_index(drop=True)
    assert len(got) == len(exp) and len(exp) > 100
    for c in ("k", "eid", "oid", "t_us", "rt_us"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_temporal_partitioning_invariance(ray_session):
    """Same results whatever the input block layout (the kernels are
    per-bucket global, so block composition must not matter)."""
    rng = np.random.default_rng(23)
    n = 500
    ev = pd.DataFrame(
        {
            "user_id": rng.integers(0, 20, n).astype(np.int64),
            "ts": _ts(rng.integers(0, 10_000, n)),
            "value": rng.normal(size=n),
        }
    )

    def run(parts):
        return (
            sessionize(rd.from_pandas(ev).repartition(parts))
            .to_pandas()
            .sort_values(["user_id", "session_start_us"])
            .reset_index(drop=True)
        )

    a, b = run(1), run(13)
    assert a["n_events"].tolist() == b["n_events"].tolist()
    assert a["session_start_us"].tolist() == b["session_start_us"].tolist()
    np.testing.assert_allclose(a["sum_value"], b["sum_value"], atol=1e-12)


def test_temporal_empty_inputs(ray_session):
    from neo4j_graph_algorithms_ray.pipelines.temporal import asof_join, range_join
    from neo4j_graph_algorithms_ray.stages.agg import topk_per_group

    empty = pd.DataFrame(
        {
            "eid": pd.Series(dtype=np.int64),
            "k": pd.Series(dtype=np.int64),
            "ts": pd.Series(dtype="datetime64[us]"),
            "v": pd.Series(dtype=np.float64),
        }
    )
    ev = rd.from_pandas(empty)
    assert sessionize(ev, key="k", ts="ts", value="v").count() == 0
    one = rd.from_pandas(
        pd.DataFrame({"eid": [1], "k": [2], "ts": _ts([3]), "v": [4.0]})
    )
    # empty right side -> no matches (asof fills, range drops)
    a = asof_join(
        one, ev, left_key="k", left_ts="ts", right_key="k", right_ts="ts",
        left_cols={"eid": ("eid", "int64")}, right_cols={"v": ("rv", "float64")},
        right_tiebreak="rv",
    ).to_pandas()
    assert len(a) == 1 and a.iloc[0]["rv"] == 0.0
    r = range_join(
        one, ev, left_key="k", left_ts="ts", right_key="k", right_ts="ts",
        left_id="eid", right_id="eid", left_out="l_eid", right_out="r_eid",
        lookback_us=10,
    )
    assert r.count() == 0
    assert topk_per_group(ev, "k", "v", 3, id_col="eid").count() == 0
    from neo4j_graph_algorithms_ray.pipelines.temporal import sliding_window_agg

    empty_ev = pd.DataFrame(
        {
            "event_id": pd.Series(dtype=np.int64),
            "user_id": pd.Series(dtype=np.int64),
            "ts": pd.Series(dtype="datetime64[us]"),
            "value": pd.Series(dtype=np.float64),
        }
    )
    assert sliding_window_agg(rd.from_pandas(empty_ev)).count() == 0


def test_sliding_window_agg_matches_bruteforce(ray_session):
    """Trailing RANGE-frame window counts/sums equal an O(n^2) brute force,
    including same-timestamp peers (SQL RANGE semantics)."""
    from neo4j_graph_algorithms_ray.pipelines.temporal import sliding_window_agg

    rng = np.random.default_rng(11)
    n = 400
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 8, n),
            "ts": _ts(rng.integers(0, 50, n)),  # coarse: plants t-ties per user
            "value": rng.normal(10, 3, n),
        }
    )
    w_us = 5 * 1_000_000  # the _ts helper spaces units seconds apart
    out = (
        sliding_window_agg(rd.from_pandas(ev), window_us=w_us)
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    t_us = ev["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    vu = np.floor(ev["value"].to_numpy() * 1000 + 0.5).astype(np.int64)
    for _, row in out.iterrows():
        m = (ev["user_id"].to_numpy() == row["user_id"]) & (
            t_us >= row["t_us"] - w_us
        ) & (t_us <= row["t_us"])
        assert row["n_win"] == int(m.sum()), row["event_id"]
        assert row["win_sum_u"] == int(vu[m].sum()), row["event_id"]
    assert len(out) == n


def test_sliding_window_overflow_fallback_matches_bruteforce(ray_session):
    """Many keys x astronomically wide time span: seg * huge would wrap
    int64 (ADVICE r03) — the rank-composited fallback must yield the same
    answers as a brute force.  fan=1 co-locates every key so the overflow
    condition actually fires inside one kernel call."""
    from neo4j_graph_algorithms_ray.pipelines.temporal import sliding_window_agg

    rng = np.random.default_rng(5)
    n_users, per = 16, 4
    # 15 * 2^56 > 2^63: the pre-guard composite genuinely wrapped here
    base = np.repeat(np.arange(n_users, dtype=np.int64), per) * (2**56)
    t_us = base + rng.integers(0, 20 * US, n_users * per)
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n_users * per, dtype=np.int64),
            "user_id": np.repeat(np.arange(n_users, dtype=np.int64), per),
            "ts": pd.Series(t_us).astype("datetime64[us]"),
            "value": rng.normal(10, 3, n_users * per),
        }
    )
    w_us = 5 * US
    out = (
        sliding_window_agg(rd.from_pandas(ev), window_us=w_us, fan=1)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    vu = np.floor(ev["value"].to_numpy() * 1000 + 0.5).astype(np.int64)
    uid = ev["user_id"].to_numpy()
    for _, row in out.iterrows():
        m = (uid == row["user_id"]) & (t_us >= row["t_us"] - w_us) & (t_us <= row["t_us"])
        assert row["n_win"] == int(m.sum())
        assert row["win_sum_u"] == int(vu[m].sum())
    assert len(out) == n_users * per


def test_temporal_hot_key_skew_bounded(ray_session):
    """Skew edge the module docstring documents (temporal.py:12-13): ONE key
    owns ~all rows.  The whole key lands in one bucket task; the kernels must
    stay vectorized (no per-row Python) and the range_join expansion bounded
    by the lookback fan-out — 20k single-key events with ~40 matches each
    complete in seconds and match the independent searchsorted oracle."""
    from neo4j_graph_algorithms_ray.pipelines.temporal import range_join, sliding_window_agg

    rng = np.random.default_rng(3)
    n = 20_000
    t_us = np.sort(rng.integers(0, n * US // 10, n)).astype(np.int64)  # ~10 ev/sec, ties likely
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": np.zeros(n, dtype=np.int64),  # one hot key
            "ts": pd.Series(t_us).astype("datetime64[us]"),
            "value": rng.normal(10, 3, n),
        }
    )
    # a cold key alongside proves the bucket kernel still separates keys
    cold = ev.iloc[:5].assign(user_id=np.int64(7), event_id=np.arange(n, n + 5, dtype=np.int64))
    both = pd.concat([ev, cold], ignore_index=True)
    w = 4 * US

    sw = (
        sliding_window_agg(rd.from_pandas(both), window_us=w)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert len(sw) == n + 5
    hot_sw = sw[sw["user_id"] == 0]
    lb = np.searchsorted(t_us, hot_sw["t_us"].to_numpy() - w, side="left")
    ub = np.searchsorted(t_us, hot_sw["t_us"].to_numpy(), side="right")
    np.testing.assert_array_equal(hot_sw["n_win"].to_numpy(), ub - lb)
    vu = np.floor(ev["value"].to_numpy() * 1000 + 0.5).astype(np.int64)
    pre = np.concatenate([[0], np.cumsum(vu)])
    np.testing.assert_array_equal(hot_sw["win_sum_u"].to_numpy(), pre[ub] - pre[lb])

    rj = range_join(
        rd.from_pandas(both), rd.from_pandas(both),
        left_key="user_id", left_ts="ts", right_key="user_id", right_ts="ts",
        left_id="event_id", right_id="event_id",
        left_out="l_id", right_out="r_id", lookback_us=w,
    )
    # expected cardinality: per hot left row, right rows with t in [t-w, t];
    # plus the cold key's own 5x5 band
    hot_matches = int((ub - lb).sum())
    ct = t_us[:5]
    clb = np.searchsorted(ct, ct - w, side="left")
    cub = np.searchsorted(ct, ct, side="right")
    assert rj.count() == hot_matches + int((cub - clb).sum())


# ---------------------------------------------------------------------------
# hot-key time split (time_chunk_us): chunked output must be IDENTICAL to the
# unchunked path on every operator — the split is pure parallelism


def _chunked_corpus(seed=42, n=6000, n_hot=8000, span_s=20 * 86400):
    """Mixed corpus: 30 normal keys + one mega-hot key, 20-day span."""
    rng = np.random.default_rng(seed)
    ev = pd.DataFrame(
        {
            "user_id": rng.integers(0, 30, n),
            "ts": _ts(rng.integers(0, span_s, n)),
            "value": rng.normal(size=n).round(3),
            "event_id": np.arange(n, dtype=np.int64),
        }
    )
    hot = pd.DataFrame(
        {
            "user_id": np.full(n_hot, 999, dtype=np.int64),
            "ts": _ts(np.sort(rng.integers(0, span_s, n_hot))),
            "value": np.ones(n_hot),
            "event_id": np.arange(n, n + n_hot, dtype=np.int64),
        }
    )
    return pd.concat([ev, hot], ignore_index=True)


def test_sessionize_time_chunk_matches_unchunked(ray_session):
    ev = _chunked_corpus()
    ds = rd.from_pandas(ev)
    gap = 1800 * US
    cols = ["user_id", "session_start_us"]
    a = sessionize(ds, gap_us=gap).to_pandas().sort_values(cols).reset_index(drop=True)
    b = (
        sessionize(ds, gap_us=gap, time_chunk_us=6 * 3600 * US)
        .to_pandas().sort_values(cols).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns], check_like=True)


def test_sessionize_time_chunk_stitches_multi_chunk_session(ray_session):
    """A key continuously active across many chunk edges must still collapse
    into ONE session (boundary-session stitch chains across chunks)."""
    t = np.arange(0, 10 * 3600, 60, dtype=np.int64)  # event every minute, 10h
    ev = pd.DataFrame({"user_id": np.ones(len(t), dtype=np.int64), "ts": _ts(t), "value": np.ones(len(t))})
    out = sessionize(
        rd.from_pandas(ev), gap_us=1800 * US, time_chunk_us=3600 * US
    ).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["n_events"] == len(t)
    assert out.iloc[0]["session_start_us"] == 0


def test_sliding_window_time_chunk_matches_unchunked(ray_session):
    ev = _chunked_corpus(seed=7)
    ds = rd.from_pandas(ev)
    w = 3600 * US
    a = (
        sliding_window_agg(ds, window_us=w)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    b = (
        sliding_window_agg(ds, window_us=w, time_chunk_us=4 * w)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns], check_like=True)


def test_sliding_window_time_chunk_smaller_than_window_raises(ray_session):
    from neo4j_graph_algorithms_ray.pipelines.temporal import sliding_window_agg as swa

    ev = pd.DataFrame({"user_id": [1], "ts": _ts([0]), "value": [1.0], "event_id": [0]})
    with pytest.raises(ValueError, match="time_chunk_us"):
        swa(rd.from_pandas(ev), window_us=10 * US, time_chunk_us=5 * US)


def test_range_join_time_chunk_matches_unchunked(ray_session):
    ev = _chunked_corpus(seed=9, n=4000, n_hot=5000)
    left = ev.rename(columns={"event_id": "lid"})
    rng = np.random.default_rng(10)
    right = pd.DataFrame(
        {
            "user_id": rng.integers(0, 30, 3000),
            "ts": _ts(rng.integers(0, 20 * 86400, 3000)),
            "rid": np.arange(3000, dtype=np.int64),
        }
    )
    kw = dict(
        left_key="user_id", left_ts="ts", right_key="user_id", right_ts="ts",
        left_id="lid", right_id="rid", lookback_us=1800 * US,
        left_out="L", right_out="R",
    )
    cols = ["k", "L", "R"]
    a = (
        range_join(rd.from_pandas(left), rd.from_pandas(right), **kw)
        .to_pandas().sort_values(cols).reset_index(drop=True)
    )
    b = (
        range_join(rd.from_pandas(left), rd.from_pandas(right), **kw, time_chunk_us=3600 * US)
        .to_pandas().sort_values(cols).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns], check_like=True)
    with pytest.raises(ValueError, match="time_chunk_us"):
        range_join(
            rd.from_pandas(left), rd.from_pandas(right), **kw, time_chunk_us=60 * US
        )


def test_asof_join_time_chunk_matches_unchunked(ray_session):
    """Carry-in cascade: sparse right side forces cross-chunk history matches;
    a key with one early right row and a left row ~60 empty chunks later must
    still match it (and a left row BEFORE all rights must miss)."""
    rng = np.random.default_rng(11)
    nl, nr = 8000, 1200
    left = pd.DataFrame(
        {
            "eid": np.arange(nl, dtype=np.int64),
            "k": rng.integers(0, 25, nl),
            "ts": _ts(rng.integers(0, 20 * 86400, nl)),
        }
    )
    right = pd.DataFrame(
        {
            "okey": np.arange(nr, dtype=np.int64),
            "k": rng.integers(0, 25, nr),
            "ts": _ts(rng.integers(0, 20 * 86400, nr)),
            "price": rng.normal(size=nr).round(2),
        }
    )
    dup = right.sample(150, random_state=0).copy()
    dup["okey"] += 100000  # timestamp ties -> tiebreak must pick max okey
    right = pd.concat([right, dup], ignore_index=True)
    early = pd.DataFrame({"okey": [900000], "k": [77], "ts": _ts([5]), "price": [42.0]})
    latel = pd.DataFrame({"eid": [990000, 990001], "k": [77, 77], "ts": _ts([15 * 86400, 3])})
    left = pd.concat([left, latel], ignore_index=True)
    right = pd.concat([right, early], ignore_index=True)

    kw = dict(
        left_key="k", left_ts="ts", right_key="k", right_ts="ts",
        left_cols={"eid": ("event_id", "int64")},
        right_cols={"okey": ("o_orderkey", "int64"), "price": ("o_price", "float64")},
        right_tiebreak="o_orderkey",
    )
    a = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right), **kw)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    b = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right), **kw, time_chunk_us=6 * 3600 * US)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns], check_like=True)
    assert b[b.event_id == 990000]["o_orderkey"].iloc[0] == 900000  # carry across ~60 empty chunks
    assert b[b.event_id == 990001]["o_orderkey"].iloc[0] == -1  # before all rights -> miss


def test_time_chunk_spreads_hot_key_over_buckets():
    """The point of the split: one key's chunks must land in MANY buckets
    (the unchunked bucket function pins a key to exactly one)."""
    from neo4j_graph_algorithms_ray.pipelines.temporal import _bucket_of, _bucket_of_kc

    k = np.zeros(1000, dtype=np.int64)
    c = np.arange(1000, dtype=np.int64)
    assert len(np.unique(_bucket_of(k, 64))) == 1
    assert len(np.unique(_bucket_of_kc(k, c, 64))) > 32


def test_temporal_null_keys_raise_loudly(ray_session):
    """A null key/ts would silently become float64 NaN in to_numpy (garbage
    bucket, NaN kernel compares) — the tags must refuse instead."""
    ev = pd.DataFrame(
        {
            "user_id": pd.array([1, None], dtype="Int64"),
            "ts": _ts([0, 10]),
            "value": [1.0, 2.0],
            "event_id": np.arange(2, dtype=np.int64),
        }
    )
    with pytest.raises(Exception, match="null"):
        sessionize(rd.from_pandas(ev)).to_pandas()
    with pytest.raises(Exception, match="null"):
        sliding_window_agg(rd.from_pandas(ev)).to_pandas()


def test_suggest_time_chunk(ray_session):
    from neo4j_graph_algorithms_ray.pipelines.temporal import suggest_time_chunk

    rng = np.random.default_rng(2)
    n = 40000
    # balanced corpus: no recommendation
    bal = pd.DataFrame(
        {
            "user_id": rng.integers(0, 1000, n),
            "ts": _ts(rng.integers(0, 10 * 86400, n)),
            "value": np.ones(n),
        }
    )
    assert suggest_time_chunk(rd.from_pandas(bal), sample_mod=10) is None

    # hot corpus: one key owns half the rows over ~10 days
    hot = bal.copy()
    hot.loc[: n // 2, "user_id"] = 999
    chunk = suggest_time_chunk(rd.from_pandas(hot), sample_mod=10, target_tasks=64)
    assert chunk is not None
    span = 10 * 86400 * US
    assert 0 < chunk <= span  # spreads the hot key over many chunks
    # and the recommendation actually splits: use it end-to-end
    out = sessionize(rd.from_pandas(hot), time_chunk_us=max(chunk, 2 * 1800 * US)).to_pandas()
    ref = sessionize(rd.from_pandas(hot)).to_pandas()
    assert len(out) == len(ref)

    # hot key with a single timestamp: chunking can't help
    onet = bal.copy()
    onet.loc[: n // 2, "user_id"] = 999
    onet.loc[: n // 2, "ts"] = _ts([5])[0]
    assert suggest_time_chunk(rd.from_pandas(onet), sample_mod=10) is None


def test_time_chunk_negative_timestamps(ray_session):
    """Pre-1970 epochs: floor-division chunk ids go negative; halo and stitch
    arithmetic must still line up exactly."""
    rng = np.random.default_rng(8)
    n = 3000
    secs = rng.integers(-5 * 86400, 5 * 86400, n)  # straddles zero
    ev = pd.DataFrame(
        {
            "user_id": rng.integers(0, 10, n),
            "ts": _ts(secs),
            "value": np.ones(n),
            "event_id": np.arange(n, dtype=np.int64),
        }
    )
    ds = rd.from_pandas(ev)
    w = 3600 * US
    a = (
        sliding_window_agg(ds, window_us=w)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    b = (
        sliding_window_agg(ds, window_us=w, time_chunk_us=6 * w)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns], check_like=True)
    cols = ["user_id", "session_start_us"]
    sa = sessionize(ds).to_pandas().sort_values(cols).reset_index(drop=True)
    sb = (
        sessionize(ds, time_chunk_us=4 * 3600 * US)
        .to_pandas().sort_values(cols).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(sa, sb[sa.columns], check_like=True)
