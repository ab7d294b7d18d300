"""Temporal operators Ray Data has no native form for: gap-based
sessionization and an as-of (latest-at-or-before) join.

Both are built from the composition the custom-operator contract prefers —
``map_batches`` tagging + one coarse-bucket ``groupby().map_groups`` — and
both rely on the same documented partitioning assumption: **every row of one
key (user / join key) lands in one shuffle partition** (``hash(key) % fan``),
the standard sessionization partition contract.  Within a bucket the kernels
are fully vectorized: a lexsort + segment reduction for sessions, pandas'
C ``merge_asof`` for the as-of join.  At 100 TB the per-bucket work is
bounded by the largest single key's history times the keys-per-bucket ratio;
``fan`` scales with the cluster (stages/agg.shuffle_fan) and hot keys can be
pre-split by time range if one key's history outgrows a partition.

Timestamps are int64 epoch-microseconds end-to-end (``epoch_us`` on the
DuckDB oracle side) — integer compares, no float time arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..stages.agg import grouped_map, shuffle_fan

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def _bucket_of(keys: np.ndarray, fan: int) -> np.ndarray:
    h = keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((h >> np.uint64(33)) % np.uint64(fan)).astype(np.int64)


def _ts_us(col: pd.Series) -> np.ndarray:
    return col.astype("datetime64[us]").astype("int64").to_numpy()


def _ts_us_arrow(col: "pa.ChunkedArray") -> np.ndarray:
    """Arrow column (timestamp of any unit, date, or integral epoch-us) ->
    int64 epoch-microseconds, without a pandas round-trip."""
    t = col.type
    if pa.types.is_timestamp(t):
        return col.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
    if pa.types.is_date(t):
        return col.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
    return col.cast(pa.int64()).to_numpy()


def sessionize(
    events: rd.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    gap_us: int = SESSION_GAP_US,
    fan: int | None = None,
) -> rd.Dataset:
    """Gap-windowed sessions: {key, session_start_us, n_events, sum_value}.

    A new session starts at a key's first event or after an inactivity gap
    > ``gap_us``.  One shuffle (coarse bucket on the key); the per-bucket
    kernel is one ``np.lexsort`` + boundary flags + ``np.add.reduceat`` —
    per-group Python is bounded by the bucket count, not the session count.
    """
    npart = shuffle_fan()
    fan = int(fan) if fan is not None else 4 * npart

    def tag(b: pa.Table) -> pa.Table:
        # Arrow-native: five int64/float64 columns built straight from the
        # Arrow buffers (no pandas block materialization in the hot path)
        k = b[key].cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "k": pa.array(k),
                "t": pa.array(_ts_us_arrow(b[ts])),
                "v": pa.array(b[value].cast(pa.float64()).to_numpy()),
                "__b": pa.array(_bucket_of(k, fan)),
            }
        )

    def kernel(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                "session_start_us": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "sum_value": pa.array([], pa.float64()),
            }
        )
        if len(g) == 0 or "k" not in g.columns:
            return empty
        k = g["k"].to_numpy()
        t = g["t"].to_numpy()
        v = g["v"].to_numpy()
        order = np.lexsort((t, k))
        k, t, v = k[order], t[order], v[order]
        new = np.empty(len(k), dtype=bool)
        new[0] = True
        new[1:] = (k[1:] != k[:-1]) | ((t[1:] - t[:-1]) > gap_us)
        starts = np.flatnonzero(new)
        n_ev = np.diff(np.append(starts, len(k)))
        return pa.table(
            {
                key: pa.array(k[starts], pa.int64()),
                "session_start_us": pa.array(t[starts], pa.int64()),
                "n_events": pa.array(n_ev.astype(np.int64)),
                "sum_value": pa.array(np.add.reduceat(v, starts)),
            }
        )

    return grouped_map(
        events.map_batches(tag, batch_format="pyarrow"),
        "__b",
        kernel,
        num_partitions=npart,
        small_rows=1_000_000,  # kernel is one lexsort — linear per row, no pair fan-out
    )


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_key: str,
    left_ts: str,
    right_key: str,
    right_ts: str,
    left_cols: "dict[str, tuple[str, str]]",
    right_cols: "dict[str, tuple[str, str]]",
    right_tiebreak: str,
    fan: int | None = None,
) -> rd.Dataset:
    """As-of left join: each left row picks the right row with the same key
    and the latest timestamp <= the left timestamp (backward inexact join —
    the operator DuckDB spells ``ASOF LEFT JOIN`` and Ray Data lacks).

    ``left_cols`` / ``right_cols`` map source column -> (output name, dtype)
    with dtype in {'int64','float64'} for the carried payloads; right rows
    that tie on (key, ts) are first deduplicated to the max
    ``right_tiebreak`` value, so the match is deterministic on both engines.
    Missing matches fill int64 payloads with -1 and floats with 0.0
    (coalesce semantics — part of the output contract).

    Shape: both sides are tagged into the same coarse key-bucket space and
    co-shuffled through ONE ``groupby`` (a ``side`` marker keeps them
    apart); payloads travel in their NATIVE Arrow types with per-side null
    columns (the union schemas align, and an int64 id never rides a float —
    exact at any magnitude).  Per bucket, pandas ``merge_asof(by=key)``
    does the vectorized backward scan carrying only a row *position* for
    the right side (positions are < 2^53, so the float64 column pandas
    upcasts on misses is still exact); payloads are gathered by position
    afterwards in their own dtype.  One shuffle total, no driver
    materialization.
    """
    npart = shuffle_fan()
    fan = int(fan) if fan is not None else 4 * npart
    lpay = [(src, dst, dt) for src, (dst, dt) in left_cols.items()]
    rpay = [(src, dst, dt) for src, (dst, dt) in right_cols.items()]

    def _patype(dt: str):
        return pa.int64() if dt == "int64" else pa.float64()

    def _tag(side: int, key_col: str, ts_col: str):
        own = {("l_" if side == 0 else "r_") + dst: (src, dt) for src, dst, dt in (lpay if side == 0 else rpay)}

        def tag(b: pa.Table) -> pa.Table:
            n = b.num_rows
            k = b[key_col].cast(pa.int64()).to_numpy()
            cols = {
                "side": pa.array(np.full(n, side, dtype=np.int8)),
                "k": pa.array(k),
                "t": pa.array(_ts_us_arrow(b[ts_col])),
            }
            # canonical column order (all l_ then all r_) on BOTH sides with
            # identical Arrow types — the other side's payloads are null
            # columns, so the union's block schemas line up with no float
            # transport for int64 payloads
            for _, dst, dt in lpay:
                name = "l_" + dst
                cols[name] = (
                    b[own[name][0]].cast(_patype(dt)) if name in own else pa.nulls(n, _patype(dt))
                )
            for _, dst, dt in rpay:
                name = "r_" + dst
                cols[name] = (
                    b[own[name][0]].cast(_patype(dt)) if name in own else pa.nulls(n, _patype(dt))
                )
            cols["__b"] = pa.array(_bucket_of(k, fan))
            return pa.table(cols)

        return tag

    both = left.map_batches(_tag(0, left_key, left_ts), batch_format="pyarrow").union(
        right.map_batches(_tag(1, right_key, right_ts), batch_format="pyarrow")
    )

    out_fields = (
        [(left_key, pa.int64()), ("t_us", pa.int64())]
        + [(dst, _patype(dt)) for _, dst, dt in lpay]
        + [(dst, _patype(dt)) for _, dst, dt in rpay]
    )

    def kernel(g: pa.Table) -> pa.Table:
        empty = pa.table({name: pa.array([], ty) for name, ty in out_fields})
        if g.num_rows == 0 or "side" not in g.column_names:
            return empty
        side = g["side"].to_numpy()
        l = g.filter(pa.array(side == 0))
        if l.num_rows == 0:
            return empty
        r = g.filter(pa.array(side == 1))
        # per-side slices are fully valid in their own payload columns, so
        # to_numpy() yields the native dtype (int64 stays int64)
        lt = pd.DataFrame({"k": l["k"].to_numpy(), "t": l["t"].to_numpy()})
        for _, d, _ in lpay:
            lt[f"l_{d}"] = l[f"l_{d}"].to_numpy()
        rpayload = {d: r[f"r_{d}"].to_numpy() for _, d, _ in rpay}
        rt = pd.DataFrame(
            {
                "k": r["k"].to_numpy(),
                "t": r["t"].to_numpy(),
                "pos": np.arange(r.num_rows, dtype=np.int64),
                "_tb": rpayload[right_tiebreak],
            }
        )
        rt = (
            rt.sort_values(["k", "t", "_tb"], kind="mergesort")
            .drop_duplicates(["k", "t"], keep="last")
            .sort_values("t", kind="mergesort")
        )
        lt = lt.sort_values("t", kind="mergesort")
        merged = pd.merge_asof(
            lt, rt[["k", "t", "pos"]], on="t", by="k", direction="backward"
        )
        pos = merged["pos"].to_numpy()  # float64 w/ NaN on miss; positions exact
        miss = np.isnan(pos)
        pidx = np.where(miss, 0, pos).astype(np.int64)
        cols = {
            left_key: pa.array(merged["k"].to_numpy(), pa.int64()),
            "t_us": pa.array(merged["t"].to_numpy(), pa.int64()),
        }
        for _, d, dt in lpay:
            # left payloads pass through merge_asof untouched (no misses on
            # the left of a left join) — dtype and value exact
            cols[d] = pa.array(merged[f"l_{d}"].to_numpy()).cast(_patype(dt))
        for _, d, dt in rpay:
            src_vals = rpayload[d]
            if len(src_vals):
                base = src_vals[pidx]
            else:
                base = np.zeros(len(pidx), dtype=np.int64 if dt == "int64" else np.float64)
            if dt == "int64":
                cols[d] = pa.array(np.where(miss, np.int64(-1), base), pa.int64())
            else:
                cols[d] = pa.array(np.where(miss, 0.0, base), pa.float64())
        return pa.table(cols)

    return grouped_map(
        both, "__b", kernel, num_partitions=npart, batch_format="pyarrow",
        small_rows=1_000_000,  # merge_asof kernel — linear per row
    )


def sliding_window_agg(
    events: rd.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    value: str = "value",
    window_us: int = 3_600_000_000,
    fan: int | None = None,
) -> rd.Dataset:
    """Per-event sliding-window aggregate over the trailing ``window_us``:
    ``{key, id_col, t_us, n_win, win_sum_u}`` where the window is the SQL
    RANGE frame ``[t - window_us, t]`` over same-key events — peers at the
    exact same timestamp are all included, matching DuckDB's
    ``RANGE BETWEEN w PRECEDING AND CURRENT ROW``.

    Shape: ONE coarse-bucket shuffle on the key (whole keys co-locate), then
    a vectorized kernel per bucket: lexsort by (key, t), per-key-segment
    window bounds via a single ``np.searchsorted`` over an offset-composited
    time axis (each segment shifted by seg_id * HUGE so the global array is
    sorted — plain searchsorted over piecewise-sorted arrays would be
    invalid), and integer prefix sums of micro-unit values
    (``floor(v*1000+0.5)``), so the windowed sum is exact and replayable in
    SQL.  Per-event output rows, no per-group Python.
    """
    npart = shuffle_fan()
    fan = int(fan) if fan is not None else 4 * npart
    w = int(window_us)

    def tag(b: pa.Table) -> pa.Table:
        k = b[key].cast(pa.int64()).to_numpy()
        v = b[value].cast(pa.float64()).to_numpy()
        return pa.table(
            {
                "k": pa.array(k),
                "i": pa.array(b[id_col].cast(pa.int64()).to_numpy()),
                "t": pa.array(_ts_us_arrow(b[ts])),
                "vu": pa.array(np.floor(v * 1000 + 0.5).astype(np.int64)),
                "__b": pa.array(_bucket_of(k, fan)),
            }
        )

    def kernel(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "t_us": pa.array([], pa.int64()),
                "n_win": pa.array([], pa.int64()),
                "win_sum_u": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0 or "k" not in g.columns:
            return empty
        k = g["k"].to_numpy()
        t = g["t"].to_numpy()
        i = g["i"].to_numpy()
        vu = g["vu"].to_numpy()
        order = np.lexsort((t, k))
        k, t, i, vu = k[order], t[order], i[order], vu[order]
        t0 = t - t.min()  # normalize so seg offsets can't overflow int64
        new = np.empty(len(k), dtype=bool)
        new[0] = True
        new[1:] = k[1:] != k[:-1]
        seg = np.cumsum(new) - 1
        huge = int(t0.max()) + w + 2
        if int(seg[-1]) * huge + int(t0.max()) < 2**62:
            t_adj = t0 + seg * np.int64(huge)
            lb = np.searchsorted(t_adj, t_adj - w, side="left")
            ub = np.searchsorted(t_adj, t_adj, side="right")  # includes t-ties
        else:
            # many-keys x wide-time-span regime: seg * huge would silently
            # wrap int64.  Composite over RANKS instead (an order
            # isomorphism, so left/right semantics carry over exactly):
            # seg * M + rank with M <= 2n+1 and seg < n, so the product is
            # < 2n^2 < 2^63 for any bucket under 2^31 rows.
            st = np.unique(np.concatenate([t0, t0 - w]))
            M = np.int64(len(st) + 1)
            t_adj = seg * M + np.searchsorted(st, t0)
            lo_adj = seg * M + np.searchsorted(st, t0 - w)
            lb = np.searchsorted(t_adj, lo_adj, side="left")
            ub = np.searchsorted(t_adj, t_adj, side="right")  # includes t-ties
        pre = np.concatenate([[0], np.cumsum(vu)])  # exact int prefix sums
        return pa.table(
            {
                key: pa.array(k, pa.int64()),
                id_col: pa.array(i, pa.int64()),
                "t_us": pa.array(t, pa.int64()),
                "n_win": pa.array((ub - lb).astype(np.int64)),
                "win_sum_u": pa.array(pre[ub] - pre[lb], pa.int64()),
            }
        )

    return grouped_map(
        events.map_batches(tag, batch_format="pyarrow"),
        "__b",
        kernel,
        num_partitions=npart,
        small_rows=1_000_000,  # kernel is one lexsort — linear per row, no pair fan-out
    )


def range_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_key: str,
    left_ts: str,
    right_key: str,
    right_ts: str,
    left_id: str,
    right_id: str,
    lookback_us: int,
    left_out: str | None = None,
    right_out: str | None = None,
    fan: int | None = None,
) -> rd.Dataset:
    """Range (interval) join: every (left, right) pair with equal keys and
    ``left.ts - lookback_us <= right.ts <= left.ts`` — the inequality-band
    join Ray Data lacks (DuckDB spells it a plain ``JOIN ... BETWEEN``).
    Output: {key, left_id, right_id, t_us, rt_us}, one row per match.

    Same co-shuffle shape as ``asof_join`` (one coarse key-bucket groupby,
    side marker); the per-bucket kernel sorts each key's right timestamps
    once and finds every left row's match window with TWO ``np.searchsorted``
    calls against a key-partitioned composite order, then expands matches
    with repeat/arange — no per-row Python, no per-key Python.  Skew note:
    output cardinality is sum over keys of |L_k| x |matches|; a hot key's
    window fan-out is bounded by lookback_us, and the expansion happens
    inside the bucket task (streaming blocks out), never on the driver.
    """
    npart = shuffle_fan()
    fan = int(fan) if fan is not None else 4 * npart
    # output column names (settable so a self-join's two id columns differ)
    left_out = left_out or left_id
    right_out = right_out or right_id

    def _tag(side: int, key_col: str, ts_col: str, id_col: str):
        def tag(b: pa.Table) -> pa.Table:
            k = b[key_col].cast(pa.int64()).to_numpy()
            return pa.table(
                {
                    "side": pa.array(np.full(b.num_rows, side, dtype=np.int8)),
                    "k": pa.array(k),
                    "t": pa.array(_ts_us_arrow(b[ts_col])),
                    "rid": pa.array(b[id_col].cast(pa.int64()).to_numpy()),
                    "__b": pa.array(_bucket_of(k, fan)),
                }
            )

        return tag

    both = left.map_batches(_tag(0, left_key, left_ts, left_id), batch_format="pyarrow").union(
        right.map_batches(_tag(1, right_key, right_ts, right_id), batch_format="pyarrow")
    )

    def kernel(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "k": pa.array([], pa.int64()),
                left_out: pa.array([], pa.int64()),
                right_out: pa.array([], pa.int64()),
                "t_us": pa.array([], pa.int64()),
                "rt_us": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0 or "side" not in g.columns:
            return empty
        l = g[g["side"] == 0]
        r = g[g["side"] == 1]
        if len(l) == 0 or len(r) == 0:
            return empty
        # right side sorted by (key, t): each key owns a contiguous slice,
        # located per left row by searchsorted over the same composite order
        rk = r["k"].to_numpy()
        rt = r["t"].to_numpy()
        rr = r["rid"].to_numpy()
        ro = np.lexsort((rr, rt, rk))
        rk, rt, rr = rk[ro], rt[ro], rr[ro]
        lk = l["k"].to_numpy()
        lt = l["t"].to_numpy()
        lr = l["rid"].to_numpy()
        # drop left rows whose key has no right rows at all (no match)
        uk = np.unique(rk)
        pos = np.searchsorted(uk, lk)
        present = (pos < len(uk)) & (uk[np.minimum(pos, len(uk) - 1)] == lk)
        lk, lt, lr, kid_l = lk[present], lt[present], lr[present], pos[present]
        if len(lk) == 0:
            return empty
        # rt is only piecewise-sorted (within each key slice), so a global
        # searchsorted over it is invalid.  Build a GLOBALLY sorted composite
        # instead: slice_id * M + rank(t), with ranks taken over the union of
        # every timestamp involved (rank is an order-isomorphism, so
        # side='left'/'right' semantics carry over exactly) — overflow-safe
        # unlike packing raw epoch-us next to a key id.
        kid_r = np.searchsorted(uk, rk)
        st = np.unique(np.concatenate([rt, lt, lt - lookback_us]))
        M = np.int64(len(st) + 1)
        rc = kid_r * M + np.searchsorted(st, rt)
        a = np.searchsorted(rc, kid_l * M + np.searchsorted(st, lt - lookback_us), side="left")
        b = np.searchsorted(rc, kid_l * M + np.searchsorted(st, lt), side="right")
        n = b - a
        if n.sum() == 0:
            return empty
        rows = np.repeat(np.arange(len(lk), dtype=np.int64), n)
        csum = np.cumsum(n) - n
        idx = np.arange(int(n.sum()), dtype=np.int64) - np.repeat(csum, n) + np.repeat(a, n)
        return pa.table(
            {
                "k": pa.array(lk[rows], pa.int64()),
                left_out: pa.array(lr[rows], pa.int64()),
                right_out: pa.array(rr[idx], pa.int64()),
                "t_us": pa.array(lt[rows], pa.int64()),
                "rt_us": pa.array(rt[idx], pa.int64()),
            }
        )

    return grouped_map(both, "__b", kernel, num_partitions=npart, small_rows=1_000_000)
