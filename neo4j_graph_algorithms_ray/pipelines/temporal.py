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
``fan`` scales with the cluster (stages/agg.shuffle_fan), and when one key's
history outgrows a partition every operator takes ``time_chunk_us`` — the
HOT-KEY TIME SPLIT that shuffles on (key, time-chunk) instead, restoring
correct cross-chunk semantics via halo copies (windowed ops), boundary-
session stitching (sessionize) or a carry-in cascade (as-of join), with
outputs identical to the unsplit path.

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


def _bucket_of_kc(keys: np.ndarray, chunks: np.ndarray, fan: int) -> np.ndarray:
    """Bucket of a (key, time-chunk) pair — the hot-key split's shuffle key.
    Mixing both coordinates spreads one key's chunks over the whole fan."""
    h = (keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ (
        chunks.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
    )
    h *= np.uint64(0x9E3779B97F4A7C15)
    return ((h >> np.uint64(33)) % np.uint64(fan)).astype(np.int64)


def _chunk_of(t: np.ndarray, chunk_us: int) -> np.ndarray:
    return np.floor_divide(t, np.int64(chunk_us))


def _no_nulls(col, name: str, op: str):
    """Loud guard: a null key/timestamp/id would silently upcast int64 ->
    float64 NaN in ``to_numpy`` (garbage bucket, NaN comparisons in the
    kernels) — the same silent-corruption class as the old 2^53 float
    transport.  O(1) on Arrow metadata."""
    nc = col.null_count
    if nc:
        raise ValueError(
            f"{op}: column {name!r} has {nc} null(s); temporal operators "
            "require non-null keys/timestamps/ids/payloads (the numpy "
            "transport would silently NaN-corrupt or crash on them) — "
            "filter or fill them upstream (ds.filter / pyarrow.compute.fill_null)"
        )
    return col


def _ts_us_arrow(col: "pa.ChunkedArray") -> np.ndarray:
    """Arrow column (timestamp of any unit, date, or integral epoch-us) ->
    int64 epoch-microseconds, without a pandas round-trip."""
    t = col.type
    if pa.types.is_timestamp(t):
        return col.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
    if pa.types.is_date(t):
        return col.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
    return col.cast(pa.int64()).to_numpy()


def suggest_time_chunk(
    events: rd.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    sample_mod: int = 100,
    hot_share: float = 0.05,
    target_tasks: int | None = None,
) -> int | None:
    """Decide whether a keyed temporal operator needs the hot-key time split,
    and size the chunk: sample ~1/``sample_mod`` of rows (deterministic hash
    of (key, ts) — no RNG, replayable), estimate the largest key's share of
    the input and its time span, and return a ``time_chunk_us`` that spreads
    that key over ~``target_tasks`` tasks.  Returns ``None`` when no key
    holds more than ``hot_share`` of the rows (the plain key shuffle is
    already balanced) or when the hot key's events share one timestamp
    (chunking cannot split them).

    One sampled pre-pass (a map + one small aggregate); the per-key
    aggregate is map-side combined, so the shuffle moves one row per
    (key, block), never the sample itself.
    """
    from ..stages.agg import bucketed_agg
    from ..stages.agg import shuffle_fan as _sf

    tt = int(target_tasks) if target_tasks else 4 * _sf()
    mod = max(1, int(sample_mod))

    def tag(b: pa.Table) -> pa.Table:
        k = _no_nulls(b[key], key, "suggest_time_chunk").cast(pa.int64()).to_numpy()
        t = _ts_us_arrow(_no_nulls(b[ts], ts, "suggest_time_chunk"))
        # sample via the SAME (key, ts) mix the hot-key split buckets with
        # (bucket 0 of `mod` == a 1/mod sample) — one definition, no drift
        keep = _bucket_of_kc(k, t, mod) == 0
        return pa.table({"k": pa.array(k[keep]), "t": pa.array(t[keep])})

    per_key = bucketed_agg(
        events.map_batches(tag, batch_format="pyarrow"),
        "k",
        {"n": ("k", "count"), "tmin": ("t", "min"), "tmax": ("t", "max")},
    )

    def block_summary(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {c: pa.array([], pa.int64()) for c in ("tot", "top_n", "tmin", "tmax")}
        )
        if b.num_rows == 0 or "n" not in b.column_names:
            return empty
        n = b["n"].to_numpy()
        i = int(np.argmax(n))
        return pa.table(
            {
                "tot": pa.array([int(n.sum())], pa.int64()),
                "top_n": pa.array([int(n[i])], pa.int64()),
                "tmin": pa.array([int(b["tmin"][i].as_py())], pa.int64()),
                "tmax": pa.array([int(b["tmax"][i].as_py())], pa.int64()),
            }
        )

    rows = per_key.map_batches(block_summary, batch_format="pyarrow").take_all()
    if not rows:
        return None
    tot = sum(r["tot"] for r in rows)
    if tot == 0:
        return None
    top = max(rows, key=lambda r: r["top_n"])
    if top["top_n"] / tot < hot_share:
        return None
    span = top["tmax"] - top["tmin"]
    if span <= 0:
        return None  # all events at one timestamp — chunking cannot split
    return max(1, -(-span // tt))  # ceil(span / target_tasks)


def sessionize(
    events: rd.Dataset,
    *,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    gap_us: int = SESSION_GAP_US,
    fan: int | None = None,
    time_chunk_us: int | None = None,
) -> rd.Dataset:
    """Gap-windowed sessions: {key, session_start_us, n_events, sum_value}.

    A new session starts at a key's first event or after an inactivity gap
    > ``gap_us``.  One shuffle (coarse bucket on the key); the per-bucket
    kernel is one ``np.lexsort`` + boundary flags + ``np.add.reduceat`` —
    per-group Python is bounded by the bucket count, not the session count.

    ``time_chunk_us`` turns on the HOT-KEY TIME SPLIT: rows shuffle on
    (key, ``t // time_chunk_us``) so one key's history spreads over the whole
    fan instead of landing in a single straggler task.  Pass 1 sessionizes
    each (key, chunk) independently and marks each chunk-segment's first and
    last session as *boundary* sessions (the only ones that can merge across
    a chunk edge — a middle session's neighbouring events are in its own
    chunk, already separated by > ``gap_us``); pass 2 stitches only those
    boundary sessions per key (≤ 2 rows per active (key, chunk) — tiny), so
    a key continuously active for months still merges into one session.
    Output is identical to the unchunked path.  Pick ``time_chunk_us`` ≫
    ``gap_us`` (e.g. a day for a 30-min gap) so few sessions are boundary.
    """
    npart = shuffle_fan()
    fan = int(fan) if fan is not None else 4 * npart

    if time_chunk_us is not None:
        return _sessionize_chunked(
            events, key=key, ts=ts, value=value, gap_us=gap_us, fan=fan,
            npart=npart, chunk_us=int(time_chunk_us),
        )

    def tag(b: pa.Table) -> pa.Table:
        # Arrow-native: five int64/float64 columns built straight from the
        # Arrow buffers (no pandas block materialization in the hot path)
        k = _no_nulls(b[key], key, "sessionize").cast(pa.int64()).to_numpy()
        _no_nulls(b[ts], ts, "sessionize")
        return pa.table(
            {
                "k": pa.array(k),
                "t": pa.array(_ts_us_arrow(b[ts])),
                "v": pa.array(_no_nulls(b[value], value, "sessionize").cast(pa.float64()).to_numpy()),
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


def _sessionize_chunked(
    events: rd.Dataset,
    *,
    key: str,
    ts: str,
    value: str,
    gap_us: int,
    fan: int,
    npart: int,
    chunk_us: int,
) -> rd.Dataset:
    """Hot-key time-split sessionize (see ``sessionize`` docstring).

    The pass-1 output (one row per partial session — already far smaller
    than the event input) is materialized once so the interior/boundary
    split doesn't re-execute the shuffle; pass 2 stitches boundary sessions
    per key-hash bucket.
    """
    import pyarrow.compute as pc

    def tag(b: pa.Table) -> pa.Table:
        k = _no_nulls(b[key], key, "sessionize").cast(pa.int64()).to_numpy()
        t = _ts_us_arrow(_no_nulls(b[ts], ts, "sessionize"))
        c = _chunk_of(t, chunk_us)
        return pa.table(
            {
                "k": pa.array(k),
                "t": pa.array(t),
                "v": pa.array(_no_nulls(b[value], value, "sessionize").cast(pa.float64()).to_numpy()),
                "c": pa.array(c),
                "__b": pa.array(_bucket_of_kc(k, c, fan)),
            }
        )

    part_schema = {
        key: pa.int64(),
        "session_start_us": pa.int64(),
        "n_events": pa.int64(),
        "sum_value": pa.float64(),
        "__end_us": pa.int64(),
        "__bnd": pa.int8(),
    }

    def kernel(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({n: pa.array([], ty) for n, ty in part_schema.items()})
        if len(g) == 0 or "k" not in g.columns:
            return empty
        k = g["k"].to_numpy()
        t = g["t"].to_numpy()
        v = g["v"].to_numpy()
        c = g["c"].to_numpy()
        order = np.lexsort((t, c, k))
        k, t, v, c = k[order], t[order], v[order], c[order]
        segnew = np.empty(len(k), dtype=bool)
        segnew[0] = True
        segnew[1:] = (k[1:] != k[:-1]) | (c[1:] != c[:-1])
        new = segnew.copy()
        new[1:] |= (t[1:] - t[:-1]) > gap_us
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(k)) - 1
        # a session is a *boundary* session iff it is the first or last
        # session of its (key, chunk) segment — the only merge candidates
        seg_of = (np.cumsum(segnew) - 1)[starts]
        first = np.empty(len(starts), dtype=bool)
        first[0] = True
        first[1:] = seg_of[1:] != seg_of[:-1]
        last = np.append(first[1:], True)
        return pa.table(
            {
                key: pa.array(k[starts], pa.int64()),
                "session_start_us": pa.array(t[starts], pa.int64()),
                "n_events": pa.array((ends - starts + 1).astype(np.int64)),
                "sum_value": pa.array(np.add.reduceat(v, starts)),
                "__end_us": pa.array(t[ends], pa.int64()),
                "__bnd": pa.array((first | last).astype(np.int8)),
            }
        )

    sess = grouped_map(
        events.map_batches(tag, batch_format="pyarrow"),
        "__b",
        kernel,
        num_partitions=npart,
        small_rows=1_000_000,
    ).materialize()  # consumed twice below; one partial-session row per session

    final_cols = [key, "session_start_us", "n_events", "sum_value"]

    def interior(tb: pa.Table) -> pa.Table:
        return tb.filter(pc.equal(tb["__bnd"], 0)).select(final_cols)

    def tag_boundary(tb: pa.Table) -> pa.Table:
        tb = tb.filter(pc.equal(tb["__bnd"], 1))
        k = tb[key].to_numpy()
        out = tb.select(final_cols + ["__end_us"])
        return out.append_column("__sb", pa.array(_bucket_of(k, fan)))

    def stitch(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                "session_start_us": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "sum_value": pa.array([], pa.float64()),
            }
        )
        if len(g) == 0 or key not in g.columns:
            return empty
        k = g[key].to_numpy()
        st = g["session_start_us"].to_numpy()
        n = g["n_events"].to_numpy()
        sv = g["sum_value"].to_numpy()
        en = g["__end_us"].to_numpy()
        order = np.lexsort((st, k))
        k, st, n, sv, en = k[order], st[order], n[order], sv[order], en[order]
        # per-key sessions are time-ordered and non-overlapping; merge
        # adjacent partial sessions whose inter-event gap is <= gap_us
        new = np.empty(len(k), dtype=bool)
        new[0] = True
        new[1:] = (k[1:] != k[:-1]) | ((st[1:] - en[:-1]) > gap_us)
        starts = np.flatnonzero(new)
        return pa.table(
            {
                key: pa.array(k[starts], pa.int64()),
                "session_start_us": pa.array(st[starts], pa.int64()),
                "n_events": pa.array(np.add.reduceat(n, starts).astype(np.int64)),
                "sum_value": pa.array(np.add.reduceat(sv, starts)),
            }
        )

    stitched = grouped_map(
        sess.map_batches(tag_boundary, batch_format="pyarrow"),
        "__sb",
        stitch,
        num_partitions=npart,
        small_rows=1_000_000,
    )
    return sess.map_batches(interior, batch_format="pyarrow").union(stitched)


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
    time_chunk_us: int | None = None,
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

    ``time_chunk_us`` turns on the HOT-KEY TIME SPLIT: both sides shuffle on
    (key, ``t // time_chunk_us``) so a hot key's history spreads over the
    whole fan.  Unlike the windowed ops, a backward as-of match can reach
    arbitrarily far back, so a halo copy can't bound it; instead a CARRY-IN
    cascade supplies each chunk's history: a map-side-combined summary pass
    reduces the right side to its last row per (key, chunk) (by (t,
    tiebreak)) plus the set of chunks holding left rows — a few rows per
    active (key, chunk) — and a per-key stitch forwards, for every
    left-holding chunk, the latest right row of any strictly-earlier chunk
    as one extra right row in that chunk's bucket.  The per-chunk
    ``merge_asof`` then sees its own rights plus exactly the history row it
    may need.  Output is identical to the unchunked path.  Note: the input
    datasets are consumed twice (tag + summary), so pass materialized or
    cheaply-recomputable Datasets.
    """
    npart = shuffle_fan()
    fan = int(fan) if fan is not None else 4 * npart
    lpay = [(src, dst, dt) for src, (dst, dt) in left_cols.items()]
    rpay = [(src, dst, dt) for src, (dst, dt) in right_cols.items()]
    chunk = int(time_chunk_us) if time_chunk_us is not None else None

    def _patype(dt: str):
        return pa.int64() if dt == "int64" else pa.float64()

    def _tag(side: int, key_col: str, ts_col: str):
        own = {("l_" if side == 0 else "r_") + dst: (src, dt) for src, dst, dt in (lpay if side == 0 else rpay)}

        def tag(b: pa.Table) -> pa.Table:
            n = b.num_rows
            k = _no_nulls(b[key_col], key_col, "asof_join").cast(pa.int64()).to_numpy()
            t = _ts_us_arrow(_no_nulls(b[ts_col], ts_col, "asof_join"))
            cols = {
                "side": pa.array(np.full(n, side, dtype=np.int8)),
                "k": pa.array(k),
                "t": pa.array(t),
            }
            # canonical column order (all l_ then all r_) on BOTH sides with
            # identical Arrow types — the other side's payloads are null
            # columns, so the union's block schemas line up with no float
            # transport for int64 payloads
            for _, dst, dt in lpay:
                name = "l_" + dst
                cols[name] = (
                    _no_nulls(b[own[name][0]], own[name][0], "asof_join").cast(_patype(dt))
                    if name in own
                    else pa.nulls(n, _patype(dt))
                )
            for _, dst, dt in rpay:
                name = "r_" + dst
                cols[name] = (
                    _no_nulls(b[own[name][0]], own[name][0], "asof_join").cast(_patype(dt))
                    if name in own
                    else pa.nulls(n, _patype(dt))
                )
            if chunk is not None:
                c = _chunk_of(t, chunk)
                cols["c"] = pa.array(c)
                cols["__b"] = pa.array(_bucket_of_kc(k, c, fan))
            else:
                cols["__b"] = pa.array(_bucket_of(k, fan))
            return pa.table(cols)

        return tag

    both = left.map_batches(_tag(0, left_key, left_ts), batch_format="pyarrow").union(
        right.map_batches(_tag(1, right_key, right_ts), batch_format="pyarrow")
    )

    if chunk is not None:
        # ---- carry-in cascade: one extra right row per left-holding chunk
        tb_dst = next(dst for _, dst, _ in rpay if dst == right_tiebreak)

        def summarize_left(b: pa.Table) -> pa.Table:
            # distinct (key, chunk) markers in this batch (map-side combine)
            k = _no_nulls(b[left_key], left_key, "asof_join").cast(pa.int64()).to_numpy()
            c = _chunk_of(_ts_us_arrow(_no_nulls(b[left_ts], left_ts, "asof_join")), chunk)
            o = np.lexsort((c, k))
            k, c = k[o], c[o]
            keep = np.empty(len(k), dtype=bool)
            if len(k):
                keep[0] = True
                keep[1:] = (k[1:] != k[:-1]) | (c[1:] != c[:-1])
            k, c = k[keep], c[keep]
            cols = {
                "side": pa.array(np.zeros(len(k), dtype=np.int8)),
                "k": pa.array(k),
                "c": pa.array(c),
                "t": pa.array(np.zeros(len(k), dtype=np.int64)),
            }
            for src, dst, dt in rpay:  # dummies — never read on side 0
                cols["r_" + dst] = pa.array(
                    np.zeros(len(k), dtype=np.int64 if dt == "int64" else np.float64)
                )
            cols["__sb"] = pa.array(_bucket_of(k, fan))
            return pa.table(cols)

        def summarize_right(b: pa.Table) -> pa.Table:
            # last right row per (key, chunk) by (t, tiebreak) in this batch
            k = _no_nulls(b[right_key], right_key, "asof_join").cast(pa.int64()).to_numpy()
            t = _ts_us_arrow(_no_nulls(b[right_ts], right_ts, "asof_join"))
            c = _chunk_of(t, chunk)
            tbv = b[next(src for src, dst, _ in rpay if dst == right_tiebreak)].to_numpy(
                zero_copy_only=False
            )
            o = np.lexsort((tbv, t, c, k))
            ks, cs = k[o], c[o]
            last = np.empty(len(o), dtype=bool)
            if len(o):
                last[-1] = True
                last[:-1] = (ks[1:] != ks[:-1]) | (cs[1:] != cs[:-1])
            sel = o[last]
            cols = {
                "side": pa.array(np.ones(len(sel), dtype=np.int8)),
                "k": pa.array(k[sel]),
                "c": pa.array(c[sel]),
                "t": pa.array(t[sel]),
            }
            for src, dst, dt in rpay:
                arr = b[src].cast(_patype(dt)).to_numpy(zero_copy_only=False)
                cols["r_" + dst] = pa.array(arr[sel], _patype(dt))
            cols["__sb"] = pa.array(_bucket_of(k[sel], fan))
            return pa.table(cols)

        def stitch(g: pa.Table) -> pa.Table:
            # per key: forward the latest strictly-earlier chunk's last right
            # row into every chunk that holds left rows
            carry_cols = (
                [("side", pa.int8()), ("k", pa.int64()), ("t", pa.int64())]
                + [("l_" + dst, _patype(dt)) for _, dst, dt in lpay]
                + [("r_" + dst, _patype(dt)) for _, dst, dt in rpay]
                + [("c", pa.int64()), ("__b", pa.int64())]
            )
            empty = pa.table({n: pa.array([], ty) for n, ty in carry_cols})
            if g.num_rows == 0 or "side" not in g.column_names:
                return empty
            side = g["side"].to_numpy(zero_copy_only=False)
            R = g.filter(pa.array(side == 1))
            L = g.filter(pa.array(side == 0))
            if L.num_rows == 0 or R.num_rows == 0:
                return empty
            rk = R["k"].to_numpy(zero_copy_only=False)
            rc = R["c"].to_numpy(zero_copy_only=False)
            rt = R["t"].to_numpy(zero_copy_only=False)
            rtb = R["r_" + tb_dst].to_numpy(zero_copy_only=False)
            # fold batch-level partial "lasts" to the true last per (k, c)
            o = np.lexsort((rtb, rt, rc, rk))
            ks, cs = rk[o], rc[o]
            last = np.empty(len(o), dtype=bool)
            last[-1] = True
            last[:-1] = (ks[1:] != ks[:-1]) | (cs[1:] != cs[:-1])
            sel = o[last]  # ascending in (k, c)
            rk2, rc2, rt2 = rk[sel], rc[sel], rt[sel]
            lk = L["k"].to_numpy(zero_copy_only=False)
            lc = L["c"].to_numpy(zero_copy_only=False)
            o2 = np.lexsort((lc, lk))
            lk, lc = lk[o2], lc[o2]
            keep = np.empty(len(lk), dtype=bool)
            keep[0] = True
            keep[1:] = (lk[1:] != lk[:-1]) | (lc[1:] != lc[:-1])
            lk, lc = lk[keep], lc[keep]
            # rank-composite (order-isomorphic, overflow-safe) binary search:
            # last right (k, c_r) with c_r < c_l
            uks = np.unique(np.concatenate([rk2, lk]))
            ucs = np.unique(np.concatenate([rc2, lc]))
            m = np.int64(len(ucs) + 1)
            comp_r = np.searchsorted(uks, rk2).astype(np.int64) * m + np.searchsorted(ucs, rc2)
            target = np.searchsorted(uks, lk).astype(np.int64) * m + np.searchsorted(ucs, lc)
            pos = np.searchsorted(comp_r, target, side="left") - 1
            safe = np.maximum(pos, 0)
            valid = (pos >= 0) & (rk2[safe] == lk)
            if not valid.any():
                return empty
            src_idx = sel[safe[valid]]  # positions back into R
            k_out = lk[valid]
            c_out = lc[valid]
            cols = {
                "side": pa.array(np.ones(len(k_out), dtype=np.int8)),
                "k": pa.array(k_out),
                "t": pa.array(rt[src_idx]),
            }
            for _, dst, dt in lpay:
                cols["l_" + dst] = pa.nulls(len(k_out), _patype(dt))
            for _, dst, dt in rpay:
                arr = R["r_" + dst].to_numpy(zero_copy_only=False)
                cols["r_" + dst] = pa.array(arr[src_idx], _patype(dt))
            cols["c"] = pa.array(c_out)
            cols["__b"] = pa.array(_bucket_of_kc(k_out, c_out, fan))
            return pa.table(cols)

        summaries = left.map_batches(summarize_left, batch_format="pyarrow").union(
            right.map_batches(summarize_right, batch_format="pyarrow")
        )
        carries = grouped_map(
            summaries, "__sb", stitch, num_partitions=npart, batch_format="pyarrow"
        )
        both = both.union(carries)

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
        by = ["k"] if chunk is None else ["k", "c"]
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
        if chunk is not None:
            # each (key, chunk) is its own as-of group: a chunk's rights are
            # its own rows plus the one carried-in history row
            lt["c"] = l["c"].to_numpy()
            rt["c"] = r["c"].to_numpy()
        rt = (
            rt.sort_values(by + ["t", "_tb"], kind="mergesort")
            .drop_duplicates(by + ["t"], keep="last")
            .sort_values("t", kind="mergesort")
        )
        lt = lt.sort_values("t", kind="mergesort")
        merged = pd.merge_asof(
            lt, rt[by + ["t", "pos"]], on="t", by=by, direction="backward"
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
    time_chunk_us: int | None = None,
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

    ``time_chunk_us`` (must be >= ``window_us``) turns on the HOT-KEY TIME
    SPLIT: rows shuffle on (key, ``t // time_chunk_us``); every row within
    ``window_us`` of its chunk's end is ALSO shipped to the next chunk as a
    context-only *halo* copy (it contributes to windows there but emits no
    output row), so each (key, chunk) task is self-contained and a single
    hot key's history spreads over the whole fan.  One halo copy suffices
    because a trailing window spans at most one chunk edge when
    ``time_chunk_us >= window_us``.  Output is identical to the unchunked
    path.
    """
    npart = shuffle_fan()
    fan = int(fan) if fan is not None else 4 * npart
    w = int(window_us)
    chunk = int(time_chunk_us) if time_chunk_us is not None else None
    if chunk is not None and chunk < w:
        raise ValueError(
            f"time_chunk_us={chunk} must be >= window_us={w}: the halo "
            "duplicates each row into at most the NEXT chunk, so a window "
            "must not span more than one chunk edge"
        )

    def tag(b: pa.Table) -> pa.Table:
        k = _no_nulls(b[key], key, "sliding_window_agg").cast(pa.int64()).to_numpy()
        v = _no_nulls(b[value], value, "sliding_window_agg").cast(pa.float64()).to_numpy()
        i = _no_nulls(b[id_col], id_col, "sliding_window_agg").cast(pa.int64()).to_numpy()
        t = _ts_us_arrow(_no_nulls(b[ts], ts, "sliding_window_agg"))
        vu = np.floor(v * 1000 + 0.5).astype(np.int64)
        if chunk is None:
            return pa.table(
                {
                    "k": pa.array(k),
                    "i": pa.array(i),
                    "t": pa.array(t),
                    "vu": pa.array(vu),
                    "__b": pa.array(_bucket_of(k, fan)),
                }
            )
        c = _chunk_of(t, chunk)
        # halo: rows within window_us of the chunk's end also feed the NEXT
        # chunk's early windows (context only — no output row there)
        dup = t >= (c + 1) * np.int64(chunk) - w
        n0 = len(k)
        k2 = np.concatenate([k, k[dup]])
        c2 = np.concatenate([c, c[dup] + 1])
        halo = np.zeros(len(k2), dtype=np.int8)
        halo[n0:] = 1
        return pa.table(
            {
                "k": pa.array(k2),
                "i": pa.array(np.concatenate([i, i[dup]])),
                "t": pa.array(np.concatenate([t, t[dup]])),
                "vu": pa.array(np.concatenate([vu, vu[dup]])),
                "c": pa.array(c2),
                "halo": pa.array(halo),
                "__b": pa.array(_bucket_of_kc(k2, c2, fan)),
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
        if chunk is not None:
            c = g["c"].to_numpy()
            halo = g["halo"].to_numpy()
            order = np.lexsort((t, c, k))
            k, t, i, vu, c, halo = (
                k[order], t[order], i[order], vu[order], c[order], halo[order]
            )
        else:
            order = np.lexsort((t, k))
            k, t, i, vu = k[order], t[order], i[order], vu[order]
        t0 = t - t.min()  # normalize so seg offsets can't overflow int64
        new = np.empty(len(k), dtype=bool)
        new[0] = True
        new[1:] = k[1:] != k[:-1]
        if chunk is not None:
            # a (key, chunk) pair is its own self-contained segment: its halo
            # rows carry the previous chunk's window context, and merging
            # chunks here would double-count rows that also exist as halos
            new[1:] |= c[1:] != c[:-1]
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
        n_win = (ub - lb).astype(np.int64)
        win_sum = pre[ub] - pre[lb]
        if chunk is not None:
            own = halo == 0  # halo rows are window context only
            k, i, t, n_win, win_sum = k[own], i[own], t[own], n_win[own], win_sum[own]
        return pa.table(
            {
                key: pa.array(k, pa.int64()),
                id_col: pa.array(i, pa.int64()),
                "t_us": pa.array(t, pa.int64()),
                "n_win": pa.array(n_win),
                "win_sum_u": pa.array(win_sum, pa.int64()),
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
    time_chunk_us: int | None = None,
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

    ``time_chunk_us`` (must be >= ``lookback_us``) turns on the HOT-KEY TIME
    SPLIT: both sides shuffle on (key, ``t // time_chunk_us``); right rows
    within ``lookback_us`` of their chunk's end are ALSO shipped to the next
    chunk (a left row's match window reaches at most one chunk back when
    ``time_chunk_us >= lookback_us``).  Left rows are never duplicated, so
    no match pair can be emitted twice.  Output is identical to the
    unchunked path.
    """
    npart = shuffle_fan()
    fan = int(fan) if fan is not None else 4 * npart
    # output column names (settable so a self-join's two id columns differ)
    left_out = left_out or left_id
    right_out = right_out or right_id
    if left_out == right_out:
        # the output table is keyed by column NAME: identical names would
        # silently collapse the two id columns into one (a self-join with
        # default names) — the misuse the names exist to prevent
        raise ValueError(
            f"range_join: left_out and right_out are both {left_out!r}; a "
            "self-join must set distinct output names (e.g. left_out='a_id', "
            "right_out='b_id')"
        )
    chunk = int(time_chunk_us) if time_chunk_us is not None else None
    if chunk is not None and chunk < lookback_us:
        raise ValueError(
            f"time_chunk_us={chunk} must be >= lookback_us={lookback_us}: "
            "right rows are duplicated into at most the NEXT chunk, so a "
            "match window must not reach more than one chunk back"
        )

    def _tag(side: int, key_col: str, ts_col: str, id_col: str):
        def tag(b: pa.Table) -> pa.Table:
            k = _no_nulls(b[key_col], key_col, "range_join").cast(pa.int64()).to_numpy()
            t = _ts_us_arrow(_no_nulls(b[ts_col], ts_col, "range_join"))
            rid = _no_nulls(b[id_col], id_col, "range_join").cast(pa.int64()).to_numpy()
            if chunk is None:
                return pa.table(
                    {
                        "side": pa.array(np.full(b.num_rows, side, dtype=np.int8)),
                        "k": pa.array(k),
                        "t": pa.array(t),
                        "rid": pa.array(rid),
                        "__b": pa.array(_bucket_of(k, fan)),
                    }
                )
            c = _chunk_of(t, chunk)
            if side == 1:
                # right rows near the chunk end also serve the next chunk's
                # early left rows
                dup = t >= (c + 1) * np.int64(chunk) - lookback_us
                k = np.concatenate([k, k[dup]])
                t = np.concatenate([t, t[dup]])
                rid = np.concatenate([rid, rid[dup]])
                c = np.concatenate([c, c[dup] + 1])
            return pa.table(
                {
                    "side": pa.array(np.full(len(k), side, dtype=np.int8)),
                    "k": pa.array(k),
                    "t": pa.array(t),
                    "rid": pa.array(rid),
                    "c": pa.array(c),
                    "__b": pa.array(_bucket_of_kc(k, c, fan)),
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
        rk = r["k"].to_numpy()
        rt = r["t"].to_numpy()
        rr = r["rid"].to_numpy()
        lk = l["k"].to_numpy()
        lt = l["t"].to_numpy()
        lr = l["rid"].to_numpy()
        if chunk is not None:
            # hot-key split: the join key is the (key, chunk) PAIR — a left
            # row only sees its own chunk's right rows plus the duplicated
            # tail of the previous chunk, and the same key's other chunks
            # live in other segments, so no pair is matched twice.  Dense-
            # factorize both coordinates; the composite fits int64 because
            # each factor is < the bucket's row count.
            lc = l["c"].to_numpy()
            rc_ = r["c"].to_numpy()
            uks = np.unique(np.concatenate([rk, lk]))
            ucs = np.unique(np.concatenate([rc_, lc]))
            m = np.int64(len(ucs) + 1)
            jr = np.searchsorted(uks, rk).astype(np.int64) * m + np.searchsorted(ucs, rc_)
            jl = np.searchsorted(uks, lk).astype(np.int64) * m + np.searchsorted(ucs, lc)
        else:
            jr, jl = rk, lk
        # right side sorted by (join key, t): each join key owns a contiguous
        # slice, located per left row by searchsorted over the same order
        ro = np.lexsort((rr, rt, jr))
        jr, rt, rr = jr[ro], rt[ro], rr[ro]
        # drop left rows whose join key has no right rows at all (no match)
        uk = np.unique(jr)
        pos = np.searchsorted(uk, jl)
        present = (pos < len(uk)) & (uk[np.minimum(pos, len(uk) - 1)] == jl)
        lk, lt, lr, kid_l = lk[present], lt[present], lr[present], pos[present]
        if len(lk) == 0:
            return empty
        # rt is only piecewise-sorted (within each join-key slice), so a
        # global searchsorted over it is invalid.  Build a GLOBALLY sorted
        # composite instead: slice_id * M + rank(t), with ranks taken over
        # the union of every timestamp involved (rank is an order-
        # isomorphism, so side='left'/'right' semantics carry over exactly)
        # — overflow-safe unlike packing raw epoch-us next to a key id.
        kid_r = np.searchsorted(uk, jr)
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
