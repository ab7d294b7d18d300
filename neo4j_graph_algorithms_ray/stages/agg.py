"""Bucketed high-cardinality groupby-aggregate.

Ray Data's native ``groupby().aggregate()`` (sort-based AllToAll) walks group
boundaries in per-group Python — measured ~1.3 ms per distinct key on this
build regardless of row volume (26k rows / 25k keys: 34 s; same rows / 100
keys: well under a second).  Any aggregate whose key cardinality scales with
the data (per-pair intersection counts, per-vertex sums, content digests,
per-customer totals) therefore becomes a hidden per-key Python loop.

This stage keeps identical semantics but bounds the per-group Python work at
``fan`` coarse groups:

- **map-side combine**: a per-block pandas groupby (C kernel) first reduces
  each block to one row per distinct key — the shuffle ships pre-aggregated
  rows, never raw rows (the combiner the north star calls for),
- **coarse-bucket shuffle**: rows move on ``hash(key) % fan`` (single int
  column, ``fan`` groups) so Ray's sort/partition step sees ``fan`` groups,
  not millions; every distinct key lands wholly in one bucket,
- **per-bucket final combine**: one vectorized pandas groupby per bucket.

Supported ops: ``sum`` / ``count`` / ``min`` / ``max`` (count folds as a sum
of partial counts).  Reference parity note: the reference's aggregates are
array reductions by dense id (SURVEY.md §2.7); this is their shuffle form for
keys that don't fit a dense array.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_PARTIAL_OP = {"sum": "sum", "count": "size", "min": "min", "max": "max"}
_FOLD_OP = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def shuffle_fan() -> int:
    """Hash-shuffle partition count sized to the session: ``ncpu // 2``
    (each partition spawns an aggregator actor reserving a CPU fraction —
    oversized fans deadlock small sessions, see stages/joins.py; the fan
    must also GROW with the cluster or a fixed count becomes the shuffle
    bottleneck at scale).  The 256 ceiling bounds aggregator-actor count on
    very large clusters (256 x 0.125 CPU reserved = 32 CPUs)."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(ncpu // 2, 256))


def actor_pool_args(max_actors: int = 8) -> dict:
    """``map_batches`` kwargs for a stateful actor-pool stage, sized so the
    pool can never starve the rest of the pipeline.

    On a cramped session (<= 2 CPUs) every actor reserves 0.5 CPU: a
    pipeline chaining TWO actor-pool stages (knn_ivf's assign -> score) would
    otherwise pin min-1-actor x 1 CPU each — the whole cluster — and the
    upstream read tasks pend forever (observed: knn_ivf livelocks a
    ``num_cpus=2`` session).  Larger sessions keep the default whole-CPU
    reservation and autoscale the pool to ``min(max_actors, ncpu - 1)``."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    if ncpu <= 2:
        return {"concurrency": (1, max(1, ncpu)), "num_cpus": 0.5}
    return {"concurrency": (1, max(1, min(max_actors, ncpu - 1)))}


def route_stage_args() -> dict:
    """``map_batches`` kwargs for a single-actor routing stage (ordered
    hand-off into a raw shard-actor pool).  Concurrency is pinned at 1 —
    routing correctness assumes one writer — but on a cramped session the
    actor reserves 0.5 CPU so the shard pool (clamped to cluster_CPU - 1)
    plus the router can never pin every slot while upstream shuffle tasks
    still need one."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    args: dict = {"concurrency": 1}
    if ncpu <= 2:
        args["num_cpus"] = 0.5
    return args


def _bucket_ids(df: pd.DataFrame, keys: list[str], fan: int) -> np.ndarray:
    if len(keys) == 1 and df[keys[0]].dtype.kind in "iu":
        k = df[keys[0]].to_numpy().astype(np.uint64, copy=False)
        h = k * np.uint64(0x9E3779B97F4A7C15)
    else:
        h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
    return ((h >> np.uint64(33)) % np.uint64(fan)).astype(np.int64)


def bucketed_agg(
    ds: rd.Dataset,
    keys: "str | list[str]",
    spec: dict,
    *,
    fan: int | None = None,
    num_partitions: int | None = None,
    types: "dict[str, pa.DataType] | None" = None,
    small_fold_rows: "int | None" = 100_000,
) -> rd.Dataset:
    """``groupby(keys).aggregate`` with bounded per-group Python work.

    ``spec`` maps output column -> ``(input_column, op)`` with op in
    {'sum','count','min','max'} (input column ignored for 'count').
    ``fan`` (coarse-bucket count) defaults to ``max(64, 4x shuffle_fan())``
    so final-fold parallelism keeps scaling with the cluster.
    ``types`` pins the output Arrow schema so empty blocks (an empty input
    block, a padding partition from ``map_groups``) can't poison downstream
    schema inference; without it empty blocks default every column to int64 —
    pass ``types`` whenever any key/output column is not int64.
    ``small_fold_rows``: when the map-side combine leaves at most this many
    rows, the hash shuffle is skipped and the fold runs in one coalesced
    partition (a ``limit(small_fold_rows+1)`` probe — bounded, never a full
    materialize of the partial stage).  Pass ``None`` to force the shuffle
    path.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    fan = int(fan) if fan is not None else max(64, 4 * shuffle_fan())

    def _agg_kwargs(stage: str) -> dict:
        table = _PARTIAL_OP if stage == "partial" else _FOLD_OP
        out = {}
        for name, (col, op) in spec.items():
            src = name if stage == "fold" else (keys[0] if op == "count" else col)
            out[name] = pd.NamedAgg(column=src, aggfunc=table[op])
        return out

    partial_kwargs = _agg_kwargs("partial")
    fold_kwargs = _agg_kwargs("fold")
    out_cols = keys + list(spec.keys())

    def _empty_arrow(with_bucket: bool = False) -> pa.Table:
        t = types or {}
        cols = out_cols + (["__b"] if with_bucket else [])
        return pa.table({c: pa.array([], t.get(c, pa.int64())) for c in cols})

    # partial emits ARROW blocks (the pandas groupby stays as the combine
    # kernel, but blocks between map_batches and the shuffle are Arrow —
    # no PandasBlockSchema mixing into downstream unions/shuffles)
    def partial(b: pd.DataFrame) -> pa.Table:
        if len(b) == 0:
            return _empty_arrow(with_bucket=True)
        g = b.groupby(keys, as_index=False, sort=False, dropna=False).agg(**partial_kwargs)
        g["__b"] = _bucket_ids(g, keys, fan)
        # metadata-free schema: a schema with b'pandas' metadata is unhashable
        # and defeats Ray's block-schema dedup on every downstream merge
        t = pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)
        if types is not None:
            t = t.cast(
                pa.schema(
                    [pa.field(c, types.get(c, t.schema.field(c).type)) for c in t.column_names]
                )
            )
        return t

    # fold emits ARROW blocks: downstream zero-copy ops (rename_columns /
    # select_columns -> Project) assume Arrow-convertible blocks, and pandas
    # blocks also round-trip object dtypes badly.
    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or keys[0] not in g.columns:
            return _empty_arrow()
        out = g.groupby(keys, as_index=False, sort=False, dropna=False).agg(**fold_kwargs)
        t = pa.Table.from_pandas(out[out_cols], preserve_index=False).replace_schema_metadata(
            None
        )
        if types is not None:
            t = t.cast(
                pa.schema(
                    [
                        pa.field(c, types.get(c, t.schema.field(c).type))
                        for c in out_cols
                    ]
                )
            )
        return t

    npart = num_partitions if num_partitions is not None else shuffle_fan()
    mp = ds.map_batches(partial, batch_format="pandas")
    if small_fold_rows:
        # Small-input short-circuit: the hash shuffle has a multi-second
        # session floor (aggregator-actor spin-up) that dominates when the
        # map-side combine already collapsed the input to a handful of rows
        # (tfidf's ds.stats audit: 3.8s shuffling 310 pre-aggregated rows).
        # The probe is BOUNDED at small_fold_rows+1 partial rows (same trick
        # as grouped_map below) — never the full partial stage: on a
        # near-unique key (sha256 digests) partials are O(corpus) and a full
        # materialize would pin the whole table in the object store.  When
        # the limit is NOT hit the probe IS the entire partial stage, so the
        # small path folds it with zero re-execution; above the cap only the
        # probe's early-stopped work is discarded and the partials stream
        # into the real shuffle.
        lim = mp.limit(int(small_fold_rows) + 1).materialize()
        if lim.count() <= small_fold_rows:
            return lim.repartition(1).map_batches(
                fold, batch_format="pandas", batch_size=None
            )
    return (
        mp.groupby("__b", num_partitions=npart)
        .map_groups(fold, batch_format="pandas")
    )


def grouped_map(
    ds: rd.Dataset,
    keys: "str | list[str]",
    fn,
    *,
    num_partitions: int | None = None,
    batch_format: str = "pandas",
    small_rows: "int | None" = 100_000,
) -> rd.Dataset:
    """``groupby(keys).map_groups(fn)`` with the bucketed_agg small-input
    short-circuit.

    The hash shuffle behind ``groupby`` has a multi-second session floor
    (aggregator-actor spin-up) that dominates whenever the grouped input is
    small — the common case for coarse-bucketed stages (64 LSH band buckets,
    per-query top-k folds) at test/bench scale.  When the input holds at most
    ``small_rows`` rows, run the whole group-map inside ONE coalesced
    ``map_batches`` task: sort the single block by ``keys`` and call ``fn``
    once per group slice — identical group membership, no shuffle.  Above the
    cap (the 100-TB path), fall through to the real distributed groupby.

    ``fn`` must not depend on intra-group row order (every call site here
    sorts internally) and must accept/return what ``batch_format`` implies
    (pandas DataFrame or pyarrow Table).  The size check materializes
    ``limit(small_rows+1)`` — BOUNDED at small_rows+1 rows, never the full
    input (the old full materialize pinned a 100-TB tagged input in the
    object store alongside the shuffle buffers).  When the input fits, the
    limited materialization IS the whole input and feeds the small path with
    no re-execution; above the cap only the probe's early-stopped partial
    work is discarded and the input streams into the real shuffle.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    npart = num_partitions if num_partitions is not None else shuffle_fan()

    if small_rows:
        lim = ds.limit(int(small_rows) + 1).materialize()
        n = lim.count()
        if 0 < n <= small_rows:
            ds = lim  # the limit was not hit: this is the full input
            if batch_format == "pandas":

                def apply_block(b: pd.DataFrame):
                    outs = [fn(g) for _, g in b.groupby(keys, sort=False, dropna=False)]
                    if isinstance(outs[0], pa.Table):
                        return pa.concat_tables(outs, promote_options="default")
                    return pd.concat(outs, ignore_index=True)

                return ds.repartition(1).map_batches(
                    apply_block, batch_format="pandas", batch_size=None
                )

            def apply_block_arrow(t: pa.Table) -> pa.Table:
                # group slicing stays in Arrow — a pandas hop would upcast
                # int64-with-nulls columns to float64
                t = t.sort_by([(c, "ascending") for c in keys])
                nrows = t.num_rows
                newg = np.zeros(nrows, dtype=bool)
                newg[0] = True
                for c in keys:
                    a = t[c].to_numpy(zero_copy_only=False)
                    diff = a[1:] != a[:-1]
                    if a.dtype.kind == "f":
                        # NaN != NaN is elementwise True, so adjacent
                        # NaN/null keys (nulls become NaN in the numpy
                        # conversion) would split into one group PER ROW —
                        # the pandas path's dropna=False makes them ONE
                        # group, and sort_by placed them adjacent
                        diff &= ~(np.isnan(a[1:]) & np.isnan(a[:-1]))
                    newg[1:] |= diff
                starts = np.flatnonzero(newg)
                ends = np.append(starts[1:], nrows)
                outs = [fn(t.slice(s, e - s)) for s, e in zip(starts, ends)]
                return pa.concat_tables(outs, promote_options="default")

            return ds.repartition(1).map_batches(
                apply_block_arrow, batch_format="pyarrow", batch_size=None
            )

    gb = ds.groupby(keys[0] if len(keys) == 1 else keys, num_partitions=npart)
    return gb.map_groups(fn, batch_format=batch_format)


def topk_per_group(
    ds: rd.Dataset,
    key: str,
    score: str,
    k: int,
    *,
    id_col: str,
    descending: bool = True,
    fan: int | None = None,
    num_partitions: int | None = None,
    types: "dict[str, pa.DataType] | None" = None,
    tree_fold: bool = False,
    salt_fan: int = 32,
) -> rd.Dataset:
    """Top-``k`` rows per key by ``score`` -> {key, id_col, score, rank}.

    Two-level: each block keeps at most k rows per key it sees (map-side
    prune — the shuffle ships at most k x (keys-per-block) rows, never the
    raw table), then the coarse-bucket fold re-ranks per key.  Ordering is
    engine-stable: (score desc|asc, id asc) with rank 1..k, so a SQL
    ``row_number() OVER (PARTITION BY key ORDER BY ...)`` oracle reproduces
    it exactly (callers quantize float scores).

    The final fold receives up to k x (blocks that saw the key) rows for one
    key — at 10^6-block scale a hot key becomes a single-task straggler.
    ``tree_fold=True`` inserts an intermediate fold keyed by (key,
    hash(id) % ``salt_fan``): each salt bucket pre-folds to k rows, so the
    final per-key fold sees at most ``salt_fan`` x k rows regardless of
    block count.  One extra shuffle of already-pruned partials; output
    identical (the prune is idempotent and order-stable).
    """
    k = int(k)

    def _prune(df: pd.DataFrame, with_rank: bool) -> pd.DataFrame:
        kv = df[key].to_numpy()
        sv = df[score].to_numpy()
        iv = df[id_col].to_numpy()
        order = np.lexsort((iv, -sv if descending else sv, kv))
        kk = kv[order]
        first = np.empty(len(kk), dtype=bool)
        if len(kk):
            first[0] = True
            first[1:] = kk[1:] != kk[:-1]
        seg = np.cumsum(first) - 1
        starts = np.flatnonzero(first)
        pos = np.arange(len(kk)) - starts[seg]  # rank-1 within key
        keep = pos < k
        out = pd.DataFrame(
            {key: kk[keep], id_col: iv[order][keep], score: sv[order][keep]}
        )
        if with_rank:
            out["rank"] = (pos[keep] + 1).astype(np.int64)
        return out

    fan = int(fan) if fan is not None else max(64, 4 * shuffle_fan())
    npart = num_partitions if num_partitions is not None else shuffle_fan()

    ty = {key: pa.int64(), id_col: pa.int64(), score: pa.float64(), "rank": pa.int64()}
    if types:
        ty.update(types)  # e.g. string keys, int64 scores (hash ranks must
        # not round-trip through float64 — above 2^53 that reorders ties)

    # partial emits ARROW blocks with the pinned schema (same rationale as
    # bucketed_agg: no pandas blocks between the map stage and the shuffle)
    def partial(b: pd.DataFrame) -> pa.Table:
        part_cols = [(key, ty[key]), (id_col, ty[id_col]), (score, ty[score]), ("__b", pa.int64())]
        if len(b) == 0:
            return pa.table({c: pa.array([], t) for c, t in part_cols})
        out = _prune(b, with_rank=False)
        out["__b"] = _bucket_ids(out, [key], fan)
        return pa.table({c: pa.array(out[c].to_numpy()).cast(t) for c, t in part_cols})

    def fold(g: pd.DataFrame) -> pa.Table:
        cols = [(c, ty[c]) for c in (key, id_col, score, "rank")]
        if len(g) == 0 or key not in g.columns:
            return pa.table({c: pa.array([], t) for c, t in cols})
        out = _prune(g, with_rank=True)
        return pa.table({c: pa.array(out[c].to_numpy()).cast(t) for c, t in cols})

    pruned = ds.map_batches(partial, batch_format="pandas")

    if tree_fold:
        part_cols = [(key, ty[key]), (id_col, ty[id_col]), (score, ty[score]), ("__b", pa.int64())]

        def salt(t: pa.Table) -> pa.Table:
            # Arrow-in (pruned partials are already schema-pinned Arrow) —
            # only appends the salt column, so no pandas block conversion.
            if t.num_rows == 0:
                return pa.table(
                    {c: pa.array([], ty_) for c, ty_ in part_cols + [("__s", pa.int64())]}
                )
            kv = t[key].to_numpy(zero_copy_only=False)
            iv = t[id_col].to_numpy(zero_copy_only=False)
            # salt = key_bucket * salt_fan + id_salt: one key's rows land in
            # EXACTLY salt_fan sub-buckets, so the final per-key fold sees
            # <= salt_fan*k rows (the documented bound).  Hashing key and id
            # jointly into salt_fan*fan buckets spread a hot key over up to
            # salt_fan*fan groups — a bound ~fan times weaker.
            if kv.dtype.kind in "iu" and iv.dtype.kind in "iu":
                hb = kv.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                kb = ((hb >> np.uint64(33)) % np.uint64(fan)).astype(np.int64)
                hi = iv.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
                si = ((hi >> np.uint64(33)) % np.uint64(salt_fan)).astype(np.int64)
            else:  # string/other keys: keep the generic pandas hash
                kb = _bucket_ids(pd.DataFrame({key: kv}), [key], fan)
                si = _bucket_ids(pd.DataFrame({id_col: iv}), [id_col], salt_fan)
            s = kb * int(salt_fan) + si
            return t.append_column("__s", pa.array(s))

        def mid_fold(g: pd.DataFrame) -> pa.Table:
            if len(g) == 0 or key not in g.columns:
                return pa.table({c: pa.array([], t) for c, t in part_cols})
            out = _prune(g, with_rank=False)
            out["__b"] = _bucket_ids(out, [key], fan)
            return pa.table({c: pa.array(out[c].to_numpy()).cast(t) for c, t in part_cols})

        pruned = (
            pruned.map_batches(salt, batch_format="pyarrow")
            .groupby("__s", num_partitions=npart)
            .map_groups(mid_fold, batch_format="pandas")
        )

    return (
        pruned
        .groupby("__b", num_partitions=npart)
        .map_groups(fold, batch_format="pandas")
    )
