"""Key lookup / join stages.

The reference has no relational joins — its "joins" are O(1) array lookups by
dense id (SURVEY.md §2.6: ``labels[targetNodeId]``, weight lookup by combined
long key).  Distributed, those become either

- **broadcast lookup** — the small side (vertex table, degree table, seed
  props) is ``ray.put`` ONCE on the driver and read by every actor from the
  local object store (never re-shipped per batch); lookups are vectorized
  ``pd.Index.get_indexer`` calls per batch, or
- **hash-partitioned join** — ``Dataset.join`` (Ray's hash shuffle join) when
  both sides are too large to broadcast.

``lookup_vids`` auto-selects: broadcast below ``BROADCAST_MAX_ROWS``
(one object holding the vertex table; at 5M rows ~ a few hundred MB), the
shuffle join above it.  Both paths drop edges with unresolved endpoints
(inner semantics — the reference only loads relationships between scanned
nodes, ``RelationshipImporter``).

CAUTION — ``Dataset.join`` (Ray 2.49) raises ``ArrowInvalid`` whenever a
hash partition receives zero LEFT rows (empty partitions carry no schema;
2 left rows at npart>=3 reproduces it).  It is therefore only safe when the
left side's keys are dense and plentiful relative to the fan (vid spaces in
[0, n) with n >> npart, >5M-row fallbacks).  For sparse or few-key attaches
use ``coshuffle_lookup`` below — same semantics, immune by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..sources.readers import from_pandas_clean as _from_pandas_clean

BROADCAST_MAX_ROWS = 5_000_000
# single-node O(V) mode ceiling shared by the algorithms that switch between
# an actor/broadcast implementation and a distributed dataset one (mst,
# triangles import this — one knob, not per-file copies)
BROADCAST_MAX_V = BROADCAST_MAX_ROWS


class _BroadcastVidMapper:
    """map_batches actor: resolve src_key/dst_key -> vids via a broadcast table."""

    def __init__(self, vmap_ref):
        vt = ray.get(vmap_ref)  # pandas DataFrame {key, vid}
        if "key" not in vt.columns:  # to_pandas() of an empty Dataset has no columns
            self.index = pd.Index([], dtype=object)
            self.vids = np.array([], dtype=np.int64)
        else:
            self.index = pd.Index(vt["key"])
            self.vids = vt["vid"].to_numpy()

    def __call__(self, batch: pa.Table) -> pa.Table:
        sk = batch["src_key"].to_pandas()
        dk = batch["dst_key"].to_pandas()
        si = self.index.get_indexer(sk)
        di = self.index.get_indexer(dk)
        ok = (si >= 0) & (di >= 0)
        return pa.table(
            {
                "src": pa.array(self.vids[si[ok]], pa.int64()),
                "dst": pa.array(self.vids[di[ok]], pa.int64()),
                "weight": batch["weight"].filter(pa.array(ok)),
            }
        )


def lookup_vids(
    edges_ds: rd.Dataset,
    vertices_ds: rd.Dataset,
    n_vertices: int,
    *,
    method: str = "auto",
    num_partitions: int = 64,
) -> rd.Dataset:
    """String edge table -> int edge table ``{src: i64, dst: i64, weight: f64}``."""
    if method == "auto":
        method = "broadcast" if n_vertices <= BROADCAST_MAX_ROWS else "join"
    if method == "broadcast":
        from .agg import actor_pool_args

        ref = ray.put(vertices_ds.to_pandas())
        return edges_ds.map_batches(
            _BroadcastVidMapper,
            fn_constructor_kwargs={"vmap_ref": ref},
            batch_format="pyarrow",
            batch_size=65536,
            **actor_pool_args(),
        )
    # shuffle-join path: two hash joins on the string key
    j = edges_ds.join(
        vertices_ds, "inner", num_partitions, on=("src_key",), right_on=("key",)
    ).rename_columns({"vid": "src"})
    j = j.join(
        vertices_ds, "inner", num_partitions, on=("dst_key",), right_on=("key",)
    ).rename_columns({"vid": "dst"})
    return j.select_columns(["src", "dst", "weight"])


def _int_lookup_batch(t: pa.Table, ref, key, value, default) -> pa.Table:
    """Append ``value`` looked up from the broadcast sorted int-key table;
    misses fill with the row's own key (``default='key'``) or a scalar.
    Task-pool stage: ``ray.get`` of the broadcast ref is a zero-copy local
    plasma read per task — no actor-pool spin-up for a cheap kernel."""
    df = ray.get(ref)
    keys = df[key].to_numpy() if key in df.columns else np.array([], dtype=np.int64)
    vals = df[value].to_numpy() if value in df.columns else np.array([], dtype=np.int64)
    # the output rides the VALUE column's dtype — a blanket int64 cast used
    # to floor-truncate float payloads (clustering coefficients came back
    # as 0/1).  Non-numeric payloads (strings) flow as object arrays, same
    # as the >cap coshuffle path — the two routes must not be a behavior
    # cliff at the row cap.
    numeric = vals.dtype.kind in "fiu"
    out_dtype = vals.dtype if numeric else np.dtype(object)
    k = t[key].to_numpy()
    if default == "key":
        fill = k.astype(out_dtype, copy=False) if numeric else k.astype(object)
    else:
        fill = np.full(len(k), default, dtype=out_dtype)
    if len(keys):
        pos = np.minimum(np.searchsorted(keys, k), len(keys) - 1)
        hit = keys[pos] == k
        out = np.where(hit, vals[pos], fill)
    else:
        out = fill
    cols = {c: t[c] for c in t.column_names if c != value}
    cols[value] = pa.array(out.astype(out_dtype, copy=False)) if numeric else pa.array(out)
    return pa.table(cols)


def lookup_join(
    big: rd.Dataset,
    small: rd.Dataset | pd.DataFrame,
    key: str,
    value: str,
    *,
    default: "str | int" = "key",
    num_partitions: int = 8,
    cap: int = BROADCAST_MAX_ROWS,
) -> rd.Dataset:
    """Left-join ``{small.key -> small.value}`` onto ``big`` (int64 keys).

    The small side is broadcast (``ray.put`` once, binary-searched per batch)
    when it fits under ``cap`` rows — the reference's O(1) array-lookup
    "join" (SURVEY §2.6) — otherwise this falls back to the hash-shuffle
    ``Dataset.join``.  ``default`` fills misses: ``'key'`` = the big row's
    own key value, else the scalar given."""
    if isinstance(small, pd.DataFrame):
        n = len(small)
        small_df = small
    else:
        small = small.materialize()
        n = small.count()
        small_df = None
    if n <= cap:
        if small_df is None:
            small_df = small.to_pandas()
        if len(small_df):
            small_df = small_df.sort_values(key)
        ref = ray.put(small_df)
        return big.map_batches(
            _int_lookup_batch,
            fn_kwargs={"ref": ref, "key": key, "value": value, "default": default},
            batch_format="pyarrow",
            batch_size=131072,
        )
    if small_df is not None:
        small = _from_pandas_clean(small_df)
    # co-shuffle, not Dataset.join: Ray's hash join crashes on partitions
    # that receive zero left rows (sparse/skewed key sets)
    return coshuffle_lookup(
        big, small, key, key, value, value, fan=num_partitions, how="left", default=default
    )


def small_group_agg(
    ds: rd.Dataset,
    key: str,
    value: str | None,
    op: str,
    out: str,
    *,
    cap: int = BROADCAST_MAX_ROWS,
) -> "pd.DataFrame | rd.Dataset":
    """Per-block partial groupby for small group counts.

    Combines ``op`` ∈ {'sum','max','min','count'} per key INSIDE each block
    (map-side pre-aggregation), then folds the partial tables on the driver —
    O(#groups) driver memory, hard-capped: if the accumulated partial rows
    exceed 4x``cap`` the fold aborts and the all-to-all
    ``groupby().aggregate`` path runs instead (returning a Dataset)."""
    import pyarrow.compute as pc

    vcol = value if value is not None else key

    def partial(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy()
        o = np.argsort(k, kind="stable")
        ks = k[o]
        uniq, seg = (
            np.unique(ks, return_index=True) if len(ks) else (ks, np.array([], dtype=np.int64))
        )
        if op == "count":
            v = np.diff(np.append(seg, len(ks))).astype(np.int64)
        else:
            vals = t[vcol].to_numpy()[o]
            red = {"sum": np.add, "max": np.maximum, "min": np.minimum}[op]
            v = red.reduceat(vals, seg) if len(seg) else vals[:0]
        return pa.table({key: pa.array(uniq), out: pa.array(v)})

    parts = []
    total = 0
    overflow = False
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pandas", batch_size=None
    ):
        parts.append(b)
        total += len(b)
        if total > 4 * cap:
            overflow = True
            break
    if not overflow:
        if not parts:
            return pd.DataFrame({key: pd.Series([], dtype="int64"), out: pd.Series([], dtype="int64")})
        allp = pd.concat(parts, ignore_index=True)
        fold = {"sum": "sum", "count": "sum", "max": "max", "min": "min"}[op]
        return allp.groupby(key, as_index=False).agg(**{out: (out, fold)}).sort_values(key).reset_index(drop=True)
    from .agg import bucketed_agg

    # overflow path: key cardinality too high for a driver fold — and far too
    # high for the native per-key-Python Aggregate; bucketed shuffle instead
    return bucketed_agg(ds, key, {out: (vcol if op != "count" else None, op)})


def _pa_type(t) -> pa.DataType:
    """Normalize a Ray schema type (Arrow DataType or numpy dtype from
    pandas-block schemas) to an Arrow DataType; object dtype means strings."""
    if isinstance(t, pa.DataType):
        return t
    dt = np.dtype(t)
    if dt == np.dtype(object):
        return pa.string()
    return pa.from_numpy_dtype(dt)


def coshuffle_lookup(
    big: rd.Dataset,
    small: rd.Dataset,
    key: str,
    small_key: str,
    value: str,
    out: str,
    *,
    fan: int,
    how: str = "inner",
    default=None,
    salt_fan: int = 1,
) -> rd.Dataset:
    """Attach ``small[value]`` to ``big`` rows by ``big[key] == small[small_key]``
    via a side-tagged co-shuffle — the crash-proof alternative to
    ``Dataset.join``.

    Ray 2.49's hash join raises ``ArrowInvalid`` whenever a partition
    receives zero left-side rows (empty partitions carry no schema), which
    sparse or skewed key sets hit routinely.  Here both sides are tagged
    into one coarse bucket space on the int64 key and flow through a single
    ``grouped_map``; the per-bucket kernel does a vectorized pandas merge
    carrying only right-side row POSITIONS (exact through the float64 upcast
    pandas applies on misses), then gathers the payload by position in its
    own dtype — so int64 and string payloads survive bit-exactly.  Empty
    buckets return a TYPED empty table.

    ``how='inner'`` drops misses; ``how='left'`` fills them with ``default``
    (``'key'`` = the row's own key value, lookup_vids semantics).  One
    shuffle total; small-input runs fold in one task via ``grouped_map``'s
    short-circuit.

    ``salt_fan > 1`` is the HOT-KEY armor: big-side rows of one key normally
    co-locate in one bucket task, so a key owning most of the big side is a
    single-task straggler.  Salting spreads each big row over
    ``salt_fan`` sub-buckets (round-robin — any assignment works, a big row
    matches the same small rows regardless) and replicates the small side
    into every salt, so per-task work is bounded at the cost of shipping the
    small side ``salt_fan`` times.  Output identical to ``salt_fan=1``.
    """
    from .agg import grouped_map

    bsch = big.schema()
    big_cols = list(bsch.names)
    big_types = [_pa_type(t) for t in bsch.types]
    if key not in big_cols:
        raise ValueError(f"coshuffle_lookup: key {key!r} not in big columns {big_cols}")
    reserved = {"__side", "__val", "__bucket"}
    clash = (set(big_cols) | {out}) & reserved
    if clash:
        raise ValueError(
            f"coshuffle_lookup: column names {sorted(clash)} are reserved for the "
            "internal co-shuffle transport; rename them before the lookup"
        )
    if out in big_cols:
        raise ValueError(f"coshuffle_lookup: out column {out!r} already exists in big")
    ssch = small.schema()
    vtype = _pa_type(dict(zip(ssch.names, ssch.types))[value])
    out_schema = pa.schema(list(zip(big_cols, big_types)) + [(out, vtype)])
    empty = pa.table({f.name: pa.array([], f.type) for f in out_schema})
    nb = 4 * int(fan)
    salt_fan = max(1, int(salt_fan))

    def _base(k: np.ndarray) -> np.ndarray:
        # golden-ratio multiply-shift mix (same as stages/agg._bucket_ids):
        # a raw `% nb` piles keys sharing a residue class (all-even ids,
        # strided packed keys) into a fraction of the buckets — a hot-bucket
        # single-task straggler the mix removes
        h = k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return ((h >> np.uint64(33)) % np.uint64(nb)).astype(np.int64)

    def tag_big(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {"__side": pa.array(np.zeros(n, dtype=np.int8))}
        for c, ty in zip(big_cols, big_types):
            cols[c] = t[c].cast(ty)
        cols["__val"] = pa.nulls(n, vtype)
        base = _base(t[key].cast(pa.int64()).to_numpy())
        if salt_fan > 1:
            base = base * salt_fan + np.arange(n, dtype=np.int64) % salt_fan
        cols["__bucket"] = pa.array(base)
        return pa.table(cols)

    def tag_small(t: pa.Table) -> pa.Table:
        n = t.num_rows
        k = t[small_key].cast(pa.int64()).to_numpy()
        cols = {"__side": pa.array(np.ones(n, dtype=np.int8))}
        for c, ty in zip(big_cols, big_types):
            cols[c] = pa.array(k) if c == key else pa.nulls(n, ty)
        cols["__val"] = t[value].cast(vtype)
        base = _base(k)
        one = pa.table({**cols, "__bucket": pa.array(base * salt_fan)})
        if salt_fan == 1:
            return one
        # replicate the small side into every salt sub-bucket
        bi = one.schema.get_field_index("__bucket")
        return pa.concat_tables(
            one.set_column(bi, "__bucket", pa.array(base * salt_fan + s))
            for s in range(salt_fan)
        )

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "__side" not in g.column_names:
            return empty
        side = g["__side"].to_numpy(zero_copy_only=False)
        L = g.filter(pa.array(side == 0))
        if L.num_rows == 0:
            return empty
        R = g.filter(pa.array(side == 1))
        # carry only right POSITIONS and left ROW indices through the merge:
        # positions are < 2^53, so the float64 upcast pandas applies on
        # left-misses is exact; payloads are gathered afterwards in their
        # own dtype.  A key matching multiple small rows expands its big row
        # (join semantics) — __lrow maps each output row to its source row.
        lt = pd.DataFrame(
            {
                "__k": L[key].cast(pa.int64()).to_numpy(),
                "__lrow": np.arange(L.num_rows, dtype=np.int64),
            }
        )
        rt = pd.DataFrame(
            {
                "__k": R[key].cast(pa.int64()).to_numpy(),
                "__pos": np.arange(R.num_rows, dtype=np.int64),
            }
        )
        m = lt.merge(rt, on="__k", how="left")
        pos = m["__pos"].to_numpy()
        lrow = m["__lrow"].to_numpy()
        miss = np.isnan(pos) if pos.dtype.kind == "f" else np.zeros(len(pos), dtype=bool)
        if how == "inner":
            keep = ~miss
            pos, lrow = pos[keep], lrow[keep]
            miss = np.zeros(len(pos), dtype=bool)
        pidx = np.where(miss, 0, pos).astype(np.int64)
        vals = R["__val"].to_numpy(zero_copy_only=False)
        cols = {}
        for c, ty in zip(big_cols, big_types):
            cols[c] = L[c].take(pa.array(lrow))
        if R.num_rows:
            picked = vals[pidx]
        else:
            picked = np.empty(len(pidx), dtype=object)
        if miss.any():
            if default == "key":
                fill = L[key].cast(pa.int64()).to_numpy()[lrow]
                picked = np.where(miss, fill, picked)
            else:
                picked = np.asarray(picked, dtype=object)
                picked[miss] = default
        cols[out] = pa.array(picked, vtype)
        return pa.table(cols)

    both = big.map_batches(tag_big, batch_format="pyarrow").union(
        small.map_batches(tag_small, batch_format="pyarrow")
    )
    return grouped_map(both, "__bucket", kernel, num_partitions=int(fan), batch_format="pyarrow")
