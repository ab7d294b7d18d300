"""Relational demo pipelines over the TPC-H-ish testdata tables.

These exercise the engine's wide-operator surface (groupby aggregates with
map-side pre-aggregation, hash joins, sort/limit top-k, event-time windowing)
with exact DuckDB oracles.  Column names match the oracle SQL exactly (the
driver's compare sorts columns by name before hashing).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Mean, Sum

from ..stages.agg import bucketed_agg


def read_table(sf_dir: str, name: str, columns=None) -> rd.Dataset:
    from ..sources.readers import read_parquet_clean

    return read_parquet_clean(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def lineitem_pricing_summary(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1-shaped aggregate (no date filter; exercises multi-agg groupby)."""
    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def revenue(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("revenue", rev)

    return (
        li.map_batches(revenue, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("revenue", alias_name="sum_revenue"),
            Mean("l_discount", alias_name="avg_disc"),
            Count(alias_name="count_order"),
        )
    )


def top_customers(sf_dir: str, k: int = 10) -> rd.Dataset:
    """Join orders->customer, total spend per customer, top-k by spend."""
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    # per-customer cardinality scales with the data -> bucketed aggregate
    spend = bucketed_agg(
        orders,
        "o_custkey",
        {"total_spend": ("o_totalprice", "sum"), "n_orders": (None, "count")},
        types={"total_spend": pa.float64()},
    )
    joined = spend.join(cust, "inner", 8, on=("o_custkey",), right_on=("c_custkey",))
    # deterministic order: spend desc, custkey asc — ranked on the
    # 1e-3-QUANTIZED spend (the compare grid): ranking raw floats lets
    # summation-order drift vs the oracle flip which customer survives the
    # LIMIT when two totals are ulps apart (the oracle sorts the same
    # quantized integers)
    def keyed(t: pa.Table) -> pa.Table:
        s = t["total_spend"].to_numpy(zero_copy_only=False)
        su = np.floor(s * 1000 + 0.5).astype(np.int64)
        return t.append_column("neg_spend", pa.array(-su))

    top = (
        joined.map_batches(keyed, batch_format="pyarrow")
        .sort(["neg_spend", "o_custkey"])
        .limit(k)
        .select_columns(["o_custkey", "c_name", "total_spend", "n_orders"])
    )
    return top


def events_hourly(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-hour windows per event_type: count + sum(value).

    Window start emitted as epoch seconds (int64) — engine-stable timestamp
    representation for the oracle compare.
    """
    ev = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def win(b: pd.DataFrame) -> pd.DataFrame:
        # unit-safe epoch seconds (ts arrives as datetime64[us] from Arrow)
        w = b["ts"].dt.floor("h").astype("datetime64[s]").astype("int64")
        return pd.DataFrame({"event_type": b["event_type"], "window_start": w, "value": b["value"]})

    # (type x hour) cardinality scales with the time span -> bucketed aggregate
    return bucketed_agg(
        ev.map_batches(win, batch_format="pandas"),
        ["event_type", "window_start"],
        {"n_events": (None, "count"), "sum_value": ("value", "sum")},
        types={"event_type": pa.string(), "sum_value": pa.float64()},
    )


def supplier_nation_counts(sf_dir: str) -> rd.Dataset:
    """Two-hop dimension join: suppliers per region (broadcast-small joins)."""
    sup = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    nat = read_table(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    reg = read_table(sf_dir, "region", columns=["r_regionkey", "r_name"])
    j = sup.join(nat, "inner", 4, on=("s_nationkey",), right_on=("n_nationkey",))
    j = j.join(reg, "inner", 4, on=("n_regionkey",), right_on=("r_regionkey",))
    return j.groupby("r_name").aggregate(Count(alias_name="n_suppliers"))


def profile_numeric(ds: rd.Dataset, cols: "list[str]") -> rd.Dataset:
    """Per-column data-validation profile: {col, n, n_null, vmin, vmax, vsum}.

    One streaming pass: each block emits one partial row per column
    (vectorized nan-aware reductions), then a tiny fold combines partials —
    the shuffle carries #cols x #blocks rows, never data rows.  The standard
    pre-training sanity gate (row counts, null rates, value ranges) as a
    first-class operator.

    Known deviation from SQL: the float64 projection folds real NaN values
    into ``n_null`` (SQL's count() treats NaN as non-null) — after
    ``na_value=nan`` the two are indistinguishable."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for i, c in enumerate(cols):
            v = b[c].to_numpy(dtype=np.float64, na_value=np.nan)
            ok = ~np.isnan(v)
            rows.append(
                {
                    "cid": i,
                    "n": len(v),
                    "n_null": int((~ok).sum()),
                    "vmin": float(v[ok].min()) if ok.any() else np.inf,
                    "vmax": float(v[ok].max()) if ok.any() else -np.inf,
                    "vsum": float(v[ok].sum()),
                }
            )
        return pd.DataFrame(rows)

    agg = bucketed_agg(
        ds.select_columns(cols).map_batches(partial, batch_format="pandas"),
        "cid",
        {
            "n": ("n", "sum"),
            "n_null": ("n_null", "sum"),
            "vmin": ("vmin", "min"),
            "vmax": ("vmax", "max"),
            "vsum": ("vsum", "sum"),
        },
        types={"vmin": pa.float64(), "vmax": pa.float64(), "vsum": pa.float64()},
    )
    name_map = {i: c for i, c in enumerate(cols)}

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        # all-null columns fold to the ±inf identity sentinels — emit SQL's
        # NULL instead (min/max over zero non-null values).  Gated on the
        # null COUNT, not isfinite, so a column legitimately containing
        # ±inf values keeps them.
        allnull = b["n_null"] >= b["n"]
        return pd.DataFrame(
            {
                "col": b["cid"].map(name_map),
                "n": b["n"],
                "n_null": b["n_null"],
                "vmin": b["vmin"].where(~allnull, other=np.nan),
                "vmax": b["vmax"].where(~allnull, other=np.nan),
                "vsum": b["vsum"],
            }
        )

    return agg.map_batches(finish, batch_format="pandas")
