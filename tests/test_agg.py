"""bucketed_agg (stages/agg.py) — semantics equal pandas groupby-agg."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray.stages.agg import bucketed_agg


@pytest.fixture(scope="module")
def frame():
    rng = np.random.default_rng(7)
    n = 20_000
    return pd.DataFrame(
        {
            "k1": rng.integers(0, 6_000, n).astype(np.int64),
            "k2": rng.choice(list("abcd"), n),
            "v": rng.normal(size=n),
            "w": rng.integers(0, 100, n).astype(np.int64),
        }
    )


def test_single_int_key_all_ops(ray_session, frame):
    ds = rd.from_pandas(frame).repartition(8)
    got = (
        bucketed_agg(
            ds,
            "k1",
            {"s": ("v", "sum"), "n": (None, "count"), "mn": ("w", "min"), "mx": ("w", "max")},
            types={"s": pa.float64()},
        )
        .to_pandas()
        .sort_values("k1")
        .reset_index(drop=True)
    )
    exp = (
        frame.groupby("k1", as_index=False)
        .agg(s=("v", "sum"), n=("v", "size"), mn=("w", "min"), mx=("w", "max"))
        .sort_values("k1")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["k1"].to_numpy() == exp["k1"].to_numpy()).all()
    np.testing.assert_allclose(got["s"], exp["s"], atol=1e-9)
    for c in ("n", "mn", "mx"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all()


def test_multi_key_with_string(ray_session, frame):
    ds = rd.from_pandas(frame).repartition(8)
    got = (
        bucketed_agg(
            ds,
            ["k2", "k1"],
            {"s": ("v", "sum"), "n": (None, "count")},
            types={"k2": pa.string(), "s": pa.float64()},
        )
        .to_pandas()
        .sort_values(["k2", "k1"])
        .reset_index(drop=True)
    )
    exp = (
        frame.groupby(["k2", "k1"], as_index=False)
        .agg(s=("v", "sum"), n=("v", "size"))
        .sort_values(["k2", "k1"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert list(got["k2"]) == list(exp["k2"])
    np.testing.assert_allclose(got["s"], exp["s"], atol=1e-9)
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()


def test_empty_input(ray_session):
    eds = rd.from_pandas(
        pd.DataFrame({"k": pd.Series(dtype=np.int64), "v": pd.Series(dtype=float)})
    )
    out = bucketed_agg(eds, "k", {"s": ("v", "sum")}, types={"s": pa.float64()})
    assert out.count() == 0


def test_topk_per_group(ray_session, frame):
    from neo4j_graph_algorithms_ray.stages.agg import topk_per_group

    df = frame.rename(columns={"k1": "key", "v": "score", "w": "rid"}).copy()
    df["rid"] = np.arange(len(df), dtype=np.int64)  # unique ids
    got = (
        topk_per_group(rd.from_pandas(df).repartition(8), "key", "score", 3, id_col="rid")
        .to_pandas()
        .sort_values(["key", "rank"])
        .reset_index(drop=True)
    )
    exp = df.sort_values(["key", "score", "rid"], ascending=[True, False, True])
    exp = exp.groupby("key").head(3).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["rid"].to_numpy() == exp["rid"].to_numpy()).all()
    assert (got.groupby("key")["rank"].min() == 1).all()
    assert (got.groupby("key")["rank"].max() <= 3).all()


def test_resumable_write_skips_finished_partitions(ray_session, tmp_path):
    import glob
    import os

    from neo4j_graph_algorithms_ray.stages.sink import read_partitioned, resumable_write

    base = str(tmp_path / "out")
    df = pd.DataFrame({"b": np.arange(400) % 4, "v": np.arange(400)})
    ds = rd.from_pandas(df).repartition(4)
    assert sorted(resumable_write(ds, base, partition_col="b", partitions=[0, 1, 2, 3])) == [0, 1, 2, 3]
    files = set(glob.glob(base + "/**/*.parquet", recursive=True))
    # idempotent rerun: nothing written, no appended duplicates
    assert resumable_write(ds, base, partition_col="b", partitions=[0, 1, 2, 3]) == []
    assert files == set(glob.glob(base + "/**/*.parquet", recursive=True))
    # crashed partition (no marker) is cleaned and rewritten; others skipped
    os.remove(os.path.join(base, "b=2", "_DONE"))
    assert resumable_write(ds, base, partition_col="b", partitions=[0, 1, 2, 3]) == [2]
    back = read_partitioned(base).to_pandas()
    assert len(back) == 400
    assert back["v"].sum() == df["v"].sum()


def test_bucketed_agg_small_fold_short_circuit_parity(ray_session):
    """The small-input short-circuit (fold in one coalesced partition, no
    hash shuffle) returns exactly the shuffle path's rows — fold groups by
    the real keys, so bucket routing is an implementation detail
    (VERDICT r03 #5)."""
    import pandas as pd

    from neo4j_graph_algorithms_ray.stages.agg import bucketed_agg

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {"k": rng.integers(0, 50, 5000), "v": rng.normal(10, 2, 5000)}
    )
    spec = {"s": ("v", "sum"), "n": (None, "count"), "mx": ("v", "max")}
    ty = {"s": pa.float64(), "mx": pa.float64()}

    def run(small):
        out = bucketed_agg(
            rd.from_pandas(df), "k", spec, types=ty, small_fold_rows=small
        ).to_pandas().sort_values("k").reset_index(drop=True)
        return out

    fast, shuffle = run(100_000), run(None)
    assert fast["k"].tolist() == shuffle["k"].tolist() and len(fast) == 50
    np.testing.assert_allclose(fast["s"], shuffle["s"], rtol=1e-12)
    assert fast["n"].tolist() == shuffle["n"].tolist()
    np.testing.assert_allclose(fast["mx"], shuffle["mx"], rtol=0)


def test_grouped_map_small_path_parity_pandas(ray_session):
    """grouped_map's coalesced small path returns the shuffle path's rows
    exactly — same group membership, per-group fn, no hash shuffle."""
    import pandas as pd

    from neo4j_graph_algorithms_ray.stages.agg import grouped_map

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {"b": rng.integers(0, 16, 4000), "x": rng.integers(0, 1000, 4000)}
    )

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        # order-insensitive per-group kernel (sorts internally, like all sites)
        x = np.sort(g["x"].to_numpy())
        return pd.DataFrame(
            {"b": g["b"].iloc[:1], "lo": x[:1], "hi": x[-1:], "n": [len(x)]}
        )

    def run(small):
        return (
            grouped_map(rd.from_pandas(df), "b", fn, small_rows=small)
            .to_pandas()
            .sort_values("b")
            .reset_index(drop=True)
        )

    fast, shuffle = run(100_000), run(None)
    pd.testing.assert_frame_equal(fast, shuffle, check_dtype=False)
    assert len(fast) == df["b"].nunique()


def test_grouped_map_small_path_parity_arrow(ray_session):
    """Arrow-format variant: group slicing stays in Arrow (no pandas hop),
    int64 dtype preserved; parity with the distributed groupby."""
    import pandas as pd

    from neo4j_graph_algorithms_ray.stages.agg import grouped_map

    rng = np.random.default_rng(12)
    t = pa.table(
        {
            "b": pa.array(rng.integers(0, 8, 2000), pa.int64()),
            "x": pa.array(rng.integers(0, 2**62, 2000), pa.int64()),
        }
    )

    def fn(g: pa.Table) -> pa.Table:
        x = np.sort(g["x"].to_numpy(zero_copy_only=False))
        b = g["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "b": pa.array(b[:1], pa.int64()),
                "mx": pa.array(x[-1:], pa.int64()),
                "n": pa.array([len(x)], pa.int64()),
            }
        )

    def run(small):
        return (
            grouped_map(
                rd.from_arrow(t), "b", fn, batch_format="pyarrow", small_rows=small
            )
            .to_pandas()
            .sort_values("b")
            .reset_index(drop=True)
        )

    fast, shuffle = run(100_000), run(None)
    pd.testing.assert_frame_equal(fast, shuffle)
    assert fast["mx"].dtype == np.int64  # 2^62 values must not ride float64


def test_coshuffle_lookup_sparse_keys_and_types(ray_session):
    """The co-shuffle join attaches payloads exactly where Dataset.join
    crashes: 2 left rows fanned over 8 partitions (Ray's hash join raises
    ArrowInvalid when a partition receives zero left rows).  int64 payloads
    beyond 2^53 and string payloads survive in their own dtype."""
    import ray.data as rd

    from neo4j_graph_algorithms_ray.stages.joins import coshuffle_lookup

    big = rd.from_arrow(
        pa.table({"id": pa.array([5, 7, 99], pa.int64()), "w": pa.array([1.5, 2.5, 3.5])})
    )
    small = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([5, 7, 7], pa.int64()),
                "txt": pa.array(["five", "seven-A", "seven-B"], pa.string()),
            }
        )
    )
    inner = (
        coshuffle_lookup(big, small, "id", "k", "txt", "t", fan=8, how="inner")
        .to_pandas()
        .sort_values(["id", "t"])
        .reset_index(drop=True)
    )
    assert list(zip(inner["id"], inner["t"])) == [(5, "five"), (7, "seven-A"), (7, "seven-B")]
    assert (inner[inner["id"] == 7]["w"] == 2.5).all()  # multi-match expands the big row

    sm2 = rd.from_arrow(
        pa.table({"k": pa.array([5], pa.int64()), "v": pa.array([2**62 + 7], pa.int64())})
    )
    left = (
        coshuffle_lookup(big, sm2, "id", "k", "v", "v", fan=8, how="left", default=-1)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert left["v"].tolist() == [2**62 + 7, -1, -1]
    assert left["v"].dtype == np.int64


def test_lookup_join_fallback_matches_broadcast(ray_session):
    """lookup_join above the cap (forced with cap=0) must agree with the
    broadcast path — including default fills and sparse keys over a fan that
    leaves hash partitions empty."""
    import ray.data as rd

    from neo4j_graph_algorithms_ray.stages.joins import lookup_join

    big = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3, 42], pa.int64())}))
    small = pd.DataFrame({"k": [2, 42], "val": [20, 420]})

    def run(cap):
        return (
            lookup_join(big, small, "k", "val", default="key", num_partitions=8, cap=cap)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )

    bcast, shuf = run(10**9), run(0)
    pd.testing.assert_frame_equal(bcast, shuf)
    assert bcast["val"].tolist() == [1, 20, 3, 420]


def test_topk_tree_fold_matches_flat(ray_session):
    """tree_fold inserts a (key, salt) pre-fold so a hot key's final fold is
    bounded by salt_fan x k instead of blocks x k — output must be identical
    (the prune is idempotent and order-stable)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from neo4j_graph_algorithms_ray.stages.agg import topk_per_group

    rng = np.random.default_rng(17)
    n = 20000
    df = pd.DataFrame(
        {
            "user_id": np.concatenate(
                [rng.integers(0, 50, n // 2), np.zeros(n // 2, dtype=np.int64)]  # hot key 0
            ),
            "value": rng.normal(size=n).round(6),
            "event_id": np.arange(n, dtype=np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(16)
    cols = ["user_id", "rank"]
    a = (
        topk_per_group(ds, "user_id", "value", 5, id_col="event_id")
        .to_pandas().sort_values(cols).reset_index(drop=True)
    )
    b = (
        topk_per_group(ds, "user_id", "value", 5, id_col="event_id", tree_fold=True, salt_fan=8)
        .to_pandas().sort_values(cols).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns], check_like=True)
    assert (a[a["user_id"] == 0]["rank"].to_numpy() == np.arange(1, 6)).all()


def test_coshuffle_lookup_salted_matches_unsalted(ray_session):
    """salt_fan spreads a hot big-side key over sub-buckets (small side
    replicated per salt) — output must be identical for both join modes."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from neo4j_graph_algorithms_ray.stages.joins import coshuffle_lookup

    rng = np.random.default_rng(5)
    n = 30000
    big = pd.DataFrame(
        {
            "k": np.concatenate([rng.integers(0, 100, n // 3), np.full(2 * n // 3, 7, np.int64)]),
            "x": np.arange(n, dtype=np.int64),
        }
    )
    small = pd.DataFrame({"sk": np.arange(0, 90, dtype=np.int64), "val": np.arange(0, 90, dtype=np.int64) * 10})
    bds, sds = rd.from_pandas(big).repartition(8), rd.from_pandas(small)
    for how, default in (("inner", None), ("left", -1)):
        a = (
            coshuffle_lookup(bds, sds, "k", "sk", "val", "v", fan=8, how=how, default=default)
            .to_pandas().sort_values(["k", "x"]).reset_index(drop=True)
        )
        b = (
            coshuffle_lookup(bds, sds, "k", "sk", "val", "v", fan=8, how=how, default=default, salt_fan=4)
            .to_pandas().sort_values(["k", "x"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b[a.columns], check_like=True)
    assert (a.loc[a["k"] == 7, "v"] == 70).all()


def test_actor_pool_args_cramped_vs_normal(monkeypatch):
    """Pool sizing: <=2-CPU sessions get 0.5-CPU actors (two chained pools
    must not pin the whole cluster — the knn_ivf livelock), larger sessions
    keep whole-CPU actors capped at ncpu-1."""
    import ray as _ray

    from neo4j_graph_algorithms_ray.stages.agg import actor_pool_args

    monkeypatch.setattr(_ray, "cluster_resources", lambda: {"CPU": 2})
    a = actor_pool_args()
    assert a == {"concurrency": (1, 2), "num_cpus": 0.5}

    monkeypatch.setattr(_ray, "cluster_resources", lambda: {"CPU": 32})
    b = actor_pool_args()
    assert b == {"concurrency": (1, 8)} and "num_cpus" not in b

    monkeypatch.setattr(_ray, "cluster_resources", lambda: {"CPU": 4})
    c = actor_pool_args()
    assert c == {"concurrency": (1, 3)}
