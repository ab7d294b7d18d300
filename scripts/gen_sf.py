#!/usr/bin/env python
"""Deterministic synthetic-table generator for larger scale factors.

The driver ships sf0.001/0.01/0.1 read-only under /root/testdata; the
10x bench tier (sf1) has to be synthesised.  This script reproduces the
driver tables' exact shapes (schemas, value distributions, dup rates —
profiled from sf0.1) at ``--mult`` times the sf0.1 row counts, from a fixed
seed, using numpy + pyarrow only (no Ray session — safe to run next to a
live measurement).

    python scripts/gen_sf.py --out /tmp/graft_sf1/sf1 [--mult 10]

Only the tables the bench reads are written (documents, embeddings,
events, orders) plus the tiny dimension tables; the link-graph corpus for
``graph_for_sf`` is generated on demand by ``sources/corpus.py`` from the
``sf1`` entry in ``_SF_PARAMS``.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260819

# the 31-word vocabulary shared by every lang in the driver corpus
VOCAB = (
    "key agg row scan slow fast table value part hash merge batch a the line "
    "sort window spark order data column join small customer query big group "
    "stream filter vector"
).split()
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    # split into >= 32 row groups: Ray's read_parquet parallelizes at row
    # group granularity, and a single-row-group file serializes every read
    # behind one decode task (measured ~2 s per pass on the sf1 documents
    # table — the dominant cost of an otherwise sub-second pipeline).
    # 1024-row floor keeps tiny tables from degenerating to 1-row groups.
    rgs = max(1024, table.num_rows // 32)
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"), row_group_size=rgs)
    print(name, table.num_rows)


def gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    lens = rng.integers(10, 101, size=n)
    texts = [" ".join(rng.choice(VOCAB, size=int(k))) for k in lens]
    # plant the sf0.1 exact-dup rate (~0.16% of rows are a second copy)
    n_dup = max(1, int(n * 0.0016))
    src = rng.choice(n - n_dup, size=n_dup, replace=False)
    for i, s in enumerate(src):
        texts[n - n_dup + i] = texts[int(s)]
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
            "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int, dim: int = 64) -> pa.Table:
    M = rng.standard_normal((n, dim)).astype(np.float32)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(M), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=n).astype(np.int32)),
        }
    )


def gen_events(rng: np.random.Generator, n: int, n_users: int) -> pa.Table:
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    span = 30 * 86400 * 1_000_000
    ts = np.sort(t0 + rng.integers(0, span, size=n))
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "user_id": pa.array(rng.integers(1, n_users + 1, size=n).astype(np.int64)),
            "event_type": pa.array(rng.choice(EVENT_TYPES, size=n), pa.string()),
            "value": pa.array(np.round(rng.gamma(1.0, 50.0, size=n), 2)),
            "props": pa.array(
                [json.dumps({"k": int(v)}) for v in rng.integers(0, 100, size=n)],
                pa.string(),
            ),
        }
    )


def gen_orders(rng: np.random.Generator, n: int, n_cust: int) -> pa.Table:
    t0 = np.datetime64("1995-01-01T00:00:00", "us").astype(np.int64)
    span = int((np.datetime64("2001-08-01T00:00:00", "us").astype(np.int64) - t0))
    date = t0 + rng.integers(0, span + 1, size=n)
    date -= date % 86_400_000_000  # day-aligned like the driver tables
    return pa.table(
        {
            "o_orderkey": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "o_custkey": pa.array(rng.integers(1, n_cust + 1, size=n).astype(np.int64)),
            "o_orderstatus": pa.array(rng.choice(["F", "O", "P"], size=n), pa.string()),
            "o_totalprice": pa.array(np.round(rng.uniform(900.0, 500000.0, size=n), 2)),
            "o_orderdate": pa.array(np.sort(date)).cast(pa.timestamp("us")),
            "o_orderpriority": pa.array(
                rng.choice([f"{i}-P" for i in range(1, 6)], size=n), pa.string()
            ),
        }
    )


def gen_customer(rng: np.random.Generator, n: int) -> pa.Table:
    return pa.table(
        {
            "c_custkey": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(1, n + 1)], pa.string()),
            "c_nationkey": pa.array(rng.integers(0, 25, size=n).astype(np.int32)),
            "c_acctbal": pa.array(np.round(rng.uniform(-999.99, 9999.99, size=n), 2)),
            "c_mktsegment": pa.array(
                rng.choice(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"], size=n),
                pa.string(),
            ),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="output dir (basename becomes the sf tier name)")
    ap.add_argument("--mult", type=int, default=10, help="multiple of the sf0.1 row counts")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    m = args.mult
    rng = np.random.default_rng(SEED)
    _write(args.out, "documents", gen_documents(rng, 5_000 * m))
    _write(args.out, "embeddings", gen_embeddings(rng, 2_000 * m))
    _write(args.out, "events", gen_events(rng, 100_000 * m, n_users=1_500 * m))
    _write(args.out, "orders", gen_orders(rng, 150_000 * m, n_cust=15_000 * m))
    _write(args.out, "customer", gen_customer(rng, 15_000 * m))
    print("done:", args.out)


if __name__ == "__main__":
    main()
