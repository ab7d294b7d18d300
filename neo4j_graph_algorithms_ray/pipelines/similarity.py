"""Similarity search over an embedding column (``list<float>``).

- ``knn_bruteforce`` — the exactness baseline: broadcast the (small) query
  matrix once (``ray.put``), per-batch float64 matmul against each block of
  the embedding table, per-batch partial top-k, final per-query top-k in a
  tiny ``groupby(query_id).map_groups``.  One pass over the table, no
  shuffle of the vectors themselves — only of k-sized candidate sets.
- ``knn_ivf`` — the scale path: coarse-quantize vectors to the nearest of C
  centroids (a bucket column), probe only the query's ``nprobe`` nearest
  buckets, exact re-rank inside.  Recall measured against brute force in
  tests; the quantizer is a deterministic, SQL-replayable k-means
  (``coarse_centroids``).

Output contract (shared with the DuckDB oracle): ``{query_id, vec_id, cos_u}``
where ``cos_u = floor(cosine * 1e6 + 0.5)`` (int64, round-half-up) and ordering/tie-break is
(cos_u DESC, vec_id ASC).  ``floor`` has identical semantics in NumPy and
DuckDB (unlike round-half modes), and the 1e-6 quantization absorbs
summation-order float noise, so top-k sets are engine-stable.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..stages.agg import actor_pool_args, grouped_map


def read_embeddings(sf_dir: str) -> rd.Dataset:
    from ..sources.readers import read_parquet_clean

    return read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"))


def _batch_matrix(b: pd.DataFrame, dim: int | None = None) -> np.ndarray:
    e = b["embedding"].to_numpy()
    if len(e) == 0:
        # np.stack raises on empty input; empty blocks occur (empty parquet
        # files, filters that drain a block) — return a typed (0, dim) matrix
        return np.empty((0, int(dim or 0)), dtype=np.float64)
    return np.stack(e).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-30)


def _filter_below(ds: rd.Dataset, cap: int) -> rd.Dataset:
    """vec_id < cap, filtered in Arrow (object-dtype pandas embedding columns
    confuse Ray's block size estimation and force copies)."""
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], pa.scalar(cap))), batch_format="pyarrow"
    )


def load_queries(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic query set: the first ``n_queries`` vectors by vec_id."""
    q = _filter_below(read_embeddings(sf_dir), n_queries).to_pandas().sort_values("vec_id")
    return q["vec_id"].to_numpy(), _normalize(_batch_matrix(q))


def coarse_centroids(
    emb: rd.Dataset, *, n_centroids: int = 16, iters: int = 2, sample: int = 4096
) -> np.ndarray:
    """Deterministic spherical-assignment k-means quantizer, SQL-replayable.

    Training contract (mirrored term-for-term by ``oracles._centroid_cte``):

    - seeds = the raw embeddings of ``vec_id < n_centroids`` (parquet floats,
      bit-identical on both sides),
    - per iteration: assign the training sample (``vec_id < sample`` — a
      deterministic sample, never the whole corpus) to the argmax of the
      1e-6-quantized cosine (ties -> lowest centroid id), then set each
      centroid to the per-dim mean of its members' 1e-6-quantized raw
      coordinates, itself re-quantized at 1e-9 — every accumulation is an
      exact integer sum, so engine and DuckDB produce the same centroid
      floats without any summation-order hazard; empty clusters keep their
      previous centroid,
    - cosine against unnormalized centroids is well-defined (scale
      invariance); quantized-grid comparisons absorb the cross-engine ulp
      noise exactly like the scoring stages (module docstring).
    """
    samp = _filter_below(emb, sample).to_pandas()
    if len(samp) < int(n_centroids):
        # arbitrary / offset vec_ids leave the [0, sample) window underfull:
        # shift it to start at the corpus' min id.  Dense-id corpora (min = 0,
        # the oracle-replayed case) never take this branch, so the SQL mirror
        # stays term-for-term.
        lo = emb.min("vec_id")
        if lo is None:
            raise ValueError("coarse_centroids: empty embedding table")
        samp = _filter_below(emb, int(lo) + int(sample)).to_pandas()
        if len(samp) < int(n_centroids):
            # ids sparser than the shifted window too (stride > sample):
            # take the first ``sample`` rows positionally — deterministic
            # for a parquet read, and any deterministic sample trains a
            # valid quantizer.  Without this, a near-empty sample would
            # silently train ~1 centroid and collapse every vector into one
            # bucket — the corpus-wide O(n^2) blow-up IVF exists to prevent.
            samp = emb.limit(int(sample)).to_pandas()
    samp = samp.sort_values("vec_id")
    E = _batch_matrix(samp)  # raw (S, d)
    En = _normalize(E)
    Eq = np.floor(E * 1e6 + 0.5)  # int-valued float64 micro-coords (exact)
    C = E[: int(n_centroids)].copy()
    for _ in range(int(iters)):
        Cn = _normalize(C)
        sim_u = np.floor((En @ Cn.T) * 1e6 + 0.5).astype(np.int64)
        assign = np.argmax(sim_u, axis=1)  # first max == lowest cid on ties
        newC = C.copy()
        for c in range(int(n_centroids)):
            m = assign == c
            if m.any():
                mean = Eq[m].sum(axis=0) / (int(m.sum()) * 1e6)
                newC[c] = np.floor(mean * 1e9 + 0.5) / 1e9
        C = newC
    return C


class _ScoreStage:
    """Partial top-k of one embedding block against the broadcast queries."""

    def __init__(self, qref, k: int):
        self.qids, self.Q = ray.get(qref)  # (nq,), (nq, d) normalized
        self.k = k

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:  # empty block: typed empty partial (np.stack raises)
            return pd.DataFrame(
                {c: pd.Series(dtype=np.int64) for c in ("query_id", "vec_id", "cos_u")}
            )
        M = _normalize(_batch_matrix(b))  # (n, d)
        cos_u = np.floor((M @ self.Q.T) * 1e6 + 0.5).astype(np.int64)  # (n, nq)
        vids = b["vec_id"].to_numpy()
        n, nq = cos_u.shape
        k = min(self.k, n)
        # one vectorized argpartition over the whole (n, nq) matrix instead
        # of a per-query lexsort loop.  The composite key makes (cos_u desc,
        # vid asc) a TOTAL order so rank-k boundary ties pick the same rows
        # the final fold's sort would: cos_u is micro-quantized (|cos_u| <=
        # 1e6) so cos_u * n never overflows int64 at any batch size.
        vid_rank = np.empty(n, dtype=np.int64)
        vid_rank[np.argsort(vids, kind="stable")] = np.arange(n)
        comp = cos_u * np.int64(n) - vid_rank[:, None]
        if k < n:
            idx = np.argpartition(-comp, k - 1, axis=0)[:k]  # (k, nq), unordered
        else:
            idx = np.broadcast_to(np.arange(n)[:, None], (n, nq))
        order = np.argsort(-np.take_along_axis(comp, idx, axis=0), axis=0, kind="stable")
        idx = np.take_along_axis(idx, order, axis=0)  # (k, nq) ranked per query
        return pd.DataFrame(
            {
                "query_id": np.repeat(np.asarray(self.qids), k),
                "vec_id": vids[idx].ravel(order="F"),
                "cos_u": np.take_along_axis(cos_u, idx, axis=0).ravel(order="F"),
            }
        )


def _final_topk(k: int):
    def top(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["cos_u", "vec_id"], ascending=[False, True]).head(k)

    return top


def knn_bruteforce(emb: rd.Dataset, qids: np.ndarray, Q: np.ndarray, *, k: int = 10) -> rd.Dataset:
    qref = ray.put((qids, Q))
    cand = emb.map_batches(
        _ScoreStage,
        fn_constructor_kwargs={"qref": qref, "k": k},
        batch_format="pandas",
        batch_size=4096,
        **actor_pool_args(),
    )
    return grouped_map(cand, "query_id", _final_topk(k))


def embedding_near_dup_pairs(
    emb: rd.Dataset,
    *,
    threshold: float = 0.9,
    n_centroids: int = 16,
    nprobe: int = 2,
    train_iters: int = 2,
) -> rd.Dataset:
    """Embedding-cosine near-duplicate pairs {id_a, id_b, cos_u}.

    Scale shape: each vector is assigned to its ``nprobe`` nearest coarse
    centroids (deterministic k-means ``coarse_centroids``, quantized-cosine
    ranking — the knn_ivf quantizer), candidate pairs are generated **within buckets
    only** (all-pairs per bucket via one matmul — no corpus-wide O(n^2)),
    then exact-cosine verified against the threshold.  Multi-probe
    assignment catches near-dups straddling a centroid boundary; like any
    LSH-family blocker, recall < 1 by design (measured in tests).
    Duplicate pairs from shared buckets are deduped.  SQL-checkable:
    oracles.embedding_near_dups_sql replays the same bucketing in DuckDB.
    """
    C = _normalize(coarse_centroids(emb, n_centroids=n_centroids, iters=train_iters))
    cref = ray.put(C)

    class Assign:
        def __init__(self):
            self.C = ray.get(cref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:  # np.stack raises on empty blocks
                return t.select(["vec_id", "embedding"]).append_column(
                    "bucket", pa.array([], pa.int64())
                )
            M = _normalize(np.stack(t["embedding"].to_pandas().to_numpy()))
            sim_u = np.floor((M @ self.C.T) * 1e6 + 0.5).astype(np.int64)  # (n, C)
            # per row: sim desc, cid asc on ties (stable argsort of -sim)
            order = np.argsort(-sim_u, axis=1, kind="stable")
            n = len(M)
            idx = np.tile(np.arange(n, dtype=np.int64), nprobe)
            buckets = order[:, :nprobe].T.reshape(-1).astype(np.int64)
            # Arrow take keeps the list-typed embedding column (no object-
            # dtype round trip through pandas)
            out = t.select(["vec_id", "embedding"]).take(pa.array(idx))
            return out.append_column("bucket", pa.array(buckets))

    rows = emb.map_batches(Assign, batch_format="pyarrow", **actor_pool_args())
    thr = threshold

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("vec_id").sort_values("vec_id")
        if len(g) < 2:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype=np.int64),
                    "id_b": pd.Series(dtype=np.int64),
                    "cos_u": pd.Series(dtype=np.int64),
                }
            )
        M = _normalize(_batch_matrix(g))
        cos_u = np.floor((M @ M.T) * 1e6 + 0.5).astype(np.int64)
        ids = g["vec_id"].to_numpy()
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = cos_u[ii, jj] >= int(np.floor(thr * 1e6 + 0.5))
        return pd.DataFrame(
            {"id_a": ids[ii][keep], "id_b": ids[jj][keep], "cos_u": cos_u[ii, jj][keep]}
        )

    pairs = grouped_map(rows, "bucket", bucket_pairs).materialize()
    # dedup pairs found in multiple shared buckets (packed single-int key;
    # pair cardinality scales with the corpus -> bucketed aggregate).
    # Ids that don't fit 31 bits take the two-key aggregate — packing would
    # silently collide (same contract as minhash_dedup_pairs)
    from ray.data.aggregate import Max, Min

    from ..stages.agg import bucketed_agg

    # one pass over the materialized pairs for the id range (was five
    # back-to-back driver actions: count + 4 extrema scans)
    ext = pairs.aggregate(Min("id_a"), Max("id_a"), Min("id_b"), Max("id_b"))
    if ext and ext["max(id_a)"] is not None and (
        max(ext["max(id_a)"], ext["max(id_b)"]) >= 2**31
        or min(ext["min(id_a)"], ext["min(id_b)"]) < 0
    ):
        return bucketed_agg(pairs, ["id_a", "id_b"], {"cos_u": ("cos_u", "min")})
    return bucketed_agg(
        pairs.map_batches(
            lambda b: pd.DataFrame(
                {
                    "pk": (b["id_a"].to_numpy().astype(np.int64) << 32)
                    | b["id_b"].to_numpy(),
                    "cos_u": b["cos_u"].to_numpy(),
                }
            ),
            batch_format="pandas",
        ),
        "pk",
        {"cos_u": ("cos_u", "min")},
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "id_a": b["pk"].to_numpy() >> 32,
                "id_b": b["pk"].to_numpy() & 0xFFFFFFFF,
                "cos_u": b["cos_u"].to_numpy(),
            }
        ),
        batch_format="pandas",
    )


def knn_ivf(
    emb: rd.Dataset,
    qids: np.ndarray,
    Q: np.ndarray,
    *,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    train_iters: int = 2,
) -> rd.Dataset:
    """IVF-flat: k-means coarse quantizer (``coarse_centroids``), bucket by
    nearest centroid, probe nprobe buckets, exact re-rank.

    Every ordering decision (bucket argmax, probe selection, partial and
    final top-k) happens on the 1e-6-quantized cosine grid with vec-id/
    centroid-id ascending tie-breaks, so the DuckDB oracle (oracles.py
    ``knn_ivf_sql``) reproduces the result exactly.
    """
    C = _normalize(coarse_centroids(emb, n_centroids=n_centroids, iters=train_iters))
    cref = ray.put(C)
    qref = ray.put((qids, Q))

    def _probe_sets(qids_, Q_, C_):
        """nprobe nearest centroids per query on the quantized grid."""
        qsim_u = np.floor((Q_ @ C_.T) * 1e6 + 0.5).astype(np.int64)  # (nq, C)
        cids = np.arange(C_.shape[0])
        out = {}
        for i, q in enumerate(qids_):
            order = np.lexsort((cids, -qsim_u[i]))[:nprobe]  # sim desc, cid asc
            out[int(q)] = set(int(c) for c in order)
        return out

    class Assign:
        def __init__(self):
            self.C = ray.get(cref)
            self.qids, self.Q = ray.get(qref)
            probed = _probe_sets(self.qids, self.Q, self.C)
            self.probe_buckets = np.array(sorted({c for s in probed.values() for c in s}))

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:  # np.stack raises on empty blocks
                return t.append_column("bucket", pa.array([], pa.int64()))
            M = _normalize(np.stack(t["embedding"].to_pandas().to_numpy()))
            sim_u = np.floor((M @ self.C.T) * 1e6 + 0.5).astype(np.int64)
            bucket = np.argmax(sim_u, axis=1)  # first max = lowest cid on ties
            keep = np.isin(bucket, self.probe_buckets)
            return t.filter(pa.array(keep)).append_column(
                "bucket", pa.array(bucket[keep].astype(np.int64))
            )

    filtered = emb.map_batches(Assign, batch_format="pyarrow", **actor_pool_args())

    class Score:
        def __init__(self):
            self.qids, self.Q = ray.get(qref)
            self.C = ray.get(cref)
            self.qprobe = _probe_sets(self.qids, self.Q, self.C)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return pd.DataFrame(
                    {c: pd.Series(dtype=np.int64) for c in ("query_id", "vec_id", "cos_u")}
                )
            M = _normalize(_batch_matrix(b))
            cos_u = np.floor((M @ self.Q.T) * 1e6 + 0.5).astype(np.int64)
            outs = []
            bucket = b["bucket"].to_numpy()
            vec_ids = b["vec_id"].to_numpy()
            for qi, q in enumerate(self.qids):
                mask = np.isin(bucket, list(self.qprobe[int(q)]))
                if not mask.any():
                    continue
                c = cos_u[mask, qi]
                v = vec_ids[mask]
                kk = min(k, len(c))
                top = np.lexsort((v, -c))[:kk]  # cos_u desc, vec_id asc
                outs.append(
                    pd.DataFrame({"query_id": int(q), "vec_id": v[top], "cos_u": c[top]})
                )
            if not outs:
                return pd.DataFrame(
                    {
                        "query_id": pd.Series(dtype=np.int64),
                        "vec_id": pd.Series(dtype=np.int64),
                        "cos_u": pd.Series(dtype=np.int64),
                    }
                )
            return pd.concat(outs, ignore_index=True)

    cand = filtered.map_batches(Score, batch_format="pandas", batch_size=4096, **actor_pool_args())
    return grouped_map(cand, "query_id", _final_topk(k))
