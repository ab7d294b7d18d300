"""Training-data document pipelines: dedup (exact / MinHash-LSH / SimHash),
text analysis (language id, quality scoring, token counting, fingerprinting).

All operate on the ``documents`` table ``(doc_id, text, lang, source,
n_chars)``.  Pipelines whose outputs back ``oracle_sql()`` entries use only
SQL-replicable kernels (functions/text.py); sketch-based near-dup paths are
rows-only checked (non-SQL-expressible) and verified in pytest with planted
near-duplicates.

Scale shape: every per-doc kernel is a ``map_batches`` stage (stateful actor
pools where a hasher/regex bank is constructed once); candidate generation
for near-dup is the standard shingle -> MinHash -> band -> ``groupby(band,
hash)`` explode, so the only wide ops are groupbys on short keys.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions import text as T

import pyarrow.compute as pc


def _tag_bucket64(col: str):
    """Arrow-native coarse-bucket tag: ``bucket = low-6-bits(col)`` — equal to
    the hash column's uint64 view mod 64 (two's-complement low bits), which is
    what the shuffle keys on.  A zero-copy column append; replaces the former
    per-batch Arrow->pandas->Arrow round trip on the busiest tag stages."""

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", pc.bit_wise_and(t[col], 63))

    return tag


def _rename_cols(mapping: dict):
    """Arrow-native column rename stage (zero-copy; pandas rename was a full
    block conversion per batch)."""

    def stage(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(n, n) for n in t.column_names])

    return stage


from ..sources.readers import from_pandas_clean, read_parquet_clean


def read_documents(sf_dir: str, columns=None) -> rd.Dataset:
    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


from ..stages.agg import bucketed_agg, grouped_map, shuffle_fan as _shuffle_fan


def exact_dedup(docs: rd.Dataset) -> rd.Dataset:
    """{h: sha256(text), doc_id: min doc_id, n: group size} per distinct text.

    hash-partitioned first-wins dedup: vectorized content hash inside
    map_batches, then one bucketed digest aggregate (stages/agg.py — digest
    cardinality ~ #docs, far beyond the native Aggregate's per-key budget).
    """

    def add_hash(t: pa.Table) -> pa.Table:
        return pa.table({"h": pa.array(T.hash_strings_hex(t["text"], "sha256")), "doc_id": t["doc_id"]})

    return bucketed_agg(
        docs.select_columns(["doc_id", "text"]).map_batches(add_hash, batch_format="pyarrow"),
        "h",
        {"doc_id": ("doc_id", "min"), "n": (None, "count")},
        types={"h": pa.string()},
    )


# one-pass digest-gather cap (exact_rep_map fast path and ngram's fused
# route decision): below this many docs the per-doc digest rows (~80 B/doc)
# fit one driver gather; above it the aggregate shapes are the scale route
DIGEST_GATHER_MAX_DOCS = 1_000_000


def _gram_upper_bound(texts, k: int) -> np.ndarray:
    """Tokenize-only UPPER bound on distinct word-``k``-grams per doc
    (shingles = ntok - k + 1; short non-empty docs shingle to 1; null/empty
    to 0).  ONE definition shared by the fused decision pass and the route
    gate's fallback scan — it must stay consistent with
    ``batch_shingle_hashes``'s count semantics, so don't inline copies."""
    cnt = (
        texts.str.count(T.WS_TOKEN_RE.pattern).fillna(0).astype(np.int64)
    ).to_numpy()
    return np.where(cnt >= k, cnt - k + 1, (cnt > 0).astype(np.int64))


def _sha256_rows_fn(did_col: str, ub_k: int | None = None):
    """Batch fn: per-doc sha256 hex digest (exact_dedup's identity; null
    text -> "" so the null group folds like SQL GROUP BY) and, when ``ub_k``
    is set, the tokenize-only word-``ub_k``-gram upper bound."""

    def fn(t: pa.Table) -> pa.Table:
        hx = T.hash_strings_hex(t["text"], "sha256")
        cols = {
            did_col: t[did_col],
            "h": pa.array([h if h is not None else "" for h in hx], pa.string()),
        }
        if ub_k is not None:
            cols["ub"] = pa.array(_gram_upper_bound(t["text"].to_pandas(), ub_k))
        return pa.table(cols)

    return fn


def _digest_dup_fold(hs: np.ndarray, dids: np.ndarray):
    """Fold gathered digests into exact-dup groups (shared by
    ``exact_rep_map``'s fast path and ngram's fused decision so their
    grouping can never drift apart).

    Returns ``(order, dids_sorted, firsts, runlen, gid, rep_per)``: the
    digest sort order, doc ids in that order, each group's first row index,
    group sizes, per-row group index, and each group's min doc id."""
    o = np.argsort(hs, kind="stable")
    hs_s, dids_s = hs[o], dids[o]
    firsts = np.flatnonzero(np.r_[True, hs_s[1:] != hs_s[:-1]])
    runlen = np.diff(np.append(firsts, len(hs_s)))
    gid = np.repeat(np.arange(len(firsts), dtype=np.int64), runlen)
    rep_per = np.minimum.reduceat(dids_s, firsts)
    return o, dids_s, firsts, runlen, gid, rep_per


def _dup_map_table(dids_s, runlen, gid, rep_per) -> pa.Table:
    """{doc_id, rep, m} member rows for duplicated (m >= 2) groups only."""
    memb = runlen[gid] >= 2
    return pa.table(
        {
            "doc_id": pa.array(dids_s[memb].astype(np.int64, copy=False)),
            "rep": pa.array(rep_per[gid][memb].astype(np.int64, copy=False)),
            "m": pa.array(runlen[gid][memb].astype(np.int64)),
        }
    )


def exact_rep_map(
    docs: rd.Dataset,
    *,
    compact: bool = True,
    cap: int | None = None,
    dedup: rd.Dataset | None = None,
    n_docs: int | None = None,
) -> rd.Dataset:
    """Exact-duplicate group map ``{doc_id, rep, m}`` — DUPLICATED groups only
    (``m >= 2``, one row per member, ``rep`` = the group's min doc_id).  A doc
    absent from the table is a singleton.  The output — and any broadcast or
    materialization of it — scales with the corpus' *duplication*, not its
    size: a mostly-unique 100-TB corpus folds to almost nothing.

    Two passes, neither shuffles per-doc rows:

    1. ``exact_dedup`` — the map-side-combined digest aggregate (only
       per-block digest partials reach the shuffle) — filtered to groups
       with ``n >= 2``,
    2. membership: a second streaming sha256 pass over the docs that keeps
       rows whose digest is in the (usually tiny) duplicated set — broadcast
       + sorted-array searchsorted under ``cap`` digests, a digest-bucketed
       co-shuffle merge above it (full-digest equality either way — the
       same sha256-identity contract as ``exact_dedup``).

    Shared by ``dedup_clusters`` and ``ngram_jaccard_pairs`` — collapsing
    exact duplicates before any pair-generating index is the armor that
    keeps duplication-heavy corpora (the 100-TB norm) out of quadratic work.

    ``dedup``: a caller-precomputed, MATERIALIZED pass-1 aggregate (already
    filtered to ``n >= 2``) — skips recomputing it here.

    Fast path: when neither ``dedup`` nor ``cap`` is pinned and the corpus
    is under ``DIGEST_GATHER_MAX_DOCS``, ONE streaming digest pass + one
    ~80 B/doc driver gather resolves the groups in-process (same sha256
    identity, nulls fold to one group exactly like the aggregate path) —
    both scans collapse to one.  Above the cap the two-pass shape is the
    scale route.  ``n_docs``: pass the known row count to skip the route
    probe's ``docs.count()`` (which executes a lazy upstream pipeline).
    """
    import ray

    from ..stages.joins import BROADCAST_MAX_ROWS

    if not compact:
        raise ValueError("exact_rep_map: only the compact (dup-only) form is supported")

    if dedup is None and cap is None:
        if n_docs is None:
            # NOTE: on a lazy derived Dataset this executes the upstream
            # pipeline once just for the route choice — callers that
            # already know the count should pass ``n_docs``
            n_docs = docs.count()
        if n_docs <= DIGEST_GATHER_MAX_DOCS:
            dec = (
                docs.select_columns(["doc_id", "text"])
                .map_batches(_sha256_rows_fn("doc_id"), batch_format="pyarrow")
                .to_pandas()
            )
            if not len(dec) or "h" not in dec.columns:
                return rd.from_arrow(_dup_map_table(*(np.zeros(0, np.int64),) * 4))
            hs = np.asarray(dec["h"], dtype="S64")
            dvals = dec["doc_id"].to_numpy(np.int64)
            _, dids_s, firsts, runlen, gid, rep_per = _digest_dup_fold(hs, dvals)
            return rd.from_arrow(_dup_map_table(dids_s, runlen, gid, rep_per))

    cap = BROADCAST_MAX_ROWS if cap is None else int(cap)

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "rep": pa.array([], pa.int64()),
            "m": pa.array([], pa.int64()),
        }
    )
    dupd = dedup if dedup is not None else exact_dedup(docs).filter(expr="n >= 2").materialize()
    nd = dupd.count()
    if nd == 0:
        return rd.from_arrow(empty)

    if nd <= cap:
        dd = dupd.to_pandas()
        # hex digests as ASCII bytes ("S64", 64 B each) not unicode ("U64",
        # 256 B each): at the 5M-row cap that is a 320 MB broadcast, not 1.3 GB
        if len(dd) and "h" in dd.columns:
            hs = np.asarray(dd["h"], dtype="S64")
            order = np.argsort(hs)
            hs = hs[order]
            reps = dd["doc_id"].to_numpy(dtype=np.int64)[order]
            ms = dd["n"].to_numpy(dtype=np.int64)[order]
        else:
            hs = np.array([], dtype="S64")
            reps = ms = np.array([], dtype=np.int64)
        ref = ray.put((hs, reps, ms))

        def member_rows(t: pa.Table) -> pa.Table:
            hs_, reps_, ms_ = ray.get(ref)
            if len(hs_) == 0 or t.num_rows == 0:
                return empty
            h = np.asarray(T.hash_strings_hex(t["text"], "sha256"), dtype="S64")
            pos = np.minimum(np.searchsorted(hs_, h), len(hs_) - 1)
            hit = hs_[pos] == h
            return pa.table(
                {
                    "doc_id": t["doc_id"].filter(pa.array(hit)).cast(pa.int64()),
                    "rep": pa.array(reps_[pos[hit]]),
                    "m": pa.array(ms_[pos[hit]]),
                }
            )

        return docs.select_columns(["doc_id", "text"]).map_batches(
            member_rows, batch_format="pyarrow"
        )

    # huge duplicated set: co-shuffle doc-hash rows with the dup digests on a
    # digest-prefix bucket and merge on the FULL digest string (exact)
    nb = 4 * _shuffle_fan()

    def digest_bucket(h: np.ndarray) -> np.ndarray:
        # first 8 ASCII hex chars viewed as raw uint64 bytes — vectorized,
        # well-spread for sha256 hex, and identical on both tag sides
        b = np.ascontiguousarray(np.asarray(h, dtype="S8"))
        if len(b) == 0:
            return np.array([], dtype=np.int64)
        u = np.frombuffer(b.tobytes(), dtype=np.uint64)
        return (u % np.uint64(nb)).astype(np.int64)

    def tag_docs(t: pa.Table) -> pa.Table:
        h = np.array(T.hash_strings_hex(t["text"], "sha256"), dtype=object)
        bucket = digest_bucket(h)
        n = t.num_rows
        return pa.table(
            {
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "h": pa.array(h, pa.string()),
                "doc_id": t["doc_id"].cast(pa.int64()),
                "rep": pa.nulls(n, pa.int64()),
                "m": pa.nulls(n, pa.int64()),
                "bucket": pa.array(bucket),
            }
        )

    def tag_dups(t: pa.Table) -> pa.Table:
        h = t["h"].to_pandas().to_numpy()
        bucket = digest_bucket(h)
        n = t.num_rows
        return pa.table(
            {
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "h": t["h"].cast(pa.string()),
                "doc_id": pa.nulls(n, pa.int64()),
                "rep": t["doc_id"].cast(pa.int64()),
                "m": t["n"].cast(pa.int64()),
                "bucket": pa.array(bucket),
            }
        )

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "side" not in g.column_names:
            return empty
        side = g["side"].to_numpy(zero_copy_only=False)
        L = g.filter(pa.array(side == 0))
        R = g.filter(pa.array(side == 1))
        if L.num_rows == 0 or R.num_rows == 0:
            return empty
        lt = pd.DataFrame({"h": L["h"].to_pandas(), "doc_id": L["doc_id"].to_numpy()})
        rt = pd.DataFrame(
            {"h": R["h"].to_pandas(), "rep": R["rep"].to_numpy(), "m": R["m"].to_numpy()}
        )
        mg = lt.merge(rt, on="h")  # inner: non-dup docs drop
        return pa.table(
            {
                "doc_id": pa.array(mg["doc_id"].to_numpy(), pa.int64()),
                "rep": pa.array(mg["rep"].to_numpy(), pa.int64()),
                "m": pa.array(mg["m"].to_numpy(), pa.int64()),
            }
        )

    both = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(tag_docs, batch_format="pyarrow")
        .union(dupd.map_batches(tag_dups, batch_format="pyarrow"))
    )
    return grouped_map(both, "bucket", kernel, num_partitions=_shuffle_fan(), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup
# ---------------------------------------------------------------------------


from functools import lru_cache


@lru_cache(maxsize=4)
def _minhasher(num_perm: int) -> "T.MinHasher":
    # cached per worker process: map_batches runs as plain tasks (the
    # vectorized kernel is ~30ms per 512 docs, so an actor pool's spin-up
    # would cost more than the whole stage), and reused workers keep this
    return T.MinHasher(num_perm=num_perm)


def _band_rows(batch: pd.DataFrame, *, num_perm: int, bands: int, k: int) -> pd.DataFrame:
    """Per-doc shingle->MinHash->band rows."""
    mh = _minhasher(num_perm)
    rows = num_perm // bands
    sigs = mh.batch_signatures(list(batch["text"]), k)  # (n_docs, num_perm)
    n = len(batch)
    # band key = splitmix-style mix of the band's signature values — purely
    # an internal grouping key (the oracle compares band *values*, and a
    # 2^-64 false collision only adds a candidate the jaccard filter
    # re-checks), so no need for an md5 string-join
    flat = sigs[:, : bands * rows].reshape(n * bands, rows)
    h = np.full(len(flat), 0x9E3779B97F4A7C15, dtype=np.uint64)
    for c in range(rows):
        h = (h ^ flat[:, c]) * np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(29)
    return pd.DataFrame(
        {
            "band": np.tile(np.arange(bands), n),
            "bh": h.view(np.int64),
            "doc_id": np.repeat(batch["doc_id"].to_numpy(), bands),
        }
    )


def _groups_to_pairs(
    band: np.ndarray, bh: np.ndarray, did: np.ndarray, max_band_freq: int = 256
) -> pd.DataFrame:
    """All (id_a < id_b) pairs sharing a (band, bh) key — fully vectorized.

    Groups are bucketed by size class so pair generation is a handful of
    matrix ``triu_indices`` gathers instead of a Python loop per group.

    Groups larger than ``max_band_freq`` are DROPPED (same armor as the
    stop-gram prune in ngram_jaccard_pairs): a size-s band bucket emits
    s²/2 pairs, and web corpora always contain near/exact-dup mega-clusters
    — without the cap one hot bucket at 100 TB emits quadrillions of pairs.
    Exact-dup clusters are expected to be collapsed to one representative
    *before* LSH (dedup_clusters does); the oracle applies the same cap.
    """
    empty = pd.DataFrame({"id_a": pd.Series(dtype=np.int64), "id_b": pd.Series(dtype=np.int64)})
    if len(did) == 0:
        return empty
    order = np.lexsort((did, bh, band))
    band, bh, did = band[order], bh[order], did[order]
    keep = np.empty(len(did), dtype=bool)  # dedup (band, bh, doc_id) triples
    keep[0] = True
    keep[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1]) | (did[1:] != did[:-1])
    band, bh, did = band[keep], bh[keep], did[keep]
    gnew = np.empty(len(did), dtype=bool)
    gnew[0] = True
    gnew[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
    counts = np.diff(np.append(np.flatnonzero(gnew), len(did)))
    starts = np.cumsum(counts) - counts
    out_a, out_b = [], []
    for s in np.unique(counts):
        if s < 2 or s > max_band_freq:
            continue
        gs = starts[counts == s]
        m = did[gs[:, None] + np.arange(s)[None, :]]  # (n_groups, s), rows ascending
        ii, jj = np.triu_indices(s, k=1)
        out_a.append(m[:, ii].ravel())
        out_b.append(m[:, jj].ravel())
    if not out_a:
        return empty
    return pd.DataFrame(
        {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
    ).drop_duplicates()


def minhash_candidate_pairs(
    docs: rd.Dataset, *, num_perm=64, bands=16, k=3, max_band_freq: int = 256
) -> rd.Dataset:
    """{id_a, id_b} candidate near-dup pairs (band-bucket collisions, deduped;
    band buckets larger than ``max_band_freq`` dropped — see
    ``_groups_to_pairs``)."""
    band_rows = docs.select_columns(["doc_id", "text"]).map_batches(
        _band_rows,
        fn_kwargs={"num_perm": num_perm, "bands": bands, "k": k},
        batch_format="pandas",
        batch_size=512,
    )

    # coarse-bucket the (band, bh) keys so the shuffle has few, large groups
    # (per-tiny-group map_groups overhead dominates otherwise)
    mbf = int(max_band_freq)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return _groups_to_pairs(
            g["band"].to_numpy(), g["bh"].to_numpy(), g["doc_id"].to_numpy(), mbf
        )

    # pairs may repeat across bands (different buckets); consumers dedup —
    # minhash_dedup_pairs picks drop_duplicates (small) or a packed-key
    # groupby (large) by volume
    return grouped_map(
        band_rows.map_batches(_tag_bucket64("bh"), batch_format="pyarrow"),
        "bucket",
        bucket_pairs,
        num_partitions=_shuffle_fan(),
        small_rows=1_000_000,  # pair fan-out per row bounded by max_band_freq
    )


def minhash_signatures(docs: rd.Dataset, *, num_perm=64, k=3) -> rd.Dataset:
    """{doc_id, perm, mh} — one row per (doc, permutation slot).

    SQL-checkable: shingle hashing is md5-low-64 and the permutation
    constants are fixed (functions/text.py MinHasher), so the DuckDB oracle
    recomputes identical signatures.
    """

    class Stage:
        def __init__(self):
            self.mh = T.MinHasher(num_perm=num_perm)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            sigs = self.mh.batch_signatures(list(b["text"]), k)
            n = len(b)
            return pd.DataFrame(
                {
                    "doc_id": np.repeat(b["doc_id"].to_numpy(), num_perm),
                    "perm": np.tile(np.arange(num_perm, dtype=np.int64), n),
                    "mh": sigs.reshape(-1).astype(np.int64),
                }
            )

    from ..stages.agg import actor_pool_args

    return docs.select_columns(["doc_id", "text"]).map_batches(
        Stage, batch_format="pandas", batch_size=1024, **actor_pool_args()
    )


# above this many candidate pairs the verify step switches from the
# broadcast-filter fast path to distributed text joins (a near-dup-heavy
# corpus can make the candidate set a large fraction of the corpus — a
# driver-side dict of texts would OOM; same auto-fallback contract as
# stages/joins.lookup_vids)
BROADCAST_MAX_PAIRS = 1_000_000
# ... and a BYTE cap on the broadcast text dict itself: 1M pairs can touch
# 2M documents, which at 10 KB/doc is ~20 GB driver-side.  The fast path
# streams the filtered texts and abandons to the distributed joins the
# moment the accumulated text volume crosses this line.
BROADCAST_MAX_TEXT_BYTES = 256 * 1024 * 1024


def _verify_fn(threshold: float, k: int):
    def verify(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "text_a" not in b.columns:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype=np.int64),
                    "id_b": pd.Series(dtype=np.int64),
                    "jac_u": pd.Series(dtype=np.int64),
                }
            )
        j = T.batch_jaccard_word_ngrams(list(b["text_a"]), list(b["text_b"]), k)
        keep = j >= threshold
        return pd.DataFrame(
            {
                "id_a": b["id_a"].to_numpy()[keep],
                "id_b": b["id_b"].to_numpy()[keep],
                "jac_u": np.floor(j[keep] * 1e6 + 0.5).astype(np.int64),
            }
        )

    return verify


def minhash_dedup_pairs(
    docs: rd.Dataset,
    *,
    threshold: float = 0.7,
    num_perm=64,
    bands=16,
    k=3,
    max_band_freq: int = 256,
) -> rd.Dataset:
    """Verified near-dup pairs {id_a, id_b, jac_u} (jaccard >= threshold,
    jac_u = floor(jaccard * 1e6 + 0.5)).

    Candidates come from LSH banding (band buckets above ``max_band_freq``
    dropped — collapse exact dupes first, as dedup_clusters does).
    Verification attaches both texts and computes exact word-ngram Jaccard
    inside ``map_batches``; the text attachment picks its shape by volume:

    - small candidate sets (the common case): broadcast the candidate-id
      set, filter the docs table for just those texts, ship the small dict
      via ``ray.put`` — one streaming pass over the corpus, no shuffle.
      The stream aborts to the join path the moment either the pair count
      (``BROADCAST_MAX_PAIRS``) or the accumulated text bytes
      (``BROADCAST_MAX_TEXT_BYTES``) cross their caps,
    - otherwise: two distributed hash joins pair->text (nothing ever
      materializes on the driver).
    """
    import ray

    cands = minhash_candidate_pairs(
        docs, num_perm=num_perm, bands=bands, k=k, max_band_freq=max_band_freq
    ).materialize()
    n_pairs = cands.count()
    verify = _verify_fn(threshold, k)

    if n_pairs <= BROADCAST_MAX_PAIRS:
        pdf = cands.to_pandas()
        if len(pdf):
            pdf = pdf.drop_duplicates(["id_a", "id_b"]).reset_index(drop=True)
        if len(pdf) == 0:
            return rd.from_arrow(
                pa.table(
                    {
                        "id_a": pa.array([], pa.int64()),
                        "id_b": pa.array([], pa.int64()),
                        "jac_u": pa.array([], pa.int64()),
                    }
                )
            )
        wanted = np.unique(np.concatenate([pdf["id_a"].to_numpy(), pdf["id_b"].to_numpy()]))
        wref = ray.put(wanted)

        def pick(b: pd.DataFrame) -> pd.DataFrame:
            w = ray.get(wref)
            return b[b["doc_id"].isin(w)]

        # stream the filtered texts into the broadcast dict, byte-capped:
        # a pair-count cap alone admits ~2M docs (20 GB at 10 KB/doc)
        tmap: dict = {}
        total_bytes = 0
        for tb in (
            docs.select_columns(["doc_id", "text"])
            .map_batches(pick, batch_format="pandas")
            .iter_batches(batch_format="pandas")
        ):
            # encoded UTF-8 size, not code points: non-ASCII text is up to
            # 4 bytes/char, and this cap exists to bound driver memory
            total_bytes += int(tb["text"].str.encode("utf-8").str.len().sum())
            if total_bytes > BROADCAST_MAX_TEXT_BYTES:
                tmap = None  # too much text for a driver-side dict
                break
            tmap.update(zip(tb["doc_id"], tb["text"]))

        if tmap is not None:
            tref = ray.put(tmap)

            def attach_and_verify(b: pd.DataFrame) -> pd.DataFrame:
                tm = ray.get(tref)
                b = b.assign(
                    text_a=[tm[i] for i in b["id_a"]], text_b=[tm[i] for i in b["id_b"]]
                )
                return verify(b)

            return from_pandas_clean(pdf).map_batches(attach_and_verify, batch_format="pandas")
        cands = from_pandas_clean(pdf)  # fall through to the distributed joins

    # large-candidate path: distributed joins; join fan sized to the session
    # (each join spawns npart shuffle-aggregator actors reserving CPU
    # fractions — two chained 16-way joins deadlock a 4-cpu session)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    npart = max(2, min(16, ncpu // 2))
    # dedup pairs surfaced by multiple bands: packed single-int key when doc
    # ids fit 31 bits (a single-key groupby shuffles far cheaper than
    # multi-key); arbitrary int64 ids take the two-key aggregate instead —
    # packing would silently collide (same contract as dedup_clusters)
    cands = cands.materialize()
    big_ids = bool(cands.count()) and (
        max(cands.max("id_a"), cands.max("id_b")) >= 2**31
        or min(cands.min("id_a"), cands.min("id_b")) < 0
    )
    if big_ids:
        cands = bucketed_agg(
            cands, ["id_a", "id_b"], {"_n": (None, "count")}
        ).select_columns(["id_a", "id_b"])
    else:
        cands = bucketed_agg(
            cands.map_batches(
                lambda b: pd.DataFrame(
                    {"pk": (b["id_a"].to_numpy().astype(np.int64) << 32) | b["id_b"].to_numpy()}
                ),
                batch_format="pandas",
            ),
            "pk",
            {"_n": (None, "count")},
        ).map_batches(
            lambda b: pd.DataFrame(
                {
                    "id_a": b["pk"].to_numpy() >> 32,
                    "id_b": b["pk"].to_numpy() & 0xFFFFFFFF,
                }
            ),
            batch_format="pandas",
        )
    # text attachment via the co-shuffle lookup, NOT Dataset.join: the byte-
    # cap fallback can arrive here with FEW pairs (huge texts), and Ray's
    # hash join crashes on any partition that receives zero left rows
    from ..stages.joins import coshuffle_lookup

    texts = docs.select_columns(["doc_id", "text"])
    with_a = coshuffle_lookup(
        cands, texts, "id_a", "doc_id", "text", "text_a", fan=npart, how="inner"
    )
    with_ab = coshuffle_lookup(
        with_a, texts, "id_b", "doc_id", "text", "text_b", fan=npart, how="inner"
    )
    return with_ab.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (inverted index — no sketch, exact)
# ---------------------------------------------------------------------------


# prefix-route gate: the verify gram CSR and the gram df table must each fit
# one broadcast; total kept-gram rows bounds both (8 B/gram -> ~160 MB at the
# cap).  Above it the counting index (whose widest op is the df-capped
# gram-group shuffle) is the scale path.
NGRAM_PREFIX_MAX_GRAM_ROWS = 20_000_000

# minimum gram rows per kept-kernel shard task (monkeypatchable in tests to
# force the P > 1 sharded path on small corpora)
NGRAM_SHARD_MIN_ROWS = 131_072

_NGRAM_KEPT_EMPTY = {
    "did": np.zeros(0, np.int64),
    "gr": np.zeros(0, np.int32),
    "rank": np.zeros(0, np.int64),
    "k": np.zeros(0, np.int64),
    "sz": np.zeros(0, np.int64),
    "pref": np.zeros(0, bool),
}


def _ngram_kept_kernel(dids, h, df_tbl, mdf: int, tf: float) -> dict:
    """Kept-gram rows for one doc-aligned shard of the prefix route, as
    (doc asc, gram-rank asc)-ordered numpy arrays.

    ``dids``/``h`` are the shard's (doc, gram-hash) rows, ALREADY sorted by
    doc with every row of a doc present (the caller cuts on doc
    boundaries); ``df_tbl = (gh_sorted, weighted_df)`` is the global gram
    table (one ``ray.put``, zero-copy in workers).  The two multi-key sorts
    pack their keys into ONE uint64 and take a single unstable argsort when
    the component widths fit (keys are unique per row, so stability is
    irrelevant) — about half the wall of a np.lexsort; np.lexsort remains
    the fallback for out-of-range components (huge max_doc_freq etc.).

    Output columns: doc id, dense gram rank ("gr", position in the
    gh-sorted df table), prefix position ("rank", the row's index in its
    doc's (df, gr)-canonical order), kept count ("k"), unpruned distinct
    size ("sz"), and the q=2 extended-prefix flag ("pref" — Xiao et al.'s
    generalization of Bayardo's All-Pairs prefix: a pair with intersection
    >= alpha shares >= 2 grams within each side's first k - alpha + 2
    positions, so the probe's witness filter can demand two hits before
    paying for full verification)."""
    gh_s, df_s = df_tbl
    if not len(dids):
        return dict(_NGRAM_KEPT_EMPTY)
    neq = dids[1:] != dids[:-1]
    seg_start = np.flatnonzero(np.r_[True, neq])
    seg = np.empty(len(dids), np.int64)
    seg[0] = 0
    np.cumsum(neq, dtype=np.int64, out=seg[1:])
    nseg = len(seg_start)
    sz = np.bincount(seg, minlength=nseg).astype(np.int64)
    if len(gh_s):
        gr = np.searchsorted(gh_s, h).astype(np.int32)  # dense gram rank
        dfv = df_s[gr]
    else:
        gr = np.zeros(len(h), np.int32)
        dfv = np.zeros(len(h), np.int64)
    keep = dfv <= mdf
    r2, g2, df2 = seg[keep], gr[keep], dfv[keep]
    kcnt = np.bincount(r2, minlength=nseg).astype(np.int64)
    ngr = len(gh_s)
    # per-doc canonical (df, gh-rank) order
    if nseg < 2**25 and ngr < 2**25 and mdf < 2**14:
        o = np.argsort(
            (r2.astype(np.uint64) << np.uint64(39))
            | (df2.astype(np.uint64) << np.uint64(25))
            | g2.astype(np.uint64)
        )
    else:
        o = np.lexsort((g2, df2, r2))
    r3, g3 = r2[o], g2[o]
    if len(r3):
        startd = np.flatnonzero(np.r_[True, r3[1:] != r3[:-1]])
        runlen = np.diff(np.append(startd, len(r3)))
        rank = np.arange(len(r3), dtype=np.int64) - np.repeat(startd, runlen)
    else:
        rank = np.zeros(0, dtype=np.int64)
    # re-emit in (doc, gram-rank) order so the CSR build needs no sort
    if nseg < 2**25 and ngr < 2**25:
        o2 = np.argsort((r3.astype(np.uint64) << np.uint64(25)) | g3.astype(np.uint64))
    else:
        o2 = np.lexsort((g3, r3))
    r4 = r3[o2]
    k4 = kcnt[r4]
    sz4 = sz[r4]
    rank4 = rank[o2]
    alpha4 = np.maximum(1, np.floor(tf * sz4).astype(np.int64))
    return {
        "did": dids[seg_start][r4].astype(np.int64, copy=False),
        "gr": g3[o2],
        "rank": rank4,
        "k": k4,
        "sz": sz4,
        "pref": rank4 < (k4 - alpha4 + 2),
    }


def _ngram_pairs_prefix(
    rep_docs: rd.Dataset,
    gram_rows_fn,
    msz: "rd.Dataset | None",
    *,
    did_t: str,
    thr: float,
    mdf: int,
    fan: int,
):
    """Prefix-filtered exact n-gram Jaccard (the broadcast-scale route of
    ``ngram_jaccard_pairs`` — see its route comment for the algorithm cite
    and the gate).  Returns ``(rep_pairs, intra)`` with the same semantics
    the counting index produces: ``rep_pairs = {id_a, id_b, jac_u}`` over
    representatives, ``intra = {rep, jac_u}`` for duplicated groups (None
    when ``msz`` is None).

    Three NECESSARY conditions for ``jaccard >= t`` prune candidates before
    any wide op; survivors get their true intersection from a broadcast CSR
    of every rep's kept (df <= max_doc_freq) grams, so output is exactly the
    counting index's:

    - prefix: with each doc's kept grams in one global (df, gh) order, a
      qualifying pair shares a gram among each side's first
      ``k_d - floor(t*sz_d) + 1``  (jac >= t implies intersection
      >= t*union >= t*sz_d; if all shared grams sat beyond the prefix the
      intersection would be < floor(t*sz_d))
    - positional: intersection <= min(k_a - i, k_b - j) at the first shared
      gram's ranks (i, j) — must reach ceil(t/(1+t)(sz_a+sz_b))
    - length: intersection <= min(sz) and union >= max(sz) force
      min(sz) >= t*max(sz)

    ``jac = inter/(sz_a + sz_b - inter)`` with sz the UNPRUNED distinct-gram
    count and inter over kept grams only — the counting index's conservative
    jaccard, replayed by the DuckDB oracle.
    """
    from ..stages.joins import lookup_join

    tf = max(float(thr), 0.0)  # filters assume t >= 0; thr < 0 still exact

    import time as _time

    _prof = os.environ.get("GRAFT_NGRAM_PROF") == "1"
    _t = [_time.time()]

    def _mark(label):
        if _prof:
            now = _time.time()
            print(f"[ngram-prefix] {label}: {now - _t[0]:.1f}s", flush=True)
            _t[0] = now

    # 1. ONE distributed shingle+hash pass, ONE gate-bounded gather: the
    #    route only runs when total gram rows fit a broadcast (the gate), so
    #    the distinct (doc, gram, m) rows can come straight to the driver —
    #    every later structure (df table, kept ranks, CSR, posting) is a
    #    vectorized kernel over this one table.  Previous shapes paid a
    #    bucketed_agg shuffle for df, a SECOND tokenize pass (or a
    #    grouped_map exchange) for the kept ranks, and a separate kept
    #    gather — each a multi-second Ray stage floor at 10x bench scale
    #    for data that was driver-bounded all along.
    gp_blocks = [
        t
        for t in ray.get(
            rep_docs.map_batches(
                gram_rows_fn, batch_format="pandas", batch_size=512
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    if gp_blocks:
        gp_t = pa.concat_tables(gp_blocks, promote_options="default")
        gh_all = gp_t["gh"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        m_all = gp_t["m"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        did_arr = (
            gp_t[did_t].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        )
    else:
        gh_all = m_all = did_arr = np.zeros(0, np.int64)
    # release the gathered blocks + concat table: at the 20M-row gate bound
    # they are ~0.5 GB each and everything below works from the numpy copies
    gp_blocks = gp_t = None
    _mark("gram gather")

    # 2. weighted gram document frequency (identical to the counting
    #    kernel's in-bucket W), driver-side: one argsort + reduceat
    o_gh = np.argsort(gh_all, kind="stable")
    ghs, ms = gh_all[o_gh], m_all[o_gh]
    f_gh = np.flatnonzero(np.r_[True, ghs[1:] != ghs[:-1]]) if len(ghs) else np.zeros(0, np.int64)
    gh_s = ghs[f_gh]
    df_s = np.add.reduceat(ms, f_gh) if len(f_gh) else np.zeros(0, np.int64)
    del o_gh, ghs, ms, m_all
    _mark("df table")

    # (kept-row schema; grams are dictionary-encoded to their dense rank in
    # the gh-sorted df table — "gr", int32, the route gate bounds distinct
    # grams < 2^31 — so the CSR halves its bytes and the verify kernel can
    # pack (pair, gram) into ONE int64)

    # 3. kept-gram rows with canonical rank — the kernel runs over
    #    doc-aligned SHARDS of the gathered table as plain ray tasks (no
    #    Dataset stage floors; ~30 s single-core at the 20M-row gate bound,
    #    ~1 s/shard across a node).  Shards are doc-ranges of the did-sorted
    #    rows, so per-doc stats are exact and concatenating shard outputs
    #    in order IS the (doc, gram-rank) order the CSR needs.
    h_arr = gh_all
    if len(did_arr) and (int(did_arr.max()) >= 2**31 or int(did_arr.min()) < 0):
        raise ValueError(
            "ngram_jaccard_pairs requires 0 <= doc_id < 2^31 (packed pair keys)"
        )
    o0 = np.argsort(did_arr, kind="stable")
    did_srt, h_srt = did_arr[o0], h_arr[o0]
    del o0, did_arr, h_arr, gh_all
    n_rows = len(did_srt)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    P = max(1, min(ncpu, n_rows // NGRAM_SHARD_MIN_ROWS))
    if P > 1:
        cuts = [0]
        for i in range(1, P):
            pos = min((n_rows * i) // P, n_rows - 1)
            pos = int(np.searchsorted(did_srt, did_srt[pos], side="right"))
            if cuts[-1] < pos < n_rows:
                cuts.append(pos)
        cuts.append(n_rows)
        ref_tbl = ray.put((gh_s, df_s))
        from ..portability import remote_args as _remote_args

        shard = ray.remote(num_cpus=1, **_remote_args())(_ngram_kept_kernel)
        parts = ray.get(
            [
                shard.remote(did_srt[a:b], h_srt[a:b], ref_tbl, mdf, tf)
                for a, b in zip(cuts, cuts[1:])
            ]
        )
        kp_full = {
            key: np.concatenate([p[key] for p in parts])
            for key in _NGRAM_KEPT_EMPTY
        }
    else:
        kp_full = _ngram_kept_kernel(did_srt, h_srt, (gh_s, df_s), mdf, tf)
    del did_srt, h_srt
    _mark("kept")

    # 4. verify CSR: every rep's kept gram ranks (sorted per doc) +
    #    unpruned size — rows are (doc, gram-rank)-sorted by construction
    dvals = kp_full["did"]
    if len(dvals):
        dkeys, counts = np.unique(dvals, return_counts=True)
        off = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
        gv = kp_full["gr"]
        szv = kp_full["sz"][off[:-1]]
    else:
        dkeys = np.array([], np.int64)
        off = np.zeros(1, np.int64)
        gv = np.array([], np.int32)
        szv = np.array([], np.int64)
    csr_ref = ray.put((dkeys, off, gv, szv))
    _mark("csr")

    # 5. posting broadcast: the prefix rows are gate-bounded like the CSR,
    #    so instead of exchanging them (the old route's grouped_map by gram
    #    bucket plus a 12M-row witness-count groupby were the two dominant
    #    operators at 10x bench scale, ~4 s each; even an 8k-row blob
    #    shuffle pays Ray's multi-second sort-shuffle session floor), gather
    #    them ONCE, sort by (gr, did) on the driver, and ship ONE zero-copy
    #    object-store ref.  Enumeration is then DOC-MAJOR (Bayardo et al.'s
    #    All-Pairs probe order): the task owning doc ``a`` walks a's prefix
    #    rows; because each gram run is did-sorted, a's partners ``b < a``
    #    are exactly the run rows BEFORE a's own row — one vectorized
    #    gather, and every co-occurrence of a pair lands in the one task
    #    that owns its larger doc, so witness counts are GLOBAL with no
    #    exchange and no dedup pass anywhere.
    pmask = kp_full["pref"]
    npp = int(pmask.sum())
    _PAIRS_EMPTY = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "jac_u": pa.array([], pa.int64()),
        }
    )
    if npp:
        did_all = kp_full["did"][pmask]
        gr_all = kp_full["gr"][pmask]
        # (gr, did) order via one packed-key argsort (gr < 2^25 under the
        # gate, did < 2^31 by the kernel's check; unique per row)
        if len(gh_s) < 2**25:
            o = np.argsort(
                (gr_all.astype(np.uint64) << np.uint64(31)) | did_all.astype(np.uint64)
            )
        else:
            o = np.lexsort((did_all, gr_all))
        pdid = did_all[o]
        prank = kp_full["rank"][pmask][o]
        pkk = kp_full["k"][pmask][o]
        psz = kp_full["sz"][pmask][o]
        gr_s = gr_all[o]
        run_starts = np.flatnonzero(np.r_[True, gr_s[1:] != gr_s[:-1]])
        run_lens = np.diff(np.append(run_starts, len(gr_s)))
        # per-row partner count = rows before this one in its run (its doc's
        # co-occurrences with every smaller doc sharing the gram)
        rs = np.repeat(run_starts, run_lens)
        plen = np.arange(len(gr_s), dtype=np.int64) - rs
        # work-balanced DOC cuts: each task owns a doc-id range; its work is
        # the total partner volume of its docs' rows.  Uncut hot docs are
        # impossible (per-row partner count < the per-gram df cap), so
        # equal-work ranges bound the straggler.
        docs_u = np.unique(pdid)
        wd = np.bincount(
            np.searchsorted(docs_u, pdid), weights=plen.astype(np.float64) + 0.25
        )
        cwd = np.cumsum(wd)
        nb = max(1, min(8 * int(fan), len(docs_u)))
        qs = (np.arange(1, nb, dtype=np.float64) * cwd[-1]) / nb
        di = np.minimum(np.searchsorted(cwd, qs), max(len(docs_u) - 2, 0))
        dcuts = np.unique(
            np.r_[docs_u[0], docs_u[di + 1] if len(di) else [], docs_u[-1] + 1]
        ).astype(np.int64)
        nb = len(dcuts) - 1
    else:
        pdid = prank = pkk = psz = rs = np.array([], np.int64)
        dcuts = np.array([0, 0], np.int64)
        nb = 1
    post_ref = ray.put((pdid, prank, pkk, psz, rs, dcuts))
    _mark("posting")

    if not npp:
        rep_pairs = from_pandas_clean(_PAIRS_EMPTY.to_pandas())
        _mark("cands+verify wired (lazy)")
    else:
        # 6. fused probe + witness-count + verify, one task per doc range:
        #    - probe: for each owned prefix row, gather its run-prefix
        #      partners; a pair survives the positional bound
        #      ``min(k_a - i, k_b - j) >= alpha_pair - 1`` (relaxed by one so
        #      a qualifying pair's SECOND witness also survives — the
        #      witness filter demands two) and the length bound
        #      ``min(sz) >= t*max(sz)``,
        #    - witness count: per-pair surviving co-occurrences via one
        #      np.unique — GLOBAL by construction (all witnesses of a pair
        #      live in its owner task); a pair needing intersection >= 2
        #      must collect >= 2 witnesses (q=2 prefix theorem), which kills
        #      the ~98% of candidates sharing exactly one gram before any
        #      full intersection is paid,
        #    - verify: TRUE intersection for survivors from the broadcast
        #      kept-gram CSR.  Packing (pair_idx << 32 | gram_rank) keeps
        #      the b-side keys pre-sorted (pair asc, CSR slices rank-asc),
        #      so intersection is one binary-search membership pass — no
        #      per-pair Python; chunked to bound the gather's peak heap.
        def probe_verify(batch: pa.Table, pref_ref=post_ref, ref=csr_ref) -> pa.Table:
            pdid_, prank_, pkk_, psz_, rs_, dcuts_ = ray.get(pref_ref)
            dk, off_, gv_, szv_ = ray.get(ref)
            outs = [_PAIRS_EMPTY]
            for bi in batch["id"].to_numpy(zero_copy_only=False):
                dlo, dhi = int(dcuts_[bi]), int(dcuts_[bi + 1])
                own = np.flatnonzero((pdid_ >= dlo) & (pdid_ < dhi))
                if not len(own):
                    continue
                L = own - rs_[own]
                own = own[L > 0]
                if not len(own):
                    continue
                L = own - rs_[own]
                tot = int(L.sum())
                cum = np.concatenate(([0], np.cumsum(L)[:-1]))
                pidx = np.repeat(rs_[own] - cum, L) + np.arange(tot)
                a = np.repeat(pdid_[own], L)
                ra = np.repeat(prank_[own], L)
                ka = np.repeat(pkk_[own], L)
                sa = np.repeat(psz_[own], L)
                b_ = pdid_[pidx]
                rb = prank_[pidx]
                kb = pkk_[pidx]
                sb = psz_[pidx]
                alpha_pair = np.ceil(tf / (1.0 + tf) * (sa + sb) - 1e-9)
                # positional bound relaxed by one: the SECOND witness of a
                # qualifying pair only guarantees min(k - i, k - j) >= alpha - 1
                ok = (np.minimum(sa, sb) + 1e-9 >= tf * np.maximum(sa, sb)) & (
                    np.minimum(ka - ra, kb - rb) >= np.maximum(alpha_pair - 1, 1)
                )
                if not ok.any():
                    continue
                # run rows are did-sorted, so every partner b_ < a: the pack
                # is already canonical (id_a = smaller doc)
                pk, cnt = np.unique((b_[ok] << 32) | a[ok], return_counts=True)
                for c0 in range(0, len(pk), 131072):
                    pkc = pk[c0 : c0 + 131072]
                    cc = cnt[c0 : c0 + 131072]
                    ia = (pkc >> 32).astype(np.int64)
                    ib = (pkc & 0xFFFFFFFF).astype(np.int64)
                    pa_ = np.searchsorted(dk, ia)
                    pb_ = np.searchsorted(dk, ib)
                    ap = np.ceil(tf / (1.0 + tf) * (szv_[pa_] + szv_[pb_]) - 1e-9)
                    w = cc >= np.minimum(2, np.maximum(ap, 1))
                    if not w.any():
                        continue
                    ia, ib, pa_, pb_ = ia[w], ib[w], pa_[w], pb_[w]
                    la = off_[pa_ + 1] - off_[pa_]
                    lb = off_[pb_ + 1] - off_[pb_]
                    pidx2 = np.arange(len(ia), dtype=np.int64) << 32

                    def gather_packed(pos, lens):
                        t_ = int(lens.sum())
                        c_ = np.concatenate(([0], np.cumsum(lens)[:-1]))
                        ix = np.repeat(off_[pos] - c_, lens) + np.arange(t_)
                        return np.repeat(pidx2, lens) | gv_[ix].astype(np.int64)

                    akeys = gather_packed(pa_, la)
                    bkeys = gather_packed(pb_, lb)  # pair asc, rank asc
                    if len(bkeys):
                        hit = np.minimum(
                            np.searchsorted(bkeys, akeys), len(bkeys) - 1
                        )
                        found = bkeys[hit] == akeys
                        inter = np.bincount(
                            akeys[found] >> 32, minlength=len(ia)
                        ).astype(np.int64)
                    else:
                        inter = np.zeros(len(ia), np.int64)
                    union = szv_[pa_] + szv_[pb_] - inter
                    jac = inter / np.maximum(union, 1)
                    keep = jac >= thr
                    if keep.any():
                        outs.append(
                            pa.table(
                                {
                                    "id_a": pa.array(ia[keep]),
                                    "id_b": pa.array(ib[keep]),
                                    "jac_u": pa.array(
                                        np.floor(jac[keep] * 1e6 + 0.5).astype(
                                            np.int64
                                        )
                                    ),
                                }
                            )
                        )
            return pa.concat_tables(outs, promote_options="default")

        rep_pairs = rd.range(nb, override_num_blocks=nb).map_batches(
            probe_verify, batch_format="pyarrow", batch_size=None
        )
        _mark("cands+verify wired (lazy)")

    # 6. intra-group pairs for duplicated groups: kept = per-rep kept-gram
    #    count (k), identical to the counting index's sz - npruned.  Per-doc
    #    stats come from the kept rows (a doc with no kept rows defaults to
    #    sz = k = 0 -> dropped, exactly the counting index's outcome: its
    #    intersection over kept grams is 0 for all-pruned or empty docs).
    intra = None
    if msz is not None:

        du, idx = np.unique(kp_full["did"], return_index=True)
        stats = from_pandas_clean(
            pd.DataFrame(
                {
                    did_t: du,
                    "sz": kp_full["sz"][idx],
                    "k": kp_full["k"][idx],
                }
            )
        )
        base = lookup_join(msz, stats, did_t, "sz", default=0, num_partitions=fan)
        base = lookup_join(base, stats, did_t, "k", default=0, num_partitions=fan)

        def intra_jac(b: pd.DataFrame) -> pa.Table:
            sz = b["sz"].to_numpy(dtype=np.int64)
            kept_ = b["k"].to_numpy(dtype=np.int64)
            jac = kept_ / np.maximum(2 * sz - kept_, 1)
            ok = (kept_ >= 1) & (jac >= thr)
            return pa.table(
                {
                    "rep": pa.array(b[did_t].to_numpy()[ok].astype(np.int64)),
                    "jac_u": pa.array(np.floor(jac[ok] * 1e6 + 0.5).astype(np.int64)),
                }
            )

        intra = base.map_batches(intra_jac, batch_format="pandas")

    return rep_pairs, intra


def ngram_jaccard_pairs(
    docs: rd.Dataset,
    *,
    threshold: float = 0.5,
    k: int = 3,
    max_doc_freq: int = 256,
    collapse: bool | None = None,
    method: str = "auto",
    n_docs: int | None = None,
) -> rd.Dataset:
    """Exact word-``k``-gram Jaccard near-dup pairs ``{id_a, id_b, jac_u}``
    (``jac_u = floor(jaccard * 1e6 + 0.5)``, pairs with jaccard >= threshold).

    The sketch-free sibling of MinHash-LSH: an **inverted index** on distinct
    gram hashes.  Exact duplicates are collapsed FIRST (``exact_rep_map``):
    the index runs over one representative per distinct text, so a corpus
    where every doc has ``c`` identical copies costs the index 1/c**2 of the
    naive pair work (measured: 10x-tiled sf0.1 with 10 copies/doc went
    94s -> seconds; the naive index is quadratic in the copy count).  The
    output contract is unchanged — jaccard depends only on the text, so
    rep-level results expand exactly to doc pairs:

    - a cross-group rep pair (ra, rb) expands to every (a in group(ra),
      b in group(rb)) combination with the same jac_u,
    - a group of m >= 2 identical docs expands to its m*(m-1)/2 intra pairs
      with jac = kept/(2*sz - kept) where ``kept`` is the doc's gram count
      surviving the stop-gram prune (the same conservative jaccard the
      uncollapsed index computes for identical texts; 1e6 exactly when
      nothing is pruned).

    Stop-gram pruning stays DOC-frequency based: a gram's df is the *weighted*
    group count ``sum(m)`` over the reps containing it, so which grams are
    dropped is identical to the uncollapsed index (and to the DuckDB oracle,
    which replays the definition over all docs).  Per-bucket kernels emit
    pre-aggregated partials; pruned-gram counts ride the same packed-key
    aggregate as the pair counts (negative keys — rep ids are nonnegative).

    Scale shape: the only wide ops are the rep fold, the gram-hash bucket
    groupby, the single-int-key ``groupby(pk).sum`` and (only above the
    broadcast cap) hash-join expansion.  Doc ids must fit 31 bits for the
    packed pair keys — wider ids fail loudly (dense-rank first, e.g.
    stages/ids.assign_dense_ids); ONLY rep ids are packed, members may be
    any int64.  Intra-group output is inherently quadratic in the group size
    (the contract enumerates all pairs) — use ``dedup_clusters`` when cluster
    membership, not the pair list, is the goal.
    """
    from ..stages.joins import lookup_join

    did_t = "doc_id"
    mdf = int(max_doc_freq)
    thr = float(threshold)
    fan = _shuffle_fan()

    _empty_pairs = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "jac_u": pa.array([], pa.int64()),
        }
    )

    # ---- exact-dup collapse, COST-BASED.  The dup map holds duplicated
    # groups only (absence == singleton), so it scales with the corpus'
    # duplication.  Collapsing pays a handful of fixed stage floors (the rep
    # lookup, the intra branch, the expansion) but cuts the index's pair
    # work by the SQUARE of the per-text copy count; with negligible
    # duplication the uncollapsed index is within ~(1 + dup_share)^2 of
    # optimal and the overhead dominates — so collapse only when duplicated
    # docs are a material share of the corpus.  BOTH branches produce
    # identical output (jaccard depends only on the text; oracle-verified).
    # The decision needs only pass-1 of the map (the dup-group aggregate:
    # sum(n) = docs living in duplicated groups); the membership pass — a
    # second full text scan — runs only when actually collapsing.  Callers
    # that already know their corpus' duplication (e.g. ran exact_dedup
    # upstream) can pass collapse=True/False and skip the decision aggregate.
    dupd = None
    dups_pre = None  # dup map built by the fused decision gather (below)
    ub_pre = None  # route-gate gram upper bound from the same pass
    if collapse is None and n_docs is None:
        # counted ONCE for both the gate and the dup-share decision — a
        # lazy upstream would otherwise execute per count()
        n_docs = docs.count()
    if collapse is None and n_docs <= DIGEST_GATHER_MAX_DOCS:
        # fused decision: ONE streaming pass emits per doc the sha256 hex
        # digest (exact_dedup's identity — the fold is the SAME helper
        # exact_rep_map's fast path uses, so grouping can never drift) and
        # the tokenize-only gram upper bound; one ~80 B/doc gather then
        # yields (a) the dup share for the collapse decision, (b) the dup
        # map itself when collapsing — replacing exact_rep_map's aggregate
        # + membership scans — and (c) the prefix/count gate's tok_ub
        # total (identical texts have identical token counts, so
        # one-per-distinct-digest IS the rep-level sum).  Three full text
        # scans become one.
        dec = (
            docs.select_columns([did_t, "text"])
            .map_batches(_sha256_rows_fn(did_t, ub_k=k), batch_format="pyarrow")
            .to_pandas()
        )
        if len(dec) and "h" in dec.columns:
            hs = np.asarray(dec["h"], dtype="S64")
            dvals = dec[did_t].to_numpy(np.int64)
            o, dids_s, firsts, runlen, gid, rep_per = _digest_dup_fold(hs, dvals)
            ubv = dec["ub"].to_numpy(np.int64)[o]
            n_dup_rows = int(runlen[runlen >= 2].sum())
            collapse = n_dup_rows >= max(64, n_docs // 20)
            if collapse:
                # gate over reps: one ub per distinct digest
                ub_pre = int(ubv[firsts].sum())
                dups_pre = rd.from_arrow(
                    _dup_map_table(dids_s, runlen, gid, rep_per)
                )
            else:
                # uncollapsed: every doc is its own rep — sum over ALL
                # rows, exactly the tok_ub the gate otherwise scans for
                ub_pre = int(ubv.sum())
        else:
            collapse = False
            ub_pre = 0
    if collapse is None:
        dupd = exact_dedup(docs).filter(expr="n >= 2").materialize()
        n_dup_rows = int(dupd.sum("n") or 0)
        collapse = n_dup_rows >= max(64, n_docs // 20)  # >=5% dup'd (or tiny corpus armor)

    if collapse:
        # {doc_id, rep, m} m>=2 only
        dups = dups_pre if dups_pre is not None else exact_rep_map(docs, dedup=dupd).materialize()
        # one signed lookup classifies every doc: miss -> singleton rep
        # (m=1), m>=2 -> duplicated group's rep, -1 -> non-rep member (drop)
        dsz = dups.map_batches(
            lambda t: pa.table(
                {
                    did_t: t["doc_id"],
                    "m": pa.array(
                        np.where(
                            t["doc_id"].to_numpy() == t["rep"].to_numpy(),
                            t["m"].to_numpy(),
                            -1,
                        ).astype(np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        rep_docs = lookup_join(
            docs.select_columns([did_t, "text"]), dsz, did_t, "m", default=1, num_partitions=fan
        ).filter(expr="m >= 1")
        # duplicated groups' reps {doc_id, m>=2}: the intra-pair universe
        msz = dups.filter(expr=f"{did_t} == rep").drop_columns(["rep"])
    else:
        # uncollapsed: every doc is its own "rep" with weight 1 (the original
        # inverted index — exact-dup pairs surface through shared grams)
        rep_docs = docs.select_columns([did_t, "text"]).map_batches(
            lambda t: t.append_column("m", pa.array(np.ones(t.num_rows, dtype=np.int64))),
            batch_format="pyarrow",
        )

    def gram_rows(b: pd.DataFrame) -> pd.DataFrame:
        H, c = T.batch_shingle_hashes(list(b["text"]), k)
        rows = pd.DataFrame(
            {
                did_t: np.repeat(b[did_t].to_numpy(), c),
                "m": np.repeat(b["m"].to_numpy(), c),
                "gh": H.view(np.int64),
            }
        )
        # distinct per doc (each doc's grams live in exactly one input batch)
        return rows.drop_duplicates([did_t, "gh"])

    grams = rep_docs.map_batches(gram_rows, batch_format="pandas", batch_size=512)

    def size_rows(b: pd.DataFrame) -> pd.DataFrame:
        H, c = T.batch_shingle_hashes(list(b["text"]), k)
        # distinct grams per doc, vectorized: one lexsort over (doc, gram)
        # then count first-in-run positions per doc (no per-doc Python loop)
        row_id = np.repeat(np.arange(len(c), dtype=np.int64), c)
        order = np.lexsort((H, row_id))
        r, h = row_id[order], H[order]
        first = np.empty(len(r), dtype=bool)
        if len(r):
            first[0] = True
            first[1:] = (r[1:] != r[:-1]) | (h[1:] != h[:-1])
        sz = np.bincount(r[first], minlength=len(c)).astype(np.int64)
        return pd.DataFrame({did_t: b[did_t], "sz": sz})

    # ---- route: prefix-filtered candidates + verify vs the counting index.
    # The counting index shuffles one packed key per shared gram per pair —
    # on low-duplication corpora that is O(sum_g C(df_g, 2)) keys to find a
    # handful of qualifying pairs (measured at 10x bench scale: 116M distinct
    # pairs for 80 results).  The prefix route (Bayardo et al. All-Pairs /
    # Xiao et al. PPJoin, both public) indexes only each doc's first
    # ``k_d - floor(t*sz_d) + 1`` kept grams in a global rarity order and
    # prunes per co-occurrence with the positional bound
    # ``min(k_a - i, k_b - j) >= ceil(t/(1+t)(sz_a+sz_b))`` and the length
    # bound ``min(sz) >= t*max(sz)`` — every filter is a proven NECESSARY
    # condition for jaccard >= t, so output is EXACTLY the counting index's
    # (surviving candidates get their true intersection from a broadcast
    # gram CSR).  The route needs that CSR (plus the gram df table) to fit
    # one broadcast, so it is gated on total kept-gram rows; above the gate
    # (the 100-TB shape) the counting index — whose widest structure is the
    # df-capped gram-group shuffle — remains the scale path.
    if method not in ("auto", "prefix", "count"):
        raise ValueError(f"ngram_jaccard_pairs: unknown method {method!r}")
    if method == "auto":
        if ub_pre is not None:
            ub_total = ub_pre  # from the fused decision gather — same value
        else:
            # cheap tokenize-only UPPER bound on gram rows (distinct grams
            # per doc <= shingles = ntok - k + 1) — no hashing, no shuffle;
            # a safe over-estimate only ever demotes to the scale path
            def tok_ub(b: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({"ub": _gram_upper_bound(b["text"], k)})

            ub_total = int(
                rep_docs.map_batches(tok_ub, batch_format="pandas").sum("ub") or 0
            )
        use_prefix = 0 < ub_total <= NGRAM_PREFIX_MAX_GRAM_ROWS
    else:
        use_prefix = method == "prefix"
    if use_prefix:
        rep_pairs, intra = _ngram_pairs_prefix(
            rep_docs,
            gram_rows,
            msz if collapse else None,
            did_t=did_t,
            thr=thr,
            mdf=mdf,
            fan=fan,
        )
        if not collapse:
            return rep_pairs
        return _expand_rep_pairs(rep_pairs, intra, dups, empty=_empty_pairs, fan=fan)

    # per-rep distinct-gram counts: second streaming pass over the rep docs
    # (no shuffle) rather than a groupby over the big gram table
    sizes = rep_docs.map_batches(size_rows, batch_format="pandas", batch_size=512).materialize()

    def bucket_pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        """Partial {pk, inter} for this bucket's gram groups (vectorized).

        pk >= 0: packed (rep_a << 32 | rep_b) co-occurrence partial.
        pk < 0: encoded ``-rep - 1`` pruned-gram partial (one per rep per
        gram whose weighted df exceeds ``max_doc_freq``) — feeds the per-rep
        ``kept = sz - npruned`` count the intra-group jaccard needs.
        """
        empty = pd.DataFrame(
            {"pk": pd.Series(dtype=np.int64), "inter": pd.Series(dtype=np.int64)}
        )
        if len(g) == 0 or "gh" not in g.columns:
            return empty
        gh = g["gh"].to_numpy()
        did = g[did_t].to_numpy()
        wm = g["m"].to_numpy()
        if did.max() >= 2**31 or did.min() < 0:
            # the global intersection counts ride a packed (id_a<<32|id_b)
            # key; wider/negative ids would silently collide (a negative id_b
            # sets every high bit, and a negative rep collides with the
            # -rep-1 pruned-gram encoding) — fail loudly (dense-rank ids
            # first, e.g. stages/ids.assign_dense_ids)
            raise ValueError("ngram_jaccard_pairs requires 0 <= doc_id < 2^31 (packed pair keys)")
        order = np.lexsort((did, gh))
        gh, did, wm = gh[order], did[order], wm[order]
        gnew = np.empty(len(gh), dtype=bool)
        gnew[0] = True
        gnew[1:] = gh[1:] != gh[:-1]
        starts = np.flatnonzero(gnew)
        counts = np.diff(np.append(starts, len(gh)))
        W = np.add.reduceat(wm, starts)  # weighted doc frequency per gram
        pruned = W > mdf
        keys = []
        prows = np.repeat(pruned, counts)
        if prows.any():
            keys.append(-did[prows] - 1)
        for s in np.unique(counts):
            if s < 2:  # singleton gram groups pair nothing
                continue
            gs = starts[(counts == s) & ~pruned]
            if not len(gs):
                continue
            m = did[gs[:, None] + np.arange(s)[None, :]]  # rows ascending by doc_id
            ii, jj = np.triu_indices(s, k=1)
            keys.append((m[:, ii].ravel() << 32) | m[:, jj].ravel())
        if not keys:
            return empty
        pk, inter = np.unique(np.concatenate(keys), return_counts=True)
        return pd.DataFrame({"pk": pk, "inter": inter.astype(np.int64)})

    agg = bucketed_agg(
        grouped_map(
            grams.map_batches(_tag_bucket64("gh"), batch_format="pyarrow"),
            "bucket",
            bucket_pair_counts,
            num_partitions=fan,
            # default 100k cap: the pair-count kernel is the pipeline's heavy
            # stage — above ~100k gram rows the parallel shuffle beats one
            # coalesced task (measured 2.2s vs 4.0s at sf0.1)
        ),
        "pk",
        {"inter": ("inter", "sum")},
    ).materialize()

    npruned = agg.filter(expr="pk < 0").map_batches(
        lambda b: pa.table(
            {
                did_t: pa.array((-b["pk"].to_numpy() - 1).astype(np.int64)),
                "npruned": pa.array(b["inter"].to_numpy().astype(np.int64)),
            }
        ),
        batch_format="pandas",
    )

    from ..stages.joins import BROADCAST_MAX_ROWS

    n_reps = sizes.count()
    if n_reps <= BROADCAST_MAX_ROWS:
        # fused finisher: the pair table is the pipeline's BIGGEST dataset
        # (one row per co-occurring pair — 116M at 10x bench scale) while the
        # size table is one int per rep; unpack + both size lookups + the
        # jaccard threshold collapse into ONE broadcast pass so the wide
        # table is scanned once and never rewritten with appended columns
        szdf = sizes.to_pandas().sort_values(did_t)
        sref = ray.put(
            (szdf[did_t].to_numpy(np.int64), szdf["sz"].to_numpy(np.int64))
        )

        def fused_finish(b: pd.DataFrame, ref=sref) -> pa.Table:
            keys, szv = ray.get(ref)
            pk = b["pk"].to_numpy()
            ia = (pk >> 32).astype(np.int64)
            ib = (pk & 0xFFFFFFFF).astype(np.int64)
            inter_ = b["inter"].to_numpy().astype(np.int64)
            sz_a = szv[np.searchsorted(keys, ia)]
            sz_b = szv[np.searchsorted(keys, ib)]
            union = sz_a + sz_b - inter_
            jac = inter_ / np.maximum(union, 1)
            keep = jac >= thr
            return pa.table(
                {
                    "id_a": pa.array(ia[keep]),
                    "id_b": pa.array(ib[keep]),
                    "jac_u": pa.array(np.floor(jac[keep] * 1e6 + 0.5).astype(np.int64)),
                }
            )

        rep_pairs = agg.filter(expr="pk >= 0").map_batches(
            fused_finish, batch_format="pandas", batch_size=262144
        )
    else:
        # above the broadcast cap (reps outnumber it): distributed size joins

        def unpack(b: pd.DataFrame) -> pa.Table:
            pk = b["pk"].to_numpy()
            return pa.table(
                {
                    "id_a": pa.array((pk >> 32).astype(np.int64)),
                    "id_b": pa.array((pk & 0xFFFFFFFF).astype(np.int64)),
                    "inter": pa.array(b["inter"].to_numpy().astype(np.int64)),
                }
            )

        pairs = agg.filter(expr="pk >= 0").map_batches(unpack, batch_format="pandas")
        pairs = lookup_join(
            pairs,
            sizes.map_batches(
                _rename_cols({did_t: "id_a", "sz": "sz_a"}), batch_format="pyarrow"
            ),
            "id_a",
            "sz_a",
            default=0,
            num_partitions=fan,
        )
        pairs = lookup_join(
            pairs,
            sizes.map_batches(
                _rename_cols({did_t: "id_b", "sz": "sz_b"}), batch_format="pyarrow"
            ),
            "id_b",
            "sz_b",
            default=0,
            num_partitions=fan,
        )

        def finish(b: pd.DataFrame) -> pa.Table:
            inter_ = b["inter"].to_numpy(dtype=np.int64)
            union = (
                b["sz_a"].to_numpy(dtype=np.int64) + b["sz_b"].to_numpy(dtype=np.int64) - inter_
            )
            jac = inter_ / np.maximum(union, 1)
            keep = jac >= thr
            # typed Arrow out: empty blocks keep the schema (pandas empties
            # have none, which breaks the distributed expansion joins
            # downstream)
            return pa.table(
                {
                    "id_a": pa.array(b["id_a"].to_numpy()[keep].astype(np.int64)),
                    "id_b": pa.array(b["id_b"].to_numpy()[keep].astype(np.int64)),
                    "jac_u": pa.array(np.floor(jac[keep] * 1e6 + 0.5).astype(np.int64)),
                }
            )

        rep_pairs = pairs.map_batches(finish, batch_format="pandas")
    if not collapse:
        return rep_pairs  # docs ARE the reps; nothing to expand

    # ---- intra-group pairs: {rep, jac_u} for groups of m >= 2 -------------
    # jac = kept/(2*sz - kept): identical texts share every gram, so their
    # intersection over KEPT grams is the per-doc kept count while the union
    # uses the unpruned sizes — exactly what the uncollapsed index computes.
    intra = lookup_join(
        lookup_join(
            msz, sizes, did_t, "sz", default=0, num_partitions=fan
        ),
        npruned,
        did_t,
        "npruned",
        default=0,
        num_partitions=fan,
    )

    def intra_jac(b: pd.DataFrame) -> pd.DataFrame:
        sz = b["sz"].to_numpy(dtype=np.int64)
        kept = sz - b["npruned"].to_numpy(dtype=np.int64)
        jac = kept / np.maximum(2 * sz - kept, 1)
        ok = (kept >= 1) & (jac >= thr)
        return pa.table(
            {
                "rep": pa.array(b[did_t].to_numpy()[ok].astype(np.int64)),
                "jac_u": pa.array(np.floor(jac[ok] * 1e6 + 0.5).astype(np.int64)),
            }
        )

    intra = intra.map_batches(intra_jac, batch_format="pandas")

    # ---- expand rep-level results to doc pairs ----------------------------
    return _expand_rep_pairs(rep_pairs, intra, dups, empty=_empty_pairs, fan=fan)


def _expand_rep_pairs(
    rep_pairs: rd.Dataset,
    intra: rd.Dataset,
    dups: rd.Dataset,
    *,
    empty: pa.Table,
    fan: int,
    cap: int | None = None,
) -> rd.Dataset:
    """Expand rep-level near-dup results to doc pairs ``{id_a, id_b, jac_u}``.

    ``dups`` holds members of DUPLICATED groups only (``{doc_id, rep, m}``,
    m >= 2) — a rep absent from it is a singleton and expands to itself, so
    the member table (and its broadcast) scales with the corpus'
    *duplication*, not its size.

    - ``rep_pairs`` (cross-group): each (ra, rb, jac_u) row becomes every
      (member(ra), member(rb)) combination, reordered so id_a < id_b.
    - ``intra`` (within-group): each (rep, jac_u) row becomes the group's
      m*(m-1)/2 ascending pairs (reps here are always in ``dups``).

    Under ``cap`` rows the member table is broadcast once (sorted arrays +
    searchsorted offsets — every expansion is vectorized); above it the
    cross side runs side-tagged co-shuffles (NOT ``Dataset.join``, which
    crashes on empty left partitions) carrying right-row positions so int64
    ids survive exactly, and the intra side a ``grouped_map`` on the rep
    key.  Each output pair is produced exactly once (groups partition the
    docs), so no dedup pass follows.
    """
    import ray

    from ..stages.joins import BROADCAST_MAX_ROWS, lookup_join

    cap = BROADCAST_MAX_ROWS if cap is None else int(cap)
    n_dup_rows = dups.count()

    if n_dup_rows <= cap:
        mt = dups.to_pandas()
        if len(mt) and "rep" in mt.columns:
            mt = mt.sort_values(["rep", "doc_id"])
            reps_u = np.unique(mt["rep"].to_numpy())
            offs0 = np.searchsorted(mt["rep"].to_numpy(), reps_u)
            members = mt["doc_id"].to_numpy().astype(np.int64)
            cnts = np.diff(np.append(offs0, len(members)))
        else:
            reps_u = np.array([], dtype=np.int64)
            offs0 = np.array([], dtype=np.int64)
            members = np.array([], dtype=np.int64)
            cnts = np.array([], dtype=np.int64)
        ref = ray.put((reps_u, offs0.astype(np.int64), cnts.astype(np.int64), members))

        def _locate(reps_u_, cnts_, keys):
            """(found, idx, n_members) per key; singletons: found=False, n=1."""
            if len(reps_u_) == 0:
                z = np.zeros(len(keys), dtype=np.int64)
                return np.zeros(len(keys), dtype=bool), z, np.ones(len(keys), dtype=np.int64)
            idx = np.minimum(np.searchsorted(reps_u_, keys), len(reps_u_) - 1)
            found = reps_u_[idx] == keys
            return found, idx, np.where(found, cnts_[idx], 1)

        def expand_cross(b: pd.DataFrame) -> pa.Table:
            if len(b) == 0 or "id_a" not in b.columns:
                return empty
            reps_u_, offs_, cnts_, mem_ = ray.get(ref)
            ra = b["id_a"].to_numpy()
            rb = b["id_b"].to_numpy()
            fa, ia, na = _locate(reps_u_, cnts_, ra)
            fb, ib, nb = _locate(reps_u_, cnts_, rb)
            tot = na * nb
            row = np.repeat(np.arange(len(b), dtype=np.int64), tot)
            base = np.cumsum(tot) - tot
            within = np.arange(int(tot.sum()), dtype=np.int64) - np.repeat(base, tot)
            nb_r = nb[row]
            ai = within // nb_r
            bi = within % nb_r
            if len(mem_):
                ga = mem_[np.where(fa, offs_[ia], 0)[row] + ai * fa[row]]
                gb = mem_[np.where(fb, offs_[ib], 0)[row] + bi * fb[row]]
                a_id = np.where(fa[row], ga, ra[row])
                b_id = np.where(fb[row], gb, rb[row])
            else:
                a_id, b_id = ra[row], rb[row]
            return pa.table(
                {
                    "id_a": pa.array(np.minimum(a_id, b_id)),
                    "id_b": pa.array(np.maximum(a_id, b_id)),
                    "jac_u": pa.array(b["jac_u"].to_numpy()[row]),
                }
            )

        def expand_intra(b: pd.DataFrame) -> pa.Table:
            if len(b) == 0 or "rep" not in b.columns:
                return empty
            reps_u_, offs_, cnts_, mem_ = ray.get(ref)
            out_a, out_b, out_j = [empty["id_a"].to_numpy()], [empty["id_b"].to_numpy()], [
                empty["jac_u"].to_numpy()
            ]
            for rep, ju in zip(b["rep"].to_numpy(), b["jac_u"].to_numpy()):
                i = int(np.searchsorted(reps_u_, rep))
                if i >= len(reps_u_) or reps_u_[i] != rep:
                    continue  # singleton (shouldn't happen: intra is m >= 2)
                m = int(cnts_[i])
                g = mem_[offs_[i] : offs_[i] + m]  # ascending doc_ids
                ii, jj = np.triu_indices(m, k=1)
                out_a.append(g[ii])
                out_b.append(g[jj])
                out_j.append(np.full(len(ii), ju, dtype=np.int64))
            return pa.table(
                {
                    "id_a": pa.array(np.concatenate(out_a)),
                    "id_b": pa.array(np.concatenate(out_b)),
                    "jac_u": pa.array(np.concatenate(out_j)),
                }
            )

        return rep_pairs.map_batches(expand_cross, batch_format="pandas").union(
            intra.map_batches(expand_intra, batch_format="pandas")
        )

    # distributed path.  NOT Ray's ``Dataset.join``: its hash-shuffle
    # aggregator crashes (ArrowInvalid) whenever a partition receives zero
    # left-side rows.  Both sides are tagged into one coarse key-bucket space
    # and co-shuffled through a single ``grouped_map`` per hop (the asof_join
    # shape): the per-bucket kernel does a vectorized pandas LEFT merge
    # carrying right-row positions (exact through the float64 upcast on
    # misses) — a rep with no member rows is a singleton and maps to itself.
    nb = 4 * fan

    def _bkt(a: np.ndarray) -> pa.Array:
        return pa.array((a.astype(np.uint64) % np.uint64(nb)).astype(np.int64))

    s1_empty = pa.table(
        {
            "id_b": pa.array([], pa.int64()),
            "jac_u": pa.array([], pa.int64()),
            "da": pa.array([], pa.int64()),
        }
    )

    def tag_rp(t: pa.Table) -> pa.Table:
        k = t["id_a"].cast(pa.int64()).to_numpy()
        n = len(k)
        return pa.table(
            {
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "key": pa.array(k),
                "id_b": t["id_b"].cast(pa.int64()),
                "jac_u": t["jac_u"].cast(pa.int64()),
                "mem": pa.nulls(n, pa.int64()),
                "bucket": _bkt(k),
            }
        )

    def tag_mem(t: pa.Table) -> pa.Table:
        k = t["rep"].cast(pa.int64()).to_numpy()
        n = len(k)
        return pa.table(
            {
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "key": pa.array(k),
                "id_b": pa.nulls(n, pa.int64()),
                "jac_u": pa.nulls(n, pa.int64()),
                "mem": t["doc_id"].cast(pa.int64()),
                "bucket": _bkt(k),
            }
        )

    def _hop_kernel(payload_cols, out_empty, emit):
        """LEFT-merge kernel: left rows expand per member, misses map to the
        key itself (singleton identity)."""

        def kernel(g: pa.Table) -> pa.Table:
            if g.num_rows == 0 or "side" not in g.column_names:
                return out_empty
            side = g["side"].to_numpy(zero_copy_only=False)
            L = g.filter(pa.array(side == 0))
            if L.num_rows == 0:
                return out_empty
            R = g.filter(pa.array(side == 1))
            lt = pd.DataFrame({"key": L["key"].to_numpy(), "__lrow": np.arange(L.num_rows, dtype=np.int64)})
            rt = pd.DataFrame({"key": R["key"].to_numpy(), "__pos": np.arange(R.num_rows, dtype=np.int64)})
            m = lt.merge(rt, on="key", how="left")
            pos = m["__pos"].to_numpy()
            lrow = m["__lrow"].to_numpy()
            miss = np.isnan(pos) if pos.dtype.kind == "f" else np.zeros(len(pos), dtype=bool)
            pidx = np.where(miss, 0, pos).astype(np.int64)
            mem_vals = R["mem"].to_numpy(zero_copy_only=False)
            key_vals = m["key"].to_numpy()
            member = np.where(miss, key_vals, mem_vals[pidx] if R.num_rows else 0).astype(np.int64)
            cols = {c: L[c].take(pa.array(lrow)).to_numpy(zero_copy_only=False) for c in payload_cols}
            return emit(cols, member)

        return kernel

    def s1_emit(cols, member):
        return pa.table(
            {
                "id_b": pa.array(cols["id_b"], pa.int64()),
                "jac_u": pa.array(cols["jac_u"], pa.int64()),
                "da": pa.array(member),
            }
        )

    half = grouped_map(
        rep_pairs.map_batches(tag_rp, batch_format="pyarrow").union(
            dups.map_batches(tag_mem, batch_format="pyarrow")
        ),
        "bucket",
        _hop_kernel(["id_b", "jac_u"], s1_empty, s1_emit),
        num_partitions=fan,
        batch_format="pyarrow",
    )

    def tag_half(t: pa.Table) -> pa.Table:
        k = t["id_b"].cast(pa.int64()).to_numpy()
        n = len(k)
        return pa.table(
            {
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "key": pa.array(k),
                "id_b": t["da"].cast(pa.int64()),  # carry da in the payload slot
                "jac_u": t["jac_u"].cast(pa.int64()),
                "mem": pa.nulls(n, pa.int64()),
                "bucket": _bkt(k),
            }
        )

    def s2_emit(cols, member):
        da = cols["id_b"]  # stage-1 member rode the id_b payload slot
        return pa.table(
            {
                "id_a": pa.array(np.minimum(da, member).astype(np.int64)),
                "id_b": pa.array(np.maximum(da, member).astype(np.int64)),
                "jac_u": pa.array(cols["jac_u"], pa.int64()),
            }
        )

    cross = grouped_map(
        half.map_batches(tag_half, batch_format="pyarrow").union(
            dups.map_batches(tag_mem, batch_format="pyarrow")
        ),
        "bucket",
        _hop_kernel(["id_b", "jac_u"], empty, s2_emit),
        num_partitions=fan,
        batch_format="pyarrow",
    )

    flagged = lookup_join(
        dups, intra, "rep", "jac_u", default=-1, num_partitions=fan
    ).filter(expr="jac_u >= 0")

    def intra_group(g: pd.DataFrame) -> pa.Table:
        if len(g) < 2 or "doc_id" not in g.columns:
            return empty
        ids = np.sort(g["doc_id"].to_numpy().astype(np.int64))
        ii, jj = np.triu_indices(len(ids), k=1)
        return pa.table(
            {
                "id_a": pa.array(ids[ii]),
                "id_b": pa.array(ids[jj]),
                "jac_u": pa.array(
                    np.full(len(ii), int(g["jac_u"].iloc[0]), dtype=np.int64)
                ),
            }
        )

    return cross.union(grouped_map(flagged, "rep", intra_group, num_partitions=fan))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(docs: rd.Dataset) -> rd.Dataset:
    """{doc_id, simhash: int64 (bit-cast)} per doc."""

    def stage(b: pd.DataFrame) -> pd.DataFrame:
        sh = T.batch_simhash64(list(b["text"]))
        return pd.DataFrame({"doc_id": b["doc_id"], "simhash": sh.view(np.int64)})

    return docs.select_columns(["doc_id", "text"]).map_batches(
        stage, batch_format="pandas", batch_size=1024
    )


def simhash_near_pairs(docs: rd.Dataset, *, max_hamming: int = 3) -> rd.Dataset:
    """Near-dup pairs by SimHash with exact-match band blocking.

    Pigeonhole guarantee: ``bands = max_hamming + 1`` equal bit-ranges — any
    pair within the hamming budget leaves at least one band untouched, so
    candidate generation has no false negatives; candidates are verified with
    the exact hamming distance.  (More bands => shorter bands => more random
    collisions; the verify step keeps the output exact either way.)
    """
    sigs = simhash_signatures(docs)
    n_bands = max_hamming + 1
    width = 64 // n_bands

    def explode_bands(b: pd.DataFrame) -> pd.DataFrame:
        s = b["simhash"].to_numpy().view(np.uint64)
        out = []
        for i in range(n_bands):
            lo = np.uint64(i * width)
            w = np.uint64(64 - i * width if i == n_bands - 1 else width)
            band = ((s >> lo) & ((np.uint64(1) << w) - np.uint64(1))).astype(np.int64)
            out.append(pd.DataFrame({"band": i, "bh": band, "doc_id": b["doc_id"], "sig": b["simhash"]}))
        return pd.concat(out, ignore_index=True)

    rows = sigs.map_batches(explode_bands, batch_format="pandas")

    mh = max_hamming

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Size-class-vectorized pair generation + hamming verify (no Python
        loop over the (band, bh) groups — group count scales with the corpus)."""
        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype=np.int64),
                "id_b": pd.Series(dtype=np.int64),
                "hamming": pd.Series(dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        band = g["band"].to_numpy()
        bh = g["bh"].to_numpy()
        did = g["doc_id"].to_numpy()
        sig = g["sig"].to_numpy().view(np.uint64)
        order = np.lexsort((did, bh, band))
        band, bh, did, sig = band[order], bh[order], did[order], sig[order]
        keep = np.empty(len(did), dtype=bool)  # dedup (band, bh, doc_id)
        keep[0] = True
        keep[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1]) | (did[1:] != did[:-1])
        band, bh, did, sig = band[keep], bh[keep], did[keep], sig[keep]
        gnew = np.empty(len(did), dtype=bool)
        gnew[0] = True
        gnew[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        counts = np.diff(np.append(np.flatnonzero(gnew), len(did)))
        starts = np.cumsum(counts) - counts
        out_a, out_b, out_h = [], [], []
        for s in np.unique(counts):
            if s < 2:
                continue
            gs = starts[counts == s]
            m = gs[:, None] + np.arange(s)[None, :]  # (n_groups, s) row indices
            ii, jj = np.triu_indices(s, k=1)
            ia, ib = m[:, ii].ravel(), m[:, jj].ravel()
            hd = T.hamming64(sig[ia], sig[ib])
            ok = hd <= mh
            if ok.any():
                out_a.append(did[ia[ok]])
                out_b.append(did[ib[ok]])
                out_h.append(hd[ok])
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "hamming": np.concatenate(out_h).astype(np.int64),
            }
        )

    pairs = grouped_map(
        rows.map_batches(_tag_bucket64("bh"), batch_format="pyarrow"),
        "bucket",
        bucket_pairs,
        num_partitions=_shuffle_fan(),
        small_rows=1_000_000,  # pair fan-out per row bounded by the band cap
    )
    # dedup pairs surfaced by multiple bands (pair cardinality scales with
    # the corpus — bucketed aggregate, stages/agg.py)
    return bucketed_agg(pairs, ["id_a", "id_b"], {"hamming": ("hamming", "min")})


# ---------------------------------------------------------------------------
# text analysis (SQL-replicable)
# ---------------------------------------------------------------------------


def token_counts(docs: rd.Dataset) -> rd.Dataset:
    """{doc_id, n_ws_tokens, n_bpe_tokens}."""

    def stage(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "n_ws_tokens": T.count_matches(b["text"], T.WS_TOKEN_RE),
                "n_bpe_tokens": T.count_matches(b["text"], T.BPE_TOKEN_RE),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(stage, batch_format="pandas")


def quality_scores(docs: rd.Dataset) -> rd.Dataset:
    """{doc_id, n_chars, n_words, n_stop, n_punct, n_upper, stop_ratio, quality}.

    Heuristic web-corpus quality flags (length / punctuation / stopword
    ratios); integer counts + one exact division each so the DuckDB oracle is
    bit-identical.
    """

    def stage(b: pd.DataFrame) -> pd.DataFrame:
        words = T.count_matches(b["text"], T.WORD_RE)
        stop = T.count_matches(b["text"].str.lower(), T.STOPWORD_RE)
        punct = T.count_matches(b["text"], T.PUNCT_RE)
        upper = T.count_matches(b["text"], T.UPPER_RE)
        nchars = b["text"].str.len().fillna(0).to_numpy(dtype=np.int64)  # null text -> 0, not INT64_MIN
        stop_ratio = stop / np.maximum(words, 1)
        quality = (
            (nchars >= 100).astype(np.int64)
            + (words >= 20).astype(np.int64)
            + (stop_ratio >= 0.01).astype(np.int64)
            + (punct * 2 <= words).astype(np.int64)
        )
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "n_chars": nchars,
                "n_words": words,
                "n_stop": stop,
                "n_punct": punct,
                "n_upper": upper,
                "stop_ratio": stop_ratio,
                "quality": quality,
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(stage, batch_format="pandas")


def language_id(docs: rd.Dataset) -> rd.Dataset:
    """{doc_id, pred_lang} — marker-token argmax with fixed precedence."""

    def stage(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b["doc_id"], "pred_lang": T.lang_predict(b["text"])})

    return docs.select_columns(["doc_id", "text"]).map_batches(stage, batch_format="pandas")


def text_stats(docs: rd.Dataset) -> rd.Dataset:
    """One-pass per-doc text profile merging ``token_counts`` +
    ``quality_scores`` + ``language_id``: {doc_id, n_ws_tokens, n_bpe_tokens,
    n_chars, n_words, n_stop, n_punct, n_upper, stop_ratio, quality,
    pred_lang}.  One ``map_batches`` pass instead of three — the three
    single-facet operators above stay as the library API; this is the
    driver-facing merged query (and the shape a real pipeline wants anyway:
    every regex bank runs over the text while it is hot in cache)."""

    def stage(b: pd.DataFrame) -> pd.DataFrame:
        words = T.count_matches(b["text"], T.WORD_RE)
        stop = T.count_matches(b["text"].str.lower(), T.STOPWORD_RE)
        punct = T.count_matches(b["text"], T.PUNCT_RE)
        upper = T.count_matches(b["text"], T.UPPER_RE)
        nchars = b["text"].str.len().fillna(0).to_numpy(dtype=np.int64)  # null text -> 0, not INT64_MIN
        stop_ratio = stop / np.maximum(words, 1)
        quality = (
            (nchars >= 100).astype(np.int64)
            + (words >= 20).astype(np.int64)
            + (stop_ratio >= 0.01).astype(np.int64)
            + (punct * 2 <= words).astype(np.int64)
        )
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "n_ws_tokens": T.count_matches(b["text"], T.WS_TOKEN_RE),
                "n_bpe_tokens": T.count_matches(b["text"], T.BPE_TOKEN_RE),
                "n_chars": nchars,
                "n_words": words,
                "n_stop": stop,
                "n_punct": punct,
                "n_upper": upper,
                "stop_ratio": stop_ratio,
                "quality": quality,
                "pred_lang": T.lang_predict(b["text"]),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(stage, batch_format="pandas")


def clean_fingerprint(docs: rd.Dataset) -> rd.Dataset:
    """{doc_id, clean, fp}: ``clean_text`` and ``fingerprints`` in a single
    pass (both normalize the same text; one batch read instead of two)."""

    def f(b: pd.DataFrame) -> pd.DataFrame:
        t = (
            b["text"]
            .str.lower()
            .str.replace(_EMAIL_PAT, "<email>", regex=True)
            .str.replace(_LONGNUM_PAT, "<num>", regex=True)
            .str.replace(r"[ \t\n\r]+", " ", regex=True)
            .str.strip()
        )
        fp = T.hash_strings_hex(T.normalize_ws(b["text"]), "md5")
        return pd.DataFrame({"doc_id": b["doc_id"], "clean": t, "fp": fp})

    return docs.select_columns(["doc_id", "text"]).map_batches(f, batch_format="pandas")


def fingerprints(docs: rd.Dataset) -> rd.Dataset:
    """{doc_id, fp} — md5 of the whitespace-normalized lowercased text."""

    def stage(b: pd.DataFrame) -> pd.DataFrame:
        fp = T.hash_strings_hex(T.normalize_ws(b["text"]), "md5")
        return pd.DataFrame({"doc_id": b["doc_id"], "fp": fp})

    return docs.select_columns(["doc_id", "text"]).map_batches(stage, batch_format="pandas")


# ---------------------------------------------------------------------------
# text cleaning / deterministic sampling
# ---------------------------------------------------------------------------

_EMAIL_PAT = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_LONGNUM_PAT = r"[0-9]{6,}"


def clean_text(docs: rd.Dataset) -> rd.Dataset:
    """{doc_id, clean}: lowercase, redact emails and 6+-digit runs, collapse
    whitespace, trim — the standard pre-tokenization cleanup, defined as a
    fixed composition of RE2-compatible regexes so DuckDB's
    ``regexp_replace(..., 'g')`` chain reproduces it byte-for-byte."""

    def f(b: pd.DataFrame) -> pd.DataFrame:
        t = (
            b["text"]
            .str.lower()
            .str.replace(_EMAIL_PAT, "<email>", regex=True)
            .str.replace(_LONGNUM_PAT, "<num>", regex=True)
            .str.replace(r"[ \t\n\r]+", " ", regex=True)
            .str.strip()
        )
        return pd.DataFrame({"doc_id": b["doc_id"], "clean": t})

    return docs.select_columns(["doc_id", "text"]).map_batches(f, batch_format="pandas")


def hash_sample(docs: rd.Dataset, *, rate_pct: int = 10, seed: str = "s42") -> rd.Dataset:
    """Deterministic hash sample: keep rows where
    ``md5_low64(seed | doc_id) % 100 < rate_pct`` — stable across runs,
    partitionings and engines (no RNG state), the resumable way to sample at
    scale.  Filter happens inside map_batches; nothing shuffles."""

    def f(b: pd.DataFrame) -> pd.DataFrame:
        keys = (seed + "|") + b["doc_id"].astype(str)
        h = T.hash_strings(keys.tolist())
        return b[(h % np.uint64(100)).astype(np.int64) < rate_pct]

    return docs.map_batches(f, batch_format="pandas")


# ---------------------------------------------------------------------------
# TF-IDF term scoring
# ---------------------------------------------------------------------------

import re as _re

_WORD_RE = _re.compile(r"[a-z0-9_]+")


def tfidf(
    docs: rd.Dataset, *, npart: int | None = None, max_doc_freq: int = 100_000
) -> rd.Dataset:
    """{doc_id, term, tf, df, tfidf_u} for every (document, term) pair.

    ``tfidf = tf * (ln((N+1)/(df+1)) + 1)`` (smoothed idf), quantized at
    1e-6 — ln() differs across libms by ulps, which the quantization
    absorbs.  Shape: per-row tokenization + within-row term counts (a doc is
    one row, so tf needs no shuffle), one bucketed aggregate for document
    frequencies (term cardinality scales with the corpus), one hash join to
    attach df back to the tf rows.  N (total docs) rides as a broadcast
    scalar.

    Terms with ``df > max_doc_freq`` are dropped BEFORE the tf⋈df join:
    the join hash-partitions by term, so a stop-word (df ≈ N) would land
    its entire tf row set on one partition — unbounded skew at corpus
    scale, for rows whose idf ≈ 0 anyway.  The oracle applies the same cut.
    """
    n_docs = docs.count()
    mdf = int(max_doc_freq)

    def tf_rows(b: pd.DataFrame) -> pd.DataFrame:
        # null text tokenizes to [] (findall yields NaN there, and
        # np.repeat(ids, NaN) / np.concatenate([]) both raise)
        toks = b["text"].fillna("").str.lower().str.findall(_WORD_RE)
        if len(b) == 0 or int(toks.str.len().sum()) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype=np.int64),
                    "term": pd.Series(dtype=object),
                    "tf": pd.Series(dtype=np.int64),
                }
            )
        out = pd.DataFrame(
            {"doc_id": np.repeat(b["doc_id"].to_numpy(), toks.str.len()), "term": np.concatenate([np.array(t, dtype=object) if t else np.array([], dtype=object) for t in toks])}
        )
        if len(out) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype=np.int64),
                    "term": pd.Series(dtype=object),
                    "tf": pd.Series(dtype=np.int64),
                }
            )
        return out.groupby(["doc_id", "term"], as_index=False, sort=False).size().rename(
            columns={"size": "tf"}
        )

    tf = docs.select_columns(["doc_id", "text"]).map_batches(
        tf_rows, batch_format="pandas", batch_size=512
    ).materialize()

    from ..stages.agg import bucketed_agg

    df = bucketed_agg(  # each (doc, term) row is unique -> count = doc freq
        tf, "term", {"df": (None, "count")}, types={"term": pa.string()}
    ).filter(expr=f"df <= {mdf}").materialize()  # stop-term prune (hot-key join skew armor)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        idf = np.log((n_docs + 1.0) / (b["df"].to_numpy() + 1.0)) + 1.0
        u = np.floor(b["tf"].to_numpy() * idf * 1e6 + 0.5).astype(np.int64)
        return pd.DataFrame(
            {"doc_id": b["doc_id"], "term": b["term"], "tf": b["tf"], "df": b["df"], "tfidf_u": u}
        )

    # the df side is the VOCABULARY (distinct surviving terms) — small until
    # the corpus is enormous.  Standard auto contract: broadcast it once and
    # attach df per batch (no join shuffle); hash join above the cap.
    from ..stages.joins import BROADCAST_MAX_ROWS

    if df.count() <= BROADCAST_MAX_ROWS:
        import ray

        ref = ray.put(df.to_pandas())

        def attach_and_score(b: pd.DataFrame) -> pd.DataFrame:
            d = ray.get(ref)
            if len(b) == 0 or "term" not in d.columns:
                return pd.DataFrame(
                    {
                        "doc_id": pd.Series(dtype=np.int64),
                        "term": pd.Series(dtype=object),
                        "tf": pd.Series(dtype=np.int64),
                        "df": pd.Series(dtype=np.int64),
                        "tfidf_u": pd.Series(dtype=np.int64),
                    }
                )
            idx = pd.Index(d["term"]).get_indexer(b["term"])
            keep = idx >= 0  # stop-pruned terms drop (inner-join semantics)
            b = b[keep].assign(df=d["df"].to_numpy()[idx[keep]])
            return score(b)

        return tf.map_batches(attach_and_score, batch_format="pandas")

    k = npart if npart is not None else _shuffle_fan()
    joined = tf.join(df, "inner", k, on=("term",))
    return joined.map_batches(score, batch_format="pandas")


# ---------------------------------------------------------------------------
# dedup clusters: near-dup pairs -> connected components -> keep-list
# ---------------------------------------------------------------------------


# below this many vertices AND pairs, dedup_clusters resolves the cluster
# graph with the in-process vectorized min-label kernel instead of a full
# partitioned-graph build + distributed CC (same capped-small-side contract
# as the broadcast joins; ~40 MB of driver arrays at the cap)
SMALL_CC_MAX_VERTICES = 5_000_000


def dedup_clusters(
    docs: rd.Dataset,
    *,
    threshold: float = 0.7,
    workdir: str | None = None,
    P: int | None = None,
    max_band_freq: int = 256,
) -> rd.Dataset:
    """{doc_id, cluster, keep}: transitive near-dup clusters over the verified
    MinHash pair graph, canonical representative = min doc_id per cluster
    (keep=1), everything else keep=0.

    Exact duplicates are collapsed FIRST: every doc maps to the min-doc_id
    representative of its identical-text group (one sha256 pass + a bucketed
    min + one hash join on the digest), LSH runs over representatives only,
    and members attach to their rep with star edges.  A 10k-copy exact-dup
    cluster therefore contributes 1 doc to the LSH and 10k-1 star edges —
    not 10k band rows that the ``max_band_freq`` cap would have to drop (and
    without the cap, 5*10^7 candidate pairs).  Cluster labels are unchanged:
    identical texts share signatures, so the rep-level pair (r1, r2) exists
    exactly when any cross pair (d1, d2) did, and min-vid labels agree
    because each rep is already its group's min doc_id.

    This is the full dedup loop — pairs alone under-remove (near-dup is
    transitive in practice) — and it composes the engine's own graph
    machinery: the pair table IS an edge table (doc ids are the dense vids),
    so clustering is ``connected_components`` over
    ``build_graph_from_edges`` (the Cypher-projection source), scale-safe by
    construction.  Singleton docs keep themselves."""
    import tempfile

    import ray

    from ..stages.joins import lookup_join
    from .components import connected_components
    from .graph_build import build_graph_from_edges

    n = docs.count()
    if P is None:
        # size the CC subgraph's partitioning to the session, like shuffle_fan
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        P = max(2, min(32, ncpu // 4))

    # doc -> exact-dup group map, DUPLICATED groups only (absence ==
    # singleton): ONE groupby shuffle whose output scales with duplication.
    k = _shuffle_fan()
    dups = exact_rep_map(docs, compact=True, n_docs=n).materialize()  # {doc_id, rep, m} m>=2

    star = dups.map_batches(
        lambda t: pa.table(
            {
                "src": t["doc_id"].cast(pa.int64()),
                "dst": t["rep"].cast(pa.int64()),
                "weight": pa.array(np.ones(t.num_rows, dtype=np.float64)),
            }
        ),
        batch_format="pyarrow",
    ).filter(expr="src != dst")

    # representatives' texts in one signed lookup: miss -> singleton rep,
    # 1 -> duplicated group's rep, -1 -> non-rep member (dropped)
    rep_flag = dups.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "isrep": pa.compute.if_else(
                    pa.compute.equal(t["doc_id"], t["rep"]),
                    pa.scalar(1, pa.int64()),
                    pa.scalar(-1, pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    if dups.count() == 0:
        # no exact duplicates at all: the signed lookup would keep every doc
        # (every probe misses -> default 1) — skip the join pass outright
        rep_docs = docs.select_columns(["doc_id", "text"])
    else:
        rep_docs = lookup_join(
            docs.select_columns(["doc_id", "text"]), rep_flag, "doc_id", "isrep",
            default=1, num_partitions=k,
        ).filter(expr="isrep == 1")

    pairs = minhash_dedup_pairs(
        rep_docs, threshold=threshold, max_band_freq=max_band_freq
    ).materialize()

    # small-side fast path (the usual capped-broadcast contract): under the
    # cap the whole edge set — verified pairs + star pointers — fits driver
    # arrays, and the vectorized min-label kernel (components.local_components)
    # resolves clusters in-process, skipping a full partitioned-graph build +
    # distributed CC (~4s of Dataset fixed costs at sf0.1).  Above the cap
    # the composition with the engine's own connected_components stands.
    n_pairs = pairs.count()
    if n <= SMALL_CC_MAX_VERTICES and n_pairs <= SMALL_CC_MAX_VERTICES:
        from .components import local_components

        # id universe straight from the docs table (the dup map no longer
        # carries singleton rows); any order, any magnitude — no dense-[0,n)
        # assumption
        ids = (
            docs.select_columns(["doc_id"]).to_pandas()["doc_id"].to_numpy(dtype=np.int64)
        )
        dpdf = dups.to_pandas()
        ppdf = pairs.to_pandas() if n_pairs else None
        if len(dpdf) and "doc_id" in dpdf.columns:
            src = dpdf["doc_id"].to_numpy(dtype=np.int64)
            dst = dpdf["rep"].to_numpy(dtype=np.int64)
        else:
            src = np.array([], dtype=np.int64)
            dst = np.array([], dtype=np.int64)
        if ppdf is not None and len(ppdf):
            src = np.concatenate([src, ppdf["id_a"].to_numpy(dtype=np.int64)])
            dst = np.concatenate([dst, ppdf["id_b"].to_numpy(dtype=np.int64)])
        cluster = ids.copy()  # singletons keep themselves
        if len(src):
            verts, roots = local_components(src, dst)
            order = np.argsort(ids)
            pos = order[np.searchsorted(ids[order], verts)]
            cluster[pos] = roots
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(ids),
                    "cluster": pa.array(cluster),
                    "keep": pa.array((cluster == ids).astype(np.int64)),
                }
            )
        )

    edges = pairs.map_batches(
        lambda t: pa.table(
            {
                "src": t["id_a"].cast(pa.int64()),
                "dst": t["id_b"].cast(pa.int64()),
                "weight": pa.array(np.ones(t.num_rows, dtype=np.float64)),
            }
        ),
        batch_format="pyarrow",
    ).union(star)

    # build_graph_from_edges requires dense vids in [0, n); doc ids are any
    # int64.  When they happen to be dense (the common synthetic-table case)
    # feed them straight through; otherwise rank them dense with the IdMap
    # loader (one global sort — stages/ids.py, the 10^12-key shape) and
    # translate edges out / labels back with the capped-broadcast lookups.
    id_min = docs.min("doc_id")
    id_max = docs.max("doc_id")
    dense = id_min == 0 and id_max == n - 1
    wd = workdir or tempfile.mkdtemp(prefix="dedup_cc_")
    if not dense:
        from ..stages.ids import assign_dense_ids
        from ..stages.joins import lookup_join

        vmap, nv = assign_dense_ids(
            docs.select_columns(["doc_id"]).map_batches(
                lambda t: pa.table({"key": t["doc_id"]}), batch_format="pyarrow"
            )
        )
        vmap = vmap.materialize()
        for col, tmp in (("src", "__svid"), ("dst", "__dvid")):
            side = vmap.map_batches(
                lambda t, c=col, o=tmp: pa.table({c: t["key"], o: t["vid"]}),
                batch_format="pyarrow",
            )
            edges = lookup_join(edges, side, col, tmp, default=-1)
        edges = edges.map_batches(
            lambda t: pa.table(
                {"src": t["__svid"], "dst": t["__dvid"], "weight": t["weight"]}
            ),
            batch_format="pyarrow",
        )
        g = build_graph_from_edges(edges, nv, wd, P=P)
        labels = connected_components(g).labels  # {vid, label}, label = min vid
        # vids ascend with doc_id (assign_dense_ids sorts), so min-vid labels
        # translate to min-doc_id clusters
        back = vmap.map_batches(
            lambda t: pa.table({"vid": t["vid"], "doc_id": t["key"]}),
            batch_format="pyarrow",
        )
        labels = lookup_join(labels, back, "vid", "doc_id", default=-1)
        back_l = vmap.map_batches(
            lambda t: pa.table({"label": t["vid"], "cluster": t["key"]}),
            batch_format="pyarrow",
        )
        labels = lookup_join(labels, back_l, "label", "cluster", default=-1)

        def out_sparse(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table(
                {
                    "doc_id": t["doc_id"].cast(pa.int64()),
                    "cluster": t["cluster"].cast(pa.int64()),
                    "keep": pc.equal(t["doc_id"], t["cluster"]).cast(pa.int64()),
                }
            )

        return labels.map_batches(out_sparse, batch_format="pyarrow")

    g = build_graph_from_edges(edges, n, wd, P=P)
    labels = connected_components(g).labels  # {vid, label}, label = min vid

    def out(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": t["vid"],
                "cluster": t["label"],
                "keep": pc.equal(t["vid"], t["label"]).cast(pa.int64()),
            }
        )

    return labels.map_batches(out, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# end-to-end prepared corpus (the composed training-data pipeline)
# ---------------------------------------------------------------------------


def prepared_corpus(
    docs: rd.Dataset,
    *,
    min_quality: int = 2,
    threshold: float = 0.7,
    keep_ids: rd.Dataset | None = None,
) -> rd.Dataset:
    """The composed data-prep pipeline a training run would consume:
    quality gate (``quality_scores >= min_quality``) ∩ near-dup keep-list
    (``dedup_clusters`` keepers) -> ``clean_text`` -> whitespace token count.
    Output {doc_id, clean, n_tokens}.

    Everything is a composition of this module's oracle-backed stages — two
    id-set joins and the cleaning map; no new kernels.  Pass ``keep_ids``
    (a ``{doc_id}`` Dataset) to reuse an existing ``dedup_clusters`` run's
    keeper list instead of recomputing the near-dup clustering."""
    q_ids = quality_scores(docs).map_batches(
        lambda b: b.loc[b["quality"] >= min_quality, ["doc_id"]], batch_format="pandas"
    )
    if keep_ids is None:
        keep_ids = dedup_clusters(docs, threshold=threshold).map_batches(
            lambda b: b.loc[b["keep"] == 1, ["doc_id"]], batch_format="pandas"
        )
    cleaned = clean_text(docs)
    k = _shuffle_fan()

    # id-set filters via lookup_join, NOT Dataset.join: the left side after
    # the quality gate can be sparse, and Ray 2.49's hash join raises
    # ArrowInvalid on partitions that receive zero left rows (the exact bug
    # stages/joins.coshuffle_lookup exists to avoid).  lookup_join
    # broadcasts small id sets and auto-falls-back above the cap.
    from ..stages.joins import lookup_join

    def _filter_by_ids(ds: rd.Dataset, ids: rd.Dataset) -> rd.Dataset:
        flag = ids.map_batches(
            lambda b: pd.DataFrame(
                {"doc_id": b["doc_id"], "__f": np.ones(len(b), dtype=np.int64)}
            ),
            batch_format="pandas",
        )
        tagged = lookup_join(ds, flag, "doc_id", "__f", default=0, num_partitions=k)
        return tagged.map_batches(
            lambda b: b.loc[b["__f"] == 1].drop(columns="__f"), batch_format="pandas"
        )

    out = _filter_by_ids(_filter_by_ids(cleaned, q_ids), keep_ids)

    def count_tokens(b: pd.DataFrame) -> pd.DataFrame:
        n = b["clean"].str.count(" ").fillna(0).astype(np.int64) + 1
        n[b["clean"].str.len() == 0] = 0  # collapsed text: tokens = spaces+1, 0 if empty
        return pd.DataFrame({"doc_id": b["doc_id"], "clean": b["clean"], "n_tokens": n})

    return out.map_batches(count_tokens, batch_format="pandas")


def stratified_sample(docs: rd.Dataset, *, per_group: int = 2, group: str = "lang", seed: str = "s7") -> rd.Dataset:
    """Deterministic k-per-group sample {group, doc_id, hs, rank}: rank each
    group's rows by a stable md5 hash score and keep the ``per_group``
    lowest — stratified sampling with no RNG state, reproducible across
    runs, partitionings and engines.  Pure composition: a hash-score map +
    ``topk_per_group`` (map-side prune, so the shuffle carries at most
    per_group x groups-per-block rows)."""
    from ..stages.agg import topk_per_group

    def score(b: pd.DataFrame) -> pd.DataFrame:
        h = T.hash_strings(((seed + "|") + b["doc_id"].astype(str)).tolist())
        return pd.DataFrame(
            {
                group: b[group],
                "doc_id": b["doc_id"],
                "hs": (h >> np.uint64(1)).astype(np.int64),
            }
        )

    return topk_per_group(
        docs.map_batches(score, batch_format="pandas"),
        group,
        "hs",
        per_group,
        id_col="doc_id",
        descending=False,
        types={group: pa.string(), "hs": pa.int64()},
    )
