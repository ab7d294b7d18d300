"""Dedup / text-analysis / similarity / multimodal pipeline tests (planted cases)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from neo4j_graph_algorithms_ray.functions import text as T
from neo4j_graph_algorithms_ray.pipelines import docs as D
from neo4j_graph_algorithms_ray.pipelines import multimodal as M
from neo4j_graph_algorithms_ray.pipelines import similarity as S


def _docs_table():
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far away "
        "into the deep green forest where many small animals live quietly"
    )
    near = base.replace("quick", "swift")  # one-word change -> high jaccard
    other = (
        "completely different content about database engines and vectorized execution "
        "plans with columnar storage formats adaptive radix indexes cost based "
        "optimizers pipelined operators morsel driven parallelism buffer managers "
        "write ahead logging multi version concurrency control and lock free data structures"
    )
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, near),  # near dup of 0
        (3, other),
        (4, other + " with a tiny suffix"),
        (5, "zz " * 40),
    ]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
        }
    )


def test_exact_dedup_groups():
    ds = rd.from_arrow(_docs_table())
    out = D.exact_dedup(ds).to_pandas()
    assert len(out) == 5  # 6 docs, one exact pair
    grp = out[out["n"] == 2]
    assert len(grp) == 1 and grp["doc_id"].iloc[0] == 0  # min doc_id representative


def test_minhash_finds_planted_near_dups():
    ds = rd.from_arrow(_docs_table())
    pairs = D.minhash_dedup_pairs(ds, threshold=0.5).to_pandas()
    found = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in found  # exact dup (jaccard 1.0)
    assert (0, 2) in found or (1, 2) in found  # near dup
    assert all(j >= 500_000 for j in pairs["jac_u"])
    assert not any({a, b} == {3, 5} for a, b in found)


def test_ngram_jaccard_exact_pairs():
    """Inverted-index Jaccard equals the direct pairwise kernel on all pairs."""
    tbl = _docs_table()
    ds = rd.from_arrow(tbl)
    got = D.ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    texts = {i: t for i, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())}
    ids = sorted(texts)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            j = T.jaccard_word_ngrams(texts[a], texts[b], 3)
            if j >= 0.5:
                want[(a, b)] = int(np.floor(j * 1e6 + 0.5))
    assert {(a, b): j for a, b, j in zip(got["id_a"], got["id_b"], got["jac_u"])} == want
    assert (0, 1) in want and want[(0, 1)] == 1_000_000  # exact dup


def test_ngram_jaccard_stop_gram_pruning():
    """Grams over the doc-freq cap are dropped from intersections (both the
    operator contract and the skew armor) — with the cap below the corpus
    dup-count, the planted dup pair disappears."""
    tbl = _docs_table()
    ds = rd.from_arrow(tbl)
    out = D.ngram_jaccard_pairs(ds, threshold=0.5, max_doc_freq=1).to_pandas()
    assert len(out) == 0  # every shared gram pruned at df cap 1


def test_simhash_pairs():
    ds = rd.from_arrow(_docs_table())
    sigs = D.simhash_signatures(ds).to_pandas()
    assert len(sigs) == 6
    by_id = dict(zip(sigs["doc_id"], sigs["simhash"]))
    assert by_id[0] == by_id[1]  # identical text -> identical signature
    pairs = D.simhash_near_pairs(ds, max_hamming=6).to_pandas()
    found = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in found
    assert (3, 4) in found  # suffix-only change -> few bit flips


def test_jaccard_kernel_symmetry():
    a, b = "one two three four five", "one two three four six"
    assert T.jaccard_word_ngrams(a, a) == 1.0
    assert 0 < T.jaccard_word_ngrams(a, b) < 1


def _megacluster_docs(n_copies: int = 320) -> pd.DataFrame:
    """A planted exact-dup mega-cluster LARGER than the LSH band cap (256),
    plus a near-dup of it and two unrelated singletons."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    near = base.replace("gamma", "gimel", 1)  # jaccard 0.77, 2 colliding bands
    rows = [(i, base) for i in range(n_copies)]
    rows += [
        (n_copies, near),
        (n_copies + 1, "totally different words about storage engines " * 4),
        (n_copies + 2, "another unrelated document on query planners " * 4),
    ]
    return pd.DataFrame(
        {"doc_id": pd.array([r[0] for r in rows], dtype="int64"), "text": [r[1] for r in rows]}
    )


def test_lsh_band_cap_bounds_megacluster_candidates():
    """VERDICT r02 #3: a (band, bh) bucket larger than max_band_freq is
    dropped on BOTH engine and oracle sides — the raw pair query stays
    bounded instead of emitting s²/2 pairs."""
    import duckdb

    from neo4j_graph_algorithms_ray import oracles as O

    df = _megacluster_docs()
    ds = rd.from_pandas(df)
    cands = D.minhash_candidate_pairs(ds).to_pandas()
    # 321 docs share every band (group size > 256 cap) -> all dropped
    assert len(cands) < 321 * 320 // 2
    pairs = D.minhash_dedup_pairs(ds, threshold=0.5).to_pandas()
    con = duckdb.connect()
    con.register("documents", df)
    sdf = con.sql(O.minhash_pairs_sql(threshold=0.5)).df()
    got = sorted(zip(pairs["id_a"], pairs["id_b"], pairs["jac_u"])) if len(pairs) else []
    want = sorted(zip(sdf["id_a"], sdf["id_b"], sdf["jac_u"])) if len(sdf) else []
    assert got == want


def test_minhash_verify_byte_cap_falls_back_to_joins(monkeypatch):
    """VERDICT r02 #4: when the candidate texts exceed the broadcast byte
    budget, the verify step must switch to the distributed-join path and
    produce identical pairs."""
    ds = rd.from_arrow(_docs_table())
    want = D.minhash_dedup_pairs(ds, threshold=0.5).to_pandas()
    monkeypatch.setattr(D, "BROADCAST_MAX_TEXT_BYTES", 10)  # force the fallback
    got = D.minhash_dedup_pairs(ds, threshold=0.5).to_pandas()
    key = lambda df: sorted(zip(df["id_a"], df["id_b"], df["jac_u"]))
    assert key(got) == key(want) and len(want) > 0


def test_dedup_clusters_megacluster_matches_oracle(tmp_path):
    """Exact dupes collapse to their representative before LSH, so the
    320-copy cluster costs 1 LSH doc + 319 star edges and the full cluster
    (incl. the near-dup) still resolves — identically to the SQL oracle."""
    import duckdb

    from neo4j_graph_algorithms_ray import oracles as O

    df = _megacluster_docs()
    ds = rd.from_pandas(df)
    out = (
        D.dedup_clusters(ds, threshold=0.5, workdir=str(tmp_path / "cc"))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n = 320
    assert (out.loc[out["doc_id"] <= n, "cluster"] == 0).all()  # copies + near-dup
    assert int(out["keep"].sum()) == 3  # {0..320}, {321}, {322}
    con = duckdb.connect()
    con.register("documents", df)
    sdf = (
        con.sql(O.dedup_clusters_sql(threshold=0.5))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("doc_id", "cluster", "keep"):
        assert (out[c].to_numpy().astype(np.int64) == sdf[c].to_numpy().astype(np.int64)).all(), c


def test_dedup_clusters_distributed_path_matches_small_path(tmp_path, monkeypatch):
    """Forcing the partitioned-graph + distributed-CC path (cap=0) must give
    the same clusters as the in-process small-side kernel."""
    df = _megacluster_docs(n_copies=40)
    ds = rd.from_pandas(df)
    small = D.dedup_clusters(ds, threshold=0.5).to_pandas().sort_values("doc_id")
    monkeypatch.setattr(D, "SMALL_CC_MAX_VERTICES", 0)
    big = (
        D.dedup_clusters(ds, threshold=0.5, workdir=str(tmp_path / "cc2"))
        .to_pandas()
        .sort_values("doc_id")
    )
    for c in ("doc_id", "cluster", "keep"):
        assert (small[c].to_numpy() == big[c].to_numpy()).all(), c


def test_knn_bruteforce_recall_vs_numpy():
    rng = np.random.default_rng(3)
    emb = rng.normal(size=(200, 16)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(200), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in emb], pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(tbl)
    qids = np.arange(3)
    Q = emb[:3].astype(np.float64)
    Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    out = S.knn_bruteforce(ds, qids, Q, k=5).to_pandas()
    # numpy oracle
    M_ = emb.astype(np.float64)
    M_ = M_ / np.linalg.norm(M_, axis=1, keepdims=True)
    cos = M_ @ Q.T
    for qi in range(3):
        got = set(out[out["query_id"] == qi]["vec_id"])
        cos_u = np.floor(cos[:, qi] * 1e6).astype(np.int64)
        order = np.lexsort((np.arange(200), -cos_u))[:5]
        assert got == set(order.tolist())
    # self is always the top hit
    top = out.sort_values(["query_id", "cos_u"], ascending=[True, False]).groupby("query_id").head(1)
    assert (top["vec_id"].to_numpy() == qids).all()


def test_knn_ivf_recall():
    sf = "/root/testdata/sf0.001"
    qids, Q = S.load_queries(sf, 5)
    bf = S.knn_bruteforce(S.read_embeddings(sf), qids, Q, k=10).to_pandas()
    ivf = S.knn_ivf(S.read_embeddings(sf), qids, Q, k=10, n_centroids=8, nprobe=4).to_pandas()
    recalls = []
    for q in qids:
        b = set(bf[bf["query_id"] == q]["vec_id"])
        i = set(ivf[ivf["query_id"] == q]["vec_id"])
        recalls.append(len(b & i) / len(b))
    assert np.mean(recalls) >= 0.5  # nprobe=4/8 buckets: decent recall


def test_multimodal_roundtrip():
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()), "text": pa.array(["hello world", "abc"])})
    )
    binr = M.attach_binary_payload(docs)
    meta = M.decode_metadata(binr).to_pandas().sort_values("doc_id")
    assert meta["n_bytes"].tolist() == [8 + 11, 8 + 3]
    assert meta["width"].tolist() == [16 + 11 % 64, 16 + 3 % 64]
    frames = M.frame_sample(M.decode_metadata(binr), every=2).to_pandas()
    assert (frames["frame"] % 2 == 0).all()
    # "hello world" -> 11 bytes -> n_frames = 1 + 11 % 8 = 4 -> frames 0, 2
    assert sorted(frames[frames["doc_id"] == 1]["frame"]) == [0, 2]
    with pytest.raises(NotImplementedError):
        M.DecodeStage(real=True)


def test_multimodal_feature_extract():
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array(["Ab1 \tz"])})
    )
    f = M.feature_extract(M.attach_binary_payload(docs)).to_pandas().sort_values("dim")
    # "Ab1 \tz": lower 2 (b,z), upper 1 (A), digit 1, whitespace 2, other 0, non-ascii 0
    assert f["n"].tolist() == [2, 1, 1, 2, 0, 0]
    assert f["feat_u"].tolist() == [
        int(np.floor(c / 6 * 1e6 + 0.5)) for c in (2, 1, 1, 2, 0, 0)
    ]
    with pytest.raises(NotImplementedError):
        M.FeatureStage(real=True)


def test_token_counts_and_quality_kernels():
    s = pd.Series(["the cat, and THE dog!", ""])
    assert T.count_matches(s, T.WS_TOKEN_RE).tolist() == [5, 0]
    assert T.count_matches(s.str.lower(), T.STOPWORD_RE).tolist() == [3, 0]
    pred = T.lang_predict(pd.Series(["the cat and the dog is here", "der hund und die katze ist", "xyz"]))
    assert pred.tolist() == ["en", "de", "unknown"]


def test_embedding_near_dups_blocker():
    """Bucketed cosine near-dup: exact within probed buckets, planted dup found."""
    import numpy as np
    import ray.data as rd

    from neo4j_graph_algorithms_ray.pipelines.similarity import embedding_near_dup_pairs

    rng = np.random.Generator(np.random.Philox(key=[7, 0]))
    base = rng.normal(size=(80, 16)).astype(np.float32)
    base[50] = base[20] + rng.normal(scale=0.01, size=16).astype(np.float32)  # planted
    ds = rd.from_pandas(
        __import__("pandas").DataFrame(
            {"vec_id": np.arange(80, dtype=np.int64), "embedding": list(base)}
        )
    )
    pairs = embedding_near_dup_pairs(ds, threshold=0.95, n_centroids=8, nprobe=2).to_pandas()
    found = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (20, 50) in found
    # every reported pair really clears the threshold (exact verify)
    M = base / np.linalg.norm(base, axis=1, keepdims=True)
    for a, b in found:
        assert np.floor(float(M[a] @ M[b]) * 1e6 + 0.5) >= np.floor(0.95 * 1e6 + 0.5)


def test_embedding_near_dups_big_ids():
    """vec_ids above 2^31 take the two-key pair dedup (packing would collide)."""
    import numpy as np
    import ray.data as rd

    from neo4j_graph_algorithms_ray.pipelines.similarity import embedding_near_dup_pairs

    rng = np.random.Generator(np.random.Philox(key=[7, 0]))
    base = rng.normal(size=(80, 16)).astype(np.float32)
    base[50] = base[20] + rng.normal(scale=0.01, size=16).astype(np.float32)
    OFF = 3_000_000_000  # > 2^31
    ds = rd.from_pandas(
        __import__("pandas").DataFrame(
            {"vec_id": np.arange(80, dtype=np.int64) + OFF, "embedding": list(base)}
        )
    )
    pairs = embedding_near_dup_pairs(ds, threshold=0.95, n_centroids=8, nprobe=2).to_pandas()
    found = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (20 + OFF, 50 + OFF) in found
    assert all(a < b for a, b in found)
    # one row per pair even when surfaced by multiple probed buckets
    assert len(found) == len(pairs)


def test_real_decode_is_gated_on_pillow():
    """real=True loads Pillow once per actor; without it, pool construction
    fails loudly with NotImplementedError.  When Pillow IS present, a real
    PNG decodes to its true dimensions (skipped in codec-free containers)."""
    import importlib.util

    has_pil = importlib.util.find_spec("PIL") is not None
    if not has_pil:
        with pytest.raises(NotImplementedError, match="Pillow"):
            M.DecodeStage(real=True)
        return
    # Pillow available: decode a real 5x3 PNG through the actor stage kernel
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (5, 3), color=128).save(buf, format="PNG")
    raw = buf.getvalue()
    t = pa.table({"doc_id": pa.array([7], pa.int64()), "payload": pa.array([raw], pa.binary())})
    out = M.DecodeStage(real=True)(t)
    assert out["width"].to_pylist() == [5] and out["height"].to_pylist() == [3]
    assert out["n_frames"].to_pylist() == [1] and out["n_bytes"].to_pylist() == [len(raw)]


def test_dedup_clusters_sparse_ids_both_paths(tmp_path, monkeypatch):
    """doc_ids need not be dense [0, n): offset/gapped ids resolve to the
    same clusters (relabeled) on BOTH the in-process fast path and the
    distributed path, which dense-ranks ids via assign_dense_ids first."""
    df = _megacluster_docs(n_copies=40)
    base = D.dedup_clusters(rd.from_pandas(df), threshold=0.5).to_pandas()
    base = base.sort_values("doc_id").reset_index(drop=True)

    OFF = 7_000_000_001  # far beyond the row count, and non-contiguous
    sp = df.copy()
    sp["doc_id"] = sp["doc_id"].to_numpy() * 3 + OFF
    relabel = lambda v: v * 3 + OFF

    fast = (
        D.dedup_clusters(rd.from_pandas(sp), threshold=0.5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (fast["doc_id"].to_numpy() == relabel(base["doc_id"].to_numpy())).all()
    assert (fast["cluster"].to_numpy() == relabel(base["cluster"].to_numpy())).all()
    assert (fast["keep"].to_numpy() == base["keep"].to_numpy()).all()

    monkeypatch.setattr(D, "SMALL_CC_MAX_VERTICES", 0)
    dist = (
        D.dedup_clusters(rd.from_pandas(sp), threshold=0.5, workdir=str(tmp_path / "cc3"))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("doc_id", "cluster", "keep"):
        assert (dist[c].to_numpy() == fast[c].to_numpy()).all(), c


def _dup_heavy_docs(n_texts: int = 20, copies: int = 6) -> pd.DataFrame:
    rng = np.random.Generator(np.random.Philox(key=[3, 0]))
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows, did = [], 0
    for _ in range(n_texts):
        t = " ".join(words[int(x)] for x in rng.integers(0, 10, 25))
        for _ in range(copies):
            rows.append((did, t))
            did += 1
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_exact_rep_map_both_paths():
    """The dup-only group map is identical on the broadcast and the digest
    co-shuffle path (cap=0), and empty on an all-unique corpus."""
    df = _dup_heavy_docs(n_texts=8, copies=3)
    want = (
        D.exact_rep_map(rd.from_pandas(df))
        .to_pandas()
        .sort_values(["rep", "doc_id"])
        .reset_index(drop=True)
    )
    assert len(want) == 24 and (want["m"] == 3).all()
    assert (want.groupby("rep")["doc_id"].min().to_numpy() == want["rep"].unique()).all()
    got = (
        D.exact_rep_map(rd.from_pandas(df), cap=0)
        .to_pandas()
        .sort_values(["rep", "doc_id"])
        .reset_index(drop=True)
    )
    for c in ("doc_id", "rep", "m"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    uniq = pd.DataFrame({"doc_id": [1, 2], "text": ["aa bb cc", "dd ee ff"]})
    assert D.exact_rep_map(rd.from_pandas(uniq)).count() == 0


def test_ngram_jaccard_explicit_collapse_matches_auto():
    """collapse=True / collapse=False / auto all produce identical pairs
    (auto picks collapse=True here: 100% of docs are duplicated)."""
    df = _dup_heavy_docs(n_texts=6, copies=4)

    def run(**kw):
        return (
            D.ngram_jaccard_pairs(rd.from_pandas(df), threshold=0.2, **kw)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )

    auto, on, off = run(), run(collapse=True), run(collapse=False)
    assert len(auto) > 0
    for other in (on, off):
        assert len(other) == len(auto)
        for c in ("id_a", "id_b", "jac_u"):
            assert (other[c].to_numpy() == auto[c].to_numpy()).all(), c

    # dup-FREE near-dup corpus: collapse=True flows an EMPTY member map
    # through the collapse branch (every rep a singleton) — identity expand
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = []
    for i in range(8):
        w = base.split()
        w[3] = f"cat{i}"
        rows.append((i, " ".join(w)))
    df2 = pd.DataFrame(rows, columns=["doc_id", "text"])

    def run2(**kw):
        return (
            D.ngram_jaccard_pairs(rd.from_pandas(df2), threshold=0.2, **kw)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )

    a2, on2 = run2(), run2(collapse=True)
    assert len(a2) == 28  # C(8,2): every pair of one-word-apart texts
    assert len(on2) == 28
    for c in ("id_a", "id_b", "jac_u"):
        assert (on2[c].to_numpy() == a2[c].to_numpy()).all(), c


def test_ngram_jaccard_dup_heavy_vs_oracle(monkeypatch):
    """Exact-dup rep collapse preserves the output exactly: a corpus where
    every text has 6 identical copies matches the DuckDB oracle — including
    intra-group pairs, weighted stop-gram pruning, and the distributed
    (cap=0) expansion path."""
    import duckdb

    from neo4j_graph_algorithms_ray import oracles as O

    df = _dup_heavy_docs()

    def oracle(thr, mdf):
        con = duckdb.connect()
        con.register("documents", df)
        return (
            con.execute(O.ngram_jaccard_sql(threshold=thr, max_doc_freq=mdf))
            .df()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )

    def engine(thr, mdf):
        got = D.ngram_jaccard_pairs(
            rd.from_pandas(df), threshold=thr, max_doc_freq=mdf
        ).to_pandas()
        return got.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    for thr, mdf in [(0.3, 256), (0.1, 20)]:  # mdf=20 < 6*df: pruning bites
        want = oracle(thr, mdf)
        got = engine(thr, mdf)
        assert len(got) == len(want), (thr, mdf)
        for c in ("id_a", "id_b", "jac_u"):
            assert (got[c].to_numpy() == want[c].to_numpy()).all(), (thr, mdf, c)

    # distributed expansion (broadcast cap forced to 0): identical output
    orig = D._expand_rep_pairs

    def patched(rp, intra, dmap, **kw):
        kw["cap"] = 0
        return orig(rp, intra, dmap, **kw)

    monkeypatch.setattr(D, "_expand_rep_pairs", patched)
    want = oracle(0.3, 256)
    got = engine(0.3, 256)
    assert len(got) == len(want)
    for c in ("id_a", "id_b", "jac_u"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_pair_dedup_big_ids(monkeypatch, tmp_path):
    """Pair dedup above 2^31 ids: minhash takes the two-key aggregate on the
    join path (packing would collide), ngram fails loudly."""
    import pytest

    df = _megacluster_docs(n_copies=10)
    OFF = 3_000_000_000  # > 2^31
    sp = df.copy()
    sp["doc_id"] = sp["doc_id"].to_numpy() + OFF

    base = (
        D.minhash_dedup_pairs(rd.from_pandas(df), threshold=0.5)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    # force the distributed-join verify path so the pair dedup stage runs
    monkeypatch.setattr(D, "BROADCAST_MAX_PAIRS", 0)
    big = (
        D.minhash_dedup_pairs(rd.from_pandas(sp), threshold=0.5)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert (big["id_a"].to_numpy() == base["id_a"].to_numpy() + OFF).all()
    assert (big["id_b"].to_numpy() == base["id_b"].to_numpy() + OFF).all()
    assert (big["jac_u"].to_numpy() == base["jac_u"].to_numpy()).all()

    with pytest.raises(Exception, match="2\\^31"):
        D.ngram_jaccard_pairs(rd.from_pandas(sp), threshold=0.3).materialize()


# ---------------------------------------------------------------------------
# prefix-filtered ngram route (All-Pairs/PPJoin candidate generation)
# ---------------------------------------------------------------------------


def _prefix_route_corpus(seed=7, n=250, vocab_n=40):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(vocab_n)]
    rows = []
    for i in range(n):
        m = int(rng.integers(4, 30))
        rows.append((i, " ".join(rng.choice(vocab, m))))
    for j in range(40):  # planted exact dups (collapse branch)
        rows.append((n + j, rows[j][1]))
    for j in range(15):  # planted near dups
        base = rows[j][1].split()
        base[0] = "zzz"
        rows.append((n + 40 + j, " ".join(base)))
    rows.append((n + 60, None))
    rows.append((n + 61, ""))
    rows.append((n + 62, "a b"))  # single-gram doc (alpha_pair <= 1 pairs)
    rows.append((n + 63, "a b"))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _norm_pairs(df):
    if len(df) == 0:
        return pd.DataFrame(
            {"id_a": [], "id_b": [], "jac_u": []}, dtype="int64"
        )
    return (
        df[["id_a", "id_b", "jac_u"]]
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
        .astype("int64")
    )


@pytest.mark.parametrize("thr", [0.2, 0.5, 0.9])
@pytest.mark.parametrize("mdf", [256, 3])
def test_ngram_prefix_route_matches_counting_index(ray_session, thr, mdf):
    """The prefix route (extended prefix + positional + length + witness
    filters, CSR verify) is EXACT: identical output to the counting index
    across thresholds, df caps, and both collapse branches."""
    df = _prefix_route_corpus()
    for coll in (None, False):
        a = _norm_pairs(
            D.ngram_jaccard_pairs(
                rd.from_pandas(df), threshold=thr, max_doc_freq=mdf,
                collapse=coll, method="count",
            ).to_pandas()
        )
        b = _norm_pairs(
            D.ngram_jaccard_pairs(
                rd.from_pandas(df), threshold=thr, max_doc_freq=mdf,
                collapse=coll, method="prefix",
            ).to_pandas()
        )
        pd.testing.assert_frame_equal(a, b)
        assert len(a) > 0 or thr > 0.8  # planted dups surface


def test_ngram_prefix_single_witness_pairs_survive(ray_session):
    """Pairs whose required overlap alpha_pair is 1 (tiny docs / low
    threshold) must NOT be killed by the two-witness prefilter."""
    df = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["a b", "a b", "c d e f g h i j"]}
    )
    out = _norm_pairs(
        D.ngram_jaccard_pairs(
            rd.from_pandas(df), threshold=0.5, method="prefix", collapse=False
        ).to_pandas()
    )
    assert list(map(tuple, out.to_numpy())) == [(0, 1, 1_000_000)]


def test_ngram_auto_routes_by_gram_bound(ray_session, monkeypatch):
    """auto == prefix under the gram-row gate, counting index above it."""
    import neo4j_graph_algorithms_ray.pipelines.docs as docs_mod

    df = _prefix_route_corpus()
    want = _norm_pairs(
        D.ngram_jaccard_pairs(
            rd.from_pandas(df), threshold=0.5, method="count"
        ).to_pandas()
    )
    monkeypatch.setattr(docs_mod, "NGRAM_PREFIX_MAX_GRAM_ROWS", 1)
    got = _norm_pairs(
        D.ngram_jaccard_pairs(
            rd.from_pandas(df), threshold=0.5, method="auto"
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(want, got)
    with pytest.raises(ValueError, match="unknown method"):
        D.ngram_jaccard_pairs(rd.from_pandas(df), method="bogus")


def test_minhash_mersenne_fold_equals_modulo():
    """The shift-fold permutation kernel is bit-identical to plain % M
    (the DuckDB oracle replays % M with the same constants)."""
    mh = T.MinHasher(num_perm=16)
    M = T.MINHASH_PRIME
    rng = np.random.default_rng(3)
    H = np.concatenate(
        [
            rng.integers(0, 2**64 - 1, size=5000, dtype=np.uint64),
            np.array([0, 1, M - 1, M, M + 1, 2**63, 2**64 - 1], dtype=np.uint64),
        ]
    )
    x = H % M
    want = (x[:, None] * mh.a[None, :] + mh.b[None, :]) % M
    # drive through the public kernel: one "doc" per hash via signature()
    got = np.stack([mh.signature(np.array([h], dtype=np.uint64)) for h in H[:64]])
    assert np.array_equal(got, want[:64])
    # and the batched path end-to-end on real text
    texts = ["alpha beta gamma delta", "beta gamma delta epsilon", None, ""]
    sigs = mh.batch_signatures(texts, 3)
    Hh, c = T.batch_shingle_hashes(texts, 3)
    off = 0
    for i, n in enumerate(c):
        assert np.array_equal(sigs[i], mh.signature(Hh[off : off + n]))
        off += n


def test_exact_rep_map_gather_fast_path_matches_aggregate():
    """The one-pass digest-gather fast path (default, small corpora) agrees
    with the aggregate+broadcast path (cap pinned high) and the digest
    co-shuffle path (cap=0), including null texts folding to one group."""
    df = _dup_heavy_docs(n_texts=6, copies=3)
    # plant nulls (one dup group of two) and a unique doc
    extra = pd.DataFrame(
        {"doc_id": [900, 901, 902], "text": [None, None, "only once here"]}
    )
    df = pd.concat([df, extra], ignore_index=True)

    def run(**kw):
        return (
            D.exact_rep_map(rd.from_pandas(df), **kw)
            .to_pandas()
            .sort_values(["rep", "doc_id"])
            .reset_index(drop=True)
        )

    fast = run()  # gather fast path (no cap, no dedup)
    agg = run(cap=10_000)  # aggregate pass + broadcast membership
    cosh = run(cap=0)  # aggregate pass + digest co-shuffle membership
    assert len(fast) == 6 * 3 + 2  # dup groups + the null pair
    null_rows = fast[fast["rep"] == 900]
    assert sorted(null_rows["doc_id"]) == [900, 901] and (null_rows["m"] == 2).all()
    for other in (agg, cosh):
        for c in ("doc_id", "rep", "m"):
            assert (fast[c].to_numpy() == other[c].to_numpy()).all(), c


def test_ngram_fused_decision_matches_forced_paths():
    """collapse=None (fused decision gather) produces identical pairs to
    explicitly forced collapse=True and collapse=False on a corpus where
    the decision picks collapse, and on one where it does not."""
    rng = np.random.default_rng(11)

    def corpus(n_uniq, copies):
        texts = [
            " ".join(f"w{rng.integers(0, 10**9)}" for _ in range(10))
            for _ in range(n_uniq)
        ] * copies
        return pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )

    for df in (corpus(40, 3), corpus(120, 1)):
        outs = {}
        for mode in (None, True, False):
            p = D.ngram_jaccard_pairs(
                rd.from_pandas(df), threshold=0.5, collapse=mode
            ).to_pandas()
            if "id_a" not in p.columns:  # empty Dataset -> zero-column frame
                p = pd.DataFrame(
                    {"id_a": [], "id_b": [], "jac_u": []}, dtype=np.int64
                )
            outs[mode] = p.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        for mode in (True, False):
            assert outs[None].shape == outs[mode].shape
            for c in ("id_a", "id_b", "jac_u"):
                assert (outs[None][c].to_numpy() == outs[mode][c].to_numpy()).all(), c


def test_ngram_sharded_kept_kernel_matches_inline(monkeypatch):
    """Forcing the P > 1 doc-sharded kept-kernel path (shard threshold
    monkeypatched down) yields pairs identical to the inline P == 1 path."""
    rng = np.random.default_rng(23)
    seq = [f"tok{int(v)}" for v in rng.integers(0, 10**6, 400)]
    # overlapping 14-token windows: consecutive docs share 12 tokens -> the
    # corpus has plenty of qualifying pairs at threshold 0.3
    texts = [" ".join(seq[i * 2 : i * 2 + 14]) for i in range(150)]
    df = pd.DataFrame({"doc_id": np.arange(150, dtype=np.int64), "text": texts})

    def run():
        p = D.ngram_jaccard_pairs(
            rd.from_pandas(df), threshold=0.3, collapse=False, method="prefix"
        ).to_pandas()
        if "id_a" not in p.columns:
            p = pd.DataFrame({"id_a": [], "id_b": [], "jac_u": []}, dtype=np.int64)
        return p.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    inline = run()
    monkeypatch.setattr(D, "NGRAM_SHARD_MIN_ROWS", 64)  # ~1.9k gram rows -> many shards
    sharded = run()
    assert inline.shape == sharded.shape and len(inline) > 0
    for c in ("id_a", "id_b", "jac_u"):
        assert (inline[c].to_numpy() == sharded[c].to_numpy()).all(), c
