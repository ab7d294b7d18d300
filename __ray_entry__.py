"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing in
here (or the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()`` — flagship pipeline: build the link graph from the sf0.001
  synthetic corpus and run PageRank to 1e-6 convergence.
- ``queries()`` — one entry per implemented operator/pipeline (SURVEY.md §2 +
  the training-data ops); each callable takes ``sf_dir``.  Same-schema
  algorithm variants are merged into one tag-column query (the driver
  records at most 50 CORRECTNESS rows per round), 50 entries total.
- ``oracle_sql()`` — a DuckDB-equivalent SQL string for EVERY query (50/50):
  graph queries run on the deterministic synthetic corpus for the tier
  (generated/cached under /tmp — the SQL reads the same Parquet); iterative
  algorithms use recursive/unrolled CTEs; sketches use md5-based
  SQL-replayable kernels; the static catalog is a VALUES table.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from neo4j_graph_algorithms_ray.sources.readers import (  # noqa: E402
    from_pandas_clean as _fpc,
    read_parquet_clean as _rpc,
)

# Ray workers resolve this package through exactly one propagated path
# entry: the driver's cwd.  When the driver runs from elsewhere, ship
# PYTHONPATH to every UDF stage / shard actor via per-task runtime_env
# (see portability.py — code-by-value cannot cover module-alias globals,
# which always pickle by reference).  No-op when cwd == repo.
from neo4j_graph_algorithms_ray.portability import (  # noqa: E402
    install_dataset_portability as _install_portability,
)

_install_portability()

# correctness tier the driver compares at; oracle SQL embeds this tier's corpus
_ORACLE_SF = "/root/testdata/sf0.01"


def entry() -> Any:
    """PageRank over the import graph of the sf0.001 corpus (scores + keys)."""
    from neo4j_graph_algorithms_ray.pipelines.graph_queries import graph_for_sf
    from neo4j_graph_algorithms_ray.pipelines.pagerank import pagerank, pagerank_scores_with_keys

    g = graph_for_sf("/root/testdata/sf0.001")
    res = pagerank(g, tol=1e-6)
    return pagerank_scores_with_keys(g, res).to_pandas()


def _intize(df, cols, scale=1000):
    import numpy as np

    for c in cols:
        df[c] = np.floor(df[c].to_numpy() * scale + 0.5).astype("int64")
    return df


# dedup_clusters backs two driver queries (its own row and prepared_corpus's
# keep-list) — memoize the materialized result per tier, like graph_queries'
# _MEMO for cc/triangles
_DEDUP_MEMO: dict = {}


def _dedup_clusters_memo(sf):
    if sf not in _DEDUP_MEMO:
        from neo4j_graph_algorithms_ray.pipelines import docs as D

        _DEDUP_MEMO[sf] = D.dedup_clusters(D.read_documents(sf)).to_pandas()
    # copy: the caller owns the returned frame (the driver may post-process
    # in place), and _dedup_keepers re-reads the cached one later — handing
    # out the memoized object would let a caller mutation corrupt the
    # prepared_corpus keep-list
    return _DEDUP_MEMO[sf].copy()


def _dedup_keepers(sf):

    df = _dedup_clusters_memo(sf)
    return _fpc(df.loc[df["keep"] == 1, ["doc_id"]].reset_index(drop=True))


def queries() -> dict[str, Callable[[str], Any]]:
    from neo4j_graph_algorithms_ray.pipelines import docs as D
    from neo4j_graph_algorithms_ray.pipelines import graph_queries as G
    from neo4j_graph_algorithms_ray.pipelines import multimodal as M
    from neo4j_graph_algorithms_ray.pipelines import relational as R
    from neo4j_graph_algorithms_ray.pipelines import similarity as S

    def lineitem_summary(sf):
        df = R.lineitem_pricing_summary(sf).to_pandas()
        df = _intize(df, ["sum_qty", "sum_base_price", "sum_revenue"], 1000)
        df = _intize(df, ["avg_disc"], 1_000_000)
        return df

    def topk_customers(sf):
        df = R.top_customers(sf).to_pandas()
        return _intize(df, ["total_spend"], 1000)

    def events_hourly(sf):
        df = R.events_hourly(sf).to_pandas()
        return _intize(df, ["sum_value"], 1000)

    def sessions(sf):
        import os as _os

        from neo4j_graph_algorithms_ray.pipelines import temporal as Tm

        ev = _rpc(
            _os.path.join(sf, "events.parquet"), columns=["user_id", "ts", "value"]
        )
        # base path UNION hot-key time split (time_chunk_us) — identical
        # outputs by contract, both oracle-verified via the variant tag
        import pandas as _pd

        a = Tm.sessionize(ev).to_pandas()
        a["variant"] = "base"
        b = Tm.sessionize(ev, time_chunk_us=86_400_000_000).to_pandas()
        b["variant"] = "chunked"
        return _intize(_pd.concat([a, b], ignore_index=True), ["sum_value"], 1000)

    def events_asof_orders(sf):
        import os as _os


        from neo4j_graph_algorithms_ray.pipelines import temporal as Tm

        ev = _rpc(
            _os.path.join(sf, "events.parquet"), columns=["event_id", "user_id", "ts"]
        )
        orders = _rpc(
            _os.path.join(sf, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        )
        import pandas as _pd

        kw = dict(
            left_key="user_id",
            left_ts="ts",
            right_key="o_custkey",
            right_ts="o_orderdate",
            left_cols={"event_id": ("event_id", "int64")},
            right_cols={
                "o_orderkey": ("o_orderkey", "int64"),
                "o_totalprice": ("o_totalprice", "float64"),
            },
            right_tiebreak="o_orderkey",
        )
        a = Tm.asof_join(ev, orders, **kw).to_pandas()
        a["variant"] = "base"
        # 30-day chunks: the carry-in cascade supplies cross-chunk history
        b = Tm.asof_join(ev, orders, **kw, time_chunk_us=30 * 86_400_000_000).to_pandas()
        b["variant"] = "chunked"
        return _intize(_pd.concat([a, b], ignore_index=True), ["o_totalprice"], 1000)

    def events_sliding(sf):
        import os as _os


        from neo4j_graph_algorithms_ray.pipelines import temporal as Tm

        ev = _rpc(
            _os.path.join(sf, "events.parquet"), columns=["event_id", "user_id", "ts", "value"]
        )
        import pandas as _pd

        a = Tm.sliding_window_agg(ev, window_us=3_600_000_000).to_pandas()
        a["variant"] = "base"
        b = Tm.sliding_window_agg(
            ev, window_us=3_600_000_000, time_chunk_us=86_400_000_000
        ).to_pandas()
        b["variant"] = "chunked"
        return _pd.concat([a, b], ignore_index=True)

    def top_events_per_user(sf):
        import os as _os


        from neo4j_graph_algorithms_ray.stages.agg import topk_per_group

        ev = _rpc(
            _os.path.join(sf, "events.parquet"), columns=["event_id", "user_id", "value"]
        )
        df = topk_per_group(ev, "user_id", "value", 3, id_col="event_id").to_pandas()
        return _intize(df, ["value"], 1_000_000)

    def events_range_selfjoin(sf):
        import os as _os


        from neo4j_graph_algorithms_ray.pipelines import temporal as Tm

        ev = _rpc(
            _os.path.join(sf, "events.parquet"), columns=["event_id", "user_id", "ts"]
        )
        import pandas as _pd

        kw = dict(
            left_key="user_id",
            left_ts="ts",
            right_key="user_id",
            right_ts="ts",
            left_id="event_id",
            right_id="event_id",
            left_out="eid_a",
            right_out="eid_b",
            lookback_us=3_600_000_000,  # same-user events in the prior hour
        )
        a = Tm.range_join(ev, ev, **kw).to_pandas()
        a["variant"] = "base"
        b = Tm.range_join(ev, ev, **kw, time_chunk_us=86_400_000_000).to_pandas()
        b["variant"] = "chunked"
        return _pd.concat([a, b], ignore_index=True)

    def knn_merged(sf):
        """Brute-force and IVF top-k as one method-tagged table (both return
        {query_id, vec_id, cos_u}; IVF must agree with brute force at this
        nprobe on the synthetic corpus)."""
        import pandas as _pd

        qids, Q = S.load_queries(sf, 5)
        a = S.knn_bruteforce(S.read_embeddings(sf), qids, Q, k=10).to_pandas()
        b = S.knn_ivf(S.read_embeddings(sf), qids, Q, k=10).to_pandas()
        return _pd.concat(
            [a.assign(method="brute"), b.assign(method="ivf")], ignore_index=True
        )

    def embedding_near_dups(sf):
        # synthetic embeddings are near-orthogonal (max pairwise cosine ~0.5);
        # 0.3 exercises the bucketed blocker with a real, non-empty pair set
        import pandas as _pd

        df = S.embedding_near_dup_pairs(S.read_embeddings(sf), threshold=0.3).to_pandas()
        if len(df.columns) == 0:  # empty Dataset loses its schema
            df = _pd.DataFrame({c: _pd.Series(dtype="int64") for c in ("id_a", "id_b", "cos_u")})
        return df

    def ngram_jaccard(sf):
        import pandas as _pd

        df = D.ngram_jaccard_pairs(D.read_documents(sf), threshold=0.5).to_pandas()
        if len(df.columns) == 0:  # empty Dataset loses its schema
            df = _pd.DataFrame({c: _pd.Series(dtype="int64") for c in ("id_a", "id_b", "jac_u")})
        return df

    def multimodal_meta(sf):
        """Decode metadata + resize plan merged (one decode pass)."""
        binr = M.attach_binary_payload(D.read_documents(sf))
        return M.meta_with_resize(M.decode_metadata(binr))

    def multimodal_derived(sf):
        """Frame-sample plan ∪ byte-class features, kind-tagged."""
        binr = M.attach_binary_payload(D.read_documents(sf))
        return M.frames_and_features(M.decode_metadata(binr), binr, every=2)

    from neo4j_graph_algorithms_ray.catalog import list_operators

    # The driver records at most 50 CORRECTNESS rows per round (r02 captured
    # exactly the first 50 of 60 entries), so same-schema algorithm variants
    # are merged into single tag-column queries (engine concat / oracle
    # UNION ALL) — 50 entries (exactly at the cap), every operator checked.
    return {
        # operator catalog (algo.list analogue, ListProc.java:42-46)
        "catalog": lambda sf: list_operators(),
        # graph construction (oracle-checked)
        "edge_extract": G.q_edge_extract,
        "vertices": G.q_vertices,
        "degrees": G.q_degrees,
        "degree_histogram": G.q_degree_histogram,
        "sha256_invariance": G.q_sha256_invariance,
        # headline graph algorithms — all oracle-checked (recursive-CTE /
        # unrolled-CTE DuckDB equivalents, oracles.py); fixture conformance
        # vs the reference's own test graphs additionally lives in tests/
        "pagerank": G.q_pagerank,
        "connected_components": G.q_connected_components,
        "cc_set_sizes": G.q_cc_set_sizes,
        "mscoloring": G.q_mscoloring,
        "label_propagation": G.q_label_propagation_merged,
        "cc_threshold": G.q_cc_threshold,
        "sssp": G.q_sssp_merged,
        "all_shortest_paths": G.q_all_shortest_paths,
        "shortest_path": G.q_shortest_path,
        "closeness_harmonic": G.q_closeness_harmonic,
        "betweenness": G.q_betweenness,
        "betweenness_sampled": G.q_betweenness_sampled_merged,
        "scc": G.q_scc,
        "louvain": G.q_louvain_merged,
        "mst": G.q_mst,
        # triangles (SQL-expressible -> oracle-checked)
        "triangle_counts": G.q_triangle_counts_with_global,
        "triangle_stream": G.q_triangle_stream,
        "clustering_coefficients": G.q_clustering_coefficients,
        # training-data ops: dedup
        "dedup_exact": lambda sf: D.exact_dedup(D.read_documents(sf)),
        "minhash_signatures": lambda sf: D.minhash_signatures(D.read_documents(sf)),
        "minhash_pairs": lambda sf: D.minhash_dedup_pairs(D.read_documents(sf)).to_pandas(),
        "ngram_jaccard": ngram_jaccard,
        "dedup_clusters": _dedup_clusters_memo,
        "prepared_corpus": lambda sf: D.prepared_corpus(
            D.read_documents(sf), keep_ids=_dedup_keepers(sf)
        ),
        "simhash_signatures": lambda sf: D.simhash_signatures(D.read_documents(sf)),
        # text analysis
        "clean_text": lambda sf: D.clean_fingerprint(D.read_documents(sf)),
        "tfidf": lambda sf: D.tfidf(D.read_documents(sf)),
        "hash_sample": lambda sf: D.hash_sample(D.read_documents(sf)),
        "stratified_sample": lambda sf: D.stratified_sample(D.read_documents(sf)),
        "profile_lineitem": lambda sf: _intize(
            R.profile_numeric(
                R.read_table(sf, "lineitem", columns=["l_quantity", "l_extendedprice", "l_discount"]),
                ["l_quantity", "l_extendedprice", "l_discount"],
            ).to_pandas(),
            ["vmin", "vmax"],
            1_000_000,
        ).pipe(lambda df: _intize(df, ["vsum"], 1000)),
        "text_stats": lambda sf: D.text_stats(D.read_documents(sf)),
        # similarity search
        "knn": knn_merged,
        "embedding_near_dups": embedding_near_dups,
        # multimodal plumbing
        "multimodal_meta": multimodal_meta,
        "multimodal_derived": multimodal_derived,
        # relational coverage
        "lineitem_summary": lineitem_summary,
        "top_customers": topk_customers,
        "events_hourly": events_hourly,
        "sessions": sessions,
        "events_sliding": events_sliding,
        "events_asof_orders": events_asof_orders,
        "events_range_selfjoin": events_range_selfjoin,
        "top_events_per_user": top_events_per_user,
        "supplier_nations": lambda sf: R.supplier_nation_counts(sf),
    }


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------


def _corpus_sql_prefix() -> str:
    from neo4j_graph_algorithms_ray.oracles import graph_prefix
    from neo4j_graph_algorithms_ray.sources.corpus import corpus_path_for

    path = corpus_path_for(_ORACLE_SF)  # also materialises the corpus
    return graph_prefix(path)


_LANG_SQL = {
    "en": "the|and|of|to|a|is",
    "de": "der|und|die|das|ist|nicht",
    "fr": "le|la|et|les|des|est",
    "es": "el|los|las|y|por|una",
}


def _betweenness_sampled_sql(pre: str) -> str:
    """RA-Brandes oracle: the seeded 64-source sample and the n/64 scale are
    reproduced from the same generator the Ray pipeline uses."""
    from neo4j_graph_algorithms_ray import oracles as O
    from neo4j_graph_algorithms_ray.pipelines.centrality import pick_sources
    from neo4j_graph_algorithms_ray.sources.corpus import corpus_params_for

    n_files = corpus_params_for(_ORACLE_SF)[0]
    sources = pick_sources(n_files, 64)
    return O.betweenness_sql(pre, sources=sources, scale=n_files / len(sources))


def _betweenness_sampled_degree_sql(pre: str) -> str:
    """Degree-strategy RA-Brandes oracle: out-degrees come from DuckDB on the
    same corpus SQL, sources from the same seeded Bernoulli picker the engine
    uses (p = deg/maxDeg, RandomDegreeSelectionStrategy.java:49-62)."""
    import duckdb
    import numpy as np

    from neo4j_graph_algorithms_ray import oracles as O
    from neo4j_graph_algorithms_ray.pipelines.centrality import pick_sources_degree
    from neo4j_graph_algorithms_ray.sources.corpus import corpus_params_for

    n_files = corpus_params_for(_ORACLE_SF)[0]
    deg_df = duckdb.sql(
        pre
        + """
SELECT v.vid, coalesce(c.n, 0) AS d
FROM verts v LEFT JOIN (SELECT src, count(*) AS n FROM edges GROUP BY src) c
ON c.src = v.vid ORDER BY v.vid"""
    ).df()
    deg = np.zeros(n_files, dtype=np.int64)
    deg[deg_df["vid"].to_numpy()] = deg_df["d"].to_numpy()
    sources = pick_sources_degree(deg, seed=7)
    return O.betweenness_sql(pre, sources=sources, scale=n_files / max(1, len(sources)))


def _tag_union(col: str, parts: list[tuple[str, str]]) -> str:
    """UNION ALL of full SQL statements, each tagged with a constant column
    (DuckDB allows CTE-bearing statements inside subqueries)."""
    return "\nUNION ALL\n".join(
        f"SELECT '{tag}' AS {col}, * FROM (\n{sql}\n)" for tag, sql in parts
    )


def oracle_sql() -> dict[str, str]:
    from neo4j_graph_algorithms_ray import oracles as O
    from neo4j_graph_algorithms_ray.pipelines.graph_queries import PAGERANK_ORACLE_ITERS

    pre = _corpus_sql_prefix()
    lang_counts = ", ".join(
        f"len(regexp_extract_all(lower(text), '\\b(?:{pat})\\b')) AS n_{lang}"
        for lang, pat in _LANG_SQL.items()
    )
    from neo4j_graph_algorithms_ray.catalog import catalog_sql

    return {
        # the catalog is static data -> its oracle is the same rows in SQL
        "catalog": catalog_sql(),
        # headline graph algorithms (recursive / unrolled CTEs, oracles.py);
        # same-schema variants are tag-column UNION ALLs (see queries())
        "pagerank": O.pagerank_sql(pre, iterations=PAGERANK_ORACLE_ITERS),
        "connected_components": O.cc_sql(pre),
        "cc_set_sizes": O.cc_set_sizes_sql(pre),
        "mscoloring": O.mscoloring_sql(pre),
        "label_propagation": _tag_union(
            "variant",
            [
                ("uniform", O.labelprop_sql(pre, iterations=20)),
                ("weighted", O.labelprop_sql(pre, iterations=20, weighted=True)),
            ],
        ),
        "cc_threshold": O.cc_threshold_sql(pre, threshold=3.0),
        "sssp": _tag_union(
            "algo",
            [
                ("dijkstra", O.sssp_sql(pre, source=0)),
                ("delta", O.sssp_sql(pre, source=0)),
            ],
        ),
        "all_shortest_paths": O.all_shortest_paths_sql(pre, n_sources=64),
        "shortest_path": O.shortest_path_sql(pre, source=0),
        "closeness_harmonic": _tag_union(
            "metric",
            [("closeness", O.closeness_sql(pre)), ("harmonic", O.harmonic_sql(pre))],
        ),
        "betweenness": O.betweenness_sql(pre),
        "betweenness_sampled": _tag_union(
            "strategy",
            [
                ("uniform", _betweenness_sampled_sql(pre)),
                ("degree", _betweenness_sampled_degree_sql(pre)),
            ],
        ),
        "scc": O.scc_sql(pre),
        "louvain": _tag_union(
            "variant",
            [
                ("uniform", O.louvain_sql(pre, iterations=10)),
                ("weighted", O.louvain_sql(pre, iterations=10, weighted=True)),
            ],
        ),
        "mst": O.mst_summary_sql(pre),
        "triangle_stream": pre + "\nSELECT x AS a, y AS b, z AS c FROM tris",
        # dedup sketches (md5-based kernels, constants embedded in the SQL)
        "minhash_signatures": O.minhash_signatures_sql(),
        "minhash_pairs": O.minhash_pairs_sql(threshold=0.7),
        "ngram_jaccard": O.ngram_jaccard_sql(threshold=0.5),
        "dedup_clusters": O.dedup_clusters_sql(threshold=0.7),
        "prepared_corpus": O.prepared_corpus_sql(min_quality=2, threshold=0.7),
        "simhash_signatures": O.simhash_signatures_sql(),
        "embedding_near_dups": O.embedding_near_dups_sql(threshold=0.3),
        "edge_extract": pre + "SELECT src_key, dst_key FROM raw_edges",
        "vertices": pre + "SELECT key, vid FROM verts",
        "degrees": pre
        + """
SELECT v.vid, coalesce(c.n, 0) AS out_deg
FROM verts v LEFT JOIN (SELECT src, count(*) AS n FROM edges GROUP BY src) c
ON c.src = v.vid""",
        "degree_histogram": pre
        + """
, d AS (
  SELECT v.vid, coalesce(c.n, 0) AS out_deg
  FROM verts v LEFT JOIN (SELECT src, count(*) AS n FROM edges GROUP BY src) c
  ON c.src = v.vid)
SELECT CASE WHEN out_deg >= 1 THEN CAST(floor(log2(out_deg)) AS BIGINT) ELSE -1 END AS bucket,
       count(*) AS n_vertices
FROM d GROUP BY 1""",
        "sha256_invariance": pre + "SELECT repo || '/' || path AS key, sha256(content) AS sha FROM corpus",
        "triangle_counts": pre
        + """
, corners AS (SELECT x AS vid FROM tris UNION ALL SELECT y FROM tris UNION ALL SELECT z FROM tris)
SELECT v.vid, coalesce(c.n, 0) AS triangles
FROM verts v LEFT JOIN (SELECT vid, count(*) AS n FROM corners GROUP BY vid) c ON c.vid = v.vid
UNION ALL SELECT -1 AS vid, count(*) AS triangles FROM tris""",
        "clustering_coefficients": pre
        + """
, corners AS (SELECT x AS vid FROM tris UNION ALL SELECT y FROM tris UNION ALL SELECT z FROM tris),
tcnt AS (SELECT vid, count(*) AS n FROM corners GROUP BY vid)
SELECT v.vid,
       CASE WHEN coalesce(d.d, 0) >= 2
            THEN 2.0 * coalesce(t.n, 0) / (d.d * (d.d - 1))
            ELSE 0.0 END AS coefficient
FROM verts v
LEFT JOIN deg d ON d.vid = v.vid
LEFT JOIN tcnt t ON t.vid = v.vid""",
        "dedup_exact": """
SELECT sha256(text) AS h, min(doc_id) AS doc_id, count(*) AS n
FROM documents GROUP BY text""",
        "clean_text": """
SELECT doc_id,
       trim(regexp_replace(regexp_replace(regexp_replace(lower(text),
            '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<email>', 'g'),
            '[0-9]{6,}', '<num>', 'g'),
            '[ \t\n\r]+', ' ', 'g')) AS clean,
       md5(lower(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')))) AS fp
FROM documents""",
        "tfidf": """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1 HAVING count(*) <= 100000),
n AS (SELECT count(*) AS nd FROM documents)
SELECT t.doc_id, t.term, t.tf, d.df,
       CAST(floor(t.tf * (ln((nd + 1.0) / (d.df + 1.0)) + 1.0) * 1000000 + 0.5) AS BIGINT) AS tfidf_u
FROM tf t JOIN df d USING (term) CROSS JOIN n""",
        "hash_sample": """
SELECT * FROM documents
WHERE md5_number_lower('s42|' || CAST(doc_id AS VARCHAR)) % 100 < 10""",
        "stratified_sample": """
WITH s AS (
  SELECT lang, doc_id,
         CAST(md5_number_lower('s7|' || CAST(doc_id AS VARCHAR)) >> 1 AS BIGINT) AS hs
  FROM documents),
r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY hs ASC, doc_id ASC) AS rank
      FROM s)
SELECT lang, doc_id, hs, rank FROM r WHERE rank <= 2""",
        "profile_lineitem": """
WITH p AS (
  SELECT 'l_quantity' AS col, count(*) AS n, count(*) - count(l_quantity) AS n_null,
         min(l_quantity) AS mn, max(l_quantity) AS mx, sum(l_quantity) AS sm FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
         min(l_extendedprice), max(l_extendedprice), sum(l_extendedprice) FROM lineitem
  UNION ALL
  SELECT 'l_discount', count(*), count(*) - count(l_discount),
         min(l_discount), max(l_discount), sum(l_discount) FROM lineitem)
SELECT col, n, n_null,
       CAST(floor(mn * 1000000 + 0.5) AS BIGINT) AS vmin,
       CAST(floor(mx * 1000000 + 0.5) AS BIGINT) AS vmax,
       CAST(floor(sm * 1000 + 0.5) AS BIGINT) AS vsum
FROM p""",
        "text_stats": f"""
WITH m AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[^ \t\n\r]+')) AS n_ws_tokens,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]')) AS n_bpe_tokens,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS n_words,
         len(regexp_extract_all(lower(text), '\\b(?:the|and|of|to|a|in|is|it)\\b')) AS n_stop,
         len(regexp_extract_all(text, '[^A-Za-z0-9 \t\n\r]')) AS n_punct,
         len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
         {lang_counts}
  FROM documents)
SELECT doc_id, n_ws_tokens, n_bpe_tokens, n_chars, n_words, n_stop, n_punct, n_upper,
       CAST(n_stop AS DOUBLE) / greatest(n_words, 1) AS stop_ratio,
       CAST(n_chars >= 100 AS BIGINT) + CAST(n_words >= 20 AS BIGINT)
       + CAST(CAST(n_stop AS DOUBLE) / greatest(n_words, 1) >= 0.01 AS BIGINT)
       + CAST(n_punct * 2 <= n_words AS BIGINT) AS quality,
       CASE WHEN n_en = 0 AND n_de = 0 AND n_fr = 0 AND n_es = 0 THEN 'unknown'
            WHEN n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
            WHEN n_de >= n_fr AND n_de >= n_es THEN 'de'
            WHEN n_fr >= n_es THEN 'fr'
            ELSE 'es' END AS pred_lang
FROM m""",
        "knn": _tag_union(
            "method",
            [
                (
                    "brute",
                    """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 5),
base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
scored AS (SELECT q.qid AS query_id, b.vec_id,
                  CAST(floor(list_cosine_similarity(b.e, q.qe) * 1000000 + 0.5) AS BIGINT) AS cos_u
           FROM base b CROSS JOIN q),
ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_u DESC, vec_id ASC) AS rn
           FROM scored)
SELECT query_id, vec_id, cos_u FROM ranked WHERE rn <= 10""",
                ),
                ("ivf", O.knn_ivf_sql(n_queries=5, k=10, n_centroids=16, nprobe=4)),
            ],
        ),
        "multimodal_meta": """
WITH m AS (SELECT doc_id,
       8 + strlen(text) AS n_bytes,
       16 + strlen(text) % 64 AS width,
       16 + (strlen(text) * 7) % 64 AS height,
       1 + strlen(text) % 8 AS n_frames
FROM documents),
r AS (SELECT *, least(1.0, least(32.0 / width, 32.0 / height)) AS s FROM m)
SELECT doc_id, n_bytes, width, height, n_frames,
       CAST(floor(width * s + 0.5) AS BIGINT) AS r_width,
       CAST(floor(height * s + 0.5) AS BIGINT) AS r_height,
       CAST(floor(s * 1000000 + 0.5) AS BIGINT) AS scale_u
FROM r""",
        "multimodal_derived": """
SELECT doc_id, 'frame' AS kind,
       unnest(range(0, 1 + strlen(text) % 8, 2)) AS idx,
       CAST(0 AS BIGINT) AS n, CAST(0 AS BIGINT) AS feat_u
FROM documents
UNION ALL
SELECT doc_id, 'feat' AS kind, dim AS idx, n, feat_u FROM (
WITH m AS (
  SELECT doc_id, strlen(text) AS ln,
         len(regexp_extract_all(text, '[a-z]')) AS c0,
         len(regexp_extract_all(text, '[A-Z]')) AS c1,
         len(regexp_extract_all(text, '[0-9]')) AS c2,
         len(regexp_extract_all(text, '[ \t\n\r]')) AS c3
  FROM documents),
u AS (
  SELECT doc_id, ln,
         unnest([0, 1, 2, 3, 4, 5]) AS dim,
         unnest([c0, c1, c2, c3, ln - c0 - c1 - c2 - c3, 0]) AS n
  FROM m)
SELECT doc_id, dim, n,
       CAST(floor(n / greatest(ln, 1) * 1000000 + 0.5) AS BIGINT) AS feat_u
FROM u)""",
        "lineitem_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(floor(sum(l_quantity) * 1000 + 0.5) AS BIGINT) AS sum_qty,
       CAST(floor(sum(l_extendedprice) * 1000 + 0.5) AS BIGINT) AS sum_base_price,
       CAST(floor(sum(l_extendedprice * (1.0 - l_discount)) * 1000 + 0.5) AS BIGINT) AS sum_revenue,
       CAST(floor(avg(l_discount) * 1000000 + 0.5) AS BIGINT) AS avg_disc,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "top_customers": """
WITH spend AS (SELECT o_custkey, sum(o_totalprice) AS total_spend, count(*) AS n_orders
               FROM orders GROUP BY o_custkey)
SELECT o_custkey, c_name, CAST(floor(total_spend * 1000 + 0.5) AS BIGINT) AS total_spend, n_orders
FROM spend JOIN customer ON c_custkey = o_custkey
ORDER BY CAST(floor(spend.total_spend * 1000 + 0.5) AS BIGINT) DESC, o_custkey ASC LIMIT 10""",
        "events_hourly": """
SELECT event_type,
       CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
       count(*) AS n_events,
       CAST(floor(sum(value) * 1000 + 0.5) AS BIGINT) AS sum_value
FROM events GROUP BY 1, 2""",
        "sessions": """
WITH e AS (SELECT user_id, epoch_us(ts) AS t, value FROM events),
s AS (SELECT user_id, t, value,
        CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
             OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 1800000000
             THEN 1 ELSE 0 END AS ns
      FROM e),
g AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING) AS sid
      FROM s)
SELECT q.*, v.variant
FROM (SELECT user_id, min(t) AS session_start_us, count(*) AS n_events,
             CAST(floor(sum(value) * 1000 + 0.5) AS BIGINT) AS sum_value
      FROM g GROUP BY user_id, sid) q
CROSS JOIN (VALUES ('base'), ('chunked')) v(variant)""",
        "events_sliding": """
SELECT q.*, v.variant
FROM (SELECT user_id, event_id, epoch_us(ts) AS t_us,
             count(*) OVER win AS n_win,
             CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) OVER win AS BIGINT) AS win_sum_u
      FROM events
      WINDOW win AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)) q
CROSS JOIN (VALUES ('base'), ('chunked')) v(variant)""",
        "events_asof_orders": """
WITH r AS (
  SELECT o_custkey AS k, epoch_us(o_orderdate) AS t2, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
  FROM orders),
r2 AS (SELECT k, t2, o_orderkey, o_totalprice FROM r WHERE rn = 1),
e AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events)
SELECT q.*, v.variant
FROM (SELECT e.user_id, e.t AS t_us, e.event_id,
             coalesce(r2.o_orderkey, -1) AS o_orderkey,
             CAST(floor(coalesce(r2.o_totalprice, 0.0) * 1000 + 0.5) AS BIGINT) AS o_totalprice
      FROM e ASOF LEFT JOIN r2 ON e.user_id = r2.k AND e.t >= r2.t2) q
CROSS JOIN (VALUES ('base'), ('chunked')) v(variant)""",
        "top_events_per_user": """
WITH r AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rank
  FROM events)
SELECT user_id, event_id, CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS value, rank
FROM r WHERE rank <= 3""",
        "events_range_selfjoin": """
SELECT q.*, v.variant
FROM (SELECT a.user_id AS k, a.event_id AS eid_a, b.event_id AS eid_b,
             epoch_us(a.ts) AS t_us, epoch_us(b.ts) AS rt_us
      FROM events a JOIN events b
      ON a.user_id = b.user_id
      AND epoch_us(b.ts) BETWEEN epoch_us(a.ts) - 3600000000 AND epoch_us(a.ts)) q
CROSS JOIN (VALUES ('base'), ('chunked')) v(variant)""",
        "supplier_nations": """
SELECT r_name, count(*) AS n_suppliers
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY r_name""",
    }
