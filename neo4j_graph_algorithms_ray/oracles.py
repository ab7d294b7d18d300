"""DuckDB oracle-SQL generators for the driver correctness contract.

Each generator returns ANSI-ish SQL that DuckDB 1.0 can run over the same
Parquet inputs the Ray pipelines read, reproducing the pipeline's exact
output (ints/strings, floats pre-quantized on both sides).  Iterative
algorithms are expressed either as recursive CTEs (reachability-shaped:
connected components, SSSP, BFS distances) or as unrolled fixed-iteration
CTE chains (PageRank power iteration, synchronous label propagation) —
feasible because the correctness tier is small; the Ray side runs the same
fixed iteration counts.

Float contract: every float column is quantized
``floor(x * scale + 0.5)::BIGINT`` on BOTH engines; divisions of exact
integers are IEEE-identical, and summation-order noise (~1e-13) sits far
below the 1e-6 grids used here.
"""

from __future__ import annotations

import numpy as np

# max shortest-path length the recursive distance CTEs explore.  The
# synthetic corpora resolve imports within a repo, so undirected components
# are bounded by files-per-repo (<= 100 at the largest tier the oracle ever
# runs on); walks longer than the cap cannot be shortest paths.
_DEPTH_CAP = 110


def graph_prefix(corpus_path: str) -> str:
    """Shared CTE prefix: corpus -> verts / edges / undirected views."""
    return f"""
WITH corpus AS MATERIALIZED (SELECT * FROM read_parquet('{corpus_path}/*.parquet')),
verts AS MATERIALIZED (SELECT repo || '/' || path AS key,
                 row_number() OVER (ORDER BY (repo || '/' || path)) - 1 AS vid
          FROM corpus),
raw_edges AS MATERIALIZED (
  SELECT repo || '/' || path AS src_key,
         repo || '/' || replace(m, '.', '/') || '.py' AS dst_key
  FROM corpus, unnest(regexp_extract_all(content,
       '(?m)^import ([A-Za-z_][A-Za-z0-9_.]*)$', 1)) AS t(m)),
edges AS MATERIALIZED (SELECT v1.vid AS src, v2.vid AS dst
          FROM raw_edges r
          JOIN verts v1 ON r.src_key = v1.key
          JOIN verts v2 ON r.dst_key = v2.key),
dedges AS MATERIALIZED (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
canon AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
          FROM edges WHERE src <> dst),
deg AS MATERIALIZED (SELECT x AS vid, count(*) AS d
        FROM (SELECT u AS x FROM canon UNION ALL SELECT v AS x FROM canon)
        GROUP BY x),
orient AS MATERIALIZED (SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND c.u < c.v) THEN c.u ELSE c.v END AS a,
                  CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND c.u < c.v) THEN c.v ELSE c.u END AS b
           FROM canon c JOIN deg du ON du.vid = c.u JOIN deg dv ON dv.vid = c.v),
tris AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         FROM orient e1
         JOIN orient e2 ON e2.a = e1.b
         JOIN orient e3 ON e3.a = e1.a AND e3.b = e2.b)
"""


# ---------------------------------------------------------------------------
# components (undirected label closure) — CC / set sizes / MSColoring / MST
# ---------------------------------------------------------------------------

_COMP_CLOSURE = """
, comp_reach AS (
  WITH RECURSIVE r(v, l) AS (
    SELECT vid, vid FROM verts
    UNION
    SELECT e.dst, r.l FROM r JOIN dedges e ON e.src = r.v
  ) SELECT v, l FROM r
)"""


def cc_sql(pre: str) -> str:
    """Per-vertex min-vid component label (canonical CC contract)."""
    return pre + _COMP_CLOSURE + "\nSELECT v AS vid, min(l) AS label FROM comp_reach GROUP BY v"


def cc_set_sizes_sql(pre: str) -> str:
    return (
        pre
        + _COMP_CLOSURE
        + """
, lab AS (SELECT v AS vid, min(l) AS label FROM comp_reach GROUP BY v)
SELECT label, count(*) AS size FROM lab GROUP BY label"""
    )


def mscoloring_sql(pre: str) -> str:
    """Max-vid component color (MSColoring.java:96-121 — bidirectional
    max-propagation converges to the component's max id)."""
    return pre + _COMP_CLOSURE + "\nSELECT v AS vid, max(l) AS color FROM comp_reach GROUP BY v"


def mst_summary_sql(pre: str) -> str:
    """Per-component spanning-forest invariant {label, n_edges, weight_u}.

    On the uniform-weight corpus every spanning tree of a component with n
    vertices has exactly n-1 edges of total weight n-1 — the well-defined
    MST invariant the oracle can check (weight_u = 1e3-quantized sum).
    """
    return (
        pre
        + _COMP_CLOSURE
        + """
, lab AS (SELECT v AS vid, min(l) AS label FROM comp_reach GROUP BY v),
sz AS (SELECT label, count(*) AS n FROM lab GROUP BY label)
SELECT label, n - 1 AS n_edges, (n - 1) * 1000 AS weight_u FROM sz WHERE n > 1"""
    )


# ---------------------------------------------------------------------------
# distances (recursive BFS closures)
# ---------------------------------------------------------------------------


def _dist_closure(edge_rel: str, source_filter: str, cap: int) -> str:
    """(s, v, d) min BFS distances over ``edge_rel`` from filtered sources."""
    return f"""
, dist_reach AS (
  WITH RECURSIVE r(s, v, d) AS (
    SELECT vid, vid, 0 FROM verts WHERE {source_filter}
    UNION
    SELECT r.s, e.dst, r.d + 1 FROM r JOIN {edge_rel} e ON e.src = r.v WHERE r.d < {cap}
  ) SELECT s, v, min(d) AS d FROM r GROUP BY s, v
)"""


def sssp_sql(pre: str, source: int = 0, cap: int = _DEPTH_CAP) -> str:
    """Directed unweighted SSSP from ``source`` (finite rows only)."""
    return (
        pre
        + _dist_closure("edges", f"vid = {source}", cap)
        + "\nSELECT v AS vid, d AS distance FROM dist_reach"
    )


def shortest_path_sql(pre: str, source: int = 0, cap: int = _DEPTH_CAP) -> str:
    """Single-pair shortest path rows {step, vid, cost_u, cost} from ``source`` to
    the farthest reachable vertex (max finite distance, tie -> max vid) with
    deterministic min-vid predecessor choice — mirrors
    pipelines/paths.py::shortest_path's pinned tie-breaks."""
    return (
        pre
        + _dist_closure("edges", f"vid = {source}", cap)
        + f"""
, target AS (
  SELECT v, d FROM dist_reach ORDER BY d DESC, v DESC LIMIT 1
),
walk AS (
  -- walk backward from target: pred(v) = min u with d(u) = d(v)-1 and u->v
  WITH RECURSIVE w(v, d) AS (
    SELECT v, d FROM target
    UNION ALL
    SELECT (SELECT min(r.s) FROM (SELECT e.src AS s FROM edges e
              JOIN dist_reach dr ON dr.v = e.src
              WHERE e.dst = w.v AND dr.d = w.d - 1) r),
           w.d - 1
    FROM w WHERE w.d > 0
  ) SELECT v, d FROM w
)
SELECT d AS step, v AS vid, d * 1000 AS cost_u, CAST(d AS DOUBLE) AS cost FROM walk"""
    )


def all_shortest_paths_sql(pre: str, n_sources: int, cap: int = _DEPTH_CAP) -> str:
    """MSBFSAllShortestPaths analogue: (source, target, distance) rows for
    sources [0, n_sources) over OUTGOING edges, self rows (d=0) included."""
    return (
        pre
        + _dist_closure("edges", f"vid < {n_sources}", cap)
        + "\nSELECT s AS source, v AS target, d AS distance FROM dist_reach"
    )


def closeness_sql(pre: str, cap: int = _DEPTH_CAP) -> str:
    """MSClosenessCentrality: c(v) = (n-1)/farness(v), farness = sum of
    distances from every vertex that reaches v over OUTGOING edges
    (MSBFSCCAlgorithm.centrality, MSClosenessCentrality.java:64,76)."""
    return (
        pre
        + _dist_closure("edges", "TRUE", cap)
        + """
, far AS (SELECT v, sum(d) AS farness FROM dist_reach WHERE d > 0 GROUP BY v),
n AS (SELECT count(*) AS n FROM verts)
SELECT verts.vid,
       CASE WHEN far.farness > 0
            THEN CAST(floor((n.n - 1) / CAST(far.farness AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
            ELSE 0 END AS cent_u
FROM verts CROSS JOIN n LEFT JOIN far ON far.v = verts.vid"""
    )


def harmonic_sql(pre: str, cap: int = _DEPTH_CAP) -> str:
    """MSHarmonicCentrality: h(v) = sum(1/d) / (n-1) over BOTH directions."""
    return (
        pre
        + _dist_closure("dedges", "TRUE", cap)
        + """
, inv AS (SELECT v, sum(1.0 / d) AS inv_far FROM dist_reach WHERE d > 0 GROUP BY v),
n AS (SELECT count(*) AS n FROM verts)
SELECT verts.vid,
       CAST(floor(coalesce(inv.inv_far, 0) / (n.n - 1) * 1000000 + 0.5) AS BIGINT) AS cent_u
FROM verts CROSS JOIN n LEFT JOIN inv ON inv.v = verts.vid"""
    )


def betweenness_sql(pre: str, max_depth: int = 34, sources=None, scale: float = 1.0) -> str:
    """Brandes betweenness (directed, unweighted) as unrolled per-depth
    CTEs: forward sigma accumulation (number of shortest paths) then
    backward dependency accumulation (``BetweennessCentrality.java:108-146``),
    quantized at 1e6.

    ``sources=None`` = exact (every vertex).  A list of source vids replays
    RA-Brandes sampling (the seeded sample is embedded in the SQL, like the
    minhash permutation constants) with the ``scale`` extrapolation factor
    (``RABrandesBetweennessCentrality.java:177``).

    ``max_depth`` bounds the BFS level unroll; components in the synthetic
    corpora are intra-repo (< files-per-repo vertices), so 34 levels cover
    every geodesic at the oracle tiers.
    """
    src_filter = (
        "TRUE" if sources is None else f"vid IN ({', '.join(str(int(s)) for s in sources)})"
    )
    blocks = [_dist_closure("edges", src_filter, max_depth)]
    blocks.append(
        ", sig0 AS MATERIALIZED (SELECT vid AS s, vid AS v, CAST(1 AS DOUBLE) AS sigma "
        f"FROM verts WHERE {src_filter})"
    )
    for k in range(1, max_depth + 1):
        blocks.append(
            f""", sig{k} AS MATERIALIZED (
  SELECT u.s, e.dst AS v, sum(u.sigma) AS sigma
  FROM sig{k - 1} u
  JOIN edges e ON e.src = u.v
  JOIN dist_reach d ON d.s = u.s AND d.v = e.dst AND d.d = {k}
  GROUP BY u.s, e.dst
)"""
        )
    sig_union = " UNION ALL ".join(
        f"SELECT s, v, {k} AS d, sigma FROM sig{k}" for k in range(0, max_depth + 1)
    )
    blocks.append(f", sig AS MATERIALIZED ({sig_union})")
    # backward: delta at depth k needs delta at k+1; deepest level delta = 0
    blocks.append(
        f""", del{max_depth} AS MATERIALIZED (
  SELECT s, v, CAST(0 AS DOUBLE) AS delta FROM sig WHERE d = {max_depth}
)"""
    )
    for k in range(max_depth - 1, -1, -1):
        blocks.append(
            f""", del{k} AS MATERIALIZED (
  SELECT sv.s, sv.v,
         coalesce(acc.x, 0) AS delta
  FROM (SELECT s, v, sigma FROM sig WHERE d = {k}) sv
  LEFT JOIN (
    SELECT sv2.s, sv2.v, sum(sv2.sigma / sw.sigma * (1 + dw.delta)) AS x
    FROM (SELECT s, v, sigma FROM sig WHERE d = {k}) sv2
    JOIN edges e ON e.src = sv2.v
    JOIN sig sw ON sw.s = sv2.s AND sw.v = e.dst AND sw.d = {k + 1}
    JOIN del{k + 1} dw ON dw.s = sv2.s AND dw.v = e.dst
    GROUP BY sv2.s, sv2.v
  ) acc ON acc.s = sv.s AND acc.v = sv.v
)"""
        )
    del_union = " UNION ALL ".join(f"SELECT s, v, delta FROM del{k}" for k in range(0, max_depth + 1))
    blocks.append(f", del_all AS MATERIALIZED ({del_union})")
    return (
        pre
        + "".join(blocks)
        + """
, cent AS (SELECT v, sum(delta) AS c FROM del_all WHERE s <> v GROUP BY v)
SELECT verts.vid,
       CAST(floor(coalesce(cent.c, 0) * {scale} * 1000000 + 0.5) AS BIGINT) AS cent_u
FROM verts LEFT JOIN cent ON cent.v = verts.vid""".format(scale=float(scale))
    )


# ---------------------------------------------------------------------------
# SCC (directed mutual-reachability closure)
# ---------------------------------------------------------------------------


def scc_sql(pre: str) -> str:
    """SCC label = min vid mutually reachable (label closure over directed
    edges in both orientations, intersected)."""
    return (
        pre
        + """
, fwd AS (
  WITH RECURSIVE r(v, l) AS (
    SELECT vid, vid FROM verts
    UNION
    SELECT e.dst, r.l FROM r JOIN edges e ON e.src = r.v
  ) SELECT DISTINCT v, l FROM r
),
bwd AS (
  WITH RECURSIVE r(v, l) AS (
    SELECT vid, vid FROM verts
    UNION
    SELECT e.src, r.l FROM r JOIN edges e ON e.dst = r.v
  ) SELECT DISTINCT v, l FROM r
)
SELECT f.v AS vid, min(f.l) AS label
FROM fwd f JOIN bwd b ON b.v = f.v AND b.l = f.l
GROUP BY f.v"""
    )


# ---------------------------------------------------------------------------
# PageRank (unrolled power iteration)
# ---------------------------------------------------------------------------


def pagerank_sql(pre: str, iterations: int = 40, damping: float = 0.85) -> str:
    """Unnormalized PageRank, ``iterations`` fixed rounds, delta-push
    semantics (PageRank.java:444-517: x_k = (1-d) + d * sum_in(x_{k-1}/od));
    scores quantized at 1e6."""
    alpha = 1.0 - damping
    blocks = [f", odeg AS MATERIALIZED (SELECT src AS vid, count(*) AS od FROM edges GROUP BY src)"]
    blocks.append(f", pr0 AS MATERIALIZED (SELECT vid, CAST({alpha} AS DOUBLE) AS score FROM verts)")
    for k in range(1, iterations + 1):
        blocks.append(
            f""", pr{k} AS MATERIALIZED (
  SELECT v.vid, {alpha} + {damping} * coalesce(a.s, 0) AS score
  FROM verts v LEFT JOIN (
    SELECT e.dst AS vid, sum(p.score / o.od) AS s
    FROM edges e JOIN pr{k - 1} p ON p.vid = e.src JOIN odeg o ON o.vid = e.src
    GROUP BY e.dst
  ) a ON a.vid = v.vid
)"""
        )
    return (
        pre
        + "".join(blocks)
        + f"\nSELECT vid, CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_u FROM pr{iterations}"
    )


# ---------------------------------------------------------------------------
# Label propagation (unrolled red/black synchronous iterations)
# ---------------------------------------------------------------------------


SYN_WEIGHT = "1 + (src + 2*dst) % 5"  # weighted_graph_for_sf's formula


def labelprop_sql(pre: str, iterations: int = 20, weighted: bool = False) -> str:
    """Synchronous red/black LP over BOTH directions, argmax vote with
    smallest-label tie-break — the engine's pinned deterministic variant
    (state/shards.py LabelPropShard.step).  One CTE per half-phase.
    ``weighted`` votes carry the synthetic integer edge weight
    (graph_queries.weighted_graph_for_sf) instead of unit weight."""
    wexpr = SYN_WEIGHT if weighted else "1"
    blocks = [
        f", vot AS MATERIALIZED (SELECT src AS u, dst AS t, {wexpr} AS w FROM edges"
        f" UNION ALL SELECT dst AS u, src AS t, {wexpr} AS w FROM edges)",
        ", lp0 AS MATERIALIZED (SELECT vid, vid AS label FROM verts)",
    ]
    step = 0
    for _ in range(iterations):
        for parity in (0, 1):
            prev, step = step, step + 1
            blocks.append(
                f""", lp{step} AS MATERIALIZED (
  SELECT l.vid, coalesce(w.newlab, l.label) AS label
  FROM lp{prev} l LEFT JOIN (
    SELECT vid, newlab FROM (
      SELECT v.u AS vid, lt.label AS newlab,
             row_number() OVER (PARTITION BY v.u ORDER BY sum(v.w) DESC, lt.label ASC) AS rn
      FROM vot v JOIN lp{prev} lt ON lt.vid = v.t
      WHERE v.u % 2 = {parity}
      GROUP BY v.u, lt.label
    ) WHERE rn = 1
  ) w ON w.vid = l.vid
)"""
            )
    return pre + "".join(blocks) + f"\nSELECT vid, label FROM lp{step}"


def louvain_sql(pre: str, iterations: int = 10, weighted: bool = False) -> str:
    """Unrolled red/black single-level Louvain sweep — the engine's pinned
    deterministic variant (state/louvain_shard.py; reference semantics
    ``Louvain.java:123-170``, weighted ``WeightedLouvain.java:88-124``).  The
    gain uses the exact same float64 expression tree as the shard
    (``w_in/m2 - deg*sTot/(m2*m2)``); every operand is an integer-valued sum
    (exact in float64 — ``weighted`` uses the synthetic integer weights with
    the shard's min-per-undirected-pair dedup), so both sides produce
    bit-identical doubles and identical argmax/tie choices."""
    if weighted:
        und = f""", und AS MATERIALIZED (
  SELECT u, t, CAST(min(w) AS DOUBLE) AS w FROM (
    SELECT src AS u, dst AS t, {SYN_WEIGHT} AS w FROM edges WHERE src <> dst
    UNION ALL
    SELECT dst AS u, src AS t, {SYN_WEIGHT} AS w FROM edges WHERE src <> dst
  ) GROUP BY u, t)"""
    else:
        und = ", und AS MATERIALIZED (SELECT src AS u, dst AS t, CAST(1 AS DOUBLE) AS w FROM dedges WHERE src <> dst)"
    blocks = [
        und,
        ", ldeg AS MATERIALIZED (SELECT u AS vid, CAST(sum(w) AS DOUBLE) AS deg FROM und GROUP BY u)",
        ", m2v AS MATERIALIZED (SELECT CAST(sum(deg) AS DOUBLE) AS m2 FROM ldeg)",
        ", lv0 AS MATERIALIZED (SELECT vid, vid AS comm FROM verts)",
    ]
    step = 0
    for _ in range(iterations):
        for parity in (0, 1):
            prev, step = step, step + 1
            blocks.append(
                f""", st{step} AS MATERIALIZED (
  SELECT l.comm, CAST(sum(d.deg) AS DOUBLE) AS stot
  FROM lv{prev} l JOIN ldeg d ON d.vid = l.vid GROUP BY l.comm
), mv{step} AS MATERIALIZED (
  SELECT vid, cand FROM (
    SELECT g.vid, g.cand, g.gain,
           row_number() OVER (PARTITION BY g.vid ORDER BY g.gain DESC, g.cand ASC) AS rn
    FROM (
      SELECT e.u AS vid, c.comm AS cand,
             CAST(sum(e.w) AS DOUBLE) / any_value(m2v.m2)
               - any_value(d.deg) * any_value(st.stot)
                 / (any_value(m2v.m2) * any_value(m2v.m2)) AS gain
      FROM und e
      JOIN lv{prev} c ON c.vid = e.t
      JOIN ldeg d ON d.vid = e.u
      JOIN m2v ON true
      JOIN st{step} st ON st.comm = c.comm
      WHERE e.u % 2 = {parity}
      GROUP BY e.u, c.comm
    ) g
  ) WHERE rn = 1 AND gain >= 0
), lv{step} AS MATERIALIZED (
  SELECT l.vid, coalesce(m.cand, l.comm) AS comm
  FROM lv{prev} l LEFT JOIN mv{step} m ON m.vid = l.vid
)"""
            )
    return pre + "".join(blocks) + f"\nSELECT vid, comm AS community FROM lv{step}"


def cc_threshold_sql(pre: str, threshold: float = 3.0) -> str:
    """Min-vid CC over edges whose synthetic weight >= threshold
    (unionFind threshold semantics, ``GraphUnionFind.java:89-93``)."""
    return (
        pre
        + f"""
, fedges AS MATERIALIZED (SELECT src, dst FROM
    (SELECT src, dst, {SYN_WEIGHT} AS w FROM edges) WHERE w >= {threshold}),
fded AS MATERIALIZED (SELECT src, dst FROM fedges UNION SELECT dst, src FROM fedges),
tcomp AS (
  WITH RECURSIVE r(v, l) AS (
    SELECT vid, vid FROM verts
    UNION
    SELECT e.dst, r.l FROM r JOIN fded e ON e.src = r.v
  ) SELECT v, l FROM r
)
SELECT v AS vid, min(l) AS label FROM tcomp GROUP BY v"""
    )


# ---------------------------------------------------------------------------
# documents: minhash / simhash (md5-based, constants embedded)
# ---------------------------------------------------------------------------

_SHINGLES = """
tk AS (SELECT doc_id, regexp_extract_all(text, '[^ \t\n\r]+') AS l FROM {src}),
gr AS (
  SELECT doc_id, array_to_string(l[i : i + {km1}], ' ') AS g
  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - {km1})) AS i
        FROM tk WHERE len(l) >= {k})
  UNION ALL
  SELECT doc_id, array_to_string(l, ' ') AS g FROM tk WHERE len(l) BETWEEN 1 AND {km1}
),
sh AS (SELECT DISTINCT doc_id, md5_number_lower(g) % 2147483647 AS h FROM gr),
sh64 AS (SELECT DISTINCT doc_id, md5_number_lower(g) AS h64 FROM gr)
"""


def _perm_values(num_perm: int) -> str:
    from .functions.text import minhash_perm_constants

    a, b = minhash_perm_constants(num_perm)
    rows = ", ".join(f"({i}, {int(a[i])}, {int(b[i])})" for i in range(num_perm))
    return f"perms(p, a, b) AS (VALUES {rows})"


def _sig_cte(num_perm: int, k: int, src: str = "documents") -> str:
    """CTE chain computing full minhash signatures {doc_id, perm, mh} over
    ``src`` (a table or CTE with (doc_id, text) columns)."""
    return (
        "WITH "
        + _SHINGLES.format(k=k, km1=k - 1, src=src)
        + f""",
{_perm_values(num_perm)},
rawsig AS (
  SELECT s.doc_id, p.p AS perm, min((p.a * s.h + p.b) % 2147483647) AS mh
  FROM sh s CROSS JOIN perms p GROUP BY s.doc_id, p.p
),
sig AS (
  SELECT d.doc_id, p.p AS perm, coalesce(r.mh, 2147483647) AS mh
  FROM {src} d CROSS JOIN perms p
  LEFT JOIN rawsig r ON r.doc_id = d.doc_id AND r.perm = p.p
)"""
    )


def minhash_signatures_sql(num_perm: int = 64, k: int = 3) -> str:
    # CAST to BIGINT: the VALUES-table perm constants make DuckDB infer
    # INTEGER/HUGEINT for perm/mh, which hash-mismatches the engine's int64
    # even though every value is identical (VERDICT r02 "What's wrong" #1).
    return (
        _sig_cte(num_perm, k)
        + "\nSELECT doc_id, CAST(perm AS BIGINT) AS perm, CAST(mh AS BIGINT) AS mh FROM sig"
    )


def minhash_pairs_sql(
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    max_band_freq: int = 256,
    src: str = "documents",
) -> str:
    """Banded-LSH candidate pairs + exact-jaccard verify.  ``max_band_freq``
    mirrors the engine's band-group fan-out cap (docs.minhash_candidate_pairs):
    a ``(band, band-key)`` bucket with more than this many docs is dropped —
    the classic LSH s²/2 blowup armor (exact-dup mega-clusters are expected
    to be collapsed *before* LSH, as dedup_clusters does)."""
    rows = num_perm // bands
    return (
        _sig_cte(num_perm, k, src=src)
        + f""",
bandk0 AS (
  SELECT doc_id, perm // {rows} AS band,
         string_agg(CAST(mh AS VARCHAR), '|' ORDER BY perm) AS bk
  FROM sig GROUP BY doc_id, perm // {rows}
),
bandk AS (
  SELECT doc_id, band, bk FROM (
    SELECT *, count(*) OVER (PARTITION BY band, bk) AS c FROM bandk0)
  WHERE c <= {max_band_freq}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandk a JOIN bandk b ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS ni
  FROM cand c
  JOIN sh64 x ON x.doc_id = c.id_a
  JOIN sh64 y ON y.doc_id = c.id_b AND y.h64 = x.h64
  GROUP BY c.id_a, c.id_b
),
sizes AS (SELECT doc_id, count(*) AS ns FROM sh64 GROUP BY doc_id),
jac AS (
  SELECT c.id_a, c.id_b,
         CASE WHEN sa.ns IS NULL AND sb.ns IS NULL THEN 1.0
              ELSE coalesce(i.ni, 0) / CAST(greatest(coalesce(sa.ns, 0) + coalesce(sb.ns, 0) - coalesce(i.ni, 0), 1) AS DOUBLE)
         END AS j
  FROM cand c
  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
  LEFT JOIN sizes sa ON sa.doc_id = c.id_a
  LEFT JOIN sizes sb ON sb.doc_id = c.id_b
)
SELECT id_a, id_b, CAST(floor(j * 1000000 + 0.5) AS BIGINT) AS jac_u
FROM jac WHERE j >= {threshold}"""
    )


def ngram_jaccard_sql(threshold: float = 0.5, k: int = 3, max_doc_freq: int = 256) -> str:
    """Inverted-index exact n-gram Jaccard (pipelines/docs.ngram_jaccard_pairs).

    Same stop-gram pruning contract as the engine: grams in more than
    ``max_doc_freq`` docs are excluded from the intersection counts, while the
    per-doc set sizes stay unpruned — both sides compute the identical
    (conservative) jaccard.
    """
    return (
        "WITH "
        + _SHINGLES.format(k=k, km1=k - 1, src="documents")
        + f""",
keep AS (SELECT h64 FROM sh64 GROUP BY h64 HAVING count(*) <= {max_doc_freq}),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
  FROM sh64 a JOIN sh64 b ON a.h64 = b.h64 AND a.doc_id < b.doc_id
  WHERE a.h64 IN (SELECT h64 FROM keep)
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, count(*) AS ns FROM sh64 GROUP BY doc_id),
jac AS (
  SELECT i.id_a, i.id_b, i.ni / CAST(greatest(sa.ns + sb.ns - i.ni, 1) AS DOUBLE) AS j
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
)
SELECT id_a, id_b, CAST(floor(j * 1000000 + 0.5) AS BIGINT) AS jac_u
FROM jac WHERE j >= {threshold}"""
    )


def simhash_signatures_sql() -> str:
    """64-bit SimHash over lowercased whitespace tokens (duplicates counted),
    bit-cast to signed int64 exactly like numpy's uint64 -> int64 view."""
    return """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[^ \t\n\r]+')) AS t
  FROM documents
),
th AS (SELECT doc_id, md5_number_lower(t) AS h FROM tok),
bits AS (
  SELECT doc_id, b.b AS b,
         sum(CASE WHEN (h >> b.b::INTEGER) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM th CROSS JOIN range(64) b(b)
  GROUP BY doc_id, b.b
),
sigu AS (
  SELECT doc_id, sum(CASE WHEN acc > 0 THEN (1::HUGEINT << b::INTEGER) ELSE 0::HUGEINT END) AS u
  FROM bits GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(CASE WHEN coalesce(s.u, 0) >= 9223372036854775808
                 THEN coalesce(s.u, 0) - 18446744073709551616
                 ELSE coalesce(s.u, 0) END AS BIGINT) AS simhash
FROM documents d LEFT JOIN sigu s ON s.doc_id = d.doc_id"""


# ---------------------------------------------------------------------------
# kNN IVF (deterministic quantized bucket/probe decisions)
# ---------------------------------------------------------------------------


def _centroid_cte(n_centroids: int = 16, iters: int = 2, sample: int = 4096) -> str:
    """Trained-quantizer CTE chain ending in ``cent(cid, ce)`` — replays
    ``similarity.coarse_centroids`` exactly: raw-float seeds, quantized-cosine
    argmax assignment (cid-asc ties), per-dim means of 1e-6-quantized raw
    coordinates re-quantized at 1e-9 (every accumulation an exact integer
    sum), empty clusters keep their previous centroid."""
    blocks = [
        f"""base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
samp AS (SELECT vec_id, e FROM base WHERE vec_id < {sample}),
dims AS (SELECT unnest(range(1, (SELECT max(len(e)) FROM samp) + 1)) AS i),
sq AS (SELECT s.vec_id, d.i, CAST(floor(s.e[d.i] * 1000000 + 0.5) AS BIGINT) AS eq
       FROM samp s CROSS JOIN dims d),
c0 AS (SELECT vec_id AS cid, e AS ce FROM base WHERE vec_id < {n_centroids})"""
    ]
    prev = "c0"
    for it in range(1, int(iters) + 1):
        blocks.append(
            f""",
a{it} AS (
  SELECT vec_id, cid FROM (
    SELECT s.vec_id, c.cid,
           row_number() OVER (PARTITION BY s.vec_id
             ORDER BY CAST(floor(list_cosine_similarity(s.e, c.ce) * 1000000 + 0.5) AS BIGINT) DESC,
                      c.cid ASC) AS rn
    FROM samp s CROSS JOIN {prev} c
  ) WHERE rn = 1
),
m{it} AS (
  SELECT a.cid, q.i,
         floor(CAST(sum(q.eq) AS DOUBLE) / (count(*) * 1000000.0) * 1000000000 + 0.5)
           / 1000000000.0 AS v
  FROM a{it} a JOIN sq q ON q.vec_id = a.vec_id
  GROUP BY a.cid, q.i
),
c{it} AS (
  SELECT p.cid, coalesce(n.ce, p.ce) AS ce
  FROM {prev} p
  LEFT JOIN (SELECT cid, list(v ORDER BY i) AS ce FROM m{it} GROUP BY cid) n
  ON n.cid = p.cid
)"""
        )
        prev = f"c{it}"
    blocks.append(f",\ncent AS (SELECT cid, ce FROM {prev})")
    return "".join(blocks)


def embedding_near_dups_sql(
    threshold: float = 0.9, n_centroids: int = 16, nprobe: int = 2, train_iters: int = 2
) -> str:
    """Bucketed embedding-cosine near-dup pairs: vectors multi-probe-assigned
    to their nprobe nearest k-means centroids (quantized-cosine rank, cid-asc
    ties), all-pairs within shared buckets, exact threshold on quantized
    cosine."""
    thr_u = int(np.floor(threshold * 1e6 + 0.5))
    return f"""
WITH {_centroid_cte(n_centroids, train_iters)},
assign AS (
  SELECT vec_id, cid AS bucket FROM (
    SELECT b.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY b.vec_id
             ORDER BY CAST(floor(list_cosine_similarity(b.e, c.ce) * 1000000 + 0.5) AS BIGINT) DESC,
                      c.cid ASC) AS rn
    FROM base b CROSS JOIN cent c
  ) WHERE rn <= {nprobe}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM assign a JOIN assign b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
scored AS (
  SELECT c.id_a, c.id_b,
         CAST(floor(list_cosine_similarity(x.e, y.e) * 1000000 + 0.5) AS BIGINT) AS cos_u
  FROM cand c JOIN base x ON x.vec_id = c.id_a JOIN base y ON y.vec_id = c.id_b
)
SELECT id_a, id_b, cos_u FROM scored WHERE cos_u >= {thr_u}"""


def knn_ivf_sql(
    n_queries: int = 5, k: int = 10, n_centroids: int = 16, nprobe: int = 4, train_iters: int = 2
) -> str:
    return f"""
WITH {_centroid_cte(n_centroids, train_iters)},
q AS (SELECT vec_id AS qid, e AS qe FROM base WHERE vec_id < {n_queries}),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT b.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY b.vec_id
             ORDER BY CAST(floor(list_cosine_similarity(b.e, c.ce) * 1000000 + 0.5) AS BIGINT) DESC,
                      c.cid ASC) AS rn
    FROM base b CROSS JOIN cent c
  ) WHERE rn = 1
),
probe AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.cid,
           row_number() OVER (
             PARTITION BY q.qid
             ORDER BY CAST(floor(list_cosine_similarity(q.qe, c.ce) * 1000000 + 0.5) AS BIGINT) DESC,
                      c.cid ASC) AS rn
    FROM q CROSS JOIN cent c
  ) WHERE rn <= {nprobe}
),
scored AS (
  SELECT p.qid AS query_id, a.vec_id,
         CAST(floor(list_cosine_similarity(b.e, q.qe) * 1000000 + 0.5) AS BIGINT) AS cos_u
  FROM assign a JOIN probe p ON p.cid = a.cid
  JOIN q ON q.qid = p.qid JOIN base b ON b.vec_id = a.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_u DESC, vec_id ASC) AS rn
  FROM scored
)
SELECT query_id, vec_id, cos_u FROM ranked WHERE rn <= {k}"""


_REP_CTES = """
dmap AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep FROM documents),
reps AS (SELECT doc_id, text FROM (
  SELECT doc_id, text, min(doc_id) OVER (PARTITION BY text) AS rep FROM documents)
  WHERE doc_id = rep)"""


def _label_closure_ctes(pairs: str) -> str:
    """p/e/r CTE chain shared by ``dedup_clusters_sql`` and
    ``prepared_corpus_sql``: LSH pair edges + star edges member<->rep, then
    recursive min-label propagation to fixpoint.  ONE definition — the
    cluster semantics of the two oracle-checked queries must never drift."""
    return f"""p AS (
  SELECT id_a, id_b FROM ({pairs})
),
e AS (SELECT id_a AS u, id_b AS v FROM p UNION ALL SELECT id_b, id_a FROM p
      UNION ALL SELECT doc_id, rep FROM dmap WHERE doc_id != rep
      UNION ALL SELECT rep, doc_id FROM dmap WHERE doc_id != rep),
r AS (
  SELECT doc_id AS v, doc_id AS lbl FROM documents
  UNION
  SELECT e.v, r.lbl FROM r JOIN e ON e.u = r.v
)"""


def dedup_clusters_sql(threshold: float = 0.7, max_band_freq: int = 256) -> str:
    """Transitive closure over the SQL-replayed MinHash pair graph
    (pipelines/docs.dedup_clusters): exact duplicates collapse to their
    min-doc_id representative FIRST (star edges member->rep), LSH pairs run
    over representatives only (so the ``max_band_freq`` cap never sees
    exact-dup mega-clusters), then min-label propagation to fixpoint —
    the same recursive-CTE pattern as cc_sql, seeded from the documents
    table (singletons keep themselves)."""
    pairs = minhash_pairs_sql(threshold=threshold, max_band_freq=max_band_freq, src="reps")
    return f"""
WITH RECURSIVE {_REP_CTES},
{_label_closure_ctes(pairs)}
SELECT v AS doc_id, min(lbl) AS cluster, CAST(min(lbl) = v AS BIGINT) AS keep
FROM r GROUP BY v"""


def prepared_corpus_sql(min_quality: int = 2, threshold: float = 0.7) -> str:
    """The composed prep pipeline (pipelines/docs.prepared_corpus): quality
    gate ∩ dedup keepers -> cleaned text + whitespace token count.  The
    quality and clean expressions mirror the standalone quality_scores /
    clean_text oracle contracts verbatim."""
    pairs = minhash_pairs_sql(threshold=threshold, src="reps")
    clean = r"""trim(regexp_replace(regexp_replace(regexp_replace(lower(text),
            '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<email>', 'g'),
            '[0-9]{6,}', '<num>', 'g'),
            '[ \t\n\r]+', ' ', 'g'))"""
    return f"""
WITH RECURSIVE {_REP_CTES},
{_label_closure_ctes(pairs)},
keepers AS (SELECT v AS doc_id FROM r GROUP BY v HAVING min(lbl) = v),
qm AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS n_words,
         len(regexp_extract_all(lower(text), '\\b(?:the|and|of|to|a|in|is|it)\\b')) AS n_stop,
         len(regexp_extract_all(text, '[^A-Za-z0-9 \t\n\r]')) AS n_punct
  FROM documents),
q AS (
  SELECT doc_id FROM qm
  WHERE CAST(n_chars >= 100 AS BIGINT) + CAST(n_words >= 20 AS BIGINT)
        + CAST(CAST(n_stop AS DOUBLE) / greatest(n_words, 1) >= 0.01 AS BIGINT)
        + CAST(n_punct * 2 <= n_words AS BIGINT) >= {min_quality}),
c AS (SELECT doc_id, {clean} AS clean FROM documents)
SELECT c.doc_id, c.clean, len(regexp_extract_all(c.clean, '[^ ]+')) AS n_tokens
FROM c JOIN keepers USING (doc_id) JOIN q USING (doc_id)"""
