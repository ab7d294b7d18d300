"""neo4j_graph_algorithms_ray — a Ray-Data-native link-graph analytics engine.

Built from scratch (NOT a port) with the query/data-processing capabilities of
the reference `mneedham/neo4j-graph-algorithms` (Java/Neo4j): it derives an
edge table (``src repo/path -> dst repo/path`` via import extraction from file
content) from a Parquet corpus of source-code repositories with schema
``(repo, path, commit, lang, content)`` and answers the reference's headline
algorithms — PageRank, union-find connected components, label propagation,
triangle counting + clustering coefficients — as iterative gather-scatter over
per-partition CSR shards held in stateful Ray actors, with graph construction,
dedup, degree computation, joins and result assembly expressed as
``ray.data.Dataset`` pipelines (``map_batches`` over zero-copy Arrow batches).

Layering:

- ``sources``   — corpus readers + deterministic synthetic corpus generators
- ``stages``    — stateless Dataset transforms (extract, ids, joins, dedup)
- ``state``     — stateful shard actors (CSR + vertex state), checkpointing
- ``pipelines`` — end-to-end algorithms and data-prep pipelines
- ``functions`` — scalar/vectorized helper kernels

None of this package calls ``ray.init()`` / ``ray.shutdown()`` — the driver,
``bench.py`` or the test fixture owns the Ray session.
"""

__version__ = "0.1.0"
