"""User-extension surface (SURVEY.md §2.12).

The reference lets users add algorithms by implementing ``Algorithm<Self>``
(``algo/.../impl/Algorithm.java:1-64`` — termination flag + progress-logger
plumbing) and registering a ``@Procedure`` class; configuration arrives as an
open key map (``ProcedureConfiguration.get(key, default)``,
``ProcedureConfiguration.java:376+``).  The Ray-Data equivalents:

- ``GraphContext`` — what a custom algorithm receives: the built graph
  (partitioned edge parquet + vertex table + manifest) plus the open config
  map, with ``get(key, default)`` as the ``ProcedureConfiguration`` analogue.
  Extensions compose the same primitives the built-ins use
  (``stages.agg.bucketed_agg``, ``stages.joins.lookup_join``, the shard
  actors in ``state/``) — there is no privileged internal API.
- ``register_procedure(name, write=..., stream=...)`` — installs the
  callable(s) at ``procs.algo.<name>`` / ``algo.<name>.stream`` (dotted names
  nest) and adds a catalog row so ``algo.list()`` reports the extension,
  mirroring ``@Procedure`` registration.

Example::

    from neo4j_graph_algorithms_ray.extension import GraphContext, register_procedure

    def degree_stream(ctx: GraphContext):
        col = "dst" if str(ctx.get("direction", "OUTGOING")).upper() == "INCOMING" else "src"
        from neo4j_graph_algorithms_ray.stages.agg import bucketed_agg
        deg = bucketed_agg(ctx.edges_ds(columns=[col]), col, {"degree": (None, "count")})
        return deg.rename_columns({col: "nodeId"})

    register_procedure("degree", stream=degree_stream)
    algo.degree.stream(edge_table)          # Dataset(nodeId, degree)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import ray.data as rd

from .pipelines.graph_build import BuiltGraph

# names installed onto the algo namespace by register_procedure — the set
# distinguishes "attribute exists because a builtin lives there" (collision)
# from "attribute exists because an earlier extension registered it"
# (latest-wins re-registration, allowed)
_EXTENSION_NAMES: set[str] = set()
# intermediate algo.* Namespace nodes created by dotted extension names —
# registering AT one of these later must not read as "shadows a builtin"
_EXTENSION_NAMESPACES: set[str] = set()


@dataclass
class GraphContext:
    """The resolved graph + open config map handed to a custom algorithm."""

    graph: BuiltGraph
    config: dict = field(default_factory=dict)
    load_millis: int = 0

    def get(self, key: str, default: Any = None) -> Any:
        """``ProcedureConfiguration.get(key, default)`` analogue."""
        return self.config.get(key, default)

    def edges_ds(self, columns=None) -> rd.Dataset:
        return self.graph.edges_ds(columns=columns)

    def vertices_ds(self) -> rd.Dataset:
        return self.graph.vertices_ds()

    @property
    def n_vertices(self) -> int:
        return int(self.graph.n_vertices)

    @property
    def P(self) -> int:
        return int(self.graph.P)


def _wrap(fn: Callable[..., Any]) -> Callable[..., Any]:
    """Adapt ``fn(ctx, **config)`` to the proc calling convention
    ``(graph, config=None, **kw)`` with the facade's graph resolution
    (BuiltGraph | workdir path | edge table — procs._as_graph)."""
    from . import procs

    def proc(graph, config=None, **kw):
        # user extensions get the OPEN config map (ProcedureConfiguration.get
        # semantics) — only built-ins validate keys against the known set
        cfg = procs._cfg(config, kw, strict=False)
        g, load_ms = procs._as_graph(graph, cfg)
        return fn(GraphContext(graph=g, config=cfg, load_millis=load_ms))

    proc.__doc__ = fn.__doc__
    return proc


def register_procedure(
    name: str,
    *,
    write: "Callable | None" = None,
    stream: "Callable | None" = None,
    reference: str = "(user extension)",
) -> None:
    """Install a custom procedure at ``algo.<name>`` (write mode) and/or
    ``algo.<name>.stream``.  ``write``/``stream`` take a ``GraphContext`` and
    return a stats ``pandas.DataFrame`` / a ``ray.data.Dataset``.  Dotted
    names nest namespaces (``'similarity.cosine'`` -> ``algo.similarity.cosine``).
    Re-registering an *extension* name replaces it (latest wins); a name that
    collides with a builtin operator raises instead of silently shadowing the
    builtin's catalog row (ADVICE r04).
    """
    if write is None and stream is None:
        raise ValueError("register_procedure needs at least one of write=/stream=")
    from . import procs
    from .catalog import list_operators, register_operator

    # catalog rows are lowercase ('pagerank') while algo attributes are
    # camelCase ('algo.pageRank') — guard against shadowing via EITHER path
    cat = list_operators()
    hit = cat[cat["name"].str.lower() == name.lower()]
    if len(hit) and hit["kind"].iloc[0] != "extension":
        raise ValueError(
            f"register_procedure({name!r}) collides with the builtin "
            f"{hit['kind'].iloc[0]} operator of the same name — pick another "
            f"name (builtins are listed by algo.list())"
        )

    target = procs.algo
    parts = name.split(".")
    probe = target
    for p in parts:
        probe = getattr(probe, p, None)
        if probe is None:
            break
    if (
        probe is not None
        and name not in _EXTENSION_NAMES
        and name not in _EXTENSION_NAMESPACES
    ):
        # an algo.<name> attribute exists and WE didn't install it (neither
        # as a proc nor as an intermediate namespace a dotted extension
        # created): it's a builtin (e.g. 'pageRank', 'unionFind.forkJoin')
        raise ValueError(
            f"register_procedure({name!r}) would shadow the builtin "
            f"algo.{name} procedure — pick another name"
        )
    _EXTENSION_NAMES.add(name)
    for i, p in enumerate(parts[:-1]):
        nxt = getattr(target, p, None)
        if nxt is None:
            nxt = procs.Namespace()
            setattr(target, p, nxt)
            _EXTENSION_NAMESPACES.add(".".join(parts[: i + 1]))
        target = nxt
    subs = {"stream": _wrap(stream)} if stream is not None else {}
    existing = getattr(target, parts[-1], None)
    if (
        name in _EXTENSION_NAMESPACES
        and isinstance(existing, procs.Namespace)
        and write is None
    ):
        # registering a stream at a namespace node a dotted child created:
        # merge so the child procs survive (latest wins per leaf, not per tree)
        for k, v in subs.items():
            setattr(existing, k, v)
    else:
        entry = procs.Proc(_wrap(write), **subs) if write is not None else procs.Namespace(**subs)
        if isinstance(existing, procs.Namespace) and name in _EXTENSION_NAMESPACES:
            # carry child procs onto the replacing entry (e.g. 'myext.sub'
            # registered before 'myext' gets write=)
            for k, v in vars(existing).items():
                if not hasattr(entry, k):
                    setattr(entry, k, v)
        setattr(target, parts[-1], entry)
    mod = getattr(write or stream, "__module__", "?")
    fn_name = getattr(write or stream, "__qualname__", str(write or stream))
    # catalog rows use bare names ('pagerank', 'louvain', ...) — register
    # extensions the same way so algo.list() has ONE naming convention and
    # unregister_operator takes the same string register_procedure did
    register_operator(name, "extension", reference, f"{mod}.{fn_name}")
