"""Import/dependency extraction: corpus rows -> string edge table.

The reference engine's real input contract is an edge table — its own Cypher
projection loader accepts arbitrary ``source,target[,weight]`` rows
(``HeavyCypherGraphFactory.java:91-169``).  This stage derives that edge table
from file *content*: per-language compiled regexes find import statements and
resolve them to intra-repo file paths.

Emitted schema: ``{src_key: string, dst_key: string, weight: float64}`` where
``key = repo + '/' + path``.  Unresolvable imports (e.g. stdlib modules with
no corresponding file) survive to the dense-id join, which drops them (inner
join against the vertex table) — mirroring the reference loading only
relationships between scanned nodes.

Weights ride on an optional ``  # w=<float>`` suffix (FIXTURES.md §0);
absent -> 1.0 (reference default, ``ProcedureConfiguration.getWeightPropertyDefaultValue``).

This is a stateful ``map_batches`` stage: regexes are compiled once per actor
in ``__init__``, batches are processed vectorized via pandas ``str.extractall``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

EDGE_SCHEMA = pa.schema(
    [("src_key", pa.string()), ("dst_key", pa.string()), ("weight", pa.float64())]
)

# per-lang: (pattern with groups (module, weight?), module->relpath resolver)
# line anchors accept an optional trailing \r: with (?m) `$` matches before
# \n only, so CRLF content would otherwise yield ZERO edges silently
_WEIGHT_SFX = r"(?:  # w=([0-9.]+))?"
_LANG_RULES: dict[str, tuple[str, str]] = {
    # group 1 = module, group 2 = optional weight
    "py": (r"(?m)^(?:import|from) ([A-Za-z_][A-Za-z0-9_.]*)(?: import [A-Za-z_*][A-Za-z0-9_]*)?" + _WEIGHT_SFX + r"\r?$", "dotted_py"),
    "js": (r"(?m)^import .* from '\./([A-Za-z0-9_/.-]+)'" + _WEIGHT_SFX + r"\r?$", "rel_js"),
    "java": (r"(?m)^import ([A-Za-z_][A-Za-z0-9_.]*);" + _WEIGHT_SFX + r"\r?$", "dotted_java"),
    "c": (r'(?m)^#include "([A-Za-z0-9_/.-]+)"' + _WEIGHT_SFX + r"\r?$", "verbatim"),
    "go": (r'(?m)^import "([A-Za-z0-9_/.-]+)"' + _WEIGHT_SFX + r"\r?$", "suffix_go"),
}


def _resolve(modules: pd.Series, how: str) -> pd.Series:
    if how == "dotted_py":
        return modules.str.replace(".", "/", regex=False) + ".py"
    if how == "dotted_java":
        return modules.str.replace(".", "/", regex=False) + ".java"
    if how == "rel_js":
        return modules.where(modules.str.endswith(".js"), modules + ".js")
    if how == "suffix_go":
        return modules + ".go"
    return modules  # verbatim (C includes)


class ImportExtractor:
    """Callable class for ``ds.map_batches(ImportExtractor, batch_format='pyarrow')``."""

    def __init__(self, default_weight: float = 1.0):
        self.default_weight = default_weight
        self.rules = {lang: (re.compile(pat), how) for lang, (pat, how) in _LANG_RULES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        repo = batch["repo"].to_pandas()
        path = batch["path"].to_pandas()
        lang = batch["lang"].to_pandas()
        content = batch["content"].to_pandas()
        src_key_all = repo + "/" + path

        outs: list[pd.DataFrame] = []
        for lg in lang.unique():
            rule = self.rules.get(lg)
            if rule is None:
                continue
            pat, how = rule
            mask = lang == lg
            hits = content[mask].str.extractall(pat)  # index: (row, match); cols 0=mod, 1=weight
            if hits.empty:
                continue
            row_idx = hits.index.get_level_values(0)
            df = pd.DataFrame(
                {
                    "src_key": src_key_all.loc[row_idx].to_numpy(),
                    "dst_key": (repo.loc[row_idx].to_numpy() + "/" + _resolve(hits[0], how).to_numpy()),
                    "weight": pd.to_numeric(hits[1], errors="coerce").fillna(self.default_weight).to_numpy(),
                }
            )
            outs.append(df)

        if not outs:
            return EDGE_SCHEMA.empty_table()
        out = pd.concat(outs, ignore_index=True)
        # strip the b'pandas' metadata from_pandas attaches even with schema=
        # (an unhashable schema defeats Ray's block-schema dedup downstream)
        return pa.Table.from_pandas(
            out, schema=EDGE_SCHEMA, preserve_index=False
        ).replace_schema_metadata(None)


def extract_edges(corpus_ds, *, default_weight: float = 1.0, concurrency=None):
    """corpus Dataset -> string edge Dataset (``src_key, dst_key, weight``).

    Pool sizing defaults to ``actor_pool_args`` so the extractor actors
    cannot starve concurrent stages on a cramped session (a fixed
    min-1-actor x 1 CPU reservation livelocked ``num_cpus=2`` when chained
    with the vid-mapper pool downstream)."""
    from .agg import actor_pool_args

    pool = {"concurrency": concurrency} if concurrency is not None else actor_pool_args(8)
    return corpus_ds.map_batches(
        ImportExtractor,
        fn_constructor_kwargs={"default_weight": default_weight},
        batch_format="pyarrow",
        batch_size=4096,
        **pool,
    )
