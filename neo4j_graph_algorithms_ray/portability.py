"""Worker-side import portability for drivers running outside the repo dir.

Ray local-mode workers resolve user packages through exactly one propagated
path entry: the driver's *cwd at ``ray.init`` time*.  Driver-side
``sys.path`` edits and post-init ``PYTHONPATH`` changes never reach workers,
so a driver that imports this package from any other directory crashes every
worker-side package import (actor ``__init__`` lazy imports, module-alias
globals in map fns — module objects always pickle by reference).  Shipping
code by value (``cloudpickle.register_pickle_by_value``) cannot fix the
module-alias case and is not used.

The supported fix is per-task/per-actor ``runtime_env`` env vars: a worker
started with ``PYTHONPATH=<package parent>`` imports everything normally.
``worker_runtime_env()`` decides whether that override is needed (None in
the common importable cases — cwd == parent, or the package is properly
installed in site-packages) so the normal path keeps default shared workers
with zero startup overhead.  On a real multi-node cluster the right answer
is installing the package on every node (or ``runtime_env py_modules`` at
``ray.init``); this module is the single-node / shared-filesystem bridge.
"""

from __future__ import annotations

import functools
import os
import sys

_PKG_PARENT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PKG_NAME = __name__.split(".")[0]


def _default_visible_dirs() -> set[str]:
    """Path entries a fresh Ray worker resolves imports from WITHOUT any
    runtime_env: the driver's cwd plus the interpreter's standard site dirs."""
    dirs = {os.getcwd()}
    try:
        import site

        dirs.update(site.getsitepackages())
        dirs.add(site.getusersitepackages())
    except Exception:
        pass
    return dirs


def worker_runtime_env() -> dict | None:
    """``runtime_env`` that makes this package importable on workers, or
    None when no override is needed (the override forces dedicated worker
    processes, so it must stay off on the normal path)."""
    if _PKG_PARENT in _default_visible_dirs():
        return None
    pp = os.environ.get("PYTHONPATH")
    path = _PKG_PARENT + ((os.pathsep + pp) if pp else "")
    return {"env_vars": {"PYTHONPATH": path}}


def remote_args() -> dict:
    """Splat into ``ray.remote(...)`` / ``.options(...)`` at raw actor/task
    creation sites: ``{}`` normally, ``{"runtime_env": ...}`` when the
    package needs the path override."""
    env = worker_runtime_env()
    return {"runtime_env": env} if env is not None else {}


_INSTALLED = False

# Dataset methods that accept ``**ray_remote_args`` and carry user callables
# to workers (reads/writes/sorts/native aggs run only Ray Data internals and
# need no override).
_DATASET_METHODS = ("map_batches", "map", "flat_map", "filter", "add_column")
_GROUPED_METHODS = ("map_groups",)


def _wrap(method):
    @functools.wraps(method)
    def wrapped(self, *args, **kwargs):
        if "runtime_env" not in kwargs:
            env = worker_runtime_env()  # evaluated per call: cwd can change
            if env is not None:
                kwargs["runtime_env"] = env
        return method(self, *args, **kwargs)

    wrapped.__wrapped_portability__ = True
    return wrapped


def install_dataset_portability() -> bool:
    """Idempotently wrap the UDF-carrying Ray Data methods so every stage
    ships the PYTHONPATH override when (and only when) it is needed.  A
    library-wide chokepoint beats threading ``ray_remote_args`` through
    every ``map_batches`` call site; when no override is needed the wrapper
    adds nothing.  Returns True when installed (or already installed)."""
    global _INSTALLED
    if _INSTALLED:
        return True
    try:
        from ray.data import Dataset
        from ray.data.grouped_data import GroupedData
    except Exception:
        return False
    for cls, names in ((Dataset, _DATASET_METHODS), (GroupedData, _GROUPED_METHODS)):
        for name in names:
            m = getattr(cls, name, None)
            if m is not None and not getattr(m, "__wrapped_portability__", False):
                setattr(cls, name, _wrap(m))
    _INSTALLED = True
    return True


def ensure_importable(parent: str = _PKG_PARENT) -> None:
    """Worker-side belt-and-braces for lazy package imports: insert the
    package parent (captured at driver serialize time; valid on any
    shared-filesystem worker) before an in-function relative import."""
    if _PKG_NAME in sys.modules:
        return
    if parent not in sys.path and os.path.isdir(os.path.join(parent, _PKG_NAME)):
        sys.path.insert(0, parent)
