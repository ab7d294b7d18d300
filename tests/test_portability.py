"""Driver-cwd portability: the library must work when the driver runs from
a directory OTHER than the repo.

Ray local-mode workers resolve user packages through exactly one propagated
path entry — the driver's cwd at ``ray.init`` time — so a driver importing
the package via a ``sys.path`` edit from elsewhere used to crash every
worker-side package import (actor ``__init__`` lazy imports, module-alias
globals in map fns, which always pickle by reference).  ``portability.py``
fixes this with per-task/per-actor ``runtime_env`` PYTHONPATH overrides,
injected at the raw ``ray.remote`` chokepoints and (via
``install_dataset_portability``) at the UDF-carrying Dataset methods.

The end-to-end case runs in a subprocess with ``cwd=/tmp`` (the cramped
profile's pattern) covering the two failure shapes: a shard-actor pipeline
(pagerank — lazy relative import in actor __init__) and a docs sketch
pipeline (minhash — module-alias globals in map fns).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"

SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import __ray_entry__ as e
qs = e.queries()
for name in ("pagerank", "minhash_pairs"):
    out = qs[name]({sf!r})
    n = out.count() if isinstance(out, ray.data.Dataset) else len(out)
    print("ROWS", name, int(n))
ray.shutdown()
"""


def test_worker_runtime_env_decision():
    from neo4j_graph_algorithms_ray import portability as P

    # from the repo dir the package is worker-visible: no override (the
    # override would force dedicated workers on the normal path)
    cwd = os.getcwd()
    try:
        os.chdir(REPO)
        assert P.worker_runtime_env() is None
        assert P.remote_args() == {}
        os.chdir("/tmp")
        env = P.worker_runtime_env()
        assert env is not None
        assert REPO in env["env_vars"]["PYTHONPATH"]
        assert P.remote_args() == {"runtime_env": env}
    finally:
        os.chdir(cwd)


def test_install_is_idempotent():
    from ray.data import Dataset

    from neo4j_graph_algorithms_ray import portability as P

    assert P.install_dataset_portability()
    first = Dataset.map_batches
    assert P.install_dataset_portability()
    assert Dataset.map_batches is first  # no double wrap


@pytest.mark.cramped
def test_queries_run_from_foreign_cwd():
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} not present")
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=REPO, sf=SF_DIR)],
        cwd="/tmp",  # the failure condition under test
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, f"foreign-cwd run failed:\n{proc.stderr[-3000:]}"
    rows = [l for l in proc.stdout.splitlines() if l.startswith("ROWS ")]
    assert len(rows) == 2, proc.stdout[-1000:]
