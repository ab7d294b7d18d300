"""Driver-side failover for shard-actor pools.

The reference runs in one JVM and simply dies with it; the north rule
requires the distributed engine to survive a *worker* death mid-algorithm
without a driver restart (SURVEY.md §4.2 "actor-held CSR/vertex state must
be reconstructible").  Protocol, layered on :mod:`.checkpoint`:

- shard actors are created with ``max_restarts > 0`` whenever a checkpoint
  directory is configured, so Ray revives a dead shard process and re-runs
  ``__init__`` — which rebuilds the CSR from the graph's immutable
  partitioned Parquet and (when ``ckpt_dir`` was passed) rehydrates vertex
  state from the latest committed manifest;
- a revived shard alone is NOT a correct BSP state: its peers have advanced
  past the manifest.  Every shard carries a per-process ``incarnation``
  token (``uuid4`` at ``__init__``); the driver records the pool's baseline
  after creation and re-verifies it at every checkpoint commit and before
  collecting final results.  A mismatch — or any ``RayActorError`` from an
  exchange — triggers a *pool-wide rollback*: wait for every handle to be
  callable again (restarts take a moment; calls raise
  ``ActorUnavailableError`` in the window), load the manifest's state files
  into ALL shards, and resume the iteration loop from the manifest's
  iteration.

Why the incarnation check is load-bearing: a kill that lands in an idle
window (between BSP waves) surfaces NO exception — Ray silently restarts
the actor and subsequent calls run against its fresh state.  Only tasks
in-flight or queued at death raise.  Exceptions alone would let a
fresh-state shard poison the run undetected.

Rollback safety: shard actors are synchronous, so ``load_state`` serializes
behind any still-queued exchange tasks — tasks whose dependencies failed
are dropped without executing, tasks with live dependencies (rounds at or
before the failure) finish first and are then overwritten.  No lock needed.
"""

from __future__ import annotations

import time

import ray

from .checkpoint import CheckpointManager, files_by_part

# ActorDiedError / ActorUnavailableError both subclass RayActorError; a task
# whose *dependency* carried one re-raises the stored error at ray.get.
FAILOVER_ERRORS = (ray.exceptions.RayActorError,)


class ShardRestartDetected(RuntimeError):
    """A shard restarted between checkpoints without raising (idle-window
    kill); the pool's BSP state is inconsistent and must be rolled back."""

    def __init__(self, parts: list[int]):
        super().__init__(f"shard(s) {parts} restarted since the last verified wave")
        self.parts = parts


def pool_incarnations(actors, timeout_s: float = 120.0) -> list[str]:
    """Collect every shard's incarnation token, retrying through restart
    windows (``ActorUnavailableError``) up to ``timeout_s``.

    Raises the last error if a shard never comes back (``max_restarts``
    exhausted surfaces as ``ActorDiedError``, which is terminal)."""
    deadline = time.monotonic() + timeout_s
    while True:
        try:
            return ray.get([a.whoami.remote() for a in actors])
        except ray.exceptions.ActorDiedError:
            raise
        except FAILOVER_ERRORS:
            if time.monotonic() >= deadline:
                raise
            time.sleep(0.5)


def verify_incarnations(actors, baseline: list[str]) -> None:
    """Raise :class:`ShardRestartDetected` if any shard's token changed."""
    now = pool_incarnations(actors)
    changed = [p for p, (a, b) in enumerate(zip(now, baseline)) if a != b]
    if changed:
        raise ShardRestartDetected(changed)


def rollback_pool(
    actors, ckpt: CheckpointManager, *, algo: str, bounds
) -> tuple[int, list[str]]:
    """Restore EVERY shard to the last committed manifest (or to pristine
    ``reset()`` state when nothing was committed yet).

    Returns ``(start_iter, new_incarnation_baseline)`` — the iteration the
    resumed loop should continue from and the post-rollback tokens."""
    baseline = pool_incarnations(actors)  # also waits out restart windows
    m = ckpt.latest()
    if m is None:
        ray.get([a.reset.remote() for a in actors])
        return 0, baseline
    ckpt.validate_resume(m, algo=algo, bounds=bounds)
    files = files_by_part(m["files"])
    ray.get([actors[p].load_state.remote(files[p]) for p in range(len(actors))])
    return int(m["iteration"]) + 1, baseline
