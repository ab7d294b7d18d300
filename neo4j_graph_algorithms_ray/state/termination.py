"""Cooperative cancellation — analogue of the reference's ``TerminationFlag``
(``core/.../utils/TerminationFlag.java``, checked inside algorithm inner loops,
e.g. ``PageRank.java:347``; a terminated transaction aborts the run).

Ray shape: the long-running loops here are *driver-side BSP loops* driving
shard-actor pools, so the flag is checked between BSP rounds / source batches
on the driver — cancellation granularity is one round, which is also the
checkpoint granularity.  A checkpointed algorithm cancelled mid-run therefore
leaves its last committed iteration on disk and resumes with ``resume=True``
(state/checkpoint.py); the cancelling path kills its actor pools before
raising, so no CPU reservations leak into the session (see
tests/test_scalars_checkpoint.py for the kill->resume contract).
"""

from __future__ import annotations

import threading
import time


class TerminatedError(RuntimeError):
    """Raised by ``TerminationFlag.assert_running`` once terminated —
    the analogue of the reference's terminated-transaction abort."""


class TerminationFlag:
    """Thread-safe cancel handle.

    - ``terminate()`` — flip the flag (callable from any driver thread).
    - ``running()`` — cheap poll.
    - ``assert_running(where)`` — raise ``TerminatedError`` if terminated;
      algorithm loops call this once per BSP round / source batch.
    - ``deadline_s`` / ``auto_after_checks`` — optional self-triggers: a
      wall-clock budget, or a deterministic "allow k checks, terminate on
      check k+1" used by tests to cancel mid-run without racing the loop.
    """

    def __init__(self, *, deadline_s: float | None = None, auto_after_checks: int | None = None):
        self._ev = threading.Event()
        self._deadline = None if deadline_s is None else time.monotonic() + float(deadline_s)
        self._budget = auto_after_checks
        self._lock = threading.Lock()

    def terminate(self) -> None:
        self._ev.set()

    def running(self) -> bool:
        self._poll_triggers()
        return not self._ev.is_set()

    def assert_running(self, where: str = "") -> None:
        self._poll_triggers()
        if self._ev.is_set():
            raise TerminatedError(f"terminated{': ' + where if where else ''}")

    def _poll_triggers(self) -> None:
        if self._deadline is not None and time.monotonic() >= self._deadline:
            self._ev.set()
        if self._budget is not None:
            with self._lock:
                if self._budget is not None:
                    self._budget -= 1
                    if self._budget < 0:
                        self._ev.set()
