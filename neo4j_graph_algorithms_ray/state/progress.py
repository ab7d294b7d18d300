"""Throttled progress reporting for long BSP driver loops.

Reference parity: the reference throttle-logs percentage progress from every
long-running algorithm via ``core/src/main/java/org/neo4j/graphalgo/core/
utils/ProgressLogger.java`` (``logProgress`` gated by a wall-clock throttle)
and surfaces import progress through ``ImportProgress.java``.  This module is
the Ray-side analogue: each pipeline's driver loop calls ``report()`` once
per iteration / batch / outer round, and the reporter throttles *delivery*
to the user callback (and optional ``logging.Logger``) so a multi-hour run
emits a bounded event stream regardless of round count.

Zero overhead when unset: pipelines take ``on_progress=None`` and build a
reporter only when a callback or logger was supplied (``make_reporter``
returns ``None`` otherwise), so the per-round cost in the default path is a
single ``is not None`` check.
"""

from __future__ import annotations

import time
from typing import Callable, Optional


class ProgressReporter:
    """Throttled per-iteration progress events.

    ``callback(event: dict)`` fires at most once per ``interval_s`` wall
    seconds; the FIRST report and any report flagged ``final=True`` always
    fire (the reference ProgressLogger's throttle semantics — never silent
    at the start or end of a run).  ``interval_s=0`` delivers every report
    (tests assert cadence this way).

    Every ``report()`` — delivered or throttled — updates ``reports`` and
    ``last``, so result ``metrics`` can surface terminal progress without
    any callback; ``events`` counts actually-delivered events.
    """

    def __init__(
        self,
        callback: Optional[Callable[[dict], None]] = None,
        *,
        interval_s: float = 10.0,
        logger=None,
        algo: str = "",
    ):
        self.callback = callback
        self.interval_s = float(interval_s)
        self.logger = logger
        self.algo = algo
        self.reports = 0
        self.events = 0
        self.last: Optional[dict] = None
        self._last_t: Optional[float] = None  # None => first report fires

    def report(self, iteration: int, *, final: bool = False, **fields) -> None:
        ev = {"algo": self.algo, "iteration": int(iteration)}
        ev.update(fields)
        self.reports += 1
        self.last = ev
        now = time.perf_counter()
        if (
            not final
            and self._last_t is not None
            and (now - self._last_t) < self.interval_s
        ):
            return
        self._last_t = now
        self.events += 1
        if self.callback is not None:
            self.callback(dict(ev))
        if self.logger is not None:
            kv = " ".join(f"{k}={v}" for k, v in fields.items())
            self.logger.info("[%s] iteration=%d %s", self.algo, iteration, kv)

    def summary(self) -> dict:
        """Merged into the pipeline result's ``metrics``."""
        return {"progress_reports": self.reports, "progress_events": self.events}


def make_reporter(
    on_progress: Optional[Callable[[dict], None]],
    interval_s: float,
    algo: str,
    logger=None,
) -> Optional[ProgressReporter]:
    """``None`` when nothing would consume events — callers guard with
    ``if prog is not None`` so the default path costs one branch per round."""
    if on_progress is None and logger is None:
        return None
    return ProgressReporter(on_progress, interval_s=interval_s, logger=logger, algo=algo)
