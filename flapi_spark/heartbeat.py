"""Heartbeat / scheduled-refresh worker.

Reference: src/heartbeat_worker.cpp drives periodic endpoint
executions and schedule-based cache refreshes ("schedule: 5m"). The
Spark-native version is a daemon thread that invokes registered jobs
on their interval; cache configs plug in via their `schedule` field.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Callable

from flapi_spark.cache import parse_duration


@dataclass
class _Job:
    name: str
    interval_s: float
    fn: Callable[[], None]
    next_due: float = 0.0
    runs: int = 0
    errors: int = 0
    last_error: str | None = None


class HeartbeatWorker:
    def __init__(self, tick_s: float = 0.05):
        self._jobs: dict[str, _Job] = {}
        self._tick_s = tick_s
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._lock = threading.Lock()

    def add_job(self, name: str, schedule: str | float, fn: Callable[[], None]) -> None:
        interval = (
            float(schedule)
            if isinstance(schedule, (int, float))
            else float(parse_duration(schedule))
        )
        with self._lock:
            self._jobs[name] = _Job(
                name=name, interval_s=interval, fn=fn,
                next_due=time.monotonic() + interval,
            )

    def start(self) -> None:
        if self._thread is not None:
            return
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def run_pending(self, now: float | None = None) -> int:
        """Run all due jobs once (also usable synchronously in tests)."""
        now = time.monotonic() if now is None else now
        ran = 0
        with self._lock:
            due = [j for j in self._jobs.values() if j.next_due <= now]
        for job in due:
            try:
                job.fn()
                job.runs += 1
            except Exception as exc:  # jobs must not kill the worker
                job.errors += 1
                job.last_error = str(exc)
            job.next_due = now + job.interval_s
            ran += 1
        return ran

    def stats(self) -> dict[str, dict]:
        with self._lock:
            return {
                name: {"runs": j.runs, "errors": j.errors, "last_error": j.last_error}
                for name, j in self._jobs.items()
            }

    def _run(self) -> None:
        while not self._stop.is_set():
            self.run_pending()
            self._stop.wait(self._tick_s)
