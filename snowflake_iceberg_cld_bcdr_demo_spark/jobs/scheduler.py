"""Task scheduler — the `CREATE TASK … SCHEDULE='5 MINUTE'` wrappers (F5,
`16_sync_task_primary.sql:483-489`, `31:531-537`) and daily cron tasks
(`33:134-139,504-509`) as a driver-side runner.

Faithful semantics: per-task non-overlap
(`ALLOW_OVERLAPPING_EXECUTION = FALSE`, `16:486`) via a mutex,
suspend/resume (`31:328-376` resumes suspended tasks), and a ``tick()``
API so tests drive virtual time instead of sleeping."""

from __future__ import annotations

import threading
import time
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class Task:
    name: str
    fn: Callable[[], object]
    interval_s: float
    suspended: bool = False
    last_started: float | None = None
    last_result: object = None
    last_error: str | None = None
    runs: int = 0
    failures: int = 0
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def due(self, now: float) -> bool:
        if self.suspended:
            return False
        return self.last_started is None or now - self.last_started >= self.interval_s

    def run(self, now: float) -> bool:
        """Run if due; never overlaps (returns False when a run is in
        flight or not yet due)."""
        if not self.due(now):
            return False
        if not self._lock.acquire(blocking=False):
            return False  # ALLOW_OVERLAPPING_EXECUTION = FALSE
        try:
            self.last_started = now
            self.runs += 1
            try:
                self.last_result = self.fn()
                self.last_error = None
            except Exception as exc:  # noqa: BLE001 — task errors are recorded, not fatal
                self.failures += 1
                self.last_error = str(exc)
            return True
        finally:
            self._lock.release()


class Scheduler:
    """Interval scheduler with reference cadences as defaults."""

    def __init__(self) -> None:
        self.tasks: dict[str, Task] = {}

    def add(self, name: str, fn: Callable[[], object], interval_s: float) -> Task:
        task = Task(name=name, fn=fn, interval_s=interval_s)
        self.tasks[name] = task
        return task

    def suspend(self, name: str) -> None:
        self.tasks[name].suspended = True

    def resume(self, name: str) -> None:
        self.tasks[name].suspended = False

    def resume_all(self) -> list[str]:
        """The heartbeat proc's task-resume pass (`31:328-376`)."""
        resumed = [n for n, t in self.tasks.items() if t.suspended]
        for n in resumed:
            self.tasks[n].suspended = False
        return resumed

    def tick(self, now: float | None = None) -> list[str]:
        """Run every due task once; returns names that ran (test-driven
        virtual time — pass ``now`` explicitly)."""
        now = time.time() if now is None else now
        return [name for name, t in sorted(self.tasks.items()) if t.run(now)]

    def run_loop(self, duration_s: float, poll_s: float = 0.5) -> None:
        """Wall-clock loop for demos; tests use tick()."""
        deadline = time.time() + duration_s
        while time.time() < deadline:
            self.tick()
            time.sleep(poll_s)


#: reference cadences (BASELINE.md)
SYNC_INTERVAL_S = 5 * 60
HEARTBEAT_INTERVAL_S = 5 * 60
REPLICATION_INTERVAL_S = 10 * 60
DRIFT_CHECK_INTERVAL_S = 24 * 3600
