"""Injectable clock — the reference's SYSDATE / DBMS_LOCK.sleep seam.

The reference hardcodes 120 s dependency polls and 600 s scheduler
sleeps (pkg_batch_util_body.sql:325, 959); making time injectable keeps
those semantics testable without wall-clock waits (SURVEY.md §7 risks).
"""

from __future__ import annotations

import time
from datetime import datetime, timedelta


class Clock:
    def now(self) -> datetime:
        return datetime.now()

    def sleep(self, seconds: float) -> None:
        time.sleep(seconds)


class FakeClock(Clock):
    """Deterministic clock for tests: sleep() advances virtual time."""

    def __init__(self, start: datetime | None = None):
        self._now = start or datetime(2026, 1, 1, 8, 0, 0)
        self.sleeps: list[float] = []

    def now(self) -> datetime:
        return self._now

    def sleep(self, seconds: float) -> None:
        self.sleeps.append(seconds)
        self._now += timedelta(seconds=seconds)

    def advance(self, seconds: float) -> None:
        self._now += timedelta(seconds=seconds)
