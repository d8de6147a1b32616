"""Named timers (proc_capture / proc_show_elapsed,
pkg_batch_util_body.sql:39-86).

Semantics preserved exactly:
- capture() appends (now, context) — duplicates allowed;
- show_elapsed() scans ALL entries for a case-insensitive context match
  and keeps the LAST one (body.sql:62-68);
- message is ``prefix + H:M:S`` or ``'Total Time Taken ' + H:M:S`` when
  the prefix is None; an unknown context logs None (body.sql:69-83).
"""

from __future__ import annotations

from etl_batch_spark.functions.scalars import datediff_hms
from etl_batch_spark.orchestration.clock import Clock


class Timer:
    def __init__(self, clock: Clock | None = None, log=None):
        self.clock = clock or Clock()
        self._entries: list[tuple[object, str | None]] = []
        self._log = log or (lambda msg: None)

    def capture(self, context: str | None = None) -> None:
        self._entries.append((self.clock.now(), context))

    def show_elapsed(self, prefix: str | None = None, context: str | None = None) -> str | None:
        last_timing = None
        for ts, ctx in self._entries:
            if ctx is not None and context is not None and context.upper() == ctx.upper():
                last_timing = ts
        if last_timing is None:
            message = None
        else:
            elapsed = datediff_hms(last_timing, self.clock.now())
            message = f"Total Time Taken {elapsed}" if prefix is None else f"{prefix}{elapsed}"
        self._log(message)
        return message
