"""Live progress reporting — rows/s, %, ETA on a fixed cadence.

Parity with the reference's byte-level progress machinery
(/root/reference/src/utils/progressTracker.js:49-64 — report every
5 s with percent + speed; progressStream.js:5-38 — passthrough stage
feeding it). Our unit is rows (the engine is columnar; bytes are a
file-format detail), fed by per-shard lineage metrics as each fused
shard task completes, so the cadence is real streaming progress, not
a post-hoc summary.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable

logger = logging.getLogger(__name__)

REPORT_INTERVAL_S = 5.0  # reference default (progressTracker.js:23)


class ProgressTracker:
    """Accumulates processed units and emits a throughput/ETA line at
    most every ``interval`` seconds (plus a final summary).

    ``emit`` and ``clock`` are injectable for tests; default emission
    is logging.info, default clock time.monotonic.
    """

    def __init__(
        self,
        total: int | None = None,
        interval: float = REPORT_INTERVAL_S,
        unit: str = "rows",
        emit: Callable[[str], None] | None = None,
        clock: Callable[[], float] = time.monotonic,
    ) -> None:
        self.total = total
        self.interval = interval
        self.unit = unit
        self.emit = emit if emit is not None else logger.info
        self.clock = clock
        self.start = clock()
        self.processed = 0
        self._last_report = self.start

    def add(self, n: int) -> None:
        self.processed += int(n)
        now = self.clock()
        if now - self._last_report >= self.interval:
            self._last_report = now
            self.emit(self.format_line(now))

    def format_line(self, now: float | None = None) -> str:
        now = self.clock() if now is None else now
        elapsed = max(now - self.start, 1e-9)
        rate = self.processed / elapsed
        parts = [f"processed {self.processed:,} {self.unit}"]
        if self.total:
            parts[0] += f" ({100.0 * self.processed / self.total:.1f}%)"
        parts.append(f"{rate:,.0f} {self.unit}/s")
        if self.total and rate > 0 and self.processed < self.total:
            parts.append(f"ETA {(self.total - self.processed) / rate:.1f}s")
        return " | ".join(parts)

    def finish(self) -> None:
        elapsed = max(self.clock() - self.start, 1e-9)
        self.emit(
            f"done: {self.processed:,} {self.unit} in {elapsed:.1f}s "
            f"({self.processed / elapsed:,.0f} {self.unit}/s)"
        )
