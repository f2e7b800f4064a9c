"""Run profiler — wall / CPU / memory / per-mark durations to JSON.

Parity with the reference's Profiler (SURVEY.md §2.1 S6 and §6,
/root/reference/src/utils/profiler.js:54-318: CPU avg, memory
peak/avg, per-mark durations, JSON report files). Python equivalents:
resource.getrusage for CPU+RSS, time.monotonic marks, and optionally
a ray.data stats string per marked dataset.

    prof = Profiler()
    with prof.mark("parse"):
        ...
    prof.write_report("/tmp/report.json")
"""

from __future__ import annotations

import json
import os
import resource
import time
from contextlib import contextmanager


class Profiler:
    def __init__(self):
        self._t0 = time.monotonic()
        self._ru0 = resource.getrusage(resource.RUSAGE_SELF)
        self.marks: dict[str, dict] = {}
        self.extra: dict = {}

    @contextmanager
    def mark(self, name: str):
        t = time.monotonic()
        try:
            yield
        finally:
            entry = self.marks.setdefault(name, {"calls": 0, "wall_s": 0.0})
            entry["calls"] += 1
            entry["wall_s"] += time.monotonic() - t

    def add_stats(self, name: str, stats: str) -> None:
        """Attach a ray Dataset .stats() string to the report."""
        self.extra[name] = stats

    def report(self) -> dict:
        ru = resource.getrusage(resource.RUSAGE_SELF)
        wall = time.monotonic() - self._t0
        cpu = (ru.ru_utime + ru.ru_stime) - (self._ru0.ru_utime + self._ru0.ru_stime)
        return {
            "wall_s": round(wall, 3),
            "cpu_s": round(cpu, 3),
            "cpu_avg_pct": round(100.0 * cpu / wall, 1) if wall > 0 else None,
            "max_rss_mb": round(ru.ru_maxrss / 1024, 1),
            "marks": {
                k: {"calls": v["calls"], "wall_s": round(v["wall_s"], 4)}
                for k, v in self.marks.items()
            },
            "datasets": self.extra,
        }

    def write_report(self, path: str) -> dict:
        rep = self.report()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rep, f, indent=1)
        os.rename(tmp, path)
        return rep
