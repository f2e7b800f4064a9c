"""Single-process pure-Python oracle re-implementing reference semantics.

Used by pytest to check the Ray engine (SURVEY.md §5): conjunctive
filter, malformed-line skip, null-key aggregation bypass, routing
rules, enrichment lookups. Intentionally row-at-a-time and naive —
the opposite design from the engine, so agreement is meaningful.
"""

from __future__ import annotations

import json
from collections import Counter, defaultdict

from logpipe_ray.stages.enrich import GEO_REGIONS, ROUTE_MAP, SEVERITY_MAP


def parse_line(line: str) -> dict | None:
    try:
        rec = json.loads(line) if line else None
    except Exception:
        return None
    return rec if isinstance(rec, dict) else None


def enrich(rec: dict) -> dict:
    octet = int(rec["ip"].split(".")[0])
    rec = dict(rec)
    rec["geo"] = GEO_REGIONS[octet % len(GEO_REGIONS)]
    rec["severity"] = SEVERITY_MAP.get(rec["level"], 0)
    return rec


def route(rec: dict | None, source: str) -> str:
    if rec is None:
        return "deadletter"
    if rec.get("level") == "ERROR":
        return "errors"
    if rec.get("responseTime", 0) > 1000:
        return "slow"
    return ROUTE_MAP[source]


def run(rows: list[dict]) -> dict:
    """rows: [{doc_id, line, source}] -> oracle outputs."""
    sink_docs: dict[str, set] = defaultdict(set)
    counts: Counter = Counter()
    level_counts: Counter = Counter()
    stats: dict[str, dict] = {}
    for row in rows:
        rec = parse_line(row["line"])
        sink = route(rec, row["source"])
        sink_docs[sink].add(row["doc_id"])
        counts[(row["source"], sink)] += 1
        if rec is not None:
            level = rec.get("level")
            if level is not None:
                level_counts[level] += 1
                rt = rec.get("responseTime")
                if rt is not None:
                    s = stats.setdefault(
                        level, {"cnt": 0, "sum": 0, "min": None, "max": None}
                    )
                    s["cnt"] += 1
                    s["sum"] += rt
                    s["min"] = rt if s["min"] is None else min(s["min"], rt)
                    s["max"] = rt if s["max"] is None else max(s["max"], rt)
    for s in stats.values():
        s["avg"] = s["sum"] / s["cnt"]
    return {
        "sink_docs": dict(sink_docs),
        "counts": dict(counts),
        "level_counts": dict(level_counts),
        "stats": stats,
    }
