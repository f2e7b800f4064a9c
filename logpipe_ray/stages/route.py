"""Predicate fan-out routing stage.

Generalizes the reference's single-sink output selection
(/root/reference/bin/logpipe.js:82-120) to multi-sink predicate
routing (SURVEY.md §2.5 K6): one vectorized pass tags every row with
a ``sink`` column; sinks are then written as a partitioned Parquet
write (no per-sink rescans) or split per sink for heterogeneous sink
types.

Routing rules (FIXTURES.md §4), first match wins:

    deadletter : parse failed (malformed / blank line)
    errors     : level == 'ERROR'
    slow       : response_time > 1000
    <route>    : the enrichment route for the row's source
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .enrich import ROUTE_MAP

SINKS = ["deadletter", "errors", "slow", "unrouted"] + sorted(set(ROUTE_MAP.values()))


def route_batch(batch: pa.Table) -> pa.Table:
    """map_batches body: appends the `sink` column."""
    parse_ok = batch["parse_ok"]
    is_error = pc.equal(batch["level"], "ERROR")
    is_slow = pc.greater(batch["response_time"], 1000)
    sink = pc.if_else(
        pc.invert(parse_ok),
        pa.scalar("deadletter", pa.string()),
        pc.if_else(
            pc.fill_null(is_error, False),
            pa.scalar("errors", pa.string()),
            pc.if_else(
                pc.fill_null(is_slow, False),
                pa.scalar("slow", pa.string()),
                # unknown source (no route) -> explicit 'unrouted' sink
                # so a partitioned write never sees a null key
                pc.fill_null(batch["route"], "unrouted")
                if "route" in batch.column_names
                else pa.scalar("unrouted", pa.string()),
            ),
        ),
    )
    return batch.append_column("sink", sink)
