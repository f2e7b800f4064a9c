"""Stateful enrichment stage (actor pool).

The Ray-Data-native replacement for the reference's worker-pool
"enricher" (SURVEY.md §2.3 T9/T10,
/root/reference/src/transformers/workerTransformer.js:10-288,
/root/reference/src/workers/worker.js:142-164): a callable class
passed to ``map_batches(EnrichStage, concurrency=N)`` so the lookup
dictionaries are built ONCE per actor in ``__init__`` (the idiomatic
analog of lazy pool init) and applied vectorized per batch.

Lookups are broadcast-small-side joins: the dimension tables are tiny
Arrow arrays held in the actor; per-batch application is
``pc.index_in`` + ``take`` — never a shuffle join. For a real
multi-node deployment, pass an ``ray.put`` ObjectRef of the tables to
``__init__`` (supported via ``tables_ref``) so they ship once per
node, not once per batch.

Added columns: geo (from ip first octet), severity (from level),
route (from source).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

GEO_REGIONS = ["AF", "AN", "AS", "EU", "NA", "OC", "SA", "UN"]
SEVERITY_MAP = {"INFO": 1, "WARN": 2, "ERROR": 3}
ROUTE_MAP = {
    "auth": "sink_auth",
    "payments": "sink_payments",
    "orders": "sink_orders",
    "api-gateway": "sink_gateway",
}


def default_lookup_tables() -> dict:
    """The enrichment dimension 'tables' (FIXTURES.md §3)."""
    return {
        "geo_by_octet": [GEO_REGIONS[o % len(GEO_REGIONS)] for o in range(256)],
        "severity": SEVERITY_MAP,
        "route": ROUTE_MAP,
    }


_PROC_ENRICHER = None


def enrich_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task variant of EnrichStage with per-process cached
    lookup state (built on first batch in each worker process, then
    reused — the task-pool analog of actor ``__init__``). Preferred on
    a warm shared worker pool; use the EnrichStage actor pool when the
    state is heavyweight (models, large dictionaries)."""
    global _PROC_ENRICHER
    if _PROC_ENRICHER is None:
        _PROC_ENRICHER = EnrichStage()
    return _PROC_ENRICHER(batch)


class EnrichStage:
    """Actor-pool map_batches callable: lookup-dictionary enrichment."""

    def __init__(self, tables_ref=None):
        if tables_ref is not None:
            import ray

            tables = ray.get(tables_ref)
        else:
            tables = default_lookup_tables()
        self._geo = pa.array(tables["geo_by_octet"], pa.string())
        sev = tables["severity"]
        self._sev_keys = pa.array(list(sev.keys()), pa.string())
        self._sev_vals = pa.array(list(sev.values()), pa.int32())
        route = tables["route"]
        self._route_keys = pa.array(list(route.keys()), pa.string())
        self._route_vals = pa.array(list(route.values()), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows

        def col_or_null(name: str):
            # tolerate missing columns (reference schemaless tolerance,
            # SURVEY.md §1.1): raw log tables carry 'service', the
            # tokenized table carries 'source'; absent fields enrich
            # to null rather than raising.
            if name in batch.column_names:
                c = batch[name]
                return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            return pa.nulls(n, pa.string())

        ip = col_or_null("ip")
        # 1-3 digit octet only (anything else -> null); modulo the
        # table size so out-of-range octets (e.g. "300.") can never
        # index past the 256-entry geo array
        octet_str = pc.struct_field(
            pc.extract_regex(ip, r"^(?P<o>\d{1,3})\."), "o"
        )
        octet = pc.cast(octet_str, pa.int32())
        octet = pc.bit_wise_and(octet, 255)
        geo = pc.take(self._geo, octet)

        sev_idx = pc.index_in(col_or_null("level"), self._sev_keys)
        severity = pc.take(self._sev_vals, sev_idx)

        source = batch["source"] if "source" in batch.column_names else col_or_null("service")
        route_idx = pc.index_in(source, self._route_keys)
        route = pc.take(self._route_vals, route_idx)

        out = batch.append_column("geo", geo)
        out = out.append_column("severity", severity)
        out = out.append_column("route", route)
        return out
