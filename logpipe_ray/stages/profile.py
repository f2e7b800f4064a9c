"""Column profiling: per-column row/null/exact-distinct counts in one
long table — the data-audit pass (deequ/profiler shape) run before a
corpus lands in training.

Reference scope note: the reference (vellascogabriel/logpipe) exposes
only runtime counters (src/transformers/baseTransformer.js:101-108);
a first-class profile operator is part of this engine's §2.6+ surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count, Sum


def profile_columns(ds: Dataset, columns: list[str]) -> Dataset:
    """Per-column (n_rows, n_null, n_distinct) over ``ds`` — exact,
    SQL-replayable (n_distinct counts DISTINCT NON-NULL values, the
    SQL COUNT(DISTINCT col) contract).

    Scale shape: ONE streaming pass emits per-batch partials that are
    already collapsed three ways — (a) row/null counts fold to a
    single row per (column, batch); (b) each column's values dedup
    IN-BATCH before anything moves, so the only exchange per column is
    a keyed dedup bounded by that column's distinct values (never
    rows); (c) the distinct-count finish is count partials + a tiny
    keyed Sum. Values of every type ride one unified dedup lane as
    (column, 64-bit canonical hash) pairs — strings/binaries hash via
    a vectorized FNV-1a fold, numerics/temporals via their 64-bit
    pattern; collisions (~d²/2^65 per column) are the documented
    hash-identity bound shared with sequence_dedup_stats. High-
    cardinality columns stay exact but pay their true distinct volume;
    swap the lane for a KMV sketch (functions/sketches.py) when an
    estimate suffices."""

    def _hash64(col: pa.Array) -> np.ndarray:
        """Canonical 64-bit value hash per element (nulls -> dropped
        by the caller). Vectorized for every Arrow type family."""
        t = col.type
        if pa.types.is_floating(t):
            arr = np.asarray(col.cast(pa.float64())) + 0.0
            # +0.0 normalizes -0.0 to 0.0 (SQL equality collapses them;
            # the raw bit patterns differ)
            return arr.view(np.uint64)
        if pa.types.is_integer(t):
            return (
                np.asarray(col.cast(pa.int64(), safe=False))
                .astype(np.int64)
                .view(np.uint64)
            )
        if pa.types.is_timestamp(t) or pa.types.is_date(t):
            return np.asarray(
                col.cast(pa.timestamp("us")).cast(pa.int64())
            ).view(np.uint64)
        if pa.types.is_boolean(t):
            return np.asarray(col.cast(pa.int64())).view(np.uint64)
        if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t):
            s = col.cast(pa.large_binary())
            offs_all = np.frombuffer(s.buffers()[1], np.int64)
            offs = offs_all[s.offset : s.offset + len(s) + 1]
            base = int(offs[0]) if len(offs) else 0
            starts = offs[:-1] - base
            ends = offs[1:] - base
            data = s.buffers()[2]
            flat = (
                np.frombuffer(data, np.uint8)[base : int(offs[-1])].astype(
                    np.uint64
                )
                if data is not None and len(offs) and offs[-1] > base
                else np.empty(0, np.uint64)
            )
            # vectorized positional FNV-style fold: Σ (b+1)·P^pos + len
            P = np.uint64(1099511628211)
            if len(flat):
                L = ends - starts
                pos = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, L)
                mx = int(L.max()) if len(L) else 0
                pows = np.empty(max(mx, 1), np.uint64)
                pows[0] = np.uint64(1)
                for i in range(1, mx):
                    pows[i] = pows[i - 1] * P
                terms = (flat + np.uint64(1)) * pows[pos]
                cs = np.concatenate(
                    [[np.uint64(0)], np.cumsum(terms, dtype=np.uint64)]
                )
                h = (cs[ends] - cs[starts]) + (ends - starts).astype(np.uint64)
            else:
                h = (ends - starts).astype(np.uint64)
            return h
        raise TypeError(f"profile_columns: unsupported type {t}")

    def partial(t: pa.Table) -> pa.Table:
        # one output table, two lanes: lane 0 = one count row per
        # column; lane 1 = the column's IN-BATCH-deduped value hashes
        tabs = []
        for c in columns:
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            tabs.append(
                pa.table(
                    {
                        "column": pa.array([c], pa.string()),
                        "_h": pa.array([0], pa.int64()),
                        "_lane": pa.array([0], pa.int64()),
                        "p_rows": pa.array([len(col)], pa.int64()),
                        "p_null": pa.array([col.null_count], pa.int64()),
                    }
                )
            )
            valid = col.drop_null()
            if len(valid):
                hu = np.unique(_hash64(valid)).view(np.int64)
                z = np.zeros(len(hu), np.int64)
                tabs.append(
                    pa.table(
                        {
                            "column": pa.array(np.full(len(hu), c)),
                            "_h": pa.array(hu),
                            "_lane": pa.array(np.ones(len(hu), np.int64)),
                            "p_rows": pa.array(z),
                            "p_null": pa.array(z),
                        }
                    )
                )
        return pa.concat_tables(tabs)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    # exchange: dedup (lane=1) value hashes / fold (lane=0) counts in
    # the SAME keyed aggregate — key (column, _lane, _h)
    merged = partials.groupby(["column", "_lane", "_h"]).aggregate(
        Sum("p_rows", alias_name="rows"),
        Sum("p_null", alias_name="nulls"),
    )

    def finish_partial(t: pa.Table) -> pa.Table:
        lane = np.asarray(t["_lane"])
        distinct = (lane == 1).astype(np.int64)
        g = (
            pa.table(
                {
                    "column": t["column"],
                    "r": t["rows"],
                    "nl": t["nulls"],
                    "d": pa.array(distinct),
                }
            )
            .group_by("column")
            .aggregate([("r", "sum"), ("nl", "sum"), ("d", "sum")])
        )
        return g.rename_columns(["column", "p_r", "p_nl", "p_d"])

    return (
        merged.map_batches(finish_partial, batch_format="pyarrow")
        .groupby("column")
        .aggregate(
            Sum("p_r", alias_name="n_rows"),
            Sum("p_nl", alias_name="n_null"),
            Sum("p_d", alias_name="n_distinct"),
        )
    )
