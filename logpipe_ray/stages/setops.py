"""Distributed set operations over keyed datasets (EXCEPT / INTERSECT).

The reference engine (vellascogabriel/logpipe) has no set operators at
all — these extend the relational surface the same way the join module
does, expressed scale-first:

    tag each side -> per-batch DISTINCT partials -> union
      -> ONE keyed Max aggregate over the side flags -> flag filter

so the all-to-all exchange carries one row per (key-tuple, batch) of
ALREADY-DEDUPLICATED keys, never the raw rows, and no reducer ever
holds a side's full key set. Both operators share the tagged-union
plan; EXCEPT keeps keys whose right-flag never fired, INTERSECT keeps
keys where both flags fired.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Max


def _tagged_distinct(keys: list[str], left: bool):
    """Per-batch combiner: DISTINCT key tuples + side-flag columns.

    Emitting the flags as 0/1 int64 columns (rather than a single enum)
    lets one keyed Max per flag recover "seen on left" / "seen on
    right" exactly, independent of how Ray buckets the union's blocks.
    """
    lv, rv = (1, 0) if left else (0, 1)

    def fn(t: pa.Table) -> pa.Table:
        g = t.select(keys).group_by(keys).aggregate([])
        n = g.num_rows
        return g.append_column(
            "_l", pa.array(np.full(n, lv, np.int64))
        ).append_column("_r", pa.array(np.full(n, rv, np.int64)))

    return fn


def _flags(left: Dataset, right: Dataset, keys: list[str]) -> Dataset:
    both = left.map_batches(
        _tagged_distinct(keys, True), batch_format="pyarrow"
    ).union(
        right.map_batches(_tagged_distinct(keys, False), batch_format="pyarrow")
    )
    return both.groupby(keys).aggregate(
        Max("_l", alias_name="_l"), Max("_r", alias_name="_r")
    )


def _restore(t: pa.Table, key_types: dict | None) -> pa.Table:
    # Ray's keyed Aggregate coarsens timestamp KEY columns to
    # timestamp[s] (observed on Ray 2.49; values here are already
    # truncated so only the unit is lost) — callers pass the intended
    # types to restore the contract schema
    if not key_types:
        return t
    for col, typ in key_types.items():
        i = t.schema.get_field_index(col)
        t = t.set_column(i, col, pc.cast(t[col], typ))
    return t


def except_distinct(
    left: Dataset,
    right: Dataset,
    keys: list[str],
    key_types: dict | None = None,
) -> Dataset:
    """SQL ``EXCEPT``: DISTINCT key tuples of ``left`` absent from
    ``right``. Shuffle volume is O(distinct keys per batch); the single
    exchange is the keyed flag-Max."""
    return _flags(left, right, keys).map_batches(
        lambda t: _restore(
            t.filter(
                pc.and_(pc.equal(t["_l"], 1), pc.equal(t["_r"], 0))
            ).select(keys),
            key_types,
        ),
        batch_format="pyarrow",
    )


def intersect_distinct(
    left: Dataset,
    right: Dataset,
    keys: list[str],
    key_types: dict | None = None,
) -> Dataset:
    """SQL ``INTERSECT``: DISTINCT key tuples present on BOTH sides."""
    return _flags(left, right, keys).map_batches(
        lambda t: _restore(
            t.filter(
                pc.and_(pc.equal(t["_l"], 1), pc.equal(t["_r"], 1))
            ).select(keys),
            key_types,
        ),
        batch_format="pyarrow",
    )
