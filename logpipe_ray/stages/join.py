"""Large-both-sides joins.

Three join strategies, by size regime (SURVEY.md §2.6, ray_guide
"Joins and lookups"):

1. broadcast lookup (small side): ray.put + pc.index_in per batch —
   see stages/enrich.py and queries._SegmentJoin. No shuffle.
2. native hash join: ray.data Dataset.join (hash-partitioned on the
   key) — available in this Ray version; preferred when both sides are
   large and the engine's join is adequate.
3. portable bucketed co-group join (this module): tag each side,
   union, groupby(key) and join inside map_groups. Works on any Ray
   version and makes the partitioning explicit: the groupby
   co-locates both sides' rows for a key on one reducer. Salting
   applies if a single join key is hot (not the case for TPC-H
   orderkey).
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset


def cogroup_join_aggregate(
    left: Dataset,
    right: Dataset,
    key: str,
    left_cols: dict[str, pa.DataType],
    right_cols: dict[str, pa.DataType],
    per_key_fn,
):
    """Explicit co-group join: union both (tagged, schema-aligned)
    sides, co-locate by key via groupby, and reduce each key's group
    with ``per_key_fn(left_df, right_df) -> dict`` emitting one row
    per key (or None to drop). The shuffle weight is both tables once
    — the unavoidable minimum for a two-large-sides join.

    left_cols / right_cols: {column: arrow type} carried from each
    side; the other side's rows hold typed nulls for those columns.
    """
    import numpy as np
    import pandas as pd

    all_cols = {**left_cols, **right_cols}

    def tag(side: int, own: dict):
        def fn(t: pa.Table) -> pa.Table:
            out = {key: t[key]}
            for c, typ in all_cols.items():
                if c in own and c in t.column_names:
                    out[c] = t[c]
                else:
                    out[c] = pa.nulls(t.num_rows, typ)
            out["_side"] = pa.array(np.full(t.num_rows, side, np.int8))
            return pa.table(out)

        return fn

    unioned = left.map_batches(tag(0, left_cols), batch_format="pyarrow").union(
        right.map_batches(tag(1, right_cols), batch_format="pyarrow")
    )

    def reduce_group(df: "pd.DataFrame") -> "pd.DataFrame":
        l = df[df["_side"] == 0]
        r = df[df["_side"] == 1]
        row = per_key_fn(l, r)
        if row is None:
            return pd.DataFrame()
        return pd.DataFrame([{key: df[key].iloc[0], **row}])

    return unioned.groupby(key).map_groups(reduce_group, batch_format="pandas")


def asof_join(
    left: Dataset,
    right: Dataset,
    key: str,
    ts_col: str,
    left_cols: dict[str, pa.DataType],
    right_cols: dict[str, pa.DataType],
    tiebreak: str | None = None,
):
    """As-of join (backward, inclusive): for every left row, attach the
    latest right row with right.ts <= left.ts for the same key.

    Distributed shape (ray_guide "As-of / range join"): co-locate both
    sides by key (the cogroup union+groupby pattern), then
    pd.merge_asof over the ts-sorted group. Deterministic under ts
    ties when ``tiebreak`` (a right-side column) is given: the max
    tiebreak wins. Partitioning assumption: one key's history fits a
    reducer (salt by time-range if a key's history is huge)."""
    import numpy as np
    import pandas as pd

    all_cols = {**left_cols, **right_cols}

    def tag(side: int, own: dict):
        def fn(t: pa.Table) -> pa.Table:
            out = {key: t[key], ts_col: t[ts_col]}
            for c, typ in all_cols.items():
                if c in own and c in t.column_names:
                    out[c] = t[c]
                else:
                    out[c] = pa.nulls(t.num_rows, typ)
            out["_side"] = pa.array(np.full(t.num_rows, side, np.int8))
            return pa.table(out)

        return fn

    unioned = left.map_batches(tag(0, left_cols), batch_format="pyarrow").union(
        right.map_batches(tag(1, right_cols), batch_format="pyarrow")
    )

    def reduce_group(df: "pd.DataFrame") -> "pd.DataFrame":
        l = df[df["_side"] == 0].sort_values(ts_col, kind="stable")
        r = df[df["_side"] == 1]
        if len(l) == 0:
            return pd.DataFrame()
        l = l[[key, ts_col, *left_cols]]
        if len(r) == 0:
            out = l.copy()
            for c in right_cols:
                out[c] = pd.NA
            return out
        sort_keys = [ts_col] + ([tiebreak] if tiebreak else [])
        r = r.sort_values(sort_keys, kind="stable")[[ts_col, *right_cols]]
        return pd.merge_asof(l, r, on=ts_col, direction="backward")

    return unioned.groupby(key).map_groups(reduce_group, batch_format="pandas")


def semi_join_filter(ds: Dataset, col: str, keys_ref, anti: bool = False) -> Dataset:
    """Semi / anti join by broadcast key set (ray_guide "Semi / anti
    join"): keys_ref is a ray.put ObjectRef of an Arrow array of keys
    (at very large key cardinality, put a Bloom filter instead — same
    shape). No shuffle: a vectorized pc.is_in mask per batch."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        import ray

        keys = ray.get(keys_ref)
        mask = pc.is_in(batch[col], value_set=keys)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(pc.fill_null(mask, anti))

    return ds.map_batches(fn, batch_format="pyarrow")
