"""Aggregations — partial (combiner) pre-aggregation + small final groupby.

The reference's AggregateTransformer (SURVEY.md §2.4 A1-A3,
/root/reference/src/transformers/aggregateTransformer.js) is a
streaming hash aggregation with time/size-bounded partial flushes — a
memory cap, not a semantic boundary; parity target is the final merged
result. Here every aggregation is expressed scale-first:

    map_batches(per-batch Arrow group_by)   # partial / combiner
      -> groupby(keys).aggregate(...)       # shuffle over TINY partials

so the all-to-all exchange moves one row per (key, batch) instead of
every input row. This is the "pre-aggregate before groupby" pattern
the 100 TB design requires — the shuffle volume is bounded by
(#keys x #batches), independent of row count.

Reference quirks reproduced (documented, not accidental):
  * null/undefined group key => row bypasses aggregation entirely
    (aggregateTransformer.js:71-73). ``count_by``/``stats_by`` drop
    null-key rows from the aggregate, matching the reference's
    *aggregate output*; callers wanting the pass-through rows use
    ``split_null_keys``.
  * stats Number() coercion skips NaN records (:185-213) — Arrow
    aggregates skip nulls natively; numeric casts produce null on
    junk, so semantics line up.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Max, Min, Sum


def _partial_counts(keys: list[str]):
    def fn(batch: pa.Table) -> pa.Table:
        grouped = batch.group_by(keys).aggregate([([], "count_all")])
        return grouped.rename_columns(keys + ["partial_count"])

    return fn


def count_groupby(
    ds: Dataset,
    keys: list[str],
    alias: str = "cnt",
    salt: int | None = None,
    salt_col: str = "doc_id",
) -> Dataset:
    """groupby(keys).count() with per-batch partial counting.

    Null-key rows are excluded (reference null-key bypass semantics).

    ``salt=S`` adds a salted-key stage for skewed keys (north rule /
    SURVEY.md §7.3): partials carry an extra ``_salt = hash(salt_col)
    % S`` column so the first shuffle spreads a hot key over S
    reducers; a second (tiny) groupby merges the salted partials.
    With per-batch pre-aggregation the first shuffle is already small,
    so salting matters when key cardinality is tiny AND batch counts
    are huge — it bounds the biggest single reducer group.
    """
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        mask = None
        for k in keys:
            valid = pc.is_valid(batch[k])
            mask = valid if mask is None else pc.and_(mask, valid)
        batch = batch.filter(mask)
        if batch.num_rows == 0:
            cols = {k: batch[k].combine_chunks() if isinstance(batch[k], pa.ChunkedArray) else batch[k] for k in keys}
            if salt:
                cols["_salt"] = pa.array([], pa.int32())
            cols["partial_count"] = pa.array([], pa.int64())
            return pa.table(cols)
        gkeys = list(keys)
        if salt:
            from .transform import hash64_strings
            import numpy as np

            col = batch[salt_col]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if not pa.types.is_string(col.type):
                col = pc.cast(col, pa.string())
            bucket = (hash64_strings(col) % np.uint64(salt)).astype(np.int32)
            batch = batch.append_column("_salt", pa.array(bucket))
            gkeys = keys + ["_salt"]
        grouped = batch.group_by(gkeys).aggregate([([], "count_all")])
        return grouped.rename_columns(gkeys + ["partial_count"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    if salt:
        salted = partials.groupby(keys + ["_salt"]).aggregate(
            Sum("partial_count", alias_name="salted_count")
        )
        return salted.groupby(keys).aggregate(Sum("salted_count", alias_name=alias))
    return partials.groupby(keys).aggregate(Sum("partial_count", alias_name=alias))


def hash_partition(ds: Dataset, col: str, num_partitions: int) -> Dataset:
    """Explicit hash-repartition by a key column (north rule: hash-
    repartition by doc_id). Adds a deterministic ``_bucket =
    hash(col) % n`` column and co-locates rows of a bucket via
    groupby — the portable keyed-shuffle pattern (ray_guide 'Joins').
    Downstream per-bucket stages may then assume bucket disjointness
    (the lineage/resume unit at 100 TB)."""
    import pyarrow.compute as pc

    def add_bucket(batch: pa.Table) -> pa.Table:
        from .transform import hash64_strings
        import numpy as np

        c = batch[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if not pa.types.is_string(c.type):
            c = pc.cast(c, pa.string())
        b = (hash64_strings(c) % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("_bucket", pa.array(b))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("_bucket").map_groups(
        lambda t: t, batch_format="pyarrow"
    )


def stats_groupby(
    ds: Dataset, key: str, value: str, prefix: str | None = None
) -> Dataset:
    """Per-key numeric stats: cnt / sum / min / max / avg of `value`.

    Matches the reference's createStats (A3): null keys bypass, null
    values don't update the group. Two-phase: per-batch Arrow partials,
    then a tiny shuffle, then avg = sum/cnt.
    """
    p = prefix if prefix is not None else value

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.is_valid(batch[key]))
        grouped = batch.group_by(key).aggregate(
            [(value, "count"), (value, "sum"), (value, "min"), (value, "max")]
        )
        grouped = grouped.rename_columns([key, "p_cnt", "p_sum", "p_min", "p_max"])
        return grouped

    partials = ds.map_batches(partial, batch_format="pyarrow")
    merged = partials.groupby(key).aggregate(
        Sum("p_cnt", alias_name=f"cnt_{p}"),
        Sum("p_sum", alias_name=f"sum_{p}"),
        Min("p_min", alias_name=f"min_{p}"),
        Max("p_max", alias_name=f"max_{p}"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        avg = pc.divide(
            pc.cast(batch[f"sum_{p}"], pa.float64()),
            pc.cast(batch[f"cnt_{p}"], pa.float64()),
        )
        return batch.append_column(f"avg_{p}", avg)

    return merged.map_batches(finalize, batch_format="pyarrow")


def custom_aggregate(
    ds: Dataset,
    key: str,
    init,
    accumulate,
    merge,
    finalize=None,
):
    """Reference §2.7 custom-aggregation surface
    (createAggregator(keyFn, aggregateFn),
    /root/reference/src/transformers/transformerFactory.js:51-57) in
    mergeable-partial form: `accumulate(state, pandas_group)` builds a
    per-batch partial state per key, `merge(a, b)` combines partials,
    `finalize(state) -> dict` emits the output row. Per-batch partials
    keep the shuffle tiny (one serialized state per key per batch)."""
    import pandas as pd
    import pickle

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        rows = []
        for k, g in df.groupby(key, dropna=True):
            st = accumulate(init(), g)
            rows.append({key: k, "_state": pickle.dumps(st)})
        return pd.DataFrame(rows, columns=[key, "_state"])

    partials = ds.map_batches(partial, batch_format="pandas")

    def reduce_group(df: "pd.DataFrame") -> "pd.DataFrame":
        states = [pickle.loads(s) for s in df["_state"]]
        st = states[0]
        for other in states[1:]:
            st = merge(st, other)
        out = finalize(st) if finalize else st
        return pd.DataFrame([{key: df[key].iloc[0], **out}])

    return partials.groupby(key).map_groups(reduce_group, batch_format="pandas")


def bounded_partial_counts(key: str, max_groups: int = 1000):
    """Reference A1 partial-flush semantics
    (/root/reference/src/transformers/aggregateTransformer.js:93-96),
    restated for a batch engine: the reference's time/size-bounded
    flush is a MEMORY CAP on the combiner, not a semantic boundary —
    partial counts per key are emitted whenever the in-memory group
    table would exceed ``max_groups``, and the exact merge happens
    downstream. Here each map_batches call computes value_counts in
    key-chunks of ``max_groups`` so combiner memory is bounded even
    under adversarial key cardinality; the final
    groupby(key).sum(partial) merge is exact. Null keys bypass
    aggregation (aggregateTransformer.js:71-73). Cross-batch combiner
    state is deliberately NOT held in the actor: Ray Data's map stages
    have no end-of-stream flush hook, so held state would be lost at
    teardown — the per-batch-partials + small-final-merge shape is the
    correct Ray-native statement of the same memory bound."""
    import pyarrow.compute as pc2

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts = []
        for lo in range(0, len(col), max(max_groups, 1)):
            chunk = col.slice(lo, max(max_groups, 1))
            vc = pc2.value_counts(chunk)
            keys = pc2.struct_field(vc, "values")
            cnts = pc2.struct_field(vc, "counts")
            t = pa.table({key: keys, "partial_count": cnts})
            parts.append(t.filter(pc2.is_valid(t[key])))
        return pa.concat_tables(parts) if parts else pa.table(
            {key: col.slice(0, 0), "partial_count": pa.array([], pa.int64())}
        )

    return fn


def top_k(ds: Dataset, sort_keys: list[tuple[str, str]], k: int) -> Dataset:
    """Scalable top-k: per-batch local top-k, then a single tiny merge.

    Avoids a full distributed sort — each batch contributes at most k
    rows to the final single-block merge, so the data movement is
    O(k x #batches), not O(rows). sort_keys: [(col, 'ascending'|'descending')].
    """
    import pyarrow.compute as pc

    def local(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=sort_keys)[:k]
        return t.take(idx)

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .repartition(1)
        .map_batches(local, batch_format="pyarrow", batch_size=None)
    )


def split_null_keys(ds: Dataset, keys: list[str]) -> tuple[Dataset, Dataset]:
    """Reference A1 null-key pass-through: (non-null-key rows, null-key rows)."""

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = None
        for k in keys:
            valid = pc.is_valid(batch[k])
            mask = valid if mask is None else pc.and_(mask, valid)
        return batch.filter(mask)

    def bypass(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = None
        for k in keys:
            nullm = pc.is_null(batch[k])
            mask = nullm if mask is None else pc.or_(mask, nullm)
        return batch.filter(mask)

    return (
        ds.map_batches(keep, batch_format="pyarrow"),
        ds.map_batches(bypass, batch_format="pyarrow"),
    )


def grouped_top_k(
    ds: Dataset,
    group_keys: list[str],
    sort_keys: list[tuple[str, str]],
    k: int,
) -> Dataset:
    """Per-group top-k (e.g. best documents per language).

    Scale shape: each batch first reduces to its own per-group top-k
    (local sort + head-k per group — vectorized pandas), so the keyed
    shuffle moves at most k x groups x batches survivor rows, never the
    full table; the final per-group head-k runs on those survivors.
    sort_keys: [(col, 'ascending'|'descending')] — include a unique
    tie-breaker column for deterministic output.
    """
    by = list(group_keys) + [c for c, _ in sort_keys]
    asc = [True] * len(group_keys) + [d == "ascending" for _, d in sort_keys]

    def local(df):
        df = df.sort_values(by=by, ascending=asc, kind="mergesort")
        return df.groupby(list(group_keys), sort=False).head(k)

    pruned = ds.map_batches(local, batch_format="pandas")
    return pruned.groupby(group_keys).map_groups(local, batch_format="pandas")
