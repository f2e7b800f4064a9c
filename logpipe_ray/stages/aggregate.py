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


def count_groupby(ds: Dataset, keys: list[str], alias: str = "cnt") -> Dataset:
    """groupby(keys).count() with per-batch partial counting.

    Null-key rows are excluded (reference null-key bypass semantics).
    """

    def partial(batch: pa.Table) -> pa.Table:
        mask = None
        import pyarrow.compute as pc

        for k in keys:
            valid = pc.is_valid(batch[k])
            mask = valid if mask is None else pc.and_(mask, valid)
        batch = batch.filter(mask)
        grouped = batch.group_by(keys).aggregate([([], "count_all")])
        return grouped.rename_columns(keys + ["partial_count"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(keys).aggregate(Sum("partial_count", alias_name=alias))
    return out


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
        return grouped.rename_columns([key, "p_cnt", "p_sum", "p_min", "p_max"])

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
