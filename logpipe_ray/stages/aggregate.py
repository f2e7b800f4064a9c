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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum


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


def partitioned_rolling_sum(
    ds: Dataset,
    key: str,
    order_cols: list[str],
    value_col: str,
    window: int,
    bucket_col: str,
    out_col: str = "rolling_sum",
    keep_cols: list[str] | None = None,
) -> Dataset:
    """Rolling ``window``-row sum of ``value_col`` per ``key``, ordered
    by ``order_cols`` — WITHOUT ever co-locating a whole key on one
    reducer (keys like event_type are low-cardinality/hot: at 100 TB a
    per-key map_groups would hand one reducer an entire type's
    history).

    Scale shape: rows are grouped by (key, bucket_col) — bucket_col
    must be a monotone function of the leading order column (e.g. a
    day number from ts), so bucket order == row order across buckets.
    A rolling window of w rows needs only the previous w-1 rows across
    a bucket boundary, so:

      pass 1 (bounded): each batch emits its per-(key, bucket) last
        w-1 rows; the concatenated tails (<= (w-1) x keys x buckets x
        blocks rows, tiny) reduce on the driver to the true global
        last w-1 rows preceding every bucket, broadcast via ray.put.
      pass 2 (the real work): groupby((key, bucket)).map_groups sorts
        ONE bucket, prepends its <= w-1 carry-in values, computes the
        vectorized rolling sum and emits only its own rows.

    Each reducer therefore holds max one bucket of one key; choose the
    bucket granularity so that bound fits a worker.  ``value_col``
    must be integer (exactness under the hash compare).
    """
    import pandas as pd

    import ray

    carry_n = window - 1
    sort_by = [bucket_col] + order_cols

    def tails(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(sort_by, kind="mergesort")
        return df.groupby([key, bucket_col], sort=False).tail(carry_n)[
            [key, bucket_col, *order_cols, value_col]
        ]

    # per-batch tails -> keyed reduce to the GLOBAL per-(key, bucket)
    # tail -> driver. The shuffle moves only tail partials; the driver
    # table is O(keys x buckets) rows with no blocks factor.
    tail_parts = (
        ds.map_batches(tails, batch_format="pandas")
        .groupby([key, bucket_col])
        .map_groups(
            lambda df: df.sort_values(sort_by, kind="mergesort").tail(carry_n),
            batch_format="pandas",
        )
        .to_pandas()
    )
    # driver-side final reduce over the bounded tail table: for each
    # (key, bucket) the carry-in is the last w-1 rows among ALL
    # preceding buckets; since every bucket contributed its own last
    # w-1 rows, the global answer lies within the concatenated tails.
    carry: dict = {}
    if tail_parts.empty and key not in tail_parts.columns:
        tail_parts = pd.DataFrame(columns=[key, bucket_col, *order_cols, value_col])
    for k, g in tail_parts.groupby(key, sort=False):
        g = g.sort_values(sort_by, kind="mergesort")
        buckets = g[bucket_col].to_numpy()
        vals = g[value_col].to_numpy()
        for b in pd.unique(buckets):
            before = vals[buckets < b]
            if len(before):
                carry[(k, b)] = before[-carry_n:]
    carry_ref = ray.put(carry)

    keep = keep_cols if keep_cols is not None else [key, *order_cols]

    def window_group(df: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        cmap = ray.get(carry_ref)
        df = df.sort_values(order_cols, kind="mergesort")
        pre = cmap.get((df[key].iloc[0], df[bucket_col].iloc[0]), ())
        vals = np.concatenate(
            [np.asarray(pre, dtype="int64"), df[value_col].to_numpy()]
        )
        roll = (
            pd.Series(vals).rolling(window, min_periods=1).sum().astype("int64")
        )
        out = df[keep].copy()
        out[out_col] = roll.to_numpy()[len(pre):]
        return out

    return ds.groupby([key, bucket_col]).map_groups(
        window_group, batch_format="pandas"
    )




def grouped_exact_median(
    ds: Dataset,
    key: str,
    value_col: str,
    n_buckets: int = 2048,
    collect_limit: int = 262_144,
    max_iters: int = 8,
) -> pa.Table:
    """EXACT per-group median — grouped_exact_quantile at q=0.5 with
    the historical `median_value` column name."""
    out = grouped_exact_quantile(
        ds, key, value_col, q=0.5, n_buckets=n_buckets,
        collect_limit=collect_limit, max_iters=max_iters,
    )
    return out.rename_columns([key, "median_value"])


def grouped_exact_quantile(
    ds: Dataset,
    key: str,
    value_col: str,
    q: float = 0.5,
    n_buckets: int = 2048,
    collect_limit: int = 262_144,
    max_iters: int = 8,
) -> pa.Table:
    """EXACT per-group quantile (linear interpolation, = DuckDB
    quantile_cont q) via distributed selection — no reducer or the
    driver ever holds a whole group's values.

    Exact quantiles are not partial-mergeable, so a hot key (the
    event_type shape) breaks per-key map_groups at scale. Instead each
    target rank (two when the group count is even) gets its own
    selection bracket:

      1. per-group (count, min, max) via native mergeable aggregates;
      2. iterate: one streaming pass histograms each active bracket's
         values into ``n_buckets`` equi-width buckets (per-batch
         np.bincount partials -> small keyed sum; the shuffle is
         O(brackets x buckets)); the driver narrows each bracket to the
         single bucket holding its rank, with half a bucket of slack
         each side so float edge-rounding can never drop the rank —
         in-bracket count shrinks ~n_buckets/2 x per pass;
      3. when a bracket holds <= ``collect_limit`` values, or is
         narrower than ~450 ulps (a repeated value dominating it —
         only a handful of distinct floats fit), a final pass collects
         its DISTINCT values with counts; the rank is resolved against
         fresh exact below-bracket counts (value comparisons only, so
         bucket-edge float behavior cannot skew ranks).

    Driver state is O(#brackets) + O(distinct collected values), the
    same order as the result table itself. Returns an Arrow table
    (key, median_value:float64) sorted by key.
    """
    import pandas as pd

    import ray

    # the selection passes below re-execute their input once per
    # histogram refinement + once for the collect; materialize the
    # 2-column projection ONCE so a lazy upstream (scored/parsed
    # dataset) is never recomputed per pass — same fix as
    # global_topk_filter (measured 13 recomputations there)
    base = ds.map_batches(
        lambda t: t.select([key, value_col]).filter(pc.is_valid(t[value_col])),
        batch_format="pyarrow",
    ).materialize()
    stats = base.groupby(key).aggregate(
        Count(value_col, alias_name="n"),
        Min(value_col, alias_name="lo"),
        Max(value_col, alias_name="hi"),
    ).to_pandas()
    if not len(stats):
        return pa.table({key: pa.array([], pa.string()),
                         "quantile_value": pa.array([], pa.float64())})

    # one selection bracket per (group, target rank); n even -> two
    # ranks m1 != m2, interpolated at the end
    st: dict = {}
    meta: dict = {}
    for _, r in stats.iterrows():
        n = int(r["n"])
        h = (n - 1) * q
        m1, m2 = int(np.floor(h)), int(np.ceil(h))
        meta[r[key]] = {"h": h, "m1": m1, "m2": m2}
        for rank in {m1, m2}:
            st[(r[key], rank)] = {
                "r": rank, "lo": float(r["lo"]), "hi": float(r["hi"]),
                "w0": float(r["hi"]) - float(r["lo"]),
                "below": 0, "in": n,
            }
    rank_val: dict = {}

    def _width_collapsed(s: dict) -> bool:
        # two floors: ~450 ulps of the bracket bounds, AND 1e-15 of the
        # group's ORIGINAL range — the latter covers brackets pinned at
        # 0.0 (scale of the bounds alone collapses to the width itself,
        # so a relative-only test could never fire). Values within
        # 1e-15 x range of each other are float-indistinguishable for
        # any realistic data, so the distinct-value collect stays tiny.
        scale = max(abs(s["lo"]), abs(s["hi"]), 1e-300)
        w = s["hi"] - s["lo"]
        return w <= 1e-13 * scale or w <= 1e-15 * max(s["w0"], 1e-300)

    def _maybe_finish(bk: tuple) -> None:
        s = st[bk]
        if s["hi"] <= s["lo"]:  # all remaining bracket values equal
            rank_val[bk] = s["lo"]
            del st[bk]

    for bk in list(st):
        _maybe_finish(bk)

    def _broadcast(active: dict):
        # group rows map to up to two brackets; broadcast per-group
        # arrays of both brackets' bounds (NaN = slot inactive)
        gkeys = sorted({k for k, _ in active})
        gidx = {k: i for i, k in enumerate(gkeys)}
        bounds = np.full((len(gkeys), 2, 2), np.nan)  # [group, slot, (lo,hi)]
        # deterministic slot assignment: order brackets per group
        slot_of: dict = {}
        per_group: dict = {}
        for bk in sorted(active, key=lambda b: (str(b[0]), b[1])):
            i = per_group.setdefault(bk[0], [])
            slot_of[bk] = len(i)
            i.append(bk)
            bounds[gidx[bk[0]], slot_of[bk]] = (active[bk]["lo"], active[bk]["hi"])
        return pa.array(gkeys), bounds, slot_of

    nb = n_buckets
    for _ in range(max_iters):
        active = {
            bk: s
            for bk, s in st.items()
            if s["in"] > collect_limit and not _width_collapsed(s)
        }
        if not active:
            break
        keys_arr, bounds, slot_of = _broadcast(active)
        ref = ray.put((keys_arr, bounds))

        def hist_partial(t: pa.Table, _ref=ref) -> pa.Table:
            ks, bds = ray.get(_ref)
            gi = pc.index_in(t[key], value_set=ks).to_numpy(zero_copy_only=False)
            ok = gi >= 0 if gi.dtype.kind == "i" else ~np.isnan(gi)
            gi = np.where(ok, gi, 0).astype(np.int64)
            v = t[value_col].to_numpy(zero_copy_only=False)
            span = nb + 1  # slot layout: [below, b0..b(nb-1)] per slot
            flat = np.zeros(len(ks) * 2 * span, dtype=np.int64)
            for sl in (0, 1):
                lo, hi = bds[gi, sl, 0], bds[gi, sl, 1]
                has = ok & ~np.isnan(lo)
                inb = has & (v >= lo) & (v <= hi)
                blw = has & (v < lo)
                width = np.maximum(hi - lo, 1e-300)
                bkt = np.clip(((v - lo) / width * nb).astype(np.int64), 0, nb - 1)
                pos = np.where(inb, bkt + 1, 0)
                keep = inb | blw
                flat += np.bincount(
                    (gi[keep] * 2 + sl) * span + pos[keep],
                    minlength=len(flat),
                )
            nz = np.nonzero(flat)[0]
            return pa.table(
                {
                    key: pc.take(ks, pa.array(nz // (2 * span))),
                    "slot": pa.array((nz // span) % 2, pa.int64()),
                    "pos": pa.array(nz % span, pa.int64()),
                    "cnt": pa.array(flat[nz], pa.int64()),
                }
            )

        hist = (
            base.map_batches(hist_partial, batch_format="pyarrow")
            .groupby([key, "slot", "pos"]).sum("cnt")
            .to_pandas()
        )
        col = "sum(cnt)" if "sum(cnt)" in hist.columns else "cnt"
        inv_slot = {(bk[0], sl): bk for bk, sl in slot_of.items()}
        for (k, sl), g in hist.groupby([key, "slot"], sort=False):
            bk = inv_slot.get((k, sl))
            if bk is None:
                continue
            s = st[bk]
            counts = np.zeros(nb + 1, dtype=np.int64)
            counts[g["pos"].to_numpy()] = g[col].to_numpy()
            below_fresh = int(counts[0])
            cum = below_fresh + np.cumsum(counts[1:])
            b = int(np.searchsorted(cum, s["r"] + 1))
            if b >= nb:  # rank past histogram (float edge): retry
                continue
            w = (s["hi"] - s["lo"]) / nb
            new_lo = max(s["lo"], s["lo"] + (b - 0.5) * w)
            new_hi = min(s["hi"], s["lo"] + (b + 1.5) * w)
            s["below"] = int(cum[b - 1]) if b else below_fresh
            s["in"] = int(cum[b] - s["below"])
            s["lo"], s["hi"] = new_lo, new_hi
            _maybe_finish(bk)

    if st:
        over = {
            bk: s["in"]
            for bk, s in st.items()
            if s["in"] > collect_limit and not _width_collapsed(s)
        }
        if over:
            raise RuntimeError(
                f"grouped_exact_median brackets did not shrink under "
                f"collect_limit within {max_iters} passes: {over}"
            )
        keys_arr, bounds, slot_of = _broadcast(st)
        ref = ray.put((keys_arr, bounds))

        def collect(t: pa.Table, _ref=ref) -> pa.Table:
            # DISTINCT in-bracket values with counts per (group, slot)
            # + per-slot below-bracket counts as NaN sentinel rows
            ks, bds = ray.get(_ref)
            gi = pc.index_in(t[key], value_set=ks).to_numpy(zero_copy_only=False)
            ok = gi >= 0 if gi.dtype.kind == "i" else ~np.isnan(gi)
            gi = np.where(ok, gi, 0).astype(np.int64)
            v = t[value_col].to_numpy(zero_copy_only=False)
            parts = []
            for sl in (0, 1):
                lo, hi = bds[gi, sl, 0], bds[gi, sl, 1]
                has = ok & ~np.isnan(lo)
                inb = has & (v >= lo) & (v <= hi)
                blw = np.bincount(gi[has & (v < lo)], minlength=len(ks))
                if inb.any():
                    pairs, cnts = np.unique(
                        np.stack([gi[inb], v[inb]]), axis=1, return_counts=True
                    )
                else:
                    pairs = np.empty((2, 0))
                    cnts = np.empty(0, np.int64)
                parts.append(
                    (
                        np.concatenate([pairs[0].astype(np.int64),
                                        np.arange(len(ks))]),
                        np.full(len(pairs[0]) + len(ks), sl, np.int64),
                        np.concatenate([pairs[1], np.full(len(ks), np.nan)]),
                        np.concatenate([cnts.astype(np.int64),
                                        np.zeros(len(ks), np.int64)]),
                        np.concatenate([np.zeros(len(cnts), np.int64), blw]),
                    )
                )
            return pa.table(
                {
                    key: pc.take(ks, pa.array(
                        np.concatenate([p[0] for p in parts]))),
                    "slot": pa.array(np.concatenate([p[1] for p in parts])),
                    "v": pa.array(np.concatenate([p[2] for p in parts])),
                    "cnt": pa.array(np.concatenate([p[3] for p in parts])),
                    "blw": pa.array(np.concatenate([p[4] for p in parts])),
                }
            )

        got = base.map_batches(collect, batch_format="pyarrow").to_pandas()
        inv_slot = {(bk[0], sl): bk for bk, sl in slot_of.items()}
        for (k, sl), g in got.groupby([key, "slot"], sort=False):
            bk = inv_slot.get((k, sl))
            if bk is None or bk not in st:
                continue
            s = st[bk]
            below = int(g["blw"].sum())
            vg = g[~g["v"].isna()].groupby("v", sort=True)["cnt"].sum()
            vals, cum = vg.index.to_numpy(), vg.to_numpy().cumsum()
            i = int(np.searchsorted(cum, s["r"] - below + 1))
            if not (s["r"] >= below and len(cum) and i < len(vals)):
                raise RuntimeError(
                    f"median bracket {bk!r} missed its rank "
                    f"(below={below}, in-distinct={len(vals)})"
                )
            rank_val[bk] = float(vals[i])

    ks_sorted = sorted(meta)
    out = []
    for k in ks_sorted:
        m = meta[k]
        v1, v2 = rank_val[(k, m["m1"])], rank_val[(k, m["m2"])]
        frac = m["h"] - m["m1"]
        # DuckDB's Interpolate is the AFFINE form lo*(1-frac) + hi*frac,
        # which rounds differently from lo + frac*(hi-lo) in the last
        # bit for general doubles (e.g. lo=-2.22, hi=19.39, frac=0.5:
        # 8.585 vs 8.584999999999999) — verified empirically 0/200
        # mismatches vs 53/200 for the lerp form. Exact-valued inputs
        # (integer cents) agree under both, which is why the oracled
        # cents queries never caught the difference.
        out.append(float(v1 * (1.0 - frac) + v2 * frac))
    return pa.table(
        {key: pa.array(ks_sorted), "quantile_value": pa.array(out, pa.float64())}
    )


def partitioned_running_sum(
    ds: Dataset,
    key: str,
    order_cols: list[str],
    value_col: str,
    bucket_col: str,
    out_col: str = "running_sum",
    keep_cols: list[str] | None = None,
) -> Dataset:
    """Per-key running (prefix) sum of ``value_col`` over ``order_cols``
    — the distributed SCAN pattern, without co-locating a whole key.

    Two passes (same (key, bucket) partitioning contract as
    partitioned_rolling_sum; bucket_col must be monotone in the leading
    order column):

      pass 1: per-(key, bucket) TOTALS via per-batch Arrow partials +
        one tiny keyed aggregate (O(keys x buckets) rows);
      driver: exclusive prefix over each key's bucket totals in bucket
        order — bounded state, the same order as the bucket count;
      pass 2: groupby((key, bucket)).map_groups sorts ONE bucket,
        local cumsum + the bucket's carried-in prefix offset.

    ``value_col`` must be integer (exactness under the hash compare).
    """
    import pandas as pd

    import ray

    def totals_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select([key, bucket_col, value_col])
            .group_by([key, bucket_col])
            .aggregate([(value_col, "sum")])
        )
        return g.rename_columns([key, bucket_col, "p"])

    totals = (
        ds.map_batches(totals_partial, batch_format="pyarrow")
        .groupby([key, bucket_col])
        .sum("p")
        .to_pandas()
    )
    col = "sum(p)" if "sum(p)" in totals.columns else "p"
    prefix: dict = {}
    if totals.empty and key not in totals.columns:
        totals = pd.DataFrame(columns=[key, bucket_col, col])
    for k, g in totals.groupby(key, sort=False):
        g = g.sort_values(bucket_col, kind="mergesort")
        run = g[col].cumsum().shift(fill_value=0)  # exclusive prefix
        for b, off in zip(g[bucket_col], run):
            prefix[(k, b)] = int(off)
    prefix_ref = ray.put(prefix)

    keep = keep_cols if keep_cols is not None else [key, *order_cols]

    def scan_group(df: "pd.DataFrame") -> "pd.DataFrame":
        pmap = ray.get(prefix_ref)
        df = df.sort_values(order_cols, kind="mergesort")
        off = pmap.get((df[key].iloc[0], df[bucket_col].iloc[0]), 0)
        out = df[keep].copy()
        out[out_col] = df[value_col].cumsum().to_numpy() + off
        return out

    return ds.groupby([key, bucket_col]).map_groups(
        scan_group, batch_format="pandas"
    )


# ----------------------------------------------------------------- ntile

NTILE_DISTINCT_LIMIT = 5_000_000  # driver-held (value, count) rows


def ntile_summary(
    ds, value_col: str, n_tiles: int = 10,
    distinct_limit: int = NTILE_DISTINCT_LIMIT,
) -> "pa.Table":
    """Exact NTILE(n) summary over an integer column: per tile the row
    count and [lo, hi] value range — the distribution profile a
    curation policy (length cutoffs, packing budgets) is tuned from.

    The per-tile aggregate is a pure function of the (value, count)
    table: a tile boundary inside a tie-run moves only WHICH same-value
    rows cross it, never the counts or value ranges — so the engine
    needs no per-row global rank at all. One keyed count aggregate
    (bounded by distinct values, guarded by ``distinct_limit``), then
    integer NTILE arithmetic on the driver over that bounded table.
    Matches SQL ``NTILE(n) OVER (ORDER BY value, id)`` aggregated per
    tile, for ANY deterministic tiebreak.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        col = t[value_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vc = pc.value_counts(col)
        return pa.table(
            {
                "v": pc.cast(pc.struct_field(vc, "values"), pa.int64()),
                "p": pc.struct_field(vc, "counts"),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("p", alias_name="c"))
        .to_pandas()
        .sort_values("v")
    )
    if len(counts) > distinct_limit:
        raise ValueError(
            f"{len(counts)} distinct values exceed NTILE_DISTINCT_LIMIT: "
            "use sampled split points (Dataset.sort) instead"
        )
    vals = counts["v"].to_numpy()
    cnt = counts["c"].to_numpy(dtype=np.int64)
    cum = np.cumsum(cnt)
    n = int(cum[-1]) if len(cum) else 0
    rows = []
    start = 0
    big = n // n_tiles + 1
    small = n // n_tiles
    n_big = n % n_tiles
    for d in range(n_tiles):
        size = big if d < n_big else small
        if size == 0:
            continue
        end = start + size  # exclusive
        lo = vals[np.searchsorted(cum, start, side="right")]
        hi = vals[np.searchsorted(cum, end - 1, side="right")]
        rows.append((d + 1, size, int(lo), int(hi)))
        start = end
    return pa.table(
        {
            "tile": pa.array([r[0] for r in rows], pa.int64()),
            "n_rows": pa.array([r[1] for r in rows], pa.int64()),
            "lo": pa.array([r[2] for r in rows], pa.int64()),
            "hi": pa.array([r[3] for r in rows], pa.int64()),
        }
    )

# ------------------------------------------------------- global selection


def exact_rank_value(
    ds: Dataset,
    col: str,
    rank: int,
    n_buckets: int = 8192,
    collect_limit: int = 262_144,
    max_iters: int = 16,
):
    """Value at ascending 0-based ``rank`` among the non-null values of
    ``col`` — EXACT, with no global sort and no reducer ever holding
    more than ``collect_limit`` values (the ungrouped single-rank
    cousin of ``grouped_exact_quantile``; same histogram-bracket
    refinement, same value-comparison-only final resolution so float
    bucket-edge behavior can never skew the rank).

    Values keep their native dtype end-to-end (int64 stays int64 — the
    returned threshold is an actual element); only the bucket index
    arithmetic runs in float64, where a half-bucket slack on each side
    absorbs any rounding of the cast.
    """
    base = ds.map_batches(
        lambda t, c=col: t.select([c]).filter(pc.is_valid(t[c])),
        batch_format="pyarrow",
    )
    stats = base.aggregate(
        Count(col, alias_name="n"),
        Min(col, alias_name="lo"),
        Max(col, alias_name="hi"),
    )
    n = int(stats["n"])
    if not 0 <= rank < n:
        raise ValueError(f"rank {rank} outside [0, {n})")
    lo, hi = stats["lo"], stats["hi"]
    if rank == 0:
        return lo
    if rank == n - 1:
        return hi
    flo, fhi = float(lo), float(hi)
    w0 = max(fhi - flo, 1e-300)
    inb = n
    nb = n_buckets

    def _collapsed() -> bool:
        scale = max(abs(flo), abs(fhi), 1e-300)
        w = fhi - flo
        return w <= 1e-13 * scale or w <= 1e-15 * w0

    for _ in range(max_iters):
        if fhi <= flo or inb <= collect_limit or _collapsed():
            break

        def hist_partial(t: pa.Table, _lo=flo, _hi=fhi) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False)
            vf = v.astype(np.float64, copy=False)
            in_m = (vf >= _lo) & (vf <= _hi)
            width = max(_hi - _lo, 1e-300)
            bkt = np.clip(
                ((vf[in_m] - _lo) / width * nb).astype(np.int64), 0, nb - 1
            )
            flat = np.concatenate(
                [[int((vf < _lo).sum())], np.bincount(bkt, minlength=nb)]
            )
            nz = np.nonzero(flat)[0]
            return pa.table(
                {"pos": pa.array(nz, pa.int64()),
                 "cnt": pa.array(flat[nz], pa.int64())}
            )

        hist = (
            base.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("pos").sum("cnt").to_pandas()
        )
        ccol = "sum(cnt)" if "sum(cnt)" in hist.columns else "cnt"
        counts = np.zeros(nb + 1, dtype=np.int64)
        counts[hist["pos"].to_numpy()] = hist[ccol].to_numpy()
        cum = counts[0] + np.cumsum(counts[1:])
        b = int(np.searchsorted(cum, rank + 1))
        if b >= nb:  # float edge pushed the rank past the histogram
            break
        w = (fhi - flo) / nb
        new_lo = max(flo, flo + (b - 0.5) * w)
        new_hi = min(fhi, flo + (b + 1.5) * w)
        below = int(cum[b - 1]) if b else int(counts[0])
        inb = int(cum[b] - below)
        flo, fhi = new_lo, new_hi

    if inb > collect_limit and not _collapsed():
        raise RuntimeError(
            f"exact_rank_value bracket did not shrink under "
            f"{collect_limit} within {max_iters} passes (in={inb})"
        )

    def collect(t: pa.Table, _lo=flo, _hi=fhi) -> pa.Table:
        # one sentinel null-v row per batch carries the exact
        # below-bracket count; schema stays stable whatever the batch
        # contents
        v = t[col].to_numpy(zero_copy_only=False)
        vf = v.astype(np.float64, copy=False)
        in_m = (vf >= _lo) & (vf <= _hi)
        if in_m.any():
            vals, cnts = np.unique(v[in_m], return_counts=True)
        else:
            vals, cnts = np.empty(0, v.dtype), np.empty(0, np.int64)
        return pa.table(
            {
                "v": pa.concat_arrays(
                    [pa.array(vals).cast(t.schema.field(col).type),
                     pa.nulls(1, t.schema.field(col).type)]
                ),
                "cnt": pa.array(
                    np.concatenate([cnts.astype(np.int64), [0]])),
                "blw": pa.array(
                    np.concatenate(
                        [np.zeros(len(vals), np.int64),
                         [int((vf < _lo).sum())]])),
            }
        )

    import ray as _ray

    # resolve in Arrow (not pandas) so an int64 column with the null
    # sentinel row is not promoted to float64 — the returned threshold
    # keeps the column's native dtype. Blocks Ray passed through as
    # column-less empties (the 0-row-block phenomenon, see
    # join.inner_join_safe) carry no data and are dropped — their
    # below-bracket contribution is zero by construction.
    tbls = [
        t
        for t in _ray.get(
            base.map_batches(collect, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_columns > 0
    ]
    if not tbls:
        raise RuntimeError(
            f"exact_rank_value found no data in its bracket (rank={rank})"
        )
    got = pa.concat_tables(tbls)
    below = int(pc.sum(got["blw"]).as_py() or 0)
    vt = (
        got.filter(pc.is_valid(got["v"]))
        .group_by("v").aggregate([("cnt", "sum")])
        .sort_by("v")
    )
    cum = np.cumsum(vt["cnt_sum"].to_numpy())
    i = int(np.searchsorted(cum, rank - below + 1))
    if not (rank >= below and len(cum) and i < vt.num_rows):
        raise RuntimeError(
            f"exact_rank_value missed its rank (rank={rank}, below={below}, "
            f"in-distinct={vt.num_rows})"
        )
    return vt["v"][i].as_py()


def global_topk_filter(
    ds: Dataset,
    value_col: str,
    tiebreak_col: str,
    k: int,
    collect_limit: int = 262_144,
) -> Dataset:
    """EXACTLY the ``k`` best rows by (``value_col`` DESC,
    ``tiebreak_col`` ASC) — equivalent to SQL
    ``row_number() OVER (ORDER BY v DESC, id) <= k`` — WITHOUT a global
    sort, for k far too large for driver top-k heaps (e.g. "keep the
    best 25% of the corpus by quality score").

    Three bounded selection steps, each a streaming pass:
      1. the k-th largest value = ``exact_rank_value(rank = n-k)``;
      2. count of rows strictly above that threshold (always < k);
      3. among the TIE rows (value == threshold) select the remaining
         quota by smallest tiebreak id — another exact_rank_value, this
         time over the tie subset's id column.
    The returned Dataset is the input filtered by the two thresholds —
    one streaming pass over the FULL input at the end.

    The selection passes re-execute their input several times (count +
    stats + 1-3 histogram refinements + tie passes), so the
    (value, tiebreak) PROJECTION — two columns, independent of the
    input's width — is materialized once up front; a lazy ``ds`` whose
    scoring UDF is expensive would otherwise be recomputed per pass
    (measured 13 recomputations on the corpus-quality query).

    ``tiebreak_col`` must be unique per row (a doc_id); duplicates
    would make the final cut ambiguous. ``value_col`` comparisons are
    exact (same dtype both sides), so this composes with any
    bitwise-reproducible score.
    """
    base = ds.map_batches(
        lambda t, c=value_col: t.filter(pc.is_valid(t[c])),
        batch_format="pyarrow",
    )
    sel = base.select_columns([value_col, tiebreak_col]).materialize()
    n = sel.count()
    if k <= 0:
        return base.filter(lambda row: False)
    if k >= n:
        return base
    vthr = exact_rank_value(
        sel, value_col, rank=n - k, collect_limit=collect_limit
    )

    def gt_count(t: pa.Table) -> pa.Table:
        return pa.table(
            {"c": pa.array(
                [pc.sum(pc.greater(t[value_col], vthr)).as_py() or 0],
                pa.int64())}
        )

    n_gt = int(
        sel.map_batches(gt_count, batch_format="pyarrow")
        .aggregate(Sum("c", alias_name="s"))["s"]
    )
    need = k - n_gt  # >= 1 by construction (the threshold row itself)
    ties = sel.map_batches(
        lambda t, c=value_col: t.filter(pc.equal(t[c], vthr)),
        batch_format="pyarrow",
    )
    tthr = exact_rank_value(
        ties, tiebreak_col, rank=need - 1, collect_limit=collect_limit
    )

    def final_filter(t: pa.Table) -> pa.Table:
        keep = pc.or_(
            pc.greater(t[value_col], vthr),
            pc.and_(
                pc.equal(t[value_col], vthr),
                pc.less_equal(t[tiebreak_col], tthr),
            ),
        )
        return t.filter(keep)

    return base.map_batches(final_filter, batch_format="pyarrow")


def latest_by_key(
    ds: Dataset,
    key: str,
    order_cols: list[str],
    num_buckets: int = 64,
) -> Dataset:
    """Latest row per key — the CDC / upsert snapshot primitive: of all
    rows sharing ``key``, keep the one with the lexicographically
    LARGEST ``order_cols`` tuple (deterministic iff the tuple is unique
    per key; pass a unique id as the last order column).

    Two-level argmax so no reducer ever sees a whole key's history:
    each block first collapses to one candidate row per key it contains
    (vectorized np.lexsort + first-occurrence mask), then the
    candidates hash-shuffle into ``num_buckets`` disjoint key buckets
    and the SAME vectorized collapse runs once per bucket — no per-key
    Python anywhere, and a hot key still contributes at most one row
    per block to its bucket. Order columns must be integers or
    timestamps (sorted via int64 view; int64-min excluded).
    """

    def _sorted_first(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        kv = t[key].to_numpy(zero_copy_only=False)
        order_np = []
        for c in order_cols:
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if pa.types.is_timestamp(col.type):
                col = col.cast(pa.int64())
            order_np.append(-col.to_numpy(zero_copy_only=False))
        # np.lexsort: LAST key is primary -> (neg order reversed, key)
        idx = np.lexsort(tuple(reversed(order_np)) + (kv,))
        ks = kv[idx]
        first = np.empty(len(ks), dtype=bool)
        first[0] = True
        first[1:] = ks[1:] != ks[:-1]
        return t.take(pa.array(idx[first]))

    partials = ds.map_batches(_sorted_first, batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        from .transform import hash64_strings

        c = t[key]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if not pa.types.is_string(c.type):
            c = pc.cast(c, pa.string())
        b = (hash64_strings(c) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("_bucket", pa.array(b))

    return (
        partials.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(
            lambda t: _sorted_first(t.drop(["_bucket"])),
            batch_format="pyarrow",
        )
    )


def grouped_minmax_permille(
    ds: Dataset,
    key: str,
    cents_col: str,
    out_col: str = "norm_permille",
) -> Dataset:
    """Per-group min-max normalization to integer permille: for each
    row, ``(v - group_min) * 1000 // (group_max - group_min)`` (0 when
    the group is constant) — the feature-scaling step of a training
    pipeline, kept in ALL-INTEGER math over a cents column so the SQL
    oracle replays it bitwise (float normalization would differ in the
    last ulp between engines).

    Scale shape: one native keyed Min/Max aggregate (output bounded by
    distinct keys), its table broadcast once via ``ray.put``, then one
    shuffle-free vectorized map (pc.index_in lookup). Appends
    ``out_col`` to the input schema. Partitioning assumption: the
    distinct-key stats table fits the object store (it is the same
    volume any groupby of the input already produces)."""
    import ray

    stats = (
        ds.groupby(key)
        .aggregate(Min(cents_col, alias_name="mn"), Max(cents_col, alias_name="mx"))
        .materialize()
    )
    tbls = [t for t in ray.get(stats.to_arrow_refs()) if t.num_columns]
    st = pa.concat_tables(tbls) if tbls else None
    if st is None:
        return ds.map_batches(
            lambda t: t.append_column(out_col, pa.nulls(t.num_rows, pa.int64())),
            batch_format="pyarrow",
        )
    ref = ray.put(
        (
            st[key].combine_chunks() if isinstance(st[key], pa.ChunkedArray) else st[key],
            np.asarray(st["mn"], dtype=np.int64),
            np.asarray(st["mx"], dtype=np.int64),
        )
    )

    def fn(t: pa.Table) -> pa.Table:
        keys_b, mn, mx = ray.get(ref)
        idx = np.asarray(pc.index_in(t[key], value_set=keys_b), dtype=np.int64)
        v = np.asarray(pc.cast(t[cents_col], pa.int64()), dtype=np.int64)
        lo, hi = mn[idx], mx[idx]
        span = hi - lo
        out = np.where(span > 0, (v - lo) * 1000 // np.maximum(span, 1), 0)
        return t.append_column(out_col, pa.array(out, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def grouping_sets_agg(
    ds: Dataset,
    keys: list[str],
    sets: list[tuple[str, ...]],
    sum_cols: dict | None = None,
    count_alias: str = "cnt",
) -> pa.Table:
    """GROUPING SETS / CUBE / ROLLUP counts+sums from ONE streaming
    pass: per-batch Arrow group_by partials over the FULL key tuple ->
    one keyed Sum -> every requested grouping set derives from the
    bounded leaf table (O(distinct key combos), the same volume any
    groupby of the input already produces). Coarser levels never
    rescan the data.

    ``sets`` lists the grouping sets (subsets of ``keys``); rolled-up
    key columns are emitted as NULL, matching SQL semantics.
    ``sum_cols`` maps input numeric columns to output aliases.
    Assumes the key columns themselves are non-null (a NULL data key
    would be indistinguishable from the rollup marker without a
    GROUPING() column — same caveat as SQL consumers that match on
    NULL markers)."""
    import pandas as pd

    sum_cols = dict(sum_cols or {})
    src_cols = list(sum_cols)

    def partial(t: pa.Table) -> pa.Table:
        aggs = [([], "count_all")] + [(c, "sum") for c in src_cols]
        g = t.select(keys + src_cols).group_by(keys).aggregate(aggs)
        return g.rename_columns(keys + [count_alias] + src_cols)

    leaf_ds = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(
            Sum(count_alias, alias_name=count_alias),
            *[Sum(c, alias_name=a) for c, a in sum_cols.items()],
        )
    )
    leaf = leaf_ds.to_pandas()
    metrics = [count_alias] + list(sum_cols.values())
    frames = []
    for s in sets:
        s = list(s)
        if set(s) == set(keys):
            g = leaf[keys + metrics].copy()
        elif s:
            g = leaf.groupby(s, as_index=False, dropna=False)[metrics].sum()
        else:
            g = leaf[metrics].sum().to_frame().T
        for k in keys:
            if k not in s:
                g[k] = None
        frames.append(g[keys + metrics])
    out = pd.concat(frames, ignore_index=True)
    for m in metrics:
        out[m] = out[m].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
        None
    )


def cube_agg(
    ds: Dataset,
    keys: list[str],
    sum_cols: dict | None = None,
    count_alias: str = "cnt",
) -> pa.Table:
    """SQL ``GROUP BY CUBE(keys)``: every subset of ``keys`` as a
    grouping set, derived from one pass (see grouping_sets_agg)."""
    from itertools import combinations

    sets = [
        c for n in range(len(keys), -1, -1) for c in combinations(keys, n)
    ]
    return grouping_sets_agg(ds, keys, sets, sum_cols, count_alias)


def dense_time_counts(
    ds: Dataset,
    key: str,
    ts_col: str,
    unit: str = "hour",
    count_alias: str = "cnt",
) -> Dataset:
    """Gap-filled time-series counts: per-(key, time bucket) event
    counts DENSIFIED over the global [min, max] bucket span — every
    (key, bucket) combination appears, zero-filled when no events
    landed there (the resample/densify step dashboards and anomaly
    detectors need; sparse counts silently skip the most anomalous
    buckets of all, the empty ones).

    Scale shape: counts come from the standard partial -> keyed Sum
    plan (bounded by keys x buckets); the span and the key list derive
    from the BOUNDED counts table, never a second scan. The dense grid
    is built DISTRIBUTEDLY: ``rd.range(n_keys * n_buckets)`` blocks map
    their index ranges to (key, bucket) pairs and attach counts via a
    broadcast composite-index lookup (the counts table is O(output
    rows) by construction, the same volume the caller is asking to
    receive). No all-to-all beyond the count aggregate itself."""
    import ray
    import ray.data as rd

    step_us = {"hour": 3_600_000_000, "day": 86_400_000_000}[unit]

    def bucketize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[ts_col]))
        b = pc.floor_temporal(t[ts_col], unit=unit).cast(pa.timestamp("us"))
        return pa.table({key: t[key], "bucket": b})

    counts = count_groupby(
        ds.map_batches(bucketize, batch_format="pyarrow"),
        [key, "bucket"],
        alias=count_alias,
    ).materialize()
    tbls = [t for t in ray.get(counts.to_arrow_refs()) if t.num_columns]
    ct = pa.concat_tables(tbls) if tbls else None
    if ct is None or not ct.num_rows:
        return rd.from_arrow(
            pa.table(
                {
                    key: pa.array([], pa.string()),
                    "bucket": pa.array([], pa.timestamp("us")),
                    count_alias: pa.array([], pa.int64()),
                }
            )
        )
    # keyed aggregates coarsen timestamp keys to [s] (Ray 2.49); values
    # are bucket-truncated so only the unit is lost — restore to us
    buckets_us = pc.cast(
        pc.cast(ct["bucket"], pa.timestamp("us")), pa.int64()
    ).to_numpy(zero_copy_only=False)
    lo, hi = int(buckets_us.min()), int(buckets_us.max())
    n_buckets = (hi - lo) // step_us + 1
    keys_arr = pc.unique(
        ct[key].combine_chunks()
        if isinstance(ct[key], pa.ChunkedArray)
        else ct[key]
    )
    keys_arr = keys_arr.take(pc.sort_indices(keys_arr))
    kidx = pc.index_in(ct[key], value_set=keys_arr).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    comp = kidx * n_buckets + (buckets_us - lo) // step_us
    order = np.argsort(comp)
    ref = ray.put(
        (
            keys_arr,
            comp[order],
            ct[count_alias].to_numpy(zero_copy_only=False)[order],
        )
    )

    def fill(t: pa.Table) -> pa.Table:
        ks, comp_sorted, cnts = ray.get(ref)
        ids = t["id"].to_numpy(zero_copy_only=False)
        ki = ids // n_buckets
        bi = ids % n_buckets
        pos = np.searchsorted(comp_sorted, ids)
        pos_c = np.minimum(pos, len(comp_sorted) - 1)
        hit = comp_sorted[pos_c] == ids
        out = np.where(hit, cnts[pos_c], 0)
        return pa.table(
            {
                key: pc.take(ks, pa.array(ki)),
                "bucket": pa.array(lo + bi * step_us, pa.timestamp("us")),
                count_alias: pa.array(out, pa.int64()),
            }
        )

    return rd.range(len(keys_arr) * n_buckets).map_batches(
        fill, batch_format="pyarrow"
    )


def grouped_mad(
    ds: Dataset,
    key: str,
    value_col: str,
    out_col: str = "mad_value",
    **quantile_kw,
) -> pa.Table:
    """Per-group median absolute deviation — the robust dispersion
    measure quality-filtering pipelines use where stddev is
    outlier-poisoned: ``median(|v - median(v)|)`` per group.

    Exact medians are not partial-mergeable, so both passes run the
    distributed-selection machinery of :func:`grouped_exact_quantile`
    (no reducer or the driver ever holds a group's values):

      1. first selection pass -> per-group median table (O(#groups));
      2. the median LUT broadcasts ONCE via ``ray.put`` and a
         shuffle-free vectorized map rewrites each row to its absolute
         deviation (``pc.index_in`` lookup, same shape as
         grouped_minmax_permille);
      3. second selection pass over the deviations -> the MAD.

    The 2-column projection is materialized once up front and feeds
    both passes (each pass re-scans its input per refinement
    iteration — the global_topk_filter lesson). Deviations are plain
    IEEE doubles computed identically by any engine from the same
    inputs, so a SQL oracle replays the result bitwise given the
    median itself matches (which grouped_exact_quantile's
    quantile_cont parity guarantees).
    """
    import ray

    base = ds.map_batches(
        lambda t: t.select([key, value_col]).filter(pc.is_valid(t[value_col])),
        batch_format="pyarrow",
    ).materialize()
    med = grouped_exact_quantile(base, key, value_col, q=0.5, **quantile_kw)
    if not med.num_rows:
        return pa.table(
            {key: med[key], out_col: pa.array([], pa.float64())}
        )
    ref = ray.put(
        (
            med[key].combine_chunks()
            if isinstance(med[key], pa.ChunkedArray)
            else med[key],
            np.asarray(med["quantile_value"], dtype=np.float64),
        )
    )

    def dev(t: pa.Table) -> pa.Table:
        keys_b, mv = ray.get(ref)
        idx = np.asarray(pc.index_in(t[key], value_set=keys_b), dtype=np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        d = np.abs(v - mv[idx])
        return pa.table({key: t[key], "dev": pa.array(d, pa.float64())})

    devs = base.map_batches(dev, batch_format="pyarrow").materialize()
    out = grouped_exact_quantile(devs, key, "dev", q=0.5, **quantile_kw)
    return out.rename_columns([key, out_col])


def grouped_corr_fixed(
    ds: Dataset,
    key: str,
    x_col: str,
    y_col: str,
    out_col: str = "corr_xy",
) -> Dataset:
    """Per-group Pearson correlation in FIXED-ORDER arithmetic over
    integer-exact columns (cents / hours / counts), so a SQL oracle
    replays the doubles bitwise.

    Scale shape — the classic mergeable-moments plan: each batch
    collapses to per-group int64 moment partials
    ``(n, Σx, Σy, Σx², Σy², Σxy)`` (Arrow group_by; exchange volume is
    one row per (group, batch)), ONE keyed Sum merges them, then the
    closed form finishes on the tiny per-group table in an explicit
    double-op order both engines evaluate identically under IEEE 754:

        num = (f64)n·(f64)Σxy − (f64)Σx·(f64)Σy
        den = sqrt((f64)n·(f64)Σx² − (f64)Σx·(f64)Σx)
            · sqrt((f64)n·(f64)Σy² − (f64)Σy·(f64)Σy)

    (each cast/product/subtract is one correctly-rounded op, no FMA on
    either side). Integer sums are EXACT up to int64 — safe while
    Σx² < 2^63, e.g. ~4·10⁸ rows/group at |x| ≤ 5·10⁴ cents; beyond
    that, split the sums into hi/lo int64 pairs. Groups where either
    variance term is ≤ 0 (constant column) yield null, matching SQL
    ``corr``'s NULL. Returns (key, out_col:float64).
    """

    def moment_partial(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tbl = pa.table(
            {
                key: t[key],
                "p_n": pa.array(np.ones(len(x), np.int64)),
                "p_sx": pa.array(x),
                "p_sy": pa.array(y),
                "p_sxx": pa.array(x * x),
                "p_syy": pa.array(y * y),
                "p_sxy": pa.array(x * y),
            }
        )
        return tbl.group_by(key).aggregate(
            [(c, "sum") for c in ("p_n", "p_sx", "p_sy", "p_sxx", "p_syy", "p_sxy")]
        ).rename_columns([key, "p_n", "p_sx", "p_sy", "p_sxx", "p_syy", "p_sxy"])

    sums = (
        ds.map_batches(moment_partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(
            Sum("p_n", alias_name="n"),
            Sum("p_sx", alias_name="sx"),
            Sum("p_sy", alias_name="sy"),
            Sum("p_sxx", alias_name="sxx"),
            Sum("p_syy", alias_name="syy"),
            Sum("p_sxy", alias_name="sxy"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sy = t["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxx = t["sxx"].to_numpy(zero_copy_only=False).astype(np.float64)
        syy = t["syy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = t["sxy"].to_numpy(zero_copy_only=False).astype(np.float64)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        num = n * sxy - sx * sy
        ok = (vx > 0) & (vy > 0)
        den = np.sqrt(np.where(ok, vx, 1.0)) * np.sqrt(np.where(ok, vy, 1.0))
        r = np.where(ok, num / den, np.nan)
        # from_pandas=True turns the constant-column NaNs into true
        # Arrow nulls, matching SQL corr's NULL
        return pa.table(
            {key: t[key], out_col: pa.array(r, pa.float64(), from_pandas=True)}
        )

    return sums.map_batches(finish, batch_format="pyarrow")


def grouped_regr_fixed(
    ds: Dataset,
    key: str,
    x_col: str,
    y_col: str,
    slope_col: str = "slope",
    intercept_col: str = "intercept",
) -> Dataset:
    """Per-group simple linear regression (least squares y = a·x + b)
    in FIXED-ORDER arithmetic over integer-exact columns — the grouped
    trend-fit map, sharing grouped_corr_fixed's mergeable-moments plan
    (per-batch int64 partials (n, Σx, Σy, Σx², Σxy), ONE keyed Sum).

    Closed form in an explicit double-op order a SQL oracle replays
    bitwise (each cast/product/subtract/divide one correctly-rounded
    IEEE op):

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx)
        intercept = (Σy − slope·Σx) / n

    Groups with zero x-variance yield typed NULLs (SQL regr_slope
    semantics). Same int64 exactness bound as grouped_corr_fixed."""

    def moment_partial(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tbl = pa.table(
            {
                key: t[key],
                "p_n": pa.array(np.ones(len(x), np.int64)),
                "p_sx": pa.array(x),
                "p_sy": pa.array(y),
                "p_sxx": pa.array(x * x),
                "p_sxy": pa.array(x * y),
            }
        )
        return tbl.group_by(key).aggregate(
            [(c, "sum") for c in ("p_n", "p_sx", "p_sy", "p_sxx", "p_sxy")]
        ).rename_columns([key, "p_n", "p_sx", "p_sy", "p_sxx", "p_sxy"])

    sums = (
        ds.map_batches(moment_partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(
            Sum("p_n", alias_name="n"),
            Sum("p_sx", alias_name="sx"),
            Sum("p_sy", alias_name="sy"),
            Sum("p_sxx", alias_name="sxx"),
            Sum("p_sxy", alias_name="sxy"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sy = t["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxx = t["sxx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = t["sxy"].to_numpy(zero_copy_only=False).astype(np.float64)
        vx = n * sxx - sx * sx
        ok = vx != 0.0
        slope = np.where(ok, (n * sxy - sx * sy) / np.where(ok, vx, 1.0), np.nan)
        intercept = np.where(ok, (sy - slope * sx) / n, np.nan)
        return pa.table(
            {
                key: t[key],
                slope_col: pa.array(slope, pa.float64(), from_pandas=True),
                intercept_col: pa.array(
                    intercept, pa.float64(), from_pandas=True
                ),
            }
        )

    return sums.map_batches(finish, batch_format="pyarrow")


def grouped_ewma_last(
    ds: Dataset,
    key: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.3,
    num_buckets: int | None = None,
) -> Dataset:
    """Per-key exponentially-weighted moving average over the key's
    time-ordered values, returning each key's LAST smoothed value and
    count — the recency-weighted user-level signal. Exact contract
    is pandas' adjust=False kernel: alpha first round-trips through
    com (a' = 1/(1 + (1/a - 1)), which perturbs e.g. 0.9 to
    0.8999999999999999), then y0 = x0,
    y_i = ((1-a')*y_{i-1} + a'*x_i) / ((1-a') + a') — note the
    normalizing denominator is not bitwise 1.0 either. Both quirks
    differ from the textbook a*x + (1-a)*y only in the last bit, but
    the property test pins them exactly.

    EWMA is inherently sequential per key, so this is the actor-less
    bucketed-scan pattern (same co-location contract as
    events_type_transitions): rows hash-bucket by key — a key's whole
    history lands in ONE bucket, bounding reducer input to ~N/buckets
    — and inside each bucket pandas' cython GroupBy.ewm computes every
    key's full recursion in one vectorized call; segment-end indices
    pick the last value without a second pass. No oracle: SQL has no
    EWMA and the float recursion is order-sensitive by construction;
    correctness is pytest-forced against a naive per-key recursion.

    Returns (key, n_obs, ewma_last:float64)."""
    import pandas as pd

    if num_buckets is None:
        import ray

        num_buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 4)))

    def tag(t: pa.Table) -> pa.Table:
        col = t[key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        hb = pd.util.hash_array(col.to_numpy(zero_copy_only=False)) % num_buckets
        return t.append_column("_hb", pa.array(hb.astype(np.int64)))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, *order_cols], kind="mergesort")
        sm = (
            df.groupby(key, sort=False)[value_col]
            .ewm(alpha=alpha, adjust=False)
            .mean()
            .to_numpy()
        )
        k = df[key].to_numpy()
        last = np.flatnonzero(
            np.concatenate([k[1:] != k[:-1], [True]]) if len(k) else []
        )
        counts = np.diff(np.concatenate([[-1], last]))
        return pd.DataFrame(
            {
                key: k[last],
                "n_obs": counts.astype(np.int64),
                "ewma_last": sm[last],
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_hb")
        .map_groups(per_bucket, batch_format="pandas")
    )


def grouped_top_k_ties(
    ds: Dataset,
    group_keys: list[str],
    rank_keys: list[tuple[str, str]],
    k: int,
    rank_col: str = "rnk",
) -> Dataset:
    """Per-group top-k with SQL RANK() tie semantics — every row whose
    rank is <= k survives, ties share a rank and create gaps (the
    QUALIFY rank() <= k shape; grouped_top_k's head-k would
    arbitrarily drop tied rows).

    Scale shape: the same two-level prune as grouped_top_k, but the
    local prune keeps rows with batch-local RANK <= k (safe: a row's
    global rank is >= its rank in any subset, so no global top-k row
    is ever pruned); the keyed shuffle then moves only survivors and
    the final per-group pass computes exact ranks. rank_keys:
    [(col, 'ascending'|'descending')] — rank is determined solely by
    these values, so no tiebreaker is needed (that is the point)."""
    import pandas as pd

    by = [c for c, _ in rank_keys]
    asc = [d == "ascending" for _, d in rank_keys]

    def add_rank(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            df[rank_col] = pd.Series([], dtype="int64")
            return df
        # lexicographic rank via sort + tie-run detection (pandas
        # .rank() is single-column; this handles multi-key rank)
        df = df.sort_values(
            by=list(group_keys) + by,
            ascending=[True] * len(group_keys) + asc,
            kind="mergesort",
        ).reset_index(drop=True)
        grp_change = (
            (df[group_keys] != df[group_keys].shift()).any(axis=1)
            if len(group_keys)
            else pd.Series(False, index=df.index)
        )
        val_change = (df[by] != df[by].shift()).any(axis=1)
        import numpy as np

        pos = np.arange(len(df), dtype=np.int64)
        grp_start = pos[grp_change.to_numpy()] if len(df) else pos[:0]
        # position of each row's group start
        start_of = np.zeros(len(df), dtype=np.int64)
        start_of[grp_change.to_numpy()] = grp_start
        start_of = np.maximum.accumulate(start_of)
        new_val = (grp_change | val_change).to_numpy()
        # rank = position (within group) of the first row of this
        # row's tie-run + 1
        run_start = np.where(new_val, pos, 0)
        run_start = np.maximum.accumulate(run_start)
        df[rank_col] = run_start - start_of + 1
        return df

    def local(df: "pd.DataFrame") -> "pd.DataFrame":
        df = add_rank(df)
        return df[df[rank_col] <= k].drop(columns=[rank_col])

    pruned = ds.map_batches(local, batch_format="pandas")

    def final(df: "pd.DataFrame") -> "pd.DataFrame":
        df = add_rank(df)
        return df[df[rank_col] <= k]

    return pruned.groupby(group_keys).map_groups(final, batch_format="pandas")


# ------------------------------------------------- session-6 operators


def grouped_ohlc(
    ds: Dataset,
    keys: list[str],
    order_cols: list[str],
    value_col: str,
) -> Dataset:
    """Per-group OHLC bars — ordered FIRST/LAST by ``order_cols`` plus
    min/max/count of ``value_col`` (the time-series downsampling /
    candle shape; ``order_cols`` must be two int64-comparable columns
    (primary, unique tiebreak) so open/close are deterministic).

    Scale shape: one vectorized per-batch fold (lexsort + reduceat)
    collapses every batch to <= one partial row per group; partials
    carry their own argmin/argmax ORDER KEYS so they merge without
    re-seeing rows; ONE keyed exchange over partials (bounded by
    groups x batches) finishes with a per-group lexicographic pick."""
    import pandas as pd

    o1, o2 = order_cols

    def partial(t: pa.Table) -> pa.Table:
        cols = {}
        if t.num_rows == 0:
            for k in keys:
                cols[k] = t[k]
            for c in ["o_1", "o_2", "o_v", "c_1", "c_2", "c_v", "lo", "hi", "n"]:
                cols[c] = pa.array([], pa.int64())
            return pa.table(cols)
        codes = []
        for k in keys:
            arr = t[k]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            _, inv = np.unique(arr.to_numpy(zero_copy_only=False), return_inverse=True)
            codes.append(inv)
        a1 = t[o1].to_numpy(zero_copy_only=False)
        a2 = t[o2].to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((a2, a1, *reversed(codes)))
        new = np.ones(len(order), bool)
        if len(order) > 1:
            chg = np.zeros(len(order) - 1, bool)
            for c in codes:
                cs = c[order]
                chg |= cs[1:] != cs[:-1]
            new[1:] = chg
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(order)) - 1
        v_s = v[order]
        for k in keys:
            arr = t[k]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            cols[k] = arr.take(pa.array(order[starts], pa.int64()))
        cols.update(
            {
                "o_1": pa.array(a1[order[starts]], pa.int64()),
                "o_2": pa.array(a2[order[starts]], pa.int64()),
                "o_v": pa.array(v_s[starts], pa.int64()),
                "c_1": pa.array(a1[order[ends]], pa.int64()),
                "c_2": pa.array(a2[order[ends]], pa.int64()),
                "c_v": pa.array(v_s[ends], pa.int64()),
                "lo": pa.array(np.minimum.reduceat(v_s, starts), pa.int64()),
                "hi": pa.array(np.maximum.reduceat(v_s, starts), pa.int64()),
                "n": pa.array(np.diff(np.append(starts, len(order))).astype(np.int64)),
            }
        )
        return pa.table(cols)

    def finish(df: "pd.DataFrame") -> "pd.DataFrame":
        o = df.sort_values(["o_1", "o_2"], kind="mergesort").iloc[0]
        c = df.sort_values(["c_1", "c_2"], kind="mergesort").iloc[-1]
        row = {k: df[k].iloc[0] for k in keys}
        row.update(
            {
                "open": int(o["o_v"]),
                "high": int(df["hi"].max()),
                "low": int(df["lo"].min()),
                "close": int(c["c_v"]),
                "n": int(df["n"].sum()),
            }
        )
        return pd.DataFrame([row])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .map_groups(finish, batch_format="pandas")
    )


def grouped_spearman(
    ds: Dataset,
    key: str,
    x_col: str,
    y_col: str,
    out_col: str = "spearman_rho",
) -> Dataset:
    """Per-group SPEARMAN rank correlation over two bounded-domain
    int64 columns — rank statistics WITHOUT a global sort.

    Average ranks are a closed form over per-(key, value) count
    tables: 2r = 2*below + cnt + 1 stays exact int64. Pass 1 builds
    BOTH bounded count grids in ONE two-lane keyed exchange (rows
    bounded by domain x groups x 2, never event count); pass 2 is a
    shuffle-free map accumulating int64 moment partials over the
    doubled ranks -> tiny keyed Sum -> fixed-order IEEE Pearson finish
    (the 2x cancels). Int64-exact while n_group <~ 1e6 rows (Sxx ~
    n^3). The projected input is materialized once (the
    grouped_exact_quantile lesson) so the grid and moment passes never
    re-execute a lazy upstream."""
    import ray

    ds = ds.materialize()

    def grid_partial(t: pa.Table) -> pa.Table:
        karr = t[key]
        if isinstance(karr, pa.ChunkedArray):
            karr = karr.combine_chunks()
        n = len(karr)
        both = pa.table(
            {
                key: pa.concat_arrays([karr, karr]),
                "lane": pa.array(
                    np.r_[np.zeros(n, np.int64), np.ones(n, np.int64)]
                ),
                "v": pa.array(
                    np.r_[
                        t[x_col].to_numpy(zero_copy_only=False),
                        t[y_col].to_numpy(zero_copy_only=False),
                    ],
                    pa.int64(),
                ),
                "c": pa.array(np.ones(2 * n, np.int64)),
            }
        )
        g = both.group_by([key, "lane", "v"]).aggregate([("c", "sum")])
        return g.rename_columns([key, "lane", "v", "pc"])

    grids = (
        ds.map_batches(grid_partial, batch_format="pyarrow")
        .groupby([key, "lane", "v"])
        .sum("pc")
        .to_pandas()
    )
    ccol = "sum(pc)" if "sum(pc)" in grids.columns else "pc"

    def rank_lut(lane: int):
        dist = grids[grids["lane"] == lane].sort_values(
            [key, "v"], ignore_index=True
        )
        groups = sorted(dist[key].unique())
        gidx = {k: i for i, k in enumerate(groups)}
        gi = dist[key].map(gidx).to_numpy(np.int64)
        v = dist["v"].to_numpy(np.int64)
        c = dist[ccol].to_numpy(np.int64)
        cum = np.cumsum(c)
        grp_start = np.r_[0, np.flatnonzero(np.diff(gi)) + 1]
        below = cum - c
        below -= np.repeat(below[grp_start], np.diff(np.r_[grp_start, len(c)]))
        r2 = 2 * below + c + 1
        span = int(v.max()) + 1 if len(v) else 1
        return pa.array(groups), gi * span + v, r2, span

    groups_x, comp_x, r2_x, span_x = rank_lut(0)
    _, comp_y, r2_y, span_y = rank_lut(1)
    ref = ray.put((groups_x, comp_x, r2_x, span_x, comp_y, r2_y, span_y))

    def moments(t: pa.Table) -> pa.Table:
        gs, cx, rx, spx, cy, ry, spy = ray.get(ref)
        gi = (
            pc.index_in(t[key], value_set=gs)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        v = t[x_col].to_numpy(zero_copy_only=False)
        h = t[y_col].to_numpy(zero_copy_only=False)
        x = rx[np.searchsorted(cx, gi * spx + v)]
        y = ry[np.searchsorted(cy, gi * spy + h)]
        karr = t[key]
        if isinstance(karr, pa.ChunkedArray):
            karr = karr.combine_chunks()
        g = (
            pa.table(
                {
                    key: karr,
                    "pn": pa.array(np.ones(len(x), np.int64)),
                    "psx": pa.array(x, pa.int64()),
                    "psy": pa.array(y, pa.int64()),
                    "psxx": pa.array(x * x, pa.int64()),
                    "psyy": pa.array(y * y, pa.int64()),
                    "psxy": pa.array(x * y, pa.int64()),
                }
            )
            .group_by(key)
            .aggregate(
                [
                    ("pn", "sum"),
                    ("psx", "sum"),
                    ("psy", "sum"),
                    ("psxx", "sum"),
                    ("psyy", "sum"),
                    ("psxy", "sum"),
                ]
            )
        )
        return g.rename_columns([key, "pn", "psx", "psy", "psxx", "psyy", "psxy"])

    summed = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby(key)
        .aggregate(
            Sum("pn", alias_name="n"),
            Sum("psx", alias_name="sx"),
            Sum("psy", alias_name="sy"),
            Sum("psxx", alias_name="sxx"),
            Sum("psyy", alias_name="syy"),
            Sum("psxy", alias_name="sxy"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        # bounded (#groups) table; each product/subtract/sqrt/divide is
        # ONE correctly-rounded double op, replayed verbatim in SQL
        n = t["n"].to_numpy().astype(np.float64)
        sx = t["sx"].to_numpy().astype(np.float64)
        sy = t["sy"].to_numpy().astype(np.float64)
        sxx = t["sxx"].to_numpy().astype(np.float64)
        syy = t["syy"].to_numpy().astype(np.float64)
        sxy = t["sxy"].to_numpy().astype(np.float64)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        ok = (vx > 0) & (vy > 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            rho = (n * sxy - sx * sy) / (np.sqrt(vx) * np.sqrt(vy))
        return pa.table(
            {
                key: t[key],
                out_col: pa.array(np.where(ok, rho, np.nan), pa.float64(), mask=~ok),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow")


def keyed_sum_bounded(
    partials: Dataset,
    keys: list[str],
    sum_cols: dict[str, str],
    driver_rows: int = 2_000_000,
) -> Dataset:
    """Final keyed Sum over PRE-AGGREGATED per-batch partials. Below
    ``driver_rows`` total partial rows the fold is one Arrow group_by
    on the driver — Ray's sort-based Aggregate carries ~1-1.5 s of
    fixed exchange cost that dwarfs a few thousand partial rows; above
    the guard the keyed aggregate runs (the 100 TB route, where that
    cost amortizes). Integer sums are exact on both routes, so they
    are value-equal by construction."""
    import ray
    import ray.data as rd

    parts = partials.materialize()
    if parts.count() <= driver_rows:
        tbls = [t for t in ray.get(parts.to_arrow_refs()) if t.num_columns]
        if tbls:
            g = (
                pa.concat_tables(tbls)
                .combine_chunks()
                .group_by(keys)
                .aggregate([(c, "sum") for c in sum_cols])
            )
            g = g.rename_columns(list(keys) + list(sum_cols.values()))
            return rd.from_arrow(g)
    return parts.groupby(keys if len(keys) > 1 else keys[0]).aggregate(
        *[Sum(c, alias_name=o) for c, o in sum_cols.items()]
    )


# boundary rows at or under this fold in ONE task (global lexsort +
# cumsum — the bucketed plan's math with a zero prefix), skipping the
# totals exchange, the per-bucket shuffle and the finish repartition;
# the task, not the driver, holds the rows (first-touch driver pages
# cost ~1s/25MB on this VM)
SWEEP_FOLD_TASK_ROWS = 4_000_000


def _sweep_bounds_blocks(blocks) -> tuple:
    import pyarrow as _pa

    tbls = [b for b in blocks if b.num_columns and b.num_rows]
    if not tbls:
        return None, None
    t = _pa.concat_tables(tbls)
    tv = np.asarray(t["t"], dtype=np.int64)
    dv = np.asarray(t["delta"], dtype=np.int64)
    order = np.lexsort((-dv, tv))  # +1 before -1 at ties
    return tv[order], np.cumsum(dv[order])


def _sweep_max_fold(bucket_us: int, out_grain_us: int, out_col: str, *blocks):
    """Global sweep fold: per out-grain max of the running count.
    Equal to the bucketed plan by construction — buckets partition the
    sorted t-axis into contiguous slices, where prefix(b) + local
    cumsum IS the global cumsum."""
    ts_s, conc = _sweep_bounds_blocks(blocks)
    if ts_s is None:
        return pa.table(
            {"grain": pa.array([], pa.int64()), out_col: pa.array([], pa.int64())}
        )
    g = ts_s // out_grain_us
    starts = np.ones(len(g), dtype=bool)
    starts[1:] = g[1:] != g[:-1]
    idx = np.flatnonzero(starts)
    return pa.table(
        {
            "grain": pa.array(g[idx], pa.int64()),
            out_col: pa.array(np.maximum.reduceat(conc, idx), pa.int64()),
        }
    )


def _sweep_integral_fold(*blocks):
    """Global time-weighted sweep fold: integral / peak / span / avg
    in one pass — the bucketed plan's math with one bucket and zero
    prefix (cross-bucket segments collapse into the same cumsum)."""
    ts_s, conc = _sweep_bounds_blocks(blocks)
    if ts_s is None:
        peak = integral = span = 0
    else:
        integral = (
            int(np.sum(conc[:-1] * (ts_s[1:] - ts_s[:-1])))
            if len(conc) > 1
            else 0
        )
        peak = int(conc.max())
        span = int(ts_s[-1] - ts_s[0])
    avg = float(integral) / float(span) if span > 0 else float("nan")
    return pa.table(
        {
            "peak_concurrent": pa.array([peak], pa.int64()),
            "conc_us_integral": pa.array([integral], pa.int64()),
            "span_us": pa.array([span], pa.int64()),
            "avg_concurrency": pa.array(
                [avg], pa.float64(), mask=np.array([span <= 0])
            ),
        }
    )


def sweep_max_concurrent(
    intervals: Dataset,
    t0_col: str,
    t1_col: str,
    bucket_us: int,
    out_grain_us: int,
    out_col: str = "max_concurrent",
    fold_task_rows: int = SWEEP_FOLD_TASK_ROWS,
) -> Dataset:
    """Interval SWEEP-LINE: peak number of concurrently-open intervals
    per ``out_grain_us`` bucket (inclusive occupancy — an interval
    ending at t frees its slot AFTER one starting at t is counted).

    Scale shape (the partitioned_running_sum SCAN, specialized so the
    grain-max FUSES into the per-bucket pass): each interval becomes 2
    boundary rows (+1 at t0, -1 at t1); per-batch per-bucket delta
    totals -> one BOUNDED keyed Sum -> exclusive driver prefix in
    bucket order; then ONE exchange co-locates each ``bucket_us``
    bucket's boundaries and a vectorized sort+cumsum emits a single
    (grain, local max) row per bucket — the finish folds the bounded
    (#buckets) table on one coalesced block, no further all-to-all.
    Requires out_grain_us % bucket_us == 0 so a bucket maps to exactly
    one grain. Ties at equal (t, delta) permute only within a
    same-delta run, where the running values form the same multiset ->
    the per-grain max is deterministic."""
    import pandas as pd

    import ray

    if out_grain_us % bucket_us != 0:
        raise ValueError("out_grain_us must be a multiple of bucket_us")

    def boundaries(t: pa.Table) -> pa.Table:
        t0 = t[t0_col].to_numpy(zero_copy_only=False)
        t1 = t[t1_col].to_numpy(zero_copy_only=False)
        bt = np.concatenate([t0, t1])
        delta = np.concatenate(
            [np.ones(len(t0), np.int64), -np.ones(len(t1), np.int64)]
        )
        return pa.table(
            {
                "t": pa.array(bt, pa.int64()),
                "delta": pa.array(delta, pa.int64()),
                "b": pa.array(bt // bucket_us, pa.int64()),
            }
        )

    bounds = intervals.map_batches(
        boundaries, batch_format="pyarrow"
    ).materialize()
    if bounds.count() <= fold_task_rows:
        import ray.data as _rd

        out = ray.get(
            ray.remote(_sweep_max_fold).remote(
                bucket_us, out_grain_us, out_col, *bounds.to_arrow_refs()
            )
        )
        return _rd.from_arrow(out)

    def totals_partial(t: pa.Table) -> pa.Table:
        g = t.select(["b", "delta"]).group_by("b").aggregate([("delta", "sum")])
        return g.rename_columns(["b", "p"])

    totals = (
        bounds.map_batches(totals_partial, batch_format="pyarrow")
        .groupby("b")
        .sum("p")
        .to_pandas()
    )
    col = "sum(p)" if "sum(p)" in totals.columns else "p"
    totals = totals.sort_values("b", kind="mergesort")
    run = totals[col].cumsum().shift(fill_value=0)  # exclusive prefix
    prefix = dict(zip(totals["b"].astype(int), run.astype(int)))
    prefix_ref = ray.put(prefix)
    grain_per_bucket = out_grain_us // bucket_us

    def bucket_max(t: pa.Table) -> pa.Table:
        pmap = ray.get(prefix_ref)
        tv = t["t"].to_numpy(zero_copy_only=False)
        dv = t["delta"].to_numpy(zero_copy_only=False)
        order = np.lexsort((-dv, tv))  # +1 before -1 at ties
        conc = np.cumsum(dv[order])
        b = int(t["b"][0].as_py())
        peak = int(conc.max()) + pmap.get(b, 0)
        return pa.table(
            {
                "grain": pa.array([b // grain_per_bucket], pa.int64()),
                "m": pa.array([peak], pa.int64()),
            }
        )

    per_bucket = (
        bounds.groupby("b").map_groups(bucket_max, batch_format="pyarrow")
    )

    def finish(df: "pd.DataFrame") -> "pd.DataFrame":
        out = df.groupby("grain")["m"].max().reset_index(name=out_col)
        return out

    # bounded (#buckets rows): fold on one coalesced block
    return per_bucket.repartition(1).map_batches(finish, batch_format="pandas")


def lag_gap_flag(
    ds: Dataset,
    key: str,
    ts_col: str,
    tiebreak_col: str,
    gap_us: int,
    flag_col: str = "kept",
) -> Dataset:
    """Debounce / throttle flag — LAG semantics: a row is flagged 1 iff
    it is its key's first or arrives >= ``gap_us`` after the key's
    PREVIOUS row in (ts, tiebreak) order (the previous row counts
    whether or not it was itself kept — what makes this one vectorized
    shift instead of an iterative scan). Returns all rows + the int64
    flag.

    Scale shape: rows hash-bucket by key (adjacency co-location); one
    lexsort + shift per bucket; no other exchange."""
    import pandas as pd

    num_buckets = 4 * max(2, _default_cpus())

    def tag(t: pa.Table) -> pa.Table:
        arr = t[key]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        hb = pd.util.hash_array(arr.to_numpy(zero_copy_only=False)) % num_buckets
        return t.append_column("_hb", pa.array(hb.astype(np.int64)))

    def per_bucket(t: pa.Table) -> pa.Table:
        u = t[key].to_numpy(zero_copy_only=False)
        ts = t[ts_col].to_numpy(zero_copy_only=False)
        tb = t[tiebreak_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, ts, u))
        us, tss = u[order], ts[order]
        kept = np.ones(len(us), bool)
        if len(us) > 1:
            same = us[1:] == us[:-1]
            kept[1:] = ~same | (tss[1:] - tss[:-1] >= gap_us)
        out = t.drop_columns(["_hb"]).take(pa.array(order, pa.int64()))
        return out.append_column(flag_col, pa.array(kept.astype(np.int64)))

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_hb")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def _default_cpus() -> int:
    import ray

    return max(2, int(ray.cluster_resources().get("CPU", 4)))


def snapshot_diff(
    ds: Dataset,
    key: str,
    cond_col: str,
    value_col: str,
) -> Dataset:
    """CDC-style snapshot diff WITHOUT a join: per-key count and sum at
    snapshot A (rows where ``cond_col`` is truthy) vs snapshot B (all
    rows), classified added / changed / unchanged. A is a subset of B,
    so one scan computes BOTH lanes as conditional partials — ONE keyed
    Sum instead of two aggregations plus a full outer join.

    ``value_col`` must be integer (exactness of the change compare)."""

    def partial(t: pa.Table) -> pa.Table:
        vc = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        in_a = (
            t[cond_col].to_numpy(zero_copy_only=False).astype(bool).astype(np.int64)
        )
        g = (
            pa.table(
                {
                    key: t[key],
                    "pn_a": pa.array(in_a),
                    "ps_a": pa.array(in_a * vc),
                    "pn_b": pa.array(np.ones(len(vc), np.int64)),
                    "ps_b": pa.array(vc),
                }
            )
            .group_by(key)
            .aggregate(
                [("pn_a", "sum"), ("ps_a", "sum"), ("pn_b", "sum"), ("ps_b", "sum")]
            )
        )
        return g.rename_columns([key, "pn_a", "ps_a", "pn_b", "ps_b"])

    summed = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(
            Sum("pn_a", alias_name="n_a"),
            Sum("ps_a", alias_name="s_a"),
            Sum("pn_b", alias_name="n_b"),
            Sum("ps_b", alias_name="s_b"),
        )
    )

    def classify(t: pa.Table) -> pa.Table:
        n_a = t["n_a"].to_numpy()
        changed = (n_a != t["n_b"].to_numpy()) | (
            t["s_a"].to_numpy() != t["s_b"].to_numpy()
        )
        status = np.where(
            n_a == 0, "added", np.where(changed, "changed", "unchanged")
        )
        return t.append_column("status", pa.array(status, pa.string()))

    return summed.map_batches(classify, batch_format="pyarrow")


def sweep_time_integral(
    intervals: Dataset,
    t0_col: str,
    t1_col: str,
    bucket_us: int,
    fold_task_rows: int = SWEEP_FOLD_TASK_ROWS,
) -> pa.Table:
    """Time-WEIGHTED interval sweep: the exact integral of concurrency
    over time (interval-microseconds), the peak, the swept span, and
    the average concurrency (one IEEE divide) — the "avg concurrent
    users" product metric, exact in int64 microseconds.

    Scale shape: same boundary-scan plan as sweep_max_concurrent (one
    bounded totals exchange -> driver prefix -> one per-bucket
    co-located scan); each bucket emits ONE partial row (its internal
    integral, min/max t, peak), and the driver folds the bounded
    (#buckets) table — cross-bucket segments use the exclusive prefix
    directly (concurrency is constant between observed boundaries).
    Zero-length tie segments contribute 0 -> tie order irrelevant."""
    import ray

    def boundaries(t: pa.Table) -> pa.Table:
        t0 = t[t0_col].to_numpy(zero_copy_only=False)
        t1 = t[t1_col].to_numpy(zero_copy_only=False)
        bt = np.concatenate([t0, t1])
        delta = np.concatenate(
            [np.ones(len(t0), np.int64), -np.ones(len(t1), np.int64)]
        )
        return pa.table(
            {
                "t": pa.array(bt, pa.int64()),
                "delta": pa.array(delta, pa.int64()),
                "b": pa.array(bt // bucket_us, pa.int64()),
            }
        )

    bounds = intervals.map_batches(
        boundaries, batch_format="pyarrow"
    ).materialize()
    if bounds.count() <= fold_task_rows:
        return ray.get(
            ray.remote(_sweep_integral_fold).remote(*bounds.to_arrow_refs())
        )

    def totals_partial(t: pa.Table) -> pa.Table:
        g = t.select(["b", "delta"]).group_by("b").aggregate([("delta", "sum")])
        return g.rename_columns(["b", "p"])

    totals = (
        bounds.map_batches(totals_partial, batch_format="pyarrow")
        .groupby("b")
        .sum("p")
        .to_pandas()
    )
    col = "sum(p)" if "sum(p)" in totals.columns else "p"
    totals = totals.sort_values("b", kind="mergesort")
    run = totals[col].cumsum().shift(fill_value=0)  # exclusive prefix
    prefix = dict(zip(totals["b"].astype(int), run.astype(int)))
    prefix_ref = ray.put(prefix)

    def bucket_partial(t: pa.Table) -> pa.Table:
        pmap = ray.get(prefix_ref)
        tv = t["t"].to_numpy(zero_copy_only=False)
        dv = t["delta"].to_numpy(zero_copy_only=False)
        order = np.lexsort((-dv, tv))  # +1 before -1 at ties
        ts_s = tv[order]
        b = int(t["b"][0].as_py())
        conc = np.cumsum(dv[order]) + pmap.get(b, 0)
        integral = (
            int(np.sum(conc[:-1] * (ts_s[1:] - ts_s[:-1]))) if len(conc) > 1 else 0
        )
        return pa.table(
            {
                "b": pa.array([b], pa.int64()),
                "integral": pa.array([integral], pa.int64()),
                "t_min": pa.array([int(ts_s[0])], pa.int64()),
                "t_max": pa.array([int(ts_s[-1])], pa.int64()),
                "peak": pa.array([int(conc.max())], pa.int64()),
            }
        )

    parts = (
        bounds.groupby("b")
        .map_groups(bucket_partial, batch_format="pyarrow")
        .to_pandas()
    )
    parts = parts.sort_values("b", ignore_index=True)
    integral = int(parts["integral"].sum())
    # cross-bucket segments: concurrency after bucket b's last boundary
    # equals the NEXT observed bucket's exclusive prefix
    for i in range(len(parts) - 1):
        nb = int(parts["b"].iloc[i + 1])
        conc = prefix.get(nb, 0)
        dt = int(parts["t_min"].iloc[i + 1]) - int(parts["t_max"].iloc[i])
        integral += conc * dt
    peak = int(parts["peak"].max()) if len(parts) else 0
    span = (
        int(parts["t_max"].iloc[-1]) - int(parts["t_min"].iloc[0])
        if len(parts)
        else 0
    )
    avg = float(integral) / float(span) if span > 0 else float("nan")
    return pa.table(
        {
            "peak_concurrent": pa.array([peak], pa.int64()),
            "conc_us_integral": pa.array([integral], pa.int64()),
            "span_us": pa.array([span], pa.int64()),
            "avg_concurrency": pa.array(
                [avg], pa.float64(), mask=np.array([span <= 0])
            ),
        }
    )


WEIGHTED_QUANTILE_DISTINCT_LIMIT = 5_000_000  # driver-held (key, value) rows
# per-batch partial rows at or under this fold on the driver WITHOUT the
# keyed exchange — the fold's cumulative scan absorbs duplicate
# (key, value) rows across batches, so the all-to-all Aggregate buys
# nothing until the partial mass itself outgrows the driver
WEIGHTED_QUANTILE_DRIVER_MERGE_ROWS = 4_000_000


def grouped_weighted_quantile(
    ds: Dataset,
    key: str,
    value_col: str,
    weight_col: str,
    q_permille: int = 500,
    out_col: str = "wq_value",
    distinct_limit: int = WEIGHTED_QUANTILE_DISTINCT_LIMIT,
    driver_merge_rows: int = WEIGHTED_QUANTILE_DRIVER_MERGE_ROWS,
) -> pa.Table:
    """Exact per-group WEIGHTED lower quantile over integer values and
    integer weights: the smallest v whose cumulative weight reaches
    ``q_permille``/1000 of the group's total weight (1000*cumw >=
    q_permille*W — all-integer, so the result replays bitwise in SQL).

    Scale shape (dense-domain path, the events_value_percentile
    contract): ONE keyed exchange builds the per-(key, value) WEIGHT
    table — bounded by #groups x value DOMAIN, independent of row
    count (per-batch partials pre-sum weights). The bounded table
    folds on the driver (vectorized segment scan) under
    ``distinct_limit``; wider domains fall back to EXACT integer
    histogram refinement over the materialized weight table (the
    grouped_exact_quantile selection idea, but all-integer bucket
    edges and weight sums, so no float edge-rounding slack is needed
    and both routes are byte-equal). Non-negative integer weights are
    the contract; each refinement pass exchanges O(groups x n_buckets)
    rows and the driver holds O(groups) bracket state."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select([key, value_col, weight_col])
            .group_by([key, value_col])
            .aggregate([(weight_col, "sum")])
        )
        return g.rename_columns([key, value_col, "w"])

    # bounded by #groups x domain x batches: materialize the per-batch
    # partials once so the guard count and the fold (or the exchange +
    # refinement passes) never re-execute the upstream
    parts = ds.map_batches(partial, batch_format="pyarrow").materialize()
    if parts.count() <= driver_merge_rows:
        # driver-merge fast path: skip the keyed all-to-all entirely.
        # Partial rows may repeat a (key, value) across batches; the
        # sorted cumulative scan below crosses the threshold at the
        # same distinct value whether or not duplicates were pre-summed
        # (F(v) counts ALL rows <= v either way), so this route is
        # byte-equal to the exchanged one (forced-route pytest).
        dist = parts
    else:
        dist = parts.groupby([key, value_col]).sum("w").materialize()
        if dist.count() > distinct_limit:
            return _weighted_quantile_selection(
                dist, key, value_col, q_permille, out_col
            )
    df = dist.to_pandas()
    col = "sum(w)" if "sum(w)" in df.columns else "w"
    df = df.sort_values([key, value_col], ignore_index=True)
    n = len(df)
    if n == 0:
        return pa.table(
            {key: pa.array([]), out_col: pa.array([], pa.int64())}
        )
    kv = df[key].to_numpy()
    v = df[value_col].to_numpy(np.int64)
    w = df[col].to_numpy(np.int64)
    # vectorized per-segment fold: first row of each group where
    # 1000*cumw >= q_permille*tot (exact ints; 1000*cumw assumes group
    # totals < 2^63/1000, same bound the SQL replay's BIGINT carries)
    start = np.ones(n, dtype=bool)
    start[1:] = kv[1:] != kv[:-1]
    starts = np.flatnonzero(start)
    lens = np.diff(np.append(starts, n))
    cw = np.cumsum(w)
    seg_base = np.concatenate([[0], cw[starts[1:] - 1]]) if len(starts) > 1 else np.zeros(1, np.int64)
    cumw = cw - np.repeat(seg_base, lens)
    tot = np.repeat(cumw[starts + lens - 1], lens)
    hit = 1000 * cumw >= q_permille * tot
    pos = np.where(hit, np.arange(n), n)
    first = np.minimum.reduceat(pos, starts)
    return pa.table(
        {
            key: pa.array(list(kv[starts])),
            out_col: pa.array(v[first], pa.int64()),
        }
    )


def _weighted_quantile_selection(
    dist: Dataset,
    key: str,
    value_col: str,
    q_permille: int,
    out_col: str,
    n_buckets: int = 2048,
    max_iters: int = 12,
) -> pa.Table:
    """Distributed EXACT weighted-quantile selection over the
    materialized per-(key, value) weight table (``dist``), for value
    domains too wide to collect: iteratively narrow one integer
    bracket [lo, hi] per group. Each pass streams the weight table
    once, scattering in-bracket weights into ceil(span/step) equal
    integer sub-ranges (step = span//n_buckets + 1) plus a fresh
    below-bracket lane; the driver picks the first bucket whose
    cumulative weight reaches T = ceil(q_permille*W/1000). All bucket
    edges and weight sums are integers, so the bracket narrows EXACTLY
    (no float slack) and when step == 1 the bucket index IS the
    answer. Domain span 2^63 resolves in <= 7 passes at the default
    2048 buckets; per-pass exchange is O(groups x n_buckets)."""
    import ray

    wcol = "sum(w)" if "sum(w)" in dist.schema().names else "w"
    stats = (
        dist.groupby(key)
        .aggregate(
            Sum(wcol, alias_name="W"),
            Min(value_col, alias_name="lo"),
            Max(value_col, alias_name="hi"),
        )
        .to_pandas()
    )
    if not len(stats):
        return pa.table({key: pa.array([]), out_col: pa.array([], pa.int64())})

    st: dict = {}
    resolved: dict = {}
    for _, r in stats.iterrows():
        k, lo, hi, W = r[key], int(r["lo"]), int(r["hi"]), int(r["W"])
        # smallest cumw with 1000*cumw >= q_permille*W  (exact ceil)
        t_target = -(-q_permille * W // 1000)
        if lo == hi:
            resolved[k] = lo
        else:
            st[k] = {"lo": lo, "hi": hi, "t": t_target}

    nb = n_buckets
    span_lane = nb + 1  # slot 0 = below-bracket weight, 1..nb = buckets
    for _ in range(max_iters):
        if not st:
            break
        gkeys = sorted(st)
        ks = pa.array(gkeys)
        lo_a = np.array([st[k]["lo"] for k in gkeys], np.int64)
        hi_a = np.array([st[k]["hi"] for k in gkeys], np.int64)
        step_a = (hi_a - lo_a) // nb + 1
        ref = ray.put((ks, lo_a, hi_a, step_a))

        def hist_partial(t: pa.Table, _ref=ref) -> pa.Table:
            ks_, lo_, hi_, step_ = ray.get(_ref)
            gi = pc.index_in(t[key], value_set=ks_).to_numpy(
                zero_copy_only=False
            )
            ok = gi >= 0 if gi.dtype.kind == "i" else ~np.isnan(gi)
            gi = np.where(ok, gi, 0).astype(np.int64)
            v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
            w = t[wcol].to_numpy(zero_copy_only=False).astype(np.int64)
            rel = v - lo_[gi]
            inb = ok & (rel >= 0) & (v <= hi_[gi])
            blw = ok & (rel < 0)
            pos = np.where(inb, rel // step_[gi] + 1, 0)
            keep = inb | blw
            # integer scatter-add (np.bincount(weights=) is float64 and
            # would round exact weight sums above 2^53)
            flat = np.zeros(len(ks_) * span_lane, np.int64)
            np.add.at(flat, gi[keep] * span_lane + pos[keep], w[keep])
            nz = np.nonzero(flat)[0]
            return pa.table(
                {
                    key: pc.take(ks_, pa.array(nz // span_lane)),
                    "pos": pa.array(nz % span_lane, pa.int64()),
                    "wsum": pa.array(flat[nz], pa.int64()),
                }
            )

        hist = (
            dist.map_batches(hist_partial, batch_format="pyarrow")
            .groupby([key, "pos"])
            .sum("wsum")
            .to_pandas()
        )
        col = "sum(wsum)" if "sum(wsum)" in hist.columns else "wsum"
        groups = {k: g for k, g in hist.groupby(key, sort=False)}
        for i, k in enumerate(gkeys):
            s = st[k]
            counts = np.zeros(span_lane, np.int64)
            g = groups.get(k)
            if g is not None:
                counts[g["pos"].to_numpy(np.int64)] = g[col].to_numpy(
                    np.int64
                )
            cum = int(counts[0]) + np.cumsum(counts[1:])
            b = int(np.searchsorted(cum, s["t"], side="left"))
            b = min(b, nb - 1)  # all-zero-weight group: take first bucket
            step = int(step_a[i])
            if step == 1:
                resolved[k] = s["lo"] + b
                del st[k]
                continue
            new_lo = s["lo"] + b * step
            new_hi = min(s["hi"], s["lo"] + (b + 1) * step - 1)
            s["lo"], s["hi"] = new_lo, new_hi
            if new_lo == new_hi:
                resolved[k] = new_lo
                del st[k]
    if st:
        raise RuntimeError(
            f"weighted-quantile brackets unresolved after {max_iters} "
            f"passes: {sorted(st)}"
        )
    out_keys = sorted(resolved)
    return pa.table(
        {
            key: pa.array(out_keys),
            out_col: pa.array(
                [resolved[k] for k in out_keys], pa.int64()
            ),
        }
    )


def grouped_ks_vs_global(
    ds: Dataset,
    key: str,
    value_col: str,
    out_n: str = "n_rows",
    out_col: str = "ks_ppm",
) -> pa.Table:
    """Exact two-sample KOLMOGOROV-SMIRNOV statistic of each group's
    ``value_col`` distribution against the WHOLE dataset's, in integer
    parts-per-million — the distribution-shape drift screen (compare
    the total-variation screen in queries.seq_source_tv_drift: TV sees
    mass moved anywhere, KS sees it moved across a threshold).

    ks_ppm = (10**6 * max_v |F_g(v)*N - F(v)*n_g|) // (n_g*N) is pure
    integer arithmetic (no libm), so the result replays bitwise in SQL.

    Scale shape: per-batch (key, value) count partials -> ONE keyed Sum
    bounded by #groups x distinct values; the CDF fold runs on the
    bounded table with Python bigints (the 10**6 product overflows
    int64 at corpus scale; SQL oracles use HUGEINT). Unbounded
    continuous domains would need a quantile-sketch variant; integer /
    categorical-ordinal domains are the contract here.
    """
    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    key: t[key],
                    "v": pc.cast(t[value_col], pa.int64()),
                    "c": pa.array(np.ones(t.num_rows, np.int64)),
                }
            )
            .group_by([key, "v"])
            .aggregate([("c", "sum")])
        )
        return g.rename_columns([key, "v", "p_c"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key, "v"])
        .aggregate(Sum("p_c", alias_name="c"))
    ).to_pandas()  # bounded by #groups x distinct values

    piv = (
        counts.pivot_table(index="v", columns=key, values="c", fill_value=0)
        .astype(np.int64)
        .sort_index()
    )
    g_cum = piv.sum(axis=1).to_numpy(np.int64).cumsum()
    n_all = int(g_cum[-1]) if len(g_cum) else 0
    keys, ns_out, ppm = [], [], []
    for k in sorted(piv.columns):
        fs = piv[k].to_numpy(np.int64).cumsum()
        ns = int(fs[-1])
        num = max(
            (abs(int(a) * n_all - int(b) * ns) for a, b in zip(fs, g_cum)),
            default=0,
        )
        keys.append(k)
        ns_out.append(ns)
        ppm.append((1_000_000 * num) // (ns * n_all) if ns and n_all else 0)
    return pa.table(
        {
            key: pa.array(keys),
            out_n: pa.array(ns_out, pa.int64()),
            out_col: pa.array(ppm, pa.int64()),
        }
    )


def cusum_changepoint(
    ds: Dataset,
    key: str,
    bucket_col: str,
    out_cols: tuple = ("n_buckets", "n_rows", "cusum_ppm", "peak_bucket"),
) -> pa.Table:
    """CUSUM change-point screen per key over a dense integer bucket
    grid (calendar days, hours, ...): the maximum absolute cumulative
    deviation of per-bucket counts from the key's own mean rate, plus
    the earliest arg-max bucket — "did this stream's volume shift
    level, and when". All deviations are exact integers
    (dev_i = prefix_i*D - i*T, no division until the final ppm
    floor-div in Python bigints; SQL oracles use HUGEINT).

    Scale shape: ONE bounded (key, bucket) count exchange (per-batch
    partials first); grid fill, prefix and max fold all run on the
    bounded table in one coalesced block. The grid spans the GLOBAL
    [min, max] bucket so every key is judged over the same horizon.
    """
    counts = count_groupby(ds, [key, bucket_col], alias="n").to_pandas()
    names = (key,) + tuple(out_cols)
    if counts.empty:
        return pa.table(
            {
                names[0]: pa.array([], pa.string()),
                names[1]: pa.array([], pa.int64()),
                names[2]: pa.array([], pa.int64()),
                names[3]: pa.array([], pa.int64()),
                names[4]: pa.array([], pa.int64()),
            }
        )
    d0, d1 = int(counts[bucket_col].min()), int(counts[bucket_col].max())
    span = d1 - d0 + 1
    keys = sorted(counts[key].unique())
    kidx = {k: i for i, k in enumerate(keys)}
    grid = np.zeros((len(keys), span), np.int64)
    grid[
        counts[key].map(kidx).to_numpy(np.int64),
        counts[bucket_col].to_numpy(np.int64) - d0,
    ] = counts["n"].to_numpy(np.int64)
    out = {n: [] for n in names}
    for k in keys:
        c = grid[kidx[k]]
        total = int(c.sum())
        pre, best, best_i = 0, -1, 0
        for i in range(span):  # span is bounded (grid), not data-sized
            pre += int(c[i])
            dev = abs(pre * span - (i + 1) * total)
            if dev > best:
                best, best_i = dev, i
        out[names[0]].append(k)
        out[names[1]].append(span)
        out[names[2]].append(total)
        out[names[3]].append(
            (1_000_000 * best) // (span * total) if total else 0
        )
        out[names[4]].append(d0 + best_i)
    return pa.table(
        {
            names[0]: pa.array(out[names[0]]),
            names[1]: pa.array(out[names[1]], pa.int64()),
            names[2]: pa.array(out[names[2]], pa.int64()),
            names[3]: pa.array(out[names[3]], pa.int64()),
            names[4]: pa.array(out[names[4]], pa.int64()),
        }
    )


def _as_int64_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Timestamp or integer column -> int64 microseconds numpy view."""
    if pa.types.is_timestamp(col.type):
        col = pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
    elif col.type != pa.int64():
        col = pc.cast(col, pa.int64())
    return np.asarray(col)


def heavy_hitters(
    ds: Dataset,
    keys: list[str],
    thr_num: int,
    thr_den: int,
    sketch_k: int = 600,
) -> pa.Table:
    """EXACT heavy hitters — every key combination whose count >=
    ceil(N * thr_num / thr_den) — without ever shuffling the full key
    domain. Pass 1: per-batch exact counts truncated to a
    ``sketch_k``-counter Misra-Gries summary (keep top-k, subtract the
    (k+1)-th count; per-batch underestimate <= batch_rows/(k+1)).
    Summaries merge by counter ADDITION (Agarwal et al., "Mergeable
    Summaries", PODS 2012): one keyed Sum bounded by k x #batches
    yields estimates underestimating by < N/(k+1); with k+1 >
    thr_den/thr_num every true-heavy key survives (no false
    negatives). Pass 2 exactly counts ONLY the broadcast candidates
    and filters by the true threshold, so the result is exact. The
    first partial row of each batch carries the batch's row count in a
    side column, making N a free byproduct of pass 1.

    Keys are matched by a \\x1f-joined string composite (categorical
    keys by nature; don't use float keys). Candidate fold is
    driver-side but <= k x #batches rows by construction."""
    import ray

    if (sketch_k + 1) * thr_num <= thr_den:
        raise ValueError(
            "heavy_hitters: sketch_k too small for the threshold — "
            f"need (k+1) > {thr_den}/{thr_num}"
        )

    def mg_partial(t: pa.Table, k=sketch_k) -> pa.Table:
        cols = {c: t[c] for c in keys}
        cols["c"] = pa.array(np.ones(t.num_rows, np.int64))
        g = (
            pa.table(cols).group_by(keys).aggregate([("c", "sum")])
        ).rename_columns([*keys, "c"])
        c = g["c"].to_numpy(zero_copy_only=False)
        if len(c) > k:
            order = np.argsort(-c, kind="stable")
            off = int(c[order[k]])
            pos = order[:k][(c[order[:k]] - off) > 0]
            take = pa.array(pos, pa.int64())
            parts = {kk: g[kk].take(take) for kk in keys}
            parts["c"] = pa.array(c[pos] - off)
            g = pa.table(parts)
        bn = np.zeros(g.num_rows, np.int64)
        if g.num_rows:
            bn[0] = t.num_rows
        return g.append_column("bn", pa.array(bn))

    merged_ds = (
        ds.map_batches(mg_partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(Sum("c", alias_name="est"), Sum("bn", alias_name="bn"))
        .materialize()  # distinct sketched keys, distributed (not driver)
    )
    if merged_ds.count() == 0:
        # fully-empty input: Dataset.schema() may be None downstream of
        # the exchange (the skew_join r3 lesson) — resolve key types
        # from the INPUT schema; a fully-empty input whose own schema
        # is unrecoverable (empty + repartitioned upstream) degrades to
        # null-typed keys, since "no rows" is the only information left
        from .join import _dataset_schema

        base = _dataset_schema(ds)
        return pa.table(
            {
                **{
                    kk: pa.array(
                        [], base.field(kk).type if base is not None else pa.null()
                    )
                    for kk in keys
                },
                "n": pa.array([], pa.int64()),
            }
        )
    n_total = int(merged_ds.sum("bn"))
    thr = (thr_num * n_total + thr_den - 1) // thr_den
    slack = n_total // (sketch_k + 1)
    cut = max(1, thr - slack)
    # candidate filter runs DISTRIBUTED before the collect: the driver
    # fold is bounded by the candidate mass (sum(est) <= N, so at most
    # N/cut ~ 1/(phi - 1/(k+1)) candidates), never by k x #batches
    cand = (
        merged_ds.map_batches(
            lambda t, c=cut: t.filter(pc.greater_equal(t["est"], c)),
            batch_format="pyarrow",
        )
    ).to_pandas()
    key_fields = [
        merged_ds.schema().base_schema.field(kk) for kk in keys
    ]
    empty_out = pa.table(
        {
            **{f.name: pa.array([], f.type) for f in key_fields},
            "n": pa.array([], pa.int64()),
        }
    )
    if len(cand) == 0:
        return empty_out
    comp = None
    for kk in keys:
        part = cand[kk].astype(str)
        comp = part if comp is None else comp + "\x1f" + part
    cand_keys = pa.array(comp.to_numpy(str), pa.string())
    keys_ref = ray.put(cand_keys)

    def verify_partial(t: pa.Table) -> pa.Table:
        ck = keys_ref
        if isinstance(ck, ray.ObjectRef):
            ck = ray.get(ck)
        comp = pc.cast(t[keys[0]], pa.string())
        for kk in keys[1:]:
            comp = pc.binary_join_element_wise(
                comp, pc.cast(t[kk], pa.string()), "\x1f"
            )
        sub = t.filter(pc.is_valid(pc.index_in(comp, ck)))
        cols = {c: sub[c] for c in keys}
        cols["c"] = pa.array(np.ones(sub.num_rows, np.int64))
        g = pa.table(cols).group_by(keys).aggregate([("c", "sum")])
        return g.rename_columns([*keys, "p_c"])

    exact = (
        ds.map_batches(verify_partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(Sum("p_c", alias_name="n"))
    ).to_pandas()  # bounded by the candidate set
    if len(exact) == 0 or "n" not in exact.columns:
        return empty_out
    hh = exact[exact["n"] >= thr].reset_index(drop=True)
    if len(hh) == 0:
        return empty_out
    return pa.Table.from_pandas(hh, preserve_index=False)


def local_skyline_idx(m1: np.ndarray, m2: np.ndarray) -> np.ndarray:
    """Indices of the 2-D Pareto frontier (maximize both; non-strict
    domination — exact duplicates all survive). One lexsort + grouped
    cummax, no pairwise loop."""
    n = len(m1)
    if n == 0:
        return np.empty(0, np.int64)
    order = np.lexsort((-m2, -m1))
    a, b = m1[order], m2[order]
    newg = np.ones(n, bool)
    newg[1:] = a[1:] != a[:-1]
    gid = np.cumsum(newg) - 1
    gmax = b[newg]
    prev_best = np.concatenate(
        ([np.iinfo(np.int64).min], np.maximum.accumulate(gmax)[:-1])
    )
    keep_group = gmax > prev_best
    keep = keep_group[gid] & (b == gmax[gid])
    return order[keep]


def pareto_frontier(
    ds: Dataset, m1_col: str, m2_col: str, keep_cols: list[str]
) -> pa.Table:
    """2-D PARETO FRONTIER over integer metric columns: the rows not
    dominated on (m1, m2), maximizing both. Per-batch LOCAL skyline
    (a point dominated inside its batch is dominated globally) ->
    bounded survivor fold -> one final vectorized skyline; the raw
    table never shuffles. Returns keep_cols + the two metrics."""

    def local(t: pa.Table) -> pa.Table:
        m1 = pc.cast(t[m1_col], pa.int64()).to_numpy(zero_copy_only=False)
        m2 = pc.cast(t[m2_col], pa.int64()).to_numpy(zero_copy_only=False)
        keep = pa.array(local_skyline_idx(m1, m2), pa.int64())
        cols = {c: t[c].take(keep) for c in keep_cols}
        cols[m1_col] = pa.array(m1[np.asarray(keep)])
        cols[m2_col] = pa.array(m2[np.asarray(keep)])
        return pa.table(cols)

    surv = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    if len(surv) == 0 or m1_col not in surv.columns:
        # fully-empty input: resolve output types from the INPUT schema
        # (null-typed keeps as a last resort — see heavy_hitters)
        from .join import _dataset_schema

        base = _dataset_schema(ds)
        return pa.table(
            {
                **{
                    c: pa.array(
                        [], base.field(c).type if base is not None else pa.null()
                    )
                    for c in keep_cols
                },
                m1_col: pa.array([], pa.int64()),
                m2_col: pa.array([], pa.int64()),
            }
        )
    keep = local_skyline_idx(
        surv[m1_col].to_numpy(np.int64), surv[m2_col].to_numpy(np.int64)
    )
    return pa.Table.from_pandas(surv.iloc[keep], preserve_index=False)


def scd2_intervals(
    ds: Dataset,
    key: str,
    ts_col: str,
    tiebreak_col: str,
    attr_col: str,
    num_buckets: int | None = None,
) -> Dataset:
    """SCD TYPE-2 interval build: collapse each key's ``attr_col``
    stream into validity intervals [valid_from_us, valid_to_us) — one
    row per maximal run of equal consecutive values in (ts, tiebreak)
    order, versioned per key (the CDC-to-dimension-table operator).

    Rows hash-bucket by key (adjacency co-location); ONE lexsort per
    bucket finds run boundaries vectorized; valid_to is the next run's
    start inside the same pass; version = per-key cumulative run
    index. One keyed exchange; output volume = #runs."""
    import pandas as pd
    import ray

    if num_buckets is None:
        num_buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 4)))

    def tag(t: pa.Table) -> pa.Table:
        kc = t[key]
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        hb = pd.util.hash_array(kc.to_numpy(zero_copy_only=False)) % num_buckets
        return t.append_column("_hb", pa.array(hb.astype(np.int64)))

    def per_bucket(t: pa.Table) -> pa.Table:
        u = t[key].to_numpy(zero_copy_only=False)
        ts = _as_int64_us(t[ts_col])
        eid = t[tiebreak_col].to_numpy(zero_copy_only=False)
        et = t[attr_col]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes = pc.dictionary_encode(et).indices.to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        us, tss, cs = u[order], ts[order], codes[order]
        n = len(us)
        new_key = np.ones(n, bool)
        new_key[1:] = us[1:] != us[:-1]
        start = new_key.copy()
        start[1:] |= cs[1:] != cs[:-1]
        sidx = np.flatnonzero(start)
        run_key = us[sidx]
        run_from = tss[sidx]
        nxt_from = np.append(run_from[1:], 0)
        same_key = np.append(run_key[1:] == run_key[:-1], False)
        valid_to = pa.array(
            np.where(same_key, nxt_from, 0), pa.int64(), mask=~same_key
        )
        first_run = new_key[sidx]
        run_no = np.arange(len(sidx), dtype=np.int64)
        base = np.maximum.accumulate(np.where(first_run, run_no, 0))
        return pa.table(
            {
                key: pa.array(run_key),
                attr_col: et.take(pa.array(order[sidx], pa.int64())),
                "valid_from_us": pa.array(run_from),
                "valid_to_us": valid_to,
                "version": pa.array(run_no - base + 1),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_hb")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def grouped_resample_linear(
    ds: Dataset,
    key: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    grid_us: int,
    num_buckets: int | None = None,
) -> Dataset:
    """TIME-SERIES RESAMPLING: each key's irregular value series
    linearly interpolated onto a fixed ``grid_us`` grid (grid points
    between the key's first and last row). prev = the row maximizing
    (ts, tiebreak) at or before the grid point, next = the row
    minimizing it at or after; v = v_p + (v_n - v_p) * ((h - t_p) /
    (t_n - t_p)) as one fixed-order IEEE expression (exactly the prev
    value when prev == next).

    Rows hash-bucket by key; inside a bucket the grid is BUILT
    vectorized (repeat/arange), merged with the rows by two lexsorts
    (rows-before-grid for the forward fill, grid-before-rows for the
    backward fill) and filled with maximum/minimum.accumulate — no
    per-row or per-key Python. One keyed exchange; output volume =
    activity-span / grid_us per key, calendar-bounded."""
    import pandas as pd
    import ray

    if num_buckets is None:
        num_buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 4)))
    H = int(grid_us)

    def tag(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[value_col]))
        kc = t[key]
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        hb = pd.util.hash_array(kc.to_numpy(zero_copy_only=False)) % num_buckets
        return t.append_column("_hb", pa.array(hb.astype(np.int64)))

    def per_bucket(t: pa.Table) -> pa.Table:
        u = t[key].to_numpy(zero_copy_only=False)
        ts = _as_int64_us(t[ts_col])
        eid = t[tiebreak_col].to_numpy(zero_copy_only=False)
        val = t[value_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        us, tss, eids, vs = u[order], ts[order], eid[order], val[order]
        n = len(us)
        seg = np.ones(n, bool)
        seg[1:] = us[1:] != us[:-1]
        starts = np.flatnonzero(seg)
        ends = np.append(starts[1:], n) - 1
        g0 = -((-tss[starts]) // H)
        g1 = tss[ends] // H
        cnt = np.maximum(0, g1 - g0 + 1)
        total = int(cnt.sum())
        if total == 0:
            return pa.table(
                {
                    key: pa.array([], pa.int64()),
                    "grid_us": pa.array([], pa.int64()),
                    "v_interp": pa.array([], pa.float64()),
                }
            )
        gu = np.repeat(us[starts], cnt)
        base = np.repeat(g0, cnt)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        gh = (base + offs) * H
        mu = np.concatenate([us, gu])
        mt = np.concatenate([tss, gh])
        mtag = np.concatenate([np.zeros(n, np.int8), np.ones(total, np.int8)])
        meid = np.concatenate([eids, np.zeros(total, np.int64)])
        is_event_pos = np.concatenate(
            [np.arange(n, dtype=np.int64), np.full(total, -1, np.int64)]
        )
        m = n + total
        o1 = np.lexsort((meid, mtag, mt, mu))
        src1 = np.where(is_event_pos[o1] >= 0, np.arange(m), -1)
        f1 = np.maximum.accumulate(src1)
        prev_sorted_pos = f1[is_event_pos[o1] < 0]
        prev_ev = is_event_pos[o1][prev_sorted_pos]
        grid_order_1 = o1[is_event_pos[o1] < 0] - n
        o2 = np.lexsort((meid, np.negative(mtag), mt, mu))
        src2 = np.where(is_event_pos[o2] >= 0, np.arange(m), m)
        b2 = np.minimum.accumulate(src2[::-1])[::-1]
        next_sorted_pos = b2[is_event_pos[o2] < 0]
        next_ev = is_event_pos[o2][next_sorted_pos]
        grid_order_2 = o2[is_event_pos[o2] < 0] - n
        prev_of = np.empty(total, np.int64)
        prev_of[grid_order_1] = prev_ev
        next_of = np.empty(total, np.int64)
        next_of[grid_order_2] = next_ev
        tp, vp = tss[prev_of], vs[prev_of]
        tn, vn = tss[next_of], vs[next_of]
        flat = tn == tp
        denom = np.where(flat, 1, tn - tp).astype(np.float64)
        ratio = (gh - tp).astype(np.float64) / denom
        v = np.where(flat, vp, vp + (vn - vp) * ratio)
        return pa.table(
            {
                key: pa.array(gu),
                "grid_us": pa.array(gh),
                "v_interp": pa.array(v),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_hb")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def growth_accounting(
    ds: Dataset,
    key: str,
    ts_col: str,
    period_us: int,
    num_buckets: int | None = None,
) -> Dataset:
    """GROWTH ACCOUNTING: per period, how many keys are NEW (first-ever
    period), RETAINED (also active the period before), RESURRECTED
    (active before, not last period) and CHURNED (charged to the first
    inactive period; horizon-capped at the global max period). Output:
    (wk, stage, n_users) — net growth = new + resurrected - churned.

    Per-batch distinct (key, period) partials -> key hash-bucket
    exchange; ONE lexsort per bucket dedupes cross-batch pairs and
    classifies each period row against its predecessor, emitting gap
    and end-of-history churn in the same pass; per-bucket count
    partials -> tiny keyed Sum. The global horizon is a one-number Max
    over the input (a second cheap pass of a 2-column projection)."""
    import pandas as pd
    import ray

    if num_buckets is None:
        num_buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 4)))
    WK = int(period_us)
    gmax_raw = ds.max(ts_col)
    gw = int(pd.Timestamp(gmax_raw).value // 1000) // WK if not isinstance(
        gmax_raw, (int, np.integer)
    ) else int(gmax_raw) // WK

    def pairs(t: pa.Table) -> pa.Table:
        tsv = _as_int64_us(t[ts_col])
        g = (
            pa.table({key: t[key], "wk": pa.array(tsv // WK)})
            .group_by([key, "wk"])
            .aggregate([])
        )
        kc = g[key]
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        hb = pd.util.hash_array(kc.to_numpy(zero_copy_only=False)) % num_buckets
        return g.append_column("_hb", pa.array(hb.astype(np.int64)))

    def per_bucket(t: pa.Table, gw=gw) -> pa.Table:
        u = t[key].to_numpy(zero_copy_only=False)
        w = t["wk"].to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        us, ws = u[order], w[order]
        first = np.ones(len(us), bool)
        first[1:] = (us[1:] != us[:-1]) | (ws[1:] != ws[:-1])
        us, ws = us[first], ws[first]
        new_key = np.ones(len(us), bool)
        new_key[1:] = us[1:] != us[:-1]
        pw = np.empty_like(ws)
        pw[1:] = ws[:-1]
        gap = ~new_key & (ws - pw > 1)
        retained = ~new_key & (ws - pw == 1)
        last = np.append(new_key[1:], True)
        end_churn = last & (ws < gw)
        wk_out = np.concatenate(
            [ws[new_key], ws[retained], ws[gap], pw[gap] + 1, ws[end_churn] + 1]
        )
        stage = np.concatenate(
            [
                np.full(int(new_key.sum()), "new"),
                np.full(int(retained.sum()), "retained"),
                np.full(int(gap.sum()), "resurrected"),
                np.full(int(gap.sum()) + int(end_churn.sum()), "churned"),
            ]
        )
        g = (
            pa.table(
                {
                    "wk": pa.array(wk_out),
                    "stage": pa.array(stage),
                    "c": pa.array(np.ones(len(wk_out), np.int64)),
                }
            )
            .group_by(["wk", "stage"])
            .aggregate([("c", "sum")])
        )
        return g.rename_columns(["wk", "stage", "p_c"])

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("_hb")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby(["wk", "stage"])
        .aggregate(Sum("p_c", alias_name="n_users"))
    )


def adaptive_sessionize_counts(
    ds: Dataset,
    key: str,
    ts_col: str,
    tiebreak_col: str,
    gap_factor: float = 3.0,
    num_buckets: int | None = None,
) -> Dataset:
    """ADAPTIVE sessionization: a session break is a gap exceeding
    ``gap_factor`` x THAT KEY's median inter-arrival gap (per-entity
    thresholds instead of one global cutoff). Returns (key,
    n_sessions). Integer-microsecond gaps; interpolated integer
    medians are exact half-integer doubles, so the threshold
    comparison replays bitwise in SQL.

    One key-bucket lexsort computes gaps, per-key medians (segment
    midpoint indexing — no per-key loop) and session starts in the
    same pass."""
    import pandas as pd
    import ray

    if num_buckets is None:
        num_buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 4)))

    def tag(t: pa.Table) -> pa.Table:
        kc = t[key]
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        hb = pd.util.hash_array(kc.to_numpy(zero_copy_only=False)) % num_buckets
        return t.append_column("_hb", pa.array(hb.astype(np.int64)))

    def per_bucket(t: pa.Table) -> pa.Table:
        u = t[key].to_numpy(zero_copy_only=False)
        ts = _as_int64_us(t[ts_col])
        eid = t[tiebreak_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        us, tss = u[order], ts[order]
        n = len(us)
        if n == 0:
            return pa.table(
                {
                    key: pa.array([], pa.int64()),
                    "n_sessions": pa.array([], pa.int64()),
                }
            )
        new_key = np.ones(n, bool)
        new_key[1:] = us[1:] != us[:-1]
        gap = np.empty(n, np.int64)
        gap[1:] = tss[1:] - tss[:-1]
        has_gap = ~new_key
        gu, gv = us[has_gap], gap[has_gap]
        og = np.lexsort((gv, gu))
        gus, gvs = gu[og], gv[og]
        gstart = np.ones(len(gus), bool)
        gstart[1:] = gus[1:] != gus[:-1]
        starts = np.flatnonzero(gstart)
        glen = np.diff(np.append(starts, len(gus)))
        lo = starts + (glen - 1) // 2
        hi = starts + glen // 2
        med = (gvs[lo].astype(np.float64) + gvs[hi].astype(np.float64)) / 2.0
        med_key = gus[starts]
        thr = np.full(n, np.inf)
        if len(med_key):
            idx = np.searchsorted(med_key, us)
            safe = np.minimum(idx, len(med_key) - 1)
            hit = med_key[safe] == us
            thr[hit] = gap_factor * med[safe[hit]]
        ns = new_key | (has_gap & (gap.astype(np.float64) > thr))
        g = (
            pa.table({key: pa.array(us), "s": pa.array(ns.astype(np.int64))})
            .group_by(key)
            .aggregate([("s", "sum")])
        )
        return g.rename_columns([key, "n_sessions"])

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_hb")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def sessionize_counts(
    ds: Dataset,
    key: str,
    ts_col: str,
    gap_us: int,
    num_buckets: int | None = None,
) -> Dataset:
    """FIXED-GAP sessionization counts: per key, the number of sessions
    (a new session starts when the gap since the key's previous event
    exceeds ``gap_us``) and the total event count. Output: (key,
    n_sessions, n_events).

    Scale shape (reference parity: sessionize is the canonical
    streaming-window op, SURVEY.md §2.6): rows hash-bucket by key —
    the only exchange — and ONE vectorized lexsort per bucket computes
    every key's gaps, session starts and counts with zero per-key
    Python. A reducer holds ~N/num_buckets rows, never "one pandas
    frame per key" (the naive groupby(key).map_groups shape this
    replaced dispatches one Python callback per key and dies on key
    cardinality, not data size). Session counts depend only on the
    multiset of ts values per key (equal-ts ties gap 0, never a
    break), so no tiebreak column is needed for determinism."""
    import pandas as pd

    if num_buckets is None:
        num_buckets = 4 * max(2, _default_cpus())

    def tag(t: pa.Table) -> pa.Table:
        arr = t[key]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        hb = pd.util.hash_array(arr.to_numpy(zero_copy_only=False)) % num_buckets
        return t.append_column("_hb", pa.array(hb.astype(np.int64)))

    def per_bucket(t: pa.Table) -> pa.Table:
        kc = t[key]
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        u = kc.to_numpy(zero_copy_only=False)
        ts = _as_int64_us(t[ts_col])
        n = len(u)
        if n == 0:
            return pa.table(
                {
                    key: kc.slice(0, 0),
                    "n_sessions": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((ts, u))
        us, tss = u[order], ts[order]
        new_key = np.ones(n, bool)
        new_key[1:] = us[1:] != us[:-1]
        brk = new_key.copy()
        brk[1:] |= (tss[1:] - tss[:-1]) > gap_us
        starts = np.flatnonzero(new_key)
        lens = np.diff(np.append(starts, n))
        # per-key session count = segment sum of break flags
        csum = np.concatenate([[0], np.cumsum(brk.astype(np.int64))])
        nsess = csum[starts + lens] - csum[starts]
        return pa.table(
            {
                key: kc.take(pa.array(order[starts], pa.int64())),
                "n_sessions": pa.array(nsess, pa.int64()),
                "n_events": pa.array(lens.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_hb")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def interarrival_stats(
    ds: Dataset,
    key: str,
    ts_col: str,
    num_buckets: int | None = None,
) -> Dataset:
    """Per-key inter-arrival profile: (key, n_events, span_us,
    avg_gap_us, max_gap_us) for keys with >= 2 events. span/max are
    int64 microseconds; avg_gap = span / (n-1) in double.

    Same bounded shape as ``sessionize_counts``: one key hash-bucket
    exchange, one lexsort per bucket, segment arithmetic (cumulative
    max via np.maximum.reduceat) — no per-key Python frames. All
    outputs depend only on each key's sorted ts multiset, so no
    tiebreak column is required."""
    import pandas as pd

    if num_buckets is None:
        num_buckets = 4 * max(2, _default_cpus())

    I64MIN = np.iinfo(np.int64).min

    def tag(t: pa.Table) -> pa.Table:
        arr = t[key]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        hb = pd.util.hash_array(arr.to_numpy(zero_copy_only=False)) % num_buckets
        return t.append_column("_hb", pa.array(hb.astype(np.int64)))

    def per_bucket(t: pa.Table) -> pa.Table:
        kc = t[key]
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        u = kc.to_numpy(zero_copy_only=False)
        ts = _as_int64_us(t[ts_col])
        n = len(u)
        empty = pa.table(
            {
                key: kc.slice(0, 0),
                "n_events": pa.array([], pa.int64()),
                "span_us": pa.array([], pa.int64()),
                "avg_gap_us": pa.array([], pa.float64()),
                "max_gap_us": pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        order = np.lexsort((ts, u))
        us, tss = u[order], ts[order]
        new_key = np.ones(n, bool)
        new_key[1:] = us[1:] != us[:-1]
        starts = np.flatnonzero(new_key)
        lens = np.diff(np.append(starts, n))
        gap = np.empty(n, np.int64)
        gap[0] = I64MIN
        gap[1:] = np.where(new_key[1:], I64MIN, tss[1:] - tss[:-1])
        maxg = np.maximum.reduceat(gap, starts)
        span = tss[starts + lens - 1] - tss[starts]
        multi = lens >= 2
        if not multi.any():
            return empty
        return pa.table(
            {
                key: kc.take(pa.array(order[starts[multi]], pa.int64())),
                "n_events": pa.array(lens[multi].astype(np.int64), pa.int64()),
                "span_us": pa.array(span[multi], pa.int64()),
                "avg_gap_us": pa.array(
                    span[multi].astype(np.float64) / (lens[multi] - 1),
                    pa.float64(),
                ),
                "max_gap_us": pa.array(maxg[multi], pa.int64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_hb")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def funnel_stages_reached(
    ds: Dataset,
    key: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
    num_buckets: int | None = None,
) -> Dataset:
    """Greedy earliest-first funnel: per key, the furthest stage index
    reached through ``stages`` with strictly increasing timestamps
    (t_{i+1} = min ts of stage i+1 events after t_i). Output: (key,
    stage_reached) with 0 = no stage-1 event. Every key present in the
    input gets a row.

    Scale shape: one key hash-bucket exchange; per bucket the stage
    mins are computed for ALL keys at once (np.unique codes +
    np.minimum.at per stage — len(stages) vectorized passes), so
    reducer work is O(bucket rows x stages) with zero per-key
    Python."""
    import pandas as pd

    if num_buckets is None:
        num_buckets = 4 * max(2, _default_cpus())

    I64MIN = np.iinfo(np.int64).min
    I64MAX = np.iinfo(np.int64).max

    def tag(t: pa.Table) -> pa.Table:
        arr = t[key]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        hb = pd.util.hash_array(arr.to_numpy(zero_copy_only=False)) % num_buckets
        return t.append_column("_hb", pa.array(hb.astype(np.int64)))

    def per_bucket(t: pa.Table) -> pa.Table:
        kc = t[key]
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        u = kc.to_numpy(zero_copy_only=False)
        ts = _as_int64_us(t[ts_col])
        n = len(u)
        if n == 0:
            return pa.table(
                {
                    key: kc.slice(0, 0),
                    "stage_reached": pa.array([], pa.int64()),
                }
            )
        uniq, first_idx, codes = np.unique(u, return_index=True, return_inverse=True)
        nu = len(uniq)
        stage_masks = []
        for s in stages:
            eq = pc.equal(t[type_col], pa.scalar(s))
            if isinstance(eq, pa.ChunkedArray):
                eq = eq.combine_chunks()
            mv = eq.to_numpy(zero_copy_only=False)
            stage_masks.append(mv == True)  # noqa: E712 — nulls -> False
        t_prev = np.full(nu, I64MIN, np.int64)
        reached_cnt = np.zeros(nu, np.int64)
        for mask in stage_masks:
            m = mask & (ts > t_prev[codes])
            t_s = np.full(nu, I64MAX, np.int64)
            np.minimum.at(t_s, codes[m], ts[m])
            hit = t_s < I64MAX
            reached_cnt += hit
            t_prev = np.where(hit, t_s, I64MAX)
        return pa.table(
            {
                key: kc.take(pa.array(first_idx, pa.int64())),
                "stage_reached": pa.array(reached_cnt, pa.int64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_hb")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
