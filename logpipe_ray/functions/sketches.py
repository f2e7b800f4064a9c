"""Mergeable sketches for approximate aggregates at scale.

KMV (k-minimum-values) distinct-count sketch: keep the k smallest
64-bit hashes of the values seen; estimate distinct count as
(k-1) / max_kept (normalized to [0,1)). Exactly mergeable (union =
merge the kept sets, re-truncate to k), so it follows the engine's
standard partial/combine shape: one sketch per batch, tiny merge.
Error ~ 1/sqrt(k).

The reference has no approximate aggregates (SURVEY.md §2.4); this is
part of the training-data-pipeline extensions: distinct users / URLs /
tokens over 10^12 rows cannot groupby-distinct, a sketch can.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..stages.transform import hash64_strings


def kmv_sketch(values: pa.Array | pa.ChunkedArray, k: int = 1024) -> np.ndarray:
    """Build the KMV sketch (sorted array of <=k smallest hashes)."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    values = values.drop_null()  # COUNT(DISTINCT) semantics: nulls excluded
    if not pa.types.is_string(values.type):
        values = values.cast(pa.string())
    h = np.unique(hash64_strings(values))  # sorted unique
    return h[:k]


def kmv_merge(sketches: list[np.ndarray], k: int = 1024) -> np.ndarray:
    merged = np.unique(np.concatenate(sketches)) if sketches else np.empty(0, np.uint64)
    return merged[:k]


def kmv_estimate(sketch: np.ndarray, k: int = 1024) -> float:
    n = len(sketch)
    if n < k:
        return float(n)  # exact below k distincts
    frac = (sketch[k - 1] + 1) / 2.0**64
    return (k - 1) / frac


def approx_distinct(ds: Dataset, col: str, k: int = 1024) -> float:
    """Distributed approximate distinct count of a column."""

    def partial(t: pa.Table) -> pa.Table:
        sk = kmv_sketch(t[col], k)
        return pa.table({"sketch": pa.array([sk.astype(np.uint64).tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    sketches = [np.frombuffer(b, dtype=np.uint64) for b in parts["sketch"]]
    return kmv_estimate(kmv_merge(sketches, k), k)


# ------------------------------------------------- quantile summary sketch

def quantile_sketch(
    values: pa.Array | pa.ChunkedArray, buckets: int = 256
) -> tuple[np.ndarray, np.ndarray]:
    """Compressed sorted summary of a numeric column: <=`buckets`
    (value, weight) pairs taken at evenly spaced ranks of the sorted
    batch. Each pair represents `weight` original rows at-or-below
    `value`, so rank error within one partial is <= n/buckets. Fully
    mergeable (concatenate + re-sort, optionally re-compress) — the
    standard partial/combine shape. Deterministic for a fixed batch
    (no RNG)."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    v = np.array(values.drop_null(), dtype=np.float64)  # owned copy
    n = len(v)
    if n == 0:
        return np.empty(0, np.float64), np.empty(0, np.int64)
    v.sort()
    if n <= buckets:
        return v, np.ones(n, np.int64)
    # rank cut points: last element of each of `buckets` even slices
    edges = ((np.arange(1, buckets + 1) * n) // buckets) - 1
    weights = np.diff(np.concatenate([[-1], edges]))
    return v[edges], weights.astype(np.int64)


def quantile_merge_query(
    parts: list[tuple[np.ndarray, np.ndarray]], qs: list[float]
) -> list[float]:
    """Merge partial summaries and answer quantile queries by
    cumulative weight (nearest-rank)."""
    vals = np.concatenate([p[0] for p in parts]) if parts else np.empty(0)
    wts = np.concatenate([p[1] for p in parts]) if parts else np.empty(0, np.int64)
    if len(vals) == 0:
        return [float("nan")] * len(qs)
    order = np.argsort(vals, kind="mergesort")
    vals, wts = vals[order], wts[order]
    cum = np.cumsum(wts)
    total = cum[-1]
    out = []
    for q in qs:
        target = max(1, int(np.ceil(q * total)))
        out.append(float(vals[np.searchsorted(cum, target)]))
    return out


def approx_quantiles(
    ds: Dataset, col: str, qs: list[float], buckets: int = 256
) -> list[float]:
    """Distributed approximate quantiles: one compressed summary per
    batch (<= buckets pairs — the only thing that shuffles), merged on
    the driver. Rank error ~ batches/buckets relative; raise `buckets`
    for tighter estimates."""

    def partial(t: pa.Table) -> pa.Table:
        v, w = quantile_sketch(t[col], buckets)
        return pa.table(
            {
                "vals": pa.array([v.tobytes()], pa.binary()),
                "wts": pa.array([w.tobytes()], pa.binary()),
            }
        )

    parts_df = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = [
        (np.frombuffer(v, np.float64), np.frombuffer(w, np.int64))
        for v, w in zip(parts_df["vals"], parts_df["wts"])
    ]
    return quantile_merge_query(parts, qs)



def histogram_quantiles(
    ds: Dataset, col: str, qs: list[float], buckets: int = 4096
) -> list[float]:
    """DETERMINISTIC approximate quantiles via a fixed-grid histogram:
    pass 1 takes global min/max (native aggregates), pass 2 counts
    rows per equal-width bucket (mergeable int partials — the only
    thing that shuffles, bounded by buckets x batches). The estimate
    for quantile q is the UPPER EDGE of the first bucket whose
    cumulative count reaches ceil(q * total) (nearest-rank on the
    quantized domain), so the error is at most one bucket width
    ((max-min)/buckets) and the answer is invariant to partitioning /
    batch boundaries — unlike per-batch compressed summaries, whose
    merge result depends on block layout. Every float step is a fixed
    IEEE expression (width = (max-min)/buckets; k = floor((v-min)/
    width); est = min + (k+1)*width), so SQL replays it bitwise."""
    import pyarrow.compute as _pc

    stats = ds.map_batches(
        lambda t: pa.table(
            {
                "lo": pa.array([_pc.min(t[col]).as_py()], pa.float64()),
                "hi": pa.array([_pc.max(t[col]).as_py()], pa.float64()),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    lo_vals = stats["lo"].dropna()
    if lo_vals.empty:
        return [float("nan")] * len(qs)
    lo = float(lo_vals.min())
    hi = float(stats["hi"].dropna().max())
    width = (hi - lo) / buckets
    if width <= 0.0:
        # constant column: every quantile is that constant
        total_only = True
        width = 1.0
    else:
        total_only = False

    def partial(t: pa.Table) -> pa.Table:
        v = np.asarray(t[col].drop_null() if isinstance(t[col], pa.Array)
                       else t[col].combine_chunks().drop_null(), np.float64)
        if not len(v):
            return pa.table(
                {"k": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        k = np.minimum(
            np.floor((v - lo) / width).astype(np.int64), buckets - 1
        )
        kk, cc = np.unique(k, return_counts=True)
        return pa.table({"k": pa.array(kk), "c": pa.array(cc.astype(np.int64))})

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .sum("c")
        .to_pandas()
        .sort_values("k")
    )
    cum = hist["sum(c)"].cumsum().to_numpy()
    ks = hist["k"].to_numpy()
    total = int(cum[-1])
    out = []
    for q in qs:
        target = max(1, int(np.ceil(q * total)))
        i = int(np.searchsorted(cum, target))
        if total_only:
            out.append(lo)
        else:
            out.append(lo + (float(ks[i]) + 1.0) * width)
    return out


def heavy_hitters_topk(
    ds,
    key_col: str,
    k: int = 20,
    capacity: int = 4096,
) -> "pa.Table":
    """EXACT top-k keys by count over an UNBOUNDED-cardinality key —
    the two-pass heavy-hitters pattern (exact per-key counting would
    shuffle every distinct key; a hot-key top-k needs none of that):

      pass 1: per-batch Misra-Gries summaries (exact in-batch counts,
        compressed to ``capacity`` counters by subtracting the
        (capacity+1)-th count) -> driver MG merge with the TOTAL
        decrement tracked exactly;
      pass 2: the <= capacity candidate keys broadcast; one streaming
        pass counts ONLY candidates exactly (per-batch filtered
        value_counts partials, bounded merge);
      guard: Misra-Gries guarantees any key with true count >
        total_decrement survives pass 1, so the result is PROVABLY
        exact iff the k-th exact count > total_decrement — otherwise
        this raises (increase ``capacity``).

    Ties at the k-th boundary resolve deterministically
    (count desc, key asc). Returns (key, cnt) sorted the same way.
    """
    import ray

    # NOTE: per-batch decrement must reach the driver too — carry it as
    # one sentinel row per batch (null key)
    def mg_partial_with_dec(t: pa.Table) -> pa.Table:
        col = t[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vc = pa.compute.value_counts(pa.compute.drop_null(col))
        keys = pa.compute.struct_field(vc, "values")
        cnts = np.asarray(pa.compute.struct_field(vc, "counts"), np.int64)
        dec = 0
        if len(cnts) > capacity:
            order = np.argsort(-cnts, kind="stable")
            dec = int(cnts[order[capacity]])
            keep = cnts - dec > 0
            keys = keys.take(pa.array(np.nonzero(keep)[0]))
            cnts = cnts[keep] - dec
        sentinel_key = pa.array([None], keys.type)
        return pa.table(
            {
                "key": pa.concat_arrays([keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys, sentinel_key]),
                "c": pa.array(np.concatenate([cnts, [0]]), pa.int64()),
                "dec": pa.array(
                    np.concatenate([np.zeros(len(cnts), np.int64), [dec]]),
                    pa.int64(),
                ),
            }
        )

    import pandas as pd

    # driver MG merge, streaming over partial batches: counters dict
    # capped at `capacity`, total decrement tracked exactly
    counters: dict = {}
    total_dec = 0
    parts = ds.map_batches(mg_partial_with_dec, batch_format="pyarrow")
    for b in parts.iter_batches(batch_format="pyarrow"):
        total_dec += int(pa.compute.sum(b["dec"]).as_py() or 0)
        keys = b["key"].to_pylist()
        cnts = b["c"].to_pylist()
        for key, c in zip(keys, cnts):
            if key is None or c == 0:
                continue
            counters[key] = counters.get(key, 0) + c
        if len(counters) > capacity:
            vals = np.fromiter(counters.values(), np.int64, len(counters))
            dec = int(np.partition(vals, -capacity - 1)[-capacity - 1]) if len(
                vals
            ) > capacity else 0
            if dec:
                total_dec += dec
                counters = {
                    key: c - dec for key, c in counters.items() if c - dec > 0
                }
    if not counters:
        empty = pa.table({key_col: pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64())})
        return empty

    cand = list(counters)
    cand_ref = ray.put(pa.array(cand))

    def exact_partial(t: pa.Table) -> pa.Table:
        col = t[key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mask = pa.compute.is_in(col, value_set=ray.get(cand_ref))
        vc = pa.compute.value_counts(col.filter(mask))
        return pa.table(
            {
                "key": pa.compute.struct_field(vc, "values"),
                "c": pa.compute.struct_field(vc, "counts"),
            }
        )

    ex = ds.map_batches(exact_partial, batch_format="pyarrow").to_pandas()
    exact = ex.groupby("key", sort=False)["c"].sum().reset_index()
    exact = exact.sort_values(
        ["c", "key"], ascending=[False, True], kind="mergesort"
    ).head(k)
    kth = int(exact["c"].iloc[-1]) if len(exact) >= k else 0
    if len(exact) >= k and kth <= total_dec:
        raise RuntimeError(
            f"heavy_hitters_topk not provably exact: k-th count {kth} <= "
            f"Misra-Gries decrement bound {total_dec}; increase capacity "
            f"(={capacity})"
        )
    return pa.table(
        {
            key_col: pa.array(exact["key"].to_numpy()),
            "cnt": pa.array(exact["c"].to_numpy(), pa.int64()),
        }
    )


def grouped_approx_distinct(
    ds: Dataset, group_col: str, value_col: str, k: int = 1024
) -> Dataset:
    """Per-group approximate distinct count — one KMV sketch per key
    (distinct users per segment over 10^12 rows; an exact per-group
    groupby-distinct would shuffle every value).

    Partial/combine shape: each batch emits one <=k-hash sketch per
    group it contains (vectorized lexsort + segment truncation; the
    only Python loop is over the groups present in the batch), the
    keyed merge unions and re-truncates. Below k distinct values the
    estimate is EXACT (the sketch holds every hash), which is what
    lets the small-scale oracle hash-match while the operator stays
    approximate at scale. Output: (group_col, approx_distinct float64).
    """
    import pandas as pd
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        v = t[value_col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        mask = pc.and_(pc.is_valid(g), pc.is_valid(v))
        g, v = g.filter(mask), v.filter(mask)
        empty = pa.table(
            {group_col: g.slice(0, 0), "sketch": pa.array([], pa.binary())}
        )
        if len(g) == 0:
            return empty
        if not pa.types.is_string(v.type):
            v = v.cast(pa.string())
        h = hash64_strings(v)
        gv = g.to_numpy(zero_copy_only=False)
        order = np.lexsort((h, gv))
        gs, hs = gv[order], h[order]
        uniq = np.ones(len(gs), bool)
        uniq[1:] = (gs[1:] != gs[:-1]) | (hs[1:] != hs[:-1])
        gs, hs = gs[uniq], hs[uniq]
        starts = np.nonzero(np.concatenate([[True], gs[1:] != gs[:-1]]))[0]
        ends = np.concatenate([starts[1:], [len(gs)]])
        out_g, out_sk = [], []
        for s, e in zip(starts, ends):  # one iteration per group in batch
            out_g.append(gs[s])
            out_sk.append(hs[s : min(s + k, e)].astype(np.uint64).tobytes())
        return pa.table(
            {
                group_col: pa.array(out_g, g.type),
                "sketch": pa.array(out_sk, pa.binary()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def reduce_group(df: "pd.DataFrame") -> "pd.DataFrame":
        sketches = [np.frombuffer(b, dtype=np.uint64) for b in df["sketch"]]
        est = kmv_estimate(kmv_merge(sketches, k), k)
        return pd.DataFrame(
            {group_col: [df[group_col].iloc[0]], "approx_distinct": [float(est)]}
        )

    return partials.groupby(group_col).map_groups(
        reduce_group, batch_format="pandas"
    )


# -- Bloom-filter semi join (r4 session 4) ----------------------------


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over uint64 — the deterministic avalanche
    both the build and probe sides share."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def bloom_bit_positions(
    keys: np.ndarray, m_bits: int, k_hashes: int
) -> np.ndarray:
    """(len(keys), k) bit positions via double hashing h1 + i·h2
    (Kirsch-Mitzenmacher); m_bits must be a power of two."""
    h1 = _mix64(keys)
    h2 = _mix64(keys ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    i = np.arange(k_hashes, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) & np.uint64(m_bits - 1)).astype(
        np.int64
    )


def bloom_partial(keys: np.ndarray, m_bits: int, k_hashes: int) -> np.ndarray:
    """One batch's Bloom bitmap (uint8 packed, m_bits/8 bytes) — a
    MERGEABLE partial: bitmaps from any sharding OR together to the
    exact same filter."""
    bits = np.zeros(m_bits, dtype=bool)
    if len(keys):
        bits[bloom_bit_positions(keys, m_bits, k_hashes).ravel()] = True
    return np.packbits(bits)


def bloom_maybe_contains(
    keys: np.ndarray, packed: np.ndarray, m_bits: int, k_hashes: int
) -> np.ndarray:
    """Vectorized membership probe: True = maybe present (false
    positives possible), False = DEFINITELY absent."""
    if not len(keys):
        return np.zeros(0, dtype=bool)
    pos = bloom_bit_positions(keys, m_bits, k_hashes)
    byte = packed[pos >> 3]
    bit = (byte >> (7 - (pos & 7).astype(np.uint8))) & 1
    return bit.all(axis=1).astype(bool)


def bloom_build_ds(
    keys_ds, col: str, m_bits: int = 1 << 23, k_hashes: int = 4
) -> np.ndarray:
    """Distributed Bloom build: per-batch packed bitmaps (mergeable
    partials — the shuffle ships m_bits/8 bytes per batch, never the
    keys) OR-folded on the driver. m_bits = 2^23 is a 1 MiB filter
    (~1% FP at 1M keys with k=4); size m ≈ 10·n_keys for ~1%."""
    import pyarrow as pa

    def partial(t: "pa.Table") -> "pa.Table":
        keys = t[col].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({"bm": pa.array([bloom_partial(keys, m_bits, k_hashes)])})

    acc = np.zeros(m_bits // 8, dtype=np.uint8)
    for b in keys_ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for bm in b["bm"]:
            acc |= np.asarray(bm.values, dtype=np.uint8)
    return acc


def bloom_semi_join(
    left,
    left_col: str,
    keys_ds,
    key_col: str,
    m_bits: int = 1 << 23,
    k_hashes: int = 4,
    num_partitions: int | None = None,
):
    """EXACT distributed semi join with a Bloom pre-filter — the
    100-TB pattern for a key set too large to broadcast exactly:

      1. build a fixed-size Bloom filter over the key side
         DISTRIBUTEDLY (mergeable per-batch bitmaps; only m/8 bytes
         per batch move, never keys);
      2. broadcast the ~1 MiB filter via ray.put and drop every left
         row whose key is DEFINITELY absent — typically the vast
         majority, so the expensive hash-shuffle semi join only sees
         survivors;
      3. finish with the exact distributed semi join
         (stages/join.py:semi_anti_join_ds) to eliminate the Bloom's
         false positives.

    Result is EXACT (the filter only ever removes true negatives);
    the Bloom trades one cheap broadcast for shuffle volume. Anti
    joins cannot pre-filter this way (a false positive would wrongly
    survive step 2's complement) — use semi_anti_join_ds directly."""
    import ray

    from ..stages.join import semi_anti_join_ds

    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)))

    packed = bloom_build_ds(keys_ds, key_col, m_bits, k_hashes)
    bref = ray.put(packed)

    import pyarrow as pa

    def prefilter(t: "pa.Table") -> "pa.Table":
        keys = t[left_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = bloom_maybe_contains(
            keys, ray.get(bref), m_bits, k_hashes
        )
        return t.filter(pa.array(keep))

    survivors = left.map_batches(prefilter, batch_format="pyarrow")
    return semi_anti_join_ds(
        survivors, left_col, keys_ds, key_col, anti=False,
        num_partitions=num_partitions,
    )


def grouped_approx_quantiles(
    ds: Dataset,
    key_col: str,
    value_col: str,
    qs: list[float],
    buckets: int = 256,
) -> "pa.Table":
    """Per-group approximate quantiles from MERGEABLE compressed
    summaries — the sketch alternative to the exact
    grouped_exact_quantile when groups x refinement passes are too
    expensive: each batch contributes one quantile_sketch per group it
    sees (<= buckets (value, weight) pairs, independent of rows), the
    bounded partials merge per group on the driver. Rank error within
    a group ~ #batches-touching-it / buckets. Deterministic for a
    fixed layout (no RNG); approximate across layouts -> rows-only /
    pytest surface (error-bound test vs exact), never an oracle.

    Returns an Arrow table (key, q, value) sorted by (key, q)."""
    import numpy as np

    import ray as _ray
    import pyarrow.compute as _pc

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        karr = keys.to_numpy(zero_copy_only=False)
        order = np.argsort(karr, kind="stable")
        ks = karr[order]
        vals = t[value_col].to_numpy(zero_copy_only=False)[order]
        starts = (
            np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))
            if len(ks)
            else np.empty(0, np.int64)
        )
        lens = np.diff(np.append(starts, len(ks)))
        out_k, out_v, out_w = [], [], []
        for s, ln in zip(starts, lens):
            v, w = quantile_sketch(
                pa.array(vals[s : s + ln], pa.float64()), buckets
            )
            out_k.append(ks[s])
            out_v.append(v.tobytes())
            out_w.append(w.tobytes())
        return pa.table(
            {
                "k": pa.array(out_k, keys.type),
                "vals": pa.array(out_v, pa.binary()),
                "wts": pa.array(out_w, pa.binary()),
            }
        )

    parts = [
        t
        for t in _ray.get(
            ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_columns and t.num_rows
    ]
    if not parts:
        return pa.table(
            {
                "k": pa.array([], pa.string()),
                "q": pa.array([], pa.float64()),
                "value": pa.array([], pa.float64()),
            }
        )
    tbl = pa.concat_tables(parts)
    karr = tbl["k"].to_numpy(zero_copy_only=False)
    out_k, out_q, out_val = [], [], []
    for key in np.unique(karr):
        mask = _pc.equal(tbl["k"], key.item() if hasattr(key, "item") else key)
        sub = tbl.filter(mask)
        sks = [
            (np.frombuffer(v, np.float64), np.frombuffer(w, np.int64))
            for v, w in zip(
                sub["vals"].to_pylist(), sub["wts"].to_pylist()
            )
        ]
        for q, val in zip(qs, quantile_merge_query(sks, qs)):
            out_k.append(key)
            out_q.append(q)
            out_val.append(val)
    return pa.table(
        {
            "k": pa.array(out_k, tbl["k"].type),
            "q": pa.array(out_q, pa.float64()),
            "value": pa.array(out_val, pa.float64()),
        }
    )
