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
