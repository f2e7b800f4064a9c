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
