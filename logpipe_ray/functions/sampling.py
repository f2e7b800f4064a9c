"""Deterministic sampling operators.

The reference has no sampling (SURVEY.md §2.6 — fixture generators use
weighted randomness only); a training-data pipeline needs *repeatable*
subsampling whose membership is a pure function of the record id, so a
resumed / re-run job samples the same rows. Hash-based sampling gives
that: keep iff bucket(id) < pct where bucket is a fixed multiplicative
hash — no RNG state, no shuffle, embarrassingly parallel, and exactly
replayable in SQL for the oracle.

Hash: ((id * 2654435761 + 12345) mod 1e9+7) mod 100 — all int64-exact
for ids below ~3.5e9 (Knuth multiplicative constant), so the DuckDB
oracle reproduces it bit-for-bit.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

HASH_A = 2654435761
HASH_B = 12345
HASH_M = 1_000_000_007


def hash_bucket(ids: pa.Array | pa.ChunkedArray, buckets: int = 100):
    """bucket(id) in [0, buckets) — vectorized int64 arithmetic
    (numpy: pyarrow.compute has no modulo kernel)."""
    import numpy as np

    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    x = np.asarray(pc.cast(ids, pa.int64()), dtype=np.int64)
    h = (x * HASH_A + HASH_B) % HASH_M % buckets
    return pa.array(h)


def hash_sample(
    ds: Dataset, id_col: str = "doc_id", pct: int = 10, buckets: int = 100
) -> Dataset:
    """Keep rows whose hash bucket falls below ``pct`` — a
    deterministic ~pct% sample, stable across runs and partitioning."""

    def fn(t: pa.Table) -> pa.Table:
        mask = pc.less(hash_bucket(t[id_col], buckets), pct)
        return t.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def sample_sql_predicate(id_col: str, pct: int, buckets: int = 100) -> str:
    """The DuckDB predicate replaying hash_sample exactly."""
    return (
        f"((({id_col} * {HASH_A} + {HASH_B}) % {HASH_M}) % {buckets}) < {pct}"
    )


def stratified_hash_sample(
    ds: Dataset,
    strata_col: str,
    rates: dict[str, int],
    id_col: str = "doc_id",
    default_pct: int = 0,
    buckets: int = 100,
) -> Dataset:
    """Mixture sampling: keep each stratum at its own deterministic
    rate — the "sample sources to target proportions" step of a
    training-mixture build (e.g. {"web": 10, "wiki": 100, "code": 50}
    keeps 10% / 100% / 50% of each source).

    Same hash-membership contract as hash_sample (pure function of the
    id: repeatable across runs, resume-safe, shuffle-free), with the
    per-stratum threshold gathered via a broadcast-free dictionary
    lookup vectorized through pc.index_in. Strata not in ``rates`` get
    ``default_pct``. Exactly replayable in SQL (CASE over the same
    integer hash) for the oracle.
    """
    import numpy as np

    keys = pa.array(list(rates))
    pcts = np.fromiter(rates.values(), dtype=np.int64, count=len(rates))

    def fn(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t[strata_col], value_set=keys).to_numpy(
            zero_copy_only=False
        )
        ok = idx >= 0 if idx.dtype.kind == "i" else ~np.isnan(idx)
        thr = np.where(ok, pcts[np.where(ok, idx, 0).astype(np.int64)],
                       default_pct)
        bucket = np.asarray(hash_bucket(t[id_col], buckets), dtype=np.int64)
        return t.filter(pa.array(bucket < thr))

    return ds.map_batches(fn, batch_format="pyarrow")


def stratified_sample_sql_case(
    strata_col: str, rates: dict[str, int], id_col: str,
    default_pct: int = 0, buckets: int = 100,
) -> str:
    """DuckDB predicate replaying stratified_hash_sample exactly."""
    branches = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in rates.items()
    )
    thr = f"(CASE {strata_col} {branches} ELSE {default_pct} END)"
    return (
        f"((({id_col} * {HASH_A} + {HASH_B}) % {HASH_M}) % {buckets}) < {thr}"
    )
