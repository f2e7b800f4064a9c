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


# ------------------------------------------------- global shuffle rank

SEED_C = 97_531  # seed -> multiplier mixer; keeps the hash int64-exact


def _seed_mult(seed: int) -> int:
    """Seed-dependent multiplier. A seed must change the MULTIPLIER,
    not add a constant: (x*A + B + seed*C) % M is a constant shift of
    every key, which preserves the order except at the (rare)
    wraparound — near-identical permutations per seed. Multiplication
    by a different non-zero constant mod the prime M is a genuinely
    independent bijection."""
    return (HASH_A + seed * SEED_C) % HASH_M or HASH_A


def shuffle_hash(ids: pa.Array | pa.ChunkedArray, seed: int = 0):
    """Deterministic shuffle key in [0, HASH_M): same exact-int64
    contract as hash_bucket, so the SQL oracle replays it bitwise
    (valid for ids below ~9e9 at any seed: id * mult < 2^63)."""
    import numpy as np

    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    x = np.asarray(pc.cast(ids, pa.int64()), dtype=np.int64)
    return (x * _seed_mult(seed) + HASH_B) % HASH_M


def global_shuffle_rank(
    ds: Dataset,
    id_col: str = "doc_id",
    seed: int = 0,
    n_buckets: int = 256,
) -> Dataset:
    """Assign every row its position in a deterministic global shuffle
    — the epoch-shuffle step before training-shard writing. Order is
    (shuffle_hash(id, seed), id): a pure function of the ids, so the
    permutation is identical across runs, partitionings and CPU
    counts (unlike random_shuffle), and a different ``seed`` gives an
    independent epoch order. Returns (id_col, shuffle_rank).

    Scale shape (distributed rank / zip-with-index): the hash is
    uniform, so order-preserving range buckets ``h * B // M`` are
    balanced by construction — no skew, no sampling pass. Stage 1:
    per-batch bucket-count partials -> bounded driver merge
    (O(batches x B) rows) -> exclusive prefix offsets (B ints,
    captured in the stage-2 closure). Stage 2: ONE keyed shuffle on
    bucket; each group sorts its own ~N/B rows and adds its offset.
    Pick ``n_buckets`` ~ N x row_bytes / target_partition_bytes so a
    group fits a worker; the driver never holds more than B integers.
    """
    import numpy as np

    def keyed(t: pa.Table) -> pa.Table:
        h = shuffle_hash(t[id_col], seed)
        return pa.table(
            {
                id_col: t[id_col],
                "h": pa.array(h),
                "bucket": pa.array(h * n_buckets // HASH_M),
            }
        )

    with_key = ds.map_batches(keyed, batch_format="pyarrow")

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.select(["bucket"]).group_by("bucket").aggregate([([], "count_all")])
        return pa.table({"bucket": g["bucket"], "c": g["count_all"]})

    parts = with_key.map_batches(count_partial, batch_format="pyarrow").to_pandas()
    counts = np.zeros(n_buckets, dtype=np.int64)
    merged = parts.groupby("bucket")["c"].sum()
    counts[merged.index.to_numpy()] = merged.to_numpy()
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])

    def rank_group(df):
        import pandas as pd

        df = df.sort_values(["h", id_col])
        base = int(offsets[int(df["bucket"].iloc[0])])
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "shuffle_rank": base + np.arange(len(df), dtype=np.int64),
            }
        )

    return with_key.groupby("bucket").map_groups(rank_group, batch_format="pandas")


def shuffle_rank_sql(table: str, id_col: str, seed: int = 0) -> str:
    """DuckDB replay: row_number over the same exact-int64 hash."""
    h = f"(({id_col} * {_seed_mult(seed)} + {HASH_B}) % {HASH_M})"
    return (
        f"SELECT {id_col}, CAST(row_number() OVER (ORDER BY {h}, {id_col}) - 1"
        f" AS BIGINT) AS shuffle_rank FROM {table}"
    )
