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


# ------------------------------------------------ split + per-group k

def hash_split(
    ds: Dataset,
    id_col: str = "doc_id",
    splits: dict[str, int] | None = None,
    buckets: int = 100,
    out_col: str = "split",
) -> Dataset:
    """Deterministic train/val/test assignment: ``hash_bucket(id)``
    partitions [0, buckets) into contiguous ranges sized by the split
    weights (weights must sum to ``buckets``). Membership is a pure
    function of the id — resume-safe, identical across runs and
    partitionings, and disjoint from sibling splits by construction
    (no leakage). Shuffle-free; exactly replayable in SQL as a CASE
    over the same integer hash (``split_sql_case``)."""
    import numpy as np

    splits = splits or {"train": 98, "val": 1, "test": 1}
    if sum(splits.values()) != buckets:
        raise ValueError("split weights must sum to the bucket count")
    names = np.array(list(splits), dtype=object)
    cuts = np.cumsum(np.fromiter(splits.values(), dtype=np.int64))

    def fn(t: pa.Table) -> pa.Table:
        b = np.asarray(hash_bucket(t[id_col], buckets), dtype=np.int64)
        idx = np.searchsorted(cuts, b, side="right")
        return t.append_column(out_col, pa.array(names[idx], pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def split_sql_case(id_col: str, splits: dict[str, int], buckets: int = 100) -> str:
    """DuckDB expression replaying hash_split exactly."""
    h = f"((({id_col} * {HASH_A} + {HASH_B}) % {HASH_M}) % {buckets})"
    cut = 0
    branches = []
    for name, w in splits.items():
        cut += w
        branches.append(f"WHEN {h} < {cut} THEN '{name}'")
    return "CASE " + " ".join(branches) + " END"


def grouped_hash_topk(
    ds: Dataset,
    group_col: str,
    id_col: str = "doc_id",
    k: int = 5,
    seed: int = 1,
) -> Dataset:
    """Deterministic k-per-group sample — the reservoir-sampling shape
    without RNG state: keep each group's k rows with the smallest
    (shuffle_hash(id, seed), id). A different seed draws an
    independent sample; membership is a pure function of the ids.

    Scale shape: a per-batch vectorized partial top-k per group
    (lexsort + run-boundary rank) caps the exchange at
    batches x groups x k rows, then one small groupby(group) finishes
    — no reducer ever sees a group's full row set. Replayable in SQL:
    ``row_number() OVER (PARTITION BY g ORDER BY hash, id) <= k``.
    Returns (group_col, id_col, sample_rank)."""
    import numpy as np
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        h = np.asarray(shuffle_hash(t[id_col], seed))
        ids = np.asarray(pc.cast(t[id_col], pa.int64()), dtype=np.int64)
        g = t[group_col].to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(g)
        order = np.lexsort((ids, h, codes))
        gs = codes[order]
        first = np.ones(len(gs), dtype=bool)
        first[1:] = gs[1:] != gs[:-1]
        starts = np.flatnonzero(first)
        rank = np.arange(len(gs)) - np.repeat(starts, np.diff(
            np.append(starts, len(gs))
        ))
        keep_sorted = order[rank < k]
        out = t.take(pa.array(keep_sorted, pa.int64()))
        return pa.table(
            {
                group_col: out[group_col],
                id_col: out[id_col],
                "_h": pa.array(h[keep_sorted]),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def final(df):
        import pandas as pd

        df = df.sort_values(["_h", id_col], kind="stable").head(k)
        return pd.DataFrame(
            {
                group_col: df[group_col].to_numpy(),
                id_col: df[id_col].to_numpy(),
                "sample_rank": np.arange(len(df), dtype=np.int64),
            }
        )

    return partials.groupby(group_col).map_groups(final, batch_format="pandas")


def grouped_topk_sql(
    table: str, group_col: str, id_col: str, k: int, seed: int = 1
) -> str:
    """DuckDB replay of grouped_hash_topk (same exact-int64 hash)."""
    h = f"(({id_col} * {_seed_mult(seed)} + {HASH_B}) % {HASH_M})"
    return f"""
SELECT {group_col}, {id_col},
       CAST(row_number() OVER (PARTITION BY {group_col} ORDER BY {h}, {id_col}) - 1
            AS BIGINT) AS sample_rank
FROM {table}
QUALIFY row_number() OVER (PARTITION BY {group_col} ORDER BY {h}, {id_col}) <= {k}"""


# ------------------------------------------------ weighted sampling

def weighted_hash_sample(
    ds: Dataset,
    id_col: str,
    weight_col: str,
    w_cap: int,
    rate_pct: int,
) -> Dataset:
    """Deterministic weighted (Poisson / Bernoulli) sampling: each row
    is kept independently with probability

        (rate_pct / 100) * min(weight, w_cap) / w_cap

    using the fixed multiplicative hash of the id as the uniform draw
    — the importance-sampling shape of training-data curation (e.g.
    sample documents proportionally to token count for a token-budget
    subcorpus, or to a quality score for quality-weighted mixtures)
    with NO RNG state: membership is a pure function of (id, weight),
    so re-runs, resumes and any partitioning draw the same sample, and
    the DuckDB oracle replays it bit-for-bit
    (``weighted_sample_sql_predicate``).

    All int64-exact: keep iff h(id) * w_cap * 100 < M * rate_pct *
    min(w, w_cap) with h < M ~ 1e9, so both sides stay far below 2^63
    for caps up to ~1e7. Shuffle-free, embarrassingly parallel.
    ``weight_col`` must be a non-negative integer column (scale
    fractional weights to permille upstream)."""
    import numpy as np

    def fn(t: pa.Table) -> pa.Table:
        ids = np.asarray(pc.cast(t[id_col], pa.int64()), dtype=np.int64)
        h = (ids * HASH_A + HASH_B) % HASH_M
        w = np.minimum(
            np.asarray(pc.cast(t[weight_col], pa.int64()), dtype=np.int64),
            w_cap,
        )
        keep = h * (w_cap * 100) < HASH_M * rate_pct * w
        return t.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def weighted_sample_sql_predicate(
    id_col: str, weight_expr: str, w_cap: int, rate_pct: int
) -> str:
    """The DuckDB predicate replaying weighted_hash_sample exactly."""
    return (
        f"((({id_col} * {HASH_A} + {HASH_B}) % {HASH_M}) * {w_cap * 100}"
        f" < CAST({HASH_M} AS BIGINT) * {rate_pct}"
        f" * LEAST({weight_expr}, {w_cap}))"
    )


def token_budget_mix(
    ds: Dataset,
    group_col: str,
    weight_col: str,
    budgets: dict,
    id_col: str = "doc_id",
    seed: int = 0,
    default_budget: int = 0,
    n_buckets: int = 64,
) -> Dataset:
    """Fill each group to a WEIGHT BUDGET in a deterministic shuffle
    order — the "mix sources to a token recipe" step of a
    training-corpus build (each lang/source contributes at most its
    budgeted tokens; greedy fill in hash order makes the pick
    reproducible and resume-safe): a row is kept iff the EXCLUSIVE
    prefix sum of ``weight_col`` over its group, ordered by
    (shuffle_hash(id, seed), id), is still below the group's budget —
    so the first over-budget document is included (budget semantics =
    "start while under budget"), groups under budget keep everything,
    budget 0 drops the group.

    Scale shape (the global_shuffle_rank plan, per group): the hash is
    uniform so order-preserving range buckets h*B//M balance by
    construction; per-batch (group, bucket) weight-sum partials merge
    on the driver (bounded by groups x B rows), an exclusive prefix
    per group gives each bucket its starting offset; ONE keyed
    exchange on (group, bucket) then sorts ~N/(groups·B) rows locally
    and emits the kept rows. Exactly replayable in SQL (SUM OVER
    PARTITION BY ... ROWS UNBOUNDED PRECEDING AND 1 PRECEDING over
    the same integer hash). Returns (id_col, group_col, weight_col)
    for the kept rows."""
    import numpy as np
    import pandas as pd

    def keyed(t: pa.Table) -> pa.Table:
        h = shuffle_hash(t[id_col], seed)
        return pa.table(
            {
                id_col: pc.cast(t[id_col], pa.int64()),
                group_col: t[group_col],
                weight_col: pc.cast(t[weight_col], pa.int64()),
                "_h": pa.array(h),
                "_bk": pa.array(h * n_buckets // HASH_M),
            }
        )

    with_key = ds.map_batches(keyed, batch_format="pyarrow")

    def wsum_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select([group_col, "_bk", weight_col])
            .group_by([group_col, "_bk"])
            .aggregate([(weight_col, "sum")])
        )
        return g.rename_columns([group_col, "_bk", "w"])

    parts = with_key.map_batches(
        wsum_partial, batch_format="pyarrow"
    ).to_pandas()
    if len(parts) == 0:
        return ds.map_batches(
            lambda t: pa.schema(
                [
                    (id_col, pa.int64()),
                    (group_col, pa.string()),
                    (weight_col, pa.int64()),
                ]
            ).empty_table(),
            batch_format="pyarrow",
        )
    merged = (
        parts.groupby([group_col, "_bk"])["w"].sum().reset_index()
        .sort_values([group_col, "_bk"])
    )
    # exclusive prefix per group over bucket order
    csum = merged.groupby(group_col)["w"].cumsum().to_numpy()
    merged["off"] = csum - merged["w"].to_numpy()
    offsets = {
        (g, int(b)): int(o)
        for g, b, o in zip(merged[group_col], merged["_bk"], merged["off"])
    }
    import ray as _ray

    off_ref = _ray.put(offsets)

    def fill_group(df: "pd.DataFrame", _o=off_ref) -> "pd.DataFrame":
        off_map = _ray.get(_o)
        g = df[group_col].iloc[0]
        budget = int(budgets.get(g, default_budget))
        base = int(off_map[(g, int(df["_bk"].iloc[0]))])
        if base >= budget:
            sub = df.iloc[:0]  # keeps the input dtypes -> uniform blocks
            return pd.DataFrame(
                {
                    id_col: sub[id_col].to_numpy(),
                    group_col: sub[group_col].to_numpy(),
                    weight_col: sub[weight_col].to_numpy(dtype=np.int64),
                }
            )
        df = df.sort_values(["_h", id_col])
        w = df[weight_col].to_numpy(dtype=np.int64)
        prior = base + np.cumsum(w) - w
        keep = prior < budget
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy()[keep],
                group_col: df[group_col].to_numpy()[keep],
                weight_col: w[keep],
            }
        )

    return with_key.groupby([group_col, "_bk"]).map_groups(
        fill_group, batch_format="pandas"
    )


def token_budget_mix_sql(
    table: str,
    group_col: str,
    weight_expr: str,
    budgets: dict,
    id_col: str = "doc_id",
    seed: int = 0,
    default_budget: int = 0,
    weight_col: str = "w",
) -> str:
    """DuckDB replay of token_budget_mix: the same integer hash and an
    exclusive windowed SUM per group."""
    h = f"(({id_col} * {_seed_mult(seed)} + {HASH_B}) % {HASH_M})"
    case = " ".join(
        f"WHEN '{g}' THEN {int(b)}" for g, b in sorted(budgets.items())
    )
    return f"""
WITH t AS (SELECT {id_col}, {group_col}, CAST({weight_expr} AS BIGINT) AS w,
                  {h} AS h FROM {table}),
p AS (SELECT *, coalesce(SUM(w) OVER (PARTITION BY {group_col}
         ORDER BY h, {id_col}
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
      FROM t)
SELECT {id_col}, {group_col}, w AS {weight_col}
FROM p
WHERE prior < (CASE {group_col} {case} ELSE {int(default_budget)} END)"""


def mmr_select(
    ds: Dataset,
    id_col: str,
    text_col: str,
    quality_col: str,
    k: int = 20,
    pool: int = 200,
    lam: float = 0.7,
    hash_dim: int = 4096,
) -> pa.Table:
    """MAXIMAL-MARGINAL-RELEVANCE diverse selection — pick k documents
    maximizing λ·quality − (1−λ)·max-similarity-to-already-picked, the
    "diverse exemplars, not k near-copies" selection step of corpus
    curation / few-shot pool building.

    Scale shape: the candidate POOL is a distributed top-``pool`` by
    (quality desc, id asc) — per-batch local top-k then one tiny merge
    (O(pool x batches) movement, never rows); the greedy MMR loop is
    inherently sequential, so it runs on the driver over the bounded
    pool only: token sets hash into a (pool x hash_dim) incidence
    matrix and each round is one vectorized Jaccard update (O(pool x
    hash_dim)). Deterministic: quality ties break by id, score ties by
    pool order; no RNG. SQL-replayable BITWISE despite the greedy
    float loop: token columns come from the hash64_strings chain (the
    FNV+splitmix machinery the minhash oracle replays in HUGEINT),
    Jaccard and quality normalization are single IEEE divides of
    exact-integer counts, and the score is one multiply-subtract — no
    float SUMMATION anywhere, so DuckDB reproduces every comparison
    (_sql_docs_mmr_select). Pytest additionally pins a brute reference
    and a planted-duplicate case where diversity changes the pick.

    Returns an Arrow table (id_col, mmr_rank, mmr_score)."""
    import numpy as np
    import pandas as pd

    from ..stages.aggregate import top_k

    cand = top_k(
        ds.map_batches(
            lambda t: pa.table(
                {
                    id_col: pc.cast(t[id_col], pa.int64()),
                    text_col: t[text_col],
                    quality_col: pc.cast(t[quality_col], pa.float64()),
                }
            ),
            batch_format="pyarrow",
        ),
        [(quality_col, "descending"), (id_col, "ascending")],
        pool,
    ).to_pandas()
    n = len(cand)
    if n == 0:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "mmr_rank": pa.array([], pa.int64()),
                "mmr_score": pa.array([], pa.float64()),
            }
        )
    k = min(k, n)
    ids = cand[id_col].to_numpy()
    q = cand[quality_col].to_numpy(dtype=np.float64)
    qspan = q.max() - q.min()
    qn = (q - q.min()) / qspan if qspan > 0 else np.ones(n)
    # hashed token incidence matrix — hash64_strings (FNV-1a +
    # splitmix), the oracle-replayable chain; float64 so inter/union
    # dot products stay exact-integer-valued
    from ..stages.transform import hash64_strings

    M = np.zeros((n, hash_dim), dtype=np.float64)
    for i, text in enumerate(cand[text_col]):
        toks = sorted(set((text or "").split(" ")))
        if toks:
            cols = hash64_strings(pa.array(toks, pa.string())) % np.uint64(
                hash_dim
            )
            M[i, cols.astype(np.int64)] = 1.0
    sizes = M.sum(axis=1)
    picked: list[int] = []
    sel_scores: list[float] = []
    max_sim = np.zeros(n, dtype=np.float64)
    taken = np.zeros(n, dtype=bool)
    for _ in range(k):
        score = lam * qn - (1.0 - lam) * max_sim
        score = np.where(taken, -np.inf, score)
        # deterministic argmax: best score, then pool order (= quality
        # desc, id asc — the candidate sort)
        j = int(np.argmax(score))
        picked.append(j)
        sel_scores.append(float(score[j]))
        taken[j] = True
        inter = M @ M[j]
        union = sizes + sizes[j] - inter
        sim = np.divide(
            inter, union, out=np.zeros(n), where=union > 0
        )
        max_sim = np.maximum(max_sim, sim)
    return pa.table(
        {
            id_col: pa.array(ids[picked], pa.int64()),
            "mmr_rank": pa.array(np.arange(k, dtype=np.int64)),
            "mmr_score": pa.array(np.asarray(sel_scores), pa.float64()),
        }
    )
