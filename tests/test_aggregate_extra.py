import pyarrow as pa
import pytest

import ray.data as rd

from logpipe_ray.pipelines.flagship import build_pipeline
from logpipe_ray.stages.aggregate import (
    count_groupby,
    hash_partition,
    split_null_keys,
)


def test_salted_counts_equal_unsalted(ray_session, tiny_sequences):
    ds = build_pipeline(rd.read_parquet(tiny_sequences))
    plain = count_groupby(ds, ["source"], alias="cnt").to_pandas()
    salted = count_groupby(ds, ["source"], alias="cnt", salt=8).to_pandas()
    a = dict(zip(plain["source"], plain["cnt"]))
    b = dict(zip(salted["source"], salted["cnt"]))
    assert a == b
    assert "_salt" not in salted.columns


def test_hash_partition_disjoint_and_complete(ray_session):
    ds = rd.from_items([{"doc_id": f"d{i}", "v": i} for i in range(500)])
    out = hash_partition(ds, "doc_id", 8)
    df = out.to_pandas()
    assert len(df) == 500
    assert set(df["_bucket"]) <= set(range(8))
    assert len(set(df["_bucket"])) > 1
    # deterministic bucket per key
    again = hash_partition(ds, "doc_id", 8).to_pandas()
    m1 = dict(zip(df["doc_id"], df["_bucket"]))
    m2 = dict(zip(again["doc_id"], again["_bucket"]))
    assert m1 == m2


def test_split_null_keys(ray_session):
    ds = rd.from_items(
        [{"k": "a", "v": 1}, {"k": None, "v": 2}, {"k": "b", "v": 3}] * 5
    )
    keep, bypass = split_null_keys(ds, ["k"])
    assert keep.count() == 10
    assert bypass.count() == 5
    assert all(r["k"] is None for r in bypass.take_all())


def test_grouped_top_k_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from logpipe_ray.stages.aggregate import grouped_top_k

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 5, 500),
            "v": rng.integers(0, 50, 500),
            "id": np.arange(500),
        }
    )
    got = (
        grouped_top_k(
            rd.from_arrow(pa.Table.from_pandas(df)).repartition(8),
            ["g"],
            [("v", "descending"), ("id", "ascending")],
            3,
        )
        .to_pandas()
        .sort_values(["g", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["g", "v", "id"], ascending=[True, False, True])
        .groupby("g", sort=False)
        .head(3)
        .sort_values(["g", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["g", "v", "id"]], want)


def test_hash_sample_deterministic_and_partition_invariant(ray_session):
    import pyarrow as pa

    import ray.data as rd

    from logpipe_ray.functions.sampling import hash_sample

    t = pa.table({"doc_id": pa.array(range(5000), pa.int64())})
    a = sorted(hash_sample(rd.from_arrow(t), pct=10).to_pandas()["doc_id"])
    b = sorted(
        hash_sample(rd.from_arrow(t).repartition(16), pct=10).to_pandas()["doc_id"]
    )
    assert a == b
    assert 0.05 < len(a) / 5000 < 0.15


def test_partitioned_rolling_sum_skewed_key(ray_session):
    """One hot key holds 90% of all rows (the event_type shape): the
    (key, bucket) partitioning must (a) reproduce the exact global
    per-key rolling sum across bucket boundaries, (b) never hand any
    reducer the full hot key — the max (key, bucket) group is a small
    fraction of the hot key's rows."""
    import numpy as np
    import pandas as pd

    from logpipe_ray.stages.aggregate import partitioned_rolling_sum

    rng = np.random.default_rng(5)
    n_hot, n_cold = 9000, 1000
    key = np.array(["hot"] * n_hot + ["cold"] * n_cold)
    order = np.concatenate([np.arange(n_hot), np.arange(n_cold)])
    bucket = order // 250  # 36 buckets for the hot key
    val = rng.integers(0, 1000, n_hot + n_cold)
    df = pd.DataFrame({"k": key, "o": order, "b": bucket, "v": val})

    # no reducer sees the full hot key: groups are exactly (k, b)
    max_group = df.groupby(["k", "b"]).size().max()
    assert max_group <= 250 < n_hot

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = (
        partitioned_rolling_sum(
            ds, key="k", order_cols=["o"], value_col="v",
            window=3, bucket_col="b", out_col="r",
        )
        .to_pandas()
        .sort_values(["k", "o"], ignore_index=True)
    )
    want = df.sort_values(["k", "o"], ignore_index=True)
    want["r"] = (
        want.groupby("k", sort=False)["v"]
        .transform(lambda s: s.rolling(3, min_periods=1).sum())
        .astype("int64")
    )
    pd.testing.assert_frame_equal(
        got[["k", "o", "r"]], want[["k", "o", "r"]]
    )


def test_partitioned_rolling_sum_sparse_buckets(ray_session):
    """Carry-in must come from the closest PRECEDING bucket even when
    buckets are sparse and the previous one has fewer than window-1
    rows."""
    import pandas as pd

    from logpipe_ray.stages.aggregate import partitioned_rolling_sum

    # bucket 0: two rows, bucket 5: one row, bucket 9: two rows
    df = pd.DataFrame(
        {
            "k": ["a"] * 5,
            "o": [0, 1, 2, 3, 4],
            "b": [0, 0, 5, 9, 9],
            "v": [10, 20, 30, 40, 50],
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = (
        partitioned_rolling_sum(
            ds, key="k", order_cols=["o"], value_col="v",
            window=3, bucket_col="b", out_col="r",
        )
        .to_pandas()
        .sort_values("o", ignore_index=True)
    )
    assert got["r"].tolist() == [10, 30, 60, 90, 120]


def test_grouped_exact_median_distributed_selection(ray_session):
    """Force the histogram-refinement path (tiny collect_limit /
    n_buckets): results must equal numpy linear-interpolation medians
    exactly, including even/odd group sizes, heavy duplicates, an
    all-equal group (zero-width bracket) and negative values."""
    import numpy as np
    import pandas as pd

    from logpipe_ray.stages.aggregate import grouped_exact_median

    rng = np.random.default_rng(17)
    groups = {
        "hot": rng.normal(0, 100, 20001),          # odd n
        "even": rng.uniform(-50, 50, 5000),        # even n
        "dupes": np.repeat(rng.integers(0, 5, 40).astype(float), 100),
        "const": np.full(777, 3.25),               # all equal
        "tiny": np.array([1.0, 2.0]),
    }
    df = pd.DataFrame(
        {
            "k": np.concatenate([[k] * len(v) for k, v in groups.items()]),
            "v": np.concatenate(list(groups.values())),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = grouped_exact_median(
        ds, key="k", value_col="v", n_buckets=16, collect_limit=64,
        max_iters=25,
    ).to_pandas()
    want = {
        k: float(np.percentile(v, 50, method="linear"))
        for k, v in groups.items()
    }
    assert dict(zip(got["k"], got["median_value"])) == want


def test_grouped_exact_quantile_p90(ray_session):
    """Arbitrary-q selection (p90) through the refinement path."""
    import numpy as np
    import pandas as pd

    from logpipe_ray.stages.aggregate import grouped_exact_quantile

    rng = np.random.default_rng(23)
    df = pd.DataFrame(
        {
            "k": np.repeat(["a", "b"], [7000, 4001]),
            "v": np.concatenate(
                [rng.normal(10, 5, 7000), rng.exponential(3, 4001)]
            ),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = grouped_exact_quantile(
        ds, key="k", value_col="v", q=0.9, n_buckets=32, collect_limit=64,
        max_iters=20,
    ).to_pandas()
    want = {
        k: float(np.percentile(g["v"], 90, method="linear"))
        for k, g in df.groupby("k")
    }
    assert dict(zip(got["k"], got["quantile_value"])) == want


def test_stratified_hash_sample(ray_session):
    """Per-stratum deterministic rates: each stratum is sampled by the
    SAME membership function regardless of partitioning; rates land
    near targets; unlisted strata use default_pct; repeat run
    identical."""
    import numpy as np
    import pandas as pd

    from logpipe_ray.functions.sampling import stratified_hash_sample

    df = pd.DataFrame(
        {
            "doc_id": np.arange(4000),
            "src": np.repeat(["a", "b", "c", "d"], 1000),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    rates = {"a": 100, "b": 50, "c": 0}
    out1 = stratified_hash_sample(
        ds, "src", rates, id_col="doc_id", default_pct=10
    ).to_pandas()
    out2 = stratified_hash_sample(
        ds.repartition(7), "src", rates, id_col="doc_id", default_pct=10
    ).to_pandas()
    c = out1.groupby("src").size()
    assert c.get("a", 0) == 1000            # 100%
    assert 400 < c.get("b", 0) < 600        # ~50%
    assert c.get("c", 0) == 0               # 0%
    assert 50 < c.get("d", 0) < 200         # default 10%
    assert sorted(out1["doc_id"]) == sorted(out2["doc_id"])  # partition-stable


def test_partitioned_running_sum_skewed_key(ray_session):
    """Distributed prefix sum: exact per-key cumulative sums across
    bucket boundaries with a 90%-hot key, no reducer holding the full
    key (groups are (k, b))."""
    import numpy as np
    import pandas as pd

    from logpipe_ray.stages.aggregate import partitioned_running_sum

    rng = np.random.default_rng(7)
    n_hot, n_cold = 9000, 1000
    df = pd.DataFrame(
        {
            "k": np.array(["hot"] * n_hot + ["cold"] * n_cold),
            "o": np.concatenate([np.arange(n_hot), np.arange(n_cold)]),
            "v": rng.integers(-100, 1000, n_hot + n_cold),
        }
    )
    df["b"] = df["o"] // 250
    assert df.groupby(["k", "b"]).size().max() <= 250 < n_hot
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = (
        partitioned_running_sum(
            ds, key="k", order_cols=["o"], value_col="v",
            bucket_col="b", out_col="r",
        )
        .to_pandas()
        .sort_values(["k", "o"], ignore_index=True)
    )
    want = df.sort_values(["k", "o"], ignore_index=True)
    want["r"] = want.groupby("k", sort=False)["v"].cumsum()
    pd.testing.assert_frame_equal(got[["k", "o", "r"]], want[["k", "o", "r"]])


def test_grouped_exact_quantile_distributions(ray_session):
    """Exactness across distribution shapes and q values — heavy ties,
    integer-valued, bimodal, tiny groups, q near the edges."""
    import numpy as np
    import pandas as pd

    from logpipe_ray.stages.aggregate import grouped_exact_quantile

    rng = np.random.default_rng(31)
    groups = {
        "ties": np.repeat([1.0, 2.0, 3.0], [500, 400, 300]),
        "ints": rng.integers(0, 50, 3000).astype(float),
        "bimodal": np.concatenate(
            [rng.normal(-100, 1, 1500), rng.normal(100, 1, 1501)]
        ),
        "three": np.array([5.0, -2.0, 9.0]),
    }
    df = pd.DataFrame(
        {
            "k": np.concatenate([[k] * len(v) for k, v in groups.items()]),
            "v": np.concatenate(list(groups.values())),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        got = grouped_exact_quantile(
            ds, key="k", value_col="v", q=q, n_buckets=16, collect_limit=32,
            max_iters=30,
        ).to_pandas()
        want = {
            k: float(np.percentile(v, q * 100, method="linear"))
            for k, v in groups.items()
        }
        assert dict(zip(got["k"], got["quantile_value"])) == want, f"q={q}"


@pytest.mark.usefixtures("ray_session")
def test_global_shuffle_rank_exact_and_deterministic():
    """Rank equals the brute-force (hash, id) sort position; identical
    across partitionings; different seeds give different permutations."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd
    from logpipe_ray.functions.sampling import (
        HASH_B,
        HASH_M,
        _seed_mult,
        global_shuffle_rank,
    )

    ids = np.arange(1000, dtype=np.int64) * 7 + 3
    t = pa.table({"doc_id": pa.array(ids)})

    def brute(seed):
        h = (ids * _seed_mult(seed) + HASH_B) % HASH_M
        order = np.lexsort((ids, h))
        rank = np.empty(len(ids), np.int64)
        rank[order] = np.arange(len(ids))
        return dict(zip(ids.tolist(), rank.tolist()))

    for blocks in (1, 7):
        ds = rd.from_arrow(t).repartition(blocks)
        got = global_shuffle_rank(ds, seed=5, n_buckets=16).to_pandas()
        expect = brute(5)
        assert {
            int(r.doc_id): int(r.shuffle_rank) for r in got.itertuples()
        } == expect

    r5 = global_shuffle_rank(rd.from_arrow(t), seed=5, n_buckets=16).to_pandas()
    r6 = global_shuffle_rank(rd.from_arrow(t), seed=6, n_buckets=16).to_pandas()
    m5 = r5.set_index("doc_id")["shuffle_rank"]
    m6 = r6.set_index("doc_id")["shuffle_rank"]
    assert (m5 != m6.loc[m5.index]).any()


def test_ntile_summary_tie_runs(ray_session):
    """Tile boundaries inside tie-runs: counts and ranges match the
    window-function NTILE regardless of which tied rows cross."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from logpipe_ray.stages.aggregate import ntile_summary

    vals = [5] * 7 + [9] * 6 + [2] * 4 + [11] * 6  # 23 rows, heavy ties
    tbl = pa.table(
        {"doc_id": list(range(len(vals))), "n_chars": pa.array(vals, pa.int64())}
    )
    out = (
        ntile_summary(rd.from_arrow(tbl), "n_chars", n_tiles=4)
        .to_pandas()
        .sort_values("tile")
        .reset_index(drop=True)
    )
    ref = duckdb.sql(
        """
        WITH t AS (SELECT n_chars,
                          NTILE(4) OVER (ORDER BY n_chars, doc_id) AS tile
                   FROM tbl)
        SELECT CAST(tile AS BIGINT) AS tile, count(*) AS n_rows,
               CAST(min(n_chars) AS BIGINT) AS lo,
               CAST(max(n_chars) AS BIGINT) AS hi
        FROM t GROUP BY tile ORDER BY tile"""
    ).df()
    assert out["n_rows"].tolist() == ref["n_rows"].tolist()
    assert out["lo"].tolist() == ref["lo"].tolist()
    assert out["hi"].tolist() == ref["hi"].tolist()


def test_exact_rank_value_floats_and_ints(ray_session):
    """Distributed single-rank selection == np.sort at every probed
    rank, with a collect_limit small enough to force histogram
    iterations; int columns keep their dtype through the null-sentinel
    resolution path."""
    import numpy as np

    from logpipe_ray.stages.aggregate import exact_rank_value

    rng = np.random.default_rng(7)
    vals = rng.normal(size=6000)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(8)
    sv = np.sort(vals)
    for r in [0, 1, 2999, 3000, 5998, 5999]:
        assert exact_rank_value(ds, "v", r, collect_limit=64) == sv[r]

    iv = rng.integers(0, 40, size=4000)  # heavy ties
    dsi = rd.from_arrow(pa.table({"v": iv})).repartition(5)
    si = np.sort(iv)
    for r in [0, 123, 2000, 3999]:
        got = exact_rank_value(dsi, "v", r, collect_limit=64)
        assert got == si[r] and isinstance(got, int)

    with pytest.raises(ValueError):
        exact_rank_value(dsi, "v", 4000)


def test_global_topk_filter_exact_under_mass_ties(ray_session):
    """k best rows by (score DESC, id ASC) == pandas row_number()<=k,
    on a score column with huge tie groups so the tiebreak selection
    path does real work. Result is partition-layout invariant."""
    import numpy as np
    import pandas as pd

    from logpipe_ray.stages.aggregate import global_topk_filter

    rng = np.random.default_rng(3)
    score = rng.integers(0, 8, size=5000).astype(float)  # ~625 ties/value
    ids = rng.permutation(5000)
    ref = (
        pd.DataFrame({"id": ids, "s": score})
        .sort_values(["s", "id"], ascending=[False, True])
        .head(1234)
    )
    for nparts in (3, 11):
        ds = rd.from_arrow(pa.table({"id": ids, "s": score})).repartition(nparts)
        out = global_topk_filter(ds, "s", "id", 1234, collect_limit=64).to_pandas()
        assert len(out) == 1234
        assert set(zip(out.id, out.s)) == set(zip(ref.id, ref.s))

    # degenerate k
    ds = rd.from_arrow(pa.table({"id": ids, "s": score})).repartition(4)
    assert global_topk_filter(ds, "s", "id", 0).count() == 0
    assert global_topk_filter(ds, "s", "id", 5000).count() == 5000


def test_latest_by_key_matches_pandas_and_bounds_groups(ray_session):
    """Two-level argmax == pandas drop_duplicates on the sorted frame,
    including a 90%-hot key; the partial pass guarantees each reducer
    group holds <= one row per block."""
    import numpy as np
    import pandas as pd

    from logpipe_ray.stages.aggregate import latest_by_key

    rng = np.random.default_rng(11)
    n = 9000
    uid = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 200, size=n))
    ts = rng.integers(0, 10**7, size=n)
    eid = np.arange(n)
    payload = np.array(["x", "y", "z"])[rng.integers(0, 3, size=n)]
    t = pa.table({"u": uid, "ts": ts, "eid": eid, "p": payload})
    nparts = 9
    ds = rd.from_arrow(t).repartition(nparts)
    out = (
        latest_by_key(ds, "u", ["ts", "eid"])
        .to_pandas().sort_values("u").reset_index(drop=True)
    )
    ref = (
        pd.DataFrame({"u": uid, "ts": ts, "eid": eid, "p": payload})
        .sort_values(["u", "ts", "eid"], ascending=[True, False, False])
        .drop_duplicates("u").sort_values("u").reset_index(drop=True)
    )
    assert (out[["u", "ts", "eid"]].values == ref[["u", "ts", "eid"]].values).all()
    assert (out["p"].values == ref["p"].values).all()
    assert len(out) == len(ref)


def test_grouped_exact_quantile_single_upstream_execution(ray_session):
    """The selection's refinement passes must re-scan the MATERIALIZED
    2-column projection, not re-execute the upstream: a counting UDF
    upstream of the quantile must run once per input block, not once
    per histogram pass (the global_topk_filter bug class, VERDICT r3
    "What's wrong #5")."""
    import numpy as np
    import ray

    from logpipe_ray.stages.aggregate import grouped_exact_quantile

    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def inc(self):
            self.n += 1

        def get(self):
            return self.n

    c = Counter.remote()

    def costly(t: pa.Table) -> pa.Table:
        ray.get(c.inc.remote())
        return t

    rng = np.random.default_rng(3)
    k = rng.integers(0, 4, 20_000)
    v = rng.normal(size=20_000)
    ds = (
        rd.from_arrow(pa.table({"k": k.astype("str"), "v": v}))
        .repartition(4)
        .map_batches(costly, batch_format="pyarrow")
    )
    got = grouped_exact_quantile(ds, "k", "v", q=0.5, collect_limit=512)
    calls = ray.get(c.get.remote())
    # one materialization = one call per input block (4), regardless of
    # how many refinement + collect passes the selection runs
    assert calls <= 5, f"upstream executed {calls} times"
    import pandas as pd

    want = (
        pd.DataFrame({"k": k.astype("str"), "v": v})
        .groupby("k")["v"].quantile(0.5)
    )
    gdf = got.to_pandas().set_index("k")
    for kk, wv in want.items():
        assert abs(gdf.loc[kk].iloc[0] - wv) < 1e-12
