import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data as rd

from logpipe_ray.functions.sketches import (
    approx_distinct,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)


def test_exact_below_k():
    vals = pa.array([f"v{i}" for i in range(100)] * 3)
    sk = kmv_sketch(vals, k=1024)
    assert kmv_estimate(sk, k=1024) == 100.0


def test_estimate_accuracy():
    rng = np.random.default_rng(1)
    vals = pa.array([f"user-{rng.integers(0, 50_000)}" for _ in range(200_000)])
    true = len(set(vals.to_pylist()))
    est = kmv_estimate(kmv_sketch(vals, k=1024), k=1024)
    assert abs(est - true) / true < 0.10


@given(st.lists(st.lists(st.integers(0, 5000), max_size=300), max_size=6))
@settings(max_examples=30, deadline=None)
def test_merge_equals_union(parts):
    k = 64
    sketches = [kmv_sketch(pa.array([f"x{v}" for v in p], pa.string()), k) for p in parts]
    merged = kmv_merge(sketches, k)
    all_vals = pa.array([f"x{v}" for p in parts for v in p], pa.string())
    direct = kmv_sketch(all_vals, k)
    assert np.array_equal(merged, direct)  # merge == sketch-of-union


def test_distributed_approx_distinct(ray_session):
    ds = rd.from_items([{"u": f"user-{i % 777}"} for i in range(20_000)])
    est = approx_distinct(ds, "u", k=512)
    assert abs(est - 777) / 777 < 0.12


def test_kmv_excludes_nulls():
    vals = pa.array(["a", "b", None, "a", None], pa.string())
    est = kmv_estimate(kmv_sketch(vals, k=64), k=64)
    assert est == 2.0  # COUNT(DISTINCT) semantics: nulls excluded


def test_quantile_sketch_accuracy(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from logpipe_ray.functions.sketches import approx_quantiles

    rng = np.random.default_rng(7)
    vals = rng.lognormal(3.0, 1.0, 50_000)  # skewed
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(16)
    qs = [0.5, 0.9, 0.99]
    got = approx_quantiles(ds, "v", qs, buckets=256)
    # the sketch guarantee is on RANK error (heavy tails amplify value
    # error arbitrarily): the returned value's true rank must be within
    # 1% of the requested rank
    sv = np.sort(vals)
    for q, g in zip(qs, got):
        true_rank = np.searchsorted(sv, g) / len(sv)
        assert abs(true_rank - q) < 0.01


def test_quantile_sketch_exact_small():
    import numpy as np
    import pyarrow as pa

    from logpipe_ray.functions.sketches import (
        quantile_merge_query,
        quantile_sketch,
    )

    v = pa.array([5.0, 1.0, 3.0, 2.0, 4.0])
    part = quantile_sketch(v, buckets=256)  # n <= buckets: exact
    assert quantile_merge_query([part], [0.5]) == [3.0]
    assert quantile_merge_query([part], [1.0]) == [5.0]


def test_heavy_hitters_exact_topk(ray_session):
    """Forced MG compression (capacity << distinct keys): result must
    equal the exact top-k with deterministic tiebreaks; the
    provably-exact guard must raise when capacity is hopeless."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from logpipe_ray.functions.sketches import heavy_hitters_topk

    rng = np.random.default_rng(13)
    # zipf-ish: heavy keys 0..9, long uniform tail 10..2009
    heavy = np.repeat(np.arange(10), (10 - np.arange(10)) * 500)
    tail = rng.integers(10, 2010, 30_000)
    keys = np.concatenate([heavy, tail])
    rng.shuffle(keys)
    df = pd.DataFrame({"user_id": keys.astype(np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(8)

    got = heavy_hitters_topk(ds, "user_id", k=10, capacity=64).to_pandas()
    want = (
        df.groupby("user_id").size().reset_index(name="cnt")
        .sort_values(["cnt", "user_id"], ascending=[False, True],
                     kind="mergesort")
        .head(10)
        .reset_index(drop=True)
    )
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["cnt"].tolist() == want["cnt"].tolist()

    # uniform data with k-th count below the decrement bound: the
    # exactness guard must refuse rather than silently approximate
    uni = pd.DataFrame({"user_id": rng.integers(0, 5000, 20_000)})
    ds_u = rd.from_arrow(pa.Table.from_pandas(uni, preserve_index=False)).repartition(8)
    with pytest.raises(RuntimeError, match="not provably exact"):
        heavy_hitters_topk(ds_u, "user_id", k=10, capacity=16)


def test_grouped_approx_distinct_exact_below_k_and_bounded_error(ray_session):
    """Per-group KMV: exact when group distincts < k; error within
    ~3/sqrt(k) above k; layout-invariant."""
    import numpy as np
    import ray.data as rd

    from logpipe_ray.functions.sketches import grouped_approx_distinct

    rng = np.random.default_rng(21)
    # group A: 150 distinct (< k=256 -> exact); group B: 20_000 (> k)
    ga = rng.integers(0, 150, size=5000)
    gb = rng.integers(0, 20_000, size=40_000)
    g = np.array(["A"] * len(ga) + ["B"] * len(gb))
    v = np.concatenate([ga, gb])
    t = pa.table({"g": g, "v": v})
    for nparts in (2, 7):
        out = (
            grouped_approx_distinct(
                rd.from_arrow(t).repartition(nparts), "g", "v", k=256
            )
            .to_pandas().set_index("g")["approx_distinct"]
        )
        assert out["A"] == float(len(np.unique(ga)))  # exact below k
        true_b = len(np.unique(gb))
        assert abs(out["B"] - true_b) / true_b < 3 / np.sqrt(256)


def test_bloom_membership_no_false_negatives():
    from logpipe_ray.functions.sketches import (
        bloom_maybe_contains,
        bloom_partial,
    )

    rng = np.random.default_rng(5)
    m, k = 1 << 16, 4
    members = rng.integers(0, 2**62, size=5000).astype(np.uint64)
    packed = bloom_partial(members, m, k)
    # zero false negatives, ever
    assert bloom_maybe_contains(members, packed, m, k).all()
    # false-positive rate on non-members stays near theory (~(1-e^-kn/m)^k)
    probe = rng.integers(0, 2**62, size=20000).astype(np.uint64)
    probe = np.setdiff1d(probe, members)
    fp = bloom_maybe_contains(probe, packed, m, k).mean()
    assert fp < 0.15, fp


def test_bloom_partials_merge_to_same_filter():
    from logpipe_ray.functions.sketches import bloom_partial

    rng = np.random.default_rng(6)
    keys = rng.integers(0, 2**62, size=3000).astype(np.uint64)
    m, k = 1 << 14, 3
    whole = bloom_partial(keys, m, k)
    merged = bloom_partial(keys[:1000], m, k)
    merged = merged | bloom_partial(keys[1000:2200], m, k)
    merged = merged | bloom_partial(keys[2200:], m, k)
    assert np.array_equal(whole, merged)


def test_bloom_semi_join_exact_vs_broadcast(ray_session):
    """bloom_semi_join == broadcast semi_join_filter row sets, and the
    pre-filter really removes most non-members before the shuffle."""
    import ray

    from logpipe_ray.functions.sketches import (
        bloom_build_ds,
        bloom_maybe_contains,
        bloom_semi_join,
    )
    from logpipe_ray.stages.join import semi_join_filter

    rng = np.random.default_rng(7)
    left_keys = rng.integers(0, 100_000, size=20_000)
    member_keys = np.unique(rng.integers(0, 100_000, size=500))
    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(left_keys, pa.int64()),
                "row": pa.array(np.arange(len(left_keys)), pa.int64()),
            }
        )
    ).repartition(4)
    keys_ds = rd.from_arrow(
        pa.table({"mk": pa.array(member_keys, pa.int64())})
    ).repartition(2)

    got = bloom_semi_join(left, "k", keys_ds, "mk", m_bits=1 << 16)
    got_rows = sorted(
        r
        for t in ray.get(got.to_arrow_refs())
        if t.num_columns
        for r in t["row"].to_pylist()
    )
    ref = semi_join_filter(left, "k", ray.put(pa.array(member_keys, pa.int64())))
    ref_rows = sorted(
        r
        for t in ray.get(ref.to_arrow_refs())
        if t.num_columns
        for r in t["row"].to_pylist()
    )
    assert got_rows == ref_rows and len(got_rows) > 0

    # the pre-filter does real work: survivors << left rows
    packed = bloom_build_ds(keys_ds, "mk", 1 << 16, 4)
    keep = bloom_maybe_contains(left_keys.astype(np.uint64), packed, 1 << 16, 4)
    true_members = np.isin(left_keys, member_keys)
    assert keep[true_members].all()
    assert keep.mean() < 0.25, keep.mean()
