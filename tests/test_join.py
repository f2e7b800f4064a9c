import pyarrow as pa

import ray.data as rd

from logpipe_ray.stages.join import cogroup_join_aggregate


def test_cogroup_join_matches_pandas(ray_session):
    import pandas as pd

    left = pd.DataFrame({"k": [1, 2, 3, 4], "name": ["a", "b", "c", "d"]})
    right = pd.DataFrame(
        {"k": [1, 1, 2, 2, 2, 5], "v": [10.0, 20.0, 1.0, 2.0, 3.0, 99.0]}
    )

    def per_key(l, r):
        if len(l) == 0 or len(r) == 0:
            return None
        return {"name": l["name"].iloc[0], "total": float(r["v"].sum()), "n": len(r)}

    out = cogroup_join_aggregate(
        rd.from_pandas(left),
        rd.from_pandas(right),
        "k",
        {"name": pa.string()},
        {"v": pa.float64()},
        per_key,
    ).to_pandas()
    got = {r["k"]: (r["name"], r["total"], r["n"]) for _, r in out.iterrows()}
    # inner-join semantics: keys 3,4 (no right rows) and 5 (no left) dropped
    assert got == {1: ("a", 30.0, 2), 2: ("b", 6.0, 3)}


def test_asof_join_degenerate_keys(ray_session):
    import pandas as pd
    import pyarrow as pa2

    from logpipe_ray.stages.join import asof_join

    # user 1: normal; user 2: right-only (clicks, no purchases);
    # user 3: left-only (purchases, no clicks)
    left = pd.DataFrame({"k": [1, 3], "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]), "lv": [10, 30]})
    right = pd.DataFrame({"k": [1, 2], "ts": pd.to_datetime(["2024-01-01", "2024-01-01"]), "rv": [1.5, 2.5]})
    out = asof_join(
        rd.from_pandas(left), rd.from_pandas(right), "k", "ts",
        {"lv": pa2.int64()}, {"rv": pa2.float64()},
    ).to_pandas()
    by_k = out.set_index("k")
    assert by_k.loc[1, "rv"] == 1.5
    assert pd.isna(by_k.loc[3, "rv"])  # left-only -> typed null
    assert 2 not in by_k.index  # right-only key contributes no rows


def test_semi_join_null_keys_dropped(ray_session):
    import ray as _ray
    import pyarrow as pa2

    from logpipe_ray.stages.join import semi_join_filter

    t = pa.table({"k": pa.array([1, 2, None, 3], pa.int64())})
    ref = _ray.put(pa2.array([1, 2], pa2.int64()))
    ds = rd.from_arrow(t)
    semi = semi_join_filter(ds, "k", ref).to_pandas()
    anti = semi_join_filter(ds, "k", ref, anti=True).to_pandas()
    assert sorted(semi["k"]) == [1, 2]
    assert sorted(anti["k"]) == [3]  # NULL NOT IN (...) -> dropped


def test_range_join_overlapping_intervals(ray_session):
    """Bucketed interval join vs brute-force cross check: overlapping
    intervals, values on bucket edges, both closed modes."""
    import numpy as np

    from logpipe_ray.stages.join import range_join

    rng = np.random.default_rng(2)
    vals = np.concatenate([rng.uniform(0, 100, 2000), [0.0, 10.0, 50.0, 99.9]])
    left = pa.table({"id": pa.array(np.arange(len(vals))), "v": pa.array(vals)})
    lo = np.concatenate([rng.uniform(0, 90, 40), [10.0]])
    hi = np.concatenate([lo[:40] + rng.uniform(0.5, 25, 40), [20.0]])
    right = pa.table(
        {"band": pa.array(np.arange(len(lo))), "lo": pa.array(lo), "hi": pa.array(hi)}
    )
    for closed, op in (("left", np.less), ("both", np.less_equal)):
        m = (vals[:, None] >= lo[None, :]) & op(vals[:, None], hi[None, :])
        ii, jj = np.nonzero(m)
        want = set(zip(ii.tolist(), jj.tolist()))
        for blim in (100_000, 0):  # broadcast plan AND co-partitioned plan
            out = range_join(
                rd.from_arrow(left), rd.from_arrow(right), "v", ("lo", "hi"),
                bucket_width=10.0, closed=closed, broadcast_limit_rows=blim,
            ).to_pandas()
            assert set(zip(out["id"], out["band"])) == want
            assert len(out) == m.sum()  # exactly-once, no dup pass needed


def test_full_outer_merge_matches_duckdb(ray_session):
    """FULL OUTER of two keyed aggregates: every key from either side,
    absent side filled; int columns keep int64 through the typed-null
    union."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from logpipe_ray.stages.join import full_outer_merge

    l = rd.from_arrow(
        pa.table({"k": [1, 2, 3, 7], "a": [10, 20, 30, 70]})
    ).repartition(3)
    r = rd.from_arrow(
        pa.table({"k": [2, 3, 4, 9], "b": [200, 300, 400, 900]})
    ).repartition(2)
    outs = {}
    for label, kw in (("driver", {}), ("distributed", {"driver_limit": 0})):
        outs[label] = (
            full_outer_merge(
                l, r, "k", {"a": pa.int64()}, {"b": pa.int64()}, fill=0, **kw
            )
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
    out = outs["driver"]
    ref = duckdb.sql(
        """
        WITH l(k, a) AS (VALUES (1,10),(2,20),(3,30),(7,70)),
             r(k, b) AS (VALUES (2,200),(3,300),(4,400),(9,900))
        SELECT coalesce(l.k, r.k) AS k, coalesce(a, 0) AS a,
               coalesce(b, 0) AS b
        FROM l FULL OUTER JOIN r ON l.k = r.k ORDER BY k
        """
    ).df()
    assert out["k"].tolist() == ref["k"].tolist()
    assert out["a"].tolist() == ref["a"].tolist()
    assert out["b"].tolist() == ref["b"].tolist()
    assert str(out["a"].dtype) == "int64" and str(out["b"].dtype) == "int64"
    # distributed route (forced) is identical, schema included
    d = outs["distributed"]
    assert d["k"].tolist() == ref["k"].tolist()
    assert d["a"].tolist() == ref["a"].tolist()
    assert d["b"].tolist() == ref["b"].tolist()
    assert str(d["a"].dtype) == "int64" and str(d["b"].dtype) == "int64"


def test_skew_join_planted_hot_key(ray_session):
    """95%-hot-key fact many-to-many joined against a dimension ==
    DuckDB inner join; both the broadcast-hot and native-cold routes
    carry rows; no-hot-keys threshold degrades to the pure native
    join."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from logpipe_ray.stages.join import skew_join

    rng = np.random.default_rng(5)
    n = 20_000
    k = np.where(rng.random(n) < 0.95, 7, rng.integers(0, 50, size=n))
    v = rng.integers(0, 1000, size=n)
    fact_t = pa.table({"k": k, "v": v})
    # dim: keys 0..39 only (some fact keys unmatched), key 7 has THREE
    # rows (many-to-many through the hot route)
    dk = np.concatenate([np.arange(40), [7, 7]])
    dv = np.concatenate([np.arange(40) * 10, [999, 998]])
    dlab = np.array([f"d{i}" for i in dk])
    dim_t = pa.table({"dk": dk, "dv": dv, "lab": dlab})

    ref = duckdb.sql(
        """
        SELECT f.k, f.v, d.dv, d.lab
        FROM fact_t f JOIN dim_t d ON f.k = d.dk
        """
    ).arrow()

    fact = rd.from_arrow(fact_t).repartition(8)
    dim = rd.from_arrow(dim_t).repartition(2)
    refp = ref.to_pandas()
    key_of = lambda df: sorted(zip(df.k, df.v, df.dv, df.lab))

    # route 1 (default): small dim -> broadcast fast path, no shuffle
    out = skew_join(
        fact, dim, "k", "dk", ["dv", "lab"], hot_threshold=1000
    ).to_pandas()
    assert len(out) == len(refp)
    assert key_of(out) == key_of(refp)
    # hot key's many-to-many expansion is exact
    assert (out.k == 7).sum() == (refp.k == 7).sum() > 0.9 * len(refp) / 3

    # route 2: forced skew split (broadcast guard off) — hot keys via
    # the map-join, cold residual via the native hash join
    out2 = skew_join(
        fact, dim, "k", "dk", ["dv", "lab"],
        hot_threshold=1000, dim_broadcast_rows=0,
    ).to_pandas()
    assert key_of(out2) == key_of(refp)

    # route 3: no hot keys -> pure native hash join
    out3 = skew_join(
        fact, dim, "k", "dk", ["dv", "lab"],
        hot_threshold=10**9, dim_broadcast_rows=0,
    ).to_pandas()
    assert key_of(out3) == key_of(refp)

    # guard: hot dim slice larger than the limit raises
    import pytest as _pytest

    with _pytest.raises(ValueError, match="dim_hot_limit"):
        skew_join(
            fact, dim, "k", "dk", ["dv", "lab"],
            hot_threshold=1000, dim_hot_limit=1, dim_broadcast_rows=0,
        ).materialize()


def test_skew_join_string_keys_and_null_facts(ray_session):
    """String join keys work through every route (is_in + searchsorted
    on object arrays), and null fact keys are dropped like an inner
    join."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from logpipe_ray.stages.join import skew_join

    fk = (["hot"] * 400 + ["a", "b", "c", "zz"] * 25 + [None] * 7)
    fact_t = pa.table({"k": fk, "v": list(range(len(fk)))})
    dim_t = pa.table(
        {"dk": ["hot", "a", "b", "x"], "tag": ["H", "A", "B", "X"]}
    )
    ref = duckdb.sql(
        "SELECT f.k, f.v, d.tag FROM fact_t f JOIN dim_t d ON f.k = d.dk"
    ).df()
    fact = rd.from_arrow(fact_t).repartition(5)
    dim = rd.from_arrow(dim_t).repartition(1)
    key_of = lambda df: sorted(zip(df.k, df.v, df.tag))
    for kw in (
        {},                                     # broadcast route
        {"dim_broadcast_rows": 0},              # skew split route
        {"dim_broadcast_rows": 0, "hot_threshold": 10**9},  # native
    ):
        out = skew_join(
            fact, dim, "k", "dk", ["tag"],
            hot_threshold=kw.pop("hot_threshold", 100), **kw,
        ).to_pandas()
        assert key_of(out) == key_of(ref), kw


def test_inner_join_safe_survives_empty_filtered_blocks(ray_session):
    """Minimal repro of the Ray 2.49 hazard: a block an upstream
    filter empties poisons Dataset.join's partition schema on either
    side; inner_join_safe launders it."""
    import pyarrow.compute as pc

    from logpipe_ray.stages.join import inner_join_safe

    t1 = pa.table({"k": ["hot"] * 50, "v": list(range(50))})
    t2 = pa.table({"k": ["a", "b", "c", "zz"] * 25, "v": list(range(100))})
    drop_hot = lambda t: t.filter(
        pc.invert(pc.is_in(t["k"], value_set=pa.array(["hot"])))
    )
    left = rd.from_arrow([t1, t2]).map_batches(drop_hot, batch_format="pyarrow")
    right = rd.from_arrow(pa.table({"rk": ["a", "b", "x"], "tag": ["A", "B", "X"]}))
    out = inner_join_safe(
        left, right, on=("k",), right_on=("rk",), num_partitions=4
    ).to_pandas()
    assert sorted(zip(out.k, out.tag)) == sorted(
        [("a", "A")] * 25 + [("b", "B")] * 25
    )

    # and with the 0-row block on the RIGHT side
    rightf = rd.from_arrow(
        [pa.table({"rk": ["hot"] * 10, "tag": ["H"] * 10}), 
         pa.table({"rk": ["a", "x"], "tag": ["A", "X"]})]
    ).map_batches(
        lambda t: t.filter(pc.invert(pc.is_in(t["rk"], value_set=pa.array(["hot"])))),
        batch_format="pyarrow",
    )
    left2 = rd.from_arrow(t2)
    out2 = inner_join_safe(
        left2, rightf, on=("k",), right_on=("rk",), num_partitions=4
    ).to_pandas()
    assert sorted(zip(out2.k, out2.tag)) == sorted([("a", "A")] * 25)


def test_window_join_matches_duckdb_with_boundaries(ray_session):
    """Bucketed windowed join == DuckDB BETWEEN join, including pairs
    exactly AT the window edge, at bucket boundaries, ts ties, and
    multi-match fan-out; exactly-once (no replica double-count)."""
    import duckdb
    import numpy as np

    from logpipe_ray.stages.join import window_join

    W = 100  # window in "us"
    rng = np.random.default_rng(9)
    n_l, n_r = 300, 500
    lt = pa.table(
        {
            "u": rng.integers(0, 8, size=n_l),
            "lid": np.arange(n_l),
            "lts": rng.integers(0, 2000, size=n_l).astype(np.int64),
        }
    )
    # plant exact-boundary cases for user 0: right at lts, lts-W, lts-W-1
    lt = pa.concat_tables(
        [lt, pa.table({"u": [0], "lid": [9000], "lts": [1000]})]
    )
    rt = pa.table(
        {
            "u": np.concatenate([rng.integers(0, 8, size=n_r), [0, 0, 0]]),
            "rid": np.concatenate([np.arange(n_r) + 10_000, [1, 2, 3]]),
            "rts": np.concatenate(
                [rng.integers(0, 2000, size=n_r).astype(np.int64),
                 [1000, 900, 899]]
            ),
        }
    )
    ref = duckdb.sql(
        f"""
        SELECT l.u, l.lid, l.lts, r.rid, r.rts
        FROM lt l JOIN rt r
          ON l.u = r.u AND r.rts <= l.lts AND r.rts >= l.lts - {W}
        """
    ).df()
    out = window_join(
        rd.from_arrow(lt).repartition(4),
        rd.from_arrow(rt).repartition(3),
        key="u", left_ts="lts", right_ts="rts", window_us=W,
        num_partitions=4,
    ).to_pandas()
    kf = lambda df: sorted(zip(df.u, df.lid, df.lts, df.rid, df.rts))
    assert len(out) == len(ref)
    assert kf(out) == kf(ref)
    # the planted boundary triple: rts=1000 and 900 match lid 9000
    # (inclusive both ends), 899 does not
    got = set(out[out.lid == 9000].rid)
    assert {1, 2} <= got and 3 not in got


def test_skew_join_empty_route_edges(ray_session):
    """Routes that would hand an empty input to the hash join are
    short-circuited: all-hot fact (empty cold), hot keys with no dim
    rows, empty fact, empty dim. Empty results keep the output schema
    at the Dataset level (Ray's to_pandas drops columns on empty —
    assert via schema, not pandas)."""
    import pyarrow as pa
    import ray.data as rd

    from logpipe_ray.stages.join import skew_join

    fact = rd.from_arrow(
        pa.table({"k": [7] * 500, "v": list(range(500))})
    ).repartition(4)
    dim = rd.from_arrow(pa.table({"dk": [7, 8], "lab": ["H", "X"]}))

    # all rows hot -> cold join skipped, hot route alone answers
    out = skew_join(
        fact, dim, "k", "dk", ["lab"],
        hot_threshold=10, dim_broadcast_rows=0,
    ).to_pandas()
    assert len(out) == 500 and set(out.lab) == {"H"}

    # hot keys exist but dim has no rows for them -> cold-only
    f2 = rd.from_arrow(
        pa.table({"k": [99] * 300 + [7] * 10, "v": list(range(310))})
    ).repartition(3)
    out = skew_join(
        f2, dim, "k", "dk", ["lab"],
        hot_threshold=50, dim_broadcast_rows=0,
    ).to_pandas()
    assert len(out) == 10 and set(out.k) == {7}

    # empty fact / empty dim -> empty result with full output schema
    ef = rd.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    )
    ed = rd.from_arrow(
        pa.table({"dk": pa.array([], pa.int64()), "lab": pa.array([], pa.string())})
    )
    for f, d in ((ef, dim), (fact, ed)):
        res = skew_join(
            f, d, "k", "dk", ["lab"], hot_threshold=10, dim_broadcast_rows=0
        )
        assert res.count() == 0
        assert res.schema().names == ["k", "v", "lab"]


def test_asof_join_planted_hot_key(ray_session):
    """90%-hot-key as-of join: the (key, ts // W) bucketing must (a)
    equal the whole-history pd.merge_asof reference exactly — ts ties
    broken by max tiebreak, carries crossing long runs of empty
    buckets (the hot key's right rows stop at half-time) — and (b)
    never hand any reducer the hot key's full history: reducer
    granularity is (key, bucket) and the hot key spans hundreds of
    buckets with a bounded per-bucket row count."""
    import numpy as np
    import pandas as pd

    from logpipe_ray.stages.join import asof_join

    rng = np.random.default_rng(11)
    W = 100
    n_hot, n_cold = 4000, 500
    lk = np.concatenate([np.zeros(n_hot, np.int64), rng.integers(1, 40, n_cold)])
    lts = rng.integers(0, 40_000, n_hot + n_cold)
    # hot key's right rows live ONLY in the first half of the span, so
    # every later left bucket depends on a carry across empty buckets
    rk = np.concatenate([np.zeros(1500, np.int64), rng.integers(1, 40, 300)])
    rts = np.concatenate(
        [rng.integers(0, 20_000, 1500), rng.integers(0, 40_000, 300)]
    )
    rv = np.arange(len(rk), dtype=np.int64)

    # structural bound: the hot key spreads over many (key, bucket)
    # reduce units, none holding more than a sliver of its history
    hot_b = pd.Series(lts[:n_hot] // W)
    assert hot_b.nunique() > 100
    assert hot_b.value_counts().max() < n_hot / 20

    left = rd.from_arrow(
        pa.table({"k": lk, "ts": lts.astype(np.int64),
                  "lid": np.arange(len(lk))})
    ).repartition(5)
    right = rd.from_arrow(
        pa.table({"k": rk, "ts": rts.astype(np.int64), "rv": rv, "tb": rv})
    ).repartition(3)
    out = asof_join(
        left, right, "k", "ts",
        {"lid": pa.int64()}, {"rv": pa.int64(), "tb": pa.int64()},
        tiebreak="tb", bucket_width_us=W,
    ).to_pandas()

    ldf = pd.DataFrame(
        {"k": lk, "ts": lts, "lid": np.arange(len(lk))}
    ).sort_values("ts", kind="stable")
    rdf = pd.DataFrame({"k": rk, "ts": rts, "rv": rv, "tb": rv}).sort_values(
        ["ts", "tb"], kind="stable"
    )
    want = pd.merge_asof(ldf, rdf, on="ts", by="k", direction="backward")
    got = out.sort_values("lid", ignore_index=True)
    want = want.sort_values("lid", ignore_index=True)
    assert len(got) == len(lk)
    assert got["lid"].tolist() == want["lid"].tolist()
    assert np.allclose(
        got["rv"].to_numpy(float), want["rv"].to_numpy(float), equal_nan=True
    )


def test_asof_join_carry_route_equivalence(ray_session):
    """The driver carry-build fast path (partials under the guard) and
    the distributed groupby(key) route must be identical — forced via
    carry_driver_limit=0.

    ``tiebreak`` is REQUIRED for the equality to be well-defined: 500
    right rows over 5000 ts values collide (birthday bound), and the
    asof contract resolves exact-ts ties arbitrarily without a
    tiebreak (block-arrival order differs per route). ``rv`` is unique
    so max-rv-wins makes both routes and the reference deterministic."""
    import numpy as np
    import pandas as pd

    from logpipe_ray.stages.join import asof_join

    rng = np.random.default_rng(23)
    n, m = 800, 500
    lk = rng.integers(0, 20, n)
    lts = rng.integers(0, 5000, n)
    rk = rng.integers(0, 20, m)
    rts = rng.integers(0, 5000, m)
    rv = np.arange(m, dtype=np.int64)
    left = rd.from_arrow(
        pa.table({"k": lk, "ts": lts.astype(np.int64), "lid": np.arange(n)})
    ).repartition(4)
    right = rd.from_arrow(
        pa.table({"k": rk, "ts": rts.astype(np.int64), "rv": rv})
    ).repartition(3)
    outs = []
    for lim in (2_000_000, 0):
        o = asof_join(
            left, right, "k", "ts", {"lid": pa.int64()}, {"rv": pa.int64()},
            tiebreak="rv", bucket_width_us=64, carry_driver_limit=lim,
        ).to_pandas().sort_values("lid", ignore_index=True)
        outs.append(o)
    a, b = outs
    assert a["lid"].tolist() == b["lid"].tolist()
    assert np.allclose(
        a["rv"].to_numpy(float), b["rv"].to_numpy(float), equal_nan=True
    )
    # and both equal the whole-history reference with the same tie
    # semantics (merge_asof picks the LAST of equal-ts rows, so sorting
    # by (ts, rv) makes max-rv win there too)
    ldf = pd.DataFrame({"k": lk, "ts": lts, "lid": np.arange(n)}).sort_values(
        "ts", kind="stable"
    )
    rdf = pd.DataFrame({"k": rk, "ts": rts, "rv": rv}).sort_values(
        ["ts", "rv"], kind="stable"
    )
    want = pd.merge_asof(ldf, rdf, on="ts", by="k").sort_values(
        "lid", ignore_index=True
    )
    assert np.allclose(
        a["rv"].to_numpy(float), want["rv"].to_numpy(float), equal_nan=True
    )
