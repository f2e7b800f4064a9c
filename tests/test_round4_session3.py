"""Round-4 session-3 additions: set operations (EXCEPT/INTERSECT),
grouped MAD, fixed-order grouped correlation, and the Q5/Q18
broadcast-vs-join route equivalences. Independent references are
pandas/numpy computations (DuckDB oracle parity is covered by
scripts/check_correctness.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _mk(tbls):
    return rd.from_arrow(tbls)


def test_except_intersect_vs_sets(ray_session):
    from logpipe_ray.stages.setops import except_distinct, intersect_distinct

    rng = np.random.RandomState(7)
    l = rng.randint(0, 40, 300)
    r = rng.randint(20, 60, 250)
    left = _mk(pa.table({"k": pa.array(l, pa.int64())})).repartition(5)
    right = _mk(pa.table({"k": pa.array(r, pa.int64())})).repartition(4)
    exc = set(
        except_distinct(left, right, ["k"]).to_pandas()["k"].tolist()
    )
    inter = set(
        intersect_distinct(left, right, ["k"]).to_pandas()["k"].tolist()
    )
    assert exc == set(l) - set(r)
    assert inter == set(l) & set(r)


def test_except_handles_filtered_empty_and_whole_empty_right(ray_session):
    from logpipe_ray.stages.setops import except_distinct

    left = _mk(pa.table({"k": pa.array([1, 2, 3, 4], pa.int64())})).repartition(3)
    # right filters every block to empty -> EXCEPT degenerates to
    # DISTINCT(left); the union must survive the 0-row blocks
    right = _mk(
        pa.table({"k": pa.array([10, 11], pa.int64())})
    ).map_batches(
        lambda t: t.filter(pc.less(t["k"], -1)), batch_format="pyarrow"
    )
    out = except_distinct(left, right, ["k"]).to_pandas()
    assert set(out["k"].tolist()) == {1, 2, 3, 4}


def test_except_multicol_keys_and_key_types(ray_session):
    from logpipe_ray.stages.setops import except_distinct

    ts = pa.array(
        [1_700_000_000_000_000, 1_700_086_400_000_000, 1_700_000_000_000_000],
        pa.timestamp("us"),
    )
    left = _mk(pa.table({"u": pa.array([1, 1, 2], pa.int64()), "d": ts}))
    right = _mk(
        pa.table(
            {
                "u": pa.array([1], pa.int64()),
                "d": pa.array([1_700_000_000_000_000], pa.timestamp("us")),
            }
        )
    )
    out = except_distinct(
        left, right, ["u", "d"], key_types={"d": pa.timestamp("us")}
    )
    tb = pa.concat_tables(
        [t for t in __import__("ray").get(out.to_arrow_refs()) if t.num_columns]
    )
    assert tb.schema.field("d").type == pa.timestamp("us")
    got = {(r["u"], r["d"]) for r in tb.to_pylist()}
    assert len(got) == 2 and all(u in (1, 2) for u, _ in got)


def test_grouped_mad_vs_pandas(ray_session):
    from logpipe_ray.stages.aggregate import grouped_mad

    rng = np.random.RandomState(3)
    k = rng.choice(["a", "b", "c"], 4001)
    v = np.round(rng.gamma(2.0, 50.0, 4001), 2)
    ds = _mk(pa.table({"g": k, "v": pa.array(v, pa.float64())})).repartition(6)
    out = grouped_mad(ds, "g", "v").to_pandas().set_index("g")["mad_value"]
    df = pd.DataFrame({"g": k, "v": v})
    med = df.groupby("g")["v"].median()
    ref = (
        df.assign(d=(df.v - df.g.map(med)).abs())
        .groupby("g")["d"]
        .median()
    )
    for g in ref.index:
        assert out[g] == ref[g], (g, out[g], ref[g])


def test_grouped_corr_fixed_vs_numpy(ray_session):
    from logpipe_ray.stages.aggregate import grouped_corr_fixed

    rng = np.random.RandomState(11)
    k = rng.choice(["p", "q"], 3000)
    x = rng.randint(1, 50_000, 3000).astype(np.int64)
    y = (x // 1000 + rng.randint(0, 24, 3000)).astype(np.int64)  # correlated
    ds = _mk(
        pa.table({"g": k, "x": pa.array(x), "y": pa.array(y)})
    ).repartition(5)
    out = (
        grouped_corr_fixed(ds, "g", "x", "y")
        .to_pandas()
        .set_index("g")["corr_xy"]
    )
    for g in ("p", "q"):
        m = k == g
        ref = np.corrcoef(x[m], y[m])[0, 1]
        assert abs(out[g] - ref) < 1e-9, (g, out[g], ref)


def test_grouped_corr_fixed_constant_column_is_null(ray_session):
    from logpipe_ray.stages.aggregate import grouped_corr_fixed

    ds = _mk(
        pa.table(
            {
                "g": ["c"] * 10,
                "x": pa.array([7] * 10, pa.int64()),
                "y": pa.array(list(range(10)), pa.int64()),
            }
        )
    )
    out = grouped_corr_fixed(ds, "g", "x", "y").to_pandas()
    assert len(out) == 1 and pd.isna(out["corr_xy"].iloc[0])


def test_q5_route_equivalence(ray_session):
    from logpipe_ray.queries import q5_local_supplier_volume

    fast = (
        q5_local_supplier_volume(SF)
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    # broadcast_limit=0 forces the two-hash-join 100-TB route
    slow = (
        q5_local_supplier_volume(SF, broadcast_limit=0)
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    assert len(fast) > 0
    pd.testing.assert_frame_equal(fast, slow)


def test_q18_route_equivalence(ray_session):
    from logpipe_ray.queries import q18_large_volume_orders

    fast = (
        q18_large_volume_orders(SF)
        .to_pandas()
        .sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        .reset_index(drop=True)
    )
    slow = (
        q18_large_volume_orders(SF, broadcast_limit=0)
        .to_pandas()
        .sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        .reset_index(drop=True)
    )
    assert len(fast) > 0
    pd.testing.assert_frame_equal(fast, slow)


def test_cube_agg_vs_pandas(ray_session):
    from logpipe_ray.stages.aggregate import cube_agg

    rng = np.random.RandomState(5)
    a = rng.choice(["x", "y"], 500)
    b = rng.choice(["p", "q", "r"], 500)
    v = rng.randint(1, 100, 500).astype(np.int64)
    ds = _mk(
        pa.table({"a": a, "b": b, "v": pa.array(v)})
    ).repartition(4)
    out = cube_agg(ds, ["a", "b"], sum_cols={"v": "sv"}).to_pandas()
    df = pd.DataFrame({"a": a, "b": b, "v": v})
    # 4 grouping sets: (a,b), (a), (b), ()
    assert len(out) == df.groupby(["a", "b"]).ngroups + 2 + 3 + 1
    leaf = out[out.a.notna() & out.b.notna()].set_index(["a", "b"])
    ref = df.groupby(["a", "b"]).agg(cnt=("v", "size"), sv=("v", "sum"))
    for idx, r in ref.iterrows():
        assert leaf.loc[idx, "cnt"] == r["cnt"]
        assert leaf.loc[idx, "sv"] == r["sv"]
    gt = out[out.a.isna() & out.b.isna()]
    assert int(gt["cnt"].iloc[0]) == 500 and int(gt["sv"].iloc[0]) == v.sum()
    bonly = out[out.a.isna() & out.b.notna()].set_index("b")
    for bb, r in df.groupby("b").agg(cnt=("v", "size")).iterrows():
        assert bonly.loc[bb, "cnt"] == r["cnt"]


def test_dense_time_counts_gap_filled(ray_session):
    from logpipe_ray.stages.aggregate import dense_time_counts

    h = 3_600_000_000
    base = 1_700_000_000_000_000 // h * h
    # key "a" at hours 0 and 3; key "b" at hour 1 -> span = 4 hours,
    # grid = 2 keys x 4 hours = 8 rows, 5 of them zero
    ts = pa.array(
        [base + 10, base + 3 * h + 5, base + 3 * h + 6, base + h],
        pa.timestamp("us"),
    )
    ds = _mk(pa.table({"k": ["a", "a", "a", "b"], "ts": ts}))
    out = dense_time_counts(ds, "k", "ts").to_pandas()
    assert len(out) == 8
    got = {
        (r.k, int(pd.Timestamp(r.bucket).value // 1000)): int(r.cnt)
        for r in out.itertuples()
    }
    assert got[("a", base)] == 1
    assert got[("a", base + 3 * h)] == 2
    assert got[("b", base + h)] == 1
    assert sum(got.values()) == 4  # all other cells zero-filled
    assert out["bucket"].dtype == np.dtype("datetime64[us]")


def test_fluent_api_session3_methods(ray_session):
    from logpipe_ray.api import Pipeline

    t = pa.table(
        {
            "g": ["a"] * 6 + ["b"] * 6,
            "x": pa.array(list(range(12)), pa.int64()),
            "y": pa.array([2 * i for i in range(12)], pa.int64()),
            "v": pa.array([float(i) for i in range(12)]),
        }
    )
    p = Pipeline.from_dataset(_mk(t))
    other = Pipeline.from_dataset(
        _mk(pa.table({"g": ["a"], "x": pa.array([0], pa.int64())}))
    )
    assert len(p.except_keys(other, ["g", "x"]).to_pandas()) == 11
    assert len(p.intersect_keys(other, ["g", "x"]).to_pandas()) == 1
    mad = p.mad_by("g", "v").to_pandas()
    assert set(mad.columns) == {"g", "mad_value"} and len(mad) == 2
    corr = p.corr_by("g", "x", "y").to_pandas()
    assert np.allclose(corr["corr_xy"], 1.0)
    cube = p.cube(["g"]).to_pandas()
    assert len(cube) == 3  # a, b, grand total


def test_events_type_transitions_reference(ray_session):
    from logpipe_ray.queries import events_type_transitions

    out = events_type_transitions(SF).to_pandas()
    ev = (
        pq.read_table(f"{SF}/events.parquet")
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    nxt = ev.groupby("user_id")["event_type"].shift(-1)
    ref = (
        pd.DataFrame({"cur_type": ev["event_type"], "next_type": nxt})
        .dropna()
        .groupby(["cur_type", "next_type"])
        .size()
        .reset_index(name="cnt")
    )
    got = out.set_index(["cur_type", "next_type"])
    assert len(out) == len(ref)
    for r in ref.itertuples():
        assert got.loc[(r.cur_type, r.next_type), "cnt"] == r.cnt
    # probabilities sum to 1 per cur_type
    s = out.groupby("cur_type")["prob"].sum()
    assert np.allclose(s.to_numpy(), 1.0)


def test_events_type_hour_chi2_reference(ray_session):
    from logpipe_ray.queries import events_type_hour_chi2

    out = events_type_hour_chi2(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["hour"] = ev["ts"].dt.hour.astype(np.int64)
    ref = ev.groupby(["event_type", "hour"]).size().reset_index(name="observed")
    assert len(out) == len(ref)
    assert int(out["observed"].sum()) == len(ev)
    # independence identity: sum(expected) == n, and chi2 terms >= 0
    assert abs(out["expected"].sum() - len(ev)) < 1e-6
    assert (out["chi2_term"] >= 0).all()


def test_events_value_percentile_reference(ray_session):
    from logpipe_ray.queries import events_value_percentile

    out = (
        events_value_percentile(SF)
        .to_pandas()
        .set_index("event_id")["pct_rank"]
    )
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev = ev[ev.value.notna()].copy()
    ev["vc"] = np.round(ev["value"] * 100).astype(np.int64)
    ref = ev.groupby("event_type")["vc"].rank(method="min")
    n = ev.groupby("event_type")["vc"].transform("size")
    expect = (ref - 1) / np.maximum(n - 1, 1)
    for eid, want in zip(ev["event_id"], expect):
        assert out[eid] == want, (eid, out[eid], want)


def test_q13_zero_bucket_present(ray_session):
    """Customers with no (surviving) orders must appear as c_count=0."""
    from logpipe_ray.queries import q13_customer_distribution

    out = q13_customer_distribution(SF).to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey"])
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).to_pandas()
    kept = orders[orders.o_orderpriority != "1-URGENT"]
    n_zero = cust.num_rows - kept["o_custkey"].nunique()
    assert int(out["custdist"].sum()) == cust.num_rows
    if n_zero > 0:
        assert int(out.loc[out.c_count == 0, "custdist"].iloc[0]) == n_zero
