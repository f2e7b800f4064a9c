"""Round-4 session-6 operators: interval sweep-line concurrency, OHLC
bars (ordered first/last mergeable partials), Spearman rank correlation
from bounded count grids, snapshot diff, and the throttle/debounce
scan. Brute-force references here; oracle parity is continuously
checked by scripts/check_correctness.py and the driver."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

SF = "/root/testdata/sf0.001"
GAP_US = 30 * 60 * 1_000_000


def _collect(ds) -> pd.DataFrame:
    if isinstance(ds, pa.Table):
        df = ds.to_pandas()
    else:
        tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns]
        df = pa.concat_tables(tbls).to_pandas() if tbls else pd.DataFrame()
    return (
        df.sort_values(list(df.columns)).reset_index(drop=True) if len(df) else df
    )


def _events_df() -> pd.DataFrame:
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/events.parquet").to_pandas()


def _brute_sessions(df: pd.DataFrame) -> pd.DataFrame:
    """Per-user 30-min-gap sessions -> (t0, t1) microsecond intervals."""
    d = df.sort_values(["user_id", "ts"]).copy()
    us = d["ts"].astype("int64")
    new = (d["user_id"] != d["user_id"].shift()) | (
        us - us.shift() > GAP_US
    )
    sid = new.cumsum()
    g = us.groupby(sid)
    return pd.DataFrame({"t0": g.min().values, "t1": g.max().values})


def test_max_concurrency_brute_force(ray_session):
    from logpipe_ray.queries import events_max_concurrency

    got = _collect(events_max_concurrency(SF))

    iv = _brute_sessions(_events_df())
    b = pd.DataFrame(
        {
            "t": np.concatenate([iv["t0"].values, iv["t1"].values]),
            "delta": np.concatenate(
                [np.ones(len(iv), np.int64), -np.ones(len(iv), np.int64)]
            ),
        }
    )
    # inclusive occupancy: +1 sorts before -1 at equal t
    b = b.sort_values(["t", "delta"], ascending=[True, False], ignore_index=True)
    b["conc"] = b["delta"].cumsum()
    b["day"] = b["t"] // 86_400_000_000
    want = (
        b.groupby("day")["conc"].max().reset_index(name="max_concurrent")
    )
    want = want.sort_values(list(want.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["max_concurrent"].min() >= 1


def test_ohlc_brute_force_and_layout_invariance(ray_session):
    from logpipe_ray.queries import events_value_ohlc_hourly

    got = _collect(events_value_ohlc_hourly(SF))

    df = _events_df()
    df = df[df["value"].notna()].copy()
    df["vc"] = np.round(df["value"] * 100.0).astype(np.int64)
    df["hour_bucket"] = df["ts"].astype("int64") // 3_600_000_000
    df = df.sort_values(["event_type", "hour_bucket", "ts", "event_id"])
    g = df.groupby(["event_type", "hour_bucket"])
    want = pd.DataFrame(
        {
            "open_cents": g["vc"].first(),
            "high_cents": g["vc"].max(),
            "low_cents": g["vc"].min(),
            "close_cents": g["vc"].last(),
            "n": g["vc"].size().astype(np.int64),
        }
    ).reset_index()
    want = want.sort_values(list(want.columns)).reset_index(drop=True)
    got2 = got[want.columns]
    pd.testing.assert_frame_equal(got2, want, check_dtype=False)
    assert (got["high_cents"] >= got["low_cents"]).all()
    assert got["open_cents"].between(
        got["low_cents"], got["high_cents"]
    ).all()


def test_ohlc_partials_merge_across_batch_splits(ray_session):
    """The per-batch partial must be mergeable: splitting the same rows
    into adversarial batch layouts (interleaved, reversed) cannot change
    the final bars."""
    from logpipe_ray.queries import events_value_ohlc_hourly

    base = _collect(events_value_ohlc_hourly(SF))

    # re-run with tiny blocks: every (type, hour) group is split across
    # many partials, exercising the merge path hard
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 16 * 1024
        again = _collect(events_value_ohlc_hourly(SF))
    finally:
        ctx.target_max_block_size = old
    pd.testing.assert_frame_equal(base, again)


def test_spearman_matches_pandas(ray_session):
    from logpipe_ray.queries import events_value_spearman

    got = _collect(events_value_spearman(SF)).set_index("event_type")

    df = _events_df()
    df = df[df["value"].notna()].copy()
    df["vc"] = np.round(df["value"] * 100.0).astype(np.int64)
    df["hr"] = df["ts"].dt.hour.astype(np.int64)
    for et, g in df.groupby("event_type"):
        rx = g["vc"].rank(method="average")
        ry = g["hr"].rank(method="average")
        want = np.corrcoef(rx, ry)[0, 1]
        have = got.loc[et, "spearman_rho"]
        assert np.isclose(have, want, rtol=1e-9), (et, have, want)


def test_spearman_exact_rank_identities(ray_session):
    """Doubled average ranks are exact ints: per type, sum(2r) must be
    n*(n+1) (rank sum identity), which the moment partials preserve."""
    from logpipe_ray.queries import events_value_spearman
    from logpipe_ray.sources.factory import read_parquet_clean

    # engineered: constant y within a type -> zero variance -> NULL rho
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([1, 2, 3], pa.timestamp("us")),
            "event_type": pa.array(["a"] * 3),
            "value": pa.array([1.0, 2.0, 3.0]),
        }
    )
    import os
    import tempfile

    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = _collect(events_value_spearman(d))
    # all three events share hour 0 -> hour variance is 0 -> NULL
    assert len(out) == 1
    assert out["spearman_rho"].isna().all()


def test_snapshot_diff_brute_force(ray_session):
    from logpipe_ray.queries import (
        _SNAPSHOT_CUTOFF_US,
        events_snapshot_diff,
    )

    got = _collect(events_snapshot_diff(SF))

    df = _events_df()
    df = df[df["value"].notna()].copy()
    df["vc"] = np.round(df["value"] * 100.0).astype(np.int64)
    in_a = df["ts"].astype("int64") < _SNAPSHOT_CUTOFF_US
    g = df.groupby("user_id")
    want = pd.DataFrame(
        {
            "n_a": df[in_a].groupby("user_id")["vc"].size(),
            "s_a": df[in_a].groupby("user_id")["vc"].sum(),
            "n_b": g["vc"].size(),
            "s_b": g["vc"].sum(),
        }
    ).fillna(0).astype(np.int64).reset_index()
    want["status"] = np.where(
        want["n_a"] == 0,
        "added",
        np.where(
            (want["n_a"] != want["n_b"]) | (want["s_a"] != want["s_b"]),
            "changed",
            "unchanged",
        ),
    )
    want = want.sort_values(list(want.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[want.columns], want, check_dtype=False
    )
    # the fixture spans 30 days with a mid-month cutoff: every class
    # that is structurally possible should be populated or absent
    # consistently (A subset of B -> 'removed' cannot exist)
    assert set(got["status"]) <= {"added", "changed", "unchanged"}
    assert (got["n_a"] <= got["n_b"]).all()


def test_throttled_brute_force(ray_session):
    from logpipe_ray.queries import _THROTTLE_GAP_US, events_throttled

    got = _collect(events_throttled(SF))

    df = _events_df().sort_values(["user_id", "ts", "event_id"])
    us = df["ts"].astype("int64")
    prev = us.shift()
    same = df["user_id"] == df["user_id"].shift()
    kept = (~same | (us - prev >= _THROTTLE_GAP_US)).astype(np.int64)
    want = (
        pd.DataFrame({"event_type": df["event_type"], "kept": kept})
        .groupby(["event_type", "kept"])
        .size()
        .reset_index(name="cnt")
    )
    want = want.sort_values(list(want.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # kept + dropped must reconstruct the full event count
    assert got["cnt"].sum() == len(df)


def test_fluent_api_session6_methods(ray_session):
    import ray.data as rd

    from logpipe_ray.api import Pipeline

    t = pa.table(
        {
            "g": ["a"] * 4 + ["b"] * 4,
            "o1": pa.array([3, 1, 2, 4, 10, 30, 20, 40], pa.int64()),
            "o2": pa.array(list(range(8)), pa.int64()),
            "v": pa.array([30, 10, 20, 40, 1, 3, 2, 4], pa.int64()),
        }
    )
    p = Pipeline.from_dataset(rd.from_arrow(t))

    bars = p.ohlc_by(["g"], ["o1", "o2"], "v").to_pandas().set_index("g")
    assert bars.loc["a", "open"] == 10 and bars.loc["a", "close"] == 40
    assert bars.loc["b", "low"] == 1 and bars.loc["b", "high"] == 4
    assert (bars["n"] == 4).all()

    # v is a monotone function of o1 within each group -> rho == 1
    rho = p.spearman_by("g", "o1", "v").to_pandas()
    assert np.allclose(rho["spearman_rho"], 1.0)

    iv = Pipeline.from_dataset(
        rd.from_arrow(
            pa.table(
                {
                    "t0": pa.array([0, 5, 10], pa.int64()),
                    "t1": pa.array([7, 6, 12], pa.int64()),
                }
            )
        )
    )
    conc = iv.sweep_concurrent("t0", "t1", bucket_us=10, out_grain_us=100).to_pandas()
    # [0,7] and [5,6] overlap -> peak 2 inside grain 0
    assert conc.set_index("grain").loc[0, "max_concurrent"] == 2

    ev = Pipeline.from_dataset(
        rd.from_arrow(
            pa.table(
                {
                    "u": pa.array([1, 1, 1, 2], pa.int64()),
                    "ts": pa.array([0, 50, 120, 10], pa.int64()),
                    "id": pa.array([0, 1, 2, 3], pa.int64()),
                }
            )
        )
    )
    kept = ev.throttle("u", "ts", "id", gap_us=60).to_pandas()
    # u=1: keep ts=0 (first) and ts=120 (gap 70 from ts=50); drop ts=50
    assert sorted(kept["ts"].tolist()) == [0, 10, 120]

    sd = Pipeline.from_dataset(
        rd.from_arrow(
            pa.table(
                {
                    "k": pa.array([1, 1, 2], pa.int64()),
                    "in_a": pa.array([True, False, False]),
                    "v": pa.array([5, 7, 9], pa.int64()),
                }
            )
        )
    )
    diff = sd.snapshot_diff("k", "in_a", "v").to_pandas().set_index("k")
    assert diff.loc[1, "status"] == "changed" and diff.loc[2, "status"] == "added"


def test_session_entry_exit_brute_force(ray_session):
    from logpipe_ray.queries import events_session_entry_exit

    got = _collect(events_session_entry_exit(SF))

    d = _events_df().sort_values(["user_id", "ts", "event_id"])
    us = d["ts"].astype("int64")
    new = (d["user_id"] != d["user_id"].shift()) | (us - us.shift() > GAP_US)
    sid = new.cumsum()
    g = d.groupby(sid)["event_type"]
    want = (
        pd.DataFrame({"entry_type": g.first(), "exit_type": g.last()})
        .groupby(["entry_type", "exit_type"])
        .size()
        .reset_index(name="n_sessions")
    )
    want = want.sort_values(list(want.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # total sessions must match the sessionize count
    assert got["n_sessions"].sum() == int(new.sum())


def test_concurrency_timeavg_brute_force(ray_session):
    from logpipe_ray.queries import events_concurrency_timeavg

    got = _collect(events_concurrency_timeavg(SF)).iloc[0]

    iv = _brute_sessions(_events_df())
    b = pd.DataFrame(
        {
            "t": np.concatenate([iv["t0"].values, iv["t1"].values]),
            "delta": np.concatenate(
                [np.ones(len(iv), np.int64), -np.ones(len(iv), np.int64)]
            ),
        }
    ).sort_values(["t", "delta"], ascending=[True, False], ignore_index=True)
    conc = b["delta"].cumsum().to_numpy()
    t = b["t"].to_numpy()
    integral = int(np.sum(conc[:-1] * (t[1:] - t[:-1])))
    span = int(t[-1] - t[0])
    assert int(got["peak_concurrent"]) == int(conc.max())
    assert int(got["conc_us_integral"]) == integral
    assert int(got["span_us"]) == span
    assert got["avg_concurrency"] == float(integral) / float(span)


def test_type_autocorr_matches_numpy(ray_session):
    from logpipe_ray.queries import events_type_autocorr

    got = _collect(events_type_autocorr(SF)).set_index("event_type")

    df = _events_df()
    df["day"] = df["ts"].astype("int64") // 86_400_000_000
    d0, d1 = int(df["day"].min()), int(df["day"].max())
    for et, g in df.groupby("event_type"):
        series = np.zeros(d1 - d0 + 1, np.int64)
        vc = g.groupby("day").size()
        series[vc.index.to_numpy() - d0] = vc.to_numpy()
        want = np.corrcoef(series[:-1], series[1:])[0, 1]
        have = got.loc[et, "lag1_autocorr"]
        assert np.isclose(have, want, rtol=1e-9), (et, have, want)


def test_span_corrupt_structure(ray_session):
    """Contiguous masked runs collapse to exactly one sentinel; targets
    carry the dropped tokens in order; deterministic across layouts."""
    import ray.data as rd

    from logpipe_ray.functions.tokens import span_corrupt

    rng = np.random.default_rng(7)
    docs = []
    for i in range(50):
        n = int(rng.integers(0, 40))
        docs.append(
            {
                "doc_id": f"doc-{i}",
                "_n": i,
                "tokens": rng.integers(5, 1000, n).astype(np.int32).tolist(),
            }
        )
    t = pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in docs]),
            "_n": pa.array([d["_n"] for d in docs], pa.int64()),
            "tokens": pa.array([d["tokens"] for d in docs], pa.list_(pa.int32())),
        }
    )
    out = (
        span_corrupt(rd.from_arrow(t), sentinel_id=1, num_col="_n")
        .to_pandas()
        .set_index("doc_id")
    )

    from logpipe_ray.functions.sampling import HASH_A, HASH_B, HASH_M, SEED_C

    for d in docs:
        toks = np.asarray(d["tokens"], np.int64)
        pos = np.arange(len(toks), dtype=np.int64)
        m = ((d["_n"] * HASH_A + (pos // 3) * SEED_C + HASH_B) % HASH_M) % 100 < 15
        # brute-force expected corrupted sequence
        exp = []
        prev_masked = False
        for tok, mk in zip(toks, m):
            if not mk:
                exp.append(int(tok))
            elif not prev_masked:
                exp.append(1)
            prev_masked = bool(mk)
        row = out.loc[d["doc_id"]]
        assert list(row["corrupted_tokens"]) == exp, d["doc_id"]
        assert list(row["targets"]) == toks[m].astype(int).tolist()
        assert row["n_masked"] == int(m.sum())
        runs = int((m & ~np.r_[False, m[:-1]]).sum())
        assert row["n_spans"] == runs
        # sentinel count in output equals run count
        assert sum(1 for x in row["corrupted_tokens"] if x == 1) >= runs


def test_span_corrupt_fluent_and_layout_invariance(ray_session):
    import ray.data as rd

    from logpipe_ray.api import Pipeline

    t = pa.table(
        {
            "doc_id": pa.array([f"doc-{i}" for i in range(20)]),
            "_n": pa.array(list(range(20)), pa.int64()),
            "tokens": pa.array(
                [list(range(10, 10 + (i % 7) * 3)) for i in range(20)],
                pa.list_(pa.int32()),
            ),
        }
    )
    p = Pipeline.from_dataset(rd.from_arrow(t))
    a = (
        p.span_corrupt(num_col="_n")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    # split into single-row batches: result must be identical
    b = (
        Pipeline.from_dataset(rd.from_arrow(t).repartition(20))
        .span_corrupt(num_col="_n")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    a2 = a.assign(
        corrupted_tokens=a["corrupted_tokens"].map(list),
        targets=a["targets"].map(list),
    )
    b2 = b.assign(
        corrupted_tokens=b["corrupted_tokens"].map(list),
        targets=b["targets"].map(list),
    )
    pd.testing.assert_frame_equal(a2, b2)


def test_weighted_median_brute_force_and_guard(ray_session):
    from logpipe_ray.queries import lineitem_weighted_median_price

    got = (
        lineitem_weighted_median_price(SF).to_pandas().set_index("l_returnflag")
    )

    import pyarrow.parquet as pq

    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    li["vc"] = np.round(li["l_extendedprice"] * 100.0).astype(np.int64)
    li["w"] = li["l_quantity"].astype(np.int64)
    for rf, g in li.groupby("l_returnflag"):
        g = g.sort_values("vc")
        cumw = g["w"].cumsum().to_numpy()
        tot = int(cumw[-1])
        idx = int(np.searchsorted(1000 * cumw, 500 * tot, side="left"))
        assert got.loc[rf, "wmedian_cents"] == int(g["vc"].iloc[idx]), rf

    # above the distinct-count guard the selection route must kick in
    # and agree byte-for-byte with the dense driver fold
    import ray.data as rd

    from logpipe_ray.stages.aggregate import grouped_weighted_quantile

    rng = np.random.default_rng(11)
    n = 5000
    tbl = pa.table(
        {
            "k": pa.array(rng.choice(["a", "b", "c"], n)),
            # wide signed domain + a hot repeated value + zero weights
            "v": pa.array(
                np.where(
                    rng.random(n) < 0.2,
                    42,
                    rng.integers(-(2**40), 2**40, n),
                ),
                pa.int64(),
            ),
            "w": pa.array(rng.integers(0, 50, n), pa.int64()),
        }
    )
    big = rd.from_arrow(tbl).repartition(7)
    for qpm in (500, 250, 990):
        # three routes, all byte-equal: driver-merge (default — no keyed
        # exchange), exchanged dense fold (driver_merge_rows=0), and
        # distributed selection refinement (+ distinct_limit=0)
        dense = grouped_weighted_quantile(
            big, "k", "v", "w", q_permille=qpm
        ).to_pandas()
        exchanged = grouped_weighted_quantile(
            big, "k", "v", "w", q_permille=qpm, driver_merge_rows=0
        ).to_pandas()
        forced = grouped_weighted_quantile(
            big, "k", "v", "w", q_permille=qpm,
            driver_merge_rows=0, distinct_limit=0,
        ).to_pandas()
        pd.testing.assert_frame_equal(
            dense.sort_values("k", ignore_index=True),
            exchanged.sort_values("k", ignore_index=True),
        )
        pd.testing.assert_frame_equal(
            dense.sort_values("k", ignore_index=True),
            forced.sort_values("k", ignore_index=True),
        )


def test_top_movers_brute_force(ray_session):
    from logpipe_ray.queries import _SNAPSHOT_CUTOFF_US, events_top_movers

    got = events_top_movers(SF).to_pandas().reset_index(drop=True)

    df = _events_df()
    before = (df["ts"].astype("int64") < _SNAPSHOT_CUTOFF_US).astype(np.int64)
    want = pd.DataFrame({"user_id": df["user_id"], "b": before, "a": 1 - before})
    want = want.groupby("user_id").agg(n_before=("b", "sum"), n_after=("a", "sum"))
    want = want.reset_index()
    want["delta"] = want["n_after"] - want["n_before"]
    want["abs_delta"] = want["delta"].abs()
    want = want.sort_values(
        ["abs_delta", "user_id"], ascending=[False, True], ignore_index=True
    ).head(20)
    pd.testing.assert_frame_equal(
        got[want.columns].reset_index(drop=True), want, check_dtype=False
    )


def test_out_of_order_audit_planted_disorder(ray_session):
    """The fixture streams are in order (n_late == 0 everywhere), so
    the oracle row can't exercise the late path — plant disorder and
    check counts and the worst lag exactly."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from logpipe_ray.queries import events_out_of_order_audit

    # user 1: arrival order (event_id) 1..4, event times 10, 50, 20, 60
    #   -> event 3 (ts=20) is late vs watermark 50 (lag 30)
    # user 2: arrival 5..6, times 100, 90 -> late, lag 10
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "ts": pa.array([10, 50, 20, 60, 100, 90], pa.timestamp("us")),
            "event_type": pa.array(["x", "x", "x", "y", "y", "y"]),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = (
            _collect(events_out_of_order_audit(d)).set_index("event_type")
        )
    assert out.loc["x", "n_late"] == 1 and out.loc["x", "max_lag_us"] == 30
    assert out.loc["y", "n_late"] == 1 and out.loc["y", "max_lag_us"] == 10
    assert out["n"].sum() == 6


def test_out_of_order_audit_oracle_shape(ray_session):
    from logpipe_ray.queries import events_out_of_order_audit

    out = _collect(events_out_of_order_audit(SF))
    # fixture event_ids are assigned in time order -> zero lateness
    assert (out["n_late"] == 0).all() and (out["max_lag_us"] == 0).all()
    assert out["n"].sum() == len(_events_df())


def test_conversion_latency_brute_force_and_ordering(ray_session):
    """A purchase BEFORE the user's first click must not count — the
    sequential condition the naive min-per-type join gets wrong."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from logpipe_ray.queries import events_conversion_latency

    got = _collect(events_conversion_latency(SF))

    df = _events_df().sort_values(["user_id", "ts", "event_id"])
    rows = []
    for uid, g in df.groupby("user_id"):
        clicks = g[g["event_type"] == "click"]
        if clicks.empty:
            continue
        t0 = clicks["ts"].iloc[0]
        purch = g[(g["event_type"] == "purchase") & (g["ts"] >= t0)]
        if purch.empty:
            rows.append(-1)
        else:
            lat = purch["ts"].iloc[0].value // 1000 - t0.value // 1000
            rows.append(lat // 3_600_000_000)
    want = (
        pd.Series(rows).value_counts().rename_axis("hour_bucket").reset_index(
            name="n_users"
        )
    )
    want = want.sort_values(list(want.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # planted: purchase before first click -> bucket -1, after -> 0
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 2, 2], pa.int64()),
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array([100, 200, 100, 200], pa.timestamp("us")),
            "event_type": pa.array(["purchase", "click", "click", "purchase"]),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = _collect(events_conversion_latency(d)).set_index("hour_bucket")
    assert out.loc[-1, "n_users"] == 1  # user 1: purchase precedes click
    assert out.loc[0, "n_users"] == 1  # user 2: converted within the hour


def test_ab_hash_split_brute_force(ray_session):
    from logpipe_ray.queries import events_ab_hash_split

    got = _collect(events_ab_hash_split(SF)).iloc[0]

    df = _events_df()
    pu = (
        df.assign(p=(df["event_type"] == "purchase").astype(int))
        .groupby("user_id")["p"]
        .max()
    )
    v = pu.index.to_numpy() % 2
    n0, n1 = int((v == 0).sum()), int((v == 1).sum())
    c0 = int(pu[v == 0].sum())
    c1 = int(pu[v == 1].sum())
    assert (got["n0"], got["n1"], got["conv0"], got["conv1"]) == (n0, n1, c0, c1)
    p0, p1 = c0 / n0, c1 / n1
    pp = (c0 + c1) / (n0 + n1)
    if 0 < pp < 1:
        z = (p1 - p0) / np.sqrt(pp * (1 - pp) * (1 / n0 + 1 / n1))
        assert np.isclose(got["z_score"], z, rtol=1e-12)
    else:
        # degenerate split (everyone/no-one converted): NULL by contract
        assert pd.isna(got["z_score"])


def test_quantize_int8_reconstruction_bound(ray_session):
    """Round-to-nearest int8 quantization can't err more than half a
    code step: max_err_ppm <= 1e6 / 255 / 2 (+1 for the floor)."""
    import ray.data as rd

    from logpipe_ray.queries import embeddings_quantize_int8

    out = _collect(embeddings_quantize_int8(SF))
    assert (out["max_err_ppm"] <= int(1e6 / 255 / 2) + 1).all()
    assert (out["n_dims"] > 0).all()

    # constant vector: zero range -> zero error by convention
    from logpipe_ray.queries import embeddings_quantize_int8 as q

    t = pa.table(
        {
            "vec_id": pa.array([1, 2], pa.int64()),
            "embedding": pa.array(
                [[1.5, 1.5, 1.5], [0.0, 1.0, 0.25]], pa.list_(pa.float32())
            ),
        }
    )
    import os
    import tempfile

    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "embeddings.parquet"))
        small = _collect(q(d)).set_index("vec_id")
    assert small.loc[1, "max_err_ppm"] == 0
    # non-grid values stay inside the half-step bound
    assert small.loc[2, "max_err_ppm"] <= int(1e6 / 255 / 2) + 1


def test_fk_audit_planted_violations(ray_session):
    """The fixture is referentially clean (all zeros) — plant orphans
    in a synthetic star and check exact counts per relation."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from logpipe_ray.queries import fk_violations_audit

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table({"o_orderkey": pa.array([1, 2], pa.int64()),
                      "o_custkey": pa.array([10, 99], pa.int64())}),
            os.path.join(d, "orders.parquet"),
        )
        pq.write_table(
            pa.table({"c_custkey": pa.array([10, 11], pa.int64()),
                      "c_nationkey": pa.array([0, 7], pa.int64())}),
            os.path.join(d, "customer.parquet"),
        )
        pq.write_table(
            pa.table({"n_nationkey": pa.array([0], pa.int64())}),
            os.path.join(d, "nation.parquet"),
        )
        pq.write_table(
            pa.table({"p_partkey": pa.array([5], pa.int64())}),
            os.path.join(d, "part.parquet"),
        )
        pq.write_table(
            pa.table({"s_suppkey": pa.array([3], pa.int64())}),
            os.path.join(d, "supplier.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    # one orphan orderkey, one NULL partkey (counts),
                    # one orphan suppkey
                    "l_orderkey": pa.array([1, 7], pa.int64()),
                    "l_partkey": pa.array([5, None], pa.int64()),
                    "l_suppkey": pa.array([4, 3], pa.int64()),
                }
            ),
            os.path.join(d, "lineitem.parquet"),
        )
        pq.write_table(
            pa.table({"user_id": pa.array([10, 10, 12], pa.int64())}),
            os.path.join(d, "events.parquet"),
        )
        out = fk_violations_audit(d).to_pandas().set_index("relation")

    assert out.loc["lineitem.l_orderkey->orders", "n_orphans"] == 1
    assert out.loc["lineitem.l_partkey->part", "n_orphans"] == 1  # NULL
    assert out.loc["lineitem.l_suppkey->supplier", "n_orphans"] == 1
    assert out.loc["orders.o_custkey->customer", "n_orphans"] == 1
    assert out.loc["events.user_id->customer", "n_orphans"] == 1
    assert out.loc["customer.c_nationkey->nation", "n_orphans"] == 1
    assert (out["n_rows"] == [2, 2, 2, 2, 3, 2]).all()


def test_merge_into_matches_full_recompute_and_idempotent(ray_session):
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq
    import ray.data as rd

    from logpipe_ray.pipelines.merge import merge_into

    rng = np.random.default_rng(11)
    n = 500
    rows = pa.table(
        {
            "k": pa.array(rng.integers(0, 60, n), pa.int64()),
            "v": pa.array(np.arange(n), pa.int64()),
            "payload": pa.array(rng.integers(0, 1000, n), pa.int64()),
        }
    )
    base_t = rows.slice(0, 300)
    delta_t = rows.slice(300)

    work = tempfile.mkdtemp()
    try:
        v1 = os.path.join(work, "v1")
        merge_into(None, rd.from_arrow(base_t), "k", ["v"], v1)
        v2 = os.path.join(work, "v2")
        stats = merge_into(v1, rd.from_arrow(delta_t), "k", ["v"], v2)

        got = (
            pq.ParquetDataset(v2).read().to_pandas().sort_values("k").
            reset_index(drop=True)
        )
        want = (
            rows.to_pandas()
            .sort_values("v")
            .groupby("k")
            .last()
            .reset_index()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[["k", "v", "payload"]], want)
        assert stats["rows"] == len(want)

        # idempotence: merging an empty delta republishes the same state
        v3 = os.path.join(work, "v3")
        merge_into(v2, rd.from_arrow(rows.slice(0, 0)), "k", ["v"], v3)
        again = (
            pq.ParquetDataset(v3).read().to_pandas().sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, again)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_bpe_encode_monotone_and_exact_tiny(ray_session):
    import ray.data as rd

    from logpipe_ray.functions.bpe import apply_merges

    # merge table: (7, 8) -> 100, then (100, 9) -> 101
    merges = pa.table(
        {
            "rank": pa.array([0, 1], pa.int64()),
            "t1": pa.array([7, 100], pa.int64()),
            "t2": pa.array([8, 9], pa.int64()),
            "new_id": pa.array([100, 101], pa.int64()),
            "cnt": pa.array([2, 1], pa.int64()),
        }
    )
    t = pa.table(
        {
            "doc_id": pa.array(["a", "b"]),
            "tokens": pa.array(
                [[7, 8, 9, 7, 8], [9, 7, 7, 8]], pa.list_(pa.int32())
            ),
        }
    )
    out = (
        apply_merges(rd.from_arrow(t), merges)
        .to_pandas()
        .set_index("doc_id")["tokens"]
    )
    assert list(out["a"]) == [101, 100]  # 7,8->100; 100,9->101; 7,8->100
    assert list(out["b"]) == [9, 7, 100]

    from logpipe_ray.queries import seq_bpe_encode

    stats = seq_bpe_encode(SF).to_pandas()
    assert (stats["n_tok_after"] <= stats["n_tok_before"]).all()
    assert (stats["n_tok_after"] > 0).all()


def test_target_encoding_shrinks_toward_prior(ray_session):
    from logpipe_ray.queries import events_type_target_encoding

    got = _collect(events_type_target_encoding(SF))

    df = _events_df()
    df = df[df["value"].notna()].copy()
    df["vc"] = np.round(df["value"] * 100.0).astype(np.int64)
    gmean = df["vc"].sum() / len(df)
    g = df.groupby("event_type")["vc"].agg(["count", "sum", "mean"])
    for _, r in got.iterrows():
        raw = g.loc[r["event_type"], "mean"]
        # the encoding must lie strictly between the raw category mean
        # and the global prior (shrinkage), unless they coincide
        lo, hi = sorted([raw, gmean])
        assert lo - 1e-9 <= r["target_enc"] <= hi + 1e-9
        want = (g.loc[r["event_type"], "sum"] + 100.0 * gmean) / (
            g.loc[r["event_type"], "count"] + 100.0
        )
        assert np.isclose(r["target_enc"], want, rtol=1e-12)


def test_footer_stats_matches_scan_and_detects_nulls(ray_session):
    import os
    import tempfile

    import pyarrow.parquet as pq

    from logpipe_ray.queries import events_footer_stats

    got = _collect(events_footer_stats(SF)).set_index("column")
    df = _events_df()
    for c in df.columns:
        assert got.loc[c, "n_nulls"] == int(df[c].isna().sum()), c
        assert got.loc[c, "n_rows"] == len(df)

    # multi-file dir with planted nulls: footer sums must aggregate
    with tempfile.TemporaryDirectory() as d:
        ev_dir = os.path.join(d, "events.parquet")
        os.makedirs(ev_dir)
        pq.write_table(
            pa.table({"value": pa.array([1.0, None, None])}),
            os.path.join(ev_dir, "a.parquet"),
        )
        pq.write_table(
            pa.table({"value": pa.array([None, 2.0])}),
            os.path.join(ev_dir, "b.parquet"),
        )
        out = _collect(events_footer_stats(d)).set_index("column")
    assert out.loc["value", "n_nulls"] == 3
    assert out.loc["value", "n_rows"] == 5


def test_dwell_time_excludes_cross_session_gaps(ray_session):
    import os
    import tempfile

    import pyarrow.parquet as pq

    from logpipe_ray.queries import events_dwell_time

    # user 1: gaps 60s (in-session), 2h (cross-session, excluded)
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                [0, 60_000_000, 60_000_000 + 7_200_000_000], pa.timestamp("us")
            ),
            "event_type": pa.array(["a", "b", "c"]),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = _collect(events_dwell_time(d)).set_index("event_type")
    assert out.loc["a", "n_gaps"] == 1 and out.loc["a", "sum_gap_us"] == 60_000_000
    assert out.loc["b", "n_gaps"] == 0  # 2h gap crosses the session
    assert pd.isna(out.loc["b", "mean_dwell_us"])
    assert out.loc["c", "n_gaps"] == 0  # last event has no successor


def test_reconciliation_planted_mismatch(ray_session):
    import os
    import tempfile

    import pyarrow.parquet as pq

    from logpipe_ray.queries import orders_totalprice_reconciliation

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                    # order 1 matches (1.00+2.00), order 2 is off by
                    # 0.50, order 3 has no lineitems
                    "o_totalprice": pa.array([3.0, 5.0, 9.0]),
                }
            ),
            os.path.join(d, "orders.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array([1, 1, 2], pa.int64()),
                    "l_extendedprice": pa.array([1.0, 2.0, 4.5]),
                }
            ),
            os.path.join(d, "lineitem.parquet"),
        )
        out = orders_totalprice_reconciliation(d).to_pandas().iloc[0]
    assert out["n_orders"] == 3
    assert out["n_match"] == 1
    assert out["n_mismatch"] == 1
    assert out["n_childless"] == 1
    assert out["max_abs_diff_cents"] == 50


def test_gini_known_distributions(ray_session):
    import os
    import tempfile

    import pyarrow.parquet as pq

    from logpipe_ray.queries import events_user_activity_gini

    def gini_of(user_ids):
        t = pa.table({"user_id": pa.array(user_ids, pa.int64())})
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(t, os.path.join(d, "events.parquet"))
            return events_user_activity_gini(d).to_pandas().iloc[0]

    # perfectly equal: gini 0
    eq = gini_of([1, 1, 2, 2, 3, 3])
    assert eq["gini"] == 0.0 and eq["n_users"] == 3
    # maximal concentration among 2 users: (2*1-3)*... closed form
    sk = gini_of([1] + [2] * 9)
    # sorted x = [1, 9], n=2: num = (2*1-3)*1 + (2*2-3)*9 = -1+9 = 8
    # den = 2*10 = 20 -> 0.4
    assert np.isclose(sk["gini"], 0.4)
