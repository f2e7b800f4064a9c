"""Round-4 session-7 operators: exact two-sample KS drift vs global,
CUSUM change-point over dense bucket grids, session bounce rate, and
RFM quantile-bucket segmentation. Brute-force references here; oracle
parity is continuously checked by scripts/check_correctness.py and the
driver."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _collect(ds) -> pd.DataFrame:
    if isinstance(ds, pa.Table):
        df = ds.to_pandas()
    else:
        tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns]
        df = pa.concat_tables(tbls).to_pandas() if tbls else pd.DataFrame()
    return (
        df.sort_values(list(df.columns)).reset_index(drop=True) if len(df) else df
    )


def _brute_ks_ppm(df: pd.DataFrame, key: str, col: str) -> dict:
    """Exact integer KS vs global via full CDFs over the value grid."""
    vs = np.sort(df[col].unique())
    out = {}
    n_all = len(df)
    for k, grp in df.groupby(key):
        ns = len(grp)
        num = 0
        for v in vs:
            fs = int((grp[col] <= v).sum())
            fg = int((df[col] <= v).sum())
            num = max(num, abs(fs * n_all - fg * ns))
        out[k] = (1_000_000 * num) // (ns * n_all)
    return out


def test_grouped_ks_vs_global_matches_brute(ray_session):
    from logpipe_ray.stages.aggregate import grouped_ks_vs_global

    rng = np.random.default_rng(7)
    # group a: uniform 0..49; group b: shifted 25..74; group c == global-ish
    df = pd.DataFrame(
        {
            "g": ["a"] * 300 + ["b"] * 200 + ["c"] * 100,
            "v": np.concatenate(
                [
                    rng.integers(0, 50, 300),
                    rng.integers(25, 75, 200),
                    rng.integers(0, 75, 100),
                ]
            ).astype(np.int64),
        }
    )
    got = _collect(
        grouped_ks_vs_global(
            rd.from_pandas(df).repartition(5), "g", "v"
        )
    ).set_index("g")
    ref = _brute_ks_ppm(df, "g", "v")
    for k, want in ref.items():
        assert int(got.loc[k, "ks_ppm"]) == want
        assert int(got.loc[k, "n_rows"]) == int((df["g"] == k).sum())
    # the shifted group must drift more than the matched one
    assert got.loc["b", "ks_ppm"] > got.loc["c", "ks_ppm"]


def test_grouped_ks_identical_distribution_is_small(ray_session):
    from logpipe_ray.stages.aggregate import grouped_ks_vs_global

    # two groups drawn from the SAME discrete values in the SAME
    # proportions -> per-group CDF == global CDF exactly -> ppm 0
    df = pd.DataFrame(
        {
            "g": ["x"] * 40 + ["y"] * 80,
            "v": ([1] * 10 + [2] * 20 + [3] * 10) + ([1] * 20 + [2] * 40 + [3] * 20),
        }
    )
    got = _collect(grouped_ks_vs_global(rd.from_pandas(df), "g", "v"))
    assert (got["ks_ppm"] == 0).all()


def _brute_cusum(counts: np.ndarray) -> tuple[int, int]:
    span, total = len(counts), int(counts.sum())
    best, best_i, pre = -1, 0, 0
    for i, c in enumerate(counts):
        pre += int(c)
        dev = abs(pre * span - (i + 1) * total)
        if dev > best:
            best, best_i = dev, i
    ppm = (1_000_000 * best) // (span * total) if total else 0
    return ppm, best_i


def test_cusum_changepoint_finds_planted_shift(ray_session):
    from logpipe_ray.stages.aggregate import cusum_changepoint

    # key "shift": 5/day for days 0-19, then 50/day for days 20-39
    # key "flat": 10/day throughout
    rows_k, rows_b = [], []
    for d in range(40):
        rows_k += ["shift"] * (5 if d < 20 else 50)
        rows_b += [d] * (5 if d < 20 else 50)
        rows_k += ["flat"] * 10
        rows_b += [d] * 10
    df = pd.DataFrame({"k": rows_k, "b": np.array(rows_b, np.int64)})
    got = _collect(
        cusum_changepoint(rd.from_pandas(df).repartition(7), "k", "b")
    ).set_index("k")

    shift_counts = np.array([5] * 20 + [50] * 20)
    flat_counts = np.array([10] * 40)
    ppm_s, i_s = _brute_cusum(shift_counts)
    ppm_f, _ = _brute_cusum(flat_counts)
    assert int(got.loc["shift", "cusum_ppm"]) == ppm_s
    assert int(got.loc["shift", "peak_bucket"]) == i_s == 19  # eve of the jump
    assert int(got.loc["flat", "cusum_ppm"]) == ppm_f == 0
    assert (got["n_buckets"] == 40).all()
    assert int(got.loc["shift", "n_rows"]) == 5 * 20 + 50 * 20


def test_cusum_dense_grid_zero_fills_missing_buckets(ray_session):
    from logpipe_ray.stages.aggregate import cusum_changepoint

    # key "gappy" has NO rows on days 5-14: the dense grid must count
    # those as zeros (10 days of silence is itself a level shift)
    df = pd.DataFrame(
        {
            "k": ["gappy"] * 20,
            "b": np.array(list(range(5)) + list(range(15, 30)), np.int64),
        }
    )
    got = _collect(cusum_changepoint(rd.from_pandas(df), "k", "b"))
    counts = np.zeros(30, np.int64)
    counts[:5] = 1
    counts[15:] = 1
    ppm, i = _brute_cusum(counts)
    assert int(got["cusum_ppm"].iloc[0]) == ppm
    assert int(got["peak_bucket"].iloc[0]) == i
    assert int(got["n_buckets"].iloc[0]) == 30


def test_bounce_rate_hand_case(ray_session, tmp_path):
    from logpipe_ray.queries import events_bounce_rate

    # user 1: [click] alone (bounce), then 40 min later [view, click]
    # (entry view, not a bounce); user 2: [purchase] alone (bounce)
    t0 = 1_700_000_000_000_000
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": pd.to_datetime(
                [t0, t0 + 2_400_000_000, t0 + 2_460_000_000, t0], unit="us"
            ),
            "user_id": [1, 1, 1, 2],
            "event_type": ["click", "view", "click", "purchase"],
            "value": [1.0, 2.0, 3.0, 4.0],
            "props": ["{}"] * 4,
        }
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    got = _collect(events_bounce_rate(str(tmp_path))).set_index("entry_type")
    assert int(got.loc["click", "n_sessions"]) == 1
    assert int(got.loc["click", "n_bounce"]) == 1
    assert int(got.loc["view", "n_sessions"]) == 1
    assert int(got.loc["view", "n_bounce"]) == 0
    assert int(got.loc["purchase", "n_bounce"]) == 1
    assert got.loc["view", "bounce_rate"] == 0.0


def test_rfm_buckets_match_pandas_reference(ray_session):
    from logpipe_ray.queries import users_rfm_segments

    got = _collect(users_rfm_segments(SF))
    # reference: pandas replication of the value-threshold bucketing
    ev = pd.read_parquet(f"{SF}/events.parquet")
    day = ev["ts"].astype("int64") // 86_400_000_000
    cents = np.where(
        (ev["event_type"] == "purchase") & ev["value"].notna(),
        np.round(ev["value"].to_numpy() * 100.0),
        0.0,
    ).astype(np.int64)
    m = pd.DataFrame(
        {"user_id": ev["user_id"], "day": day, "cents": cents}
    ).groupby("user_id").agg(
        last_day=("day", "max"), freq=("day", "size"), money=("cents", "sum")
    )
    m["rec"] = int(m["last_day"].max()) - m["last_day"]

    def bucket(series: pd.Series) -> pd.Series:
        v = np.sort(series.to_numpy())
        n = len(v)
        ts = [v[(j * n + 4) // 5 - 1] for j in (1, 2, 3, 4)]
        out = np.ones(len(series), np.int64)
        for t in ts:
            out += (series.to_numpy() > t).astype(np.int64)
        return pd.Series(out, index=series.index)

    ref = (
        pd.DataFrame(
            {
                "r_bucket": bucket(m["rec"]),
                "f_bucket": bucket(m["freq"]),
                "m_bucket": bucket(m["money"]),
            }
        )
        .groupby(["r_bucket", "f_bucket", "m_bucket"])
        .size()
        .rename("n_users")
        .reset_index()
        .sort_values(["r_bucket", "f_bucket", "m_bucket"])
        .reset_index(drop=True)
    )
    got = got.sort_values(["r_bucket", "f_bucket", "m_bucket"]).reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(
        got.astype(np.int64), ref.astype(np.int64), check_dtype=False
    )


def test_fluent_ks_and_cusum(ray_session):
    from logpipe_ray.api import Pipeline

    df = pd.DataFrame(
        {"g": ["a"] * 50 + ["b"] * 50, "v": list(range(50)) + list(range(50))}
    )
    out = Pipeline.from_dataset(rd.from_pandas(df)).ks_vs_global("g", "v").to_pandas()
    assert (out["ks_ppm"] == 0).all()
    out2 = (
        Pipeline.from_dataset(rd.from_pandas(df)).cusum_by("g", "v").to_pandas()
    )
    assert set(out2.columns) == {
        "g", "n_buckets", "n_rows", "cusum_ppm", "peak_bucket"
    }
