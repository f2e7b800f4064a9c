"""Round-5 additions: bucketed sessionize / interarrival / funnel
(the migration off per-key pandas map_groups, VERDICT r4 item 4)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events_frame(seed: int = 7, n_users: int = 40, hot_events: int = 5000):
    """Synthetic events with ONE planted hot user (user 0 holds
    hot_events rows — more than any single per_bucket batch of the
    naive per-key shape would want in pandas) plus a long tail."""
    rng = np.random.default_rng(seed)
    base = 1_700_000_000_000_000  # us
    rows_u, rows_t, rows_e = [], [], []
    for u in range(n_users):
        k = hot_events if u == 0 else int(rng.integers(1, 12))
        ts = base + np.sort(rng.integers(0, 3 * 86_400_000_000, size=k))
        rows_u.append(np.full(k, u, np.int64))
        rows_t.append(ts.astype(np.int64))
        rows_e.append(rng.choice(["view", "click", "purchase", "other"], size=k))
    return pd.DataFrame(
        {
            "user_id": np.concatenate(rows_u),
            "ts": np.concatenate(rows_t).astype("datetime64[us]"),
            "event_type": np.concatenate(rows_e),
        }
    ).sample(frac=1.0, random_state=3).reset_index(drop=True)


GAP_US = 30 * 60 * 1_000_000


def _ref_sessions(df: pd.DataFrame) -> pd.DataFrame:
    out = []
    for u, g in df.groupby("user_id"):
        tsu = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        breaks = int((np.diff(tsu) > GAP_US).sum()) + 1
        out.append((u, breaks, len(g)))
    return pd.DataFrame(out, columns=["user_id", "n_sessions", "n_events"])


def _ref_interarrival(df: pd.DataFrame) -> pd.DataFrame:
    out = []
    for u, g in df.groupby("user_id"):
        if len(g) < 2:
            continue
        tsu = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        d = np.diff(tsu)
        span = int(tsu[-1] - tsu[0])
        out.append((u, len(g), span, span / (len(g) - 1), int(d.max())))
    return pd.DataFrame(
        out, columns=["user_id", "n_events", "span_us", "avg_gap_us", "max_gap_us"]
    )


def _ref_funnel(df: pd.DataFrame) -> pd.DataFrame:
    out = []
    for u, g in df.groupby("user_id"):
        tsu = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy()
        stage = 0
        v = tsu[et == "view"]
        if v.size:
            stage, t = 1, v.min()
            c = tsu[(et == "click") & (tsu > t)]
            if c.size:
                stage, t = 2, c.min()
                p = tsu[(et == "purchase") & (tsu > t)]
                if p.size:
                    stage = 3
        out.append((u, stage))
    return pd.DataFrame(out, columns=["user_id", "stage_reached"])


@pytest.fixture(scope="module")
def hot_df():
    return _events_frame()


def _sorted(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_sessionize_counts_hot_user(ray_session, hot_df):
    import ray
    from logpipe_ray.stages.aggregate import sessionize_counts

    ds = ray.data.from_pandas(hot_df).repartition(8)
    got = sessionize_counts(ds, "user_id", "ts", gap_us=GAP_US).to_pandas()
    ref = _ref_sessions(hot_df)
    pd.testing.assert_frame_equal(
        _sorted(got), _sorted(ref), check_dtype=False
    )
    # the hot user's row exists and is a single (not per-batch-split) row
    assert (got["user_id"] == 0).sum() == 1


def test_interarrival_stats_hot_user(ray_session, hot_df):
    import ray
    from logpipe_ray.stages.aggregate import interarrival_stats

    ds = ray.data.from_pandas(hot_df).repartition(8)
    got = interarrival_stats(ds, "user_id", "ts").to_pandas()
    ref = _ref_interarrival(hot_df)
    pd.testing.assert_frame_equal(
        _sorted(got), _sorted(ref), check_dtype=False
    )


def test_funnel_stages_hot_user(ray_session, hot_df):
    import ray
    from logpipe_ray.stages.aggregate import funnel_stages_reached

    ds = ray.data.from_pandas(hot_df).repartition(8)
    got = funnel_stages_reached(
        ds, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).to_pandas()
    ref = _ref_funnel(hot_df)
    pd.testing.assert_frame_equal(
        _sorted(got), _sorted(ref), check_dtype=False
    )
    # every user gets a row, including stage-0 users
    assert set(got["user_id"]) == set(hot_df["user_id"].unique())


def test_sessionize_counts_string_keys_and_nulls(ray_session):
    """Key dtype is preserved (string keys) and single-event users
    count one session."""
    import ray
    from logpipe_ray.stages.aggregate import sessionize_counts

    df = pd.DataFrame(
        {
            "user_id": ["a", "a", "b", "c", "c", "c"],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",
                    "2024-01-01 01:00:00",
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:10:00",
                    "2024-01-02 00:00:00",
                ]
            ),
        }
    )
    ds = ray.data.from_pandas(df).repartition(3)
    got = sessionize_counts(ds, "user_id", "ts", gap_us=GAP_US).to_pandas()
    got = _sorted(got)
    assert list(got["user_id"]) == ["a", "b", "c"]
    assert list(got["n_sessions"]) == [2, 1, 2]
    assert list(got["n_events"]) == [2, 1, 3]
    tbl = sessionize_counts(
        ray.data.from_pandas(df), "user_id", "ts", gap_us=GAP_US
    ).schema()
    assert str(tbl.base_schema.field("user_id").type) in ("string", "large_string")


def test_copurchase_edges_sliced_expansion(ray_session):
    """The task-sliced driver route of _copurchase_edges equals a
    single global pair expansion (round-5: expansion moved off the
    driver into run-aligned Ray tasks)."""
    import ray
    from logpipe_ray.queries import _copurchase_edges, _order_pair_expand

    rng = np.random.default_rng(11)
    n = 5000
    df = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, 400, n),
            "l_partkey": rng.integers(0, 60, n),
        }
    )
    ds = ray.data.from_pandas(df).repartition(6)
    got = _copurchase_edges(ds).to_pandas()

    dd = df.drop_duplicates()
    o = dd["l_orderkey"].to_numpy(np.int64)
    p = dd["l_partkey"].to_numpy(np.int64)
    order = np.lexsort((p, o))
    u, v = _order_pair_expand(o[order], p[order])
    ref = pd.DataFrame({"u": u, "v": v})
    pd.testing.assert_frame_equal(
        _sorted(got), _sorted(ref), check_dtype=False
    )


def test_copurchase_edges_no_pairs(ray_session):
    """Orders with a single distinct part yield a typed empty edge set."""
    import ray
    from logpipe_ray.queries import _copurchase_edges

    df = pd.DataFrame({"l_orderkey": [1, 2, 3, 3], "l_partkey": [9, 8, 7, 7]})
    ds = _copurchase_edges(ray.data.from_pandas(df))
    assert ds.count() == 0
    # typed empty: schema is carried even with zero rows
    assert ds.schema().names == ["u", "v"]


def test_linreg_int_cramer_matches_lstsq(ray_session):
    """Exact integer-Cramer OLS equals numpy lstsq to float precision
    and is invariant to partitioning."""
    import ray
    from logpipe_ray.functions.linalg import linreg_fit_int_cramer

    rng = np.random.default_rng(5)
    n = 20_000
    x1 = rng.integers(0, 24, n)
    x2 = rng.integers(0, 7, n)
    y = 250 * x1 - 40 * x2 + 1300 + rng.integers(-500, 500, n)
    df = pd.DataFrame({"x1": x1, "x2": x2, "y": y})

    X = np.column_stack([x1, x2, np.ones(n)]).astype(np.float64)
    ref, *_ = np.linalg.lstsq(X, y.astype(np.float64), rcond=None)

    outs = []
    for parts in (1, 7):
        ds = ray.data.from_pandas(df).repartition(parts)
        coef, b0, cnt = linreg_fit_int_cramer(ds, ["x1", "x2"], "y")
        assert cnt == n
        outs.append((coef["x1"], coef["x2"], b0))
        np.testing.assert_allclose(
            [coef["x1"], coef["x2"], b0], ref, rtol=1e-9
        )
    # partition-invariant BITWISE (integer partials + one float division)
    assert outs[0] == outs[1]
