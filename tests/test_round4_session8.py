"""Round-4 session-8 operators: sketch-guided exact heavy hitters
(Misra-Gries candidates + verify pass), Pareto-frontier skyline
selection, SCD2 validity intervals, and hourly linear-interpolation
resampling. Brute-force references here; oracle parity is continuously
checked by scripts/check_correctness.py and the driver."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _brute_skyline(m1: np.ndarray, m2: np.ndarray) -> set:
    pts = list(zip(m1.tolist(), m2.tolist()))
    out = set()
    for i, (a, b) in enumerate(pts):
        dominated = any(
            (c >= a and d >= b and (c > a or d > b)) for (c, d) in pts
        )
        if not dominated:
            out.add(i)
    return out


def test_local_skyline_matches_brute():
    from logpipe_ray.stages.aggregate import local_skyline_idx as _local_skyline_idx

    rng = np.random.default_rng(11)
    m1 = rng.integers(0, 20, 200).astype(np.int64)
    m2 = rng.integers(0, 20, 200).astype(np.int64)
    got = set(_local_skyline_idx(m1, m2).tolist())
    want = _brute_skyline(m1, m2)
    # survivors are defined by their coordinates: duplicates of a
    # frontier point all survive in both implementations
    assert {(m1[i], m2[i]) for i in got} == {(m1[i], m2[i]) for i in want}
    assert got == want


def test_skyline_fold_is_batch_invariant():
    """Local-skyline-then-fold equals the one-shot global skyline —
    the property the distributed plan relies on."""
    from logpipe_ray.stages.aggregate import local_skyline_idx as _local_skyline_idx

    rng = np.random.default_rng(5)
    m1 = rng.integers(0, 1000, 5000).astype(np.int64)
    m2 = rng.integers(0, 1000, 5000).astype(np.int64)
    whole = _local_skyline_idx(m1, m2)
    surv = []
    for lo in range(0, 5000, 333):
        part = np.arange(lo, min(lo + 333, 5000))
        keep = _local_skyline_idx(m1[part], m2[part])
        surv.append(part[keep])
    surv = np.concatenate(surv)
    folded = surv[_local_skyline_idx(m1[surv], m2[surv])]
    assert set(map(tuple, np.stack([m1[whole], m2[whole]], 1))) == set(
        map(tuple, np.stack([m1[folded], m2[folded]], 1))
    )
    assert sorted(whole.tolist()) == sorted(folded.tolist())


def _write_events(tmp_path, user_id, ts_us, event_id, event_type, value):
    t = pa.table(
        {
            "event_id": pa.array(event_id, pa.int64()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "user_id": pa.array(user_id, pa.int64()),
            "event_type": pa.array(event_type, pa.string()),
            "value": pa.array(value, pa.float64()),
            "props": pa.array(["{}"] * len(user_id), pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_heavy_hitters_exact_under_sketch_truncation(ray_session, tmp_path):
    """Distinct keys (6002) far exceed the 600-counter sketch, so the
    Misra-Gries truncation actually fires; the verify pass must still
    return the exact heavy set with exact counts."""
    from logpipe_ray.queries import events_heavy_hitters

    users, types = [], []
    for i in range(6000):  # background: each (user, type) once
        users.append(1000 + i)
        types.append(f"t{i % 7}")
    users += [1] * 50 + [2] * 20  # planted heavy keys
    types += ["hot"] * 50 + ["warm"] * 20
    n = len(users)
    sf = _write_events(
        tmp_path,
        users,
        list(range(10_000_000, 10_000_000 + n)),
        list(range(1, n + 1)),
        types,
        [1.0] * n,
    )
    got = events_heavy_hitters(sf).to_pandas()
    got = got.sort_values(["user_id"]).reset_index(drop=True)
    thr = (2 * n + 999) // 1000  # 13
    assert thr == 13
    assert got["user_id"].tolist() == [1, 2]
    assert got["event_type"].tolist() == ["hot", "warm"]
    assert got["n"].tolist() == [50, 20]


def test_scd2_ts_ties_alternating_types(ray_session, tmp_path):
    from logpipe_ray.queries import users_scd2_intervals

    sf = _write_events(
        tmp_path,
        [1, 1, 1, 1, 2],
        [100, 100, 100, 200, 500],
        [1, 2, 3, 4, 5],
        ["A", "B", "A", "A", "X"],
        [0.0] * 5,
    )
    df = users_scd2_intervals(sf).to_pandas()
    df = df.sort_values(["user_id", "version"]).reset_index(drop=True)
    assert df["user_id"].tolist() == [1, 1, 1, 2]
    assert df["event_type"].tolist() == ["A", "B", "A", "X"]
    assert df["valid_from_us"].tolist() == [100, 100, 100, 500]
    to = df["valid_to_us"].tolist()
    assert to[0] == 100 and to[1] == 100
    assert pd.isna(to[2]) and pd.isna(to[3])
    assert df["version"].tolist() == [1, 2, 3, 1]


def test_resample_hand_case(ray_session, tmp_path):
    from logpipe_ray.queries import events_value_resampled

    H = 3_600_000_000
    sf = _write_events(
        tmp_path,
        [1, 1, 2, 2],
        [H, 2 * H, H // 2, 3 * H + H // 2],
        [1, 2, 3, 4],
        ["a"] * 4,
        [10.0, 30.0, 5.0, 8.0],
    )
    df = events_value_resampled(sf).to_pandas()
    df = df.sort_values(["user_id", "grid_us"]).reset_index(drop=True)
    assert df["user_id"].tolist() == [1, 1, 2, 2, 2]
    assert df["grid_us"].tolist() == [H, 2 * H, H, 2 * H, 3 * H]
    np.testing.assert_allclose(
        df["v_interp"].to_numpy(), [10.0, 30.0, 5.5, 6.5, 7.5], rtol=0, atol=0
    )


def test_resample_equal_ts_prev_next_rules(ray_session, tmp_path):
    """Two events at the same on-the-hour ts: prev takes max event_id,
    tn == tp collapses the formula to the prev value exactly."""
    from logpipe_ray.queries import events_value_resampled

    H = 3_600_000_000
    sf = _write_events(
        tmp_path,
        [7, 7],
        [H, H],
        [1, 2],
        ["a", "a"],
        [3.0, 9.0],
    )
    df = events_value_resampled(sf).to_pandas()
    assert df["grid_us"].tolist() == [H]
    assert df["v_interp"].tolist() == [9.0]  # max event_id at the tie


def test_bloom_write_pruned_read_roundtrip(ray_session, tmp_path):
    """Bloom index: zero false negatives by construction, pruning
    actually skips files, and the exact IN predicate removes any
    false-positive rows."""
    import ray.data as rd
    from logpipe_ray.sources.layout import bloom_pruned_read, bloom_write

    n = 5000
    t = pa.table(
        {
            "k": pa.array(np.arange(n, dtype=np.int64) % 500),
            "v": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    out = str(tmp_path / "bloomed")
    bloom_write(rd.from_arrow(t), "k", out, n_files=16)
    want = {3, 77, 421}
    ds, stats = bloom_pruned_read(out, sorted(want))
    assert stats["files_read"] < stats["files_total"]
    got = ds.to_pandas()
    assert set(got["k"].unique()) == want
    # every row of the wanted keys survives (no false negatives)
    assert len(got) == sum((np.arange(n) % 500 == k).sum() for k in want)


def test_bloom_membership_no_false_negative(tmp_path):
    import ray.data as rd
    from logpipe_ray.sources.layout import bloom_pruned_read, bloom_write

    t = pa.table({"k": pa.array([10, 20, 30], pa.int64())})
    out = str(tmp_path / "b2")
    bloom_write(rd.from_arrow(t), "k", out, n_files=4)
    for key in (10, 20, 30):
        _, stats = bloom_pruned_read(out, [key])
        assert stats["files_read"] >= 1


def test_linear_attribution_hand_case(ray_session, tmp_path):
    """One purchase of 100.00 with 3 qualifying clicks (one exactly at
    the 7-day edge, one outside) -> each qualifying click gets
    floor(10000 * 1e6 / 3) microcents."""
    from logpipe_ray.queries import purchases_linear_attribution

    D = 86_400_000_000
    W = 7 * D
    tp = 100 * D
    sf = _write_events(
        tmp_path,
        [5, 5, 5, 5, 5],
        [tp, tp - W, tp - 1, tp - W - 1, tp - 2 * D],
        [1, 2, 3, 4, 5],
        ["purchase", "click", "click", "click", "click"],
        [100.0, 0.0, 0.0, 0.0, 0.0],
    )
    df = purchases_linear_attribution(sf).to_pandas()
    df = df.sort_values("click_day").reset_index(drop=True)
    share = (10_000 * 1_000_000) // 3
    assert df["click_day"].tolist() == [93, 98, 99]
    assert df["n_pairs"].tolist() == [1, 1, 1]
    assert df["attributed_microcents"].tolist() == [share] * 3


def test_km_retention_hand_case(ray_session, tmp_path):
    """3 users: lifetimes 2d/2d/0d; the 0d user's last event is the
    corpus max so it is censored; at-risk counts are suffix sums."""
    from logpipe_ray.queries import events_km_retention

    D = 86_400_000_000
    sf = _write_events(
        tmp_path,
        [1, 1, 2, 2, 3],
        [0, 2 * D, D, 3 * D, 30 * D],
        [1, 2, 3, 4, 5],
        ["a"] * 5,
        [0.0] * 5,
    )
    df = events_km_retention(sf).to_pandas()
    df = df.sort_values("duration_days").reset_index(drop=True)
    assert df["duration_days"].tolist() == [0, 2]
    assert df["n_deaths"].tolist() == [0, 2]  # users 1,2 churned at 2d
    assert df["n_censored"].tolist() == [1, 0]  # user 3 still active
    assert df["n_at_risk"].tolist() == [3, 2]


def test_fluent_new_verbs(ray_session):
    """heavy_hitters / pareto_by / scd2 / resample_linear compose on
    the Pipeline like any other verb."""
    import ray.data as rd
    from logpipe_ray.api import Pipeline

    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 3], pa.int64()),
            "ts": pa.array([10, 20, 30, 10, 10], pa.int64()),
            "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "attr": pa.array(["a", "a", "b", "x", "y"]),
            "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
            "m1": pa.array([3, 2, 3, 1, 2], pa.int64()),
            "m2": pa.array([1, 2, 1, 3, 1], pa.int64()),
        }
    )
    p = Pipeline(rd.from_arrow(t))
    hh = p.heavy_hitters(["k"], 1, 2).to_pandas()  # count >= ceil(5/2)=3
    assert hh["k"].tolist() == [1] and hh["n"].tolist() == [3]
    sky = p.pareto_by("m1", "m2", ["id"]).to_pandas()
    assert set(zip(sky["m1"], sky["m2"])) == {(3, 1), (2, 2), (1, 3)}
    runs = p.scd2("k", "ts", "id", "attr").to_pandas()
    assert len(runs) == 4  # k1: a,b; k2: x; k3: y
    rs = p.resample_linear("k", "ts", "id", "v", 10).to_pandas()
    assert len(rs) == 5  # k1 grid 10/20/30, k2 grid 10, k3 grid 10


def test_curriculum_order_interleaves_deciles(ray_session, tmp_path):
    """order_idx mod 10 == decile-1, positions are unique, and walking
    order_idx visits deciles round-robin; decile matches brute NTILE
    over the same (n_chars, hash, doc_id) total order."""
    from logpipe_ray.queries import docs_curriculum_order

    n = 97  # not a multiple of 10: first 7 deciles get the extra row
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(["x"] * n),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array((np.arange(n, dtype=np.int64) * 37) % 11),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    df = docs_curriculum_order(str(tmp_path)).to_pandas()
    assert len(df) == n
    assert df["order_idx"].is_unique
    assert ((df["order_idx"] % 10) == (df["decile"] - 1)).all()
    # brute NTILE over the same total order
    h = (df["doc_id"].to_numpy(np.int64) * 2654435761 + 12345) % 1_000_000_007
    order = np.lexsort((df["doc_id"].to_numpy(), h, df["n_chars"].to_numpy()))
    rk = np.empty(n, np.int64)
    rk[order] = np.arange(n)
    q, r0 = divmod(n, 10)
    want = np.where(rk < r0 * (q + 1), rk // (q + 1), r0 + (rk - r0 * (q + 1)) // q)
    assert (df["decile"].to_numpy(np.int64) == want + 1).all()


def test_lifecycle_accounting_hand_case(ray_session, tmp_path):
    """user 1 active wk0,1,3; user 2 active wk0 only; horizon wk3:
    wk0 2 new; wk1 1 retained + 1 churned (user 2); wk2 1 churned
    (user 1's gap); wk3 1 resurrected. No churn after horizon."""
    from logpipe_ray.queries import events_lifecycle_accounting

    WK = 7 * 86_400_000_000
    sf = _write_events(
        tmp_path,
        [1, 1, 1, 2],
        [0, WK, 3 * WK, 0],
        [1, 2, 3, 4],
        ["a"] * 4,
        [0.0] * 4,
    )
    df = events_lifecycle_accounting(sf).to_pandas()
    got = {(int(r.wk), r.stage): int(r.n_users) for r in df.itertuples()}
    assert got == {
        (0, "new"): 2,
        (1, "retained"): 1,
        (1, "churned"): 1,
        (2, "churned"): 1,
        (3, "resurrected"): 1,
    }


def test_zorder_write_pruned_read_roundtrip(ray_session, tmp_path):
    """Z-order layout: exact 2-predicate result, pruning on BOTH
    dimensions (a box query touches few files; even a one-dimension
    predicate prunes, which a single-column clustering on the OTHER
    column could never do)."""
    import ray.data as rd
    from logpipe_ray.sources.layout import zorder_pruned_read, zorder_write

    rng = np.random.default_rng(3)
    n = 20_000
    x = rng.integers(0, 1000, n).astype(np.int64)
    y = rng.uniform(0, 1000, n)
    t = pa.table(
        {
            "x": pa.array(x),
            "y": pa.array(y),
            "tag": pa.array((np.arange(n) % 5).astype(np.int64)),
        }
    )
    out = str(tmp_path / "z")
    zorder_write(rd.from_arrow(t), "x", "y", out, n_files=16)
    ds, stats = zorder_pruned_read(out, x_range=(100, 200), y_range=(300.0, 400.0))
    assert stats["files_read"] < stats["files_total"]
    got = ds.to_pandas().sort_values(["x", "y"]).reset_index(drop=True)
    mask = (x >= 100) & (x <= 200) & (y >= 300.0) & (y <= 400.0)
    assert len(got) == int(mask.sum())
    assert got["x"].min() >= 100 and got["x"].max() <= 200
    # one-dimension predicate still prunes (x-only box)
    _, sx = zorder_pruned_read(out, x_range=(0, 100), y_range=None)
    assert sx["files_read"] < sx["files_total"]
    # y-only box prunes too
    _, sy = zorder_pruned_read(out, x_range=None, y_range=(0.0, 100.0))
    assert sy["files_read"] < sy["files_total"]


def test_zorder_files_balanced(ray_session, tmp_path):
    import json

    import ray.data as rd
    from logpipe_ray.sources.layout import zorder_write

    rng = np.random.default_rng(4)
    n = 8000
    t = pa.table(
        {
            "x": pa.array(rng.integers(0, 50, n).astype(np.int64)),
            "y": pa.array(rng.exponential(10.0, n)),  # skewed y
        }
    )
    out = str(tmp_path / "zb")
    zorder_write(rd.from_arrow(t), "x", "y", out, n_files=8)
    meta = json.load(open(out + "/zordermap.json"))
    rows = [z["rows"] for z in meta["zones"].values()]
    assert sum(rows) == n
    assert max(rows) <= 3 * max(1, min(rows))  # equi-depth z ranges


def test_trigram_index_grep_roundtrip(ray_session, tmp_path):
    """Trigram grep: exact matches (incl. multibyte-safe byte
    trigrams), real pruning for a rare pattern, zero results for a
    pattern whose trigrams exist nowhere."""
    import ray.data as rd
    from logpipe_ray.sources.textindex import grep_scan, trigram_index_write

    texts = ["the quick brown fox"] * 50 + ["lazy dogs sleep"] * 50
    texts[7] = "a zebra walked by"
    texts[93] = "another zebra appears"
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(100, dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    out = str(tmp_path / "trgm")
    trigram_index_write(rd.from_arrow(t), "doc_id", "text", out, n_files=16)
    ds, stats = grep_scan(out, "zebra")
    assert stats["files_read"] < stats["files_total"]
    got = ds.to_pandas()
    assert sorted(got["doc_id"].tolist()) == [7, 93]
    # absent pattern: trigrams nowhere -> zero files opened
    ds2, s2 = grep_scan(out, "xylophone")
    assert s2["files_read"] == 0
    assert (ds2 is None) or ds2.count() == 0


def test_trigram_boundary_not_crossed(ray_session, tmp_path):
    """A pattern spanning two adjacent docs must NOT match: the
    double-NUL separator kills cross-doc windows and the verify step
    is per-row."""
    import ray.data as rd
    from logpipe_ray.sources.textindex import grep_scan, trigram_index_write

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["abc", "def"]),
        }
    )
    out = str(tmp_path / "trgm2")
    trigram_index_write(rd.from_arrow(t), "doc_id", "text", out, n_files=1)
    _, s = grep_scan(out, "cde")
    # the only file is (correctly) not opened OR opened-and-empty
    ds, _ = grep_scan(out, "abc")
    assert ds.to_pandas()["doc_id"].tolist() == [0]
    ds2, s2 = grep_scan(out, "cde")
    assert s2["files_read"] == 0 or ds2.count() == 0


def test_heavy_hitters_empty_and_no_hitters(ray_session):
    """Fully-empty input and all-unique input both return a typed
    empty result (the bench-crash regression: sf0.1 has no 0.2%-heavy
    (user, type) pair)."""
    import ray.data as rd
    from logpipe_ray.stages.aggregate import heavy_hitters

    t0 = pa.table({"k": pa.array([], pa.int64()), "e": pa.array([], pa.string())})
    r0 = heavy_hitters(rd.from_arrow(t0), ["k", "e"], 2, 1000)
    assert r0.num_rows == 0
    assert r0.schema.names == ["k", "e", "n"]
    assert r0.schema.field("k").type == pa.int64()
    t1 = pa.table({"k": pa.array(np.arange(5000, dtype=np.int64))})
    r1 = heavy_hitters(rd.from_arrow(t1), ["k"], 2, 1000)
    assert r1.num_rows == 0 and r1.schema.names == ["k", "n"]


def test_rfm_driver_fastpath_equals_distributed(ray_session, monkeypatch):
    """The bounded np.partition threshold fast path returns the same
    cells as the distributed exact_rank_value route."""
    import logpipe_ray.queries as Q

    cols = ["r_bucket", "f_bucket", "m_bucket"]
    a = (
        Q.users_rfm_segments("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    monkeypatch.setattr(Q, "_RFM_DRIVER_LIMIT", 0)
    b = (
        Q.users_rfm_segments("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_ivf_layout_recall_and_pruning(ray_session, tmp_path):
    """Persisted IVF index: recall@10 >= 0.9 vs exact brute force at
    n_probe=8/16, file pruning real, and returned scores exactly equal
    the brute-force scores for the same ids."""
    import ray.data as rd
    from logpipe_ray.functions.ann import brute_force_topk
    from logpipe_ray.sources.vecindex import ivf_index_topk, ivf_index_write

    rng = np.random.default_rng(9)
    n, d = 2000, 16
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs)),
        }
    )
    out = str(tmp_path / "ivf")
    ds = rd.from_arrow(t)
    ivf_index_write(ds, "vec_id", "embedding", out, n_lists=16)
    q = vecs[:5].astype(np.float64)
    approx, stats = ivf_index_topk(out, q, k=10, n_probe=8)
    assert stats["files_read"] < stats["files_total"]
    exact = brute_force_topk(ds, q, k=10, vec_col="embedding", id_col="vec_id")
    hits = 0
    for qi in range(5):
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        hits += len(a & e)
    assert hits / 50 >= 0.9, hits
    # scores for returned ids are exact (same cosine as brute force)
    merged = approx.merge(
        exact, on=["query_id", "vec_id"], suffixes=("_a", "_e")
    )
    assert np.allclose(merged["cosine_a"], merged["cosine_e"], rtol=0, atol=0)


def test_new_stages_empty_inputs(ray_session):
    """Fully-empty inputs return typed empty results (the r3 skew_join
    lesson applied proactively to the session-8 stages)."""
    import ray.data as rd
    from logpipe_ray.stages.aggregate import (
        grouped_resample_linear,
        pareto_frontier,
        scd2_intervals,
    )

    empty = pa.table(
        {
            "k": pa.array([], pa.int64()),
            "ts": pa.array([], pa.int64()),
            "id": pa.array([], pa.int64()),
            "attr": pa.array([], pa.string()),
            "v": pa.array([], pa.float64()),
            "m1": pa.array([], pa.int64()),
            "m2": pa.array([], pa.int64()),
        }
    )
    assert len(scd2_intervals(rd.from_arrow(empty), "k", "ts", "id", "attr").to_pandas()) == 0
    assert len(
        grouped_resample_linear(rd.from_arrow(empty), "k", "ts", "id", "v", 10).to_pandas()
    ) == 0
    sky = pareto_frontier(rd.from_arrow(empty), "m1", "m2", ["k"])
    assert sky.num_rows == 0
    assert sky.schema.names == ["k", "m1", "m2"]
    assert sky.schema.field("k").type == pa.int64()


def test_query_ops_empty_events(ray_session, tmp_path):
    """Session-7 event queries return typed empties on an empty events
    table (probed proactively; km_retention and cumulative_users
    crashed before this fix)."""
    import pyarrow.parquet as _pq

    import logpipe_ray.queries as Q

    t = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "value": pa.array([], pa.float64()),
            "props": pa.array([], pa.string()),
        }
    )
    _pq.write_table(t, str(tmp_path / "events.parquet"))
    d = str(tmp_path)
    for name in (
        "purchases_linear_attribution",
        "events_lifecycle_accounting",
        "events_km_retention",
        "users_scd2_intervals",
        "events_value_resampled",
        "events_cumulative_users",
        "events_cohort_ltv",
    ):
        r = getattr(Q, name)(d)
        n = r.num_rows if isinstance(r, pa.Table) else r.count()
        assert n == 0, name


def test_adaptive_sessions_hand_case(ray_session, tmp_path):
    """User 1: gaps [10, 10, 100] -> median 10, threshold 30 -> the
    100-gap splits (2 sessions). User 2: single event -> 1 session.
    User 3: gaps [10, 50] -> median 30, threshold 90 -> no split."""
    from logpipe_ray.queries import events_adaptive_sessions

    sf = _write_events(
        tmp_path,
        [1, 1, 1, 1, 2, 3, 3, 3],
        [0, 10, 20, 120, 5, 0, 10, 60],
        [1, 2, 3, 4, 5, 6, 7, 8],
        ["a"] * 8,
        [0.0] * 8,
    )
    df = events_adaptive_sessions(sf).to_pandas().sort_values("user_id")
    assert df["user_id"].tolist() == [1, 2, 3]
    assert df["n_sessions"].tolist() == [2, 1, 1]
