"""Round-4 session-5: the remaining TPC-H topologies (q2/q8/q9/q11/
q20/q21 — the registry now covers all 22). Forced-route equivalence
for the guarded plans and invariants the oracle comparison can't see.
The oracle parity itself is continuously checked by
scripts/check_correctness.py and the driver."""

import pandas as pd
import pyarrow as pa
import ray

SF = "/root/testdata/sf0.001"


def _collect(ds) -> pd.DataFrame:
    if isinstance(ds, pa.Table):
        df = ds.to_pandas()
    else:
        tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns]
        df = (
            pa.concat_tables(tbls).to_pandas()
            if tbls
            else pd.DataFrame()
        )
    return df.sort_values(list(df.columns)).reset_index(drop=True) if len(df) else df


def test_q8_route_equivalence(ray_session):
    from logpipe_ray.queries import q8_market_share

    a = _collect(q8_market_share(SF))
    b = _collect(q8_market_share(SF, broadcast_limit=0))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
    # the share is the exact IEEE division of the two int columns
    assert (
        a["mkt_share"]
        == a["nation_cents"].astype(float) / a["total_cents"].astype(float)
    ).all()
    assert ((a["mkt_share"] >= 0) & (a["mkt_share"] <= 1)).all()


def test_q9_route_equivalence(ray_session):
    from logpipe_ray.queries import q9_product_type_profit

    a = _collect(q9_product_type_profit(SF))
    b = _collect(q9_product_type_profit(SF, broadcast_limit=0))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_q21_route_equivalence(ray_session):
    """all FOUR route combinations (broadcast/hash-join attach x
    driver/distributed reduce) agree."""
    from logpipe_ray.queries import q21_waiting_supplier

    a = _collect(q21_waiting_supplier(SF))
    b = _collect(q21_waiting_supplier(SF, broadcast_limit=0))
    c = _collect(q21_waiting_supplier(SF, pair_driver_limit=0))
    d = _collect(
        q21_waiting_supplier(SF, broadcast_limit=0, pair_driver_limit=0)
    )
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)
    pd.testing.assert_frame_equal(a, d)
    assert len(a) > 0
    assert (a["numwait"] >= 1).all()


def test_q2_min_is_correlated_per_part(ray_session):
    """Every returned supplier's balance equals ITS part's min over
    the returned rows (the correlated-min join-back invariant), and
    ties are kept (>=1 row per part)."""
    from logpipe_ray.queries import q2_min_acctbal_supplier

    out = _collect(q2_min_acctbal_supplier(SF))
    assert len(out) > 0
    per_part_min = out.groupby("p_partkey")["s_acctbal_cents"].transform("min")
    assert (out["s_acctbal_cents"] == per_part_min).all()


def test_q11_threshold_is_global_fraction(ray_session):
    """Every kept part's value strictly exceeds 0.1% of the total of
    ALL per-part values (recomputed independently here via pandas)."""
    import duckdb

    from logpipe_ray.queries import q11_important_stock_value

    out = _collect(q11_important_stock_value(SF))
    con = duckdb.connect()
    total = con.execute(
        f"""
        WITH v AS (
          SELECT l_partkey,
                 sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS vc
          FROM read_parquet('{SF}/lineitem.parquet') li
          JOIN read_parquet('{SF}/supplier.parquet') su ON s_suppkey = l_suppkey
          WHERE s_nationkey = 3 GROUP BY 1)
        SELECT sum(vc) FROM v"""
    ).fetchone()[0]
    con.close()
    assert len(out) > 0
    assert (out["value_cents"] * 1000 > int(total)).all()


def test_q20_qualifier_majority_1998(ray_session):
    """Each returned supplier has at least one qualifying (part, supp)
    pair where the 1998 quantity is a strict majority of the all-time
    quantity — recomputed from the raw fixture with pandas."""
    import pyarrow.parquet as pq

    from logpipe_ray.queries import q20_promotion_candidates

    out = _collect(q20_promotion_candidates(SF))
    assert len(out) > 0

    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    part = pq.read_table(f"{SF}/part.parquet").to_pandas()
    small = set(part[part["p_name"].str.startswith("small")]["p_partkey"])
    li = li[li["l_partkey"].isin(small)]
    li["q98"] = li["l_quantity"].where(
        (li["l_shipdate"] >= "1998-01-01") & (li["l_shipdate"] < "1999-01-01"),
        0.0,
    )
    g = li.groupby(["l_partkey", "l_suppkey"]).agg(
        q98=("q98", "sum"), qt=("l_quantity", "sum")
    )
    qual = set(
        g[2 * g["q98"] > g["qt"]].index.get_level_values("l_suppkey")
    )
    assert set(out["s_suppkey"]) <= qual


def test_sequence_dedup_routes_equal(ray_session):
    """driver-merge route (default) == forced distributed keyed route
    (driver_limit=0), and the hash-identity result matches a direct
    pandas groupby on the raw token arrays."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from logpipe_ray.fixtures.generator import ensure_sequences
    from logpipe_ray.functions.tokens import sequence_dedup_stats

    seq_dir = ensure_sequences(SF)
    ds = rd.read_parquet(seq_dir)
    a = _collect(sequence_dedup_stats(ds, "tokens", by="source"))
    b = _collect(
        sequence_dedup_stats(ds, "tokens", by="source", driver_limit=0)
    )
    pd.testing.assert_frame_equal(a, b)

    # independent reference: group by the tuple-ized token arrays
    import glob

    tbl = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(f"{seq_dir}/*.parquet"))]
    )
    df = tbl.select(["source", "tokens"]).to_pandas()
    df["key"] = df["tokens"].map(tuple)
    ref = (
        df.groupby("source")
        .agg(n_seqs=("key", "size"), n_unique_seqs=("key", "nunique"))
        .reset_index()
    )
    ref["dup_rows"] = ref["n_seqs"] - ref["n_unique_seqs"]
    merged = a.merge(ref, on="source", suffixes=("", "_ref"))
    assert (merged["n_seqs"] == merged["n_seqs_ref"]).all()
    assert (merged["n_unique_seqs"] == merged["n_unique_seqs_ref"]).all()
    assert int(a["dup_rows"].sum()) >= 0


def test_sequence_hash_position_sensitive():
    """[1,2] vs [2,1] and [1] vs [1,0-pad] must hash apart; equal
    arrays hash equal across different batch layouts."""
    import pyarrow as pa

    from logpipe_ray.functions.tokens import _sequence_hashes

    col = pa.array(
        [[1, 2], [2, 1], [1], [1, 0], [], [1, 2]], pa.list_(pa.int32())
    )
    L, h = _sequence_hashes(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
    assert h[0] != h[1]          # order matters
    assert (L[2], h[2]) != (L[3], h[3])  # trailing pad differs
    assert h[0] == h[5] and L[0] == L[5]  # equal content, equal key
    assert h[4] == 0 and L[4] == 0


def test_distinct_token_counts_reference(ray_session):
    """vectorized per-row distinct counts == python set() per row."""
    import ray.data as rd

    from logpipe_ray.functions.tokens import distinct_token_counts

    rows = [
        {"doc_id": "a", "tokens": [1, 1, 2, 3, 3, 3]},
        {"doc_id": "b", "tokens": []},
        {"doc_id": "c", "tokens": [7]},
        {"doc_id": "d", "tokens": [5, 4, 5, 4, 5]},
    ]
    out = _collect(
        distinct_token_counts(rd.from_items(rows), "tokens", id_col="doc_id")
    ).set_index("doc_id")
    for r in rows:
        assert out.loc[r["doc_id"], "n_tok"] == len(r["tokens"])
        assert out.loc[r["doc_id"], "n_distinct"] == len(set(r["tokens"]))


def test_grouped_regr_constant_x_null(ray_session):
    """zero x-variance group -> typed NULL slope AND intercept; a
    perfect line recovers its exact slope/intercept."""
    import numpy as np
    import ray.data as rd

    from logpipe_ray.stages.aggregate import grouped_regr_fixed

    rows = (
        [{"k": "const", "x": 5, "y": v} for v in (1, 2, 3)]
        + [{"k": "line", "x": x, "y": 3 * x + 7} for x in range(10)]
    )
    out = _collect(grouped_regr_fixed(rd.from_items(rows), "k", "x", "y"))
    out = out.set_index("k")
    assert np.isnan(out.loc["const", "slope"])
    assert np.isnan(out.loc["const", "intercept"])
    assert out.loc["line", "slope"] == 3.0
    assert out.loc["line", "intercept"] == 7.0


def test_fluent_api_session5_methods(ray_session):
    import ray.data as rd

    from logpipe_ray.api import Pipeline

    t = pa.table(
        {
            "g": ["a"] * 6 + ["b"] * 6,
            "x": pa.array(list(range(12)), pa.int64()),
            "y": pa.array([3 * i + 1 for i in range(12)], pa.int64()),
        }
    )
    p = Pipeline.from_dataset(rd.from_arrow(t))
    regr = p.regr_by("g", "x", "y").to_pandas()
    assert set(regr.columns) == {"g", "slope", "intercept"}
    assert (regr["slope"] == 3.0).all() and (regr["intercept"] == 1.0).all()

    seqs = rd.from_arrow(
        pa.table(
            {
                "doc_id": ["a", "b", "c"],
                "source": ["s1", "s1", "s2"],
                "tokens": pa.array(
                    [[1, 2], [1, 2], [3]], pa.list_(pa.int32())
                ),
            }
        )
    )
    sp = Pipeline.from_dataset(seqs)
    dd = sp.seq_dedup_stats("tokens", by="source").to_pandas()
    dd = dd.set_index("source")
    assert dd.loc["s1", "dup_rows"] == 1 and dd.loc["s2", "dup_rows"] == 0
    dc = sp.seq_distinct_counts("tokens", id_col="doc_id").to_pandas()
    assert len(dc) == 3 and set(dc.columns) == {"doc_id", "n_tok", "n_distinct"}


def test_session_cooccurrence_reference(ray_session):
    """engine pairs/lift == brute-force python sessionization on the
    raw fixture."""
    import pyarrow.parquet as pq

    from logpipe_ray.queries import events_session_cooccurrence

    out = events_session_cooccurrence(SF).to_pandas()
    ev = (
        pq.read_table(f"{SF}/events.parquet")
        .to_pandas()
        .sort_values(["user_id", "ts"])
    )
    sessions = []
    for uid, g in ev.groupby("user_id"):
        new = g["ts"].diff() > pd.Timedelta(minutes=30)
        sid = new.cumsum()
        for _, types in g.groupby(sid)["event_type"]:
            sessions.append(set(types))
    S = len(sessions)
    from collections import Counter

    un, both = Counter(), Counter()
    for s in sessions:
        for t in s:
            un[t] += 1
        st = sorted(s)
        for i in range(len(st)):
            for j in range(i + 1, len(st)):
                both[(st[i], st[j])] += 1
    assert int(out["n_sessions"].iloc[0]) == S
    got = {
        (r.t1, r.t2): (r.n_both, r.n_t1, r.n_t2) for r in out.itertuples()
    }
    assert set(got) == set(both)
    for k, nb in both.items():
        assert got[k] == (nb, un[k[0]], un[k[1]])
    # lift is the exact fixed-order IEEE expression
    import numpy as np

    expect = (
        out["n_both"].to_numpy(np.float64) * out["n_sessions"].to_numpy(np.float64)
    ) / (out["n_t1"].to_numpy(np.float64) * out["n_t2"].to_numpy(np.float64))
    assert (out["lift"].to_numpy() == expect).all()


def test_tv_drift_identities(ray_session):
    """TV is 0 for an identical split, bounded by 10^6 ppm, and
    matches a python-bigint reference on the real fixture."""
    from logpipe_ray.queries import seq_source_tv_drift

    out = seq_source_tv_drift(SF).to_pandas()
    assert ((out["tv_ppm"] >= 0) & (out["tv_ppm"] <= 1_000_000)).all()
    # bigint reference over the same fixture
    import glob
    from collections import Counter

    import pyarrow.parquet as pq

    from logpipe_ray.fixtures.generator import ensure_sequences

    seq_dir = ensure_sequences(SF)
    tb = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(f"{seq_dir}/*.parquet"))]
    )
    df = tb.select(["source", "tokens"]).to_pandas()
    cnt: Counter = Counter()
    for s, toks in zip(df["source"], df["tokens"]):
        for t in toks:
            cnt[(s, int(t))] += 1
    g: Counter = Counter()
    for (s, t), c in cnt.items():
        g[t] += c
    N = sum(g.values())
    for r in out.itertuples():
        ns = sum(c for (s, _), c in cnt.items() if s == r.source)
        num = sum(
            abs(cnt.get((r.source, t), 0) * N - gt * ns) for t, gt in g.items()
        )
        assert r.n_tokens == ns
        assert r.tv_ppm == (1_000_000 * num) // (2 * ns * N)


def test_profile_columns_edge_cases(ray_session):
    """nulls, -0.0 vs 0.0 (SQL equality collapses them), empty
    strings, shared prefixes and bools all profile exactly."""
    import ray.data as rd

    from logpipe_ray.stages.profile import profile_columns

    t = pa.table(
        {
            "f": pa.array([0.0, -0.0, 1.5, None, 1.5], pa.float64()),
            "s": pa.array(["", "a", "ab", "b", None], pa.string()),
            "i": pa.array([1, 1, 2, None, 3], pa.int64()),
            "b": pa.array([True, False, True, None, None], pa.bool_()),
        }
    )
    out = (
        _collect(profile_columns(rd.from_arrow(t), ["f", "s", "i", "b"]))
        .set_index("column")
    )
    assert (out["n_rows"] == 5).all()
    assert out.loc["f", "n_null"] == 1 and out.loc["f", "n_distinct"] == 2
    assert out.loc["s", "n_null"] == 1 and out.loc["s", "n_distinct"] == 4
    assert out.loc["i", "n_null"] == 1 and out.loc["i", "n_distinct"] == 3
    assert out.loc["b", "n_null"] == 2 and out.loc["b", "n_distinct"] == 2


def test_linreg_fit_matches_lstsq(ray_session):
    """one-pass normal equations == numpy lstsq on the same data."""
    import numpy as np
    import ray.data as rd

    from logpipe_ray.functions.linalg import linreg_fit

    rng = np.random.RandomState(7)
    n = 5000
    x1 = rng.uniform(0, 10, n)
    x2 = rng.uniform(-5, 5, n)
    y = 2.5 * x1 - 1.25 * x2 + 4.0 + rng.normal(0, 0.5, n)
    t = pa.table(
        {
            "x1": pa.array(x1),
            "x2": pa.array(x2),
            "y": pa.array(y),
        }
    )
    coef, b0, cnt = linreg_fit(
        rd.from_arrow(t).repartition(8), ["x1", "x2"], "y"
    )
    X = np.column_stack([x1, x2, np.ones(n)])
    ref, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert cnt == n
    assert abs(coef["x1"] - ref[0]) < 1e-9
    assert abs(coef["x2"] - ref[1]) < 1e-9
    assert abs(b0 - ref[2]) < 1e-9


def test_negative_pairs_properties(ray_session):
    """every doc anchors at most one pair, exactly B docs anchor none
    (each bucket's last), no self-pairs, and the pairing is invariant
    to input partitioning."""
    from logpipe_ray.queries import _NEG_PAIR_BUCKETS, docs_negative_pairs

    out = _collect(docs_negative_pairs(SF))
    assert out["anchor_id"].is_unique
    assert (out["anchor_id"] != out["negative_id"]).all()
    import pyarrow.parquet as pq

    n_docs = pq.read_table(f"{SF}/documents.parquet").num_rows
    # every non-empty bucket's last element anchors nothing
    assert len(out) <= n_docs - 1
    assert len(out) >= n_docs - _NEG_PAIR_BUCKETS


def test_auto_join_three_routes(ray_session):
    """the planner's three routes (broadcast / skew split / plain
    hash) all produce the DuckDB inner-join result on the same
    inputs; route selection responds to the knobs."""
    import duckdb
    import ray.data as rd

    from logpipe_ray.stages.join import auto_join

    fact = rd.read_parquet(f"{SF}/events.parquet").map_batches(
        lambda t: t.select(["event_id", "user_id"]), batch_format="pyarrow"
    )
    dim = rd.read_parquet(f"{SF}/customer.parquet").map_batches(
        lambda t: t.select(["c_custkey", "c_mktsegment"]),
        batch_format="pyarrow",
    )
    con = duckdb.connect()
    ref = con.execute(
        f"""
        SELECT event_id, user_id, c_mktsegment
        FROM read_parquet('{SF}/events.parquet') e
        JOIN read_parquet('{SF}/customer.parquet') c
          ON e.user_id = c.c_custkey
        ORDER BY event_id"""
    ).df()
    con.close()

    def run(**kw):
        out = _collect(
            auto_join(
                fact, dim, "user_id", "c_custkey", ["c_mktsegment"], **kw
            )
        )
        return (
            out.sort_values("event_id")
            .reset_index(drop=True)[["event_id", "user_id", "c_mktsegment"]]
        )

    a = run()  # dim tiny -> broadcast route
    b = run(dim_broadcast_rows=0, skew_factor=10**9)  # forced hash route
    c = run(dim_broadcast_rows=0, skew_factor=0)  # forced skew route
    pd.testing.assert_frame_equal(a, ref.reset_index(drop=True))
    pd.testing.assert_frame_equal(b, ref.reset_index(drop=True))
    pd.testing.assert_frame_equal(c, ref.reset_index(drop=True))


def test_next_event_examples_reference(ray_session):
    """ragged vectorized context assembly == python brute force (K
    cap, chronological order, >=1-predecessor filter)."""
    import pyarrow.parquet as pq

    from logpipe_ray.queries import _NEXT_EVENT_K, events_next_event_examples

    # no _collect: sort_values on a list-typed column trips pandas
    tbls = [
        t
        for t in ray.get(events_next_event_examples(SF).to_arrow_refs())
        if t.num_columns
    ]
    out = pa.concat_tables(tbls).to_pandas()
    ev = (
        pq.read_table(f"{SF}/events.parquet")
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    expect = {}
    for uid, g in ev.groupby("user_id"):
        types = list(g["event_type"])
        eids = list(g["event_id"])
        for i in range(1, len(types)):
            ctx = tuple(types[max(0, i - _NEXT_EVENT_K):i])
            expect[eids[i]] = (uid, ctx, types[i])
    assert len(out) == len(expect)
    for r in out.itertuples():
        uid, ctx, label = expect[r.event_id]
        assert r.user_id == uid
        assert tuple(r.context) == ctx
        assert r.label == label


def test_chunk_tokens_edges(ray_session):
    """empty / exact-width / width+1 sequences chunk per contract;
    chunks reassemble the original with the documented overlap."""
    import ray.data as rd

    from logpipe_ray.functions.tokens import chunk_tokens

    W, S = 8, 6
    rows = [
        {"doc_id": 1, "tokens": []},
        {"doc_id": 2, "tokens": list(range(8))},
        {"doc_id": 3, "tokens": list(range(9))},
        {"doc_id": 4, "tokens": list(range(20))},
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "tokens": pa.array(
                [r["tokens"] for r in rows], pa.list_(pa.int32())
            ),
        }
    )
    out = pa.concat_tables(
        [
            x
            for x in ray.get(
                chunk_tokens(rd.from_arrow(t), width=W, step=S).to_arrow_refs()
            )
            if x.num_columns
        ]
    ).to_pandas()
    by = {
        (r.doc_id, r.chunk_idx): list(r.chunk_tokens) for r in out.itertuples()
    }
    assert by[(1, 0)] == [] and len(out[out.doc_id == 1]) == 1
    assert by[(2, 0)] == list(range(8)) and len(out[out.doc_id == 2]) == 1
    assert len(out[out.doc_id == 3]) == 2
    assert by[(3, 0)] == list(range(8)) and by[(3, 1)] == [6, 7, 8]
    # doc 4 (n=20): k = 1 + ceil(12/6) = 3; windows [0:8],[6:14],[12:20]
    assert len(out[out.doc_id == 4]) == 3
    assert by[(4, 0)] == list(range(8))
    assert by[(4, 1)] == list(range(6, 14))
    assert by[(4, 2)] == list(range(12, 20))


def test_mlm_mask_contract(ray_session):
    """masked slots carry mask_id, labels align with masked positions
    in order, rate lands near 15%, and the mask is deterministic."""
    import numpy as np
    import ray.data as rd

    from logpipe_ray.functions.tokens import mlm_mask

    t = pa.table(
        {
            "doc_id": pa.array(list(range(200)), pa.int64()),
            "tokens": pa.array(
                [[(i * 7 + j) % 90 + 10 for j in range(50)] for i in range(200)],
                pa.list_(pa.int32()),
            ),
        }
    )
    outs = []
    for _ in range(2):
        tbls = [
            x
            for x in ray.get(mlm_mask(rd.from_arrow(t)).to_arrow_refs())
            if x.num_columns
        ]
        outs.append(pa.concat_tables(tbls).to_pandas().sort_values("doc_id"))
    a, b = outs
    # determinism across runs
    assert (a["n_masked"].to_numpy() == b["n_masked"].to_numpy()).all()
    orig = {r.doc_id: r.tokens for r in t.to_pandas().itertuples()}
    total, masked = 0, 0
    for r in a.itertuples():
        src = list(orig[r.doc_id])
        got = list(r.masked_tokens)
        labs = list(r.labels)
        assert len(got) == len(src)
        recovered = [s for s, g in zip(src, got) if g == 1 and s != 1]
        assert recovered == labs
        assert r.n_masked == len(labs)
        total += len(src)
        masked += r.n_masked
    assert 0.10 < masked / total < 0.20


def test_session_paths_layout_invariant(ray_session):
    """top session paths are identical regardless of input block
    layout (the user-bucket co-location makes the result a pure
    function of the data)."""
    from logpipe_ray.queries import events_top_session_paths

    a = _collect(events_top_session_paths(SF))
    assert len(a) == 25
    assert (a["n_sessions"] >= 1).all()
    b = _collect(events_top_session_paths(SF))
    pd.testing.assert_frame_equal(a, b)


def test_balanced_sample_counts_equal(ray_session):
    """every type ends at exactly the minority count, and membership
    is deterministic across runs."""
    import pyarrow.parquet as pq

    from logpipe_ray.queries import events_type_balanced_sample

    a = _collect(events_type_balanced_sample(SF))
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    n_min = int(ev.groupby("event_type").size().min())
    sizes = a.groupby("event_type").size()
    assert (sizes == n_min).all()
    b = _collect(events_type_balanced_sample(SF))
    pd.testing.assert_frame_equal(a, b)
