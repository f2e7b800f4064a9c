"""Round-4 registry additions: independent pandas references (the
DuckDB oracle parity is covered by scripts/check_correctness.py; these
pin the semantics against a third computation path), plus unit tests
for the weighted sampler itself."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

SF = "/root/testdata/sf0.001"


def test_q3_shipping_priority_reference(ray_session):
    from logpipe_ray.queries import q3_shipping_priority

    out = (
        q3_shipping_priority(SF)
        .to_pandas()
        .sort_values(["rev", "l_orderkey"], ascending=[False, True])
        .reset_index(drop=True)
    )
    cut = pd.Timestamp("1998-06-01")
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    line = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    cust = cust[cust.c_mktsegment == "BUILDING"][["c_custkey"]]
    orders = orders[orders.o_orderdate < cut]
    line = line[line.l_shipdate > cut].copy()
    line["rev"] = np.round(line.l_extendedprice * 100).astype(np.int64) * (
        100 - np.round(line.l_discount * 100).astype(np.int64)
    )
    rev = line.groupby("l_orderkey", as_index=False)["rev"].sum()
    q = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j = rev.merge(q, left_on="l_orderkey", right_on="o_orderkey")
    ref = (
        j.sort_values(["rev", "l_orderkey"], ascending=[False, True])
        .head(10)[["l_orderkey", "o_orderdate", "rev"]]
        .reset_index(drop=True)
    )
    assert len(out) == len(ref) > 0
    assert out["l_orderkey"].tolist() == ref["l_orderkey"].tolist()
    assert out["rev"].tolist() == ref["rev"].tolist()
    assert (
        pd.to_datetime(out["o_orderdate"]).tolist()
        == pd.to_datetime(ref["o_orderdate"]).tolist()
    )


def test_events_user_distinct_by_type_reference(ray_session):
    from logpipe_ray.queries import events_user_distinct_by_type

    out = (
        events_user_distinct_by_type(SF)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ref = (
        ev.groupby("event_type")["user_id"]
        .nunique()
        .reset_index(name="n_users")
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert out["event_type"].tolist() == ref["event_type"].tolist()
    assert out["n_users"].tolist() == ref["n_users"].tolist()


def test_events_user_top_type_reference(ray_session):
    from logpipe_ray.queries import events_user_top_type

    out = (
        events_user_top_type(SF)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    c = ev.groupby(["user_id", "event_type"]).size().reset_index(name="cnt")
    c = c.sort_values(
        ["user_id", "cnt", "event_type"], ascending=[True, False, True]
    )
    ref = c.groupby("user_id").head(1).reset_index(drop=True)
    assert out["user_id"].tolist() == ref["user_id"].tolist()
    assert out["event_type"].tolist() == ref["event_type"].tolist()
    assert out["cnt"].tolist() == ref["cnt"].tolist()


def test_weighted_hash_sample_membership_and_determinism(ray_session):
    """Membership equals the direct integer-math computation, is a pure
    function of (id, weight) — identical across partitionings — and the
    realized rate tracks the weighted inclusion probability."""
    from logpipe_ray.functions.sampling import (
        HASH_A,
        HASH_B,
        HASH_M,
        weighted_hash_sample,
    )

    n = 20_000
    ids = np.arange(n, dtype=np.int64)
    rng = np.random.default_rng(7)
    w = rng.integers(1, 160, n).astype(np.int64)
    t = pa.table({"doc_id": ids, "w": w})
    w_cap, rate = 80, 60

    got = {}
    for parts in (2, 17):
        ds = rd.from_arrow(t).repartition(parts)
        out = (
            weighted_hash_sample(ds, "doc_id", "w", w_cap=w_cap, rate_pct=rate)
            .to_pandas()
            .sort_values("doc_id")
        )
        got[parts] = out["doc_id"].to_numpy()
    assert (got[2] == got[17]).all()

    h = (ids * HASH_A + HASH_B) % HASH_M
    keep = h * (w_cap * 100) < HASH_M * rate * np.minimum(w, w_cap)
    assert (got[2] == ids[keep]).all()

    # realized rate ~ E[p] = rate/100 * E[min(w,cap)]/cap (binomial CI)
    p = (rate / 100) * np.minimum(w, w_cap) / w_cap
    exp, sd = p.sum(), np.sqrt((p * (1 - p)).sum())
    assert abs(keep.sum() - exp) < 5 * sd

    # weighting is real: kept docs are longer on average than dropped
    assert w[keep].mean() > w[~keep].mean()


def test_q3_route_equivalence(ray_session):
    """Broadcast (default at test scale) and two-hash-join routes must
    agree — forced via broadcast_limit=0."""
    from logpipe_ray.queries import q3_shipping_priority

    outs = []
    for lim in (2_000_000, 0):
        o = (
            q3_shipping_priority(SF, broadcast_limit=lim)
            .to_pandas()
            .sort_values(["rev", "l_orderkey"], ascending=[False, True])
            .reset_index(drop=True)
        )
        outs.append(o)
    a, b = outs
    assert len(a) == len(b) == 10
    assert a["l_orderkey"].tolist() == b["l_orderkey"].tolist()
    assert a["rev"].tolist() == b["rev"].tolist()
    assert (
        pd.to_datetime(a["o_orderdate"]).tolist()
        == pd.to_datetime(b["o_orderdate"]).tolist()
    )


def test_bigram_lift_reference(ray_session):
    """Engine lift scores equal a from-scratch pandas/numpy reference
    bitwise (IEEE-exact int->double conversions and fixed-order
    multiply/divide)."""
    from logpipe_ray.fixtures.generator import ensure_sequences
    from logpipe_ray.queries import seq_bigram_lift_topk

    out = (
        seq_bigram_lift_topk(SF)
        .to_pandas()
        .sort_values(["lift", "t1", "t2"], ascending=[False, True, True])
        .reset_index(drop=True)
    )
    import glob

    seq_dir = ensure_sequences(SF)
    toks = pd.concat(
        [pq.read_table(p, columns=["tokens"]).to_pandas() for p in
         sorted(glob.glob(f"{seq_dir}/shard_*.parquet"))]
    )["tokens"]
    uni = {}
    bi = {}
    nu = nb = 0
    for row in toks:
        arr = np.asarray(row)
        nu += len(arr)
        nb += max(len(arr) - 1, 0)
        for t in arr:
            uni[int(t)] = uni.get(int(t), 0) + 1
        for x, y in zip(arr[:-1], arr[1:]):
            k = (int(x), int(y))
            bi[k] = bi.get(k, 0) + 1
    rows = []
    for (x, y), cxy in bi.items():
        if cxy < 5:
            continue
        lift = ((float(cxy) * float(nu)) * float(nu)) / (
            (float(nb) * float(uni[x])) * float(uni[y])
        )
        rows.append((x, y, cxy, lift))
    ref = (
        pd.DataFrame(rows, columns=["t1", "t2", "cnt", "lift"])
        .sort_values(["lift", "t1", "t2"], ascending=[False, True, True])
        .head(50)
        .reset_index(drop=True)
    )
    assert len(out) == len(ref) == 50
    assert out["t1"].tolist() == ref["t1"].tolist()
    assert out["t2"].tolist() == ref["t2"].tolist()
    assert out["cnt"].tolist() == ref["cnt"].tolist()
    assert (out["lift"].to_numpy() == ref["lift"].to_numpy()).all()  # bitwise


def test_bigram_lift_join_route_equivalence(ray_session):
    """LUT-broadcast and double-hash-join routes agree (forced via
    lut_vocab_limit=0)."""
    import ray.data as rd
    from logpipe_ray.functions.tokens import bigram_lift_topk

    rng = np.random.default_rng(5)
    rows = [rng.integers(0, 40, rng.integers(2, 30)).astype(np.int32)
            for _ in range(300)]
    t = pa.table({"tokens": pa.array([list(map(int, r)) for r in rows],
                                     pa.list_(pa.int32()))})
    outs = []
    for lim in (5_000_000, 0):
        ds = rd.from_arrow(t).repartition(4)
        o = (
            bigram_lift_topk(ds, k=30, min_count=3, lut_vocab_limit=lim)
            .to_pandas()
            .sort_values(["lift", "t1", "t2"], ascending=[False, True, True])
            .reset_index(drop=True)
        )
        outs.append(o)
    a, b = outs
    assert len(a) == len(b) > 0
    assert a["t1"].tolist() == b["t1"].tolist()
    assert a["t2"].tolist() == b["t2"].tolist()
    assert (a["lift"].to_numpy() == b["lift"].to_numpy()).all()


def test_docs_readability_reference(ray_session):
    from logpipe_ray.queries import docs_readability

    out = (
        docs_readability(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    import re

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    w = docs["text"].str.split(" ").str.len().clip(lower=1).astype(np.int64)
    s = docs["text"].str.count(re.escape(".")).clip(lower=1).astype(np.int64)
    sy = docs["text"].str.count("[aeiouAEIOU]+").astype(np.int64)
    flesch = (206.835 - (1.015 * (w.to_numpy(float) / s.to_numpy(float)))) - (
        84.6 * (sy.to_numpy(float) / w.to_numpy(float))
    )
    assert out["doc_id"].tolist() == docs["doc_id"].tolist()
    assert out["n_words"].tolist() == w.tolist()
    assert out["n_sents"].tolist() == s.tolist()
    assert out["n_syll"].tolist() == sy.tolist()
    assert (out["flesch"].to_numpy() == flesch).all()  # bitwise


def test_events_wau_daily_reference(ray_session):
    from logpipe_ray.queries import events_wau_daily

    out = (
        events_wau_daily(SF).to_pandas().sort_values("wday").reset_index(drop=True)
    )
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    day = (
        ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    ).to_numpy()
    pairs = set(zip(ev["user_id"].tolist(), day.tolist()))
    from collections import defaultdict

    wau = defaultdict(set)
    for u, d in pairs:
        for o in range(7):
            wau[d + o].add(u)
    ref = sorted((w, len(s)) for w, s in wau.items())
    assert out["wday"].tolist() == [w for w, _ in ref]
    assert out["wau"].tolist() == [n for _, n in ref]


def test_pca_project_vs_numpy(ray_session):
    """Engine PCA equals full-data numpy PCA: same subspace (projections
    match within float-merge tolerance after sign convention), components
    orthonormal, variance ordering correct."""
    from logpipe_ray.functions.linalg import pca_fit
    from logpipe_ray.queries import embeddings_pca_project

    out = (
        embeddings_pca_project(SF)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    t = pq.read_table(f"{SF}/embeddings.parquet")
    X = np.asarray(
        t["embedding"].combine_chunks().flatten(), dtype=np.float64
    ).reshape(t.num_rows, -1)
    ids = np.asarray(t["vec_id"])
    mean = X.mean(axis=0)
    cov = np.cov(X.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:2]
    W = evecs[:, order]
    flip = W[np.abs(W).argmax(axis=0), np.arange(2)] < 0
    W[:, flip] *= -1.0
    P = (X - mean) @ W
    ref = P[np.argsort(ids)]
    got = out[["pc1", "pc2"]].to_numpy()
    assert out["vec_id"].tolist() == sorted(ids.tolist())
    assert np.allclose(got, ref, atol=1e-8)
    # variance ordering: pc1 explains at least as much as pc2
    assert got[:, 0].var() >= got[:, 1].var()
    # fit API: orthonormal components
    import ray.data as rd

    m2, W2 = pca_fit(rd.from_arrow(t).repartition(5), "embedding", k=3)
    assert np.allclose(W2.T @ W2, np.eye(3), atol=1e-10)
    assert np.allclose(m2, mean, atol=1e-12)


def test_events_type_share_reference(ray_session):
    from logpipe_ray.queries import events_type_share

    out = (
        events_type_share(SF)
        .to_pandas()
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    c = (
        ev.groupby(["user_id", "event_type"])
        .size()
        .reset_index(name="cnt")
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )
    tot = c.groupby("user_id")["cnt"].transform("sum")
    share = c["cnt"].to_numpy(np.float64) / tot.to_numpy(np.float64)
    assert out["user_id"].tolist() == c["user_id"].tolist()
    assert out["event_type"].tolist() == c["event_type"].tolist()
    assert out["cnt"].tolist() == c["cnt"].tolist()
    assert (out["share"].to_numpy() == share).all()  # bitwise
    # shares sum to 1 per user
    s = out.groupby("user_id")["share"].sum()
    assert np.allclose(s.to_numpy(), 1.0)
