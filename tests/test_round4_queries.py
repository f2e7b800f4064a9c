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
