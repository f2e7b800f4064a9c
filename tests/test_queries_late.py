"""Late round-3 registry queries: independent pandas references
(the DuckDB oracle parity is covered by scripts/check_correctness.py;
these pin the semantics against a third computation path)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_events_hourly_anomaly_reference(ray_session):
    from logpipe_ray.queries import events_hourly_anomaly

    out = (
        events_hourly_anomaly(SF)
        .to_pandas()
        .sort_values(["event_type", "hour"])
        .reset_index(drop=True)
    )
    ev = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "ts"]).to_pandas()
    ev["hour"] = ev["ts"].dt.floor("h")
    c = ev.groupby(["event_type", "hour"]).size().reset_index(name="cnt")
    rows = []
    for et, g in c.groupby("event_type"):
        x = g["cnt"].to_numpy(dtype=np.int64)
        n, sx, sxx = len(x), int(x.sum()), int((x * x).sum())
        var_num = n * sxx - sx * sx
        if var_num <= 0:
            continue
        z = (x.astype(np.float64) - (float(sx) / n)) / np.sqrt(
            float(var_num) / (n * n)
        )
        for (hour, cnt), zz in zip(g[["hour", "cnt"]].to_numpy(), z):
            if abs(zz) >= 2.0:
                rows.append((et, hour, int(cnt), zz))
    ref = (
        pd.DataFrame(rows, columns=["event_type", "hour", "cnt", "z"])
        .sort_values(["event_type", "hour"])
        .reset_index(drop=True)
    )
    assert len(out) == len(ref) > 0
    assert (out["event_type"].to_numpy() == ref["event_type"].to_numpy()).all()
    assert (out["cnt"].to_numpy() == ref["cnt"].to_numpy()).all()
    assert (out["z"].to_numpy() == ref["z"].to_numpy()).all()  # bitwise


def test_customers_order_profile_reference(ray_session):
    from logpipe_ray.queries import customers_order_profile

    out = (
        customers_order_profile(SF)
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    cust = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).to_pandas()
    orders["cents"] = np.round(orders["o_totalprice"] * 100.0).astype(np.int64)
    agg = orders.groupby("o_custkey").agg(
        n_orders=("cents", "size"), total_cents=("cents", "sum")
    )
    ref = cust.join(agg, on="c_custkey").fillna(0).sort_values("c_custkey")
    assert len(out) == len(cust)  # LEFT join: every customer present
    assert (out["n_orders"].to_numpy() == ref["n_orders"].to_numpy(dtype=np.int64)).all()
    assert (
        out["total_cents"].to_numpy() == ref["total_cents"].to_numpy(dtype=np.int64)
    ).all()


def test_customers_order_profile_keeps_zero_order_customers(
    ray_session, tmp_path
):
    """The LEFT OUTER semantics: a customer with no orders still
    appears, with zeros (sf0.001 happens to have none, so synthesize)."""
    import pyarrow as pa

    from logpipe_ray.queries import customers_order_profile

    pq.write_table(
        pa.table(
            {
                "c_custkey": [1, 2, 3],
                "c_name": ["a", "b", "c"],
                "c_nationkey": [0, 0, 0],
                "c_acctbal": [1.0, 2.0, 3.0],
                "c_mktsegment": ["X", "Y", "Z"],
            }
        ),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": [10, 11],
                "o_custkey": [1, 1],
                "o_orderstatus": ["F", "F"],
                "o_totalprice": [12.34, 0.66],
                "o_orderdate": ["1995-01-01", "1995-01-02"],
                "o_orderpriority": ["1-URGENT", "1-URGENT"],
            }
        ),
        tmp_path / "orders.parquet",
    )
    out = (
        customers_order_profile(str(tmp_path))
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    assert out["c_custkey"].tolist() == [1, 2, 3]
    assert out["n_orders"].tolist() == [2, 0, 0]
    assert out["total_cents"].tolist() == [1300, 0, 0]
