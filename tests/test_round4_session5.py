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
    from logpipe_ray.queries import q21_waiting_supplier

    a = _collect(q21_waiting_supplier(SF))
    b = _collect(q21_waiting_supplier(SF, broadcast_limit=0))
    pd.testing.assert_frame_equal(a, b)
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
