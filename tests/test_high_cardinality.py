import pyarrow as pa

import ray.data as rd

from logpipe_ray.stages.aggregate import count_groupby


def test_high_cardinality_groupby_exact(ray_session):
    """Worst case for the partial combiner: every batch contributes
    ~one partial row per key. Counts must still be exact."""
    n, k = 60_000, 20_000
    keys = [f"k{i % k:06d}" for i in range(n)]
    ds = rd.from_arrow(pa.table({"k": keys}))
    out = count_groupby(ds, ["k"], alias="cnt").to_pandas()
    assert len(out) == k
    assert (out["cnt"] == n // k).all()


def test_high_cardinality_salted_equal(ray_session):
    n, k = 30_000, 5_000
    tbl = pa.table(
        {
            "k": [f"k{i % k}" for i in range(n)],
            "doc_id": [f"d{i}" for i in range(n)],
        }
    )
    ds = rd.from_arrow(tbl)
    plain = count_groupby(ds, ["k"], alias="cnt").to_pandas()
    salted = count_groupby(ds, ["k"], alias="cnt", salt=16).to_pandas()
    assert dict(zip(plain["k"], plain["cnt"])) == dict(zip(salted["k"], salted["cnt"]))
