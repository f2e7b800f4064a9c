import pyarrow as pa
import pytest

import ray.data as rd

from logpipe_ray.pipelines.flagship import build_pipeline
from logpipe_ray.stages.aggregate import (
    count_groupby,
    hash_partition,
    split_null_keys,
)


def test_salted_counts_equal_unsalted(ray_session, tiny_sequences):
    ds = build_pipeline(rd.read_parquet(tiny_sequences))
    plain = count_groupby(ds, ["source"], alias="cnt").to_pandas()
    salted = count_groupby(ds, ["source"], alias="cnt", salt=8).to_pandas()
    a = dict(zip(plain["source"], plain["cnt"]))
    b = dict(zip(salted["source"], salted["cnt"]))
    assert a == b
    assert "_salt" not in salted.columns


def test_hash_partition_disjoint_and_complete(ray_session):
    ds = rd.from_items([{"doc_id": f"d{i}", "v": i} for i in range(500)])
    out = hash_partition(ds, "doc_id", 8)
    df = out.to_pandas()
    assert len(df) == 500
    assert set(df["_bucket"]) <= set(range(8))
    assert len(set(df["_bucket"])) > 1
    # deterministic bucket per key
    again = hash_partition(ds, "doc_id", 8).to_pandas()
    m1 = dict(zip(df["doc_id"], df["_bucket"]))
    m2 = dict(zip(again["doc_id"], again["_bucket"]))
    assert m1 == m2


def test_split_null_keys(ray_session):
    ds = rd.from_items(
        [{"k": "a", "v": 1}, {"k": None, "v": 2}, {"k": "b", "v": 3}] * 5
    )
    keep, bypass = split_null_keys(ds, ["k"])
    assert keep.count() == 10
    assert bypass.count() == 5
    assert all(r["k"] is None for r in bypass.take_all())


def test_grouped_top_k_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from logpipe_ray.stages.aggregate import grouped_top_k

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 5, 500),
            "v": rng.integers(0, 50, 500),
            "id": np.arange(500),
        }
    )
    got = (
        grouped_top_k(
            rd.from_arrow(pa.Table.from_pandas(df)).repartition(8),
            ["g"],
            [("v", "descending"), ("id", "ascending")],
            3,
        )
        .to_pandas()
        .sort_values(["g", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["g", "v", "id"], ascending=[True, False, True])
        .groupby("g", sort=False)
        .head(3)
        .sort_values(["g", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["g", "v", "id"]], want)


def test_hash_sample_deterministic_and_partition_invariant(ray_session):
    import pyarrow as pa

    import ray.data as rd

    from logpipe_ray.functions.sampling import hash_sample

    t = pa.table({"doc_id": pa.array(range(5000), pa.int64())})
    a = sorted(hash_sample(rd.from_arrow(t), pct=10).to_pandas()["doc_id"])
    b = sorted(
        hash_sample(rd.from_arrow(t).repartition(16), pct=10).to_pandas()["doc_id"]
    )
    assert a == b
    assert 0.05 < len(a) / 5000 < 0.15
