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
