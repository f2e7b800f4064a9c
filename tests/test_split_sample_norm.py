"""Round-4 operators: hash_split, grouped_hash_topk,
grouped_minmax_permille (plus their SQL-replay contracts, which the
registry oracles docs_split_counts / docs_sample_per_lang /
events_value_minmax_norm exercise end-to-end)."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def test_hash_split_partition_properties(ray_session):
    """Every row gets exactly one split; assignment is a pure function
    of the id (identical across partitionings); proportions land near
    the weights."""
    from logpipe_ray.functions.sampling import hash_split

    ids = np.arange(20_000, dtype=np.int64)
    t = pa.table({"doc_id": ids})
    a = hash_split(rd.from_arrow(t), "doc_id",
                   {"train": 90, "val": 5, "test": 5}).to_pandas()
    b = hash_split(rd.from_arrow(t).repartition(7), "doc_id",
                   {"train": 90, "val": 5, "test": 5}).to_pandas()
    assert set(a["split"]) == {"train", "val", "test"}
    am = a.set_index("doc_id")["split"]
    bm = b.set_index("doc_id")["split"]
    assert (am.sort_index() == bm.sort_index()).all()  # layout-invariant
    frac = a["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.90) < 0.02
    assert abs(frac["val"] - 0.05) < 0.01
    import pytest

    with pytest.raises(ValueError):
        hash_split(rd.from_arrow(t), "doc_id", {"train": 50, "val": 10})


def test_grouped_hash_topk_matches_reference(ray_session):
    """k-per-group sample == pandas reference on (hash, id) order,
    including groups smaller than k and a 90%-hot group (partial
    top-k bounds what any reducer receives)."""
    import pandas as pd

    from logpipe_ray.functions.sampling import (
        grouped_hash_topk, shuffle_hash,
    )

    rng = np.random.default_rng(17)
    n = 5000
    g = np.where(rng.random(n) < 0.9, "hot", rng.choice(["a", "b", "tiny2"], n))
    g[:2] = "solo"  # a group smaller than k
    ids = rng.permutation(n).astype(np.int64)
    t = pa.table({"lang": g, "doc_id": ids})
    out = (
        grouped_hash_topk(rd.from_arrow(t).repartition(6), "lang", "doc_id",
                          k=4, seed=9)
        .to_pandas().sort_values(["lang", "sample_rank"], ignore_index=True)
    )
    h = np.asarray(shuffle_hash(pa.array(ids, pa.int64()), seed=9))
    ref = (
        pd.DataFrame({"lang": g, "doc_id": ids, "h": h})
        .sort_values(["h", "doc_id"], kind="stable")
        .groupby("lang", sort=True).head(4)
    )
    ref["sample_rank"] = ref.groupby("lang").cumcount()
    ref = ref.sort_values(["lang", "sample_rank"], ignore_index=True)
    assert out["lang"].tolist() == ref["lang"].tolist()
    assert out["doc_id"].tolist() == ref["doc_id"].tolist()
    assert out["sample_rank"].tolist() == ref["sample_rank"].tolist()
    assert (out[out["lang"] == "solo"].shape[0]) == 2  # undersized group


def test_grouped_minmax_permille_edges(ray_session):
    """Constant group -> 0; extremes map to 0 and 1000; pure-integer
    math matches the direct formula."""
    from logpipe_ray.stages.aggregate import grouped_minmax_permille

    t = pa.table(
        {
            "k": ["a"] * 5 + ["b"] * 3,
            "vc": pa.array([10, 20, 30, 40, 50, 7, 7, 7], pa.int64()),
        }
    )
    out = (
        grouped_minmax_permille(rd.from_arrow(t).repartition(3), "k", "vc")
        .to_pandas().sort_values(["k", "vc"], ignore_index=True)
    )
    a = out[out["k"] == "a"]["norm_permille"].tolist()
    assert a == [(v - 10) * 1000 // 40 for v in (10, 20, 30, 40, 50)]
    assert a[0] == 0 and a[-1] == 1000
    assert out[out["k"] == "b"]["norm_permille"].tolist() == [0, 0, 0]
