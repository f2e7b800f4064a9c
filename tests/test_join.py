import pyarrow as pa

import ray.data as rd

from logpipe_ray.stages.join import cogroup_join_aggregate


def test_cogroup_join_matches_pandas(ray_session):
    import pandas as pd

    left = pd.DataFrame({"k": [1, 2, 3, 4], "name": ["a", "b", "c", "d"]})
    right = pd.DataFrame(
        {"k": [1, 1, 2, 2, 2, 5], "v": [10.0, 20.0, 1.0, 2.0, 3.0, 99.0]}
    )

    def per_key(l, r):
        if len(l) == 0 or len(r) == 0:
            return None
        return {"name": l["name"].iloc[0], "total": float(r["v"].sum()), "n": len(r)}

    out = cogroup_join_aggregate(
        rd.from_pandas(left),
        rd.from_pandas(right),
        "k",
        {"name": pa.string()},
        {"v": pa.float64()},
        per_key,
    ).to_pandas()
    got = {r["k"]: (r["name"], r["total"], r["n"]) for _, r in out.iterrows()}
    # inner-join semantics: keys 3,4 (no right rows) and 5 (no left) dropped
    assert got == {1: ("a", 30.0, 2), 2: ("b", 6.0, 3)}
