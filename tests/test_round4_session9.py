"""Round-4 session-9 operators: distributed triangle counting
(degree-oriented node-iterator), and later session-9 additions.
Brute-force references here; oracle parity is continuously checked by
scripts/check_correctness.py and the driver."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _brute_triangles(edges: set[tuple[int, int]]) -> dict:
    """Per-node triangle counts by explicit enumeration."""
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = {n: 0 for n in adj}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    tri[a] += 1
                    tri[b] += 1
                    tri[c] += 1
    return {"deg": {n: len(adj[n]) for n in adj}, "tri": tri}


def _random_edges(rng, n_nodes: int, n_draws: int) -> pd.DataFrame:
    u = rng.integers(0, n_nodes, n_draws).astype(np.int64)
    v = rng.integers(0, n_nodes, n_draws).astype(np.int64)
    # keep self-loops and duplicates: the stage must drop/dedup them
    return pd.DataFrame({"u": u, "v": v})


def test_triangle_counts_matches_brute(ray_session):
    import ray.data as rd

    from logpipe_ray.functions.graph import triangle_counts

    rng = np.random.default_rng(7)
    df = _random_edges(rng, 60, 500)
    canon = {
        (min(a, b), max(a, b))
        for a, b in zip(df.u.tolist(), df.v.tolist())
        if a != b
    }
    ref = _brute_triangles(canon)
    out = triangle_counts(rd.from_pandas(df)).to_pandas()
    assert len(out) == len(ref["deg"])
    got_deg = dict(zip(out.node.tolist(), out.degree.tolist()))
    got_tri = dict(zip(out.node.tolist(), out.n_triangles.tolist()))
    assert got_deg == ref["deg"]
    assert got_tri == ref["tri"]
    # cc_ppm integer identity
    for _, r in out.iterrows():
        d, t = int(r.degree), int(r.n_triangles)
        exp = (2_000_000 * t) // (d * (d - 1)) if d >= 2 else 0
        assert int(r.cc_ppm) == exp


def test_triangle_counts_routes_equal(ray_session):
    """Join route (edge_broadcast_limit=0) and id-rank fallback
    (node_broadcast_limit=0) must equal the packed broadcast route."""
    import ray.data as rd

    from logpipe_ray.functions.graph import triangle_counts

    rng = np.random.default_rng(13)
    df = _random_edges(rng, 40, 300)
    base = (
        triangle_counts(rd.from_pandas(df))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    joined = (
        triangle_counts(rd.from_pandas(df), edge_broadcast_limit=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    idrank = (
        triangle_counts(rd.from_pandas(df), node_broadcast_limit=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, joined)
    pd.testing.assert_frame_equal(base, idrank)


def test_triangle_counts_empty_and_degenerate(ray_session):
    import ray.data as rd

    from logpipe_ray.functions.graph import triangle_counts

    # fully empty input
    empty = rd.from_arrow(
        pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    )
    out_ds = triangle_counts(empty)
    assert out_ds.schema().names == ["node", "degree", "n_triangles", "cc_ppm"]
    assert out_ds.count() == 0

    # only self-loops -> empty after canonicalization
    loops = rd.from_pandas(pd.DataFrame({"u": [3, 5], "v": [3, 5]}))
    assert len(triangle_counts(loops).to_pandas()) == 0

    # a single edge: two degree-1 nodes, zero triangles
    one = rd.from_pandas(pd.DataFrame({"u": [1], "v": [2]}))
    out = triangle_counts(one).to_pandas().sort_values("node")
    assert out.degree.tolist() == [1, 1]
    assert out.n_triangles.tolist() == [0, 0]
    assert out.cc_ppm.tolist() == [0, 0]


def test_triangle_wedge_slices_budget():
    from logpipe_ray.functions.graph import _succ_pair_slices

    lens = np.array([3, 1000, 2, 5, 400, 1], dtype=np.int64)
    slices = list(_succ_pair_slices(lens, budget=10_000))
    # every run covered exactly once, in order
    covered = []
    for i, j in slices:
        assert j > i
        covered.extend(range(i, j))
    assert covered == list(range(len(lens)))
