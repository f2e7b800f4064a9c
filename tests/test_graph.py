"""Fixed-point PageRank (functions/graph.py)."""

import numpy as np
import pyarrow as pa
import pytest

from logpipe_ray.functions.graph import SCALE, pagerank_fixed


def _sym_edges(pairs):
    src = [a for a, b in pairs] + [b for a, b in pairs]
    dst = [b for a, b in pairs] + [a for a, b in pairs]
    return pa.table(
        {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
    )


def _ref_pagerank(pairs, iters):
    """Same fixed-point integer recurrence, dict-based."""
    edges = set()
    for a, b in pairs:
        edges.add((a, b))
        edges.add((b, a))
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    deg = {u: 0 for u in nodes}
    for a, _ in edges:
        deg[a] += 1
    base = (3 * int(SCALE)) // (20 * n)
    r = {u: int(SCALE) // n for u in nodes}
    for _ in range(iters):
        s = {u: 0 for u in nodes}
        for a, b in edges:
            s[b] += (r[a] * 17) // (20 * deg[a])
        r = {u: s[u] + base for u in nodes}
    return r


@pytest.fixture(scope="module")
def graph_pairs():
    rng = np.random.default_rng(31)
    return [tuple(sorted(p)) for p in rng.integers(0, 40, size=(120, 2)) if p[0] != p[1]]


def test_pagerank_matches_reference(ray_session, graph_pairs):
    import ray.data as rd

    out = (
        pagerank_fixed(rd.from_arrow(_sym_edges(graph_pairs)), iters=6)
        .to_pandas()
        .set_index("node")["rank_fp"]
        .to_dict()
    )
    assert out == _ref_pagerank(graph_pairs, 6)


def test_pagerank_paths_bit_identical(ray_session, graph_pairs):
    """Driver fast path == distributed broadcast path == distributed
    join path, bit for bit (integer arithmetic everywhere)."""
    import ray.data as rd

    def run(**kw):
        return (
            pagerank_fixed(rd.from_arrow(_sym_edges(graph_pairs)), iters=4, **kw)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )

    a = run()  # driver fast path (under edge limit)
    b = run(driver_edge_limit=0)  # distributed, broadcast ranks
    c = run(driver_edge_limit=0, broadcast_node_limit=0)  # distributed, joins
    assert a.equals(b)
    assert a.equals(c)


def test_pagerank_rejects_dangling(ray_session):
    import ray.data as rd

    edges = pa.table(
        {"src": pa.array([1, 2], pa.int64()), "dst": pa.array([2, 3], pa.int64())}
    )
    with pytest.raises(ValueError, match="dangling"):
        pagerank_fixed(rd.from_arrow(edges), iters=2).to_pandas()
    with pytest.raises(ValueError, match="dangling"):
        pagerank_fixed(
            rd.from_arrow(edges), iters=2, driver_edge_limit=0
        ).materialize()


def test_pagerank_mass_conserved_approximately(ray_session, graph_pairs):
    """Total fixed-point mass stays within rounding slack of SCALE
    (each node loses < 20*deg units per round to floor division)."""
    import ray.data as rd

    out = pagerank_fixed(rd.from_arrow(_sym_edges(graph_pairs)), iters=6).to_pandas()
    total = int(out["rank_fp"].sum())
    assert 0.97 * int(SCALE) < total <= int(SCALE)
