import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from logpipe_ray.functions.ann import (
    brute_force_topk,
    build_ivf_centroids,
    ivf_topk,
)


@pytest.fixture(scope="module")
def emb_table():
    rng = np.random.default_rng(9)
    # 8 clusters so IVF has structure
    centers = rng.standard_normal((8, 16)) * 3
    vecs = np.concatenate(
        [c + rng.standard_normal((50, 16)) * 0.5 for c in centers]
    ).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
            "embedding": pa.array(list(vecs)),
        }
    )


def _reference_topk(t, q, k):
    mat = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    sims = mat @ qn
    order = np.lexsort((t["vec_id"].to_pylist(), -sims))
    return [int(t["vec_id"][i].as_py()) for i in order[:k]]


def test_brute_force_matches_numpy(ray_session, emb_table):
    q = np.stack(emb_table["embedding"].to_pylist())[7].astype(np.float64)
    out = brute_force_topk(rd.from_arrow(emb_table), q[None, :], k=10)
    got = out[out["query_id"] == 0]["vec_id"].tolist()
    assert got == _reference_topk(emb_table, q, 10)


def test_ivf_recall(ray_session, emb_table):
    ds = rd.from_arrow(emb_table)
    cents = build_ivf_centroids(ds, n_centroids=8, iters=3)
    qs = np.stack(emb_table["embedding"].to_pylist())[[3, 77, 201]].astype(np.float64)
    exact = brute_force_topk(ds, qs, k=10)
    approx = ivf_topk(ds, qs, cents, k=10, nprobe=3)
    recall = 0.0
    for qi in range(3):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recall += len(e & a) / len(e)
    assert recall / 3 >= 0.8


def test_knn_self_join_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from logpipe_ray.functions.ann import knn_self_join

    rng = np.random.default_rng(4)
    n, d = 300, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    got = (
        knn_self_join(rd.from_arrow(t).repartition(4), k=5)
        .to_pandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    # numpy reference
    unit = vecs.astype(np.float64)
    unit /= np.linalg.norm(unit, axis=1, keepdims=True)
    sims = unit @ unit.T
    np.fill_diagonal(sims, -np.inf)
    for q in range(0, n, 37):
        order = sorted(range(n), key=lambda j: (-sims[q, j], j))[:5]
        sub = got[got.query_id == q].sort_values("rank")
        assert sub["neighbor_id"].tolist() == order


def test_knn_self_join_ivf_route_recall(ray_session):
    """Above the broadcast guard, knn_self_join routes through the
    distributed IVF co-partitioned join; on clustered data its
    neighbors must overlap the exact join's >= 80%."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from logpipe_ray.functions.ann import knn_self_join

    rng = np.random.default_rng(8)
    n_clusters, per = 16, 60
    centers = rng.standard_normal((n_clusters, 16)) * 6
    vecs = np.concatenate(
        [centers[i] + rng.standard_normal((per, 16)) for i in range(n_clusters)]
    ).astype(np.float32)
    n = len(vecs)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    ds = rd.from_arrow(t).repartition(4)
    exact = (
        knn_self_join(ds, k=3)
        .to_pandas()
        .groupby("query_id")["neighbor_id"]
        .apply(set)
    )
    approx = (
        knn_self_join(ds, k=3, broadcast_limit_rows=10)  # force IVF route
        .to_pandas()
        .groupby("query_id")["neighbor_id"]
        .apply(set)
    )
    hits = total = 0
    for q, want in exact.items():
        got = approx.get(q, set())
        hits += len(want & got)
        total += len(want)
    assert total > 0 and hits / total >= 0.8


def test_hnsw_recall(ray_session, emb_table):
    """Shard-parallel HNSW recall >= 0.9 vs brute force on clustered
    fixtures (verdict r2 #5), including multi-shard merge (batch_size
    forces 4 shards)."""
    from logpipe_ray.functions.ann import hnsw_topk

    ds = rd.from_arrow(emb_table)
    qs = np.stack(emb_table["embedding"].to_pylist())[[3, 77, 201, 350]].astype(
        np.float64
    )
    exact = brute_force_topk(ds, qs, k=10)
    approx = hnsw_topk(ds, qs, k=10, batch_size=128)
    recall = 0.0
    for qi in range(len(qs)):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recall += len(e & a) / len(e)
    assert recall / len(qs) >= 0.9


def test_hnsw_index_exact_on_small():
    """Single-graph search with generous ef must be near-exact."""
    from logpipe_ray.functions.ann import HNSWIndex

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((500, 32))
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    idx = HNSWIndex(vecs, ids=np.arange(500) * 10)
    hits = 0
    for qi in range(20):
        q = unit[qi * 13]
        got, sims = idx.search(q, 5, ef=128)
        want = (np.argsort(-(unit @ q))[:5] * 10).tolist()
        hits += len(set(got.tolist()) & set(want))
        assert np.all(np.diff(sims) <= 1e-12)  # sims sorted desc
    assert hits / (20 * 5) >= 0.95


def test_hnsw_query_stage_actor_pool(ray_session, emb_table):
    """Built-once-per-actor HNSW serving a query stream."""
    import ray as _ray

    from logpipe_ray.functions.ann import HNSWQueryStage, _vec_matrix

    ids = np.asarray(emb_table["vec_id"], dtype=np.int64)
    vecs = _vec_matrix(emb_table["embedding"])
    base_ref = _ray.put((ids, vecs))
    queries = pa.table(
        {
            "query_id": pa.array(np.arange(8, dtype=np.int64)),
            "embedding": emb_table["embedding"].slice(0, 8),
        }
    )
    out = (
        rd.from_arrow(queries)
        .map_batches(
            HNSWQueryStage,
            fn_constructor_kwargs={"base_ref": base_ref, "k": 5},
            concurrency=(1, 2),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    assert len(out) == 8 * 5
    # rank-0 neighbor of a base vector queried by itself is itself
    r0 = out[(out["rank"] == 0)].set_index("query_id")["vec_id"]
    assert (r0.loc[np.arange(8)] == np.arange(8)).all()
