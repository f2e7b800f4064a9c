import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from logpipe_ray.functions.dedup import (
    embedding_neardup_pairs,
    exact_jaccard,
    hamming64,
    minhash_dedup_pairs,
    minhash_signatures,
    simhash_dedup_pairs,
    simhash_signatures,
)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(500)]
    docs, ids = [], []
    for i in range(200):
        words = list(rng.choice(vocab, 40, replace=False))
        docs.append(" ".join(words))
        ids.append(i)
    # planted near-dups: doc 200/201 are copies of 0/1 with 2 words changed
    for j, src in enumerate([0, 1]):
        words = docs[src].split(" ")
        words[0], words[1] = "changed0", "changed1"
        docs.append(" ".join(words))
        ids.append(200 + j)
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": docs})


def test_minhash_estimates_jaccard(corpus):
    sig, _ = minhash_signatures(corpus["text"].combine_chunks(), num_perm=128)
    est = (sig[0] == sig[200]).mean()
    true = exact_jaccard([corpus["text"][0].as_py()], [corpus["text"][200].as_py()])[0]
    assert abs(est - true) < 0.15
    assert true > 0.85


def test_minhash_dedup_finds_planted_pairs(ray_session, corpus):
    ds = rd.from_arrow(corpus)
    out = minhash_dedup_pairs(ds, threshold=0.8, num_perm=64, bands=16)
    pairs = set(zip(out["a"].to_pylist(), out["b"].to_pylist()))
    assert (0, 200) in pairs
    assert (1, 201) in pairs
    for a, b in pairs:  # no false positives below threshold
        j = exact_jaccard(
            [corpus["text"][a].as_py()], [corpus["text"][b].as_py()]
        )[0]
        assert j >= 0.8


def test_simhash_close_for_near_dups(corpus):
    sig = simhash_signatures(corpus["text"].combine_chunks())
    d_dup = hamming64(sig[0:1], sig[200:201])[0]
    rnd = [hamming64(sig[i : i + 1], sig[i + 50 : i + 51])[0] for i in range(20)]
    assert d_dup < min(rnd)


def test_simhash_dedup_pipeline(ray_session, corpus):
    ds = rd.from_arrow(corpus)
    out = simhash_dedup_pairs(ds, max_distance=8)
    pairs = set(zip(out["a"].tolist(), out["b"].tolist()))
    assert (0, 200) in pairs and (1, 201) in pairs


def test_dup_clusters(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(400)]
    docs, ids = [], []
    for i in range(100):
        docs.append(" ".join(rng.choice(vocab, 30, replace=False)))
        ids.append(i)
    # cluster of 3 copies of doc 5, cluster of 2 copies of doc 9
    for j, src in enumerate([5, 5, 9]):
        w = docs[src].split(" ")
        w[j] = f"alt{j}"
        docs.append(" ".join(w))
        ids.append(100 + j)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": docs})
    from logpipe_ray.functions.dedup import dup_clusters

    out = dup_clusters(rd.from_arrow(t), threshold=0.7).to_pandas()
    by_cluster = out.groupby("cluster_id")["doc_id"].apply(set).to_dict()
    assert {5, 100, 101} in by_cluster.values()
    assert {9, 102} in by_cluster.values()
    assert (out["cluster_size"] >= 2).all()


def test_cluster_unionfind_transitive():
    from logpipe_ray.functions.dedup import cluster_pairs_unionfind

    labels = cluster_pairs_unionfind([(1, 2), (2, 3), (7, 8), (3, 4)])
    assert labels[1] == labels[2] == labels[3] == labels[4]
    assert labels[7] == labels[8]
    assert labels[1] != labels[7]


def test_embedding_neardup(ray_session):
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((300, 32)).astype(np.float32)
    vecs[250] = vecs[10] + rng.standard_normal(32).astype(np.float32) * 0.01
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(300, dtype=np.int64)),
            "embedding": pa.array(list(vecs)),
        }
    )
    out = embedding_neardup_pairs(rd.from_arrow(t), threshold=0.99)
    pairs = set(zip(out["a"].tolist(), out["b"].tolist()))
    assert (10, 250) in pairs
    assert all(c >= 0.99 for c in out["cosine"].tolist())


def test_minhash_verify_join_path_matches_broadcast(ray_session, corpus):
    """broadcast_limit=0 forces the distributed hash-join co-location;
    output must equal the broadcast-filter path exactly."""
    ds = rd.from_arrow(corpus)
    a = minhash_dedup_pairs(ds, threshold=0.8, num_perm=64, bands=16)
    b = minhash_dedup_pairs(
        ds, threshold=0.8, num_perm=64, bands=16, broadcast_limit=0
    )
    assert a.equals(b)


def test_cluster_min_label_matches_unionfind_large(ray_session):
    """1M synthetic edges over 100k nodes in 1000 planted components —
    a graph too large to tolerate driver-side per-edge iteration.
    Distributed min-label labels must equal union-find labels."""
    from logpipe_ray.functions.dedup import (
        cluster_min_label,
        cluster_pairs_unionfind,
    )

    rng = np.random.default_rng(11)
    n_clusters, cluster_size = 1000, 100
    edges_per_cluster = 1000
    base = np.repeat(np.arange(n_clusters) * cluster_size, edges_per_cluster)
    a = base + rng.integers(0, cluster_size, len(base))
    b = base + rng.integers(0, cluster_size, len(base))
    keep = a != b
    a, b = a[keep], b[keep]
    # ensure every node appears (chain edge 2i -> 2i+1 per consecutive pair)
    all_nodes = np.arange(n_clusters * cluster_size, dtype=np.int64)
    chain_a = all_nodes[all_nodes % cluster_size != cluster_size - 1]
    chain_b = chain_a + 1
    a = np.concatenate([a, chain_a])
    b = np.concatenate([b, chain_b])
    assert len(a) > 1_000_000
    pairs = rd.from_arrow(
        pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
    )
    labels = cluster_min_label(pairs).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    want = cluster_pairs_unionfind(list(zip(a.tolist(), b.tolist())))
    assert len(got) == n_clusters * cluster_size
    assert got == want


def test_cluster_min_label_long_chain_pointer_jumping(ray_session):
    """A 300-node path graph (diameter 299) must converge well inside
    the default 64-round budget — pointer jumping makes rounds
    O(log diameter), so pure propagation (O(diameter)) would fail this.
    Also exercised through the distributed-join path via a tiny
    broadcast_node_limit."""
    from logpipe_ray.functions.dedup import cluster_min_label

    n = 300
    pairs = rd.from_arrow(
        pa.table(
            {
                "a": pa.array(list(range(n - 1)), pa.int64()),
                "b": pa.array(list(range(1, n)), pa.int64()),
            }
        )
    )
    labels = cluster_min_label(pairs, max_rounds=16).to_pandas()
    assert len(labels) == n
    assert set(labels["label"]) == {0}

    labels_j = cluster_min_label(
        pairs, max_rounds=16, broadcast_node_limit=10
    ).to_pandas()
    assert len(labels_j) == n
    assert set(labels_j["label"]) == {0}


def test_cluster_min_label_raises_on_round_budget(ray_session):
    from logpipe_ray.functions.dedup import cluster_min_label

    # a path graph 0-1-2-...-9 needs several rounds; budget of 1 raises
    pairs = rd.from_arrow(
        pa.table({"a": list(range(9)), "b": list(range(1, 10))})
    )
    with pytest.raises(RuntimeError, match="converge"):
        cluster_min_label(pairs, max_rounds=1)


def test_dup_clusters_distributed_path_matches_driver(ray_session, corpus):
    from logpipe_ray.functions.dedup import dup_clusters

    ds = rd.from_arrow(corpus)
    small = dup_clusters(ds, threshold=0.8)
    forced = dup_clusters(ds, threshold=0.8, driver_pair_limit=0)
    assert small.equals(forced)


def test_dedup_corpus_distributed_path_matches_driver(ray_session, corpus):
    from logpipe_ray.functions.dedup import dedup_corpus_ids

    ds = rd.from_arrow(corpus)
    a = sorted(dedup_corpus_ids(ds, threshold=0.8).to_pandas()["doc_id"])
    b = sorted(
        dedup_corpus_ids(ds, threshold=0.8, driver_pair_limit=0)
        .to_pandas()["doc_id"]
    )
    assert a == b
    assert 0 < len(a) < 202  # the planted dups were dropped


def test_lsh_candidates_driver_path_matches_distributed(ray_session, corpus):
    """The bounded driver fast path and the distributed exchange path
    must emit identical candidate pair sets."""
    import logpipe_ray.functions.dedup as D

    ds = rd.from_arrow(corpus)
    kw = dict(num_perm=64, bands=16, shingle_k=2)
    fast = D.minhash_lsh_candidates(ds, **kw).to_pandas()
    orig = D.BANDED_DRIVER_LIMIT
    try:
        D.BANDED_DRIVER_LIMIT = 0  # force the distributed path
        dist = D.minhash_lsh_candidates(ds, **kw).to_pandas()
    finally:
        D.BANDED_DRIVER_LIMIT = orig
    assert set(zip(fast["a"], fast["b"])) == set(zip(dist["a"], dist["b"]))
    assert len(fast) == len(dist)


def test_verify_driver_path_matches_distributed(ray_session, corpus):
    """The bounded driver verification must equal the Dataset join
    verification exactly."""
    import logpipe_ray.functions.dedup as D

    ds = rd.from_arrow(corpus)
    kw = dict(threshold=0.8, num_perm=64, bands=16)
    fast = minhash_dedup_pairs(ds, **kw)
    orig = D.VERIFY_DRIVER_PAIRS
    try:
        D.VERIFY_DRIVER_PAIRS = 0  # force the join verification
        dist = minhash_dedup_pairs(ds, **kw)
    finally:
        D.VERIFY_DRIVER_PAIRS = orig
    assert fast.equals(dist)
