"""BM25 search + SemDeDup (late round-3 operators)."""

import numpy as np
import pyarrow as pa
import pytest

from logpipe_ray.functions.search import (
    bm25_topk,
    corpus_term_stats,
    _word_features,
)


def _docs(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_word_features_counts():
    t = _docs(["Hash JOIN hash!", "scan...scan, scan", "", "???"])
    dl, tf = _word_features(t["text"], ["hash", "scan"])
    assert dl.tolist() == [3, 3, 0, 0]
    assert tf[0].tolist() == [2, 0, 0, 0]
    assert tf[1].tolist() == [0, 3, 0, 0]


def test_corpus_term_stats(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs(["hash join", "join scan join", "plain words"]))
    s = corpus_term_stats(ds, ["join", "hash"])
    assert s["n_docs"] == 3
    assert s["dl_sum"] == 7
    assert s["df"] == [2, 1]


def test_bm25_reference_scores(ray_session):
    """Engine scores match a direct per-doc reference computation."""
    import ray.data as rd

    texts = [
        "hash join merge join hash",
        "scan scan scan filter sort",
        "join",
        "nothing relevant here at all",
    ]
    terms = ["join", "scan"]
    ds = rd.from_arrow(_docs(texts))
    out = (
        bm25_topk(ds, terms, k=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # reference: same formula, plain Python
    words = [[w for w in t.lower().split() if w] for t in texts]
    dls = [len(w) for w in words]
    n = float(len(texts))
    avgdl = float(sum(dls)) / n
    k1, b = 1.2, 0.75
    dfs = [sum(1 for w in words if term in w) for term in terms]
    for _, row in out.iterrows():
        i = int(row["doc_id"])
        expect = 0.0
        for ti, term in enumerate(terms):
            tf = float(words[i].count(term))
            idf = (n - dfs[ti] + 0.5) / (dfs[ti] + 0.5)
            denom = tf + k1 * (1.0 - b + b * (dls[i] / avgdl))
            expect = expect + (idf * (tf * (k1 + 1.0))) / denom
        assert row["score"] == expect
        assert int(row["dl"]) == dls[i]


def test_bm25_topk_order(ray_session):
    import ray.data as rd

    texts = ["join join join", "join join", "join", "none"]
    ds = rd.from_arrow(_docs(texts))
    out = bm25_topk(ds, ["join"], k=2).to_pandas()
    assert out["doc_id"].tolist() == [0, 1]
    assert out["score"].iloc[0] > out["score"].iloc[1]


# --------------------------------------------------------------- SemDeDup


def _emb_table(mat, ids=None):
    ids = list(range(len(mat))) if ids is None else ids
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat],
                                  pa.list_(pa.float32())),
        }
    )


def test_semdedup_planted_duplicates(ray_session):
    """Near-identical vectors collapse to the min id; distant ones stay."""
    import ray.data as rd

    from logpipe_ray.functions.dedup import semdedup_ids

    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    # plant near-dups of rows 0..9 (tiny perturbation, cosine ~ 1)
    dups = base[:10] + rng.standard_normal((10, 16)).astype(np.float32) * 1e-3
    mat = np.vstack([base, dups])
    ds = rd.from_arrow(_emb_table(mat))
    out = semdedup_ids(ds, n_clusters=4, threshold=0.99).to_pandas()
    survivors = set(out["vec_id"])
    # every planted dup (ids 40..49) must be dropped: its base twin has
    # a smaller id and lands in the same cluster (cosine ~ 1 implies
    # the same nearest centroid)
    assert survivors.isdisjoint(range(40, 50))
    assert set(range(40)) <= survivors


def test_semdedup_matches_bruteforce(ray_session):
    """Distributed survivors == brute-force keep-min-id on the same
    cluster assignment."""
    import ray.data as rd

    from logpipe_ray.functions.ann import _vec_matrix, build_ivf_centroids
    from logpipe_ray.functions.dedup import semdedup_ids

    rng = np.random.default_rng(11)
    mat = rng.standard_normal((120, 8)).astype(np.float32)
    # make some moderately-similar rows so threshold bites
    mat[50:60] = mat[10:20] + rng.standard_normal((10, 8)).astype(np.float32) * 0.1
    tbl = _emb_table(mat)
    ds = rd.from_arrow(tbl)
    thresh = 0.9
    out = semdedup_ids(ds, n_clusters=5, threshold=thresh).to_pandas()

    cents = build_ivf_centroids(ds, n_centroids=5, seed=11, id_col="vec_id")
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1)[:, None], 1e-12)
    unit = mat.astype(np.float64)
    unit = unit / np.maximum(np.linalg.norm(unit, axis=1)[:, None], 1e-12)
    cid = np.argmax(unit @ cn.T, axis=1)
    expect = []
    for c in np.unique(cid):
        ids = np.where(cid == c)[0]
        u = unit[ids].astype(np.float32).astype(np.float64)
        sims = u @ u.T
        dropped = (np.tril(sims, k=-1) >= thresh).any(axis=1)
        expect.extend(ids[~dropped].tolist())
    assert sorted(out["vec_id"]) == sorted(expect)


def test_semdedup_cap_passes_tail_through(ray_session):
    """Rows past the max_cluster inspection cap survive (never silently
    dropped from the corpus)."""
    import ray.data as rd

    from logpipe_ray.functions.dedup import semdedup_ids

    rng = np.random.default_rng(5)
    mat = rng.standard_normal((60, 8)).astype(np.float32)
    ds = rd.from_arrow(_emb_table(mat))
    out = semdedup_ids(ds, n_clusters=1, threshold=0.999, max_cluster=10).to_pandas()
    # nothing is near-dup at 0.999 on random vectors; with the cap at
    # 10 the other 50 rows must still pass through
    assert sorted(out["vec_id"]) == list(range(60))


# ---------------------------------------------------------- topic clusters


def test_topic_clusters_planted_purity(ray_session):
    """Docs drawn from two disjoint vocabularies separate perfectly."""
    import ray.data as rd

    from logpipe_ray.functions.cluster import topic_clusters

    rng = np.random.default_rng(7)
    vocab_a = ["kernel", "driver", "memory", "thread", "cache", "stack"]
    vocab_b = ["recipe", "butter", "flour", "oven", "sugar", "dough"]
    texts, ids = [], []
    for i in range(60):
        v = vocab_a if i % 2 == 0 else vocab_b
        texts.append(" ".join(rng.choice(v, 12)))
        ids.append(i)
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    out = topic_clusters(ds, n_clusters=2, dim=64).to_pandas()
    assert len(out) == 2
    assert int(out["n_docs"].sum()) == 60
    # perfect split: each cluster is all-even or all-odd ids
    from logpipe_ray.functions.cluster import hashed_tf_features
    from logpipe_ray.functions.ann import build_ivf_centroids, _vec_matrix

    feats = hashed_tf_features(ds, dim=64).materialize()
    cents = build_ivf_centroids(
        feats, n_centroids=2, vec_col="feat", seed=11, id_col="doc_id"
    )
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1)[:, None], 1e-12)
    fp = feats.to_pandas().sort_values("doc_id")
    m = np.stack(fp["feat"].to_numpy()).astype(np.float64)
    cid = np.argmax(m @ cn.T, axis=1)
    for c in (0, 1):
        parities = {i % 2 for i in fp["doc_id"].to_numpy()[cid == c]}
        assert len(parities) == 1


def test_topic_clusters_block_layout_invariant(ray_session):
    """Same clustering whether the input is 1 block or 8."""
    import ray.data as rd

    from logpipe_ray.functions.cluster import topic_clusters

    rng = np.random.default_rng(13)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [" ".join(rng.choice(words, 10)) for _ in range(80)]
    tbl = pa.table({"doc_id": list(range(80)), "text": texts})
    a = (
        topic_clusters(rd.from_arrow(tbl), n_clusters=4, dim=32)
        .to_pandas()
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )
    b = (
        topic_clusters(
            rd.from_arrow(tbl).repartition(8), n_clusters=4, dim=32
        )
        .to_pandas()
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
