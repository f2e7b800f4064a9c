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
    # bucketed pack route (fold_task_edges=0 forces the groupby
    # exchange) must equal the default slice-task fold route
    bucketed = (
        triangle_counts(rd.from_pandas(df), fold_task_edges=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, bucketed)


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
    # budget contract: a slice may exceed the budget ONLY when it is a
    # single oversized run (round-5 fix: searchsorted side='right')
    w = lens * (lens - 1) // 2
    for i, j in slices:
        if j - i > 1:
            assert int(w[i:j].sum()) <= 10_000


def _logit_data(n=4000, seed=3):
    rng = np.random.default_rng(seed)
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 2, n)
    logits = 0.8 * x1 - 0.5 * x2 + 0.3
    p = 1 / (1 + np.exp(-logits))
    y = (rng.random(n) < p).astype(np.float64)
    return pd.DataFrame({"x1": x1, "x2": x2, "y": y})


def test_logistic_fit_mle_optimality(ray_session):
    """At the returned weights the full-data gradient must vanish —
    the optimality condition is an independent check of the fit."""
    import ray.data as rd

    from logpipe_ray.functions.linalg import logistic_fit

    df = _logit_data()
    coef, b0, n, iters, loss = logistic_fit(
        rd.from_pandas(df), ["x1", "x2"], "y"
    )
    assert n == len(df)
    X = np.column_stack([df.x1, df.x2, np.ones(len(df))])
    w = np.array([coef["x1"], coef["x2"], b0])
    p = 1 / (1 + np.exp(-(X @ w)))
    grad = X.T @ (df.y.to_numpy() - p)
    assert np.max(np.abs(grad)) < 1e-6
    # loss equals the stable full-data log-loss at the solution
    m = X @ w
    s = 2 * df.y.to_numpy() - 1
    ref_loss = np.sum(np.log1p(np.exp(-np.abs(s * m))) + np.maximum(-s * m, 0))
    assert abs(loss - ref_loss) < 1e-6 * max(1.0, ref_loss)
    # recovers the generating weights to sampling error
    assert abs(coef["x1"] - 0.8) < 0.2
    assert abs(coef["x2"] + 0.5) < 0.1


def test_logistic_fit_distributed_route_equals_driver(ray_session):
    import ray.data as rd

    from logpipe_ray.functions.linalg import logistic_fit

    df = _logit_data(n=2000, seed=5)
    ds = rd.from_pandas(df).repartition(8)
    fast = logistic_fit(ds, ["x1", "x2"], "y")
    dist = logistic_fit(ds, ["x1", "x2"], "y", driver_row_limit=0)
    for a, b in zip(fast[0].values(), dist[0].values()):
        assert abs(a - b) < 1e-8
    assert abs(fast[1] - dist[1]) < 1e-8
    assert fast[2] == dist[2]


def test_logistic_fit_rejects_non_binary(ray_session):
    import pytest
    import ray.data as rd

    from logpipe_ray.functions.linalg import logistic_fit

    df = pd.DataFrame({"x1": [1.0, 2.0], "y": [0.0, 2.0]})
    with pytest.raises(Exception, match="non-binary"):
        logistic_fit(rd.from_pandas(df), ["x1"], "y")


def _postings_docs():
    texts = [
        "red fox jumps",
        "red dog sleeps",
        "blue fox runs",
        "red fox red fox",  # duplicate terms within a doc
        "green",
        "",
    ]
    return pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})


def test_postings_roundtrip_and_or(ray_session, tmp_path):
    import ray.data as rd

    from logpipe_ray.sources.textindex import postings_lookup, postings_write

    df = _postings_docs()
    out = str(tmp_path / "post")
    postings_write(rd.from_pandas(df), "doc_id", "text", out, n_buckets=8)

    hits, stats = postings_lookup(out, ["red", "fox"], mode="and")
    assert sorted(hits.to_pandas().doc_id.tolist()) == [0, 3]
    assert stats["files_read"] <= 2

    hits, _ = postings_lookup(out, ["red", "fox"], mode="or")
    assert sorted(hits.to_pandas().doc_id.tolist()) == [0, 1, 2, 3]

    # single term
    hits, stats = postings_lookup(out, ["green"], mode="and")
    assert hits.to_pandas().doc_id.tolist() == [4]
    assert stats["files_read"] == 1

    # absent term: AND with a live term must be empty
    hits, _ = postings_lookup(out, ["red", "zebra"], mode="and")
    assert hits.count() == 0

    # duplicate query terms dedup (not double-counted in the AND)
    hits, _ = postings_lookup(out, ["red", "red", "fox"], mode="and")
    assert sorted(hits.to_pandas().doc_id.tolist()) == [0, 3]


def test_postings_pruning_and_errors(ray_session, tmp_path):
    import pytest
    import ray.data as rd

    from logpipe_ray.sources.textindex import postings_lookup, postings_write

    df = _postings_docs()
    out = str(tmp_path / "post")
    meta = postings_write(rd.from_pandas(df), "doc_id", "text", out, n_buckets=8)
    # a one-term lookup must not read more than one bucket
    _, stats = postings_lookup(out, ["blue"])
    assert stats["files_read"] <= 1 < stats["files_total"]
    assert len(meta["files"]) == stats["files_total"]
    with pytest.raises(ValueError, match="no terms"):
        postings_lookup(out, [])
    with pytest.raises(ValueError, match="unknown mode"):
        postings_lookup(out, ["red"], mode="xor")


def test_token_budget_mix_matches_brute(ray_session):
    import ray.data as rd

    from logpipe_ray.functions.sampling import (
        HASH_B,
        HASH_M,
        _seed_mult,
        token_budget_mix,
    )

    rng = np.random.default_rng(21)
    n = 3000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "grp": rng.choice(["a", "b", "c", "d"], n),
            "w": rng.integers(1, 50, n).astype(np.int64),
        }
    )
    budgets = {"a": 1000, "b": 10_000_000, "c": 0}  # d -> default 250
    out = token_budget_mix(
        rd.from_pandas(df).repartition(7),
        "grp",
        "w",
        budgets,
        id_col="doc_id",
        default_budget=250,
        seed=3,
    ).to_pandas()

    # brute reference: exclusive prefix in (hash, id) order per group
    h = (df.doc_id.to_numpy() * _seed_mult(3) + HASH_B) % HASH_M
    ref_ids = []
    for g, sub in df.assign(h=h).groupby("grp"):
        sub = sub.sort_values(["h", "doc_id"])
        prior = sub.w.cumsum().to_numpy() - sub.w.to_numpy()
        b = budgets.get(g, 250)
        ref_ids.extend(sub.doc_id.to_numpy()[prior < b].tolist())
    assert sorted(out.doc_id.tolist()) == sorted(ref_ids)
    # group c fully excluded, group b fully kept
    assert (out.grp == "c").sum() == 0
    assert (out.grp == "b").sum() == (df.grp == "b").sum()
    # the first over-budget doc IS included: per kept group, total w
    # >= budget OR the group ran out of docs
    for g, sub in out.groupby("grp"):
        b = budgets.get(g, 250)
        total = int(sub.w.sum())
        assert total >= min(b, int(df[df.grp == g].w.sum()))

    # partitioning invariance
    out2 = token_budget_mix(
        rd.from_pandas(df).repartition(2),
        "grp",
        "w",
        budgets,
        id_col="doc_id",
        default_budget=250,
        seed=3,
    ).to_pandas()
    assert sorted(out2.doc_id.tolist()) == sorted(out.doc_id.tolist())


def test_mmr_select_diversity_changes_pick(ray_session):
    """Two near-identical high-quality docs: pure quality ranking
    would take both; MMR must skip the duplicate for a diverse doc."""
    import ray.data as rd

    from logpipe_ray.functions.sampling import mmr_select

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "alpha beta gamma delta epsilon",
                "alpha beta gamma delta zeta",     # near-dup of 0
                "one two three four five",          # diverse
                "alpha beta",                        # low quality
            ],
            "q": [100.0, 99.0, 90.0, 10.0],
        }
    )
    out = mmr_select(
        rd.from_pandas(docs), "doc_id", "text", "q", k=3, pool=10, lam=0.5
    ).to_pandas()
    assert out.doc_id.tolist()[0] == 0          # best quality first
    assert out.doc_id.tolist()[1] == 2          # diversity beats near-dup
    assert out.mmr_rank.tolist() == [0, 1, 2]
    # scores non-increasing? not guaranteed in general MMR, but the
    # first score is the max normalized quality * lambda
    assert abs(out.mmr_score.iloc[0] - 0.5) < 1e-12


def test_mmr_select_matches_brute(ray_session):
    import ray.data as rd

    from logpipe_ray.functions.sampling import mmr_select

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(3, 12)))
        for _ in range(40)
    ]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(40, dtype=np.int64),
            "text": texts,
            "q": rng.integers(0, 1000, 40).astype(np.float64),
        }
    )
    k, lam, dim = 8, 0.7, 4096
    out = mmr_select(
        rd.from_pandas(df).repartition(5),
        "doc_id",
        "text",
        "q",
        k=k,
        pool=40,
        lam=lam,
        hash_dim=dim,
    ).to_pandas()

    # brute greedy with EXACT token-set Jaccard (hash_dim large enough
    # that 30 words collide with prob ~ tiny; verify no collision)
    toksets = [set(t.split(" ")) for t in df.text]
    order = df.sort_values(["q", "doc_id"], ascending=[False, True])
    idx = order.index.to_numpy()
    q = order.q.to_numpy()
    qn = (q - q.min()) / (q.max() - q.min())
    picked, maxsim = [], np.zeros(len(idx))
    for _ in range(k):
        score = lam * qn - (1 - lam) * maxsim
        score[picked] = -np.inf
        j = int(np.argmax(score))
        picked.append(j)
        for i in range(len(idx)):
            a, b = toksets[idx[i]], toksets[idx[j]]
            sim = len(a & b) / len(a | b) if a | b else 0.0
            maxsim[i] = max(maxsim[i], sim)
    ref_ids = [int(df.doc_id.iloc[idx[j]]) for j in picked]
    assert out.doc_id.tolist() == ref_ids


def test_fluent_api_session9_methods(ray_session):
    import ray.data as rd

    from logpipe_ray.api import Pipeline

    edges = Pipeline.from_dataset(
        rd.from_pandas(
            pd.DataFrame({"u": [1, 1, 2], "v": [2, 3, 3]})
        )
    )
    tri = edges.triangles().to_pandas().sort_values("node")
    assert tri.n_triangles.tolist() == [1, 1, 1]

    import ray.data as _rd

    seeds = _rd.from_pandas(pd.DataFrame({"node": [1]}).astype(np.int64))
    d = edges.bfs(seeds, max_depth=2).to_pandas()
    assert dict(zip(d.node, d.dist)) == {1: 0, 2: 1, 3: 1}

    docs = Pipeline.from_dataset(
        rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": np.arange(6, dtype=np.int64),
                    "grp": ["a"] * 3 + ["b"] * 3,
                    "w": np.array([10, 10, 10, 5, 5, 5], np.int64),
                    "text": ["x y"] * 6,
                    "q": np.arange(6, dtype=np.float64),
                }
            )
        )
    )
    mixed = docs.mix_to_budget("grp", "w", {"a": 15, "b": 0}).to_pandas()
    assert set(mixed.grp) == {"a"} and len(mixed) == 2

    sel = docs.mmr("doc_id", "text", "q", k=2).to_pandas()
    assert len(sel) == 2 and sel.mmr_rank.tolist() == [0, 1]

    # logit_fit needs a binary label column — build one
    docs2 = Pipeline.from_dataset(
        rd.from_pandas(
            pd.DataFrame(
                {
                    "x": np.linspace(-2, 2, 200),
                    "y": (np.linspace(-2, 2, 200) > 0).astype(np.float64),
                }
            )
        )
    )
    coef, b0, n, iters, loss = docs2.logit_fit(["x"], "y", max_iters=12)
    assert n == 200 and coef["x"] > 0


def _brute_bfs(edges: set, seeds: set, max_depth: int) -> dict:
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for lvl in range(1, max_depth + 1):
        nxt = set()
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in dist:
                    dist[m] = lvl
                    nxt.add(m)
        frontier = nxt
    return dist


def test_bfs_distances_matches_brute_and_routes(ray_session):
    import ray.data as rd

    from logpipe_ray.functions.graph import bfs_distances

    rng = np.random.default_rng(17)
    df = _random_edges(rng, 120, 260)  # sparse-ish: levels matter
    canon = {
        (min(a, b), max(a, b))
        for a, b in zip(df.u.tolist(), df.v.tolist())
        if a != b
    }
    seeds = {0, 5, 111}
    ref = _brute_bfs(canon, seeds, 3)

    seeds_ds = rd.from_pandas(
        pd.DataFrame({"node": sorted(seeds)}).astype(np.int64)
    )
    out = bfs_distances(
        rd.from_pandas(df), seeds_ds, max_depth=3
    ).to_pandas()
    assert dict(zip(out.node.tolist(), out.dist.tolist())) == ref

    # forced distributed route (driver_edge_limit=0)
    out2 = bfs_distances(
        rd.from_pandas(df), seeds_ds, max_depth=3, driver_edge_limit=0
    ).to_pandas()
    assert dict(zip(out2.node.tolist(), out2.dist.tolist())) == ref


def test_bfs_distances_degenerate(ray_session):
    import ray.data as rd

    from logpipe_ray.functions.graph import bfs_distances

    seeds = rd.from_pandas(pd.DataFrame({"node": [1]}).astype(np.int64))
    # empty edges -> empty output (no graph at all)
    empty = rd.from_arrow(
        pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    )
    assert bfs_distances(empty, seeds).count() == 0

    # seed disconnected from the only edge: seed keeps dist 0, edge
    # nodes unreachable
    one = rd.from_pandas(pd.DataFrame({"u": [7], "v": [8]}))
    out = bfs_distances(one, seeds, max_depth=2).to_pandas()
    assert dict(zip(out.node, out.dist)) == {1: 0}

    # empty seed set -> empty output
    noseed = rd.from_arrow(pa.table({"node": pa.array([], pa.int64())}))
    assert bfs_distances(one, noseed).count() == 0


def test_compression_audit_semantics(ray_session, tmp_path):
    import zlib

    import pyarrow.parquet as pq

    from logpipe_ray.queries import docs_compression_audit

    rep = "spam spam spam " * 50          # compresses very well
    rng = np.random.default_rng(9)
    rand = " ".join(
        "".join(chr(97 + c) for c in rng.integers(0, 26, 8))
        for _ in range(100)
    )                                       # compresses poorly
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": [rep, rand],
            "lang": ["rep", "rnd"],
            "source": ["s", "s"],
            "n_chars": pa.array([len(rep), len(rand)], pa.int64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    out = docs_compression_audit(str(d)).to_pandas().set_index("lang")
    # independent recomputation
    for lang, text in (("rep", rep), ("rnd", rand)):
        b = text.encode()
        assert out.loc[lang, "raw_bytes"] == len(b)
        assert out.loc[lang, "zlib_bytes"] == len(zlib.compress(b, 6))
        assert (
            out.loc[lang, "ratio_ppm"]
            == 1_000_000 * len(zlib.compress(b, 6)) // len(b)
        )
    # repetitive text compresses far better than random text
    assert out.loc["rep", "ratio_ppm"] < out.loc["rnd", "ratio_ppm"] // 2


def _brute_kcore(edges: set, k: int) -> set:
    import collections

    alive = set()
    for u, v in edges:
        alive.add(u)
        alive.add(v)
    while True:
        deg = collections.Counter()
        for u, v in edges:
            if u in alive and v in alive:
                deg[u] += 1
                deg[v] += 1
        dead = {n for n in alive if deg[n] < k}
        if not dead:
            return alive
        alive -= dead


def test_kcore_matches_brute_and_routes(ray_session):
    import ray.data as rd

    from logpipe_ray.functions.graph import kcore_nodes

    rng = np.random.default_rng(23)
    df = _random_edges(rng, 80, 200)
    canon = {
        (min(a, b), max(a, b))
        for a, b in zip(df.u.tolist(), df.v.tolist())
        if a != b
    }
    def nodes_of(ds):
        pdf = ds.to_pandas()
        return set(pdf["node"].tolist()) if "node" in pdf.columns else set()

    for k in (2, 3, 4):
        ref = _brute_kcore(canon, k)
        assert nodes_of(kcore_nodes(rd.from_pandas(df), k)) == ref, k
        assert (
            nodes_of(kcore_nodes(rd.from_pandas(df), k, driver_edge_limit=0))
            == ref
        ), k

    # chain of 5: 2-core is empty (leaves peel one end at a time —
    # exercises multi-round convergence)
    chain = rd.from_pandas(pd.DataFrame({"u": [1, 2, 3, 4], "v": [2, 3, 4, 5]}))
    assert kcore_nodes(chain, 2).count() == 0
    assert kcore_nodes(chain, 2, driver_edge_limit=0).count() == 0
    # triangle survives 2-core
    tri = rd.from_pandas(pd.DataFrame({"u": [1, 2, 3], "v": [2, 3, 1]}))
    assert set(kcore_nodes(tri, 2).to_pandas().node) == {1, 2, 3}


def test_grouped_approx_quantiles_error_bound(ray_session):
    import ray.data as rd

    from logpipe_ray.functions.sketches import grouped_approx_quantiles

    rng = np.random.default_rng(31)
    n = 40_000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "v": rng.normal(0, 100, n),
        }
    )
    qs = [0.1, 0.5, 0.9]
    out = grouped_approx_quantiles(
        rd.from_pandas(df).repartition(8), "g", "v", qs, buckets=512
    ).to_pandas()
    assert len(out) == 9
    for (g, q), sub in out.groupby(["k", "q"]):
        vals = np.sort(df[df.g == g].v.to_numpy())
        got = sub["value"].iloc[0]
        # rank error bound: position of the estimate within the sorted
        # group must be within ~2% of the target rank
        pos = np.searchsorted(vals, got) / len(vals)
        assert abs(pos - q) < 0.02, (g, q, pos)

    # empty input -> typed empty
    empty = rd.from_pandas(df.iloc[:0])
    assert (
        grouped_approx_quantiles(empty, "g", "v", qs).num_rows == 0
    )


def test_token_budget_mix_property(ray_session):
    """Hypothesis: any weights/budgets/partitioning — the kept set
    equals the exclusive-prefix brute reference."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import ray.data as rd

    from logpipe_ray.functions.sampling import (
        HASH_B,
        HASH_M,
        _seed_mult,
        token_budget_mix,
    )

    @settings(max_examples=8, deadline=None)
    @given(
        n=st.integers(0, 300),
        seed=st.integers(0, 5),
        b_a=st.integers(0, 2000),
        b_b=st.integers(0, 2000),
        parts=st.integers(1, 6),
        data_seed=st.integers(0, 10_000),
    )
    def run(n, seed, b_a, b_b, parts, data_seed):
        rng = np.random.default_rng(data_seed)
        df = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "grp": rng.choice(["a", "b"], n) if n else np.array([], object),
                "w": rng.integers(0, 80, n).astype(np.int64),
            }
        )
        budgets = {"a": b_a, "b": b_b}
        out = token_budget_mix(
            rd.from_pandas(df).repartition(parts),
            "grp",
            "w",
            budgets,
            id_col="doc_id",
            seed=seed,
        ).to_pandas()
        got = sorted(out["doc_id"].tolist()) if "doc_id" in out.columns else []
        h = (df.doc_id.to_numpy() * _seed_mult(seed) + HASH_B) % HASH_M
        ref = []
        for g, sub in df.assign(h=h).groupby("grp"):
            sub = sub.sort_values(["h", "doc_id"])
            prior = sub.w.cumsum().to_numpy() - sub.w.to_numpy()
            ref.extend(sub.doc_id.to_numpy()[prior < budgets[g]].tolist())
        assert got == sorted(ref)

    run()


def test_ranked_postings_bm25_matches_full_scan(ray_session, tmp_path):
    import ray.data as rd

    from logpipe_ray.functions.search import bm25_topk
    from logpipe_ray.sources.textindex import (
        postings_bm25,
        ranked_postings_write,
    )

    rng = np.random.default_rng(41)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(2, 15)))
        for _ in range(120)
    ]
    df = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64), "text": texts})
    out = str(tmp_path / "rpost")
    ranked_postings_write(
        rd.from_pandas(df), "doc_id", "text", out, n_buckets=8
    )
    terms = ["beta", "epsilon"]
    full = (
        bm25_topk(rd.from_pandas(df), terms, k=10)
        .to_pandas()
        .reset_index(drop=True)
    )
    idx, stats = postings_bm25(out, terms, k=10)
    idx = idx.to_pandas().reset_index(drop=True)
    assert stats["files_read"] <= 2 < stats["files_total"]
    # bitwise score parity and identical ranking vs the full scan
    assert idx.doc_id.tolist() == full.doc_id.tolist()
    assert idx.dl.tolist() == full.dl.tolist()
    assert all(a == b for a, b in zip(idx.score, full.score))

    # forced distributed route equals the driver pivot
    dist, _ = postings_bm25(out, terms, k=10, driver_match_limit=0)
    dist = dist.to_pandas().reset_index(drop=True)
    assert dist.doc_id.tolist() == full.doc_id.tolist()
    assert all(a == b for a, b in zip(dist.score, full.score))

    # absent term: contributes idf of df=0 but tf=0 everywhere -> same
    # ranking as the term alone
    solo, _ = postings_bm25(out, ["beta", "qqqq"], k=10)
    ref, _ = postings_bm25(out, ["beta"], k=10)
    assert solo.to_pandas().doc_id.tolist() == ref.to_pandas().doc_id.tolist()


def test_markov_eval_hand_case(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from logpipe_ray.queries import events_markov_eval

    # user 1 train: a->b, b->a, a->b  => pred(a)=b, pred(b)=a
    # user 1 test:  a->b (correct), b->b (wrong)
    # user 2 test:  c->a (prev c unseen in train -> 0 correct)
    jan = pd.Timestamp("2024-01-01")
    feb_half = pd.Timestamp("2024-01-20")
    rows = [
        (1, jan + pd.Timedelta(minutes=i), i, t)
        for i, t in enumerate(["a", "b", "a", "b"])
    ] + [
        (1, feb_half + pd.Timedelta(minutes=i), 100 + i, t)
        for i, t in enumerate(["a", "b", "b"])
    ] + [
        (2, feb_half + pd.Timedelta(minutes=i), 200 + i, t)
        for i, t in enumerate(["c", "a"])
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    out = events_markov_eval(str(d)).to_pandas().set_index("prev_type")
    assert out.loc["a", "n_test"] == 1 and out.loc["a", "n_correct"] == 1
    assert out.loc["b", "n_test"] == 1 and out.loc["b", "n_correct"] == 0
    assert out.loc["c", "n_test"] == 1 and out.loc["c", "n_correct"] == 0

    # single-event users only -> typed empty
    tiny = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([jan], pa.timestamp("us")),
            "user_id": pa.array([9], pa.int64()),
            "event_type": pa.array(["a"], pa.string()),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    d2 = tmp_path / "sf2"
    d2.mkdir()
    pq.write_table(tiny, str(d2 / "events.parquet"))
    out2 = events_markov_eval(str(d2))
    assert out2.num_rows == 0
