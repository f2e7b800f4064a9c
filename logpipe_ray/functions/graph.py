"""Iterative graph analytics: deterministic fixed-point PageRank.

Classic PageRank is float-summed and therefore block-order dependent —
the same graph gives last-ulp-different ranks on different layouts.
Here every quantity is an int64 FIXED-POINT rational (SCALE = 2^32;
damping 0.85 = 17/20 applied as integer multiply-then-floor-divide),
so the per-iteration sums are order-independent integers and the whole
computation is bit-reproducible across CPU counts, block layouts AND
engines (the SQL oracle replays the identical integer expressions with
the iterations unrolled).

Scale shape per iteration: ranks live in a (node, rank_fp) Dataset.
Under ``broadcast_node_limit`` the rank/degree tables broadcast via
ray.put and each edge batch emits (dst, contrib) partials — one keyed
aggregate per iteration, O(#edges) work, O(#nodes) shuffle. Above the
limit the broadcast is replaced by a distributed hash join on src
(same shape as dedup.cluster_min_label); both paths are tested equal.

Dangling nodes (no out-edges) are rejected: callers build symmetric
edge sets (every edge both ways), which guarantees none exist and is
the right model for affinity graphs like customer<->supplier.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

SCALE = np.int64(1) << np.int64(32)
PR_BROADCAST_NODE_LIMIT = 2_000_000


def _concat_nonempty(ds: Dataset) -> pa.Table:
    blocks = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns]
    return pa.concat_tables(blocks)


PR_DRIVER_EDGE_LIMIT = 5_000_000  # ~80 MB of (src, dst) int64 pairs


def _pagerank_driver(
    et: pa.Table, iters: int
) -> "Dataset":
    """Bounded driver fast path: the whole graph fits in
    PR_DRIVER_EDGE_LIMIT edges, so iterate in numpy — np.add.at over
    int64 is the SAME order-independent integer sum the distributed
    route computes, so both paths are bit-identical (tested)."""
    import ray.data as rd

    src = np.asarray(et["src"], dtype=np.int64)
    dst = np.asarray(et["dst"], dtype=np.int64)
    nodes_arr = np.unique(np.concatenate([src, dst]))
    n = len(nodes_arr)
    si = np.searchsorted(nodes_arr, src)
    di = np.searchsorted(nodes_arr, dst)
    deg = np.bincount(si, minlength=n).astype(np.int64)
    if (deg == 0).any():
        raise ValueError(
            f"{int((deg == 0).sum())} dangling node(s) (no out-edges): "
            "pass a symmetric edge set (add each edge's reverse)"
        )
    base = np.int64((3 * int(SCALE)) // (20 * n))
    ranks = np.full(n, int(SCALE) // n, dtype=np.int64)
    for _ in range(iters):
        contrib = (ranks[si] * 17) // (20 * deg[si])
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, di, contrib)
        ranks = s + base
    return rd.from_arrow(
        pa.table({"node": pa.array(nodes_arr), "rank_fp": pa.array(ranks)})
    )


def _dedup_task(cols, *blocks):
    tbls = [t for t in blocks if t.num_columns and t.num_rows]
    if not tbls:
        return pa.table({c: pa.array([], pa.int64()) for c in cols})
    t = pa.concat_tables(tbls).combine_chunks()
    return t.select(cols).group_by(cols).aggregate([])


def _dedup_partials(partials: Dataset, cols: list) -> pa.Table:
    """Distinct rows of the materialized per-batch edge partials,
    folded in ONE task so the partial mass never touches the driver
    (first-touch driver pages cost ~1s/25MB on this VM); only the
    deduped table — bounded by distinct edges — returns."""
    return ray.get(
        ray.remote(_dedup_task).remote(cols, *partials.to_arrow_refs())
    )


def pagerank_fixed(
    edges: Dataset,
    iters: int = 8,
    broadcast_node_limit: int = PR_BROADCAST_NODE_LIMIT,
    driver_edge_limit: int = PR_DRIVER_EDGE_LIMIT,
) -> Dataset:
    """(node, rank_fp) after ``iters`` fixed-point PageRank rounds over
    an (src, dst) int64 edge Dataset. Requires every node to have at
    least one out-edge (symmetric edge sets satisfy this)."""

    def edge_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["src", "dst"])
            .group_by(["src", "dst"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["src", "dst", "m"])

    # distinct edges: per-batch local distinct, then either a bounded
    # driver concat+group_by (partials are O(distinct-edges x blocks)
    # rows; the sort-based Aggregate's ~1 s fixed cost dominates small
    # graphs) or the keyed aggregate above the limit
    partials = edges.map_batches(
        edge_partial, batch_format="pyarrow"
    ).materialize()
    if partials.count() <= driver_edge_limit:
        dtbl = _dedup_partials(partials, ["src", "dst"])
        import ray.data as _rd

        dedges = _rd.from_arrow(dtbl).materialize()
    else:
        dedges = (
            partials.groupby(["src", "dst"])
            .aggregate(Sum("m", alias_name="m"))
            .map_batches(
                lambda t: t.select(["src", "dst"])
                if t.num_columns
                else pa.schema(
                    [("src", pa.int64()), ("dst", pa.int64())]
                ).empty_table(),
                batch_format="pyarrow",
            )
            .materialize()
        )

    if dedges.count() <= driver_edge_limit:
        return _pagerank_driver(_concat_nonempty(dedges), iters)

    def deg_partial(t: pa.Table) -> pa.Table:
        g = t.select(["src"]).group_by("src").aggregate([([], "count_all")])
        return g.rename_columns(["src", "d"])

    degs = (
        dedges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("src")
        .aggregate(Sum("d", alias_name="deg"))
        .materialize()
    )

    # node universe = src ∪ dst; every node must appear as a src
    deg_tbl = _concat_nonempty(degs)
    n_src = deg_tbl.num_rows

    def node_partial(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [t["src"].combine_chunks(), t["dst"].combine_chunks()]
        )
        return pa.table({"node": pc.unique(both)})

    nodes = (
        dedges.map_batches(node_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("node", alias_name="_x"))
        .map_batches(
            lambda t: t.select(["node"])
            if t.num_columns
            else pa.schema([("node", pa.int64())]).empty_table(),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n = nodes.count()
    if n != n_src:
        raise ValueError(
            f"{n - n_src} dangling node(s) (no out-edges): pass a "
            "symmetric edge set (add each edge's reverse)"
        )
    base = int((3 * int(SCALE)) // (20 * n))  # (1-d)/N in fixed point
    init = int(int(SCALE) // n)

    ranks = nodes.map_batches(
        lambda t, _i=init: pa.table(
            {
                "node": t["node"],
                "rank_fp": pa.array(
                    np.full(t.num_rows, _i, dtype=np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    use_broadcast = n <= broadcast_node_limit
    deg_ref = ray.put(
        (deg_tbl["src"].combine_chunks(), deg_tbl["deg"].combine_chunks())
    )

    for _ in range(iters):
        if use_broadcast:
            rank_tbl = _concat_nonempty(ranks)
            rank_ref = ray.put(
                (
                    rank_tbl["node"].combine_chunks(),
                    rank_tbl["rank_fp"].combine_chunks(),
                )
            )

            def contrib(t: pa.Table, _r=rank_ref, _d=deg_ref) -> pa.Table:
                rnodes, rfp = ray.get(_r)
                dnodes, dd = ray.get(_d)
                rpos = pc.index_in(t["src"], value_set=rnodes)
                dpos = pc.index_in(t["src"], value_set=dnodes)
                r = np.asarray(pc.take(rfp, rpos), dtype=np.int64)
                d = np.asarray(pc.take(dd, dpos), dtype=np.int64)
                # (r*17) // (20*deg) — pure integer, same tree in SQL
                v = (r * 17) // (20 * d)
                return pa.table({"node": t["dst"], "c": pa.array(v)})

            contribs = dedges.map_batches(contrib, batch_format="pyarrow")
        else:
            from ..stages.join import inner_join_safe

            joined = inner_join_safe(
                dedges,
                inner_join_safe(
                    ranks, degs, on=("node",), right_on=("src",),
                    num_partitions=8,
                ),
                on=("src",),
                right_on=("node",),
                num_partitions=8,
            )
            contribs = joined.map_batches(
                lambda t: pa.table(
                    {
                        "node": t["dst"],
                        "c": pa.array(
                            (np.asarray(t["rank_fp"], dtype=np.int64) * 17)
                            // (20 * np.asarray(t["deg"], dtype=np.int64))
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
        # no zero-backfill needed: the dangling check proved every node
        # has an out-edge, and in a symmetric edge set that edge's
        # reverse gives the node an in-edge, so contribs covers all

        def sum_partial(t: pa.Table) -> pa.Table:
            g = t.group_by("node").aggregate([("c", "sum")])
            return g.rename_columns(["node", "p"])

        # the contrib partials are O(nodes x blocks) rows; the guarded
        # merge (tokens._merge_count_partials) collapses them on the
        # driver under its row limit — Ray's sort-based Aggregate costs
        # ~1 s of fixed overhead per exchange, which dominates 8
        # iterations on small graphs — and routes to the keyed
        # aggregate above it
        from .tokens import _merge_count_partials

        merged = _merge_count_partials(
            contribs.map_batches(sum_partial, batch_format="pyarrow"),
            "node",
            "s",
        )
        ranks = merged.map_batches(
            lambda t, _b=base: pa.table(
                {
                    "node": t["node"],
                    "rank_fp": pa.array(
                        np.asarray(t["s"], dtype=np.int64) + _b
                    ),
                }
            )
            if t.num_columns
            else pa.schema(
                [("node", pa.int64()), ("rank_fp", pa.int64())]
            ).empty_table(),
            batch_format="pyarrow",
        ).materialize()
    return ranks


# ------------------------------------------------------------ triangles

TRI_NODE_BROADCAST_LIMIT = 5_000_000   # rank map ~80 MB at the limit
TRI_EDGE_BROADCAST_LIMIT = 5_000_000   # packed edge set ~40 MB
_TRI_WEDGE_SLICE = 4_000_000           # wedge rows expanded per slice


def _tri_empty() -> "Dataset":
    import ray.data as rd

    return rd.from_arrow(
        pa.schema(
            [
                ("node", pa.int64()),
                ("degree", pa.int64()),
                ("n_triangles", pa.int64()),
                ("cc_ppm", pa.int64()),
            ]
        ).empty_table()
    )


def _succ_pair_slices(lens: np.ndarray, budget: int = _TRI_WEDGE_SLICE):
    """Yield (run_start, run_end) slices over runs described by
    ``lens`` so each slice expands to at most ~budget successor pairs
    (a run larger than the budget gets its own slice — per-run pair
    count is C(len, 2), bounded by the orientation's out-degree cap)."""
    w = lens.astype(np.int64) * (lens - 1) // 2
    cw = np.cumsum(w)
    i = 0
    base = 0
    while i < len(lens):
        # largest j with cw[j-1] - base <= budget; a slice only exceeds
        # the budget when a SINGLE run is itself oversized (j == i+1)
        j = int(np.searchsorted(cw, base + budget, side="right"))
        j = max(j, i + 1)
        yield i, min(j, len(lens))
        base = int(cw[min(j, len(lens)) - 1])
        i = j


# oriented-edge counts at or under this run the wedge stage as a sort
# task + slice-fold tasks (no groupby exchange); above it the
# hash-bucket exchange route amortizes its fixed cost
TRI_FOLD_TASK_EDGES = 5_000_000


def _tri_expand_sorted(
    a_s: np.ndarray, b_s: np.ndarray, E: np.ndarray
) -> tuple:
    """Wedge expansion + packed-edge-set membership + local count over
    a (source, rb)-lexsorted oriented-edge slice — the shared kernel of
    the per-bucket fold and the slice-task route. Returns (node,
    count) arrays."""
    starts = (
        np.flatnonzero(np.concatenate([[True], a_s[1:] != a_s[:-1]]))
        if len(a_s)
        else np.empty(0, np.int64)
    )
    lens = np.diff(np.append(starts, len(a_s)))
    nodes_out: list = []
    for i, j in _succ_pair_slices(lens):
        s0, s1 = int(starts[i]), int(starts[j - 1] + lens[j - 1])
        ls = lens[i:j]
        tot = int(s1 - s0)
        within = np.arange(tot) - np.repeat(np.cumsum(ls) - ls, ls)
        msucc = np.repeat(ls, ls) - 1 - within
        P = int(msucc.sum())
        if P == 0:
            continue
        left = np.repeat(np.arange(tot), msucc)
        right = (
            np.arange(P)
            - np.repeat(np.cumsum(msucc) - msucc, msucc)
            + left
            + 1
        )
        x = b_s[s0 + left]
        y = b_s[s0 + right]
        keys = (x.astype(np.uint64) << np.uint64(32)) | y.astype(np.uint64)
        pos = np.searchsorted(E, keys)
        hit = (pos < len(E)) & (E[np.minimum(pos, len(E) - 1)] == keys)
        if not hit.any():
            continue
        nodes_out.append(x[hit])
        nodes_out.append(y[hit])
        nodes_out.append(a_s[s0 + left[hit]])
    if not nodes_out:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    un, cn = np.unique(np.concatenate(nodes_out), return_counts=True)
    return un, cn.astype(np.int64)


def _tri_sort_task(*blocks):
    """(a, rb)-lexsort the oriented edges; the sorted table stays in
    the object store, only run metadata returns to the driver."""
    tbls = [t for t in blocks if t.num_columns and t.num_rows]
    t = pa.concat_tables(tbls).combine_chunks()
    a = np.asarray(t["a"], np.int64)
    b = np.asarray(t["b"], np.int64)
    rb = np.asarray(t["rb"], np.int64)
    order = np.lexsort((rb, a))
    a_s = a[order]
    starts = (
        np.flatnonzero(np.concatenate([[True], a_s[1:] != a_s[:-1]]))
        if len(a_s)
        else np.empty(0, np.int64)
    )
    lens = np.diff(np.append(starts, len(a_s)))
    return (
        pa.table({"a": pa.array(a_s), "b": pa.array(b[order])}),
        (starts, lens),
    )


def _tri_fold_slice(tbl: pa.Table, lo: int, hi: int, E: np.ndarray) -> pa.Table:
    # tbl and E arrive as plasma-backed zero-copy views (ObjectRef args
    # are resolved by Ray before the task body runs)
    a_s = np.asarray(tbl["a"], np.int64)[lo:hi]
    b_s = np.asarray(tbl["b"], np.int64)[lo:hi]
    un, cn = _tri_expand_sorted(a_s, b_s, E)
    return pa.table({"node": pa.array(un), "p": pa.array(cn)})


def triangle_counts(
    edges: Dataset,
    u_col: str = "u",
    v_col: str = "v",
    node_broadcast_limit: int = TRI_NODE_BROADCAST_LIMIT,
    edge_broadcast_limit: int = TRI_EDGE_BROADCAST_LIMIT,
    driver_edge_limit: int = PR_DRIVER_EDGE_LIMIT,
    fold_task_edges: int = TRI_FOLD_TASK_EDGES,
) -> Dataset:
    """Per-node triangle counts + degree + integer-ppm clustering
    coefficient over an UNDIRECTED int64 edge Dataset (self-loops
    dropped, duplicate edges deduped).

    The node-iterator-with-orientation algorithm (Cohen's MapReduce
    scheme): orient every edge from lower to higher (degree, node)
    rank so each triangle is counted exactly once at its lowest-rank
    corner and per-source out-neighborhoods stay small on skewed
    graphs; expand each source's C(outdeg, 2) ordered neighbor pairs
    (wedges); a wedge closes a triangle iff its (x, y) pair is itself
    an oriented edge.

    Scale shape: edge dedup is one keyed exchange (driver group_by
    under ``driver_edge_limit``); degrees are count partials into one
    bounded keyed Sum; the rank map broadcasts via ray.put under
    ``node_broadcast_limit`` (above it, orientation falls back to
    node-id rank — still exactly-once, weaker out-degree bound);
    wedge expansion buckets oriented edges by source and runs a
    vectorized lexsort + closed-form pair expansion in bounded slices;
    membership is a binary search against the broadcast packed edge
    set under ``edge_broadcast_limit`` (node ids must fit 32 bits on
    that route) with the wedges never materialized — above the limit
    wedges flow into a hash join against the oriented edge table.
    Everything integer -> bit-reproducible across layouts and engines.
    """
    import pandas as pd

    import ray.data as rd
    from .tokens import _merge_count_partials

    # -------- canonical distinct edges (u < v by id, loops dropped)
    def canon(t: pa.Table) -> pa.Table:
        u = np.asarray(t[u_col], dtype=np.int64)
        v = np.asarray(t[v_col], dtype=np.int64)
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        keep = lo != hi
        return (
            pa.table({"u": pa.array(lo[keep]), "v": pa.array(hi[keep])})
            .group_by(["u", "v"])
            .aggregate([])
        )

    partials = edges.map_batches(canon, batch_format="pyarrow").materialize()
    if partials.count() == 0:
        return _tri_empty()
    if partials.count() <= driver_edge_limit:
        dedges = rd.from_arrow(
            _dedup_partials(partials, ["u", "v"])
        ).materialize()
    else:
        from ray.data.aggregate import Count

        dedges = (
            partials.groupby(["u", "v"])
            .aggregate(Count(alias_name="_m"))
            .map_batches(
                lambda t: t.select(["u", "v"])
                if t.num_columns
                else pa.schema(
                    [("u", pa.int64()), ("v", pa.int64())]
                ).empty_table(),
                batch_format="pyarrow",
            )
            .materialize()
        )
    m = dedges.count()
    if m == 0:
        return _tri_empty()

    # -------- degrees: count partials over both endpoints
    def deg_partial(t: pa.Table) -> pa.Table:
        both = np.concatenate(
            [np.asarray(t["u"], np.int64), np.asarray(t["v"], np.int64)]
        )
        nodes_b, counts_b = np.unique(both, return_counts=True)
        return pa.table(
            {"node": pa.array(nodes_b), "p": pa.array(counts_b.astype(np.int64))}
        )

    degs = _merge_count_partials(
        dedges.map_batches(deg_partial, batch_format="pyarrow"), "node", "deg"
    ).materialize()
    n = degs.count()

    # -------- orientation rank
    rank_ref = None
    if n <= node_broadcast_limit:
        deg_tbl = _concat_nonempty(degs)
        nodes_arr = np.asarray(deg_tbl["node"], np.int64)
        deg_arr = np.asarray(deg_tbl["deg"], np.int64)
        idx = np.argsort(nodes_arr)
        nodes_s, deg_s = nodes_arr[idx], deg_arr[idx]
        order = np.lexsort((nodes_s, deg_s))
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.arange(n, dtype=np.int64)
        rank_ref = ray.put((nodes_s, rank))

    def orient(t: pa.Table, _r=rank_ref) -> pa.Table:
        u = np.asarray(t["u"], np.int64)
        v = np.asarray(t["v"], np.int64)
        if _r is not None:
            ns, rk = ray.get(_r)
            ru = rk[np.searchsorted(ns, u)]
            rv = rk[np.searchsorted(ns, v)]
        else:  # id-rank fallback: exactly-once, weaker degree bound
            ru, rv = u, v
        swap = ru > rv
        a = np.where(swap, v, u)
        b = np.where(swap, u, v)
        ra = np.minimum(ru, rv)
        rb = np.maximum(ru, rv)
        return pa.table(
            {
                "a": pa.array(a),
                "b": pa.array(b),
                "ra": pa.array(ra),
                "rb": pa.array(rb),
            }
        )

    oriented = dedges.map_batches(orient, batch_format="pyarrow").materialize()

    num_buckets = 4 * max(2, int(ray.cluster_resources().get("CPU", 4)))

    def tag(t: pa.Table) -> pa.Table:
        a = t["a"]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        hb = (
            pd.util.hash_array(a.to_numpy(zero_copy_only=False)) % num_buckets
        )
        return t.append_column("_hb", pa.array(hb.astype(np.int64)))

    use_pack = m <= edge_broadcast_limit
    edge_set_ref = None
    if use_pack:
        etbl = _concat_nonempty(oriented)
        ea = np.asarray(etbl["a"], np.int64)
        eb = np.asarray(etbl["b"], np.int64)
        if max(
            int(ea.max()), int(eb.max())
        ) < (1 << 31) and min(int(ea.min()), int(eb.min())) >= 0:
            packed = np.sort((ea.astype(np.uint64) << np.uint64(32))
                             | eb.astype(np.uint64))
            edge_set_ref = ray.put(packed)
        else:
            use_pack = False  # ids too wide to pack -> join route

    if use_pack and m <= fold_task_edges:
        # task route: ONE sort task orders the oriented edges by
        # (source, rb) and keeps the table in the object store; the
        # driver holds only run metadata, cuts wedge-balanced
        # run-aligned slices, and parallel tasks expand+match each
        # slice — no groupby exchange at all. Identical integer math
        # to the per-bucket fold (shared _tri_expand_sorted kernel).
        sort_task = ray.remote(num_returns=2)(_tri_sort_task)
        tbl_ref, meta_ref = sort_task.remote(*oriented.to_arrow_refs())
        starts, lens = ray.get(meta_ref)
        wedge_cum = np.cumsum(lens * (lens - 1) // 2)
        total_w = int(wedge_cum[-1]) if len(lens) else 0
        if total_w == 0:
            tri_partials = rd.from_arrow(
                pa.table(
                    {"node": pa.array([], pa.int64()),
                     "p": pa.array([], pa.int64())}
                )
            )
        else:
            ncpu = max(2, int(ray.cluster_resources().get("CPU", 4)))
            nchunks = min(4 * ncpu, len(starts))
            targets = total_w * np.arange(1, nchunks + 1) / nchunks
            run_ends = np.unique(
                np.searchsorted(wedge_cum, targets, side="left")
            )
            n_rows = int(starts[-1] + lens[-1])
            row_bounds = np.concatenate(
                [[0], np.append(starts, n_rows)[run_ends + 1]]
            )
            fold_slice = ray.remote(_tri_fold_slice)
            refs = [
                fold_slice.remote(tbl_ref, int(a_), int(b_), edge_set_ref)
                for a_, b_ in zip(row_bounds[:-1], row_bounds[1:])
                if b_ > a_
            ]
            tri_partials = rd.from_arrow_refs(refs)
    elif use_pack:
        # fused per-bucket: wedge expansion + membership + count
        # partials; wedges never leave the task
        def fold(df: "pd.DataFrame", _e=edge_set_ref) -> "pd.DataFrame":
            E = ray.get(_e)
            a = df["a"].to_numpy()
            b = df["b"].to_numpy()
            rb = df["rb"].to_numpy()
            order = np.lexsort((rb, a))
            un, cn = _tri_expand_sorted(a[order], b[order], E)
            return pd.DataFrame({"node": un, "p": cn})

        tri_partials = (
            oriented.map_batches(tag, batch_format="pyarrow")
            .groupby("_hb")
            .map_groups(fold, batch_format="pandas")
        )
    else:
        # join route: wedges flow into a hash join on (x, y)
        from ..stages.join import inner_join_safe

        def wedges_fold(df: "pd.DataFrame") -> "pd.DataFrame":
            a = df["a"].to_numpy()
            b = df["b"].to_numpy()
            rb = df["rb"].to_numpy()
            order = np.lexsort((rb, a))
            a_s, b_s = a[order], b[order]
            starts = np.flatnonzero(
                np.concatenate([[True], a_s[1:] != a_s[:-1]])
            ) if len(a_s) else np.empty(0, np.int64)
            lens = np.diff(np.append(starts, len(a_s)))
            xs, ys, ws = [], [], []
            for i, j in _succ_pair_slices(lens):
                s0, s1 = int(starts[i]), int(starts[j - 1] + lens[j - 1])
                ls = lens[i:j]
                tot = int(s1 - s0)
                within = np.arange(tot) - np.repeat(np.cumsum(ls) - ls, ls)
                msucc = np.repeat(ls, ls) - 1 - within
                P = int(msucc.sum())
                if P == 0:
                    continue
                left = np.repeat(np.arange(tot), msucc)
                right = (
                    np.arange(P)
                    - np.repeat(np.cumsum(msucc) - msucc, msucc)
                    + left
                    + 1
                )
                xs.append(b_s[s0 + left])
                ys.append(b_s[s0 + right])
                ws.append(a_s[s0 + left])
            if not xs:
                return pd.DataFrame(
                    {
                        "x": np.empty(0, np.int64),
                        "y": np.empty(0, np.int64),
                        "wit": np.empty(0, np.int64),
                    }
                )
            return pd.DataFrame(
                {
                    "x": np.concatenate(xs),
                    "y": np.concatenate(ys),
                    "wit": np.concatenate(ws),
                }
            )

        wedges = (
            oriented.map_batches(tag, batch_format="pyarrow")
            .groupby("_hb")
            .map_groups(wedges_fold, batch_format="pandas")
        )
        closing = oriented.map_batches(
            lambda t: pa.table({"x": t["a"], "y": t["b"]}),
            batch_format="pyarrow",
        )
        matched = inner_join_safe(wedges, closing, on=("x", "y"))

        def tri_partial(t: pa.Table) -> pa.Table:
            allnodes = np.concatenate(
                [
                    np.asarray(t["x"], np.int64),
                    np.asarray(t["y"], np.int64),
                    np.asarray(t["wit"], np.int64),
                ]
            )
            un, cn = np.unique(allnodes, return_counts=True)
            return pa.table(
                {"node": pa.array(un), "p": pa.array(cn.astype(np.int64))}
            )

        tri_partials = matched.map_batches(tri_partial, batch_format="pyarrow")

    tri = _merge_count_partials(tri_partials, "node", "n_tri").materialize()

    # -------- finish: degree ∪ triangle lanes -> one bounded merge
    if n <= node_broadcast_limit:
        tri_tbl = _concat_nonempty(tri) if tri.count() else pa.schema(
            [("node", pa.int64()), ("n_tri", pa.int64())]
        ).empty_table()
        tn = np.asarray(tri_tbl["node"], np.int64)
        tc = np.asarray(tri_tbl["n_tri"], np.int64)
        tidx = np.argsort(tn)
        tn, tc = tn[tidx], tc[tidx]
        pos = np.searchsorted(tn, nodes_s)
        found = (pos < len(tn)) & (tn[np.minimum(pos, max(len(tn) - 1, 0))]
                                   == nodes_s) if len(tn) else np.zeros(
            n, dtype=bool
        )
        ntri = np.zeros(n, dtype=np.int64)
        ntri[found] = tc[pos[found]]
        denom = deg_s * (deg_s - 1)
        cc = np.where(
            deg_s >= 2, (2_000_000 * ntri) // np.maximum(denom, 1), 0
        )
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes_s),
                    "degree": pa.array(deg_s),
                    "n_triangles": pa.array(ntri),
                    "cc_ppm": pa.array(cc.astype(np.int64)),
                }
            )
        )

    # distributed finish: two-lane union + one keyed Sum
    from ray.data.aggregate import Sum as _Sum

    deg_lane = degs.map_batches(
        lambda t: pa.table(
            {
                "node": t["node"],
                "d": t["deg"],
                "t": pa.array(np.zeros(t.num_rows, np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    tri_lane = tri.map_batches(
        lambda t: pa.table(
            {
                "node": t["node"],
                "d": pa.array(np.zeros(t.num_rows, np.int64)),
                "t": t["n_tri"],
            }
        )
        if t.num_columns
        else pa.schema(
            [("node", pa.int64()), ("d", pa.int64()), ("t", pa.int64())]
        ).empty_table(),
        batch_format="pyarrow",
    )
    merged = (
        deg_lane.union(tri_lane)
        .groupby("node")
        .aggregate(_Sum("d", alias_name="degree"), _Sum("t", alias_name="n_triangles"))
    )

    def finish(t: pa.Table) -> pa.Table:
        if not t.num_columns:
            return pa.schema(
                [
                    ("node", pa.int64()),
                    ("degree", pa.int64()),
                    ("n_triangles", pa.int64()),
                    ("cc_ppm", pa.int64()),
                ]
            ).empty_table()
        d = np.asarray(t["degree"], np.int64)
        ntri = np.asarray(t["n_triangles"], np.int64)
        cc = np.where(
            d >= 2, (2_000_000 * ntri) // np.maximum(d * (d - 1), 1), 0
        )
        return pa.table(
            {
                "node": t["node"],
                "degree": pa.array(d),
                "n_triangles": pa.array(ntri),
                "cc_ppm": pa.array(cc.astype(np.int64)),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------------------------ BFS

BFS_NODE_BROADCAST_LIMIT = 5_000_000


def bfs_distances(
    edges: Dataset,
    seeds: Dataset,
    max_depth: int = 3,
    u_col: str = "u",
    v_col: str = "v",
    seed_col: str = "node",
    driver_edge_limit: int = PR_DRIVER_EDGE_LIMIT,
) -> Dataset:
    """Multi-source BFS hop distances over an UNDIRECTED edge Dataset:
    (node, dist) for every node within ``max_depth`` hops of any seed
    (unreachable nodes are absent). Deterministic integers ->
    hash-reproducible across layouts and engines.

    Scale shape: edges canonical-dedup once (driver group_by under
    ``driver_edge_limit``, keyed aggregate above); under the limit the
    whole traversal runs on the driver over a CSR adjacency (sorted
    arrays + searchsorted, vectorized per level). Above it, each level
    is Dataset algebra: frontier ⋈ edges (inner_join_safe on src) ->
    distinct neighbor candidates at dist l+1 -> union with the running
    (node, dist) state -> ONE keyed Min per level keeps the earliest
    level. Per-level exchange volume is bounded by frontier-adjacent
    edges, never the graph. Both routes pytest-forced equal."""
    import ray.data as rd
    from ray.data.aggregate import Min

    # canonical dedup (reuse triangle_counts' shape)
    def canon(t: pa.Table) -> pa.Table:
        u = np.asarray(t[u_col], dtype=np.int64)
        v = np.asarray(t[v_col], dtype=np.int64)
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        keep = lo != hi
        return (
            pa.table({"u": pa.array(lo[keep]), "v": pa.array(hi[keep])})
            .group_by(["u", "v"])
            .aggregate([])
        )

    partials = edges.map_batches(canon, batch_format="pyarrow").materialize()
    empty_out = rd.from_arrow(
        pa.schema([("node", pa.int64()), ("dist", pa.int64())]).empty_table()
    )
    if partials.count() == 0:
        return empty_out

    seed_tbl = pa.concat_tables(
        [
            t.select([seed_col])
            for t in ray.get(seeds.to_arrow_refs())
            if t.num_columns and t.num_rows
        ]
        or [pa.schema([(seed_col, pa.int64())]).empty_table()]
    )
    seed_arr = np.unique(np.asarray(seed_tbl[seed_col], np.int64))
    if len(seed_arr) == 0:
        return empty_out

    if partials.count() <= driver_edge_limit:
        dt = _dedup_partials(partials, ["u", "v"])
        u = np.asarray(dt["u"], np.int64)
        v = np.asarray(dt["v"], np.int64)
        # symmetric CSR: both directions, sorted by src
        src = np.concatenate([u, v])
        dst = np.concatenate([v, u])
        order = np.argsort(src, kind="stable")
        src, dst = src[order], dst[order]
        nodes = np.unique(src)
        frontier = np.intersect1d(seed_arr, nodes)
        # seeds not present in the graph still get dist 0 (they are
        # nodes of the universe the caller passed) — match the SQL
        # oracle, whose d0 is the seed set itself
        dist = {int(s): 0 for s in seed_arr}
        for lvl in range(1, max_depth + 1):
            if len(frontier) == 0:
                break
            lo = np.searchsorted(src, frontier, side="left")
            hi = np.searchsorted(src, frontier, side="right")
            neigh = np.unique(
                np.concatenate(
                    [dst[a:b] for a, b in zip(lo, hi)]
                    or [np.empty(0, np.int64)]
                )
            )
            new = np.array(
                [x for x in neigh.tolist() if x not in dist], np.int64
            )
            for x in new.tolist():
                dist[x] = lvl
            frontier = new
        items = sorted(dist.items())
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([a for a, _ in items], pa.int64()),
                    "dist": pa.array([b for _, b in items], pa.int64()),
                }
            )
        )

    # distributed route: per-level frontier ⋈ edges -> keyed Min merge
    from ..stages.join import inner_join_safe

    sym = partials.map_batches(
        lambda t: pa.table(
            {
                "src": pa.concat_arrays(
                    [
                        t["u"].combine_chunks(),
                        t["v"].combine_chunks(),
                    ]
                ),
                "dst": pa.concat_arrays(
                    [
                        t["v"].combine_chunks(),
                        t["u"].combine_chunks(),
                    ]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    dist_ds = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(seed_arr, pa.int64()),
                "dist": pa.array(np.zeros(len(seed_arr), np.int64)),
            }
        )
    ).materialize()
    frontier_ds = dist_ds
    for lvl in range(1, max_depth + 1):
        if frontier_ds.count() == 0:
            break
        cand = inner_join_safe(
            sym,
            frontier_ds.map_batches(
                lambda t: pa.table({"node": t["node"]}),
                batch_format="pyarrow",
            ),
            on=("src",),
            right_on=("node",),
        ).map_batches(
            lambda t, _l=lvl: pa.table(
                {
                    "node": t["dst"],
                    "dist": pa.array(
                        np.full(t.num_rows, _l, dtype=np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        merged = (
            dist_ds.union(cand)
            .groupby("node")
            .aggregate(Min("dist", alias_name="dist"))
            .materialize()
        )
        frontier_ds = merged.map_batches(
            lambda t, _l=lvl: t.filter(pc.equal(t["dist"], _l))
            if t.num_columns
            else t,
            batch_format="pyarrow",
        ).materialize()
        dist_ds = merged
    return dist_ds


# ----------------------------------------------------------------- k-core

def kcore_nodes(
    edges: Dataset,
    k: int,
    max_rounds: int = 100,
    driver_edge_limit: int = PR_DRIVER_EDGE_LIMIT,
) -> Dataset:
    """Nodes of the k-CORE of an undirected graph — iterative peeling
    (remove nodes with degree < k, recompute, repeat to fixpoint), the
    classic community/noise separator. Returns a (node,) Dataset.
    Deterministic (the k-core is unique) -> layout-independent.

    Scale shape: edge dedup as in triangle_counts; under
    ``driver_edge_limit`` the peeling runs on the driver, one
    vectorized bincount per round. Above it each round is Dataset
    algebra: alive-edge semi joins on both endpoints -> degree count
    partials -> one keyed Sum -> filter deg >= k; rounds are capped at
    ``max_rounds`` (peeling converges in at most #nodes rounds; real
    graphs take a handful). Both routes pytest-forced equal."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def canon(t: pa.Table) -> pa.Table:
        u = np.asarray(t["u"], dtype=np.int64)
        v = np.asarray(t["v"], dtype=np.int64)
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        keep = lo != hi
        return (
            pa.table({"u": pa.array(lo[keep]), "v": pa.array(hi[keep])})
            .group_by(["u", "v"])
            .aggregate([])
        )

    partials = edges.map_batches(canon, batch_format="pyarrow").materialize()
    empty_out = rd.from_arrow(
        pa.schema([("node", pa.int64())]).empty_table()
    )
    if partials.count() == 0:
        return empty_out

    if partials.count() <= driver_edge_limit:
        dt = _dedup_partials(partials, ["u", "v"])
        u = np.asarray(dt["u"], np.int64)
        v = np.asarray(dt["v"], np.int64)
        nodes = np.unique(np.concatenate([u, v]))
        ui = np.searchsorted(nodes, u)
        vi = np.searchsorted(nodes, v)
        alive = np.ones(len(nodes), dtype=bool)
        for _ in range(max_rounds):
            ea = alive[ui] & alive[vi]
            deg = np.bincount(ui[ea], minlength=len(nodes)) + np.bincount(
                vi[ea], minlength=len(nodes)
            )
            dead = alive & (deg < k)
            if not dead.any():
                break
            alive &= ~dead
        return rd.from_arrow(
            pa.table({"node": pa.array(nodes[alive], pa.int64())})
        )

    # distributed route: semi-join peeling rounds
    from ray.data.aggregate import Count

    dedges = (
        partials.groupby(["u", "v"])
        .aggregate(Count(alias_name="_m"))
        .map_batches(
            lambda t: t.select(["u", "v"])
            if t.num_columns
            else pa.schema(
                [("u", pa.int64()), ("v", pa.int64())]
            ).empty_table(),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def node_partial(t: pa.Table) -> pa.Table:
        both = np.unique(
            np.concatenate(
                [np.asarray(t["u"], np.int64), np.asarray(t["v"], np.int64)]
            )
        )
        return pa.table({"node": pa.array(both)})

    from .tokens import _merge_count_partials
    from ..stages.join import inner_join_safe

    alive = (
        dedges.map_batches(node_partial, batch_format="pyarrow")
        .map_batches(
            lambda t: pa.table(
                {"node": t["node"], "p": pa.array(np.ones(t.num_rows, np.int64))}
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .aggregate(Sum("p", alias_name="_x"))
        .map_batches(
            lambda t: t.select(["node"])
            if t.num_columns
            else pa.schema([("node", pa.int64())]).empty_table(),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n_alive = alive.count()
    for _ in range(max_rounds):
        if n_alive == 0:
            return empty_out
        ea = inner_join_safe(
            inner_join_safe(dedges, alive, on=("u",), right_on=("node",)),
            alive,
            on=("v",),
            right_on=("node",),
        )

        def deg_partial(t: pa.Table) -> pa.Table:
            both = np.concatenate(
                [np.asarray(t["u"], np.int64), np.asarray(t["v"], np.int64)]
            )
            nb, cb = np.unique(both, return_counts=True)
            return pa.table(
                {"node": pa.array(nb), "p": pa.array(cb.astype(np.int64))}
            )

        deg_parts = ea.map_batches(
            deg_partial, batch_format="pyarrow"
        ).materialize()
        if deg_parts.count() == 0:
            # no surviving edges: no node can reach degree k >= 1
            return empty_out
        degs = _merge_count_partials(deg_parts, "node", "deg")
        new_alive = degs.map_batches(
            lambda t, _k=k: pa.table(
                {"node": t["node"].filter(pc.greater_equal(t["deg"], _k))}
            )
            if t.num_columns
            else pa.schema([("node", pa.int64())]).empty_table(),
            batch_format="pyarrow",
        ).materialize()
        n_new = new_alive.count()
        if n_new == n_alive:
            break
        alive, n_alive = new_alive, n_new
    return alive
