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
        ptbl = _concat_nonempty(partials)
        dtbl = (
            ptbl.select(["src", "dst"])
            .group_by(["src", "dst"])
            .aggregate([])
        )
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
