"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — per-batch numpy matmul against a
broadcast query matrix (ray.put once; every task reads the ObjectRef),
local top-k per batch, tiny final merge. Data moved to the merge is
O(k x #batches), independent of corpus size.

Scale path: IVF (inverted-file) — deterministic k-means-lite
centroids, per-batch assignment, search only the nprobe closest
centroid partitions for each query. Recall vs brute force is asserted
in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset


def _vec_matrix(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lengths = pa.compute.list_value_length(col).to_numpy(zero_copy_only=False)
    d = int(lengths[0]) if len(lengths) else 0
    flat = np.asarray(col.flatten(), dtype=np.float32)
    return flat.reshape(-1, d)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-12)


def brute_force_topk(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_ids: set | None = None,
) -> "np.ndarray":
    """Exact cosine top-k for each query row. Returns a pandas DataFrame
    (query_id, rank, vec_id, cosine) sorted by (query_id, rank)."""
    import pandas as pd

    q_unit = _normalize(queries.astype(np.float64))
    q_ref = ray.put(q_unit)
    excl = exclude_ids or set()

    def local_topk(t: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        mat = _vec_matrix(t[vec_col]).astype(np.float64)
        ids = np.asarray(t[id_col])
        if excl:
            keep = ~np.isin(ids, list(excl))
            mat, ids = mat[keep], ids[keep]
        if len(ids) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int32()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        sims = _normalize(mat) @ q.T  # (n, nq)
        kk = min(k, sims.shape[0])
        idx = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
        rows = {"query_id": [], "vec_id": [], "cosine": []}
        for qi in range(sims.shape[1]):
            sel = idx[:, qi]
            rows["query_id"].extend([qi] * len(sel))
            rows["vec_id"].extend(ids[sel].tolist())
            rows["cosine"].extend(sims[sel, qi].tolist())
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], pa.int32()),
                "vec_id": pa.array(rows["vec_id"], pa.int64()),
                "cosine": pa.array(rows["cosine"], pa.float64()),
            }
        )

    partials = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    out = []
    for qi, g in partials.groupby("query_id"):
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(len(g), dtype=np.int32))
        out.append(g)
    res = pd.concat(out, ignore_index=True) if out else partials.assign(rank=[])
    return res[["query_id", "rank", "vec_id", "cosine"]].sort_values(
        ["query_id", "rank"], ignore_index=True
    )


# Lloyd iterations run as one task per BLOCK (not a Dataset pass per
# round) up to this many blocks: k rounds cost k task waves instead of
# k pipeline executions, and only (n_centroids x dim) partials travel.
# Above the guard the map_batches loop takes over (its keyed partials
# amortize at real volume, where per-execution fixed cost vanishes).
IVF_FUSED_MAX_BLOCKS = 4096


def _centroid_pick_block(block: pa.Table, id_col: str, stride: int) -> pa.Table:
    if block.num_columns == 0 or block.num_rows == 0:
        return block
    ids = np.asarray(block[id_col], dtype=np.int64)
    return block.filter(pa.array(ids % stride == 0))


def _centroid_partial_block(
    block: pa.Table, c: np.ndarray, vec_col: str
) -> tuple:
    """Per-centroid (float32 partial sums, counts) of one block — the
    same math as the Dataset loop's per-batch partial (float32
    round-trip included, so the ordered fold reproduces its float
    sequence per centroid)."""
    if block.num_columns == 0 or block.num_rows == 0:
        return (
            np.zeros_like(c, dtype=np.float32),
            np.zeros(len(c), dtype=np.float64),
        )
    m = _vec_matrix(block[vec_col]).astype(np.float64)
    assign = np.argmin(((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2), axis=1)
    sums = np.zeros_like(c)
    np.add.at(sums, assign, m)
    counts = np.bincount(assign, minlength=len(c)).astype(np.float64)
    return sums.astype(np.float32), counts


def build_ivf_centroids(
    ds: Dataset, n_centroids: int = 16, vec_col: str = "embedding", iters: int = 4,
    seed: int = 11, id_col: str | None = None,
    fused_max_blocks: int = IVF_FUSED_MAX_BLOCKS,
) -> np.ndarray:
    """Deterministic k-means-lite: sample initial centroids, then a few
    Lloyd iterations emitting per-centroid partial sums (the classic
    mergeable-sketch shape — only (n_centroids x dim) floats leave a
    block). Below ``fused_max_blocks`` each iteration is one task wave
    over the materialized blocks; above it, one map_batches pass."""
    ds = ds.materialize()
    total = ds.count()
    want = max(n_centroids * 8, 256)
    refs = ds.to_arrow_refs()
    fused = len(refs) <= fused_max_blocks
    pick_task = ray.remote(_centroid_pick_block) if fused else None
    part_task = ray.remote(_centroid_partial_block) if fused else None
    if id_col is not None:
        # deterministic init independent of block layout / CPU count:
        # a fixed-stride systematic sample over the sorted id space
        stride = max(total // want, 1)
        if fused:
            picked = ray.get(
                [pick_task.remote(r, id_col, stride) for r in refs]
            )
            picked = [p for p in picked if p.num_columns and p.num_rows]
            sample = (
                pa.concat_tables(picked).to_pandas()
                if picked
                else ds.limit(0).to_pandas()
            )
        else:

            def pick(t: "pa.Table") -> "pa.Table":
                ids = np.asarray(t[id_col], dtype=np.int64)
                return t.filter(pa.array(ids % stride == 0))

            sample = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
        sample = sample.sort_values(id_col).head(want)
    else:
        frac = min(1.0, want / max(total, 1))
        sample = ds.random_sample(frac, seed=seed).to_pandas()
    if len(sample) < n_centroids:
        sample = ds.limit(want).to_pandas()
    mat = np.stack(sample[vec_col].to_numpy())
    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(len(mat), n_centroids, replace=False)].astype(np.float64)

    for _ in range(iters):
        sums = np.zeros_like(centroids)
        cnts = np.zeros(len(centroids))
        if fused:
            parts = ray.get(
                [part_task.remote(r, centroids, vec_col) for r in refs]
            )
            # fold in block order — the same float sequence per
            # centroid as the Dataset loop's row-ordered fold
            for s32, cn in parts:
                sums += np.asarray(s32, dtype=np.float64)
                cnts += cn
        else:
            c_ref = ray.put(centroids)

            def partial_sums(t: pa.Table) -> pa.Table:
                c = ray.get(c_ref)
                s32, cn = _centroid_partial_block(t, c, vec_col)
                return pa.table(
                    {
                        "cid": pa.array(np.arange(len(c), dtype=np.int32)),
                        "sum": pa.array(list(s32)),
                        "cnt": pa.array(cn),
                    }
                )

            agg = ds.map_batches(partial_sums, batch_format="pyarrow").to_pandas()
            for _, row in agg.iterrows():
                sums[row["cid"]] += np.asarray(row["sum"], dtype=np.float64)
                cnts[row["cid"]] += row["cnt"]
        nz = cnts > 0
        centroids[nz] = sums[nz] / cnts[nz][:, None]
    return centroids


def ivf_topk(
    ds: Dataset,
    queries: np.ndarray,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """IVF search: only rows assigned to each query's nprobe closest
    centroids are scored. One map_batches pass; each batch scores only
    its rows belonging to probed cells (vectorized mask)."""
    import pandas as pd

    q_raw = queries.astype(np.float64)
    q_unit = _normalize(q_raw)
    # probe in the same (raw) space vectors are assigned in
    qd = ((q_raw[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probe = np.argsort(qd, axis=1)[:, :nprobe]  # (nq, nprobe)
    c_ref = ray.put(centroids)
    q_ref = ray.put((q_unit, probe))

    def local(t: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        q, pr = ray.get(q_ref)
        m = _vec_matrix(t[vec_col]).astype(np.float64)
        ids = np.asarray(t[id_col])
        assign = np.argmin(((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2), axis=1)
        unit = _normalize(m)
        rows = {"query_id": [], "vec_id": [], "cosine": []}
        for qi in range(len(q)):
            mask = np.isin(assign, pr[qi])
            if not mask.any():
                continue
            sims = unit[mask] @ q[qi]
            sel_ids = ids[mask]
            kk = min(k, len(sims))
            top = np.argpartition(-sims, kk - 1)[:kk]
            rows["query_id"].extend([qi] * kk)
            rows["vec_id"].extend(sel_ids[top].tolist())
            rows["cosine"].extend(sims[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], pa.int32()),
                "vec_id": pa.array(rows["vec_id"], pa.int64()),
                "cosine": pa.array(rows["cosine"], pa.float64()),
            }
        )

    partials = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    out = []
    for qi, g in partials.groupby("query_id"):
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(len(g), dtype=np.int32))
        out.append(g)
    res = pd.concat(out, ignore_index=True) if out else partials.assign(rank=[])
    return res[["query_id", "rank", "vec_id", "cosine"]].sort_values(
        ["query_id", "rank"], ignore_index=True
    )


# Base tables up to this many vectors are broadcast for KNN joins
# (ray.put once, matmul per query batch); beyond it route through IVF
# (build_ivf_centroids + ivf_topk per query batch) instead of
# broadcasting an unbounded matrix.
KNN_BROADCAST_ROWS = 2_000_000


def knn_self_join(
    ds: Dataset,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    broadcast_limit_rows: int = KNN_BROADCAST_ROWS,
) -> Dataset:
    """Embedding similarity self-join: for EVERY vector, its k nearest
    neighbors by cosine (excluding itself). Returns a Dataset of
    (query_id, rank, neighbor_id).

    Scale shape: the base matrix is unit-normalized once and broadcast
    via ray.put (guarded by ``broadcast_limit_rows``); the query side
    streams through map_batches, each batch doing one (batch x base)
    float64 matmul + vectorized top-(k+1) argpartition. The shuffle-free
    plan is O(batches) object-store reads of the single base copy. For
    bases beyond the guard, build IVF centroids and run ivf_topk per
    query batch instead (the candidate-list route keeps per-batch work
    O(batch x base/nlist x nprobe)).
    """
    import ray

    n_rows = ds.count()
    if n_rows > broadcast_limit_rows:
        # beyond the broadcast budget: route through the distributed
        # IVF co-partitioned join (approximate; recall set by nprobe)
        return knn_self_join_ivf(ds, k=k, vec_col=vec_col, id_col=id_col)

    # build the broadcast base in a REMOTE task from the block refs, so
    # the driver never materializes the (guarded, up to ~1 GB) matrix —
    # it only holds the ObjectRef
    @ray.remote
    def _build_base(*blocks: pa.Table):
        base = pa.concat_tables([t for t in blocks if t.num_columns])
        ids = np.asarray(base[id_col], dtype=np.int64)
        mat = _normalize(_vec_matrix(base[vec_col]).astype(np.float64))
        return ids, mat

    base_ref = _build_base.remote(*ds.to_arrow_refs())

    def batch_knn(t: pa.Table) -> pa.Table:
        ids_np, mat = ray.get(base_ref)
        q_ids = np.asarray(t[id_col], dtype=np.int64)
        q = _normalize(_vec_matrix(t[vec_col]).astype(np.float64))
        if len(q_ids) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int32()),
                    "neighbor_id": pa.array([], pa.int64()),
                }
            )
        sims = q @ mat.T  # (nq, nbase)
        # exclude self matches by id
        self_mask = q_ids[:, None] == ids_np[None, :]
        sims[self_mask] = -np.inf
        kk = min(k, sims.shape[1] - 1)
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        top_sims = np.take_along_axis(sims, top, axis=1)
        top_ids = ids_np[top]
        # deterministic rank: sim desc, neighbor id asc
        order = np.lexsort((top_ids, -top_sims), axis=1)
        top_ids = np.take_along_axis(top_ids, order, axis=1)
        nq = len(q_ids)
        return pa.table(
            {
                "query_id": pa.array(np.repeat(q_ids, kk)),
                "rank": pa.array(
                    np.tile(np.arange(kk, dtype=np.int32), nq)
                ),
                "neighbor_id": pa.array(top_ids.reshape(-1)),
            }
        )

    return ds.map_batches(batch_knn, batch_format="pyarrow")


def knn_self_join_ivf(
    ds: Dataset,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 32,
    nprobe: int = 8,
) -> Dataset:
    """Distributed approximate KNN self-join via IVF co-partitioning —
    the scale route when the base matrix exceeds the broadcast budget.

    Plan: k-means centroids (mergeable partial sums) -> every vector
    joins its assigned list (one row), every QUERY joins its nprobe
    closest lists (nprobe rows) -> one keyed shuffle on list_id
    co-locates each list's base vectors with the queries probing it ->
    per-list vectorized matmul + local top-k -> per-query merge of the
    <= k x nprobe survivors. Only (list_id, id, vector) rows move;
    per-reducer work is O(list size x probing queries), never
    all-pairs. Approximate: recall is governed by nprobe/n_centroids
    (pytest asserts >= 0.8 against the exact join on clustered data).
    """
    import pandas as pd

    cents = build_ivf_centroids(ds, n_centroids=n_centroids, id_col=id_col)
    c_ref = ray.put(cents)

    def assign_base(t: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        m = _vec_matrix(t[vec_col]).astype(np.float64)
        ids = np.asarray(t[id_col], dtype=np.int64)
        if len(ids) == 0:
            return pa.table(
                {
                    "list_id": pa.array([], pa.int32()),
                    "vid": pa.array([], pa.int64()),
                    "unit": pa.array([], pa.list_(pa.float32())),
                    "side": pa.array([], pa.int8()),
                }
            )
        assign = np.argmin(
            ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2), axis=1
        )
        unit = _normalize(m).astype(np.float32)
        return pa.table(
            {
                "list_id": pa.array(assign.astype(np.int32)),
                "vid": pa.array(ids),
                "unit": pa.array(list(unit)),
                "side": pa.array(np.zeros(len(ids), np.int8)),
            }
        )

    def assign_query(t: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        m = _vec_matrix(t[vec_col]).astype(np.float64)
        ids = np.asarray(t[id_col], dtype=np.int64)
        if len(ids) == 0:
            return pa.table(
                {
                    "list_id": pa.array([], pa.int32()),
                    "vid": pa.array([], pa.int64()),
                    "unit": pa.array([], pa.list_(pa.float32())),
                    "side": pa.array([], pa.int8()),
                }
            )
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        probe = np.argsort(d2, axis=1)[:, :nprobe]  # (n, nprobe)
        unit = _normalize(m).astype(np.float32)
        n = len(ids)
        return pa.table(
            {
                "list_id": pa.array(probe.reshape(-1).astype(np.int32)),
                "vid": pa.array(np.repeat(ids, nprobe)),
                "unit": pa.array(list(np.repeat(unit, nprobe, axis=0))),
                "side": pa.array(np.ones(n * nprobe, np.int8)),
            }
        )

    tagged = ds.map_batches(assign_base, batch_format="pyarrow").union(
        ds.map_batches(assign_query, batch_format="pyarrow")
    )

    def per_list(df: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                "neighbor_id": pd.Series([], dtype="int64"),
                "sim": pd.Series([], dtype="float64"),
            }
        )
        b = df[df["side"] == 0]
        q = df[df["side"] == 1]
        if len(b) == 0 or len(q) == 0:
            return empty
        bm = np.stack(b["unit"].to_numpy()).astype(np.float64)
        qm = np.stack(q["unit"].to_numpy()).astype(np.float64)
        bids = b["vid"].to_numpy()
        qids = q["vid"].to_numpy()
        sims = qm @ bm.T
        sims[qids[:, None] == bids[None, :]] = -np.inf  # self-exclusion
        kk = min(k, sims.shape[1])
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        top_sims = np.take_along_axis(sims, top, axis=1)
        keep = np.isfinite(top_sims.reshape(-1))
        return pd.DataFrame(
            {
                "query_id": np.repeat(qids, kk)[keep],
                "neighbor_id": bids[top].reshape(-1)[keep],
                "sim": top_sims.reshape(-1)[keep],
            }
        )

    pairs = tagged.groupby("list_id").map_groups(per_list, batch_format="pandas")

    def merge_query(df: "pd.DataFrame") -> "pd.DataFrame":
        df = (
            df.drop_duplicates(["query_id", "neighbor_id"])
            .sort_values(["sim", "neighbor_id"], ascending=[False, True],
                         kind="mergesort")
            .head(k)
        )
        return pd.DataFrame(
            {
                "query_id": df["query_id"].to_numpy(),
                "rank": np.arange(len(df), dtype=np.int32),
                "neighbor_id": df["neighbor_id"].to_numpy(),
            }
        )

    return pairs.groupby("query_id").map_groups(merge_query, batch_format="pandas")


class HNSWIndex:
    """Pure-numpy/heapq HNSW graph (Malkov & Yashunin 2016,
    arXiv:1603.09320) over unit-normalized vectors, cosine distance
    (d = 1 - sim). Deterministic: element levels come from a seeded
    RNG, candidate expansion is vectorized (one dot-product per
    frontier node's neighbor list), neighbor selection is closest-M.

    This is the in-memory building block; distribution happens OUTSIDE
    the graph (shard-parallel indexes in hnsw_topk / an actor-held
    index in HNSWQueryStage) — an HNSW graph itself is a shared
    mutable structure and does not shard."""

    def __init__(
        self,
        vectors: np.ndarray,
        ids: np.ndarray | None = None,
        M: int = 16,
        ef_construction: int = 64,
        seed: int = 7,
    ) -> None:
        self.v = _normalize(np.asarray(vectors, dtype=np.float64))
        self.ids = (
            np.asarray(ids, dtype=np.int64)
            if ids is not None
            else np.arange(len(self.v), dtype=np.int64)
        )
        self.M = M
        self.ef_construction = ef_construction
        n = len(self.v)
        rng = np.random.default_rng(seed)
        ml = 1.0 / np.log(M)
        self.levels = np.minimum(
            (-np.log(rng.uniform(1e-12, 1.0, n)) * ml).astype(np.int64), 32
        )
        # graph[layer][node] -> np.ndarray of neighbor indices
        self.graph: list[dict] = [
            {} for _ in range(int(self.levels.max()) + 1 if n else 1)
        ]
        self.entry = -1
        self.top = -1
        for i in range(n):
            self._insert(i)

    # -- internals --------------------------------------------------

    def _search_layer(self, q: np.ndarray, entries, ef: int, layer: int):
        """Classic ef-search on one layer; returns [(dist, node)] asc."""
        import heapq

        g = self.graph[layer]
        visited = set(entries)
        dists = 1.0 - self.v[list(entries)] @ q
        cand = list(zip(dists.tolist(), entries))  # min-heap
        heapq.heapify(cand)
        result = [(-d, n) for d, n in cand]  # max-heap by dist
        heapq.heapify(result)
        while cand:
            d, c = heapq.heappop(cand)
            if d > -result[0][0] and len(result) >= ef:
                break
            neigh = g.get(c)
            if neigh is None or not len(neigh):
                continue
            new = [n for n in neigh.tolist() if n not in visited]
            if not new:
                continue
            visited.update(new)
            nd = 1.0 - self.v[new] @ q
            for n_, dn in zip(new, nd.tolist()):
                if len(result) < ef or dn < -result[0][0]:
                    heapq.heappush(cand, (dn, n_))
                    heapq.heappush(result, (-dn, n_))
                    if len(result) > ef:
                        heapq.heappop(result)
        return sorted((-md, n) for md, n in result)

    def _greedy_descend(self, q: np.ndarray, from_layer: int, to_layer: int) -> int:
        cur = self.entry
        cur_d = 1.0 - self.v[cur] @ q
        for lc in range(from_layer, to_layer, -1):
            changed = True
            while changed:
                changed = False
                neigh = self.graph[lc].get(cur)
                if neigh is None or not len(neigh):
                    break
                nd = 1.0 - self.v[neigh] @ q
                j = int(np.argmin(nd))
                if nd[j] < cur_d:
                    cur, cur_d = int(neigh[j]), float(nd[j])
                    changed = True
        return cur

    def _link(self, layer: int, a: int, b: int, mmax: int) -> None:
        g = self.graph[layer]
        cur = g.get(a)
        arr = np.array([b], dtype=np.int64) if cur is None else np.append(cur, b)
        if len(arr) > mmax:  # prune to the mmax closest
            d = 1.0 - self.v[arr] @ self.v[a]
            arr = arr[np.argsort(d, kind="stable")[:mmax]]
        g[a] = arr

    def _insert(self, i: int) -> None:
        lvl = int(self.levels[i])
        if self.entry < 0:
            self.entry, self.top = i, lvl
            return
        q = self.v[i]
        ep = self.entry
        if self.top > lvl:
            ep = self._greedy_descend(q, self.top, lvl)
        for lc in range(min(self.top, lvl), -1, -1):
            found = self._search_layer(q, [ep], self.ef_construction, lc)
            mmax = self.M * 2 if lc == 0 else self.M
            for _, n_ in found[: self.M]:
                self._link(lc, i, n_, mmax)
                self._link(lc, n_, i, mmax)
            ep = found[0][1]
        if lvl > self.top:
            self.entry, self.top = i, lvl

    # -- public -----------------------------------------------------

    def search(self, q: np.ndarray, k: int, ef: int = 64):
        """Top-k (ids, cosine sims) for one unit query vector."""
        if self.entry < 0:
            return np.empty(0, np.int64), np.empty(0)
        ep = self._greedy_descend(q, self.top, 0)
        found = self._search_layer(q, [ep], max(ef, k), 0)[:k]
        idx = np.array([n for _, n in found], dtype=np.int64)
        sims = 1.0 - np.array([d for d, _ in found])
        return self.ids[idx], sims


def hnsw_topk(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    M: int = 16,
    ef_construction: int = 64,
    ef_search: int = 96,
    batch_size: int = 8192,
):
    """Graph-based ANN: shard-parallel HNSW. Each batch builds an
    in-memory HNSW graph over its own rows and searches the broadcast
    query matrix; the tiny per-shard top-k survivors merge exactly —
    so recall loss comes only from the within-shard graph search
    (pytest asserts >= 0.9 vs brute force). Returns a pandas DataFrame
    (query_id, rank, vec_id, cosine).

    Scale shape: index build is embarrassingly parallel per shard
    (bounded by ``batch_size``), queries broadcast once via ray.put,
    merge traffic is O(k x queries x shards) — the same contract as
    brute_force_topk with matmul swapped for an O(n log n) graph. A
    persistent query service would instead hold per-shard graphs in
    actors (see HNSWQueryStage for the built-once, query-stream
    variant)."""
    import pandas as pd

    q_unit = _normalize(queries.astype(np.float64))
    q_ref = ray.put(q_unit)

    def local(t: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = np.asarray(t[id_col], dtype=np.int64)
        if len(ids) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int32()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        index = HNSWIndex(
            _vec_matrix(t[vec_col]),
            ids,
            M=M,
            ef_construction=ef_construction,
            seed=int(ids[0]) & 0x7FFFFFFF,
        )
        rows = {"query_id": [], "vec_id": [], "cosine": []}
        for qi in range(len(q)):
            nids, sims = index.search(q[qi], k, ef=ef_search)
            rows["query_id"].extend([qi] * len(nids))
            rows["vec_id"].extend(nids.tolist())
            rows["cosine"].extend(sims.tolist())
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], pa.int32()),
                "vec_id": pa.array(rows["vec_id"], pa.int64()),
                "cosine": pa.array(rows["cosine"], pa.float64()),
            }
        )

    partials = ds.map_batches(
        local, batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()
    out = []
    for qi, g in partials.groupby("query_id"):
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(len(g), dtype=np.int32))
        out.append(g)
    res = pd.concat(out, ignore_index=True) if out else partials.assign(rank=[])
    return res[["query_id", "rank", "vec_id", "cosine"]].sort_values(
        ["query_id", "rank"], ignore_index=True
    )


class HNSWQueryStage:
    """Actor-pool stage for streaming QUERIES against a built index:
    the base (bounded — caller guards like KNN_BROADCAST_ROWS) is
    broadcast once; each actor builds its HNSW graph ONCE in __init__
    and serves every query batch from it — the canonical
    stateful-setup-per-actor shape. Use:

        base_ref = ray.put((ids, vectors))
        out = query_ds.map_batches(
            HNSWQueryStage, fn_constructor_kwargs={"base_ref": base_ref,
            "k": 10}, concurrency=(1, 8), batch_format="pyarrow")
    """

    def __init__(
        self,
        base_ref,
        k: int = 10,
        vec_col: str = "embedding",
        id_col: str = "query_id",
        ef_search: int = 96,
        **hnsw_kw,
    ) -> None:
        ids, vectors = ray.get(base_ref)
        self.index = HNSWIndex(np.asarray(vectors), np.asarray(ids), **hnsw_kw)
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col
        self.ef_search = ef_search

    def __call__(self, t: pa.Table) -> pa.Table:
        q = _normalize(_vec_matrix(t[self.vec_col]).astype(np.float64))
        qids = np.asarray(t[self.id_col], dtype=np.int64)
        rows = {"query_id": [], "rank": [], "vec_id": [], "cosine": []}
        for i in range(len(qids)):
            nids, sims = self.index.search(q[i], self.k, ef=self.ef_search)
            rows["query_id"].extend([int(qids[i])] * len(nids))
            rows["rank"].extend(range(len(nids)))
            rows["vec_id"].extend(nids.tolist())
            rows["cosine"].extend(sims.tolist())
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], pa.int64()),
                "rank": pa.array(rows["rank"], pa.int32()),
                "vec_id": pa.array(rows["vec_id"], pa.int64()),
                "cosine": pa.array(rows["cosine"], pa.float64()),
            }
        )
