"""Distributed BPE tokenizer training (byte-pair-encoding merges).

Learns the top-k BPE merges from a tokenized corpus — the "train a
tokenizer on the corpus" step of an LLM data pipeline. Classic BPE
semantics: each round counts all adjacent token pairs (overlapping
occurrences included, the textbook counting), picks the most frequent
pair (deterministic tiebreak: smallest (t1, t2)), assigns it a fresh
token id, and rewrites the corpus by replacing non-overlapping
occurrences greedily left-to-right.

Scale shape per round: pair counting is the packed-int64 partial
pattern (only (pair, count) rows shuffle — bounded by distinct pairs,
never corpus size; the final merge reuses tokens._merge_count_partials
with its bounded-driver/keyed-aggregate routing); the winning pair is
found by per-block local top-1 then a driver pick over <= #blocks
candidates. The rewrite is one fully vectorized map_batches pass
(match mask -> run-parity non-overlap resolution -> flat-buffer
delete/rebuild) and the result is materialized because the next
round's counts re-read it (k rounds = 2k corpus passes; standard
practice at scale is to train on a hash-sample — ``sample_mod``).

BPE training is inherently sequential in k (each merge changes the
pair statistics), so k drives latency, not corpus size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

# pack (t1, t2) into one int64; ids stay far below this after any
# practical number of merges (byte vocab + k new ids)
_PACK = np.int64(1) << np.int64(21)


def _pair_count_partial(tokens_col: str):
    def partial(t: pa.Table) -> pa.Table:
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # zero-copy int32 view; widened per-subarray in the key pack
        flat = col.flatten().to_numpy(zero_copy_only=True)
        empty = pa.table(
            {"key": pa.array([], pa.int64()), "p": pa.array([], pa.int64())}
        )
        if len(flat) < 2:
            return empty
        L = np.asarray(pc.list_value_length(col).fill_null(0), dtype=np.int64)
        ends = np.cumsum(L[L > 0]) - 1
        valid = np.ones(len(flat) - 1, dtype=bool)
        valid[ends[ends < len(flat) - 1]] = False
        keys = np.multiply(flat[:-1][valid], _PACK, dtype=np.int64) + flat[1:][valid]
        vc = pc.value_counts(pa.array(keys, pa.int64()))
        return pa.table(
            {
                "key": pc.struct_field(vc, "values"),
                "p": pc.struct_field(vc, "counts"),
            }
        )

    return partial


def _top_pair(ds: Dataset, tokens_col: str) -> tuple[int, int, int] | None:
    """(t1, t2, count) of the globally most frequent adjacent pair;
    ties break to the smallest packed key. None if no pairs exist.

    NOTE: an attempted "fold top-1 into a driver merge" variant was
    measured 2x SLOWER here (27-40 s vs 18 s at sf0.1's sampled
    volume): concatenating ~6M partial rows per round on the driver
    re-faults ~100 MB of fresh pages per round on this VM. The
    _merge_count_partials routing below already picks the right
    merge plan."""
    from .tokens import _merge_count_partials

    partials = ds.map_batches(
        _pair_count_partial(tokens_col), batch_format="pyarrow", batch_size=None
    )
    counts = _merge_count_partials(partials, "key", "cnt")

    def local_top(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table(
                {"key": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        c = np.asarray(t["cnt"], dtype=np.int64)
        k = np.asarray(t["key"], dtype=np.int64)
        best = np.lexsort((k, -c))[0]
        return pa.table({"key": k[best : best + 1], "cnt": c[best : best + 1]})

    cand = counts.map_batches(local_top, batch_format="pyarrow").to_pandas()
    if cand.empty:
        return None
    cand = cand.sort_values(["cnt", "key"], ascending=[False, True])
    key = int(cand["key"].iloc[0])
    cnt = int(cand["cnt"].iloc[0])
    return key // int(_PACK), key % int(_PACK), cnt


def apply_merge_batch(
    t: pa.Table, t1: int, t2: int, new_id: int, tokens_col: str = "tokens"
) -> pa.Table:
    """Replace non-overlapping (t1, t2) adjacencies with new_id,
    greedily left-to-right — one vectorized pass over the flat buffer.

    Overlaps (only possible as runs of consecutive match positions,
    e.g. (a, a) inside "aaaa") resolve by keeping even offsets within
    each run, which IS the greedy scan's choice."""
    col = t[tokens_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.flatten(), dtype=np.int32)
    L = np.asarray(pc.list_value_length(col).fill_null(0), dtype=np.int64)
    if len(flat) >= 2:
        m = (flat[:-1] == t1) & (flat[1:] == t2)
        ends = np.cumsum(L[L > 0]) - 1
        m[ends[ends < len(flat) - 1]] = False
        pos = np.where(m)[0]
    else:
        pos = np.empty(0, dtype=np.int64)
    if pos.size:
        run_start = np.concatenate([[True], np.diff(pos) > 1])
        run_id = np.cumsum(run_start) - 1
        first = pos[run_start][run_id]
        sel = pos[((pos - first) % 2) == 0]
        out = flat.copy()
        out[sel] = new_id
        delete = np.zeros(len(flat), dtype=bool)
        delete[sel + 1] = True
        row_of = np.repeat(np.arange(len(L)), L)
        merged_per_row = np.bincount(row_of[sel], minlength=len(L))
        new_l = L - merged_per_row
        new_flat = out[~delete]
    else:
        new_l = L
        new_flat = flat
    offsets = np.zeros(len(L) + 1, dtype=np.int32)
    np.cumsum(new_l, out=offsets[1:])
    arr = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(new_flat, pa.int32())
    )
    i = t.column_names.index(tokens_col)
    return t.set_column(i, tokens_col, arr)


def _learn_driver(
    tbl: pa.Table, k_merges: int, tokens_col: str, first_new_id: int
) -> list[tuple[int, int, int, int, int]]:
    """All-rounds driver loop over one collected table, reusing the
    EXACT distributed kernels (_pair_count_partial over the whole
    table = the global counts; apply_merge_batch = the rewrite), so
    the two routes are byte-equal by construction."""
    rows: list = []
    next_id = first_new_id
    counter = _pair_count_partial(tokens_col)
    t = tbl
    for rank in range(k_merges):
        p = counter(t)
        if p.num_rows == 0:
            break
        k_ = np.asarray(p["key"], dtype=np.int64)
        c_ = np.asarray(p["p"], dtype=np.int64)
        best = np.lexsort((k_, -c_))[0]
        if int(c_[best]) < 2:
            break
        key = int(k_[best])
        rows.append((rank, key // int(_PACK), key % int(_PACK), next_id,
                     int(c_[best])))
        t = apply_merge_batch(
            t, key // int(_PACK), key % int(_PACK), next_id, tokens_col
        )
        next_id += 1
    return rows


# SMALL corpora at or under this many rows train entirely on the
# driver (k rounds of the same numpy kernels, zero Ray round trips).
# Deliberately low: this VM charges ~1s/25MB of first-touch pages and
# numpy munmaps large arrays back to the OS, so a driver loop over a
# big corpus re-faults hundreds of MB EVERY round (measured 88-208 s
# at 18M tokens vs 15 s distributed); big sampled corpora stay on the
# distributed loop, whose per-round fixed cost is trimmed instead
# (few-block repartition + driver-merged top-1).
BPE_DRIVER_ROWS = 25_000

# The fused-task loop (one pass per round: rewrite last merge + count
# pairs in the SAME task, partials folded in a pick task, never on the
# driver) holds one partial per block in the pick task's heap, so it
# routes only up to this many blocks; beyond it (the 100 TB regime,
# where a single pick task could not hold blocks x distinct-pair
# partials) the Dataset loop with _merge_count_partials' bounded
# keyed-aggregate routing takes over. Block count, not row count, is
# the right guard: per-block partials are bounded by the (vocab+k)^2
# pair domain, which byte-level BPE keeps small.
BPE_FUSED_MAX_BLOCKS = 4096


def _fused_round(block: pa.Table, merge, tokens_col: str):
    """One fused BPE round over one block: apply the PREVIOUS round's
    merge (None on round 0), then count the rewritten block's adjacent
    pairs — the same kernels the Dataset loop runs as two passes."""
    if block.num_columns == 0:
        return block, pa.table(
            {"key": pa.array([], pa.int64()), "p": pa.array([], pa.int64())}
        )
    if merge is not None:
        t1, t2, nid = merge
        block = apply_merge_batch(block, t1, t2, nid, tokens_col)
    return block, _pair_count_partial(tokens_col)(block)


def _pick_top(*partials):
    """Fold per-block pair partials and return (packed_key, count) of
    the global argmax with the (cnt DESC, key ASC) tiebreak — runs as
    a task so the driver never touches the partial mass (this VM
    charges ~1s/25MB of first-touch driver pages)."""
    tbls = [p for p in partials if p.num_rows]
    if not tbls:
        return (-1, 0)
    t = pa.concat_tables(tbls)
    k = np.asarray(t["key"], dtype=np.int64)
    c = np.asarray(t["p"], dtype=np.int64)
    order = np.argsort(k, kind="stable")
    ks, cs = k[order], c[order]
    starts = np.ones(len(ks), dtype=bool)
    starts[1:] = ks[1:] != ks[:-1]
    idx = np.flatnonzero(starts)
    sums = np.add.reduceat(cs, idx)
    keys = ks[idx]
    best = np.lexsort((keys, -sums))[0]
    return (int(keys[best]), int(sums[best]))


def _learn_dataset_loop(
    cur, k_merges: int, tokens_col: str, first_new_id: int
) -> list[tuple[int, int, int, int, int]]:
    """The all-Dataset loop (2 pipeline executions per round through
    _merge_count_partials' bounded keyed-aggregate routing) — the
    route for corpora whose block count exceeds what one pick task
    should fold (BPE_FUSED_MAX_BLOCKS)."""
    rows: list = []
    next_id = first_new_id
    for rank in range(k_merges):
        top = _top_pair(cur, tokens_col)
        if top is None or top[2] < 2:
            break
        t1, t2, cnt = top
        rows.append((rank, t1, t2, next_id, cnt))
        cur = cur.map_batches(
            lambda t, _a=t1, _b=t2, _n=next_id: apply_merge_batch(
                t, _a, _b, _n, tokens_col
            ),
            batch_format="pyarrow",
        ).materialize()
        next_id += 1
    return rows


def _learn_fused_tasks(
    refs: list, k_merges: int, tokens_col: str, first_new_id: int
) -> list[tuple[int, int, int, int, int]]:
    """All-rounds fused-task loop over materialized block refs: round r
    rewrites merge r-1 and counts in ONE pass per block (k passes total
    vs the Dataset loop's 2k — the learned table never needs the final
    rewrite), with zero per-round Dataset exchanges. Byte-equal to the
    other routes by construction: identical per-block kernels, and
    global pair counts are sums of per-block value_counts under any
    blocking (forced-route pytest)."""
    import ray

    fused = ray.remote(num_returns=2)(_fused_round)
    pick = ray.remote(_pick_top)

    rows: list = []
    next_id = first_new_id
    merge = None
    for rank in range(k_merges):
        outs = [fused.remote(r, merge, tokens_col) for r in refs]
        refs = [o[0] for o in outs]
        key, cnt = ray.get(pick.remote(*[o[1] for o in outs]))
        if key < 0 or cnt < 2:
            break
        t1, t2 = key // int(_PACK), key % int(_PACK)
        rows.append((rank, t1, t2, next_id, cnt))
        merge = (t1, t2, next_id)
        next_id += 1
    return rows


def learn_bpe_merges(
    ds: Dataset,
    k_merges: int = 12,
    tokens_col: str = "tokens",
    first_new_id: int | None = None,
    sample_mod: int | None = None,
    id_col: str | None = None,
    driver_rows: int = BPE_DRIVER_ROWS,
) -> pa.Table:
    """Learn ``k_merges`` BPE merges; returns the merge table
    (rank, t1, t2, new_id, cnt). ``sample_mod``: train on the
    deterministic hash-sample ``hash(id) % mod == 0`` (requires
    ``id_col``) — the standard scale move, since merge quality
    converges long before the full corpus is counted. A corpus at or
    under ``driver_rows`` rows trains wholly on the driver with the
    same kernels (byte-equal, pytest-forced); set ``driver_rows=0``
    to force the distributed loop."""
    if sample_mod is not None:
        if id_col is None:
            raise ValueError("sample_mod requires id_col")
        from ..stages.transform import hash64_strings

        def pick(t: pa.Table) -> pa.Table:
            col = t[id_col]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if pa.types.is_integer(col.type):
                h = np.asarray(col, dtype=np.int64).astype(np.uint64)
            else:
                h = hash64_strings(col)
            return t.filter(pa.array(h % np.uint64(sample_mod) == 0))

        ds = ds.map_batches(pick, batch_format="pyarrow")

    # NOTE: do NOT repartition to few big blocks here — measured 3x
    # slower (50-98 s vs 18 s): each rewrite task allocates ~5x its
    # block size in fresh numpy arrays and this VM charges ~1s/25MB of
    # first-touch pages, so many small blocks amortize allocation far
    # better than fewer task schedules save
    cur = ds.select_columns([tokens_col]).materialize()
    if cur.count() <= driver_rows:
        import ray

        tbls = [t for t in ray.get(cur.to_arrow_refs()) if t.num_columns]
        tbl = (
            pa.concat_tables(tbls).combine_chunks()
            if tbls
            else pa.table({tokens_col: pa.array([], pa.list_(pa.int32()))})
        )
        if first_new_id is None:
            col = tbl[tokens_col]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            mx = pc.max(pc.list_flatten(col)).as_py() if tbl.num_rows else 0
            first_new_id = int(mx or 0) + 1
        rows = _learn_driver(tbl, k_merges, tokens_col, first_new_id)
        return pa.table(
            {
                "rank": pa.array([r[0] for r in rows], pa.int64()),
                "t1": pa.array([r[1] for r in rows], pa.int64()),
                "t2": pa.array([r[2] for r in rows], pa.int64()),
                "new_id": pa.array([r[3] for r in rows], pa.int64()),
                "cnt": pa.array([r[4] for r in rows], pa.int64()),
            }
        )
    if first_new_id is None:
        maxes = cur.map_batches(
            lambda t: pa.table(
                {
                    "m": pa.array(
                        [
                            int(
                                pc.max(pc.list_flatten(t[tokens_col])).as_py()
                                or 0
                            )
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        ).to_pandas()
        first_new_id = int(maxes["m"].max()) + 1

    import ray

    refs = cur.to_arrow_refs()
    if len(refs) <= BPE_FUSED_MAX_BLOCKS:
        rows = _learn_fused_tasks(refs, k_merges, tokens_col, first_new_id)
    else:
        rows = _learn_dataset_loop(cur, k_merges, tokens_col, first_new_id)

    return pa.table(
        {
            "rank": pa.array([r[0] for r in rows], pa.int64()),
            "t1": pa.array([r[1] for r in rows], pa.int64()),
            "t2": pa.array([r[2] for r in rows], pa.int64()),
            "new_id": pa.array([r[3] for r in rows], pa.int64()),
            "cnt": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def apply_merges(
    ds: Dataset, merges: pa.Table, tokens_col: str = "tokens"
) -> Dataset:
    """Re-tokenize a corpus with a learned merge table: the merges
    apply in rank order (each as one vectorized pass, fused into a
    single task chain by the streaming executor)."""
    for rank in range(merges.num_rows):
        t1 = int(merges["t1"][rank].as_py())
        t2 = int(merges["t2"][rank].as_py())
        nid = int(merges["new_id"][rank].as_py())
        ds = ds.map_batches(
            lambda t, _a=t1, _b=t2, _n=nid: apply_merge_batch(
                t, _a, _b, _n, tokens_col
            ),
            batch_format="pyarrow",
        )
    return ds
