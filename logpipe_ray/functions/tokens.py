"""Token-level operations over pre-tokenized training sequences.

The engine's input IS a table of training sequences (doc_id, tokens,
n_tok, source) — these are the LLM-data-prep primitives over it:

  * token frequency counts (vectorized flatten + per-batch partials)
  * sequence length histograms
  * greedy sequence packing into fixed-length training contexts using
    the reserved special ids (PAD=0, BOS=1, EOS=2 — tokenizer.py keeps
    data tokens >= 3)

Packing is per-batch local (no shuffle): each task packs its own
shard's sequences — exactly how distributed LLM data prep shards the
work. Document order within a context follows input order; sequences
longer than (context_len - 2) are truncated (counted, not silent).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

PAD_ID, BOS_ID, EOS_ID = 0, 1, 2


def token_frequency(ds: Dataset, tokens_col: str = "tokens", top_k: int | None = None):
    """Global token-id counts: per-batch flatten + value_counts, tiny
    merge shuffle (bounded by vocab x batches)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten()
        vc = pc.value_counts(flat)
        return pa.table(
            {
                # int64: keep the key dtype identical on both merge
                # paths (the Ray hash aggregate promotes keys to int64)
                "token_id": pc.cast(pc.struct_field(vc, "values"), pa.int64()),
                "p": pc.struct_field(vc, "counts"),
            }
        )

    out = _merge_count_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "token_id", "cnt"
    )
    if top_k:
        from ..stages.aggregate import top_k as _topk

        out = _topk(out, [("cnt", "descending"), ("token_id", "ascending")], top_k)
    return out


# bounded driver-side final-merge guard for count partials (rows);
# ~16 B/row -> 80 MB at the default. Above it the keyed Ray aggregate
# runs instead.
BIGRAM_DRIVER_MERGE_ROWS = 5_000_000


def _merge_count_partials(
    partials: Dataset, key_col: str, alias: str,
    limit: int = BIGRAM_DRIVER_MERGE_ROWS,
) -> Dataset:
    """Final merge of (key, p) count partials. Below ``limit`` rows the
    merge is one bounded driver-side Arrow group_by (a full sort-based
    Aggregate exchange costs ~seconds of per-block fixed overhead even
    on 3 MB of partials — measured 2.1x end-to-end on bigrams at
    sf0.1); above it, the keyed Ray aggregate is the scale path."""
    import ray as _ray
    from ray.data.aggregate import Sum

    partials = partials.materialize()
    if partials.count() <= limit:
        tbl = pa.concat_tables(
            [t for t in _ray.get(partials.to_arrow_refs()) if t.num_columns]
        )
        merged = (
            tbl.group_by(key_col)
            .aggregate([("p", "sum")])
            .rename_columns([key_col, alias])
        )
        return _ray.data.from_arrow(merged)
    return partials.groupby(key_col).aggregate(Sum("p", alias_name=alias))


def bigram_frequency(
    ds: Dataset, tokens_col: str = "tokens", top_k: int | None = None
) -> Dataset:
    """Global (token, next-token) bigram counts — the n-gram statistics
    a tokenizer/data audit runs. Per-batch: one vectorized pass packs
    each within-row bigram into an int64 key (t1 << 32 | t2) and
    value_counts it; the shuffle moves only (key, count) partials
    (bounded by distinct-bigrams x batches, never tokens). Unpacked to
    (t1, t2, cnt) after the final merge."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        L = np.asarray(pc.list_value_length(col).fill_null(0), dtype=np.int64)
        # zero-copy int32 view; widened per-subarray in the key pack
        flat = col.flatten().to_numpy(zero_copy_only=True)
        if flat.size == 0:
            return pa.table(
                {"key": pa.array([], pa.int64()), "p": pa.array([], pa.int64())}
            )
        # bigram at flat position i pairs (flat[i], flat[i+1]); just
        # mask the positions where i is the LAST token of a row (the
        # pair would cross a row border) — one boolean mask, no index
        # materialization
        if len(flat) < 2:
            return pa.table(
                {"key": pa.array([], pa.int64()), "p": pa.array([], pa.int64())}
            )
        ends = np.cumsum(L[L > 0]) - 1  # last-token flat positions
        valid = np.ones(len(flat) - 1, dtype=bool)
        valid[ends[ends < len(flat) - 1]] = False
        keys = np.left_shift(flat[:-1][valid], 32, dtype=np.int64) | flat[1:][valid]
        vc = pc.value_counts(pa.array(keys, pa.int64()))
        return pa.table(
            {
                "key": pc.struct_field(vc, "values"),
                "p": pc.struct_field(vc, "counts"),
            }
        )

    # batch_size=None -> one partial per block: with a bounded
    # bigram vocabulary the partial is ~|vocab^2| rows regardless
    # of block size, so fewer/bigger batches shrink the shuffle
    # by the batch-count factor
    out = _merge_count_partials(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        "key", "cnt",
    )

    def unpack(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table(
                {
                    "t1": pa.array([], pa.int32()),
                    "t2": pa.array([], pa.int32()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        key = np.asarray(t["key"], np.int64)
        return pa.table(
            {
                "t1": pa.array((key >> 32).astype(np.int32)),
                "t2": pa.array((key & 0xFFFFFFFF).astype(np.int32)),
                "cnt": t["cnt"],
            }
        )

    out = out.map_batches(unpack, batch_format="pyarrow")
    if top_k:
        from ..stages.aggregate import top_k as _topk

        out = _topk(
            out,
            [("cnt", "descending"), ("t1", "ascending"), ("t2", "ascending")],
            top_k,
        )
    return out


def pack_batch(
    batch: pa.Table,
    context_len: int = 2048,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> pa.Table:
    """Greedy first-fit packing of whole sequences into fixed-length
    contexts: each sequence becomes BOS <tokens> EOS; contexts are
    PAD-filled. Returns one row per context with the packed tokens,
    member doc ids, and fill stats. Sequences longer than
    context_len - 2 are truncated (reported via `truncated`)."""
    col = batch[tokens_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    id_arr = batch[id_col]
    if isinstance(id_arr, pa.ChunkedArray):
        id_arr = id_arr.combine_chunks()
    if batch.num_rows == 0:
        # typed empty output (a null-typed doc_ids column would clash
        # with non-empty blocks' schema)
        return pa.table(
            {
                "context_tokens": pa.array([], pa.list_(pa.int32())),
                "doc_ids": pa.array([], pa.list_(id_arr.type)),
                "n_seqs": pa.array([], pa.int32()),
                "fill_ratio": pa.array([], pa.float64()),
                "truncated": pa.array([], pa.int32()),
            }
        )
    max_payload = context_len - 2
    L = np.asarray(pc.list_value_length(col).fill_null(0), dtype=np.int64)
    body = np.minimum(L, max_payload)
    trunc = (L > max_payload).astype(np.int64)
    need = body + 2

    # greedy first-fit boundaries: the only inherently sequential part,
    # an int-only pass over per-sequence lengths (never per-token)
    n_rows = len(need)
    ctx_id = np.empty(n_rows, np.int64)
    pos = np.empty(n_rows, np.int64)
    c, off = 0, 0
    for i, nd in enumerate(need.tolist()):
        if off and off + nd > context_len:
            c += 1
            off = 0
        ctx_id[i] = c
        pos[i] = off
        off += nd
    n = c + 1

    # payload copy is one vectorized gather/scatter over the flat
    # Arrow values buffer — no token passes through a Python list
    src = np.asarray(col.flatten(), dtype=np.int32)
    src_starts = np.zeros(n_rows, np.int64)
    np.cumsum(L[:-1], out=src_starts[1:])
    body_starts = np.zeros(n_rows, np.int64)
    np.cumsum(body[:-1], out=body_starts[1:])
    total_body = int(body.sum())
    rep = np.repeat(np.arange(n_rows), body)
    within = np.arange(total_body) - np.repeat(body_starts, body)
    dest_base = ctx_id * context_len + pos
    flat = np.full(n * context_len, PAD_ID, np.int32)
    flat[dest_base[rep] + 1 + within] = src[src_starts[rep] + within]
    flat[dest_base] = BOS_ID
    flat[dest_base + 1 + body] = EOS_ID

    offsets = np.arange(0, (n + 1) * context_len, context_len, dtype=np.int32)
    packed = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(flat, pa.int32())
    )
    n_seqs = np.bincount(ctx_id, minlength=n)
    truncated = np.zeros(n, np.int64)
    np.add.at(truncated, ctx_id, trunc)
    member_offsets = np.zeros(n + 1, np.int64)
    np.cumsum(n_seqs, out=member_offsets[1:])
    members = pa.ListArray.from_arrays(
        pa.array(member_offsets, pa.int32()), id_arr
    )  # doc ids are already in context order — zero-copy regroup
    nonpad = np.count_nonzero(flat.reshape(n, context_len) != PAD_ID, axis=1)
    fill = pa.array(nonpad / float(context_len), pa.float64())
    return pa.table(
        {
            "context_tokens": packed,
            "doc_ids": members,
            "n_seqs": pa.array(n_seqs.astype(np.int32)),
            "fill_ratio": fill,
            "truncated": pa.array(truncated.astype(np.int32)),
        }
    )


def pack_sequences(ds: Dataset, context_len: int = 2048, **kw) -> Dataset:
    """Attach per-batch greedy packing (local, shuffle-free)."""
    import functools

    fn = functools.partial(pack_batch, context_len=context_len, **kw)
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


UNK_ID = 0  # OOV replacement id (reuses PAD; data tokens are >= 3)


def prune_vocab(
    ds: Dataset,
    vocab_size: int = 100,
    tokens_col: str = "tokens",
    unk_id: int = UNK_ID,
) -> Dataset:
    """Vocabulary pruning / OOV mapping: keep the `vocab_size` most
    frequent token ids (ties broken by id) and replace every other
    token with ``unk_id`` — the classic tokenizer-shrink step.

    Scale shape: the keep-set comes from token_frequency (per-batch
    value_counts partials, vocab-bounded shuffle) and broadcasts via
    ray.put; the rewrite is one vectorized is_in + if_else over each
    batch's flat values buffer, rebuilding the list column on the
    original offsets."""
    import ray

    from .tokens import token_frequency

    topk = token_frequency(ds, tokens_col=tokens_col, top_k=vocab_size)
    keep_tbl = pa.concat_tables(
        [t for t in ray.get(topk.materialize().to_arrow_refs()) if t.num_columns]
    )  # vocab-bounded by construction
    keep_ref = ray.put(keep_tbl["token_id"].combine_chunks())

    def fn(t: pa.Table) -> pa.Table:
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten()
        keep = ray.get(keep_ref)
        mask = pc.is_in(flat, value_set=keep)
        new_flat = pc.if_else(mask, flat, pa.scalar(unk_id, flat.type))
        lengths = np.asarray(pc.list_value_length(col).fill_null(0), np.int64)
        offsets = np.zeros(len(lengths) + 1, np.int32)
        np.cumsum(lengths, out=offsets[1:])
        pruned = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), new_flat)
        idx = t.column_names.index(tokens_col)
        return t.set_column(idx, tokens_col, pruned)

    return ds.map_batches(fn, batch_format="pyarrow")


def bigram_lift_topk(
    ds: Dataset,
    tokens_col: str = "tokens",
    k: int = 50,
    min_count: int = 5,
    lut_vocab_limit: int = 5_000_000,
) -> Dataset:
    """Top-k bigrams by LIFT — observed/expected frequency ratio,
    lift(x,y) = P(x,y) / (P(x)·P(y)) = (c_xy/N_bi) / ((c_x/N_uni)·
    (c_y/N_uni)) — the PMI ranking without the log, so scores stay
    IEEE-exact (int64-exact counts -> exact double conversions ->
    deterministically-rounded multiply/divide; the oracle replays the
    identical expression tree bitwise). Collocation discovery / merge
    candidates beyond raw bigram counts (seq_bigram_topk).

    Scale shape: bigram and unigram counts are both vocab-bounded
    merge outputs (packed-int64 per-batch value_counts partials, see
    bigram_frequency / token_frequency); the totals are two scalar
    aggregates over those bounded tables. Unigram attachment uses a
    dense numpy LUT broadcast once while the vocab is below
    ``lut_vocab_limit`` (8 B/entry), else two hash joins on t1/t2.
    ``min_count`` floors support BEFORE ranking so hapax pairs don't
    dominate the ratio. int64 overflow bound: exactness holds while
    every count stays below 2^53 (9e15 tokens — beyond a 100-TB text
    corpus's token count)."""
    import ray as _ray
    from ray.data.aggregate import Sum

    from ..stages.aggregate import top_k as _topk

    bi = bigram_frequency(ds, tokens_col).materialize()
    uni = token_frequency(ds, tokens_col).materialize()
    nb = int(bi.aggregate(Sum("cnt", alias_name="n"))["n"] or 0)
    nu_row = uni.aggregate(Sum("cnt", alias_name="n"))
    nu = int(nu_row["n"] or 0)
    if nb == 0 or nu == 0:
        return _ray.data.from_arrow(
            pa.table(
                {
                    "t1": pa.array([], pa.int32()),
                    "t2": pa.array([], pa.int32()),
                    "cnt": pa.array([], pa.int64()),
                    "lift": pa.array([], pa.float64()),
                }
            )
        )

    def _lift(cxy: np.ndarray, c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
        num = (cxy.astype(np.float64) * float(nu)) * float(nu)
        den = (float(nb) * c1.astype(np.float64)) * c2.astype(np.float64)
        return num / den

    if uni.count() <= lut_vocab_limit:
        uni_tbl = pa.concat_tables(
            [t for t in _ray.get(uni.to_arrow_refs()) if t.num_columns]
        )
        ids = np.asarray(uni_tbl["token_id"], dtype=np.int64)
        cnts = np.asarray(uni_tbl["cnt"], dtype=np.int64)
        lut = np.zeros(int(ids.max()) + 1 if len(ids) else 1, dtype=np.int64)
        lut[ids] = cnts
        lut_ref = _ray.put(lut)

        def score(t: pa.Table) -> pa.Table:
            t = t.filter(pc.greater_equal(t["cnt"], min_count))
            if t.num_rows == 0:
                return pa.table(
                    {
                        "t1": pa.array([], pa.int32()),
                        "t2": pa.array([], pa.int32()),
                        "cnt": pa.array([], pa.int64()),
                        "lift": pa.array([], pa.float64()),
                    }
                )
            L = _ray.get(lut_ref)
            t1 = np.asarray(t["t1"], dtype=np.int64)
            t2 = np.asarray(t["t2"], dtype=np.int64)
            cxy = np.asarray(t["cnt"], dtype=np.int64)
            lift = _lift(cxy, L[t1], L[t2])
            return pa.table(
                {
                    "t1": t["t1"],
                    "t2": t["t2"],
                    "cnt": t["cnt"],
                    "lift": pa.array(lift, pa.float64()),
                }
            )

        scored = bi.map_batches(score, batch_format="pyarrow")
    else:  # join route: vocab too large for a broadcast LUT
        from ..stages.join import inner_join_safe

        def _narrow(name):
            def fn(t: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        name: pc.cast(t["token_id"], pa.int32()),
                        f"c_{name}": t["cnt"],
                    }
                )

            return fn

        bi_f = bi.map_batches(
            lambda t: t.filter(pc.greater_equal(t["cnt"], min_count)),
            batch_format="pyarrow",
        )
        j1 = inner_join_safe(
            bi_f, uni.map_batches(_narrow("t1"), batch_format="pyarrow"), on=("t1",)
        )
        j2 = inner_join_safe(
            j1, uni.map_batches(_narrow("t2"), batch_format="pyarrow"), on=("t2",)
        )

        def score_j(t: pa.Table) -> pa.Table:
            lift = _lift(
                np.asarray(t["cnt"], dtype=np.int64),
                np.asarray(t["c_t1"], dtype=np.int64),
                np.asarray(t["c_t2"], dtype=np.int64),
            )
            return pa.table(
                {
                    "t1": t["t1"],
                    "t2": t["t2"],
                    "cnt": t["cnt"],
                    "lift": pa.array(lift, pa.float64()),
                }
            )

        scored = j2.map_batches(score_j, batch_format="pyarrow")

    return _topk(
        scored,
        [("lift", "descending"), ("t1", "ascending"), ("t2", "ascending")],
        k,
    )


# -- sequence-level content identity (round 4 session 5) --------------

# odd 64-bit multiplier (FNV-1a prime); uint64 wraparound IS the mod
_SEQ_HASH_P = np.uint64(1099511628211)


def _sequence_hashes(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-row content hash of a list<int32> column:
    h(row) = Σ (v_i + 1) · P^i  (mod 2^64, position-sensitive, empty
    row -> 0). Returns (lengths:int64, hashes:uint64). Together with
    the row LENGTH the key identifies content up to 64-bit collisions
    (~n²/2^65 expected false merges — negligible below ~10^9 distinct
    sequences; swap in a 128-bit pair hash beyond). Pure numpy over
    the flat value buffer: one power-table gather + one cumsum, no
    per-row Python."""
    L = np.asarray(pc.list_value_length(col).fill_null(0), dtype=np.int64)
    flat_arr = col.flatten()
    # a fully-empty block can carry list<null>; never zero-copy that
    flat = (
        flat_arr.to_numpy(zero_copy_only=True).astype(np.uint64)
        if len(flat_arr)
        else np.empty(0, np.uint64)
    )
    ends = np.cumsum(L)
    starts = ends - L
    if len(flat):
        # position of each flat element within its row
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, L)
        max_len = int(L.max())
        pows = np.empty(max_len, np.uint64)
        if max_len:
            pows[0] = np.uint64(1)
            for i in range(1, max_len):
                pows[i] = pows[i - 1] * _SEQ_HASH_P
        terms = (flat + np.uint64(1)) * pows[pos]
        cs = np.concatenate([[np.uint64(0)], np.cumsum(terms, dtype=np.uint64)])
        h = cs[ends] - cs[starts]
    else:
        h = np.zeros(len(L), np.uint64)
    return L, h


def sequence_dedup_stats(
    ds: Dataset,
    tokens_col: str = "tokens",
    by: str = "source",
    driver_limit: int = BIGRAM_DRIVER_MERGE_ROWS,
) -> Dataset:
    """Sequence-level exact dedup audit: per ``by`` group, total rows
    vs DISTINCT token arrays (and the duplicate surplus) — the "how
    much of my pre-tokenized corpus is literally repeated" check run
    before training.

    Scale shape: each batch collapses to DISTINCT (by, len, hash)
    partials (in-batch dedup via Arrow group_by on the vectorized
    content hash — token arrays themselves never shuffle). Below
    ``driver_limit`` partial rows the cross-batch dedup + per-group
    counts fold in one bounded driver Arrow group_by (~24 B/row; a
    full keyed exchange costs seconds of fixed setup on KB of
    partials — same guard as _merge_count_partials); above it, ONE
    keyed Ray aggregate dedups and a tiny keyed Sum counts — the
    100-TB route, pytest-forced equal. Identity = (length, 64-bit
    positional hash), see _sequence_hashes for the collision bound."""
    import ray as _ray
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        L, h = _sequence_hashes(col)
        g = (
            pa.table(
                {
                    by: t[by],
                    "_len": pa.array(L),
                    "_h": pa.array(h.view(np.int64)),
                    "c": pa.array(np.ones(len(L), np.int64)),
                }
            )
            .group_by([by, "_len", "_h"])
            .aggregate([("c", "sum")])
        )
        return g.rename_columns([by, "_len", "_h", "p_c"])

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()

    def _counts_from_dedup(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    by: t[by],
                    "u": pa.array(np.ones(t.num_rows, np.int64)),
                    "r": t["c"],
                }
            )
            .group_by(by)
            .aggregate([("u", "sum"), ("r", "sum")])
        )
        return g.rename_columns([by, "p_u", "p_r"])

    if partials.count() <= driver_limit:
        tbl = pa.concat_tables(
            [t for t in _ray.get(partials.to_arrow_refs()) if t.num_columns]
        )
        deduped = (
            tbl.group_by([by, "_len", "_h"])
            .aggregate([("p_c", "sum")])
            .rename_columns([by, "_len", "_h", "c"])
        )
        counts = (
            _counts_from_dedup(deduped)
            .group_by(by)
            .aggregate([("p_r", "sum"), ("p_u", "sum")])
            .rename_columns([by, "n_seqs", "n_unique_seqs"])
        )
        agged = _ray.data.from_arrow(counts)
    else:
        deduped = partials.groupby([by, "_len", "_h"]).aggregate(
            Sum("p_c", alias_name="c")
        )
        agged = (
            deduped.map_batches(_counts_from_dedup, batch_format="pyarrow")
            .groupby(by)
            .aggregate(
                Sum("p_r", alias_name="n_seqs"),
                Sum("p_u", alias_name="n_unique_seqs"),
            )
        )

    def finish(t: pa.Table) -> pa.Table:
        return t.append_column(
            "dup_rows", pc.subtract(t["n_seqs"], t["n_unique_seqs"])
        )

    return agged.map_batches(finish, batch_format="pyarrow")


def distinct_token_counts(
    ds: Dataset, tokens_col: str = "tokens", id_col: str = "doc_id"
) -> Dataset:
    """Per-sequence vocabulary richness: (id, n_tok, n_distinct) for
    every row — the type/token signal behind repetition filters.
    Shuffle-free vectorized map: one lexsort of the flat (row, token)
    pairs per batch, run-boundary flags, segment sums. No per-row
    Python, nothing materializes."""

    def fn(t: pa.Table) -> pa.Table:
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        L = np.asarray(pc.list_value_length(col).fill_null(0), dtype=np.int64)
        flat_arr = col.flatten()
        # a fully-empty block can carry list<null>; never zero-copy it
        flat = (
            flat_arr.to_numpy(zero_copy_only=True)
            if len(flat_arr)
            else np.empty(0, np.int64)
        )
        ends = np.cumsum(L)
        starts = ends - L
        if len(flat):
            rows = np.repeat(np.arange(len(L), dtype=np.int64), L)
            order = np.lexsort((flat, rows))
            fv, rv = flat[order], rows[order]
            new = np.ones(len(fv), bool)
            new[1:] = (fv[1:] != fv[:-1]) | (rv[1:] != rv[:-1])
            csf = np.concatenate([[0], np.cumsum(new, dtype=np.int64)])
            nd = csf[ends] - csf[starts]
        else:
            nd = np.zeros(len(L), np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "n_tok": pa.array(L),
                "n_distinct": pa.array(nd),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def chunk_tokens(
    ds: Dataset,
    width: int = 256,
    step: int = 192,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> Dataset:
    """Split every token sequence into overlapping ``width``-token
    windows advancing by ``step`` — the context-window chunker for
    pre-tokenized corpora (token-level sibling of corpusfns.chunk_batch;
    docs with <= width tokens yield exactly one chunk, empty docs one
    empty chunk). Shuffle-free flat_map: closed-form chunk counts +
    one ragged cumulative-offset gather over the flat token buffer,
    zero per-row Python; the chunk layout is a pure per-document
    function (block-layout and CPU-count invariant)."""
    assert 0 < step <= width

    def fn(t: pa.Table) -> pa.Table:
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        L = np.asarray(pc.list_value_length(col).fill_null(0), dtype=np.int64)
        flat_arr = col.flatten()
        flat = (
            flat_arr
            if len(flat_arr)
            else pa.array([], flat_arr.type if flat_arr.type != pa.null() else pa.int32())
        )
        doc_start = np.concatenate([[0], np.cumsum(L)])[:-1]
        k = np.where(L <= width, 1, 1 + (L - width + step - 1) // step)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        total_chunks = int(k.sum())
        doc_of = np.repeat(np.arange(len(L), dtype=np.int64), k)
        chunk_starts_flat = np.concatenate([[0], np.cumsum(k)])[:-1]
        cidx = np.arange(total_chunks, dtype=np.int64) - np.repeat(
            chunk_starts_flat, k
        )
        tok_start = cidx * step
        cl = np.minimum(tok_start + width, L[doc_of]) - tok_start
        offs = np.concatenate([[0], np.cumsum(cl)]).astype(np.int64)
        gather = (
            np.arange(int(offs[-1]), dtype=np.int64)
            - np.repeat(offs[:-1], cl)
            + np.repeat(doc_start[doc_of] + tok_start, cl)
        )
        values = flat.take(pa.array(gather, pa.int64()))
        chunks = pa.ListArray.from_arrays(
            pa.array(offs.astype(np.int32), pa.int32()), values
        )
        return pa.table(
            {
                id_col: ids.take(pa.array(doc_of, pa.int64())),
                "chunk_idx": pa.array(cidx),
                "chunk_tokens": chunks,
                "chunk_len": pa.array(cl),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def mlm_mask(
    ds: Dataset,
    mask_id: int = BOS_ID,
    rate_pct: int = 15,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    num_col: str | None = None,
) -> Dataset:
    """Deterministic MLM-style masking: position i of document d is
    masked iff hash(d, i) lands below ``rate_pct`` — a pure function
    of (doc, position), so the example set is reproducible across
    runs/partitionings AND replayable in SQL (the sampling-family
    int64-exact hash). Returns per doc: masked_tokens (mask_id written
    over masked slots), n_masked, labels (the masked-out tokens in
    position order) — the self-supervised example builder.

    Shuffle-free vectorized map: one hash + where over the flat token
    buffer, two ListArray rebuilds; no per-row Python. ``num_col``
    names the int64-castable column that seeds the hash (defaults to
    ``id_col``; pass a derived numeric column when ids are strings)."""
    from .sampling import HASH_A, HASH_B, HASH_M, SEED_C

    nc = num_col or id_col

    def fn(t: pa.Table) -> pa.Table:
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids_arr = t[id_col]
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        nums = t[nc]
        if isinstance(nums, pa.ChunkedArray):
            nums = nums.combine_chunks()
        L = np.asarray(pc.list_value_length(col).fill_null(0), dtype=np.int64)
        flat_arr = col.flatten()
        flat = (
            flat_arr.to_numpy(zero_copy_only=True)
            if len(flat_arr)
            else np.empty(0, np.int32)
        )
        ends = np.cumsum(L)
        starts = ends - L
        did = np.repeat(
            np.asarray(pc.cast(nums, pa.int64()), dtype=np.int64), L
        )
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, L)
        m = ((did * HASH_A + pos * SEED_C + HASH_B) % HASH_M) % 100 < rate_pct
        masked_flat = np.where(m, np.int64(mask_id), flat.astype(np.int64))
        masked = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], ends]).astype(np.int32), pa.int32()),
            pa.array(masked_flat.astype(np.int32), pa.int32()),
        )
        mi = np.cumsum(m)
        n_masked = mi[ends - 1] - np.where(starts > 0, mi[starts - 1], 0) if len(
            flat
        ) else np.zeros(len(L), np.int64)
        n_masked = np.where(L > 0, n_masked, 0)
        lab_offs = np.concatenate([[0], np.cumsum(n_masked)]).astype(np.int32)
        labels = pa.ListArray.from_arrays(
            pa.array(lab_offs, pa.int32()),
            pa.array(flat[m].astype(np.int32), pa.int32()),
        )
        return pa.table(
            {
                id_col: ids_arr,
                "masked_tokens": masked,
                "n_masked": pa.array(n_masked.astype(np.int64)),
                "labels": labels,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def span_corrupt(
    ds: Dataset,
    sentinel_id: int = BOS_ID,
    span_w: int = 3,
    rate_pct: int = 15,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    num_col: str | None = None,
) -> Dataset:
    """Deterministic T5-style SPAN corruption: position i of document d
    is masked iff hash(d, i // span_w) lands below ``rate_pct`` — whole
    ``span_w``-token spans drop together, and each CONTIGUOUS masked
    run is replaced by ONE sentinel token (so the corrupted sequence
    shrinks). A pure function of (doc, position) -> reproducible
    example sets, replayable in SQL (the sampling-family int64 hash).
    Returns per doc: corrupted_tokens, targets (the dropped tokens in
    position order), n_masked, n_spans (count of contiguous runs).

    Shuffle-free vectorized map over the flat token buffer: one hash,
    one run-start mask (masked & not-prev-masked, reset at doc
    boundaries), two ragged ListArray rebuilds; no per-row Python."""
    from .sampling import HASH_A, HASH_B, HASH_M, SEED_C

    nc = num_col or id_col

    def fn(t: pa.Table) -> pa.Table:
        col = t[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids_arr = t[id_col]
        if isinstance(ids_arr, pa.ChunkedArray):
            ids_arr = ids_arr.combine_chunks()
        nums = t[nc]
        if isinstance(nums, pa.ChunkedArray):
            nums = nums.combine_chunks()
        L = np.asarray(pc.list_value_length(col).fill_null(0), dtype=np.int64)
        flat_arr = col.flatten()
        flat = (
            flat_arr.to_numpy(zero_copy_only=True)
            if len(flat_arr)
            else np.empty(0, np.int32)
        )
        ends = np.cumsum(L)
        starts = ends - L
        did = np.repeat(np.asarray(pc.cast(nums, pa.int64()), dtype=np.int64), L)
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, L)
        span = pos // span_w
        m = ((did * HASH_A + span * SEED_C + HASH_B) % HASH_M) % 100 < rate_pct
        # contiguous masked runs (reset at doc starts)
        prev_m = np.zeros(len(flat), bool)
        if len(flat) > 1:
            prev_m[1:] = m[:-1]
        prev_m[pos == 0] = False
        runstart = m & ~prev_m
        keep = ~m | runstart
        out_flat = np.where(runstart, np.int64(sentinel_id), flat.astype(np.int64))[
            keep
        ]

        def per_doc_count(mask: np.ndarray) -> np.ndarray:
            if not len(flat):
                return np.zeros(len(L), np.int64)
            cs = np.cumsum(mask)
            cnt = cs[ends - 1] - np.where(starts > 0, cs[starts - 1], 0)
            return np.where(L > 0, cnt, 0).astype(np.int64)

        n_keep = per_doc_count(keep)
        n_masked = per_doc_count(m)
        n_spans = per_doc_count(runstart)
        corrupted = pa.ListArray.from_arrays(
            pa.array(
                np.concatenate([[0], np.cumsum(n_keep)]).astype(np.int32),
                pa.int32(),
            ),
            pa.array(out_flat.astype(np.int32), pa.int32()),
        )
        targets = pa.ListArray.from_arrays(
            pa.array(
                np.concatenate([[0], np.cumsum(n_masked)]).astype(np.int32),
                pa.int32(),
            ),
            pa.array(flat[m].astype(np.int32), pa.int32()),
        )
        return pa.table(
            {
                id_col: ids_arr,
                "corrupted_tokens": corrupted,
                "targets": targets,
                "n_masked": pa.array(n_masked),
                "n_spans": pa.array(n_spans),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
