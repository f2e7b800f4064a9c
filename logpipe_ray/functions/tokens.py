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
                "token_id": pc.struct_field(vc, "values"),
                "p": pc.struct_field(vc, "counts"),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token_id")
        .aggregate(Sum("p", alias_name="cnt"))
    )
    if top_k:
        from ..stages.aggregate import top_k as _topk

        out = _topk(out, [("cnt", "descending"), ("token_id", "ascending")], top_k)
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
    toks = col.to_pylist()
    ids = id_arr.to_pylist()

    contexts: list[list[int]] = []
    members: list[list] = []
    truncated: list[int] = []
    cur: list[int] = []
    cur_ids: list = []
    cur_trunc = 0
    max_payload = context_len - 2
    for doc_id, seq in zip(ids, toks):
        body = seq[:max_payload]
        trunc = len(seq) > max_payload
        need = len(body) + 2
        if cur and len(cur) + need > context_len:
            contexts.append(cur + [PAD_ID] * (context_len - len(cur)))
            members.append(cur_ids)
            truncated.append(cur_trunc)
            cur, cur_ids, cur_trunc = [], [], 0
        cur += [BOS_ID, *body, EOS_ID]
        cur_ids.append(doc_id)
        cur_trunc += int(trunc)
    if cur:
        contexts.append(cur + [PAD_ID] * (context_len - len(cur)))
        members.append(cur_ids)
        truncated.append(cur_trunc)

    n = len(contexts)
    flat = np.fromiter(
        (t for ctx in contexts for t in ctx), dtype=np.int32, count=n * context_len
    )
    offsets = np.arange(0, (n + 1) * context_len, context_len, dtype=np.int32)
    packed = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(flat, pa.int32())
    )
    nonpad = np.count_nonzero(flat.reshape(n, context_len) != PAD_ID, axis=1)
    fill = pa.array(nonpad / float(context_len), pa.float64())
    return pa.table(
        {
            "context_tokens": packed,
            "doc_ids": pa.array(members, pa.list_(id_arr.type)),
            "n_seqs": pa.array([len(m) for m in members], pa.int32()),
            "fill_ratio": fill,
            "truncated": pa.array(truncated, pa.int32()),
        }
    )


def pack_sequences(ds: Dataset, context_len: int = 2048, **kw) -> Dataset:
    """Attach per-batch greedy packing (local, shuffle-free)."""
    import functools

    fn = functools.partial(pack_batch, context_len=context_len, **kw)
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
