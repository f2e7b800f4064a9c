"""Deduplication operators over a text column — exact and near-dup.

Scale design notes (100 TB framing):
  * exact: shuffle key is a 64-bit content hash (tiny), never the
    text; true equality re-checked within hash groups so collisions
    can't merge distinct docs. See queries.docs_exact_dedup.
  * MinHash+LSH: signatures are computed fully vectorized per batch
    (explode shingles -> universal hashes -> np.minimum.reduceat);
    only (band_id, band_hash, doc_id) rows shuffle — O(bands x docs)
    small ints, not text. Candidate verification is a Dataset
    pipeline: candidate ids broadcast-filter the docs when the pair
    count is under BROADCAST_PAIR_LIMIT, else a distributed hash join
    co-locates pair texts; exact Jaccard is computed vectorized per
    batch. Never all-pairs, never a driver-side text materialization.
  * clustering: union-find on the driver below DRIVER_PAIR_LIMIT
    verified pairs; above it, distributed min-label propagation
    (cluster_min_label) whose per-round shuffle is O(#nodes).
  * SimHash: 64-bit signature per doc; banding on 16-bit chunks for
    candidates; verify by Hamming distance on the full signature.
  * embedding near-dup: random-hyperplane LSH buckets, exact cosine
    within buckets only.

All per-batch math is numpy/Arrow vectorized; no per-row Python in
signature computation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

_P = np.uint64((1 << 61) - 1)  # Mersenne prime for universal hashing
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _splitmix(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * _MIX1
        x = (x ^ (x >> np.uint64(27))) * _MIX2
        return x ^ (x >> np.uint64(31))


def _word_hashes(batch_text: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(flat word hashes uint64, row lengths) for a string column."""
    if isinstance(batch_text, pa.ChunkedArray):
        batch_text = batch_text.combine_chunks()
    words = pc.split_pattern(batch_text, " ")
    lengths = np.asarray(pc.list_value_length(words).fill_null(0), dtype=np.int64)
    flat = words.flatten()
    # vectorized fnv over utf8 buffers
    from ..stages.transform import hash64_strings

    h = hash64_strings(flat) if len(flat) else np.empty(0, np.uint64)
    return h.astype(np.uint64), lengths


def _shingle_hashes(h: np.ndarray, lengths: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """k-word shingle hashes per row from flat word hashes."""
    if k <= 1:
        return h, lengths
    out_chunks = []
    out_lengths = np.maximum(lengths - (k - 1), 0)
    starts = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=starts[1:])
    # rolling polynomial combine, vectorized across the flat array
    with np.errstate(over="ignore"):
        acc = np.zeros(len(h), dtype=np.uint64)
        mult = np.uint64(0x100000001B3)
        for j in range(k):
            shifted = h[j:] if j else h
            acc = acc[: len(shifted)] * mult + shifted
        # acc[i] combines words i..i+k-1 but rolls across row borders;
        # mask cross-border shingles via per-row slicing
        keep = np.zeros(len(acc), dtype=bool)
        for r in range(len(lengths)):
            s = starts[r]
            keep[s : s + out_lengths[r]] = True
        out_chunks = acc[keep]
    return _splitmix(out_chunks), out_lengths


def minhash_signatures(
    text: pa.Array, num_perm: int = 64, shingle_k: int = 1, seed: int = 42
) -> tuple[np.ndarray, np.ndarray]:
    """(signatures [n, num_perm] uint64, shingle counts [n]).

    Vectorized: one (a*x+b) mod p pass per permutation over the flat
    shingle array, then np.minimum.reduceat at row boundaries.
    """
    h, lengths = _word_hashes(text)
    sh, sl = _shingle_hashes(h, lengths, shingle_k)
    n = len(lengths)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_P), num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_P), num_perm, dtype=np.uint64)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(sl[:-1], out=starts[1:])
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    nonempty = sl > 0
    if sh.size:
        with np.errstate(over="ignore"):
            for i in range(num_perm):
                hv = (a[i] * sh + b[i]) % _P
                mins = np.minimum.reduceat(hv, starts[nonempty.nonzero()[0]])
                # reduceat with consecutive equal starts needs care; use
                # only non-empty rows' starts (strictly increasing works
                # because empty rows excluded)
                sig[nonempty, i] = mins
    return sig, sl


def band_table(
    doc_ids: pa.Array, sig: np.ndarray, bands: int = 16
) -> pa.Table:
    """Explode signatures to (band_id, band_hash, doc_id) rows."""
    n, num_perm = sig.shape
    r = num_perm // bands
    parts = []
    with np.errstate(over="ignore"):
        for b in range(bands):
            chunk = sig[:, b * r : (b + 1) * r]
            bh = np.zeros(n, dtype=np.uint64)
            for j in range(r):
                bh = bh * np.uint64(0x100000001B3) + chunk[:, j]
            bh = _splitmix(bh)
            parts.append(
                pa.table(
                    {
                        "band_id": pa.array(np.full(n, b, dtype=np.int32)),
                        "band_hash": pa.array(bh.astype(np.int64)),
                        "doc_id": doc_ids,
                    }
                )
            )
    return pa.concat_tables(parts)


# whole banded (band_id, band_hash, doc_id) tables under this many rows
# (~50 MB) collapse candidate generation into one driver pass
BANDED_DRIVER_LIMIT = 2_000_000


def minhash_lsh_candidates(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 1,
    max_group: int = 200,
) -> Dataset:
    """Candidate near-dup pairs via MinHash banding.

    Returns a Dataset of (a, b) id pairs (a < b), deduplicated.
    The only shuffle moves (band_id, band_hash, doc_id) int rows.
    """

    def to_bands(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sig, _ = minhash_signatures(col, num_perm=num_perm, shingle_k=shingle_k)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return band_table(ids, sig, bands=bands)

    banded = ds.map_batches(to_bands, batch_format="pyarrow").materialize()

    # Bounded-fan-in fast path (same design language as
    # DRIVER_PAIR_LIMIT / BROADCAST_*): when the whole (band_id,
    # band_hash, doc_id) table fits under BANDED_DRIVER_LIMIT rows
    # (~50 MB), bucket-count + filter + pair-emit + distinct collapse
    # into ONE vectorized driver pass — replacing three keyed exchanges
    # whose per-block fixed costs dominate at small scale. Above the
    # limit (docs x bands at 100 TB), the distributed path below runs.
    import ray as _ray

    n_banded = banded.count()
    if n_banded <= BANDED_DRIVER_LIMIT:
        blocks = [t for t in _ray.get(banded.to_arrow_refs()) if t.num_columns]
        tbl = pa.concat_tables(blocks) if blocks else None
        if tbl is None or tbl.num_rows == 0:
            return _ray.data.from_arrow(_PAIR_I64.empty_table())
        if pa.types.is_integer(tbl["doc_id"].type):
            bh = np.asarray(tbl["band_hash"], np.int64)
            bid = np.asarray(tbl["band_id"], np.int64)
            ids = np.asarray(tbl["doc_id"], np.int64)
            order = np.lexsort((ids, bh, bid))
            bh_s, bid_s, ids_s = bh[order], bid[order], ids[order]
            change = np.concatenate(
                [[True], (bh_s[1:] != bh_s[:-1]) | (bid_s[1:] != bid_s[:-1])]
            )
            starts = np.flatnonzero(change)
            sizes = np.diff(np.concatenate([starts, [len(ids_s)]]))
            pa_, pb_ = [], []
            for s0, sz in zip(starts[sizes >= 2], sizes[sizes >= 2]):
                if sz > max_group:
                    import logging

                    logging.getLogger(__name__).warning(
                        "LSH band bucket of %d docs capped to %d (%d ids "
                        "not paired in this bucket)", sz, max_group,
                        sz - max_group,
                    )
                    sz = max_group
                grp = ids_s[s0 : s0 + sz]
                ii, jj = np.triu_indices(int(sz), k=1)
                pa_.append(grp[ii])
                pb_.append(grp[jj])
            if not pa_:
                return _ray.data.from_arrow(_PAIR_I64.empty_table())
            ab = np.unique(
                np.stack([np.concatenate(pa_), np.concatenate(pb_)]), axis=1
            )
            return _ray.data.from_arrow(
                pa.table({"a": pa.array(ab[0]), "b": pa.array(ab[1])})
            )
        # non-integer ids: fall through to the distributed path

    # Nearly all LSH buckets are singletons; running the pair-emitter
    # per bucket via map_groups costs one Python call per bucket. A
    # native count() first finds the non-singleton buckets, and only
    # rows in those buckets (a broadcast filter on a combined bucket
    # key — collisions just let extra rows through; the exact groupby
    # below still keys on (band_id, band_hash)) reach the per-group
    # emitter. Above the broadcast guard, a distributed left_semi join
    # does the same filtering without the driver.
    def bucket_key(t: pa.Table) -> pa.Array:
        bh = np.asarray(t["band_hash"], np.int64)
        bid = np.asarray(t["band_id"], np.int64)
        with np.errstate(over="ignore"):
            return pa.array(bh * np.int64(31) + bid)

    sizes = banded.groupby(["band_id", "band_hash"]).count()

    def eligible_keys(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema([("bkey", pa.int64())]).empty_table()
        keep = pc.greater_equal(t["count()"], 2)
        sel = t.filter(keep)
        return pa.table({"bkey": bucket_key(sel)})

    elig = sizes.map_batches(eligible_keys, batch_format="pyarrow").materialize()
    n_elig = elig.count()
    import ray as _ray

    if n_elig == 0:
        return _ray.data.from_arrow(_PAIR_I64.empty_table())
    if n_elig <= 1_000_000:
        keys_ref = _ray.put(
            pa.concat_tables(
                [t for t in _ray.get(elig.to_arrow_refs()) if t.num_columns]
            )["bkey"].combine_chunks()
        )

        def pick(t: pa.Table) -> pa.Table:
            mask = pc.is_in(bucket_key(t), value_set=_ray.get(keys_ref))
            return t.filter(mask)

        banded = banded.map_batches(pick, batch_format="pyarrow")
    else:
        from ..stages.join import semi_anti_join_ds

        with_key = banded.map_batches(
            lambda t: t.append_column("bkey", bucket_key(t)),
            batch_format="pyarrow",
        )
        banded = semi_anti_join_ds(
            with_key, "bkey", elig, "bkey", anti=False
        ).map_batches(lambda t: t.drop(["bkey"]), batch_format="pyarrow")

    def emit_pairs(df):
        import logging

        import pandas as pd

        dt = df["doc_id"].dtype
        all_ids = sorted(df["doc_id"].tolist())
        if len(all_ids) > max_group:
            # no silent caps: a band bucket larger than max_group means
            # a very dense duplicate cluster; pairs beyond the cap are
            # dropped HERE but the docs still pair with the kept head
            # in other bands — raise max_group if exhaustive pairing
            # of mega-clusters matters.
            logging.getLogger(__name__).warning(
                "LSH band bucket of %d docs capped to %d (%d ids not paired "
                "in this bucket)", len(all_ids), max_group,
                len(all_ids) - max_group,
            )
        ids = np.asarray(all_ids[:max_group])
        if len(ids) < 2:
            return pd.DataFrame(
                {"a": pd.Series([], dtype=dt), "b": pd.Series([], dtype=dt)}
            )
        ii, jj = np.triu_indices(len(ids), k=1)
        out = pd.DataFrame({"a": ids[ii], "b": ids[jj]})
        return out.astype({"a": dt, "b": dt})

    pairs = banded.groupby(["band_id", "band_hash"]).map_groups(
        emit_pairs, batch_format="pandas"
    )
    # dedupe (a, b) pairs seen in multiple bands
    return _distinct_pairs(pairs, ["a", "b"])


def _tolerant_project(out_schema: pa.Schema, rename_from: list[str] | None = None):
    """Rename/select after a shuffle aggregate, tolerating the empty
    columnless blocks Ray's Aggregate can emit (a plain
    rename_columns/select_columns Project raises on those,
    nondeterministically depending on block layout). `rename_from`
    lists the upstream column names in output order; None means the
    names already match and we just select."""
    names_out = [f.name for f in out_schema]

    def fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return out_schema.empty_table()
        src = rename_from or names_out
        return pa.table(
            {out: t[i_name] for out, i_name in zip(names_out, src)}
        )

    return fn


_PAIR_I64 = pa.schema([("a", pa.int64()), ("b", pa.int64())])


def _local_distinct(cols: list[str]):
    """Per-batch distinct on `cols` (Arrow group_by, no shuffle) — the
    partial that shrinks the global pair-dedup shuffle."""

    def fn(t: pa.Table) -> pa.Table:
        return t.select(cols).group_by(cols).aggregate([])

    return fn


def _distinct_pairs(
    pairs: Dataset, cols: list[str], out_schema: pa.Schema | None = None
) -> Dataset:
    """Global distinct on `cols`: per-batch partial dedup, then a
    native count() aggregate (partial+final combine inside Ray Data)
    instead of a per-group Python map_groups — far cheaper for the
    many tiny groups a pair table produces."""
    deduped = pairs.map_batches(_local_distinct(cols), batch_format="pyarrow")
    counted = deduped.groupby(cols).count()
    return counted.map_batches(
        _tolerant_project(out_schema or _PAIR_I64), batch_format="pyarrow"
    )


def exact_jaccard(texts_a: list[str], texts_b: list[str]) -> np.ndarray:
    out = np.zeros(len(texts_a))
    for i, (x, y) in enumerate(zip(texts_a, texts_b)):
        sa, sb = set(x.split(" ")), set(y.split(" "))
        u = len(sa | sb)
        out[i] = len(sa & sb) / u if u else 0.0
    return out


_EMPTY_VERIFIED = pa.table(
    {
        "a": pa.array([], pa.int64()),
        "b": pa.array([], pa.int64()),
        "jaccard": pa.array([], pa.float64()),
    }
)

# Above this many candidate pairs the id set is no longer broadcast to
# a per-batch filter; the docs<->pairs co-location switches to a
# distributed hash join so nothing unbounded ever lands on the driver.
BROADCAST_PAIR_LIMIT = 500_000

# Below this many candidate pairs, verification short-circuits to one
# bounded driver pass: the (<= 2 x pairs) candidate docs' texts are
# pulled once and exact Jaccard runs locally — replacing two hash
# joins + a unique + an exploded group_by whose fixed costs dominate
# when candidates are sparse (the common case: LSH at a high
# threshold). Conservative default: 20k pairs (~40k docs of text).
VERIFY_DRIVER_PAIRS = 20_000


def _verify_pairs_ds(
    ds: Dataset,
    cand: Dataset,
    text_col: str,
    id_col: str,
    threshold: float,
    broadcast_limit: int = BROADCAST_PAIR_LIMIT,
) -> Dataset:
    """Exact-Jaccard verification of candidate (a, b) pairs as a
    Dataset pipeline — no driver-side text materialization.

    Plan: attach each side's text with a hash join on the doc id
    (docs are pre-filtered to candidate ids via a broadcast set when
    the candidate count is under `broadcast_limit`, else joined
    directly — the join itself bounds the text movement to candidate
    docs), then verify per pair fully vectorized: explode both texts'
    words, distinct per (pair, side), and compute |A∩B| / |A∪B| from
    per-pair distinct/overlap counts. The only per-row Python is none.
    """
    import ray

    cand = cand.materialize()
    n_cand = cand.count()
    if n_cand == 0:
        return ray.data.from_arrow(_EMPTY_VERIFIED)
    if n_cand <= min(VERIFY_DRIVER_PAIRS, broadcast_limit):
        # bounded driver verification (see VERIFY_DRIVER_PAIRS; a
        # sub-case of the broadcast regime, so broadcast_limit=0 still
        # forces the fully distributed path in tests): one
        # broadcast-filtered pass collects just the candidate docs
        ct = pa.concat_tables(
            [t for t in ray.get(cand.to_arrow_refs()) if t.num_columns]
        )
        a_ids = np.asarray(ct["a"], np.int64)
        b_ids = np.asarray(ct["b"], np.int64)
        wanted_ref = ray.put(
            pa.array(np.unique(np.concatenate([a_ids, b_ids])))
        )

        def pick_docs(t: pa.Table) -> pa.Table:
            mask = pc.is_in(t[id_col], value_set=ray.get(wanted_ref))
            return t.filter(mask).select([id_col, text_col])

        docs_t = pa.concat_tables(
            [
                t
                for t in ray.get(
                    ds.map_batches(pick_docs, batch_format="pyarrow")
                    .materialize()
                    .to_arrow_refs()
                )
                if t.num_columns
            ]
        )
        text_of = dict(
            zip(
                np.asarray(docs_t[id_col], np.int64).tolist(),
                docs_t[text_col].to_pylist(),
            )
        )
        jac = exact_jaccard(
            [text_of[i] for i in a_ids.tolist()],
            [text_of[i] for i in b_ids.tolist()],
        )
        keep = jac >= threshold
        return ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array(a_ids[keep]),
                    "b": pa.array(b_ids[keep]),
                    "jaccard": pa.array(jac[keep]),
                }
            )
        )
    n_parts = max(2, min(64, n_cand // 50_000 + 2))
    # aggregate outputs can carry empty columnless blocks that break
    # Acero joins ("No match for key field reference"); repartition
    # unifies schemas and drops them before cand enters the joins
    cand = cand.repartition(n_parts)

    docs = ds
    if n_cand <= broadcast_limit:
        # broadcast the candidate id set once (ray.put), filter docs
        # down to candidate members before any text moves
        ids = (
            cand.select_columns(["a"]).rename_columns({"a": "i"})
            .union(cand.select_columns(["b"]).rename_columns({"b": "i"}))
            .unique("i")
        )  # bounded by 2 * broadcast_limit by construction
        wanted_ref = ray.put(pa.array(ids))

        def pick(t: pa.Table) -> pa.Table:
            mask = pc.is_in(t[id_col], value_set=ray.get(wanted_ref))
            return t.filter(mask).select([id_col, text_col])

        docs = ds.map_batches(pick, batch_format="pyarrow")
    else:
        docs = ds.map_batches(
            lambda t: t.select([id_col, text_col]), batch_format="pyarrow"
        )

    # attach text for each side; the join shuffles only candidate ids
    # plus the (pre-filtered or join-bounded) candidate texts
    schema_a = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("text_a", pa.string())]
    )
    schema_ab = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()),
         ("text_a", pa.string()), ("text_b", pa.string())]
    )
    from ..stages.join import inner_join_safe

    with_a = inner_join_safe(
        cand, docs, on=("a",), right_on=(id_col,), num_partitions=n_parts
    ).map_batches(
        _tolerant_project(schema_a, ["a", "b", text_col]), batch_format="pyarrow"
    )
    both = inner_join_safe(
        with_a, docs, on=("b",), right_on=(id_col,), num_partitions=n_parts
    ).map_batches(
        _tolerant_project(schema_ab, ["a", "b", "text_a", text_col]),
        batch_format="pyarrow",
    )

    def verify(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return _EMPTY_VERIFIED
        inter = np.zeros(n, dtype=np.int64)
        union = np.zeros(n, dtype=np.int64)
        # distinct word sets per pair-side via explode + arrow group_by
        wa = pc.split_pattern(t["text_a"].combine_chunks(), " ")
        wb = pc.split_pattern(t["text_b"].combine_chunks(), " ")
        la = np.asarray(pc.list_value_length(wa).fill_null(0), np.int64)
        lb = np.asarray(pc.list_value_length(wb).fill_null(0), np.int64)
        rows = np.concatenate(
            [np.repeat(np.arange(n, dtype=np.int64), la),
             np.repeat(np.arange(n, dtype=np.int64), lb)]
        )
        sides = np.concatenate(
            [np.zeros(int(la.sum()), np.int8), np.ones(int(lb.sum()), np.int8)]
        )
        fa, fb = wa.flatten(), wb.flatten()
        words = pa.concat_arrays([fa, fb])
        ex = pa.table({"row": rows, "side": sides, "word": words})
        # distinct (row, side, word) then per (row, word): in both sides?
        d = ex.group_by(["row", "word"]).aggregate([("side", "count_distinct")])
        both_sides = np.asarray(
            pc.equal(d["side_count_distinct"], 2), bool
        )
        drow = np.asarray(d["row"], np.int64)
        np.add.at(inter, drow[both_sides], 1)
        np.add.at(union, drow, 1)
        jac = np.divide(
            inter, union, out=np.zeros(n, np.float64), where=union > 0
        )
        keep = jac >= threshold
        return pa.table(
            {
                "a": t["a"].combine_chunks().filter(pa.array(keep)),
                "b": t["b"].combine_chunks().filter(pa.array(keep)),
                "jaccard": pa.array(jac[keep]),
            }
        )

    return both.map_batches(verify, batch_format="pyarrow")


def minhash_dedup_pairs_ds(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    broadcast_limit: int = BROADCAST_PAIR_LIMIT,
    **kw,
) -> Dataset:
    """Full near-dup pipeline as a Dataset: LSH candidates ->
    exact-Jaccard verify. Nothing unbounded is materialized on the
    driver; see _verify_pairs_ds for the co-location strategy."""
    cand = minhash_lsh_candidates(ds, text_col, id_col, **kw)
    return _verify_pairs_ds(
        ds, cand, text_col, id_col, threshold, broadcast_limit
    )


def minhash_dedup_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    **kw,
) -> "pa.Table":
    """Materialized-result wrapper around minhash_dedup_pairs_ds (the
    verified pair set is the bounded output of the pipeline)."""
    out = minhash_dedup_pairs_ds(ds, text_col, id_col, threshold, **kw)
    t = out.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    return pa.Table.from_pandas(t, preserve_index=False).replace_schema_metadata(None)


def ngram_jaccard_dedup_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    threshold: float = 0.6,
    **kw,
) -> pa.Table:
    """n-gram Jaccard near-dup: candidates from MinHash over word
    n-gram shingles, then EXACT n-gram-set Jaccard verification.
    (The returned `jaccard` is exact over word-set for n==1; for n>1
    candidates use n-gram signatures and verification uses exact
    word-set Jaccard — the stricter shingling only tightens candidate
    generation.)"""
    return minhash_dedup_pairs(
        ds, text_col, id_col, threshold=threshold, shingle_k=n, **kw
    )


# ------------------------------------------------------------------ simhash


def simhash_signatures(text: pa.Array, seed: int = 42) -> np.ndarray:
    """64-bit SimHash per row, vectorized (explode words -> bit matrix
    -> signed sums per row via np.add.reduceat)."""
    h, lengths = _word_hashes(text)
    n = len(lengths)
    if h.size == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1)  # (n_words, 64)
    signed = bits.astype(np.int32) * 2 - 1
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    nonempty = lengths > 0
    sums = np.zeros((n, 64), dtype=np.int64)
    sums[nonempty] = np.add.reduceat(signed, starts[nonempty.nonzero()[0]], axis=0)
    out_bits = (sums > 0).astype(np.uint8)
    return np.packbits(out_bits, axis=1).view(np.uint64).reshape(-1)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a ^ b).view(np.uint8).reshape(len(a), 8)
    return np.unpackbits(x, axis=1).sum(axis=1)


def simhash_dedup_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_distance: int = 12,
) -> pa.Table:
    """Near-dup pairs by SimHash: band the 64-bit signature into 4x16-bit
    chunks (a pair within Hamming distance 3 shares at least one chunk;
    larger distances are still usually caught on clustered data),
    groupby chunk, verify with exact Hamming distance."""

    def to_chunks(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sig = simhash_signatures(col)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        parts = []
        for c in range(4):
            chunk = ((sig >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int32)
            parts.append(
                pa.table(
                    {
                        "chunk_id": pa.array(np.full(len(sig), c, np.int32)),
                        "chunk_val": pa.array(chunk),
                        "doc_id": ids,
                        "sig": pa.array(sig.astype(np.int64)),
                    }
                )
            )
        return pa.concat_tables(parts)

    chunked = ds.map_batches(to_chunks, batch_format="pyarrow").materialize()

    # same singleton-bucket skip as minhash_lsh_candidates: only
    # buckets holding >= 2 docs can emit pairs, so filter to them with
    # a native count + broadcast key set before the per-group emitter
    def bucket_key(t: pa.Table) -> pa.Array:
        cv = np.asarray(t["chunk_val"], np.int64)
        cid = np.asarray(t["chunk_id"], np.int64)
        return pa.array(cv * np.int64(4) + cid)

    sizes = chunked.groupby(["chunk_id", "chunk_val"]).count()

    def eligible_keys(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.schema([("bkey", pa.int64())]).empty_table()
        sel = t.filter(pc.greater_equal(t["count()"], 2))
        return pa.table({"bkey": bucket_key(sel)})

    import ray as _ray

    elig = sizes.map_batches(eligible_keys, batch_format="pyarrow").materialize()
    if elig.count() == 0:
        import pandas as pd

        return pd.DataFrame(
            {"a": pd.Series([], dtype="int64"),
             "b": pd.Series([], dtype="int64"),
             "dist": pd.Series([], dtype="int64")}
        )
    keys_ref = _ray.put(
        pa.concat_tables(
            [t for t in _ray.get(elig.to_arrow_refs()) if t.num_columns]
        )["bkey"].combine_chunks()
    )

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(bucket_key(t), value_set=_ray.get(keys_ref)))

    chunked = chunked.map_batches(pick, batch_format="pyarrow")

    def emit(df):
        import pandas as pd

        dt = df["doc_id"].dtype
        empty = pd.DataFrame(
            {
                "a": pd.Series([], dtype=dt),
                "b": pd.Series([], dtype=dt),
                "dist": pd.Series([], dtype="int64"),
            }
        )
        if len(df) < 2:
            return empty
        if len(df) > 200:
            import logging

            logging.getLogger(__name__).warning(
                "simhash chunk bucket of %d docs capped to 200", len(df)
            )
        df = df.sort_values("doc_id").head(200)
        ids = df["doc_id"].to_numpy()
        sigs = df["sig"].to_numpy().astype(np.uint64)
        ii, jj = np.triu_indices(len(ids), k=1)
        d = hamming64(sigs[ii], sigs[jj])
        keep = d <= max_distance
        if not keep.any():
            return empty
        out = pd.DataFrame(
            {"a": ids[ii[keep]], "b": ids[jj[keep]], "dist": d[keep]}
        )
        return out.astype({"a": dt, "b": dt, "dist": "int64"})

    pairs = chunked.groupby(["chunk_id", "chunk_val"]).map_groups(
        emit, batch_format="pandas"
    )
    # distinct (a, b): dist is identical for a given pair, so a native
    # min() aggregate (per-block partial + merge) replaces the
    # per-group Python head(1)
    out_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("dist", pa.int64())]
    )
    out = (
        pairs.map_batches(_local_distinct(["a", "b", "dist"]), batch_format="pyarrow")
        .groupby(["a", "b"])
        .min("dist")
        .map_batches(
            _tolerant_project(out_schema, ["a", "b", "min(dist)"]),
            batch_format="pyarrow",
        )
    )
    return out.to_pandas()


# ---------------------------------------------------------- dup clustering


def cluster_pairs_unionfind(pairs) -> dict:
    """Driver-side union-find over a (small) verified-pair set ->
    {id: cluster_root}. Use when the candidate set is provably small
    (it is: pairs surviving Jaccard verification). Scale path:
    cluster_min_label below."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}


# Node-label tables up to this many rows are broadcast (ray.put once,
# pc.index_in lookup per edge block — no shuffle); larger graphs fall
# back to a distributed hash join per round.
BROADCAST_NODE_LIMIT = 2_000_000

_NODE_LABEL = pa.schema([("node", pa.int64()), ("label", pa.int64())])


def _partial_min(node_col: str, val_col: str):
    """Per-block (node, min(val)) partial — shrinks the groupby
    shuffle from O(messages) to O(nodes-per-block)."""

    def fn(t: pa.Table) -> pa.Table:
        g = t.group_by(node_col).aggregate([(val_col, "min")])
        return g.rename_columns([node_col, val_col])

    return fn


def cluster_min_label(
    pairs_ds: Dataset,
    id_cols: tuple[str, str] = ("a", "b"),
    max_rounds: int = 64,
    num_partitions: int | None = None,
    broadcast_node_limit: int = BROADCAST_NODE_LIMIT,
) -> Dataset:
    """Distributed connected components by min-label propagation.

    Each round every node adopts the minimum label among itself and
    its neighbors. The (node, label) table is the bounded state: when
    it fits under ``broadcast_node_limit`` rows it is broadcast once
    per round (ray.put + vectorized pc.index_in lookup inside
    map_batches — zero shuffle); above that, labels are attached with
    a distributed hash join. Either way each block emits per-block
    partial (node, min(candidate)) rows, so the global groupby only
    shuffles O(#nodes) rows per round, never O(#edges). Each round
    ends with a pointer-jumping pass (label <- label[label], valid
    because labels are node ids and only ever decrease), so chains
    collapse doubly per round and convergence is O(log diameter)
    rounds — a path graph of 10^19 nodes converges within the default
    64-round budget. Convergence is detected by the monotone label sum
    going flat; exceeding ``max_rounds`` raises instead of silently
    returning partially-merged labels.

    Requires non-negative integer node ids. Returns a Dataset of
    (node, label) where label is the component's minimum node id —
    identical to cluster_pairs_unionfind on the same edges.
    """
    import ray

    a, b = id_cols

    def sym(t: pa.Table) -> pa.Table:
        ca = t[a].combine_chunks() if isinstance(t[a], pa.ChunkedArray) else t[a]
        cb = t[b].combine_chunks() if isinstance(t[b], pa.ChunkedArray) else t[b]
        return pa.table(
            {
                "src": pa.concat_arrays([ca.cast(pa.int64()), cb.cast(pa.int64())]),
                "dst": pa.concat_arrays([cb.cast(pa.int64()), ca.cast(pa.int64())]),
            }
        )

    edges = pairs_ds.map_batches(sym, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    empty = ray.data.from_arrow(
        pa.table({"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())})
    )
    if n_edges == 0:
        return empty
    n_parts = num_partitions or max(2, min(64, n_edges // 500_000 + 2))

    labels = (
        edges.map_batches(
            lambda t: pa.table({"node": t["src"], "label": t["src"]}),
            batch_format="pyarrow",
        )
        .map_batches(_partial_min("node", "label"), batch_format="pyarrow")
        .groupby("node")
        .min("label")
        .map_batches(
            _tolerant_project(_NODE_LABEL, ["node", "min(label)"]),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n_nodes = labels.count()

    prev_sum = None
    for _ in range(max_rounds):
        if n_nodes <= broadcast_node_limit:
            # broadcast the label table once; each edge block looks up
            # label[src] vectorized and emits per-block partial mins.
            # Cost note: this pulls <= BROADCAST_NODE_LIMIT rows (~32 MB
            # at the 2M default) to the driver ONCE PER ROUND — rounds x
            # 32 MB driver traffic is the price of the zero-shuffle
            # lookup; the join path above the limit avoids it entirely.
            blocks = [
                t for t in ray.get(labels.to_arrow_refs()) if t.num_columns
            ]  # empty blocks carry a columnless schema; drop them
            lab_tbl = pa.concat_tables(blocks)
            lab_ref = ray.put(
                (
                    lab_tbl["node"].combine_chunks(),
                    lab_tbl["label"].combine_chunks(),
                )
            )

            def attach(t: pa.Table, _ref=lab_ref) -> pa.Table:
                nodes, labs = ray.get(_ref)
                pos = pc.index_in(t["src"], value_set=nodes)
                cand = pc.take(labs, pos)
                return pa.table({"node": t["dst"], "cand": cand})

            msgs = edges.map_batches(attach, batch_format="pyarrow")
        else:
            from ..stages.join import inner_join_safe

            # inner_join_safe launders BOTH sides' 0-row/columnless
            # blocks (aggregate outputs AND filtered edge blocks)
            attached = inner_join_safe(
                edges, labels, on=("src",), right_on=("node",),
                num_partitions=n_parts,
            )
            msgs = attached.map_batches(
                lambda t: pa.table({"node": t["dst"], "cand": t["label"]}),
                batch_format="pyarrow",
            )
        msgs = msgs.union(
            labels.map_batches(
                lambda t: pa.table({"node": t["node"], "cand": t["label"]}),
                batch_format="pyarrow",
            )
        )
        labels = (
            msgs.map_batches(_partial_min("node", "cand"), batch_format="pyarrow")
            .groupby("node")
            .min("cand")
            .map_batches(
                _tolerant_project(_NODE_LABEL, ["node", "min(cand)"]),
                batch_format="pyarrow",
            )
            .materialize()
        )
        # pointer jumping: label <- label[label]. Every label value is
        # itself a node (labels are propagated node ids), label[x] <= x,
        # and labels only decrease, so one application halves remaining
        # chain depth -> O(log diameter) rounds instead of O(diameter).
        if n_nodes <= broadcast_node_limit:
            blocks = [t for t in ray.get(labels.to_arrow_refs()) if t.num_columns]
            lab_tbl = pa.concat_tables(blocks)
            jump_ref = ray.put(
                (
                    lab_tbl["node"].combine_chunks(),
                    lab_tbl["label"].combine_chunks(),
                )
            )

            def jump(t: pa.Table, _ref=jump_ref) -> pa.Table:
                nodes, labs = ray.get(_ref)
                pos = pc.index_in(t["label"], value_set=nodes)
                lab2 = pc.take(labs, pos)
                return pa.table(
                    {
                        "node": t["node"],
                        "label": pc.if_else(pc.is_valid(lab2), lab2, t["label"]),
                    }
                )

            labels = labels.map_batches(jump, batch_format="pyarrow").materialize()
        else:
            lab2 = labels.map_batches(
                lambda t: pa.table({"jnode": t["node"], "jlabel": t["label"]}),
                batch_format="pyarrow",
            ).repartition(n_parts)
            labels = (
                labels.repartition(n_parts)
                .join(
                    lab2,
                    join_type="inner",  # every label value exists as a node
                    num_partitions=n_parts,
                    on=("label",),
                    right_on=("jnode",),
                )
                .map_batches(
                    lambda t: pa.table({"node": t["node"], "label": t["jlabel"]}),
                    batch_format="pyarrow",
                )
                .materialize()
            )
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"cluster_min_label did not converge within {max_rounds} rounds "
        "(graph diameter exceeds the round budget; raise max_rounds)"
    )


# Verified-pair sets up to this size are clustered with driver-side
# union-find (exact, one pass); larger graphs go through the
# distributed min-label rounds so the edge list never lands on the
# driver.
DRIVER_PAIR_LIMIT = 100_000


def dup_clusters(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    driver_pair_limit: int = DRIVER_PAIR_LIMIT,
    max_rounds: int = 64,
    **kw,
) -> pa.Table:
    """Near-dup clusters: MinHash-LSH candidates -> exact-Jaccard
    verify -> connected components. Returns (doc_id, cluster_id,
    cluster_size) for every doc in a non-singleton cluster.

    Both clustering paths produce identical labels (component minimum
    id); the distributed path kicks in above ``driver_pair_limit``
    verified pairs."""
    import pandas as pd

    pairs_ds = minhash_dedup_pairs_ds(
        ds, text_col, id_col, threshold=threshold, **kw
    ).materialize()
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "cluster_id": pa.array([], pa.int64()),
                "cluster_size": pa.array([], pa.int64()),
            }
        )
    if n_pairs <= driver_pair_limit:
        vp = pairs_ds.to_pandas()
        labels = cluster_pairs_unionfind(list(zip(vp["a"], vp["b"])))
        df = pd.DataFrame(
            {"doc_id": list(labels), "cluster_id": list(labels.values())}
        )
    else:
        lab_ds = cluster_min_label(pairs_ds, max_rounds=max_rounds)
        df = lab_ds.to_pandas().rename(
            columns={"node": "doc_id", "label": "cluster_id"}
        )
    sizes = df.groupby("cluster_id")["doc_id"].transform("size")
    df = df.assign(cluster_size=sizes).sort_values(["cluster_id", "doc_id"])
    df = df.astype(
        {"doc_id": "int64", "cluster_id": "int64", "cluster_size": "int64"}
    )
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


# ------------------------------------------------- embedding cosine near-dup


def embedding_neardup_pairs(
    ds: Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 7,
) -> pa.Table:
    """Near-dup pairs by cosine similarity: random-hyperplane LSH
    buckets, exact cosine verify within buckets only."""
    import pandas as pd

    planes_holder: dict = {}

    def bucketize(t: pa.Table) -> pa.Table:
        vecs = np.stack(t[vec_col].to_numpy(zero_copy_only=False))
        d = vecs.shape[1]
        if "p" not in planes_holder:
            rng = np.random.default_rng(seed)
            planes_holder["p"] = rng.standard_normal((d, n_planes))
        proj = vecs @ planes_holder["p"]
        bucket = (proj > 0).astype(np.uint32) @ (1 << np.arange(n_planes, dtype=np.uint32))
        norms = np.linalg.norm(vecs, axis=1)
        unit = vecs / np.maximum(norms[:, None], 1e-12)
        return pa.table(
            {
                "bucket": pa.array(bucket.astype(np.int64)),
                id_col: t[id_col],
                "unit": pa.array(list(unit.astype(np.float32))),
            }
        )

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")

    def emit(df: "pd.DataFrame"):
        import pandas as pd

        dt = df[id_col].dtype
        if len(df) < 2:
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype=dt),
                    "b": pd.Series([], dtype=dt),
                    "cosine": pd.Series([], dtype="float64"),
                }
            )
        if len(df) > 500:
            import logging

            logging.getLogger(__name__).warning(
                "embedding LSH bucket of %d vectors capped to 500", len(df)
            )
        df = df.sort_values(id_col).head(500)
        ids = df[id_col].to_numpy()
        mat = np.stack(df["unit"].to_numpy())
        sims = mat @ mat.T
        iu = np.triu_indices(len(ids), k=1)
        mask = sims[iu] >= threshold
        return pd.DataFrame(
            {
                "a": ids[iu[0][mask]],
                "b": ids[iu[1][mask]],
                "cosine": sims[iu][mask].astype(float),
            }
        )

    pairs = bucketed.groupby("bucket").map_groups(emit, batch_format="pandas")
    # cosine is identical for a pair wherever it appears; native max()
    # aggregate dedups without per-group Python
    out_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("cosine", pa.float64())]
    )
    out = (
        pairs.map_batches(_local_distinct(["a", "b", "cosine"]), batch_format="pyarrow")
        .groupby(["a", "b"])
        .max("cosine")
        .map_batches(
            _tolerant_project(out_schema, ["a", "b", "max(cosine)"]),
            batch_format="pyarrow",
        )
    )
    return out.to_pandas()


def dedup_corpus_ids(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.6,
    driver_pair_limit: int = DRIVER_PAIR_LIMIT,
    max_rounds: int = 64,
    **kw,
) -> Dataset:
    """Surviving doc ids after near-dup removal (keep the min doc id
    per cluster) — the full dedup pipeline a training run consumes.

    Below ``driver_pair_limit`` verified pairs, clustering is driver
    union-find and the drop set broadcasts (ray.put + per-batch
    pc.is_in). Above it, NOTHING touches the driver: distributed
    min-label clustering produces a (node, label) Dataset, the drop
    set is `node != label` rows, and survivors come from a native
    left_anti hash join."""
    import ray

    from ..stages.join import semi_anti_join_ds, semi_join_filter

    pairs_ds = minhash_dedup_pairs_ds(
        ds, text_col, id_col, threshold=threshold, **kw
    ).materialize()
    ids = ds.map_batches(
        lambda t: pa.table({id_col: t[id_col]}), batch_format="pyarrow"
    )
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return ids
    if n_pairs <= driver_pair_limit:
        vp = pairs_ds.to_pandas()
        labels = cluster_pairs_unionfind(list(zip(vp["a"], vp["b"])))
        drop = [n for n, root in labels.items() if n != root]
        drop_ref = ray.put(pa.array(drop, pa.int64()))
        return semi_join_filter(ids, id_col, drop_ref, anti=True)
    lab_ds = cluster_min_label(pairs_ds, max_rounds=max_rounds)
    node_only = pa.schema([("node", pa.int64())])

    def drop_fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return node_only.empty_table()  # typed empty; join needs the key
        return pa.table({"node": t["node"]}).filter(
            pc.not_equal(t["node"], t["label"])
        )

    drop_ds = lab_ds.map_batches(drop_fn, batch_format="pyarrow")
    return semi_anti_join_ds(ids, id_col, drop_ds, "node", anti=True)


# --------------------------------------------------- duplicate-span removal

SPAN_DEDUP_BROADCAST_LIMIT = 2_000_000  # distinct-span partial rows


def span_dedup_corpus(
    ds: Dataset,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_limit: int | None = None,
) -> Dataset:
    """C4-style corpus-wide duplicate-span removal (Raffel et al. 2020
    §2.2; span unit = ``k`` words): keep each distinct span only at its
    globally-first (doc_id, span_idx), reassemble survivors in order —
    REWRITES documents (a doc whose every span appeared earlier
    survives as ""). Returns (id_col, text_dedup, n_spans, n_dropped).

    Scale shape: per-batch (span -> min packed-key) partials collapse
    duplicates locally before any exchange. Under ``broadcast_limit``
    the first-occurrence table is one bounded driver group_by,
    broadcast once (ray.put), and the rewrite is a single shuffle-free
    map_batches (index_in lookup + one ListArray rebuild per batch).
    Above it: groupby(span).min — ONE keyed shuffle over distinct
    spans — + distributed hash join back + per-doc regroup (group
    size = one document's spans, never a hot key). Both paths tested
    equal. At 100 TB key the shuffle on a 128-bit span hash; at
    fixture scale the key is the span text itself so the SQL oracle
    replays it exactly."""
    import functools

    import ray
    from ray.data.aggregate import Min

    from .corpusfns import span_batch

    if broadcast_limit is None:
        broadcast_limit = SPAN_DEDUP_BROADCAST_LIMIT
    sb = functools.partial(span_batch, k=k, id_col=id_col, text_col=text_col)

    def span_min_partial(t: pa.Table) -> pa.Table:
        g = sb(t)
        m = (
            pa.table({"span": g["span"], "packed": g["packed"]})
            .group_by("span")
            .aggregate([("packed", "min")])
        )
        return pa.table({"span": m["span"], "mp": m["packed_min"]})

    partials = ds.map_batches(span_min_partial, batch_format="pyarrow").materialize()
    if partials.count() <= broadcast_limit:
        tbl = pa.concat_tables(
            [t for t in ray.get(partials.to_arrow_refs()) if t.num_columns]
        )
        firsts = tbl.group_by("span").aggregate([("mp", "min")])
        span_vals = firsts["span"]
        if isinstance(span_vals, pa.ChunkedArray):
            span_vals = span_vals.combine_chunks()
        mp_vals = np.asarray(firsts["mp_min"], dtype=np.int64)
        ref = ray.put((span_vals, mp_vals))

        def rewrite(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {
                        id_col: pa.array([], pa.int64()),
                        "text_dedup": pa.array([], pa.string()),
                        "n_spans": pa.array([], pa.int64()),
                        "n_dropped": pa.array([], pa.int64()),
                    }
                )
            spans_b, mp = ray.get(ref)  # zero-copy plasma read
            g = sb(t)
            idx = np.asarray(pc.index_in(g["span"], value_set=spans_b))
            keep = np.asarray(g["packed"], dtype=np.int64) == mp[idx]
            # span rows are emitted in input-row order; span_idx == 0
            # marks each new document
            rep = np.cumsum(np.asarray(g["span_idx"], dtype=np.int64) == 0) - 1
            n_rows = t.num_rows
            kept_cnt = np.bincount(rep[keep], minlength=n_rows)
            offs = np.concatenate([[0], np.cumsum(kept_cnt)])
            vals = g["span"]
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            lst = pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()), vals.filter(pa.array(keep))
            )
            n_spans = np.bincount(rep, minlength=n_rows)
            return pa.table(
                {
                    id_col: t[id_col],
                    "text_dedup": pc.binary_join(lst, " "),
                    "n_spans": pa.array(n_spans.astype(np.int64)),
                    "n_dropped": pa.array((n_spans - kept_cnt).astype(np.int64)),
                }
            )

        return ds.map_batches(rewrite, batch_format="pyarrow")

    # ---- distributed route: groupby + hash join back on span ----
    spans = ds.map_batches(sb, batch_format="pyarrow")
    firsts_ds = partials.groupby("span").aggregate(
        Min("mp", alias_name="mp_min")
    )
    from ..stages.join import inner_join_safe

    # a doc shorter than the span width yields a 0-row spans block —
    # inner_join_safe launders those on both sides
    joined = inner_join_safe(spans, firsts_ds, on=("span",), num_partitions=16)

    def regroup(df):
        import pandas as pd

        df = df.sort_values("span_idx")
        keep = df["packed"].to_numpy() == df["mp_min"].to_numpy()
        return pd.DataFrame(
            {
                id_col: [int(df[id_col].iloc[0])],
                "text_dedup": [" ".join(df["span"].to_numpy()[keep])],
                "n_spans": [len(df)],
                "n_dropped": [int((~keep).sum())],
            }
        )

    return joined.groupby(id_col).map_groups(regroup, batch_format="pandas")


# ------------------------------------------------------------------ SemDeDup

SEMDEDUP_MAX_CLUSTER = 4000  # pairwise-cosine cap per k-means cluster


def semdedup_ids(
    ds: Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 16,
    threshold: float = 0.92,
    seed: int = 11,
    max_cluster: int = SEMDEDUP_MAX_CLUSTER,
) -> Dataset:
    """SemDeDup (Abbas et al. 2023): semantic dedup via k-means over
    the embedding space, then exact pairwise cosine ONLY within each
    cluster; a vector is dropped when a same-cluster neighbor with a
    smaller id has cosine >= threshold (keep-min-id, the same
    deterministic survivor rule the text dedup family uses).

    Scale shape: k-means reuses the mergeable Lloyd partial-sum pass
    (build_ivf_centroids) — only (k x dim) floats shuffle per batch;
    assignment is one broadcast matmul per batch; the quadratic step
    is confined to clusters (n_clusters scales with corpus size so
    cluster population stays bounded; oversized clusters are capped to
    ``max_cluster`` rows and logged, like every bucket cap here).
    Returns the surviving (id, cluster) rows.
    """
    import pandas as pd

    from .ann import _vec_matrix, build_ivf_centroids

    cents = build_ivf_centroids(
        ds, n_centroids=n_clusters, vec_col=vec_col, seed=seed, id_col=id_col
    )
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1)[:, None], 1e-12)

    def assign(t: pa.Table) -> pa.Table:
        m = _vec_matrix(t[vec_col]).astype(np.float64)
        unit = m / np.maximum(np.linalg.norm(m, axis=1)[:, None], 1e-12)
        cid = np.argmax(unit @ cn.T, axis=1)
        return pa.table(
            {
                id_col: t[id_col],
                "cluster_id": pa.array(cid.astype(np.int64)),
                "unit": pa.array(list(unit.astype(np.float32))),
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    def survivors(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        df = df.sort_values(id_col)
        tail = df.iloc[0:0]
        if len(df) > max_cluster:
            import logging

            logging.getLogger(__name__).warning(
                "semdedup cluster of %d vectors: only the first %d are "
                "pairwise-inspected; the tail passes through as survivors",
                len(df),
                max_cluster,
            )
            # the cap bounds the O(m^2) work; rows past it must NOT be
            # dropped from the corpus — they simply go uninspected
            tail = df.iloc[max_cluster:]
            df = df.head(max_cluster)
        ids = df[id_col].to_numpy()
        if len(df) < 2:
            dropped = np.zeros(len(df), dtype=bool)
        else:
            mat = np.stack(df["unit"].to_numpy()).astype(np.float64)
            # row blocks bound the sims working set to m x block floats
            dropped = np.zeros(len(df), dtype=bool)
            for lo in range(1, len(df), 512):
                hi = min(lo + 512, len(df))
                sims = mat[lo:hi] @ mat.T
                # similarity to ANY smaller-id row (ids sorted asc):
                # strictly-lower-triangle columns only
                col_idx = np.arange(len(df))
                mask = col_idx[None, :] < np.arange(lo, hi)[:, None]
                dropped[lo:hi] = ((sims >= threshold) & mask).any(axis=1)
        out = pd.DataFrame(
            {
                id_col: ids[~dropped],
                "cluster_id": df["cluster_id"].to_numpy()[~dropped],
            }
        )
        if len(tail):
            out = pd.concat(
                [out, tail[[id_col, "cluster_id"]]], ignore_index=True
            )
        return out

    return assigned.groupby("cluster_id").map_groups(
        survivors, batch_format="pandas"
    )


# -- blocked edit-distance record linkage (r4 session 4) --------------


def editdist_bytes(a: bytes, b: bytes) -> int:
    """Levenshtein distance over BYTES (unit insert/delete/substitute),
    matching DuckDB's ``levenshtein`` which operates on the UTF-8 byte
    string (levenshtein('café','cafe') = 2). Row-wise DP with the
    min-accumulate trick so the inner loop is numpy, not Python:
    cur[j] = j' + minimum.accumulate(base - j')[j] resolves the
    sequential insert dependency in one vector op."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    bv = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
    prev = np.arange(len(b) + 1, dtype=np.int64)
    idx = np.arange(len(b) + 1, dtype=np.int64)
    for i, ca in enumerate(a, start=1):
        cost = (bv != ca).astype(np.int64)
        base = np.empty(len(b) + 1, dtype=np.int64)
        base[0] = i
        base[1:] = np.minimum(prev[1:] + 1, prev[:-1] + cost)
        cur = idx + np.minimum.accumulate(base - idx)
        prev = cur
    return int(prev[-1])


def editdist_bytes_pairs(
    prefixes: list, ia: np.ndarray, ib: np.ndarray, chunk: int = 500_000
) -> np.ndarray:
    """Levenshtein distance for MANY byte-string pairs at once — the
    same row-wise DP as editdist_bytes, vectorized over the PAIR axis
    (one (pairs x L+1) state matrix; axis-1 minimum.accumulate
    resolves the insert dependency; rows freeze once their left string
    is consumed). Per-pair numpy calls on ~64-byte strings are
    overhead-bound (~0.5 ms/pair); this amortizes them across the
    whole block. Bitwise-equal to editdist_bytes (pytest)."""
    n = len(prefixes)
    lens = np.fromiter((len(p) for p in prefixes), dtype=np.int64, count=n)
    L = int(lens.max()) if n else 0
    M = np.zeros((n, L), dtype=np.uint8)
    for i, p in enumerate(prefixes):
        if p:
            M[i, : len(p)] = np.frombuffer(p, dtype=np.uint8)
    out = np.empty(len(ia), dtype=np.int64)
    idx = np.arange(L + 1, dtype=np.int64)
    for s in range(0, len(ia), chunk):
        a_i, b_i = ia[s : s + chunk], ib[s : s + chunk]
        A, la = M[a_i], lens[a_i]
        B, lb = M[b_i], lens[b_i]
        p = len(a_i)
        prev = np.broadcast_to(idx, (p, L + 1)).copy()
        base = np.empty((p, L + 1), dtype=np.int64)
        top = int(la.max()) if p else 0
        for i in range(1, top + 1):
            cost = (B != A[:, i - 1][:, None]).astype(np.int64)
            base[:, 0] = i
            np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost, out=base[:, 1:])
            cur = idx + np.minimum.accumulate(base - idx, axis=1)
            active = la >= i
            prev[active] = cur[active]
        out[s : s + chunk] = prev[np.arange(p), lb]
    return out


def blocked_editdist_pairs(
    ds: Dataset,
    id_col: str,
    text_col: str,
    len_col: str,
    prefix_len: int = 64,
    block_prefix: int = 6,
    len_band: int = 256,
    max_dist: int = 24,
    max_block: int = 10_000,
) -> Dataset:
    """Record-linkage near-duplicate pairs by BLOCKED byte-level edit
    distance — the fuzzy-matching family (MinHash/SimHash catch
    shingle overlap; edit distance catches character-level mutations
    like OCR noise and typo clones).

    Blocking key = lower(first ``block_prefix`` chars) + length band
    (``len_col`` // ``len_band``) — candidates only ever compare
    within a block, so the quadratic pairwise stage is bounded by the
    largest block, not the corpus. Emits (id_a, id_b, dist) for pairs
    with distance ≤ ``max_dist`` over the first ``prefix_len`` BYTES.

    Scale shape: one groupby(block) exchange co-locates each block;
    per-block pairwise DP is vectorized row-wise (editdist_bytes).
    Skew guard: a block larger than ``max_block`` raises rather than
    silently running O(block²) — pick a finer blocking key (longer
    prefix / narrower band) instead, the same remedy as a hot join
    key. Partitioning assumption: block cardinality >> #CPUs so the
    groupby spreads; the key includes a text prefix, which is
    high-cardinality on natural corpora."""

    def keyed(t: pa.Table) -> pa.Table:
        # slice by CHARACTERS (= SQL substr semantics), then compare the
        # UTF-8 bytes of that prefix (= DuckDB levenshtein semantics)
        prefix = pc.cast(
            pc.utf8_slice_codeunits(t[text_col], 0, prefix_len), pa.binary()
        )
        blk = pc.binary_join_element_wise(
            pc.utf8_lower(pc.utf8_slice_codeunits(t[text_col], 0, block_prefix)),
            pc.cast(
                pc.divide(pc.cast(t[len_col], pa.int64()), len_band), pa.string()
            ),
            "|",
        )
        return pa.table({"blk": blk, id_col: t[id_col], "prefix": prefix})

    def block_pairs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n > max_block:
            raise RuntimeError(
                f"editdist block {t['blk'][0].as_py()!r} has {n} rows "
                f"(> max_block={max_block}); use a finer blocking key"
            )
        ids = np.asarray(t[id_col].to_pylist())
        prefixes = t[text_col if text_col in t.column_names else "prefix"].to_pylist()
        order = np.argsort(ids)
        ii, jj = np.triu_indices(n, k=1)
        ia, ib = order[ii], order[jj]
        dists = (
            editdist_bytes_pairs(prefixes, ia, ib)
            if len(ia)
            else np.empty(0, dtype=np.int64)
        )
        keep = dists <= max_dist
        return pa.table(
            {
                "id_a": pa.array(ids[ia[keep]], pa.int64()),
                "id_b": pa.array(ids[ib[keep]], pa.int64()),
                "dist": pa.array(dists[keep], pa.int64()),
            }
        )

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("blk")
        .map_groups(block_pairs, batch_format="pyarrow")
    )
