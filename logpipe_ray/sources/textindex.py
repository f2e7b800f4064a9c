"""Trigram Bloom index for substring search — "grep at 100 TB".

The technique behind Google Code Search / PostgreSQL pg_trgm, re-cut
for a file-pruned lake: every data file carries a Bloom filter over
the set of BYTE TRIGRAMS occurring in its text column. A substring
query must contain every trigram of the pattern in the same file, so
files whose filter rejects ANY pattern trigram are skipped without
opening them; the exact ``match_substring`` predicate then runs only
on the surviving files (Bloom false positives cost a file read, never
a wrong row). Byte-level trigrams make the index encoding-agnostic
(UTF-8 multibyte sequences are just bytes; exactness comes from the
verify step, the trigrams only need to be a superset filter).

Trigram extraction: all texts of a file are joined with a double-NUL
separator into one byte buffer (one C-level str.join at index-build
time), a numpy stride view yields every 3-byte window, windows
containing NUL (doc boundaries) are masked, and the rest pack into
int32 codes — no per-character Python anywhere, and nothing per-row
on the query path. The reference engine greps by
streaming every byte of every file (readme.md: filter transformers);
this layer is what makes that query sublinear in files touched.
"""

from __future__ import annotations

import base64
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ray.data import Dataset

from .layout import _bloom_positions

TRGMMAP_NAME = "trgmmap.json"


def _byte_trigrams(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Distinct int32 byte-trigram codes across all given strings."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    joined = ("\x00\x00").join(
        t if t is not None else "" for t in texts.to_pylist()
    ).encode("utf-8", "surrogatepass")
    if len(joined) < 3:
        return np.empty(0, np.int64)
    buf = np.frombuffer(joined, np.uint8)
    w = np.lib.stride_tricks.sliding_window_view(buf, 3)
    mask = (w != 0).all(axis=1)
    codes = (
        w[:, 0].astype(np.int64) * 65536
        + w[:, 1].astype(np.int64) * 256
        + w[:, 2].astype(np.int64)
    )
    return np.unique(codes[mask])


def pattern_trigrams(pattern: str) -> np.ndarray:
    """Byte-trigram codes of a query pattern (needs len >= 3 bytes)."""
    b = pattern.encode("utf-8")
    if len(b) < 3:
        raise ValueError("trigram index needs a pattern of >= 3 bytes")
    buf = np.frombuffer(b, np.uint8)
    w = np.lib.stride_tricks.sliding_window_view(buf, 3)
    codes = (
        w[:, 0].astype(np.int64) * 65536
        + w[:, 1].astype(np.int64) * 256
        + w[:, 2].astype(np.int64)
    )
    return np.unique(codes)


def trigram_index_write(
    ds: Dataset,
    id_col: str,
    text_col: str,
    out_dir: str,
    n_files: int = 32,
    bits_per_key: int = 12,
    n_hashes: int = 7,
) -> dict:
    """Write ``ds`` as ``n_files`` parquet files (hash-placed by
    ``id_col``) plus a ``trgmmap.json`` sidecar holding one Bloom
    filter per file over that file's distinct byte trigrams. One keyed
    exchange co-locates each file's rows; each file task extracts its
    trigram set vectorized and packs the filter bits (~1.5 B per
    distinct trigram at the 12-bit default). tmp+rename atomic,
    sidecar last."""
    import pandas as pd

    base = ds.map_batches(
        lambda t, c=text_col: t.filter(pc.is_valid(t[c])),
        batch_format="pyarrow",
    )
    os.makedirs(out_dir, exist_ok=True)

    def assign(t: pa.Table) -> pa.Table:
        col = t[id_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = pd.util.hash_array(col.to_numpy(zero_copy_only=False))
        fid = (h % np.uint64(n_files)).astype(np.int64)
        return t.append_column("_f", pa.array(fid))

    def write_file(t: pa.Table) -> pa.Table:
        fid = int(t["_f"][0].as_py())
        body = t.drop(["_f"])
        name = f"tpart_{fid:05d}.parquet"
        tmp = os.path.join(out_dir, f".{name}.tmp")
        pq.write_table(body, tmp)
        os.replace(tmp, os.path.join(out_dir, name))
        tri = _byte_trigrams(body[text_col])
        m_bits = max(64, int(len(tri) * bits_per_key))
        bits = np.zeros((m_bits + 7) // 8, np.uint8)
        if len(tri):
            h = pd.util.hash_array(tri)
            for pos in _bloom_positions(h, m_bits, n_hashes):
                np.bitwise_or.at(
                    bits, pos // 8, np.uint8(1) << (pos % 8).astype(np.uint8)
                )
        return pa.table(
            {
                "file": pa.array([name]),
                "m_bits": pa.array([m_bits], pa.int64()),
                "rows": pa.array([body.num_rows], pa.int64()),
                "bits": pa.array([base64.b64encode(bits.tobytes()).decode()]),
            }
        )

    blooms = (
        base.map_batches(assign, batch_format="pyarrow")
        .groupby("_f")
        .map_groups(write_file, batch_format="pyarrow")
    ).to_pandas()
    trgmmap = {
        r.file: {"m_bits": int(r.m_bits), "rows": int(r.rows), "bits": r.bits}
        for r in blooms.itertuples()
    }
    tmp = os.path.join(out_dir, f".{TRGMMAP_NAME}.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {"text_col": text_col, "n_hashes": n_hashes, "files": trgmmap}, f
        )
    os.replace(tmp, os.path.join(out_dir, TRGMMAP_NAME))
    return trgmmap


def grep_scan(
    out_dir: str,
    pattern: str,
    columns: list[str] | None = None,
) -> tuple[Dataset, dict]:
    """Substring search through the trigram index: open only the files
    whose Bloom filter admits EVERY trigram of ``pattern``, then apply
    the exact ``match_substring`` predicate on the survivors. Returns
    (Dataset of matching rows, stats) with files_total / files_read as
    the pruning evidence."""
    import pandas as pd
    import ray.data as rd

    from .factory import strip_pandas_metadata

    with open(os.path.join(out_dir, TRGMMAP_NAME)) as f:
        meta = json.load(f)
    text_col = meta["text_col"]
    k = meta["n_hashes"]
    tri = pattern_trigrams(pattern)
    h = pd.util.hash_array(tri)
    picked = []
    for name, info in meta["files"].items():
        m_bits = info["m_bits"]
        bits = np.frombuffer(base64.b64decode(info["bits"]), np.uint8)
        hit = np.ones(len(tri), bool)
        for pos in _bloom_positions(h, m_bits, k):
            probe = (bits[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
            hit &= probe.astype(bool)
        if hit.all():  # every pattern trigram may be present
            picked.append(os.path.join(out_dir, name))
    stats = {
        "files_total": len(meta["files"]),
        "files_read": len(picked),
        "pattern": pattern,
    }
    if not picked:
        return rd.from_arrow(pa.table({})), stats

    kw = {"columns": columns} if columns is not None else {}

    def verify(t: pa.Table) -> pa.Table:
        return t.filter(pc.match_substring(t[text_col], pattern))

    ds = (
        rd.read_parquet(picked, **kw)
        .map_batches(strip_pandas_metadata, batch_format="pyarrow",
                     zero_copy_batch=True)
        .map_batches(verify, batch_format="pyarrow")
    )
    return ds, stats


# ------------------------------------------------------------- postings

POSTMAP_NAME = "postmap.json"


def _term_doc_pairs(t: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """Distinct (term, doc) pairs of a batch — vectorized: one Arrow
    split on the single-space delimiter (the SQL-replayable
    string_split(text, ' ') tokenization), list lengths drive a repeat
    of the doc ids, one group_by dedups."""
    col = t[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ids = t[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    toks = pc.split_pattern(col.fill_null(""), " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = toks.flatten()
    doc = np.repeat(ids.to_numpy(zero_copy_only=False), lens)
    pairs = pa.table({"term": flat, "doc_id": pa.array(doc)})
    pairs = pairs.filter(pc.not_equal(pairs["term"], ""))
    return pairs.group_by(["term", "doc_id"]).aggregate([])


def postings_write(
    ds: Dataset,
    id_col: str,
    text_col: str,
    out_dir: str,
    n_buckets: int = 32,
) -> dict:
    """INVERTED INDEX: distinct (term, doc_id) postings hash-placed by
    term into ``n_buckets`` parquet files, each sorted by (term,
    doc_id) so parquet row-group stats prune within a file too. A term
    lookup opens only its bucket file — boolean queries touch
    #query-terms buckets, never the corpus.

    Scale shape: per-batch distinct pairs (one Arrow split + repeat +
    group_by, no per-row Python) -> ONE keyed exchange on the bucket id
    co-locates each bucket's postings -> per-bucket final dedup + sort
    + atomic write (tmp+rename, sidecar last). Pair volume is bounded
    by tokens, dedup'd twice (batch-local then bucket)."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def assign(t: pa.Table) -> pa.Table:
        pairs = _term_doc_pairs(t, id_col, text_col)
        h = pd.util.hash_array(
            pairs["term"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        b = (h % np.uint64(n_buckets)).astype(np.int64)
        return pairs.append_column("_b", pa.array(b))

    def write_bucket(t: pa.Table) -> pa.Table:
        b = int(t["_b"][0].as_py())
        body = (
            t.drop(["_b"])
            .group_by(["term", "doc_id"])
            .aggregate([])
            .sort_by([("term", "ascending"), ("doc_id", "ascending")])
        )
        name = f"post_{b:05d}.parquet"
        tmp = os.path.join(out_dir, f".{name}.tmp")
        pq.write_table(body, tmp)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table(
            {
                "bucket": pa.array([b], pa.int64()),
                "file": pa.array([name]),
                "rows": pa.array([body.num_rows], pa.int64()),
            }
        )

    written = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(write_bucket, batch_format="pyarrow")
    ).to_pandas()
    files = {int(r.bucket): {"file": r.file, "rows": int(r.rows)}
             for r in written.itertuples()}
    meta = {"n_buckets": n_buckets, "id_col": id_col, "files": files}
    tmp = os.path.join(out_dir, f".{POSTMAP_NAME}.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, POSTMAP_NAME))
    return meta


def postings_lookup(
    index_dir: str,
    terms: list[str],
    mode: str = "and",
) -> tuple[Dataset, dict]:
    """Boolean term query through the postings index: open ONLY the
    bucket files the query terms hash to, filter to the exact terms,
    then combine — ``and`` keeps docs whose per-doc matched-term count
    equals len(terms) (a distributed set intersection as one bounded
    count exchange), ``or`` dedups the union. Returns (Dataset with a
    doc-id column, stats with files_total/files_read pruning
    evidence)."""
    import pandas as pd
    import ray.data as rd

    from ..functions.tokens import _merge_count_partials
    from .factory import strip_pandas_metadata

    if mode not in ("and", "or"):
        raise ValueError(f"postings_lookup: unknown mode {mode!r}")
    uniq = sorted(set(terms))
    if not uniq:
        raise ValueError("postings_lookup: no terms")
    with open(os.path.join(index_dir, POSTMAP_NAME)) as f:
        meta = json.load(f)
    id_col = meta["id_col"]
    nb = np.uint64(meta["n_buckets"])
    h = pd.util.hash_array(np.asarray(uniq, dtype=object))
    buckets = sorted({int(x % nb) for x in h})
    picked = [
        os.path.join(index_dir, meta["files"][str(b)]["file"])
        if str(b) in meta["files"]
        else None
        for b in buckets
    ]
    picked = [p for p in picked if p is not None and os.path.exists(p)]
    stats = {
        "files_total": len(meta["files"]),
        "files_read": len(picked),
        "terms": uniq,
    }
    empty = pa.schema([(id_col, pa.int64())]).empty_table()
    if not picked:
        return rd.from_arrow(empty), stats

    tset = pa.array(uniq, pa.string())

    def pick_pairs(t: pa.Table) -> pa.Table:
        hit = t.filter(pc.is_in(t["term"], value_set=tset))
        # postings are (term, doc) distinct -> count partials per doc
        g = (
            pa.table(
                {
                    "doc": hit["doc_id"],
                    "p": pa.array(np.ones(hit.num_rows, np.int64)),
                }
            )
            .group_by("doc")
            .aggregate([("p", "sum")])
        )
        return g.rename_columns(["doc", "p"])

    counts = _merge_count_partials(
        rd.read_parquet(picked)
        .map_batches(strip_pandas_metadata, batch_format="pyarrow",
                     zero_copy_batch=True)
        .map_batches(pick_pairs, batch_format="pyarrow"),
        "doc",
        "nt",
    )
    need = len(uniq)

    def finish(t: pa.Table, _need=need, _mode=mode) -> pa.Table:
        if not t.num_columns:
            return pa.schema([(id_col, pa.int64())]).empty_table()
        if _mode == "and":
            t = t.filter(pc.equal(t["nt"], _need))
        return pa.table({id_col: t["doc"]})

    return counts.map_batches(finish, batch_format="pyarrow"), stats


# ---------------------------------------------------- ranked postings

RANKMAP_NAME = "rankmap.json"


def ranked_postings_write(
    ds: Dataset,
    id_col: str,
    text_col: str,
    out_dir: str,
    n_buckets: int = 32,
) -> dict:
    """Ranked INVERTED INDEX: (term, doc_id, tf, dl) postings
    hash-placed by term, plus corpus stats (n_docs, dl_sum) in the
    sidecar — everything BM25 needs at query time without touching the
    corpus. Tokenization = the BM25 contract (lowercased WORD_SPLIT_RE
    split, empties dropped; functions/search.py), so index-backed
    scores are bitwise-identical to the full-scan scorer.

    Scale shape: per-batch (term, doc, tf) via one Arrow split + one
    group_by (dl rides along, constant per doc); ONE keyed exchange on
    the term-hash bucket; per-bucket sort + atomic write; one cheap
    stats pass (n, dl_sum int partials). Volume bounded by distinct
    (term, doc) pairs."""
    import pandas as pd

    from ..functions.search import WORD_SPLIT_RE

    os.makedirs(out_dir, exist_ok=True)

    def pairs(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        words = pc.split_pattern_regex(
            pc.utf8_lower(col.fill_null("")), WORD_SPLIT_RE
        )
        lens = np.asarray(
            pc.list_value_length(words).fill_null(0), dtype=np.int64
        )
        flat = words.flatten()
        doc = np.repeat(ids.to_numpy(zero_copy_only=False), lens)
        nonempty = np.asarray(pc.not_equal(flat, "").fill_null(False))
        starts = np.concatenate([[0], np.cumsum(lens)])
        csum = np.concatenate([[0], np.cumsum(nonempty, dtype=np.int64)])
        dl = csum[starts[1:]] - csum[starts[:-1]]  # per input doc
        # dl per flat word (repeat) so it rides the group_by
        dlw = np.repeat(dl, lens)
        tbl = pa.table(
            {
                "term": flat,
                "doc_id": pa.array(doc),
                "dl": pa.array(dlw),
            }
        ).filter(nonempty)
        g = (
            tbl.group_by(["term", "doc_id", "dl"])
            .aggregate([([], "count_all")])
            .rename_columns(["term", "doc_id", "dl", "tf"])
        )
        h = pd.util.hash_array(
            g["term"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        return g.append_column(
            "_b", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        )

    def write_bucket(t: pa.Table) -> pa.Table:
        bkt = int(t["_b"][0].as_py())
        # Re-aggregate at the bucket level (like the boolean index's
        # writer): duplicate doc_id input rows otherwise land as
        # duplicate (term, doc) postings — df over-counts and the
        # scorer's pivot keeps only the last tf. Grouping on dl too
        # means duplicates with IDENTICAL text fold exactly; rows that
        # reuse an id with DIFFERENT text still violate the documented
        # unique-id precondition (dl differs, postings stay split).
        body = (
            t.drop(["_b"])
            .group_by(["term", "doc_id", "dl"])
            .aggregate([("tf", "sum")])
            .rename_columns(["term", "doc_id", "dl", "tf"])
            .sort_by([("term", "ascending"), ("doc_id", "ascending")])
        )
        name = f"rpost_{bkt:05d}.parquet"
        tmp = os.path.join(out_dir, f".{name}.tmp")
        pq.write_table(body, tmp)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table(
            {
                "bucket": pa.array([bkt], pa.int64()),
                "file": pa.array([name]),
                "rows": pa.array([body.num_rows], pa.int64()),
            }
        )

    written = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(write_bucket, batch_format="pyarrow")
    ).to_pandas()

    def stats(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        words = pc.split_pattern_regex(
            pc.utf8_lower(col.fill_null("")), WORD_SPLIT_RE
        )
        flat = words.flatten()
        ne = int(
            pc.sum(
                pc.cast(pc.not_equal(flat, "").fill_null(False), pa.int64())
            ).as_py()
            or 0
        )
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "dls": pa.array([ne], pa.int64()),
            }
        )

    sdf = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    meta = {
        "n_buckets": n_buckets,
        "id_col": id_col,
        # an empty corpus yields zero batches -> a column-less frame
        "n_docs": int(sdf["n"].sum()) if "n" in sdf.columns else 0,
        "dl_sum": int(sdf["dls"].sum()) if "dls" in sdf.columns else 0,
        "files": {
            int(r.bucket): {"file": r.file, "rows": int(r.rows)}
            for r in written.itertuples()
        },
    }
    tmp = os.path.join(out_dir, f".{RANKMAP_NAME}.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, RANKMAP_NAME))
    return meta


def postings_bm25(
    index_dir: str,
    terms: list[str],
    k: int = 25,
    k1: float = 1.2,
    b: float = 0.75,
    driver_match_limit: int = 5_000_000,
) -> tuple[Dataset, dict]:
    """BM25 top-k THROUGH the ranked postings index: open only the
    query terms' buckets, take their (doc, tf, dl) postings, score
    with the exact full-scan expression tree (fixed term order,
    left-associated sum; zero-tf terms contribute exactly 0.0, so
    skipping them is bitwise-identical) and keep the top k by
    (score desc, doc_id). df per term is exact (postings are distinct
    per (term, doc)). Matched postings pivot on the driver under
    ``driver_match_limit``; above it they hash-bucket by doc (a doc's
    postings co-locate -> identical fixed-order sum) and a local
    top-k merge finishes. Returns ((doc_id, dl, score) Dataset, stats).
    """
    import pandas as pd
    import ray.data as rd

    from .factory import strip_pandas_metadata

    uniq = sorted(set(terms))
    if not uniq:
        raise ValueError("postings_bm25: no terms")
    with open(os.path.join(index_dir, RANKMAP_NAME)) as f:
        meta = json.load(f)
    id_col = meta["id_col"]
    n = float(meta["n_docs"])
    empty_stats = {"files_total": len(meta["files"]), "files_read": 0,
                   "terms": terms, "matched_docs": 0}
    if meta["n_docs"] == 0:  # index built over an empty corpus
        return rd.from_arrow(
            pa.schema(
                [(id_col, pa.int64()), ("dl", pa.int64()),
                 ("score", pa.float64())]
            ).empty_table()
        ), empty_stats
    avgdl = float(meta["dl_sum"]) / n
    nb = np.uint64(meta["n_buckets"])
    h = pd.util.hash_array(np.asarray(uniq, dtype=object))
    buckets = sorted({int(x % nb) for x in h})
    picked = [
        os.path.join(index_dir, meta["files"][str(bk)]["file"])
        for bk in buckets
        if str(bk) in meta["files"]
        and os.path.exists(
            os.path.join(index_dir, meta["files"][str(bk)]["file"])
        )
    ]
    # matched_docs: the index can only rank docs holding >=1 query-term
    # posting, while a full-scan oracle also ranks zero-score docs
    # (tie-broken by id) — the two silently diverge whenever matched
    # docs < k. Callers that compare against a full scan must check
    # matched_docs >= k (None on the distributed route, where counting
    # distinct docs would cost an extra pass).
    stats = {
        "files_total": len(meta["files"]),
        "files_read": len(picked),
        "terms": terms,
        "matched_docs": None,
    }
    empty = pa.schema(
        [(id_col, pa.int64()), ("dl", pa.int64()), ("score", pa.float64())]
    ).empty_table()
    if not picked:
        stats["matched_docs"] = 0
        return rd.from_arrow(empty), stats

    tset = pa.array(uniq, pa.string())
    matched = (
        rd.read_parquet(picked)
        .map_batches(strip_pandas_metadata, batch_format="pyarrow",
                     zero_copy_batch=True)
        .map_batches(
            lambda t: t.filter(pc.is_in(t["term"], value_set=tset)),
            batch_format="pyarrow",
        )
        .materialize()
    )

    # exact per-term df from the postings (distinct per (term, doc))
    def df_partial(t: pa.Table) -> pa.Table:
        g = t.select(["term"]).group_by("term").aggregate([([], "count_all")])
        return g.rename_columns(["term", "c"])

    dfp = matched.map_batches(df_partial, batch_format="pyarrow").to_pandas()
    df_map = dfp.groupby("term")["c"].sum().to_dict()
    idf = [
        (n - float(df_map.get(t, 0)) + 0.5) / (float(df_map.get(t, 0)) + 0.5)
        for t in terms
    ]

    def pivot_score(tbl: pa.Table) -> pa.Table:
        docs = np.asarray(tbl["doc_id"], np.int64)
        tfs = np.asarray(tbl["tf"], np.int64)
        dls = np.asarray(tbl["dl"], np.int64)
        tcodes = np.asarray(
            pc.index_in(tbl["term"], value_set=tset).fill_null(-1)
        )
        udocs, inv = np.unique(docs, return_inverse=True)
        dl_doc = np.zeros(len(udocs), np.int64)
        dl_doc[inv] = dls
        tf_mat = np.zeros((len(uniq), len(udocs)), np.float64)
        tf_mat[tcodes, inv] = tfs.astype(np.float64)
        dl = dl_doc.astype(np.float64)
        score = np.zeros(len(udocs), np.float64)
        upos = {t: i for i, t in enumerate(uniq)}
        # caller term order, left-associated — the oracle's tree
        for i, t in enumerate(terms):
            tfi = tf_mat[upos[t]]
            denom = tfi + k1 * (1.0 - b + b * (dl / avgdl))
            score = score + (idf[i] * (tfi * (k1 + 1.0))) / denom
        return pa.table(
            {
                id_col: pa.array(udocs),
                "dl": pa.array(dl_doc),
                "score": pa.array(score),
            }
        )

    if matched.count() <= driver_match_limit:
        tbl = pa.concat_tables(
            [
                t
                for t in __import__("ray").get(matched.to_arrow_refs())
                if t.num_columns and t.num_rows
            ]
            or [
                pa.schema(
                    [
                        ("term", pa.string()),
                        ("doc_id", pa.int64()),
                        ("dl", pa.int64()),
                        ("tf", pa.int64()),
                    ]
                ).empty_table()
            ]
        )
        if tbl.num_rows == 0:
            stats["matched_docs"] = 0
            return rd.from_arrow(empty), stats
        scored = pivot_score(tbl)
        stats["matched_docs"] = scored.num_rows
        order = np.lexsort(
            (
                np.asarray(scored[id_col], np.int64),
                -np.asarray(scored["score"], np.float64),
            )
        )[:k]
        return rd.from_arrow(scored.take(pa.array(order))), stats

    # distributed route: bucket by doc (a doc's postings co-locate)
    from ..stages.aggregate import top_k as _topk

    nbk = 4 * max(
        2, int(__import__("ray").cluster_resources().get("CPU", 4))
    )

    def tag(t: pa.Table) -> pa.Table:
        hb = (
            pd.util.hash_array(np.asarray(t["doc_id"], np.int64)) % nbk
        )
        return t.append_column("_hb", pa.array(hb.astype(np.int64)))

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        tbl = pa.Table.from_pandas(
            pdf.drop(columns=["_hb"]), preserve_index=False
        )
        return pivot_score(tbl).to_pandas()

    scored = (
        matched.map_batches(tag, batch_format="pyarrow")
        .groupby("_hb")
        .map_groups(fold, batch_format="pandas")
    )
    return (
        _topk(scored, [("score", "descending"), (id_col, "ascending")], k),
        stats,
    )
