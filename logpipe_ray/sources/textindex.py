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
