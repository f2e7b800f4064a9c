"""Data-layout management: cluster-by-key writes + zone-map pruned reads.

Zone maps (per-file min/max of a clustering column) only pay off when
the data is clustered, so the two halves ship together:

* ``cluster_write`` range-partitions a Dataset by a column — bounds
  come from EXACT distributed quantile selection (`exact_rank_value`),
  so file sizes are balanced whatever the distribution — and writes
  one parquet per range (tmp+rename atomic) plus a ``zonemap.json``
  sidecar recording each file's true [min, max].
* ``pruned_read`` consults the sidecar and reads ONLY the files whose
  range overlaps the predicate, then applies the exact predicate via
  the parquet fragment scanner (``filter=``) — at 100 TB a selective
  range query touches a handful of files, not the lake.

The reference engine has no layout management (it streams whatever
file it is given); this is the Ray-native lakehouse-style layer a
100 TB corpus needs (SURVEY §2.6 scale surface).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ray.data import Dataset

ZONEMAP_NAME = "zonemap.json"


def cluster_write(
    ds: Dataset,
    col: str,
    out_dir: str,
    n_ranges: int = 8,
    bounds: list | None = None,
) -> dict:
    """Range-partition ``ds`` by ``col`` into ``n_ranges`` files under
    ``out_dir``. Rows with ``col`` null are dropped (they cannot be
    zone-mapped). Returns the zone map {filename: [lo, hi, rows]}.

    Bounds default to the EXACT (i * n / n_ranges)-th ranked values
    (distributed selection, no sort), so each range holds ~n/n_ranges
    rows even on skewed data. Range i is [b_{i-1}, b_i) with the last
    range closed above; ties at a bound all land in one range (the
    zone map records TRUE per-file min/max, so pruning stays exact
    whatever the tie layout).

    Files are written tmp+rename atomic, one parquet per range, and
    the sidecar is written last — a crashed run leaves no sidecar and
    is simply rebuilt.
    """
    from ..stages.aggregate import exact_rank_value

    base = ds.map_batches(
        lambda t, c=col: t.filter(pc.is_valid(t[c])), batch_format="pyarrow"
    )
    if bounds is None:
        # single-column projection materialized once: each bound is
        # 2-4 selection passes over it, and re-executing a lazy input
        # n_ranges x passes times would re-read the lake
        sel = base.select_columns([col]).materialize()
        n = sel.count()
        if n == 0:
            raise ValueError("cluster_write: empty input")
        ranks = sorted(
            {min(n - 1, (i * n) // n_ranges) for i in range(1, n_ranges)}
        )
        bounds = [exact_rank_value(sel, col, r) for r in ranks]
        # dedupe equal bounds (heavy ties can collapse ranges)
        bounds = sorted(set(bounds))
    nb = len(bounds)

    os.makedirs(out_dir, exist_ok=True)

    def assign(t: pa.Table) -> pa.Table:
        import numpy as np

        v = t[col].to_numpy(zero_copy_only=False)
        rid = np.searchsorted(np.asarray(bounds), v, side="right")
        return t.append_column("_range", pa.array(rid, pa.int64()))

    assigned = base.map_batches(assign, batch_format="pyarrow")

    # one keyed exchange co-locates each range, then one task per
    # range writes its file and returns the zone-map row
    def write_range(t: pa.Table) -> pa.Table:
        rid = int(t["_range"][0].as_py())
        body = t.drop(["_range"]).sort_by(col)
        name = f"range_{rid:05d}.parquet"
        tmp = os.path.join(out_dir, f".{name}.tmp")
        pq.write_table(body, tmp)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table(
            {
                "file": pa.array([name]),
                "lo": pa.array([body[col][0].as_py()]),
                "hi": pa.array([body[col][body.num_rows - 1].as_py()]),
                "rows": pa.array([body.num_rows], pa.int64()),
            }
        )

    zones = (
        assigned.groupby("_range")
        .map_groups(write_range, batch_format="pyarrow")
        .to_pandas()
    )
    # itertuples yields numpy scalars; np.int64 is NOT json-serializable
    # (np.float64 only works by accident of subclassing float), so
    # unwrap to Python scalars before json.dump
    def _py(v):
        return v.item() if hasattr(v, "item") else v

    zonemap = {
        r.file: [_py(r.lo), _py(r.hi), int(r.rows)] for r in zones.itertuples()
    }
    tmp = os.path.join(out_dir, f".{ZONEMAP_NAME}.tmp")
    with open(tmp, "w") as f:
        json.dump({"col": col, "bounds": list(bounds), "zones": zonemap}, f)
    os.replace(tmp, os.path.join(out_dir, ZONEMAP_NAME))
    return zonemap


def pruned_read(
    out_dir: str,
    lo=None,
    hi=None,
    columns: list[str] | None = None,
) -> tuple[Dataset, dict]:
    """Read only the files whose zone [min, max] overlaps [lo, hi]
    (either side None = unbounded), then apply the exact predicate in
    the fragment scanner. Returns (Dataset, stats) where stats records
    files_total / files_read — the pruning evidence.
    """
    import pyarrow.dataset as pds

    import ray.data as rd

    from .factory import strip_pandas_metadata

    with open(os.path.join(out_dir, ZONEMAP_NAME)) as f:
        meta = json.load(f)
    col = meta["col"]
    picked = []
    for name, (zlo, zhi, _rows) in meta["zones"].items():
        if lo is not None and zhi < lo:
            continue
        if hi is not None and zlo > hi:
            continue
        picked.append(os.path.join(out_dir, name))
    stats = {
        "files_total": len(meta["zones"]),
        "files_read": len(picked),
        "col": col,
    }
    if not picked:
        raise ValueError(
            f"pruned_read: no file overlaps [{lo}, {hi}] — empty result; "
            "handle upstream"
        )
    expr = None
    if lo is not None:
        expr = pds.field(col) >= lo
    if hi is not None:
        e2 = pds.field(col) <= hi
        expr = e2 if expr is None else (expr & e2)
    kw = {"filter": expr} if expr is not None else {}
    if columns is not None:
        kw["columns"] = columns
    ds = rd.read_parquet(picked, **kw).map_batches(
        strip_pandas_metadata, batch_format="pyarrow", zero_copy_batch=True
    )
    return ds, stats


BLOOMMAP_NAME = "bloommap.json"


def _bloom_positions(h: "np.ndarray", m_bits: int, k: int):
    """Double-hashing bit positions for 64-bit key hashes: the i-th
    probe is (h1 + i*h2) % m with h1/h2 carved from one deterministic
    64-bit hash (pd.util.hash_array — stable across processes)."""
    import numpy as np

    h1 = (h % np.uint64(m_bits)).astype(np.int64)
    h2 = ((h >> np.uint64(32)) | np.uint64(1)).astype(np.int64) % m_bits
    return [(h1 + i * h2) % m_bits for i in range(k)]


def bloom_write(
    ds: Dataset,
    key: str,
    out_dir: str,
    n_files: int = 16,
    bits_per_key: int = 12,
    n_hashes: int = 7,
) -> dict:
    """Write ``ds`` as ``n_files`` parquet files (hash-placed by
    ``key``) plus a ``bloommap.json`` sidecar holding ONE Bloom filter
    per file over that file's key values. The point-lookup complement
    of ``cluster_write``'s zone maps: zone maps prune RANGE predicates
    on clustered layouts, Bloom filters prune EQUALITY predicates on
    ANY layout — the index records what each file actually contains,
    making no assumption about why a key landed where it did (arrival
    order, hash placement, compaction history all work alike).

    One keyed exchange co-locates each file's rows; each file task
    computes its filter from the distinct keys it just wrote (bits are
    base16-packed into the sidecar; ~1.5 bytes/distinct key at the
    default 12 bits). Written tmp+rename atomic, sidecar last."""
    import base64

    import numpy as np
    import pandas as pd

    base = ds.map_batches(
        lambda t, c=key: t.filter(pc.is_valid(t[c])), batch_format="pyarrow"
    )
    os.makedirs(out_dir, exist_ok=True)

    def assign(t: pa.Table) -> pa.Table:
        col = t[key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = pd.util.hash_array(col.to_numpy(zero_copy_only=False))
        fid = (h % np.uint64(n_files)).astype(np.int64)
        return t.append_column("_f", pa.array(fid))

    def write_file(t: pa.Table) -> pa.Table:
        fid = int(t["_f"][0].as_py())
        body = t.drop(["_f"])
        name = f"part_{fid:05d}.parquet"
        tmp = os.path.join(out_dir, f".{name}.tmp")
        pq.write_table(body, tmp)
        os.replace(tmp, os.path.join(out_dir, name))
        col = body[key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        uniq = np.unique(col.to_numpy(zero_copy_only=False))
        m_bits = max(64, int(len(uniq) * bits_per_key))
        bits = np.zeros((m_bits + 7) // 8, np.uint8)
        h = pd.util.hash_array(uniq)
        for pos in _bloom_positions(h, m_bits, n_hashes):
            np.bitwise_or.at(bits, pos // 8, np.uint8(1) << (pos % 8).astype(np.uint8))
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
    bloommap = {
        r.file: {"m_bits": int(r.m_bits), "rows": int(r.rows), "bits": r.bits}
        for r in blooms.itertuples()
    }
    tmp = os.path.join(out_dir, f".{BLOOMMAP_NAME}.tmp")
    with open(tmp, "w") as f:
        json.dump({"key": key, "n_hashes": n_hashes, "files": bloommap}, f)
    os.replace(tmp, os.path.join(out_dir, BLOOMMAP_NAME))
    return bloommap


def bloom_pruned_read(
    out_dir: str,
    key_values,
    columns: list[str] | None = None,
) -> tuple[Dataset, dict]:
    """Read only the files whose Bloom filter says at least one of
    ``key_values`` may be present (false positives read a file they
    didn't need; never the reverse), then apply the EXACT ``IN``
    predicate in the fragment scanner. Returns (Dataset, stats) with
    files_total / files_read as the pruning evidence."""
    import base64

    import numpy as np
    import pandas as pd
    import pyarrow.dataset as pds
    import ray.data as rd

    from .factory import strip_pandas_metadata

    with open(os.path.join(out_dir, BLOOMMAP_NAME)) as f:
        meta = json.load(f)
    key = meta["key"]
    k = meta["n_hashes"]
    vals = np.asarray(sorted(key_values))
    h = pd.util.hash_array(vals)
    picked = []
    for name, info in meta["files"].items():
        m_bits = info["m_bits"]
        bits = np.frombuffer(base64.b64decode(info["bits"]), np.uint8)
        hit = np.ones(len(vals), bool)
        for pos in _bloom_positions(h, m_bits, k):
            probe = (bits[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
            hit &= probe.astype(bool)
        if hit.any():
            picked.append(os.path.join(out_dir, name))
    stats = {
        "files_total": len(meta["files"]),
        "files_read": len(picked),
        "key": key,
    }
    if not picked:
        raise ValueError(
            f"bloom_pruned_read: no file may contain {list(key_values)!r}"
        )
    kw: dict = {"filter": pds.field(key).isin(list(key_values))}
    if columns is not None:
        kw["columns"] = columns
    ds = rd.read_parquet(picked, **kw).map_batches(
        strip_pandas_metadata, batch_format="pyarrow", zero_copy_batch=True
    )
    return ds, stats


ZORDERMAP_NAME = "zordermap.json"


def _interleave_bits8(bx, by):
    """Morton/Z-value from two 8-bit codes — x takes the odd bits."""
    import numpy as np

    z = np.zeros(len(bx), np.int64)
    for i in range(8):
        z |= ((bx >> i) & 1) << (2 * i + 1)
        z |= ((by >> i) & 1) << (2 * i)
    return z


def zorder_write(
    ds: Dataset,
    col_x: str,
    col_y: str,
    out_dir: str,
    n_files: int = 16,
) -> dict:
    """Z-ORDER (Morton-curve) multi-column clustering: bin both
    columns to 8-bit codes, interleave the bits, and range-partition
    by the z-value into ``n_files`` parquet files whose sidecar
    records each file's TRUE [min, max] box on BOTH columns — so a
    conjunctive 2-predicate scan prunes on both dimensions at once,
    which a single-column clustering cannot do (sorting by x makes
    every file span the full y range, and vice versa).

    Binning = per-column equi-width histograms (one combined pass
    after a min/max pass) read off at equi-depth ranks — approximate
    quantiles, which only affect file-size balance, never correctness
    (the sidecar stores true per-file boxes). File ranges come from an
    EXACT z-value histogram (the z domain is 2^16, so per-batch
    bincount partials merge into exact counts). Four scans total:
    stats, column histograms, z counts, assign+write; each is a
    2-column projection. Files are written tmp+rename atomic, sidecar
    last."""
    import numpy as np

    from ray.data.aggregate import Max as _Max, Min as _Min

    base = ds.map_batches(
        lambda t, a=col_x, b=col_y: t.filter(
            pc.and_(pc.is_valid(t[a]), pc.is_valid(t[b]))
        ),
        batch_format="pyarrow",
    )
    stats = base.aggregate(
        _Min(col_x, alias_name="xlo"),
        _Max(col_x, alias_name="xhi"),
        _Min(col_y, alias_name="ylo"),
        _Max(col_y, alias_name="yhi"),
    )
    spans = {
        col_x: (float(stats["xlo"]), float(stats["xhi"])),
        col_y: (float(stats["ylo"]), float(stats["yhi"])),
    }
    NB = 4096

    def widebin(t: pa.Table) -> pa.Table:
        out = []
        for ci, c in enumerate((col_x, col_y)):
            lo, hi = spans[c]
            w = max(hi - lo, 1e-300)
            v = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            b = np.clip(((v - lo) / w * NB).astype(np.int64), 0, NB - 1)
            cnt = np.bincount(b, minlength=NB)
            nz = np.flatnonzero(cnt)
            out.append(
                pa.table(
                    {
                        "ci": pa.array(np.full(len(nz), ci, np.int64)),
                        "b": pa.array(nz),
                        "c": pa.array(cnt[nz]),
                    }
                )
            )
        return pa.concat_tables(out)

    hist = (
        base.map_batches(widebin, batch_format="pyarrow").to_pandas()
    ).groupby(["ci", "b"])["c"].sum()

    edges = {}
    for ci, c in enumerate((col_x, col_y)):
        lo, hi = spans[c]
        w = max(hi - lo, 1e-300)
        cnt = np.zeros(NB, np.int64)
        sub = hist.loc[ci] if ci in hist.index.get_level_values(0) else None
        if sub is not None:
            cnt[sub.index.to_numpy()] = sub.to_numpy()
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        # 255 equi-depth cut bins -> 8-bit codes via searchsorted
        ranks = (np.arange(1, 256) * n) // 256
        cut_bins = np.searchsorted(cum, ranks, side="right")
        edges[c] = lo + (cut_bins + 1) * (w / NB)

    def zval(t: pa.Table) -> np.ndarray:
        bx = np.searchsorted(
            edges[col_x], t[col_x].to_numpy(zero_copy_only=False), side="right"
        )
        by = np.searchsorted(
            edges[col_y], t[col_y].to_numpy(zero_copy_only=False), side="right"
        )
        return _interleave_bits8(bx.astype(np.int64), by.astype(np.int64))

    def zcount(t: pa.Table) -> pa.Table:
        cnt = np.bincount(zval(t), minlength=65536)
        nz = np.flatnonzero(cnt)
        return pa.table({"z": pa.array(nz), "c": pa.array(cnt[nz])})

    zc = (
        base.map_batches(zcount, batch_format="pyarrow").to_pandas()
    ).groupby("z")["c"].sum()
    zcnt = np.zeros(65536, np.int64)
    zcnt[zc.index.to_numpy()] = zc.to_numpy()
    zcum = np.cumsum(zcnt)
    n = int(zcum[-1])
    if n == 0:
        raise ValueError("zorder_write: empty input")
    ranks = (np.arange(1, n_files) * n) // n_files
    zbounds = np.unique(np.searchsorted(zcum, ranks, side="right"))

    os.makedirs(out_dir, exist_ok=True)

    def assign(t: pa.Table) -> pa.Table:
        fid = np.searchsorted(zbounds, zval(t), side="right")
        return t.append_column("_zf", pa.array(fid.astype(np.int64)))

    def write_file(t: pa.Table) -> pa.Table:
        import numpy as _np

        fid = int(t["_zf"][0].as_py())
        body = t.drop(["_zf"])
        name = f"zpart_{fid:05d}.parquet"
        tmp = os.path.join(out_dir, f".{name}.tmp")
        pq.write_table(body, tmp)
        os.replace(tmp, os.path.join(out_dir, name))

        def mm(c):
            v = body[c].to_numpy(zero_copy_only=False)
            return [_np.min(v).item(), _np.max(v).item()]

        return pa.table(
            {
                "file": pa.array([name]),
                "xlo": pa.array([mm(col_x)[0]]),
                "xhi": pa.array([mm(col_x)[1]]),
                "ylo": pa.array([mm(col_y)[0]]),
                "yhi": pa.array([mm(col_y)[1]]),
                "rows": pa.array([body.num_rows], pa.int64()),
            }
        )

    zones = (
        base.map_batches(assign, batch_format="pyarrow")
        .groupby("_zf")
        .map_groups(write_file, batch_format="pyarrow")
        .to_pandas()
    )

    def _py(v):
        return v.item() if hasattr(v, "item") else v

    zmap = {
        r.file: {
            col_x: [_py(r.xlo), _py(r.xhi)],
            col_y: [_py(r.ylo), _py(r.yhi)],
            "rows": int(r.rows),
        }
        for r in zones.itertuples()
    }
    tmp = os.path.join(out_dir, f".{ZORDERMAP_NAME}.tmp")
    with open(tmp, "w") as f:
        json.dump({"cols": [col_x, col_y], "zones": zmap}, f)
    os.replace(tmp, os.path.join(out_dir, ZORDERMAP_NAME))
    return zmap


def zorder_pruned_read(
    out_dir: str,
    x_range: tuple | None = None,
    y_range: tuple | None = None,
    columns: list[str] | None = None,
) -> tuple[Dataset, dict]:
    """Read only the files whose TRUE (x, y) box overlaps the
    predicate box, then apply the exact conjunctive predicate in the
    fragment scanner. Returns (Dataset, stats) with files_total /
    files_read as the pruning evidence."""
    import pyarrow.dataset as pds
    import ray.data as rd

    from .factory import strip_pandas_metadata

    with open(os.path.join(out_dir, ZORDERMAP_NAME)) as f:
        meta = json.load(f)
    col_x, col_y = meta["cols"]

    def overlaps(box, rng):
        if rng is None:
            return True
        lo, hi = rng
        return not (hi is not None and box[0] > hi) and not (
            lo is not None and box[1] < lo
        )

    picked = [
        os.path.join(out_dir, name)
        for name, z in meta["zones"].items()
        if overlaps(z[col_x], x_range) and overlaps(z[col_y], y_range)
    ]
    stats = {
        "files_total": len(meta["zones"]),
        "files_read": len(picked),
        "cols": [col_x, col_y],
    }
    if not picked:
        raise ValueError(
            f"zorder_pruned_read: no file overlaps x={x_range} y={y_range}"
        )
    expr = None
    for c, rng in ((col_x, x_range), (col_y, y_range)):
        if rng is None:
            continue
        lo, hi = rng
        if lo is not None:
            e = pds.field(c) >= lo
            expr = e if expr is None else (expr & e)
        if hi is not None:
            e = pds.field(c) <= hi
            expr = e if expr is None else (expr & e)
    kw = {"filter": expr} if expr is not None else {}
    if columns is not None:
        kw["columns"] = columns
    ds = rd.read_parquet(picked, **kw).map_batches(
        strip_pandas_metadata, batch_format="pyarrow", zero_copy_batch=True
    )
    return ds, stats
