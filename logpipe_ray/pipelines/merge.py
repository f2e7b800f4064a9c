"""MERGE INTO / upsert snapshot maintenance.

The storage-side CDC primitive the reference's sink layer lacks: a
keyed base snapshot on disk is combined with a delta stream
latest-wins and atomically republished as the next snapshot version —
the "apply the day's changes to the dimension table" pipeline.

Scale shape: both sides stream through latest_by_key's two-level
argmax (no reducer ever holds a key's history); the output writes as
partitioned parquet into a temp directory that is atomically renamed
into place (the corpus/shards commit discipline), so a crashed merge
never corrupts the current snapshot.
"""

from __future__ import annotations

import os
import uuid

from ray.data import Dataset


def merge_into(
    base_dir: str | None,
    delta: Dataset,
    key: str,
    order_cols: list[str],
    out_dir: str,
) -> dict:
    """Produce snapshot v(n+1) = latest-wins(key) over base snapshot
    rows + delta rows, atomically published at ``out_dir``.

    ``base_dir`` None means an initial load (delta only). Returns
    {"rows": keys_in_snapshot, "out_dir": ...}. Order columns must
    make the per-key choice deterministic (unique last column)."""
    from ..sources.factory import read_parquet_clean
    from ..stages.aggregate import latest_by_key

    if base_dir is not None:
        base = read_parquet_clean(base_dir)
        combined = base.union(delta)
    else:
        combined = delta
    merged = latest_by_key(combined, key=key, order_cols=order_cols)

    tmp = f"{out_dir}.tmp-{uuid.uuid4().hex[:8]}"
    merged.write_parquet(tmp)
    # atomic publish: a crashed merge leaves only the tmp dir behind
    os.rename(tmp, out_dir)

    import pyarrow.parquet as pq

    n = pq.ParquetDataset(out_dir).read(columns=[key]).num_rows
    return {"rows": int(n), "out_dir": out_dir}
