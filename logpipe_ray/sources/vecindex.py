"""Persisted IVF vector index — ANN search as a lake LAYOUT.

The in-memory IVF in ``functions/ann.py`` rebuilds its lists per
query; this module writes the inverted lists to disk once — one
parquet file per centroid list plus a ``ivfmap.json`` sidecar holding
the float32 centroids — so every later query routes through the
sidecar and opens ONLY the ``n_probe`` nearest lists (file-pruned
reads, same contract as the zone-map / Bloom / Z-order / trigram
layers: the index can only add files it didn't need, never wrong
rows, because scoring inside the surviving files is exact cosine).

At 100 TB this is the difference between an ANN query that scans the
lake and one that touches n_probe/n_lists of it; the recall/latency
dial is ``n_probe``, verified by the recall pytest.
"""

from __future__ import annotations

import base64
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ray.data import Dataset

IVFMAP_NAME = "ivfmap.json"


def ivf_index_write(
    ds: Dataset,
    id_col: str,
    vec_col: str,
    out_dir: str,
    n_lists: int = 16,
    iters: int = 4,
) -> dict:
    """Build deterministic k-means centroids (mergeable Lloyd partials,
    functions/ann.py build_ivf_centroids), assign every vector to its
    nearest list, and write one parquet per list + the centroids
    sidecar. One keyed exchange co-locates each list; tmp+rename
    atomic, sidecar last."""
    import ray

    from ..functions.ann import _vec_matrix, build_ivf_centroids

    cents = build_ivf_centroids(
        ds, n_centroids=n_lists, vec_col=vec_col, iters=iters, id_col=id_col
    ).astype(np.float32)
    c_ref = ray.put(cents.astype(np.float64))
    os.makedirs(out_dir, exist_ok=True)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        m = _vec_matrix(t[vec_col]).astype(np.float64)
        lid = np.argmin(
            ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2), axis=1
        )
        return t.append_column("_l", pa.array(lid.astype(np.int64)))

    def write_list(t: pa.Table) -> pa.Table:
        lid = int(t["_l"][0].as_py())
        body = t.drop(["_l"])
        name = f"list_{lid:05d}.parquet"
        tmp = os.path.join(out_dir, f".{name}.tmp")
        pq.write_table(body, tmp)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table(
            {
                "list_id": pa.array([lid], pa.int64()),
                "file": pa.array([name]),
                "rows": pa.array([body.num_rows], pa.int64()),
            }
        )

    lists = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("_l")
        .map_groups(write_list, batch_format="pyarrow")
    ).to_pandas()
    meta = {
        "id_col": id_col,
        "vec_col": vec_col,
        "dim": int(cents.shape[1]),
        "centroids": base64.b64encode(cents.tobytes()).decode(),
        "files": {
            int(r.list_id): {"file": r.file, "rows": int(r.rows)}
            for r in lists.itertuples()
        },
    }
    tmp = os.path.join(out_dir, f".{IVFMAP_NAME}.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, IVFMAP_NAME))
    return meta["files"]


def ivf_index_topk(
    out_dir: str,
    queries: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
):
    """Approximate cosine top-k through the persisted index: route each
    query to its ``n_probe`` nearest centroids via the sidecar, read
    ONLY the union of those list files, then run the exact distributed
    brute-force top-k (functions/ann.py) inside the survivors. Returns
    (DataFrame(query_id, rank, vec_id, cosine), stats)."""
    import ray.data as rd

    from ..functions.ann import brute_force_topk
    from .factory import strip_pandas_metadata

    with open(os.path.join(out_dir, IVFMAP_NAME)) as f:
        meta = json.load(f)
    dim = meta["dim"]
    cents = np.frombuffer(
        base64.b64decode(meta["centroids"]), np.float32
    ).reshape(-1, dim).astype(np.float64)
    q = np.asarray(queries, np.float64)
    d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probe = np.argsort(d2, axis=1)[:, :n_probe]
    wanted = sorted({int(x) for x in probe.ravel()})
    files = [
        os.path.join(out_dir, meta["files"][str(l)]["file"])
        for l in wanted
        if str(l) in meta["files"]
    ]
    stats = {
        "files_total": len(meta["files"]),
        "files_read": len(files),
        "n_probe": n_probe,
    }
    if not files:
        import pandas as pd

        return (
            pd.DataFrame(
                {"query_id": [], "rank": [], "vec_id": [], "cosine": []}
            ),
            stats,
        )
    ds = rd.read_parquet(files).map_batches(
        strip_pandas_metadata, batch_format="pyarrow", zero_copy_batch=True
    )
    out = brute_force_topk(
        ds, q, k=k, vec_col=meta["vec_col"], id_col=meta["id_col"]
    )
    return out, stats
