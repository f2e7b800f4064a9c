"""Training-shard writer: pack tokenized sequences into fixed-length
contexts and write resumable, partitioned Parquet training shards.

The end product of the curation pipeline: one output shard per input
shard (the lineage/resume unit, same convention as the flagship
manifest), each written atomically (tmp + rename) with a sidecar
manifest entry so a killed run skips finished shards on rerun. At
100 TB this is the "never one giant file" requirement: the input
sharding IS the output partitioning, tasks are independent, and a
256-node cluster writes all shards concurrently with zero driver
traffic beyond the per-shard stats rows.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

MANIFEST_NAME = "_shards_manifest.json"


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST_NAME)


def _load_manifest(out_dir: str) -> dict:
    try:
        with open(_manifest_path(out_dir)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {}


def write_training_shards(
    seq_dir: str,
    out_dir: str,
    context_len: int = 1024,
    resume: bool = True,
) -> dict:
    """Pack every ``*.parquet`` sequence shard under ``seq_dir`` into
    ``context_len``-token contexts and write one ``packed_<name>``
    parquet per input shard under ``out_dir``.

    Deterministic: packing runs per input shard (read inside the
    task), so context boundaries are independent of CPU count / block
    splitting. Resumable: each task writes tmp + atomic rename and the
    driver commits a manifest entry per finished shard; rerun skips
    committed shards whose output file still exists.

    Returns summary stats {shards, contexts, fill_ratio_mean, skipped}.
    """
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(seq_dir, "*.parquet")))
    os.makedirs(out_dir, exist_ok=True)
    manifest = _load_manifest(out_dir) if resume else {}
    pending = []
    skipped = 0
    for path in files:
        key = os.path.basename(path)
        entry = manifest.get(key)
        if entry and os.path.exists(os.path.join(out_dir, entry["out"])):
            skipped += 1
            continue
        pending.append(path)

    stats_rows = []
    if pending:

        def task(batch: pa.Table) -> pa.Table:
            import pyarrow.parquet as pq

            from ..functions.tokens import pack_batch

            out = {"shard": [], "out": [], "contexts": [], "fill_sum": []}
            for path in batch["path"].to_pylist():
                t = pq.read_table(path, columns=["doc_id", "tokens"])
                packed = pack_batch(t, context_len=context_len)
                name = os.path.basename(path)
                out_name = f"packed_{name}"
                tmp = os.path.join(out_dir, f".{out_name}.tmp")
                pq.write_table(packed, tmp)
                os.replace(tmp, os.path.join(out_dir, out_name))
                out["shard"].append(name)
                out["out"].append(out_name)
                out["contexts"].append(packed.num_rows)
                import pyarrow.compute as pc

                fs = pc.sum(packed["fill_ratio"]).as_py() or 0.0
                out["fill_sum"].append(float(fs))
            return pa.table(out)

        items = rd.from_items(
            [{"path": p} for p in pending], override_num_blocks=len(pending)
        )
        stats = items.map_batches(
            task, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        stats_rows = stats.to_dict("records")
        for r in stats_rows:
            manifest[r["shard"]] = {"out": r["out"], "contexts": int(r["contexts"])}
        # atomic manifest commit (same tmp+rename convention as the
        # flagship lineage manifest)
        tmp = _manifest_path(out_dir) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=0, sort_keys=True)
        os.replace(tmp, _manifest_path(out_dir))

    contexts = sum(e["contexts"] for e in manifest.values())
    fill_sum = sum(r["fill_sum"] for r in stats_rows)
    new_contexts = sum(r["contexts"] for r in stats_rows)
    return {
        "shards": len(manifest),
        "skipped": skipped,
        "contexts": contexts,
        "fill_ratio_mean": (fill_sum / new_contexts) if new_contexts else None,
    }


def read_training_shards(out_dir: str) -> Dataset:
    """Read back the packed shards (excluding manifest/tmp files)."""
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(out_dir, "packed_*.parquet")))
    from ..sources.factory import read_parquet_clean

    return read_parquet_clean(files)
