"""The flagship pipeline: parse -> enrich -> route -> sinks + counts.

Ray-Data-native restatement of the reference's end-to-end lifecycle
(SURVEY.md §3.4). One streaming pass:

    read_parquet(sequences shards)
      -> map_batches(parse_batch)            # stateless tasks, vectorized regex
      -> map_batches(EnrichStage, actors)    # lookup dicts loaded once/actor
      -> map_batches(route_batch)            # predicate fan-out tag
      -> write_parquet(partition_cols=[sink])# one pass, no per-sink rescans
    then per-(source, sink) counts from the written columnar output
    (column-pruned read of 2 columns — cheap), recorded in the lineage
    manifest.

Scale design: the only all-to-all exchange is the final counts
groupby, which runs over per-batch partial counts (bounded by
#keys x #batches, not row count). Routing is a tagged partitioned
write — never N per-sink scans. Resume is file-granular via the
manifest (no read amplification on restart).
"""

from __future__ import annotations

import glob
import os
import time

import pyarrow.parquet as pq

import ray.data as rd
from ray.data import Dataset

from ..stages.aggregate import count_groupby
from ..stages.enrich import EnrichStage
from ..stages.parse import parse_batch
from ..stages.route import route_batch
from ..state.manifest import Manifest


def build_pipeline(
    ds: Dataset,
    enrich_tables_ref=None,
    enrich_concurrency: int | tuple[int, int] = (2, 8),
    batch_size: int | None = 8192,
) -> Dataset:
    """Attach parse -> enrich -> route to a sequences Dataset."""
    ds = ds.map_batches(
        parse_batch, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    ds = ds.map_batches(
        EnrichStage,
        fn_constructor_kwargs={"tables_ref": enrich_tables_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=enrich_concurrency,
        zero_copy_batch=True,
    )
    ds = ds.map_batches(
        route_batch, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    return ds


def sink_counts(routed: Dataset) -> Dataset:
    """groupby(source, sink).count() with partial pre-aggregation."""
    return count_groupby(routed, ["source", "sink"], alias="cnt")


def input_shards(input_dir: str) -> list[str]:
    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet shards under {input_dir}")
    return files


def run_flagship(
    input_dir: str,
    out_dir: str,
    *,
    checkpoint_groups: int = 4,
    resume: bool = True,
    enrich_concurrency=(2, 8),
    batch_size: int | None = 8192,
    fail_after_groups: int | None = None,
) -> dict:
    """Run the flagship pipeline with per-partition lineage + resume.

    Input shard files are split into ``checkpoint_groups`` groups; each
    group is one streaming job whose completion is committed atomically
    to the manifest. A killed run resumes at group granularity: the
    finished groups' input files are pruned from the read entirely.

    ``fail_after_groups`` injects a crash after N groups (tests only).
    """
    files = input_shards(input_dir)
    data_dir = os.path.join(out_dir, "data")
    manifest = Manifest(out_dir)
    if not resume:
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
        manifest = Manifest(out_dir)
    manifest.clean_incomplete_outputs(data_dir)

    k = max(1, min(checkpoint_groups, len(files)))
    groups = [files[i::k] for i in range(k)]
    done = 0
    for gi, group_files in enumerate(groups):
        gid = f"g{gi:04d}"
        if gid in manifest.completed_ids():
            continue
        if fail_after_groups is not None and done >= fail_after_groups:
            raise RuntimeError(f"injected failure before group {gid}")
        t0 = time.time()
        ds = rd.read_parquet(group_files)
        routed = build_pipeline(
            ds, enrich_concurrency=enrich_concurrency, batch_size=batch_size
        )
        group_out = os.path.join(data_dir, f"group={gid}")
        routed.write_parquet(group_out, partition_cols=["sink"])
        # counts from the written sink output: column-pruned 2-col read
        written = rd.read_parquet(group_out, columns=["source", "sink"])
        counts_tbl = (
            count_groupby(written, ["source", "sink"], alias="cnt")
            .to_pandas()
            .sort_values(["source", "sink"])
        )
        wall = time.time() - t0
        rows_in = sum(pq.read_metadata(f).num_rows for f in group_files)
        rows_out = int(counts_tbl["cnt"].sum())
        manifest.add_group(
            gid,
            {
                "input_files": group_files,
                "rows_in": rows_in,
                "rows_out": rows_out,
                "sink_counts": counts_tbl.to_dict("records"),
                "wall_s": round(wall, 3),
                "rows_per_s": round(rows_in / wall, 1) if wall > 0 else None,
                "output_dir": group_out,
            },
        )
        done += 1

    totals = manifest.total_counts()
    return {
        "out_dir": out_dir,
        "groups": len(manifest.completed_ids()),
        "rows_in": sum(e["rows_in"] for e in manifest.groups.values()),
        "rows_out": sum(e["rows_out"] for e in manifest.groups.values()),
        "sink_counts": {f"{s}/{k}": v for (s, k), v in sorted(totals.items())},
    }
