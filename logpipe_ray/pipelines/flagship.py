"""The flagship pipeline: parse -> enrich -> route -> sinks + counts.

Ray-Data-native restatement of the reference's end-to-end lifecycle
(SURVEY.md §3.4). Two execution modes:

**fused (default, production/bench path)** — one fully-fused task per
input shard: the task reads its Parquet shard directly (column-pruned,
page-cache friendly), runs parse -> enrich -> route in-process, writes
its own sink-partitioned output files, and returns ONLY a tiny
per-(source, sink) counts table. Ray Data orchestrates scheduling /
backpressure over the shard list; the only data crossing the object
store is counts rows (bounded by #sinks x #shards — independent of row
count). This is the shape a 100 TB run wants: zero all-to-all traffic,
per-shard lineage for free, and each output partition maps 1:1 to an
input shard so a resumed run skips finished shards at the file level.

**dataset mode** — the composable ray.data plan
(read_parquet -> map_batches[parse] -> map_batches[enrich] ->
map_batches[route]) used by the query layer and anywhere a downstream
Dataset is needed (build_pipeline).

The final counts aggregation in both modes is a groupby over per-batch
partials (see stages/aggregate.py) — the one shuffle, over tiny data.

Partitioning assumption (documented per SURVEY.md): input shards are
the unit of parallelism, lineage and resume; they are
hash-disjoint by doc_id by construction (the fixture generator
partitions round-robin; any disjoint sharding works). Skewed `source`
values cost nothing here because routing is a tagged write, not a
shuffle, and the counts shuffle moves only partial sums.
"""

from __future__ import annotations

import glob
import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd
from ray.data import Dataset

from ..sources.factory import read_parquet_clean
from ..stages.aggregate import count_groupby
from ..stages.enrich import EnrichStage, enrich_batch
from ..stages.parse import parse_batch
from ..stages.route import route_batch
from ..state.manifest import Manifest


def build_pipeline(
    ds: Dataset,
    enrich_tables_ref=None,
    enrich_concurrency: int | tuple[int, int] = (2, 8),
    batch_size: int | None = None,
    enrich_mode: str = "task",
) -> Dataset:
    """Attach parse -> enrich -> route to a sequences Dataset.

    enrich_mode="task" (default): enrichment runs as stateless tasks
    with per-process cached lookup state — all three stages fuse into
    one task chain on the shared worker pool. enrich_mode="actor": the
    EnrichStage actor pool (SURVEY.md §2.3 T9) — right when the state
    is heavyweight (models, big dicts). batch_size=None processes
    whole blocks (best fusion/throughput).
    """
    ds = ds.map_batches(
        parse_batch, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    if enrich_mode == "actor":
        ds = ds.map_batches(
            EnrichStage,
            fn_constructor_kwargs={"tables_ref": enrich_tables_ref},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=enrich_concurrency,
            zero_copy_batch=True,
        )
    else:
        ds = ds.map_batches(
            enrich_batch, batch_format="pyarrow", batch_size=batch_size,
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


PARSE_CHUNK_ROWS = 8192


def routed_chunks(shard_tbl: pa.Table, chunk_rows: int = PARSE_CHUNK_ROWS):
    """Yield parse->enrich->route output for ``shard_tbl`` in bounded
    row slices. Chunking caps the per-task transient working set (the
    regex extraction allocates ~16 string columns per pass) — it
    measurably improves 32-worker throughput on this VM (page-fault
    pressure) and keeps arbitrary-size shards from spiking worker
    heaps at 100 TB. Shared by the fused flagship shard task and the
    fused aggregate-query path (queries._routed_partials). A zero-row
    shard still yields one (empty, schema-typed) chunk."""
    from ..stages.enrich import enrich_batch
    from ..stages.parse import parse_batch
    from ..stages.route import route_batch

    for off in range(0, max(shard_tbl.num_rows, 1), chunk_rows):
        yield route_batch(
            enrich_batch(parse_batch(shard_tbl.slice(off, chunk_rows)))
        )


_PROC_HTTP_SINKS: dict = {}


def _http_sender_for(endpoint: str):
    """Per-process cached HttpSink (persistent batching/retry state —
    the task-pool analog of the reference's persistent HttpSender)."""
    sender = _PROC_HTTP_SINKS.get(endpoint)
    if sender is None:
        from ..sinks.http_sink import HttpSink

        sender = _PROC_HTTP_SINKS[endpoint] = HttpSink(endpoint)
    return sender


def _process_shard_fused(batch: pa.Table) -> pa.Table:
    """The fused per-shard task body (read -> parse -> enrich -> route
    -> write -> partial counts). Input batch: one row per shard with
    (shard, path, out); out == "" means null sink (benchmark mode, the
    analog of the reference's null sender, senderFactory.js:78-91).

    Output rows: (shard, source, sink, cnt, shard_rows, shard_wall_s)
    — the counts double as per-shard lineage metrics (rows + wall time
    per input shard land in the manifest).

    Heterogeneous sinks: entries in the (broadcast) ``http_sinks``
    column map a sink name to an HTTP endpoint — those sinks POST
    JSON batches (reference HttpSender semantics) instead of writing
    parquet. ``sink_projections`` maps a sink name to the column
    subset it keeps (e.g. a lean dead-letter sink)."""
    import json as _json

    http_sinks = {}
    if "http_sinks" in batch.column_names:
        raw = batch["http_sinks"][0].as_py()
        http_sinks = _json.loads(raw) if raw else {}
    projections = {}
    if "sink_projections" in batch.column_names:
        raw = batch["sink_projections"][0].as_py()
        projections = _json.loads(raw) if raw else {}
    marker_dir = ""
    if "marker_dir" in batch.column_names:
        marker_dir = batch["marker_dir"][0].as_py() or ""
    parts = []
    for shard, path, out in zip(
        batch["shard"].to_pylist(),
        batch["path"].to_pylist(),
        batch["out"].to_pylist(),
    ):
        t0 = time.time()
        shard_tbl = pq.read_table(path)
        n_rows = shard_tbl.num_rows
        # bounded-chunk parse (see routed_chunks). Sink writes still
        # need the whole routed shard, so chunks are only retained
        # when writing.
        chunk_counts = []
        retained = []
        for r in routed_chunks(shard_tbl):
            chunk_counts.append(pa.table({"source": r["source"], "sink": r["sink"]}))
            if out:
                retained.append(r)
        if out:
            t = retained[0] if len(retained) == 1 else pa.concat_tables(retained)
            os.makedirs(out, exist_ok=True)
            for s in pc.unique(t["sink"]).to_pylist():
                sub = t.filter(pc.equal(t["sink"], s)).drop(["sink"])
                if s in projections:
                    sub = sub.select(
                        [c for c in projections[s] if c in sub.column_names]
                    )
                if s in http_sinks:
                    # full records incl. token arrays — the receiver can
                    # verify token-array equality end to end.
                    # Effectively-once under resume: a per-(shard, sink)
                    # marker commits the POST, so a crashed group's
                    # re-run skips shards already sent (the remaining
                    # at-least-once window is a crash BETWEEN the POST
                    # and its marker write — one shard, not one group).
                    marker = None
                    if marker_dir:
                        import hashlib as _hashlib

                        mdir = os.path.join(marker_dir, f"sink={s}")
                        os.makedirs(mdir, exist_ok=True)
                        marker = os.path.join(
                            mdir,
                            _hashlib.sha1(path.encode()).hexdigest() + ".sent",
                        )
                        if os.path.exists(marker):
                            continue
                    _http_sender_for(http_sinks[s])(sub)
                    if marker:
                        tmp = marker + ".tmp"
                        with open(tmp, "w") as fh:
                            fh.write(path + "\n")
                        os.replace(tmp, marker)
                    continue
                sink_dir = os.path.join(out, f"sink={s}")
                os.makedirs(sink_dir, exist_ok=True)
                pq.write_table(sub, os.path.join(sink_dir, "part.parquet"))
        g = (
            pa.concat_tables(chunk_counts)
            .group_by(["source", "sink"])
            .aggregate([([], "count_all")])
            .rename_columns(["source", "sink", "cnt"])
        )
        wall = time.time() - t0
        n = len(g)
        g = g.append_column("shard", pa.array([shard] * n, pa.string()))
        g = g.append_column("shard_rows", pa.array([n_rows] * n, pa.int64()))
        g = g.append_column("shard_wall_s", pa.array([round(wall, 4)] * n, pa.float64()))
        parts.append(g)
    return pa.concat_tables(parts)


def run_flagship(
    input_dir: str,
    out_dir: str,
    *,
    checkpoint_groups: int = 4,
    resume: bool = True,
    write_sinks: bool = True,
    http_sinks: dict[str, str] | None = None,
    sink_projections: dict[str, list[str]] | None = None,
    mode: str = "fused",
    enrich_mode: str = "task",
    batch_size: int | None = None,
    fail_after_groups: int | None = None,
    progress: bool = False,
    progress_interval: float = 5.0,
    install_signal_handler: bool = False,
) -> dict:
    """Run the flagship pipeline with per-partition lineage + resume.

    Input shard files are split into ``checkpoint_groups`` groups; each
    group is one streaming job whose completion is committed atomically
    to the manifest. A killed run resumes at group granularity: the
    finished groups' input files are pruned from the read entirely
    (file-level skip — no re-scan of completed work).

    ``write_sinks=False`` runs the null-sink benchmark variant.
    ``http_sinks`` / ``sink_projections`` configure heterogeneous sink
    types and per-sink column subsets (fused mode only; HTTP egress is
    at-least-once under resume — receivers dedupe by doc_id).
    ``fail_after_groups`` injects a crash after N groups (tests only).
    """
    files = input_shards(input_dir)
    data_dir = os.path.join(out_dir, "data")
    if not resume:
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
    manifest = Manifest(out_dir)
    manifest.clean_incomplete_outputs(data_dir)

    # Resume is FILE-based, not group-index-based: the unit of lineage
    # is the input shard, so a rerun with a different checkpoint_groups
    # value — or with new shards landed in the input dir — still
    # processes exactly the not-yet-completed files (nothing dropped,
    # nothing double-processed).
    done_files = {
        f for e in manifest.groups.values() for f in e.get("input_files", [])
    }
    pending = [f for f in files if f not in done_files]
    k = max(1, min(checkpoint_groups, max(len(pending), 1)))
    groups = [g for g in (pending[i::k] for i in range(k)) if g]
    next_gid = len(manifest.groups)
    done = 0
    tracker = None
    if progress:
        from ..utils.progress import ProgressTracker

        total = sum(pq.read_metadata(f).num_rows for f in pending)
        tracker = ProgressTracker(total=total, interval=progress_interval)

    # Graceful interrupt (reference checkpointManager.js:94-105 saves
    # state on SIGINT/SIGTERM): the flag is checked between group
    # commits, so the in-flight group finishes, its manifest commit is
    # atomic, and the run returns an 'interrupted' summary a later run
    # resumes from — no partial state is ever recorded.
    interrupted = {"flag": False}
    prev_handlers = {}
    if install_signal_handler:
        import signal as _signal

        def _on_signal(signum, frame):  # noqa: ARG001
            interrupted["flag"] = True

        for sig in (_signal.SIGINT, _signal.SIGTERM):
            prev_handlers[sig] = _signal.signal(sig, _on_signal)
    for gi, group_files in enumerate(groups):
        gid = f"g{next_gid + gi:04d}"
        if fail_after_groups is not None and done >= fail_after_groups:
            raise RuntimeError(f"injected failure before group {gid}")
        t0 = time.time()
        group_out = os.path.join(data_dir, f"group={gid}")

        shard_metrics = None
        if mode == "fused":
            import json as _json

            http_json = _json.dumps(http_sinks) if http_sinks else ""
            http_marker_dir = (
                os.path.join(out_dir, "http_markers") if http_sinks else ""
            )
            proj_json = _json.dumps(sink_projections) if sink_projections else ""
            items = [
                {
                    "shard": f"shard={i:04d}",
                    "path": p,
                    "out": os.path.join(group_out, f"shard={i:04d}") if write_sinks else "",
                    "http_sinks": http_json,
                    "sink_projections": proj_json,
                    "marker_dir": http_marker_dir,
                }
                for i, p in enumerate(group_files)
            ]
            # task granularity: default one task per shard (finest
            # lineage metrics / streaming progress). LOGPIPE_TASKS_PER_CPU=k
            # coarsens to ~k tasks per CPU (the fused fn already loops
            # over its batch's shards), cutting scheduling + per-task
            # first-touch allocation overhead when shards are small
            # relative to the task fixed cost.
            n_blocks = len(items)
            tpc = int(os.environ.get("LOGPIPE_TASKS_PER_CPU", "0"))
            if tpc > 0:
                import ray as _ray

                avail = int(_ray.cluster_resources().get("CPU", 1) or 1)
                n_blocks = max(1, min(len(items), avail * tpc))
            shard_ds = rd.from_items(items, override_num_blocks=n_blocks)
            partials = shard_ds.map_batches(
                _process_shard_fused, batch_format="pyarrow", batch_size=None
            )
            if tracker is None:
                partials_df = partials.to_pandas()
            else:
                # stream shard partials back as each task completes so
                # the tracker reports live (reference 5-s cadence)
                chunks = []
                for b in partials.iter_batches(
                    batch_size=None, batch_format="pyarrow"
                ):
                    if b.num_rows:
                        g = b.group_by("shard").aggregate(
                            [("shard_rows", "max")]
                        )
                        tracker.add(
                            int(pc.sum(g["shard_rows_max"]).as_py() or 0)
                        )
                        chunks.append(b)
                # zero-partial fallback keeps the partials schema so the
                # groupby(['source','sink']) below can't KeyError
                _empty = pa.table(
                    {
                        "source": pa.array([], pa.string()),
                        "sink": pa.array([], pa.string()),
                        "cnt": pa.array([], pa.int64()),
                        "shard": pa.array([], pa.string()),
                        "shard_rows": pa.array([], pa.int64()),
                        "shard_wall_s": pa.array([], pa.float64()),
                    }
                )
                partials_df = (
                    pa.concat_tables(chunks) if chunks else _empty
                ).to_pandas()
            counts_tbl = (
                partials_df.groupby(["source", "sink"], as_index=False)["cnt"]
                .sum()
                .sort_values(["source", "sink"])
            )
            shard_metrics = (
                partials_df.groupby("shard")
                .agg(rows=("shard_rows", "first"), wall_s=("shard_wall_s", "first"))
                .reset_index()
                .to_dict("records")
            )
        else:
            ds = read_parquet_clean(group_files)
            routed = build_pipeline(ds, batch_size=batch_size, enrich_mode=enrich_mode)
            if write_sinks:
                routed.write_parquet(group_out, partition_cols=["sink"])
                consumed = read_parquet_clean(group_out, columns=["source", "sink"])
            else:
                consumed = routed
            counts_tbl = (
                count_groupby(consumed, ["source", "sink"], alias="cnt")
                .to_pandas()
                .sort_values(["source", "sink"])
            )

        wall = time.time() - t0
        rows_in = sum(pq.read_metadata(f).num_rows for f in group_files)
        if tracker is not None and mode != "fused":
            tracker.add(rows_in)  # fused mode feeds per shard, live
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
                "output_dir": group_out if write_sinks else None,
                "mode": mode,
                "shard_metrics": shard_metrics,
            },
        )
        done += 1
        if interrupted["flag"]:
            break

    if install_signal_handler:
        import signal as _signal

        for sig, h in prev_handlers.items():
            _signal.signal(sig, h)
    if tracker is not None:
        tracker.finish()
    totals = manifest.total_counts()
    out = {
        "out_dir": out_dir,
        "groups": len(manifest.completed_ids()),
        "rows_in": sum(e["rows_in"] for e in manifest.groups.values()),
        "rows_out": sum(e["rows_out"] for e in manifest.groups.values()),
        "sink_counts": {f"{s}/{k}": v for (s, k), v in sorted(totals.items())},
    }
    if interrupted["flag"]:
        out["interrupted"] = True
    return out
