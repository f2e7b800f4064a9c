"""Sink registry / dispatch — parity with the reference sender factory
(SURVEY.md §2.5 K2-K5, /root/reference/src/senders/senderFactory.js:99-122).

create_sink(type, **options) -> callable(Dataset) -> summary dict.

  parquet : partitioned parquet write (the engine's primary sink)
  json    : NDJSON lines (the reference file sender K2 wrote
            stringified JSON lines; senderFactory.js:29-41)
  console : print rows to stdout (K3)
  null    : consume and count only (K4 — the benchmark sink)
  http    : batched JSON POST with retry/backoff (K1)
"""

from __future__ import annotations

from ray.data import Dataset


def _append_run_dir(path: str, append: bool) -> tuple[str, int | None]:
    """File-sender append parity (senderFactory.js:29-41 reopened the
    output file in 'a' mode): with ``append=True`` each run writes NEW
    files into a fresh ``run=NNNN`` subdirectory of ``path`` (monotonic
    run index = max existing + 1), and reading ``path`` back yields the
    UNION of all runs (ray.data readers list directories recursively,
    so base files from a prior non-append write are included too).
    With ``append=False`` (default) the target is REPLACED, matching
    the reference's 'w' mode, and files land directly under ``path``.
    Directory-of-runs instead of true file append keeps writes atomic,
    parallel and resumable at scale."""
    import os
    import re
    import shutil

    if not append:
        shutil.rmtree(path, ignore_errors=True)
        return path, None
    runs = [
        int(m.group(1))
        for e in (os.listdir(path) if os.path.isdir(path) else [])
        if (m := re.fullmatch(r"run=(\d+)", e))
    ]
    run = max(runs, default=-1) + 1
    return os.path.join(path, f"run={run:04d}"), run


def _parquet_sink(
    ds: Dataset, path: str, partition_cols=None, append: bool = False, **kw
) -> dict:
    run_dir, run = _append_run_dir(path, append)
    ds.write_parquet(run_dir, partition_cols=partition_cols, **kw)
    return {"sink": "parquet", "path": path, "run": run}


def _json_sink(ds: Dataset, path: str, append: bool = False, **kw) -> dict:
    run_dir, run = _append_run_dir(path, append)
    ds.write_json(run_dir, **kw)
    return {"sink": "json", "path": path, "run": run}


def _console_sink(ds: Dataset, limit: int = 20, pretty: bool = False, **kw) -> dict:
    import json

    rows = ds.take(limit)
    for r in rows:
        print(json.dumps(r, indent=2 if pretty else None, default=str))
    return {"sink": "console", "printed": len(rows)}


def _null_sink(ds: Dataset, **kw) -> dict:
    import pyarrow as pa

    def count_only(t: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    total = 0
    for b in ds.map_batches(count_only, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        total += int(b["n"].to_numpy().sum())
    return {"sink": "null", "records": total}


def _http_sink(ds: Dataset, endpoint: str, **kw) -> dict:
    from .http_sink import http_send

    return {"sink": "http", **http_send(ds, endpoint, **kw)}


_SINKS = {
    "parquet": _parquet_sink,
    "json": _json_sink,
    "console": _console_sink,
    "null": _null_sink,
    "http": _http_sink,
}


def create_sink(sink_type: str, **options):
    if sink_type not in _SINKS:
        raise ValueError(f"unknown sink type {sink_type!r}; one of {sorted(_SINKS)}")
    fn = _SINKS[sink_type]

    def run(ds: Dataset) -> dict:
        return fn(ds, **options)

    return run
