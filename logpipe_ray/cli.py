r"""CLI — parity with the reference's bin/logpipe.js surface.

    python -m logpipe_ray run INPUT [options]       # transform chain
    python -m logpipe_ray flagship IN_DIR OUT_DIR   # full pipeline + manifest
    python -m logpipe_ray generate SF_DIR           # sequences fixture

Flag mapping (reference bin/logpipe.js:20-52):
  --filter field:value (repeatable, conjunction; value '~re' = regex,
                        '\~x' = literal value starting with '~')
  --select a,b,meta.env      field projection (dot-paths)
  --count-by KEY             per-key counts
  --stats KEY:VALUE          per-key numeric stats
  --hash-field F             iterated sha256 (intended T11 semantics)
  --enrich                   static metadata columns + lookup enrich
  --sink parquet|json|console|null|http, --out PATH, --endpoint URL
  --pretty                   pretty console output

The CLI owns its Ray session (guarded init; the driver-facing library
never calls ray.init). SIGINT during `flagship` leaves the atomic
manifest in place — rerunning the same command resumes (the working
version of the reference's interrupted-checkpoint flow, SURVEY.md §3.3).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)


def _parse_filters(vals: list[str]) -> dict:
    out = {}
    for v in vals:
        if ":" not in v:
            raise SystemExit(f"--filter expects field:value, got {v!r}")
        k, val = v.split(":", 1)
        out[k] = val
    return out


def cmd_run(args) -> int:
    _ray_init(args.num_cpus)
    from .api import Pipeline

    p = Pipeline.read(args.input, fmt=args.format)
    if args.parse_tokens:
        p = p.parse_tokens()
    if args.enrich:
        # --parallel: run enrichment on a dedicated actor pool (the
        # reference's worker-thread mode, bin/logpipe.js --parallel)
        mode = "actor" if args.parallel else "task"
        p = p.enrich(mode=mode, concurrency=(1, args.workers)).add_constants(
            {"processedBy": "logpipe-ray", "version": "1.0"}
        )
    if args.filter:
        p = p.filter(_parse_filters(args.filter))
    if args.select:
        p = p.select(args.select.split(","))
    if args.hash_field:
        p = p.hash_sha256(args.hash_field, iterations=args.hash_iterations)
    if args.count_by:
        p = p.count_by(args.count_by)
    if args.stats:
        key, value = args.stats.split(":", 1)
        p = p.stats(key, value)

    sink_opts: dict = {}
    if args.sink in ("parquet", "json"):
        if not args.out:
            raise SystemExit(f"--sink {args.sink} requires --out")
        sink_opts["path"] = args.out
    elif args.sink == "http":
        if not args.endpoint:
            raise SystemExit("--sink http requires --endpoint")
        sink_opts["endpoint"] = args.endpoint
    elif args.sink == "console":
        sink_opts["pretty"] = args.pretty
        sink_opts["limit"] = args.limit
    summary = p.sink(args.sink, **sink_opts)
    print(json.dumps(summary))
    return 0


def cmd_flagship(args) -> int:
    _ray_init(args.num_cpus)
    from .pipelines.flagship import run_flagship
    from .utils.profiler import Profiler

    if not args.no_progress:
        import logging as _logging

        plog = _logging.getLogger("logpipe_ray.utils.progress")
        handler = _logging.StreamHandler()
        handler.setFormatter(_logging.Formatter("[progress] %(message)s"))
        plog.addHandler(handler)
        plog.setLevel(_logging.INFO)

    prof = Profiler()
    with prof.mark("flagship"):
        summary = run_flagship(
            args.input_dir,
            args.out_dir,
            checkpoint_groups=args.checkpoint_groups,
            resume=not args.no_resume,
            write_sinks=not args.null_sink,
            progress=not args.no_progress,
            progress_interval=args.progress_interval,
            install_signal_handler=True,
        )
    if args.profile:
        rep = prof.write_report(args.profile)
        summary["profile"] = {k: rep[k] for k in ("wall_s", "cpu_s", "max_rss_mb")}
    print(json.dumps(summary, indent=2))
    return 0


def cmd_generate(args) -> int:
    from .fixtures.generator import ensure_sequences

    path = ensure_sequences(args.sf_dir, n_rows=args.rows, n_shards=args.shards,
                            label=args.label)
    print(path)
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="logpipe_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="read -> transform chain -> sink")
    r.add_argument("input")
    r.add_argument("--format", choices=["ndjson", "csv", "parquet"])
    r.add_argument("--parse-tokens", action="store_true",
                   help="input is the tokenized sequences table")
    r.add_argument("--filter", action="append", default=[])
    r.add_argument("--select")
    r.add_argument("--count-by", dest="count_by")
    r.add_argument("--stats")
    r.add_argument("--hash-field", dest="hash_field")
    r.add_argument("--hash-iterations", type=int, default=10_000)
    r.add_argument("--enrich", action="store_true")
    r.add_argument("--parallel", action="store_true",
                   help="stateful stages on a dedicated actor pool")
    r.add_argument("--workers", type=int, default=4,
                   help="actor pool size for --parallel")
    r.add_argument("--sink", default="console",
                   choices=["parquet", "json", "console", "null", "http"])
    r.add_argument("--out")
    r.add_argument("--endpoint")
    r.add_argument("--pretty", action="store_true")
    r.add_argument("--limit", type=int, default=20)
    r.add_argument("--num-cpus", type=int, default=None)
    r.set_defaults(fn=cmd_run)

    f = sub.add_parser("flagship", help="full parse->enrich->route->sinks run")
    f.add_argument("input_dir")
    f.add_argument("out_dir")
    f.add_argument("--checkpoint-groups", type=int, default=4)
    f.add_argument("--no-resume", action="store_true")
    f.add_argument("--null-sink", action="store_true")
    f.add_argument("--profile", help="write a profiler JSON report here")
    f.add_argument("--num-cpus", type=int, default=None)
    f.add_argument("--no-progress", action="store_true",
                   help="disable the live rows/s + ETA tracker")
    f.add_argument("--progress-interval", type=float, default=5.0,
                   help="progress report cadence in seconds (reference: 5 s)")
    f.set_defaults(fn=cmd_flagship)

    g = sub.add_parser("generate", help="materialize the sequences fixture")
    g.add_argument("sf_dir")
    g.add_argument("--rows", type=int)
    g.add_argument("--shards", type=int)
    g.add_argument("--label")
    g.set_defaults(fn=cmd_generate)

    args = ap.parse_args(argv)
    rc = args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
