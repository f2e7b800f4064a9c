"""Cluster job driver — the entrypoint ``ray job submit`` runs on a
real multi-node cluster (the north-rule deployment shape):

    ray job submit --working-dir /path/to/repo -- \\
        python scripts/submit_flagship.py INPUT_DIR OUTPUT_DIR \\
            --checkpoint-groups 256 --enrich-mode actor

Under the job server, ``RAY_ADDRESS`` points at the running cluster and
``ray.init`` attaches to it; standalone (this sandbox, CI) it falls
back to a local session. Either way the script owns the Ray session —
library code never calls ``ray.init()``.

Operational contract:
  * ``--checkpoint-groups`` is the resume granularity — one atomic
    manifest commit per group of input shards. Size it so a group is
    minutes of work (e.g. #nodes x 8) — a preempted/failed job
    resubmitted with the SAME output dir skips committed groups at
    file granularity (no re-scan).
  * The one JSON line on stdout is the job's result record (rows,
    wall, throughput, cluster size) — ``ray job logs`` / the driver's
    log collector can parse it directly.
  * Run the identical command on the N-node and 4N-node clusters to
    produce the two throughput points of the scaling criterion
    (in-sandbox evidence: ``python bench.py --scaling``, which runs
    the same job at two ``num_cpus`` levels in fresh pinned
    processes — see BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input_dir")
    p.add_argument("output_dir")
    p.add_argument("--checkpoint-groups", type=int, default=64)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--null-sink", action="store_true",
                   help="benchmark variant: skip sink writes")
    p.add_argument("--enrich-mode", choices=["task", "actor"], default="task")
    p.add_argument("--http-sinks", default=None,
                   help='JSON {"sink": "http://..."} for HTTP egress sinks')
    p.add_argument("--progress", action="store_true",
                   help="live rows/s + ETA to stderr every 5s")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS targets the cluster; the
        # "local" fallback keeps the script runnable standalone
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from logpipe_ray.pipelines.flagship import run_flagship

    t0 = time.time()
    summary = run_flagship(
        args.input_dir,
        args.output_dir,
        checkpoint_groups=args.checkpoint_groups,
        resume=not args.no_resume,
        write_sinks=not args.null_sink,
        http_sinks=json.loads(args.http_sinks) if args.http_sinks else None,
        enrich_mode=args.enrich_mode,
        progress=args.progress,
        install_signal_handler=True,
    )
    wall = time.time() - t0
    record = {
        "job": "flagship",
        "input_dir": args.input_dir,
        "output_dir": args.output_dir,
        "rows_in": summary.get("rows_in"),
        "rows_out": summary.get("rows_out"),
        "groups_committed": summary.get("groups"),
        "interrupted": summary.get("interrupted", False),
        "wall_sec": round(wall, 3),
        "sequences_per_sec": (
            round(summary["rows_in"] / wall, 1) if summary.get("rows_in") else None
        ),
        "cluster_cpus": ray.cluster_resources().get("CPU"),
        "cluster_nodes": len([n for n in ray.nodes() if n.get("Alive")]),
    }
    print(json.dumps(record))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
