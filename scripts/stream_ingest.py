"""Continuous micro-batch ingestion loop.

    python scripts/stream_ingest.py IN_DIR OUT_DIR [--interval 10] [--max-loops N]

Polls IN_DIR for newly landed parquet shards and runs the flagship
pipeline over just the new files each tick (file-based resume makes
the rerun incremental and idempotent). This is the batch engine's
answer to the reference's streaming tail — the micro-batch interval
plays the role of the Transform-stream backpressure window.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--interval", type=float, default=10.0)
    ap.add_argument("--max-loops", type=int, default=None)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from logpipe_ray.pipelines.flagship import input_shards, run_flagship
    from logpipe_ray.state.manifest import Manifest

    loops = 0
    try:
        while args.max_loops is None or loops < args.max_loops:
            manifest = Manifest(args.out_dir)
            done = {
                f for e in manifest.groups.values() for f in e.get("input_files", [])
            }
            try:
                pending = [f for f in input_shards(args.input_dir) if f not in done]
            except FileNotFoundError:
                pending = []
            if pending:
                t0 = time.time()
                summary = run_flagship(args.input_dir, args.out_dir, checkpoint_groups=1)
                print(json.dumps({
                    "tick": loops, "new_files": len(pending),
                    "rows_total": summary["rows_in"],
                    "wall_s": round(time.time() - t0, 2),
                }), flush=True)
            loops += 1
            if args.max_loops is None or loops < args.max_loops:
                time.sleep(args.interval)
    except KeyboardInterrupt:
        pass  # manifest is atomic; next start resumes cleanly
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
