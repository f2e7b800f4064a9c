"""End-to-end demo of the logpipe-ray engine.

    python examples/demo.py [sf_dir]

Runs: fixture generation -> flagship pipeline (with resume manifest)
-> declarative API queries -> training-data ops, printing results.
Owns its own Ray session (the library never calls ray.init).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from logpipe_ray.api import Pipeline
    from logpipe_ray.fixtures.generator import ensure_sequences
    from logpipe_ray.pipelines.flagship import run_flagship

    seq_dir = ensure_sequences(sf_dir)
    print(f"sequences fixture: {seq_dir}")

    out = "/tmp/logpipe_demo_out"
    shutil.rmtree(out, ignore_errors=True)
    summary = run_flagship(seq_dir, out, checkpoint_groups=2)
    print("flagship sink counts:")
    print(json.dumps(summary["sink_counts"], indent=2))

    errors = (
        Pipeline.read(seq_dir)
        .parse_tokens().enrich().route()
        .filter({"level": "ERROR", "message": "~timeout"})
        .select(["doc_id", "error_code", "message", "meta.env"])
        .to_pandas()
    )
    print(f"\nERROR+timeout rows: {len(errors)}")
    print(errors.head(3).to_string())

    stats = (
        Pipeline.read(seq_dir).parse_tokens()
        .stats("level", "response_time", prefix="rt").to_pandas()
    )
    print("\nper-level responseTime stats:")
    print(stats.to_string())

    from logpipe_ray.functions.tokens import pack_sequences
    import ray.data as rd

    packed = pack_sequences(
        rd.read_parquet(seq_dir, columns=["doc_id", "tokens"]), context_len=1024
    ).to_pandas()
    print(f"\npacked {packed['n_seqs'].sum()} sequences into {len(packed)} "
          f"contexts (mean fill {packed['fill_ratio'].mean():.2f})")

    ray.shutdown()


if __name__ == "__main__":
    main()
