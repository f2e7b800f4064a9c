"""logpipe_ray — a Ray-Data-native log/telemetry processing engine.

A from-scratch reimplementation of the capabilities of
vellascogabriel/logpipe (reference: /root/reference, a Node.js
Transform-stream engine) re-expressed as ray.data.Dataset pipelines of
vectorized Arrow batch transforms:

    read_parquet(sequences) -> map_batches[parse: detokenize + regex]
      -> map_batches[enrich: actor pool w/ lookup dicts]
      -> map_batches[route: predicate fan-out tag]
      -> per-sink partitioned parquet writes
      -> partial-agg + groupby counts per (source, sink)

Input table (see BASELINE.json input_hint):
    doc_id: string, tokens: list<int32>, n_tok: int32, source: string

Every stage preserves the ``tokens`` column untouched (token-array
equality invariant vs the reference).
"""

__version__ = "0.1.0"

TOKEN_OFFSET = 3  # tokens = utf-8 byte + 3; 0/1/2 reserved for PAD/BOS/EOS
