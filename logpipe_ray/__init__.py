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


def _install_log_filters() -> None:
    """Suppress one known-benign Ray Data warning so real warnings stay
    visible: pandas-backed blocks (our map_groups reducers) carry a
    PandasBlockSchema that isn't hashable, making Ray's schema-dedup
    fast path log 'Failed to hash the schemas' per reduce task. The
    fallback path it takes is correct; the message is pure noise."""
    import logging

    class _DropSchemaHashNoise(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return "Failed to hash the schemas" not in record.getMessage()

    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).addFilter(_DropSchemaHashNoise())


_install_log_filters()
