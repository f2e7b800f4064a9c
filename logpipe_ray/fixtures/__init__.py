from .generator import ensure_sequences, generate_shard, sequences_dir_for, SEQUENCES_SCHEMA  # noqa: F401
