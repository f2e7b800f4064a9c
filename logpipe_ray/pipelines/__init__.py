from .corpus import build_corpus, curate_documents  # noqa: F401
from .flagship import build_pipeline, run_flagship  # noqa: F401
from .shards import read_training_shards, write_training_shards  # noqa: F401
