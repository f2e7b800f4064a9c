from .flagship import build_pipeline, run_flagship  # noqa: F401
