"""Engine configuration defaults with environment overrides.

Parity with the reference's config module
(/root/reference/config/default.js): defaults overridable via
environment variables (LOGPIPE_* here, like LOG_LEVEL/HTTP_* there).
"""

from __future__ import annotations

import os


def _env(name: str, default, cast=None):
    raw = os.environ.get(name)
    if raw is None:
        return default
    return (cast or type(default))(raw)


def get_config() -> dict:
    return {
        "processing": {
            "batch_size": _env("LOGPIPE_BATCH_SIZE", 8192),
            "checkpoint_groups": _env("LOGPIPE_CHECKPOINT_GROUPS", 4),
            "enrich_mode": _env("LOGPIPE_ENRICH_MODE", "task"),
            "enrich_concurrency": _env("LOGPIPE_ENRICH_CONCURRENCY", 8),
        },
        "logger": {
            "level": _env("LOG_LEVEL", "info"),
        },
        "http": {
            "endpoint": _env("HTTP_ENDPOINT", "http://localhost:3000/logs"),
            "timeout": _env("HTTP_TIMEOUT", 30.0),
            "retries": _env("HTTP_RETRIES", 3),
            "batch_size": _env("LOGPIPE_HTTP_BATCH", 100),
        },
    }
