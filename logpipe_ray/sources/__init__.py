from .factory import (  # noqa: F401
    detect_format_from_filename,
    read_any,
    read_logs_csv,
    read_logs_ndjson,
)
