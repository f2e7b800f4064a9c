from .factory import create_sink  # noqa: F401
from .http_sink import HttpSink, http_send  # noqa: F401
