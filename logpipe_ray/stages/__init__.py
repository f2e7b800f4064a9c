from .parse import parse_batch, PARSE_MASTER_PATTERN  # noqa: F401
from .enrich import EnrichStage, GEO_REGIONS, SEVERITY_MAP, ROUTE_MAP  # noqa: F401
from .route import route_batch, SINKS  # noqa: F401
