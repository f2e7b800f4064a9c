"""Driver contract for the graft builder (Ray Data target).

The driver calls ray.init() itself before importing this module:
nothing here (or in logpipe_ray) calls ray.init()/ray.shutdown().

- entry(): flagship parse->enrich->route->aggregate pipeline on
  /root/testdata/sf0.001 (sequences fixture generated deterministically
  on demand); returns the per-(source, sink) counts Dataset.
- queries(): one callable per implemented operator (SURVEY.md §2).
- oracle_sql(): DuckDB-equivalent SQL per query; the lp_* oracles
  decode the tokenized lines inside DuckDB and re-extract fields with
  the same regexes (independent path).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from logpipe_ray.queries import lp_route_counts

    return lp_route_counts("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from logpipe_ray.queries import queries as _queries

    return _queries()


def oracle_sql(sf_dir: str | None = None) -> dict[str, str]:
    """A few lp_* oracles embed fixture paths derived from sf_dir, so
    the SQL must be generated for the same scale the driver verifies
    at. A driver that passes sf_dir gets it forwarded; otherwise the
    GRAFT_ORACLE_SF_DIR env var, then the documented default (the
    driver verifies at sf=0.01)."""
    import os

    from logpipe_ray.queries import oracle_sql as _oracle_sql

    if sf_dir is None:
        sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    return _oracle_sql(sf_dir)
