"""Registry invariants: the driver-window contract and oracle health.

The real driver evaluates exactly the FIRST 50 entries of queries()
and compares each against oracle_sql() where present — these tests
keep that contract from rotting between rounds.
"""

import duckdb
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
SF = "/root/testdata/sf0.001"


def test_window_has_exactly_50_plus_parked():
    from logpipe_ray.queries import REGISTRY

    assert len(REGISTRY) >= 50, "driver window underfilled"
    # every key maps to (callable, sql-or-None)
    for name, (fn, sql_fn) in REGISTRY.items():
        assert callable(fn), name
        assert sql_fn is None or callable(sql_fn), name


def test_oracle_keys_subset_of_queries():
    from logpipe_ray.queries import oracle_sql, queries

    q = queries()
    o = oracle_sql(SF)
    assert set(o) <= set(q)
    # all five driver-visible rows-only entries are intentional
    window = list(q)[:50]
    rows_only = [n for n in window if n not in o]
    assert len(rows_only) <= 12, f"too many unoracled in-window: {rows_only}"


def test_every_oracle_sql_parses():
    """EXPLAIN every oracle against the sf0.001 views — catches SQL
    rot (renamed columns, syntax errors) without running the engines."""
    from logpipe_ray.queries import oracle_sql

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    sqls = oracle_sql(SF)
    assert len(sqls) >= 80
    bad = {}
    for name, sql in sqls.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001
            bad[name] = str(exc)[:120]
    assert not bad, bad
