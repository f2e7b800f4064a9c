"""Mini-driver: run every queries() entry and compare against oracle_sql()
via DuckDB, the same way the real driver does (row count + schema +
order-insensitive value comparison with columns sorted by name).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    try:
        from ray.data import Dataset

        if isinstance(result, Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # list/array cells (token arrays) are unhashable for the
            # lexsort; tuples sort and compare fine
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(ray_df: pd.DataFrame, ora_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(ora_df.columns):
        problems.append(f"columns: ray={sorted(ray_df.columns)} vs oracle={sorted(ora_df.columns)}")
        return problems
    if len(ray_df) != len(ora_df):
        problems.append(f"rows: ray={len(ray_df)} vs oracle={len(ora_df)}")
        return problems
    a, b = normalize(ray_df), normalize(ora_df)
    for col in a.columns:
        x, y = a[col], b[col]
        if str(x.dtype) != str(y.dtype):
            problems.append(f"dtype[{col}]: ray={x.dtype} vs oracle={y.dtype}")
        if pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y):
            xa = x.astype(float).to_numpy()
            ya = y.astype(float).to_numpy()
            ok = np.allclose(xa, ya, rtol=1e-9, atol=1e-12, equal_nan=True)
            exact = np.array_equal(xa, ya, equal_nan=True)
            if not ok:
                problems.append(f"values[{col}]: float mismatch")
            elif not exact:
                problems.append(f"values[{col}]: float close-but-not-bitwise (WARN)")
        else:
            if not x.fillna("\0NULL").equals(y.fillna("\0NULL")):
                bad = (x.fillna("\0NULL") != y.fillna("\0NULL")).to_numpy().nonzero()[0][:3]
                problems.append(
                    f"values[{col}]: mismatch at rows {bad.tolist()} "
                    f"ray={x.iloc[bad].tolist()} oracle={y.iloc[bad].tolist()}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from logpipe_ray.queries import oracle_sql, queries

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = queries()
    sqls = oracle_sql(sf_dir)
    failed = []
    if not only:
        # the real driver smoke-checks entry() before the queries:
        # runs at sf0.001 and must yield >= 0 rows with a stable schema
        try:
            import __ray_entry__ as _entry

            edf = to_pandas(_entry.entry())
            print(f"ok   entry(): {len(edf)} rows, cols {sorted(edf.columns)}")
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL entry(): {type(exc).__name__}: {exc}")
            failed.append("entry")
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: ray side raised {type(exc).__name__}: {exc}")
            failed.append(name)
            continue
        t1 = time.time()
        sql = sqls.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only ({len(ray_df)} rows, {t1-t0:.1f}s ray)")
            continue
        try:
            ora_df = con.execute(sql).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL raised {type(exc).__name__}: {exc}")
            failed.append(name)
            continue
        problems = compare(ray_df, ora_df)
        hard = [p for p in problems if "WARN" not in p]
        tag = "FAIL" if hard else "ok  "
        print(
            f"{tag} {name}: {len(ray_df)} rows, ray {t1-t0:.1f}s, "
            f"oracle {time.time()-t1:.1f}s"
            + (f" | {'; '.join(problems)}" if problems else "")
        )
        if hard:
            failed.append(name)
    ray.shutdown()
    if failed:
        print(f"\nFAILED: {failed}")
        return 1
    print("\nALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
