"""Local stand-in for the driver's correctness gate: run every
queries() entry and compare with oracle_sql() via DuckDB (row count +
column names + order-insensitive values). Usage:

    python scripts/check_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
            df[c] = df[c].map(lambda v: tuple(v))
        if pd.api.types.is_integer_dtype(df[c].dtype):
            df[c] = df[c].astype("int64")
        if pd.api.types.is_float_dtype(df[c].dtype):
            df[c] = df[c].astype("float64").round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def dtype_classes(df: pd.DataFrame) -> list[str]:
    """Coarse dtype class per (sorted) column. The driver's value hash
    distinguishes int from float (DuckDB sum(BIGINT)→HUGEINT→float64
    slipped through round 1 because normalize() casts within class),
    so the gate must compare classes BEFORE normalization."""
    out = []
    for c in sorted(df.columns):
        dt = df[c].dtype
        if pd.api.types.is_bool_dtype(dt):
            out.append("bool")
        elif pd.api.types.is_integer_dtype(dt):
            out.append("int")
        elif pd.api.types.is_float_dtype(dt):
            out.append("float")
        elif pd.api.types.is_datetime64_any_dtype(dt):
            out.append("datetime")
        else:
            out.append("other")
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    entry = importlib.import_module("__ray_entry__")
    queries = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got_raw = to_pandas(fn(sf_dir))
            got = normalize(got_raw)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        dt = time.perf_counter() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows={len(got)} ({dt:.1f}s) [rows-only]")
            continue
        want_raw = con.sql(sql).df()
        want = normalize(want_raw)
        status = []
        if list(got.columns) != list(want.columns):
            status.append(f"columns {list(got.columns)} != {list(want.columns)}")
        elif dtype_classes(got_raw) != dtype_classes(want_raw):
            status.append(
                f"dtype classes {dtype_classes(got_raw)} != {dtype_classes(want_raw)}"
            )
        elif len(got) != len(want):
            status.append(f"rows {len(got)} != {len(want)}")
        else:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-6)
            except AssertionError as exc:
                status.append(f"values differ: {str(exc)[:300]}")
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            failures.append(name)
        else:
            print(f"ok   {name}: rows={len(got)} ({dt:.1f}s) [sql-checked]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    code = main()
    import ray

    ray.shutdown()
    sys.exit(code)
