"""Local stand-in for the driver's correctness gate: run every queries()
entry at sf0.01 next to its oracle_sql() through DuckDB and compare
row-count + sorted-column schema + values (exact for ints/strings, bit
tolerance report for floats).

Usage: python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(ray_df) != len(sql_df):
        problems.append(f"rowcount ray={len(ray_df)} sql={len(sql_df)}")
        return problems
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"columns ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    a, b = canon(ray_df), canon(sql_df)
    for col in a.columns:
        x, y = a[col].to_numpy(), b[col].to_numpy()
        if x.dtype != y.dtype:
            problems.append(f"dtype[{col}] ray={x.dtype} sql={y.dtype}")
        if np.issubdtype(np.asarray(x).dtype, np.floating) or np.issubdtype(np.asarray(y).dtype, np.floating):
            xf = np.asarray(x, dtype=np.float64)
            yf = np.asarray(y, dtype=np.float64)
            if not np.array_equal(xf, yf, equal_nan=True):
                bad = ~((xf == yf) | (np.isnan(xf) & np.isnan(yf)))
                mx = np.nanmax(np.abs(xf - yf))
                problems.append(f"float[{col}] {bad.sum()}/{len(xf)} differ, maxabs={mx:.3e}")
        else:
            if not (pd.Series(x).fillna("\0") == pd.Series(y).fillna("\0")).all():
                bad = (pd.Series(x).fillna("\0") != pd.Series(y).fillna("\0")).sum()
                problems.append(f"value[{col}] {bad}/{len(x)} differ")
    return problems


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="error")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs = e.queries()
    sqls = e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            ray_df = to_pandas(fn(SF_DIR))
        except Exception as ex:  # noqa: BLE001
            print(f"[FAIL] {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in sqls:
            print(f"[rows-only] {name}: {len(ray_df)} rows, cols={sorted(ray_df.columns)}")
            continue
        try:
            sql_df = con.execute(sqls[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"[FAIL] {name}: SQL raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        probs = compare(name, ray_df, sql_df)
        if probs:
            failures += 1
            print(f"[FAIL] {name}: " + "; ".join(probs))
        else:
            print(f"[ok] {name}: {len(ray_df)} rows match")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
